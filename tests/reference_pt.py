"""An independent numpy path tracer used as the correctness reference for
render tests (role of the golden mean+variance EXRs in test_renders.py:64-105
— generated live here since the reference's data submodule isn't shipped).

Deliberately written with different code structure (recursive-style loop,
numpy RNG, its own Moller-Trumbore) so bugs don't cancel against the JAX
implementation.
"""

from __future__ import annotations

import numpy as np


class RefScene:
    def __init__(self, scene):
        """Extract plain-numpy tables from a compiled mitsuba2_tpu Scene."""
        g = scene.geom
        self.v0 = np.asarray(g.v0)
        self.e1 = np.asarray(g.e1)
        self.e2 = np.asarray(g.e2)
        self.ng = np.asarray(g.ng)
        self.face_shape = np.asarray(g.face_shape)
        self.shape_bsdf = np.asarray(g.shape_bsdf)
        self.shape_emitter = np.asarray(g.shape_emitter)
        # per-shape albedo from the original plugin objects (the scene may
        # have merged bsdf instances for dispatch)
        self.albedo = np.stack([
            np.asarray(s_.bsdf.reflectance._rgb_np, np.float64).reshape(3)
            for s_ in scene.shapes])
        self.emitters = []
        for e in scene.emitters:
            from mitsuba2_tpu.render.emitter import EmitterFlags
            if e.is_environment():
                self.emitters.append({
                    "kind": "env",
                    "radiance": np.asarray(e.radiance._rgb_np,
                                           np.float64).reshape(3)})
            else:
                self.emitters.append({
                    "kind": "area",
                    "radiance": np.asarray(e.radiance._rgb_np,
                                           np.float64).reshape(3),
                    "v0": np.asarray(e.tv0, np.float64),
                    "e1": np.asarray(e.te1, np.float64),
                    "e2": np.asarray(e.te2, np.float64),
                    "n": np.asarray(e.tn, np.float64),
                    "areas": np.asarray(e.face_distr.pmf, np.float64),
                    "total_area": e.total_area})
        self.env_idx = None
        for i, e in enumerate(self.emitters):
            if e["kind"] == "env":
                self.env_idx = i

    def intersect(self, o, d, tmin=1e-4, tmax=np.inf):
        """-> (t, face, u, v); vectorized over rays."""
        n = len(o)
        best_t = np.full(n, np.inf)
        best_f = np.full(n, -1, np.int64)
        best_u = np.zeros(n)
        best_v = np.zeros(n)
        for f in range(len(self.v0)):
            v0, e1, e2 = self.v0[f], self.e1[f], self.e2[f]
            p = np.cross(d, e2)
            det = p @ e1
            ok = np.abs(det) > 1e-12
            inv = np.where(ok, 1.0 / np.where(det == 0, 1, det), 0.0)
            tv = o - v0
            u = np.einsum("ij,ij->i", tv, p) * inv
            q = np.cross(tv, e1)
            v = np.einsum("ij,ij->i", d, q) * inv
            t = (q @ e2) * inv
            hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > tmin) \
                & (t < np.minimum(best_t, tmax))
            best_t = np.where(hit, t, best_t)
            best_f = np.where(hit, f, best_f)
            best_u = np.where(hit, u, best_u)
            best_v = np.where(hit, v, best_v)
        return best_t, best_f, best_u, best_v

    def occluded(self, o, d, dist):
        t, f, _, _ = self.intersect(o, d, 1e-4, dist * (1 - 1e-4))
        return f >= 0


def _mis(a, b):
    a2, b2 = a * a, b * b
    return np.where(a2 > 0, a2 / np.maximum(a2 + b2, 1e-300), 0.0)


def render_reference(scene, width, height, spp, max_depth, fov_deg,
                     cam_to_world, seed=1):
    """Path trace with NEE+MIS, mirroring path.cpp semantics in numpy."""
    ref = RefScene(scene)
    rng = np.random.default_rng(seed)
    n = width * height * spp
    mat = np.asarray(cam_to_world.matrix, np.float64)

    # primary rays
    px = np.repeat(np.arange(width * height) % width, spp)
    py = np.repeat(np.arange(width * height) // width, spp)
    jx = rng.random(n)
    jy = rng.random(n)
    sx = (px + jx) / width
    sy = (py + jy) / height
    aspect = width / height
    tan_half = np.tan(np.deg2rad(fov_deg) * 0.5)
    # camera convention (matches the perspective plugin): x mirrored, image
    # y=0 is the top row (camera-space +y = up)
    d_cam = np.stack([-(2 * sx - 1) * tan_half,
                      (1 - 2 * sy) * tan_half / aspect,
                      np.ones(n)], -1)
    d_cam /= np.linalg.norm(d_cam, axis=-1, keepdims=True)
    d = d_cam @ mat[:3, :3].T
    o = np.broadcast_to(mat[:3, 3], (n, 3)).copy()

    L = np.zeros((n, 3))
    beta = np.ones((n, 3))
    emission_weight = np.ones(n)
    active = np.ones(n, bool)
    n_em = len(ref.emitters)

    t, f, _, _ = ref.intersect(o, d)
    depth = 1
    while True:
        hit = f >= 0
        shape = np.where(hit, ref.face_shape[np.maximum(f, 0)], -1)
        em = np.where(hit & (shape >= 0),
                      ref.shape_emitter[np.maximum(shape, 0)], -1)
        if ref.env_idx is not None:
            em = np.where(~hit, ref.env_idx, em)
        # emission
        for i, e in enumerate(ref.emitters):
            sel = active & (em == i)
            if e["kind"] == "area":
                ng = ref.ng[np.maximum(f, 0)]
                sel = sel & (np.einsum("ij,ij->i", -d, ng) > 0)
            L[sel] += (emission_weight[sel, None] * beta[sel]
                       * e["radiance"])
        active = active & hit
        if depth >= max_depth or not active.any():
            break
        p_hit = o + d * np.where(np.isfinite(t), t, 0.0)[:, None]
        ng = ref.ng[np.maximum(f, 0)]
        ns = np.where(np.einsum("ij,ij->i", ng, -d)[:, None] > 0, ng, -ng) \
            if False else ng  # one-sided diffuse: use geometric normal
        albedo = ref.albedo[np.maximum(shape, 0)]
        cos_i = np.einsum("ij,ij->i", ns, -d)
        front = cos_i > 0
        active = active & front

        # --- NEE ---
        ei = rng.integers(0, n_em, n) if n_em > 1 else np.zeros(n, np.int64)
        for i, e in enumerate(ref.emitters):
            sel = active & (ei == i)
            if not sel.any():
                continue
            if e["kind"] == "area":
                probs = e["areas"] / e["areas"].sum()
                fi = rng.choice(len(probs), size=n, p=probs)
                r1 = rng.random(n)
                r2 = rng.random(n)
                su = 1 - np.sqrt(1 - r1)
                sv = r2 * np.sqrt(1 - r1)
                pl = e["v0"][fi] + e["e1"][fi] * su[:, None] \
                    + e["e2"][fi] * sv[:, None]
                nl = e["n"][fi]
                dl = pl - p_hit
                dist2 = np.einsum("ij,ij->i", dl, dl)
                dist = np.sqrt(dist2)
                dl /= np.maximum(dist[:, None], 1e-12)
                cos_l = np.einsum("ij,ij->i", -dl, nl)
                pdf = np.where(cos_l > 1e-9,
                               dist2 / np.maximum(cos_l * e["total_area"],
                                                  1e-300), 0.0)
                cos_s = np.einsum("ij,ij->i", dl, ns)
                ok = sel & (pdf > 0) & (cos_s > 0)
                idx = np.where(ok)[0]
                if len(idx):
                    occ = ref.occluded(p_hit[idx] + ns[idx] * 1e-5,
                                       dl[idx], dist[idx])
                    idx = idx[~occ]
                if len(idx):
                    f_bsdf = albedo[idx] / np.pi * cos_s[idx, None]
                    bsdf_pdf = cos_s[idx] / np.pi
                    pdf_sel = pdf[idx] / n_em
                    w = _mis(pdf_sel, bsdf_pdf)
                    L[idx] += (beta[idx] * f_bsdf * e["radiance"]
                               * (w / pdf_sel)[:, None])
            else:
                r = rng.random((n, 2))
                z = 1 - 2 * r[:, 1]
                rr = np.sqrt(np.maximum(0, 1 - z * z))
                phi = 2 * np.pi * r[:, 0]
                dl = np.stack([rr * np.cos(phi), rr * np.sin(phi), z], -1)
                pdf = np.full(n, 1 / (4 * np.pi)) / n_em
                cos_s = np.einsum("ij,ij->i", dl, ns)
                ok = sel & (cos_s > 0)
                idx = np.where(ok)[0]
                if len(idx):
                    occ = ref.occluded(p_hit[idx] + ns[idx] * 1e-5, dl[idx],
                                       np.full(len(idx), 1e8))
                    idx = idx[~occ]
                if len(idx):
                    f_bsdf = albedo[idx] / np.pi * cos_s[idx, None]
                    bsdf_pdf = cos_s[idx] / np.pi
                    w = _mis(pdf[idx], bsdf_pdf)
                    L[idx] += (beta[idx] * f_bsdf * e["radiance"]
                               * (w / pdf[idx])[:, None])

        # --- BSDF sampling (cosine hemisphere around ns) ---
        r = rng.random((n, 2))
        rr = np.sqrt(r[:, 0])
        phi = 2 * np.pi * r[:, 1]
        lx = rr * np.cos(phi)
        ly = rr * np.sin(phi)
        lz = np.sqrt(np.maximum(0, 1 - r[:, 0]))
        # build frame around ns
        a = np.where(np.abs(ns[:, 2:3]) < 0.9, np.array([0, 0, 1.0]),
                     np.array([1.0, 0, 0]))
        tx = np.cross(a, ns)
        tx /= np.maximum(np.linalg.norm(tx, axis=-1, keepdims=True), 1e-12)
        ty = np.cross(ns, tx)
        wo = tx * lx[:, None] + ty * ly[:, None] + ns * lz[:, None]
        bsdf_pdf = lz / np.pi
        beta = beta * albedo  # f/pdf * cos = albedo
        active = active & (bsdf_pdf > 0) & (beta.max(-1) > 0)

        o = p_hit + ns * 1e-5
        d = wo
        t, f, _, _ = ref.intersect(o, d)
        # emitter-hit MIS for next bounce
        hit2 = f >= 0
        shape2 = np.where(hit2, ref.face_shape[np.maximum(f, 0)], -1)
        em2 = np.where(hit2 & (shape2 >= 0),
                       ref.shape_emitter[np.maximum(shape2, 0)], -1)
        if ref.env_idx is not None:
            em2 = np.where(~hit2, ref.env_idx, em2)
        em_pdf = np.zeros(n)
        for i, e in enumerate(ref.emitters):
            sel = em2 == i
            if e["kind"] == "area":
                ng2 = ref.ng[np.maximum(f, 0)]
                cos_l = np.einsum("ij,ij->i", -d, ng2)
                em_pdf = np.where(
                    sel & (cos_l > 1e-9),
                    t * t / np.maximum(cos_l * e["total_area"], 1e-300),
                    em_pdf)
            else:
                em_pdf = np.where(sel, 1 / (4 * np.pi), em_pdf)
        em_pdf /= max(n_em, 1)
        emission_weight = _mis(bsdf_pdf, em_pdf)
        depth += 1

    img = L.reshape(width * height, spp, 3).mean(1).reshape(height, width, 3)
    return img.astype(np.float32)
