"""Second independent numpy path tracer: GGX conductors, smooth
dielectrics, textured envmaps (own texel-pmf NEE), and a gray
homogeneous medium — the reference's mean+variance golden-EXR role
(test_renders.py:64-105) for the estimator classes beyond diffuse
(VERDICT r2 #6).

Deliberately different implementation choices from the renderer so bugs
don't cancel: GGX sampled via the *full* NDF (the renderer uses Heitz
VNDF), envmap importance-sampled by a flat texel pmf (the renderer uses
Hierarchical2D / in-kernel CDF rows), volumetric transport is NEE-only
analog tracking (the renderer's volpath is MIS-weighted), and the loop
is written lane-filtered numpy rather than masked SoA.
"""

from __future__ import annotations

import numpy as np


def _norm(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def _dotv(a, b):
    return np.einsum("ij,ij->i", a, b)


def _frame(n):
    a = np.where(np.abs(n[:, 2:3]) < 0.9, np.array([0.0, 0.0, 1.0]),
                 np.array([1.0, 0.0, 0.0]))
    t = _norm(np.cross(a, n))
    return t, np.cross(n, t)


class Env:
    """Lat-long envmap with bilinear eval (same radiance field as the
    renderer's BitmapTexture) and flat texel-pmf importance sampling."""

    def __init__(self, data):
        self.data = np.asarray(data, np.float64)
        self.h, self.w = self.data.shape[:2]
        theta = (np.arange(self.h) + 0.5) / self.h * np.pi
        imp = self.data.mean(-1) * np.sin(theta)[:, None] + 1e-12
        self.pmf = (imp / imp.sum()).reshape(-1)

    def _uv(self, d):
        u = np.arctan2(d[:, 0], -d[:, 2]) / (2 * np.pi) + 0.5
        v = np.arccos(np.clip(d[:, 1], -1, 1)) / np.pi
        return u, v

    def eval(self, d):
        u, v = self._uv(d)
        fu = u * self.w - 0.5
        fv = v * self.h - 0.5
        u0 = np.floor(fu).astype(np.int64)
        v0 = np.floor(fv).astype(np.int64)
        du = fu - u0
        dv = fv - v0
        out = 0.0
        for (iu, iv, wgt) in ((u0, v0, (1 - du) * (1 - dv)),
                              (u0 + 1, v0, du * (1 - dv)),
                              (u0, v0 + 1, (1 - du) * dv),
                              (u0 + 1, v0 + 1, du * dv)):
            iu = np.mod(iu, self.w)
            iv = np.mod(iv, self.h)
            out = out + self.data[iv, iu] * wgt[:, None]
        return out

    def sample(self, rng, n):
        """-> (d, pdf_solid_angle, radiance)."""
        tex = rng.choice(len(self.pmf), size=n, p=self.pmf)
        iv, iu = tex // self.w, tex % self.w
        u = (iu + rng.random(n)) / self.w
        v = (iv + rng.random(n)) / self.h
        theta = v * np.pi
        phi = (u - 0.5) * 2 * np.pi
        st = np.sin(theta)
        d = np.stack([st * np.sin(phi), np.cos(theta), -st * np.cos(phi)],
                     -1)
        pdf = self.pmf[tex] * self.w * self.h / np.maximum(
            2 * np.pi ** 2 * st, 1e-12)
        return d, pdf, self.eval(d)

    def pdf(self, d):
        u, v = self._uv(d)
        iu = np.mod(np.floor(u * self.w).astype(np.int64), self.w)
        iv = np.clip(np.floor(v * self.h).astype(np.int64), 0, self.h - 1)
        st = np.sqrt(np.maximum(1 - d[:, 1] ** 2, 1e-12))
        return self.pmf[iv * self.w + iu] * self.w * self.h / np.maximum(
            2 * np.pi ** 2 * st, 1e-12)


# --------------------------------------------------------------------------
# GGX (full-NDF sampling, Smith separable G — standard textbook forms)
# --------------------------------------------------------------------------

def _ggx_d(cm, a):
    a2 = a * a
    den = cm * cm * (a2 - 1.0) + 1.0
    return np.where(cm > 0, a2 / np.maximum(np.pi * den * den, 1e-300), 0.0)


def _ggx_g1(cv, a):
    cv = np.maximum(cv, 1e-6)
    t2 = (1.0 - cv * cv) / (cv * cv)
    return 2.0 / (1.0 + np.sqrt(1.0 + a * a * t2))


def _fresnel_cond(c, eta, k):
    c2 = (c * c)[:, None]
    t0 = eta * eta + k * k
    t1 = t0 * c2
    rs = (t0 - 2 * eta * c[:, None] + c2) / np.maximum(
        t0 + 2 * eta * c[:, None] + c2, 1e-300)
    rp = (t1 - 2 * eta * c[:, None] + 1) / np.maximum(
        t1 + 2 * eta * c[:, None] + 1, 1e-300)
    return 0.5 * (rs + rp)


def _fresnel_diel(ci, eta):
    """-> (F, cos_t, eta_it, eta_ti): scalar relative IOR, signed ci."""
    out = ci >= 0
    eta_it = np.where(out, eta, 1.0 / eta)
    eta_ti = 1.0 / eta_it
    c2t = 1.0 - eta_ti * eta_ti * (1.0 - ci * ci)
    tir = c2t <= 0
    ct = np.sqrt(np.maximum(c2t, 0.0)) * -np.sign(ci)
    aci = np.abs(ci)
    act = np.abs(ct)
    rs = (aci - eta_it * act) / np.maximum(aci + eta_it * act, 1e-300)
    rp = (eta_it * aci - act) / np.maximum(eta_it * aci + act, 1e-300)
    F = np.where(tir, 1.0, 0.5 * (rs * rs + rp * rp))
    return F, ct, eta_it, eta_ti


class RefScene2:
    """Geometry + material tables pulled from a compiled Scene."""

    KIND = {"SmoothDiffuse": 0, "RoughConductor": 1,
            "SmoothDielectric": 2, "NullBSDF": 3}

    def __init__(self, scene):
        g = scene.geom
        self.v0 = np.asarray(g.v0, np.float64)
        self.e1 = np.asarray(g.e1, np.float64)
        self.e2 = np.asarray(g.e2, np.float64)
        self.ng = np.asarray(g.ng, np.float64)
        self.face_shape = np.asarray(g.face_shape)
        self.shape_emitter = np.asarray(g.shape_emitter)
        nshapes = len(scene.shapes)
        self.kind = np.zeros(nshapes, np.int64)
        self.albedo = np.zeros((nshapes, 3))
        self.alpha = np.zeros(nshapes)
        self.ior = np.ones((nshapes, 3))
        self.kap = np.zeros((nshapes, 3))
        self.eta_d = np.ones(nshapes)
        for i, s in enumerate(scene.shapes):
            b = s.bsdf
            members = getattr(b, "merged_instances", None)
            if members:
                b = members[0]
            name = type(b).__name__
            self.kind[i] = self.KIND[name]
            if name == "SmoothDiffuse":
                self.albedo[i] = np.asarray(
                    b.reflectance._rgb_np, np.float64).reshape(3)
            elif name == "RoughConductor":
                self.alpha[i] = float(b.alpha_u)
                self.albedo[i] = np.asarray(
                    b.specular_reflectance._rgb_np, np.float64).reshape(3)
                self.ior[i] = np.asarray(b.eta_tex._rgb_np,
                                         np.float64).reshape(3)
                self.kap[i] = np.asarray(b.k_tex._rgb_np,
                                         np.float64).reshape(3)
            elif name == "SmoothDielectric":
                self.eta_d[i] = float(b.eta)
                self.albedo[i] = np.asarray(
                    b.specular_reflectance._rgb_np, np.float64).reshape(3)
        # emitters
        self.area = []
        self.env = None
        self.env_emitter_index = -1
        for idx, e in enumerate(scene.emitters):
            if e.is_environment():
                self.env = Env(np.asarray(e.bitmap._rgb_np))
                self.env_emitter_index = idx
            elif getattr(e, "_packed", False):
                # spectral variants carry sigmoid coeffs instead of rgb;
                # the rgb field is only consumed by the rgb arms
                rgb = getattr(e.radiance, "_rgb_np", None)
                self.area.append({
                    "index": idx,
                    "radiance": (np.asarray(rgb, np.float64).reshape(3)
                                 if rgb is not None else np.ones(3)),
                    "v0": np.asarray(e.tv0, np.float64),
                    "e1": np.asarray(e.te1, np.float64),
                    "e2": np.asarray(e.te2, np.float64),
                    "n": np.asarray(e.tn, np.float64),
                    "areas": np.asarray(e.face_distr.pmf, np.float64),
                    "total_area": float(e.total_area)})
        self.n_em = len(self.area) + (1 if self.env is not None else 0)
        # optional single gray homogeneous medium inside an AABB
        self.med = None

    def set_medium_box(self, lo, hi, sigma_t, albedo):
        self.med = {"lo": np.asarray(lo, np.float64),
                    "hi": np.asarray(hi, np.float64),
                    "st": float(sigma_t), "a": float(albedo)}

    def set_medium_grid(self, lo, hi, grid, scale=1.0, albedo=0.75,
                        g_hg=0.0):
        """Heterogeneous medium: trilinear sigma_t grid (D, H, W) over
        the AABB [lo, hi], optional Henyey-Greenstein phase. The
        renderer delta-tracks free flights and ratio-tracks NEE
        transmittance; this arm delta-tracks with an independent
        rejection loop and integrates NEE transmittance by composite
        Simpson quadrature of the trilinear field — a deliberately
        different estimator pair (grid3d.cpp / volpath.cpp role)."""
        grid = np.asarray(grid, np.float64)
        self.med = {"lo": np.asarray(lo, np.float64),
                    "hi": np.asarray(hi, np.float64),
                    "grid": grid, "scale": float(scale),
                    "maj": float(grid.max() * scale),
                    "a": float(albedo), "g": float(g_hg)}

    def _sigma_at(self, p):
        """Trilinear sigma_t at world points (N, 3); 0 outside the box.
        Matches grid3d.cpp's clamped cell-center lerp: f = l*res - 0.5,
        indices clamped to the grid."""
        med = self.med
        grid = med["grid"]
        D, H, W = grid.shape
        l = (p - med["lo"]) / (med["hi"] - med["lo"])
        inside = ((l >= 0.0) & (l <= 1.0)).all(-1)
        lx, ly, lz = l[:, 0], l[:, 1], l[:, 2]
        fx = lx * W - 0.5
        fy = ly * H - 0.5
        fz = lz * D - 0.5
        ix = np.clip(np.floor(fx).astype(np.int64), 0, W - 1)
        iy = np.clip(np.floor(fy).astype(np.int64), 0, H - 1)
        iz = np.clip(np.floor(fz).astype(np.int64), 0, D - 1)
        ix1 = np.minimum(ix + 1, W - 1)
        iy1 = np.minimum(iy + 1, H - 1)
        iz1 = np.minimum(iz + 1, D - 1)
        tx = np.clip(fx - ix, 0.0, 1.0)
        ty = np.clip(fy - iy, 0.0, 1.0)
        tz = np.clip(fz - iz, 0.0, 1.0)
        val = 0.0
        for jz, wz in ((iz, 1 - tz), (iz1, tz)):
            for jy, wy in ((iy, 1 - ty), (iy1, ty)):
                for jx, wx in ((ix, 1 - tx), (ix1, tx)):
                    val = val + grid[jz, jy, jx] * (wz * wy * wx)
        return np.where(inside, val * med["scale"], 0.0)

    def _tr_grid(self, o, d, dist, steps=48):
        """exp(-integral of sigma_t) over [0, dist] clipped to the box,
        by composite Simpson quadrature (deterministic; independent of
        the renderer's ratio tracking)."""
        med = self.med
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = (med["lo"] - o) / d
            t2 = (med["hi"] - o) / d
        tn = np.maximum(np.where(np.isnan(t1), -np.inf,
                                 np.minimum(t1, t2)).max(-1), 0.0)
        tf = np.minimum(np.where(np.isnan(t1), np.inf,
                                 np.maximum(t1, t2)).min(-1), dist)
        seg = np.maximum(tf - tn, 0.0)
        # Simpson needs an even step count; weights 1,4,2,4,...,4,1
        m = steps if steps % 2 == 0 else steps + 1
        wgt = np.ones(m + 1)
        wgt[1:-1:2] = 4.0
        wgt[2:-1:2] = 2.0
        integral = np.zeros(len(o))
        hstep = seg / m
        for k in range(m + 1):
            pk = o + d * (tn + hstep * k)[:, None]
            integral += wgt[k] * self._sigma_at(pk)
        integral *= hstep / 3.0
        return np.exp(-np.where(seg > 0, integral, 0.0))

    def intersect(self, o, d, tmin=1e-4, tmax=np.inf):
        n = len(o)
        best_t = np.full(n, np.inf)
        best_f = np.full(n, -1, np.int64)
        for f in range(len(self.v0)):
            v0, e1, e2 = self.v0[f], self.e1[f], self.e2[f]
            p = np.cross(d, e2)
            det = p @ e1
            ok = np.abs(det) > 1e-14
            inv = np.where(ok, 1.0 / np.where(det == 0, 1, det), 0.0)
            tv = o - v0
            u = _dotv(tv, np.broadcast_to(p, tv.shape)) * inv
            q = np.cross(tv, e1)
            v = _dotv(d, q) * inv
            t = (q @ e2) * inv
            hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > tmin) \
                & (t < np.minimum(best_t, tmax))
            best_t = np.where(hit, t, best_t)
            best_f = np.where(hit, f, best_f)
        return best_t, best_f

    def occluded(self, o, d, dist, ignore_null=True):
        """Any-hit, optionally skipping null-BSDF faces (the renderer's
        shadow rays pass through null boundaries via transmittance)."""
        n = len(o)
        occ = np.zeros(n, bool)
        for f in range(len(self.v0)):
            s = self.face_shape[f]
            if ignore_null and self.kind[s] == 3:
                continue
            v0, e1, e2 = self.v0[f], self.e1[f], self.e2[f]
            p = np.cross(d, e2)
            det = p @ e1
            ok = np.abs(det) > 1e-14
            inv = np.where(ok, 1.0 / np.where(det == 0, 1, det), 0.0)
            tv = o - v0
            u = _dotv(tv, np.broadcast_to(p, tv.shape)) * inv
            q = np.cross(tv, e1)
            v = _dotv(d, q) * inv
            t = (q @ e2) * inv
            occ |= ok & (u >= 0) & (v >= 0) & (u + v <= 1) \
                & (t > 1e-4) & (t < dist * (1 - 1e-4))
        return occ

    # ---- medium helpers (axis-aligned box, gray sigma_t) -----------------
    def _box_exit(self, o, d):
        """Distance to the medium box exit for points inside it."""
        med = self.med
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = (med["lo"] - o) / d
            t2 = (med["hi"] - o) / d
        tfar = np.minimum(np.where(np.isnan(t1), np.inf, np.maximum(t1, t2)),
                          np.inf).min(-1)
        return np.maximum(tfar, 0.0)

    def _seg_in_box(self, o, d, dist):
        """Length of [0, dist] along (o, d) inside the medium box."""
        med = self.med
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = (med["lo"] - o) / d
            t2 = (med["hi"] - o) / d
        tn = np.maximum(np.where(np.isnan(t1), -np.inf,
                                 np.minimum(t1, t2)).max(-1), 0.0)
        tf = np.minimum(np.where(np.isnan(t1), np.inf,
                                 np.maximum(t1, t2)).min(-1), dist)
        return np.maximum(tf - tn, 0.0)


def _mis(a, b):
    a2, b2 = a * a, b * b
    return np.where(a2 > 0, a2 / np.maximum(a2 + b2, 1e-300), 0.0)


def render_reference2(scene, width, height, spp, max_depth, fov_deg,
                      cam_to_world, seed=1, medium_box=None,
                      medium_grid=None):
    """NEE+MIS path tracer over diffuse/GGX/dielectric/null materials,
    area + envmap emitters, optional gray homogeneous medium
    (`medium_box` = (lo, hi, sigma_t, albedo)) or heterogeneous grid
    medium (`medium_grid` = (lo, hi, grid DHW, scale, albedo, g_hg))."""
    ref = RefScene2(scene)
    if medium_box is not None:
        ref.set_medium_box(*medium_box)
    if medium_grid is not None:
        ref.set_medium_grid(*medium_grid)
    rng = np.random.default_rng(seed)
    n = width * height * spp
    mat = np.asarray(cam_to_world.matrix, np.float64)

    px = np.repeat(np.arange(width * height) % width, spp)
    py = np.repeat(np.arange(width * height) // width, spp)
    sx = (px + rng.random(n)) / width
    sy = (py + rng.random(n)) / height
    aspect = width / height
    tan_half = np.tan(np.deg2rad(fov_deg) * 0.5)
    d_cam = _norm(np.stack([-(2 * sx - 1) * tan_half,
                            (1 - 2 * sy) * tan_half / aspect,
                            np.ones(n)], -1))
    d = d_cam @ mat[:3, :3].T
    o = np.broadcast_to(mat[:3, 3], (n, 3)).astype(np.float64).copy()

    L = np.zeros((n, 3))
    beta = np.ones((n, 3))
    prev_pdf = np.zeros(n)        # 0 => delta/camera: emission weight 1
    active = np.ones(n, bool)
    inside_med = np.zeros(n, bool)
    is_grid = ref.med is not None and "grid" in ref.med
    st_g = ref.med.get("st", 0.0) if ref.med else 0.0
    al_g = ref.med["a"] if ref.med else 0.0
    g_hg = ref.med.get("g", 0.0) if ref.med else 0.0

    def _tr_seg(p0, dl, dist):
        """Shadow-segment transmittance (gray analytic / grid Simpson)."""
        if is_grid:
            return ref._tr_grid(p0, dl, dist)
        seg = ref._seg_in_box(p0, dl, dist)
        return np.exp(-st_g * seg)

    def _phase_eval(cos_t):
        if g_hg == 0.0:
            return np.full_like(cos_t, 1.0 / (4 * np.pi))
        den = 1.0 + g_hg * g_hg - 2.0 * g_hg * cos_t
        return (1.0 - g_hg * g_hg) / (4 * np.pi * np.maximum(
            den, 1e-12) ** 1.5)

    def _phase_sample(d_in, u1, u2):
        """HG (or isotropic) direction around the incoming propagation
        direction; returns unit directions (N, 3)."""
        if g_hg == 0.0:
            z = 1 - 2 * u1
        else:
            sq = (1.0 - g_hg * g_hg) / (1.0 + g_hg - 2.0 * g_hg * u1)
            z = (1.0 + g_hg * g_hg - sq * sq) / (2.0 * g_hg)
            z = np.clip(z, -1.0, 1.0)
        st_ = np.sqrt(np.maximum(0.0, 1.0 - z * z))
        ph = 2 * np.pi * u2
        tx, ty = _frame(d_in)
        return _norm(d_in * z[:, None]
                     + tx * (st_ * np.cos(ph))[:, None]
                     + ty * (st_ * np.sin(ph))[:, None])

    for depth in range(max_depth):
        if not active.any():
            break
        t, f = ref.intersect(o, d)
        hit = f >= 0

        # ---- volumetric free flight (analog; gray sigma_t) -------------
        scat = np.zeros(n, bool)
        if ref.med is not None:
            inmed = active & inside_med
            t_next = np.where(hit, t, np.inf)
            if is_grid:
                # Woodcock delta tracking against the grid majorant
                # (independent rejection-loop design; the renderer's
                # budget-bounded in-kernel walk is the thing under test)
                maj = max(ref.med["maj"], 1e-12)
                s_fl = np.full(n, np.inf)
                cur = np.zeros(n)
                walking = inmed.copy()
                for _ in range(100000):
                    if not walking.any():
                        break
                    cur = cur - np.log(
                        np.maximum(1e-12, 1 - rng.random(n))) / maj
                    walking &= cur < t_next
                    if not walking.any():
                        break
                    sig = ref._sigma_at(o + d * cur[:, None])
                    real = walking & (rng.random(n) * maj < sig)
                    s_fl = np.where(real, cur, s_fl)
                    walking &= ~real
            else:
                s_fl = -np.log(np.maximum(1e-12, 1 - rng.random(n))) \
                    / max(st_g, 1e-12)
            scat = inmed & (s_fl < t_next)
            # scatter event: isotropic phase, NEE with analytic Tr
            if scat.any():
                ps = o + d * s_fl[:, None]
                beta[scat] *= al_g
                # NEE to area lights (no MIS: NEE-only volumetric arm)
                for e in ref.area:
                    probs = e["areas"] / e["areas"].sum()
                    fi = rng.choice(len(probs), size=n, p=probs)
                    r1, r2 = rng.random(n), rng.random(n)
                    su = 1 - np.sqrt(1 - r1)
                    sv = r2 * np.sqrt(1 - r1)
                    pl = (e["v0"][fi] + e["e1"][fi] * su[:, None]
                          + e["e2"][fi] * sv[:, None])
                    dl = pl - ps
                    dist2 = _dotv(dl, dl)
                    dist = np.sqrt(dist2)
                    dl = dl / np.maximum(dist[:, None], 1e-12)
                    cos_l = _dotv(-dl, e["n"][fi])
                    pdf = np.where(cos_l > 1e-9, dist2 / np.maximum(
                        cos_l * e["total_area"], 1e-300), 0.0)
                    idx = np.where(scat & (pdf > 0))[0]
                    if len(idx):
                        occ = ref.occluded(ps[idx], dl[idx], dist[idx])
                        idx = idx[~occ]
                    if len(idx):
                        tr = _tr_seg(ps[idx], dl[idx], dist[idx])
                        phase = _phase_eval(_dotv(d[idx], dl[idx]))
                        L[idx] += (beta[idx] * e["radiance"] * (
                            tr * phase / np.maximum(pdf[idx] * ref.n_em,
                                                    1e-300))[:, None])
                # new phase-sampled direction (HG or isotropic)
                nd = _phase_sample(d, rng.random(n), rng.random(n))
                o = np.where(scat[:, None], ps, o)
                d = np.where(scat[:, None], nd, d)
                # NEE-only volumetric arm: suppress the next emitter hit
                prev_pdf = np.where(scat, -1.0, prev_pdf)
                # re-trace for lanes that scattered
                t2, f2 = ref.intersect(o, d)
                t = np.where(scat, t2, t)
                f = np.where(scat, f2, f)
                hit = f >= 0

        shape = np.where(hit, ref.face_shape[np.maximum(f, 0)], -1)
        em = np.where(hit & (shape >= 0),
                      ref.shape_emitter[np.maximum(shape, 0)], -1)

        # ---- emission (MIS vs NEE pdf; env on escape) ------------------
        surf_lane = active & ~scat
        for e in ref.area:
            sel = surf_lane & (em == e["index"])
            if not sel.any():
                continue
            ng = ref.ng[np.maximum(f, 0)]
            cos_l = _dotv(-d, ng)
            pdf_l = np.where(cos_l > 1e-9,
                             t * t / np.maximum(cos_l * e["total_area"],
                                                1e-300), 0.0) / ref.n_em
            w = np.where(prev_pdf > 0, _mis(prev_pdf, pdf_l), 1.0)
            w = np.where(prev_pdf < 0, 0.0, w)
            sel &= cos_l > 0
            L[sel] += w[sel, None] * beta[sel] * e["radiance"]
        if ref.env is not None:
            esc = surf_lane & ~hit
            if esc.any():
                er = ref.env.eval(d[esc])
                pdf_e = ref.env.pdf(d[esc]) / ref.n_em
                w = np.where(prev_pdf[esc] > 0,
                             _mis(prev_pdf[esc], pdf_e), 1.0)
                w = np.where(prev_pdf[esc] < 0, 0.0, w)
                L[esc] += w[:, None] * beta[esc] * er
        active = active & (hit | scat)
        sl = active & ~scat
        if depth == max_depth - 1 or not active.any():
            break

        # ---- surface shading -------------------------------------------
        p_hit = o + d * np.where(np.isfinite(t), t, 0.0)[:, None]
        ng = ref.ng[np.maximum(f, 0)]
        kind = np.where(shape >= 0, ref.kind[np.maximum(shape, 0)], 0)
        alb = ref.albedo[np.maximum(shape, 0)]
        alpha = ref.alpha[np.maximum(shape, 0)]
        eta3 = ref.ior[np.maximum(shape, 0)]
        kap3 = ref.kap[np.maximum(shape, 0)]
        eta_d = ref.eta_d[np.maximum(shape, 0)]

        # null boundary: pass straight through, toggle the medium flag
        is_null = sl & (kind == 3)
        if is_null.any():
            o = np.where(is_null[:, None], p_hit + d * 1e-5, o)
            if ref.med is not None:
                inside_med = np.where(is_null, ~inside_med, inside_med)
            prev_pdf = np.where(is_null, prev_pdf, prev_pdf)
        shade = sl & (kind != 3)

        cos_i = _dotv(ng, -d)
        # one-sided diffuse/ggx; dielectric is two-sided
        front = (cos_i > 0) | (kind == 2)
        shade &= front
        active = active & (shade | is_null | scat)
        tx, ty = _frame(ng)

        def to_local(v):
            return np.stack([_dotv(v, tx), _dotv(v, ty), _dotv(v, ng)], -1)

        def to_world(v):
            return (tx * v[:, 0:1] + ty * v[:, 1:2] + ng * v[:, 2:3])

        wi = to_local(-d)

        # ---- NEE (diffuse + ggx lanes only) ----------------------------
        nee = shade & (kind != 2)
        if nee.any() and ref.n_em:
            pick = rng.integers(0, ref.n_em, n)
            arms = list(ref.area) + (
                [None] if ref.env is not None else [])
            for ai, e in enumerate(arms):
                sel = nee & (pick == ai)
                if not sel.any():
                    continue
                if e is not None:
                    probs = e["areas"] / e["areas"].sum()
                    fi = rng.choice(len(probs), size=n, p=probs)
                    r1, r2 = rng.random(n), rng.random(n)
                    su = 1 - np.sqrt(1 - r1)
                    sv = r2 * np.sqrt(1 - r1)
                    pl = (e["v0"][fi] + e["e1"][fi] * su[:, None]
                          + e["e2"][fi] * sv[:, None])
                    dl = pl - p_hit
                    dist2 = _dotv(dl, dl)
                    dist = np.sqrt(dist2)
                    dl = dl / np.maximum(dist[:, None], 1e-12)
                    cos_l = _dotv(-dl, e["n"][fi])
                    pdf = np.where(cos_l > 1e-9, dist2 / np.maximum(
                        cos_l * e["total_area"], 1e-300), 0.0) / ref.n_em
                    lrad = np.broadcast_to(e["radiance"], (n, 3))
                else:
                    dl, pdf, lrad = ref.env.sample(rng, n)
                    pdf = pdf / ref.n_em
                    dist = np.full(n, 1e7)
                cos_s = _dotv(dl, ng)
                ok = sel & (pdf > 0) & (cos_s > 0)
                idx = np.where(ok)[0]
                if len(idx):
                    # null boundaries pass shadow rays (the renderer's
                    # eval_null_transmission); the medium factor below
                    # carries the attenuation
                    occ = ref.occluded(p_hit[idx] + ng[idx] * 1e-5,
                                       dl[idx], dist[idx])
                    idx = idx[~occ]
                if len(idx):
                    wo = to_local(dl)[idx]
                    ggx = kind[idx] == 1
                    # diffuse f*cos and pdf
                    fcos = alb[idx] / np.pi * cos_s[idx, None]
                    bpdf = cos_s[idx] / np.pi
                    if ggx.any():
                        h = _norm(wi[idx] + wo)
                        D = _ggx_d(h[:, 2], alpha[idx])
                        G = (_ggx_g1(wi[idx, 2], alpha[idx])
                             * _ggx_g1(wo[:, 2], alpha[idx]))
                        Fc = _fresnel_cond(
                            np.maximum(_dotv(wi[idx], h), 0.0),
                            eta3[idx], kap3[idx])
                        spec = (alb[idx] * Fc * (D * G / np.maximum(
                            4 * wi[idx, 2], 1e-12))[:, None])
                        pdf_g = (D * h[:, 2] / np.maximum(
                            4 * np.abs(_dotv(wo, h)), 1e-12))
                        fcos = np.where(ggx[:, None], spec, fcos)
                        bpdf = np.where(ggx, pdf_g, bpdf)
                    w = _mis(pdf[idx], bpdf)
                    contrib = beta[idx] * fcos * lrad[idx] \
                        * (w / pdf[idx])[:, None]
                    if ref.med is not None:
                        contrib *= _tr_seg(p_hit[idx], dl[idx],
                                           dist[idx])[:, None]
                    L[idx] += contrib

        # ---- BSDF sampling ---------------------------------------------
        u1, u2 = rng.random(n), rng.random(n)
        # diffuse: cosine
        rr_ = np.sqrt(u1)
        ph = 2 * np.pi * u2
        wo_d = np.stack([rr_ * np.cos(ph), rr_ * np.sin(ph),
                         np.sqrt(np.maximum(0, 1 - u1))], -1)
        pdf_d = np.maximum(wo_d[:, 2], 0.0) / np.pi
        wt_d = alb.copy()
        # ggx: sample the full NDF
        ct_m = np.sqrt(np.maximum(
            (1 - u1) / np.maximum(u1 * (alpha ** 2 - 1) + 1, 1e-12), 0.0))
        st_m = np.sqrt(np.maximum(1 - ct_m ** 2, 0.0))
        m_l = np.stack([st_m * np.cos(ph), st_m * np.sin(ph), ct_m], -1)
        wm = _dotv(wi, m_l)
        wo_g = 2 * wm[:, None] * m_l - wi
        D = _ggx_d(ct_m, alpha)
        pdf_m = D * ct_m
        pdf_g = pdf_m / np.maximum(4 * np.abs(wm), 1e-12)
        G = _ggx_g1(wi[:, 2], alpha) * _ggx_g1(wo_g[:, 2], alpha)
        Fc = _fresnel_cond(np.maximum(wm, 0.0), eta3, kap3)
        ok_g = (wo_g[:, 2] > 1e-6) & (wm > 0) & (pdf_g > 0)
        # weight = f*cos/pdf = alb F D G / (4 ci pdf_g)
        wt_g = np.where(
            ok_g[:, None],
            alb * Fc * (D * G / np.maximum(
                4 * wi[:, 2] * pdf_g, 1e-12))[:, None], 0.0)
        is_g = kind == 1
        is_diel = kind == 2
        wo_l = np.where(is_g[:, None], wo_g, wo_d)
        pdf_b = np.where(is_g, pdf_g, pdf_d)
        wt = np.where(is_g[:, None], wt_g, wt_d)
        nd = to_world(wo_l)
        # dielectric delta lobes (signed local frame w.r.t. ng)
        if is_diel.any():
            ci = _dotv(-d, ng)
            Fd, ct, eta_it, eta_ti = _fresnel_diel(ci, eta_d)
            refl = u1 <= Fd
            # reflect about ng; refract with signed transmitted cosine
            d_refl = d + 2 * ci[:, None] * ng
            d_refr = _norm(eta_ti[:, None] * d
                           + (eta_ti * ci + ct)[:, None] * ng)
            nd = np.where(is_diel[:, None],
                          np.where(refl[:, None], d_refl, d_refr), nd)
            wt_diel = np.where(refl[:, None], alb,
                               alb * (eta_ti ** 2)[:, None])
            wt = np.where(is_diel[:, None], wt_diel, wt)
            pdf_b = np.where(is_diel, 0.0, pdf_b)  # delta: no MIS
        ok = shade & ((pdf_b > 0) | is_diel) & (wt.max(-1) > 0)
        active = active & (ok | is_null | scat)
        beta = np.where(shade[:, None], beta * wt, beta)
        off = np.where(_dotv(nd, ng)[:, None] >= 0, ng, -ng) * 1e-5
        o = np.where(shade[:, None], p_hit + off, o)
        d = np.where(shade[:, None], nd, d)
        prev_pdf = np.where(shade, pdf_b, prev_pdf)
        # russian roulette disabled (max_depth-bounded reference)

    img = L.reshape(width * height, spp, 3).mean(1).reshape(
        height, width, 3)
    return img.astype(np.float32)


# ---------------------------------------------------------------------------
# Spectral (hero-wavelength) arm: diffuse + area emitters (Cornell class)
# ---------------------------------------------------------------------------

_XYZ_TO_SRGB = np.array([[3.240479, -1.537150, -0.498535],
                         [-0.969256, 1.875991, 0.041556],
                         [0.055648, -0.204043, 1.057311]])
_WL_LO, _WL_HI = 360.0, 830.0


def _sigmoid_reflectance(coeff, wl):
    """Jakob & Hanika 2019 sigmoid polynomial (the model spec, written
    independently of render/srgb.py's evaluator). coeff (..., 3),
    wl (...) -> (...)."""
    x = (wl - _WL_LO) / (_WL_HI - _WL_LO) * 2.0 - 1.0
    # coeff may be (n, 3) against wl (n, n_wl): keep a broadcast axis
    t = (coeff[..., 0:1] * x * x + coeff[..., 1:2] * x
         + coeff[..., 2:3]) if coeff.ndim == x.ndim else (
        coeff[..., 0] * x * x + coeff[..., 1] * x + coeff[..., 2])
    return 0.5 + t / (2.0 * np.sqrt(1.0 + t * t))


def _cie_tables():
    from mitsuba2_tpu.core import spectrum as _sp
    wl5 = np.linspace(_WL_LO, _WL_HI, _sp.MTS_CIE_SAMPLES)
    return (wl5, np.asarray(_sp.CIE_XYZ_TABLE, np.float64),
            np.asarray(_sp.CIE_D65_TABLE, np.float64))


def render_reference2_spectral(scene, width, height, spp, max_depth,
                               fov_deg, cam_to_world, seed=1, n_wl=4):
    """Hero-wavelength NEE+MIS tracer for diffuse + area-emitter scenes.

    Independent design choices vs the renderer: wavelengths are sampled
    UNIFORMLY over [360, 830] with a stratified shift (the renderer
    importance-samples the Radziszewski fit), reflectance/radiance
    spectra are evaluated with a locally-written sigmoid + np.interp
    D65, and XYZ integration is plain MC mean * range over the raw CIE
    tables. Returns the linear-sRGB image (matches the spectral film
    develop semantics: spectrum_to_xyz with 1/pdf weights, then
    xyz_to_srgb)."""
    ref = RefScene2(scene)
    assert ref.env is None and (ref.kind[ref.kind != 3] == 0).all(), \
        "spectral arm: diffuse surfaces + area emitters only"
    # spectral payloads: reflectance coeffs per shape, emitter coeff+scale
    coeffs = np.zeros((len(scene.shapes), 3))
    for i, s in enumerate(scene.shapes):
        b = s.bsdf
        members = getattr(b, "merged_instances", None)
        if members:
            b = members[0]
        refl = getattr(b, "reflectance", None)
        if refl is not None and hasattr(refl, "data"):
            coeffs[i] = np.asarray(refl.data.coeff, np.float64).reshape(3)
    em_spec = {}
    for idx, e in enumerate(scene.emitters):
        em_spec[idx] = (np.asarray(e.radiance._coeff,
                                   np.float64).reshape(3),
                        float(e.radiance._d65_scale))
    wl5, cmf, d65 = _cie_tables()

    def d65_at(wl):
        return np.interp(wl, wl5, d65)

    rng = np.random.default_rng(seed)
    n = width * height * spp
    mat = np.asarray(cam_to_world.matrix, np.float64)
    px = np.repeat(np.arange(width * height) % width, spp)
    py = np.repeat(np.arange(width * height) // width, spp)
    sx = (px + rng.random(n)) / width
    sy = (py + rng.random(n)) / height
    aspect = width / height
    tan_half = np.tan(np.deg2rad(fov_deg) * 0.5)
    d = _norm(np.stack([-(2 * sx - 1) * tan_half,
                        (1 - 2 * sy) * tan_half / aspect,
                        np.ones(n)], -1)) @ mat[:3, :3].T
    o = np.broadcast_to(mat[:3, 3], (n, 3)).astype(np.float64).copy()
    # stratified-shifted uniform hero wavelengths, pdf = 1/range each
    u0 = rng.random(n)
    wl = (u0[:, None] + np.arange(n_wl) / n_wl) % 1.0
    wl = _WL_LO + wl * (_WL_HI - _WL_LO)                    # (n, n_wl)

    L = np.zeros((n, n_wl))
    beta = np.ones((n, n_wl))
    prev_pdf = np.zeros(n)
    active = np.ones(n, bool)

    for depth in range(max_depth):
        if not active.any():
            break
        t, f = ref.intersect(o, d)
        hit = f >= 0
        shape = np.where(hit, ref.face_shape[np.maximum(f, 0)], -1)
        em = np.where(hit & (shape >= 0),
                      ref.shape_emitter[np.maximum(shape, 0)], -1)

        def le_spec(eidx):
            c, sc = em_spec[eidx]
            return (_sigmoid_reflectance(c[None], wl)
                    * d65_at(wl) * sc)

        for e in ref.area:
            sel = active & (em == e["index"])
            if not sel.any():
                continue
            ng = ref.ng[np.maximum(f, 0)]
            cos_l = _dotv(-d, ng)
            pdf_l = np.where(cos_l > 1e-9,
                             t * t / np.maximum(cos_l * e["total_area"],
                                                1e-300), 0.0) / ref.n_em
            w = np.where(prev_pdf > 0, _mis(prev_pdf, pdf_l), 1.0)
            sel &= cos_l > 0
            L[sel] += w[sel, None] * beta[sel] * le_spec(e["index"])[sel]
        active &= hit
        if depth == max_depth - 1 or not active.any():
            break

        p_hit = o + d * np.where(np.isfinite(t), t, 0.0)[:, None]
        ng = ref.ng[np.maximum(f, 0)]
        cos_i = _dotv(ng, -d)
        shade = active & (shape >= 0) & (ref.kind[np.maximum(shape, 0)]
                                         == 0) & (cos_i > 0)
        active &= shade
        alb = _sigmoid_reflectance(coeffs[np.maximum(shape, 0)], wl)

        # NEE
        if ref.n_em:
            pick = rng.integers(0, ref.n_em, n)
            for ai, e in enumerate(ref.area):
                sel = shade & (pick == ai)
                if not sel.any():
                    continue
                probs = e["areas"] / e["areas"].sum()
                fi = rng.choice(len(probs), size=n, p=probs)
                r1, r2 = rng.random(n), rng.random(n)
                su = 1 - np.sqrt(1 - r1)
                sv = r2 * np.sqrt(1 - r1)
                pl = (e["v0"][fi] + e["e1"][fi] * su[:, None]
                      + e["e2"][fi] * sv[:, None])
                dl = pl - p_hit
                dist2 = _dotv(dl, dl)
                dist = np.sqrt(dist2)
                dl = dl / np.maximum(dist[:, None], 1e-12)
                cos_l = _dotv(-dl, e["n"][fi])
                pdf = np.where(cos_l > 1e-9, dist2 / np.maximum(
                    cos_l * e["total_area"], 1e-300), 0.0) / ref.n_em
                cos_s = _dotv(dl, ng)
                idx = np.where(sel & (pdf > 0) & (cos_s > 0))[0]
                if len(idx):
                    occ = ref.occluded(p_hit[idx], dl[idx], dist[idx])
                    idx = idx[~occ]
                if len(idx):
                    bpdf = cos_s[idx] / np.pi
                    w = _mis(pdf[idx], bpdf)
                    L[idx] += (beta[idx] * alb[idx]
                               * le_spec(e["index"])[idx]
                               * (cos_s[idx] / np.pi * w
                                  / pdf[idx])[:, None])

        # cosine BSDF sampling
        u1, u2 = rng.random(n), rng.random(n)
        rr_ = np.sqrt(u1)
        ph = 2 * np.pi * u2
        tx, ty = _frame(ng)
        wo_l = np.stack([rr_ * np.cos(ph), rr_ * np.sin(ph),
                         np.sqrt(np.maximum(0, 1 - u1))], -1)
        nd = (tx * wo_l[:, 0:1] + ty * wo_l[:, 1:2] + ng * wo_l[:, 2:3])
        pdf_b = wo_l[:, 2] / np.pi
        ok = shade & (pdf_b > 0)
        active &= ok
        beta = np.where(shade[:, None], beta * alb, beta)
        o = np.where(shade[:, None], p_hit + ng * 1e-5, o)
        d = np.where(shade[:, None], nd, d)
        prev_pdf = np.where(shade, pdf_b, prev_pdf)

    # develop: MC XYZ (raw CMFs, uniform-pdf weight = range), then sRGB
    cmf_at = np.stack([np.interp(wl, wl5, cmf[:, k]) for k in range(3)],
                      -1)                                  # (n, n_wl, 3)
    xyz = (cmf_at * L[..., None]).mean(1) * (_WL_HI - _WL_LO)
    rgb = xyz @ _XYZ_TO_SRGB.T
    img = rgb.reshape(width * height, spp, 3).mean(1).reshape(
        height, width, 3)
    return img.astype(np.float32)
