"""Fused path-tracing megakernel.

The profiled wavefront renderer is HBM-bound: every XLA fusion boundary
writes full wavefront state (~13 KB/lane/render). This kernel keeps the
ENTIRE path loop — camera ray generation, Woop/MXU intersection, MIS NEE,
cosine BSDF sampling, RNG, Russian roulette — in VMEM and writes only the
final radiance (16 B/lane). It is the logical endpoint of the reference's
GPU wavefront design (integrator.cpp:140-172) on a TPU memory hierarchy.

Fast-path scope (selected automatically by the path integrator, general
wavefront otherwise): diffuse BSDFs, area emitters, flat shading, rgb mode,
perspective pinhole camera, box filter, <= 2048 faces resident in VMEM.
Estimator semantics match path.cpp:92-234 (NEE + power-2 MIS + RR after
rr_depth) on the same TEA sampler substrate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_TILE = 512
MAX_FACES = 2048
_BIG = 3.0e38
_PI = 3.141592653589793


# ----------------------------------------------------------------------------
# in-kernel helpers (componentwise, VMEM-resident)
# ----------------------------------------------------------------------------

def _tea(v0, v1, rounds=5):
    u32 = lambda x: jnp.asarray(x, jnp.uint32)
    v0 = u32(v0)
    v1 = u32(v1)
    s = u32(0)
    for _ in range(rounds):
        s = s + u32(0x9E3779B9)
        v0 = v0 + (((v1 << 4) + u32(0xA341316C)) ^ (v1 + s)
                   ^ ((v1 >> 5) + u32(0xC8013EA4)))
        v1 = v1 + (((v0 << 4) + u32(0xAD90777D)) ^ (v0 + s)
                   ^ ((v0 >> 5) + u32(0x7E95761E)))
    return v0, v1


def _u01(bits):
    return ((bits >> 9) | jnp.uint32(0x3F800000)).view(jnp.float32) - 1.0


def _rng2(key, dim):
    v0, v1 = _tea(key, jnp.full_like(key, jnp.uint32(dim)))
    return _u01(v0), _u01(v1)


def _concentric(u1, u2):
    x = 2.0 * u1 - 1.0
    y = 2.0 * u2 - 1.0
    zero = (x == 0.0) & (y == 0.0)
    q13 = jnp.abs(x) < jnp.abs(y)
    r = jnp.where(q13, y, x)
    rp = jnp.where(q13, x, y)
    phi = 0.25 * _PI * rp / jnp.where(r == 0.0, 1.0, r)
    phi = jnp.where(q13, 0.5 * _PI - phi, phi)
    phi = jnp.where(zero, 0.0, phi)
    return r * jnp.cos(phi), r * jnp.sin(phi)


def _mis(a, b):
    a2 = a * a
    b2 = b * b
    return jnp.where(a2 > 0, a2 / jnp.maximum(a2 + b2, 1e-30), 0.0)


def _isect(ox, oy, oz, dx, dy, dz, wu, wv, wz, mint, maxt, face_valid):
    """Woop intersection against all resident faces.
    Returns (t, pick) with pick (R,F) the one-hot float of the hit face."""
    oh = jnp.stack([ox, oy, oz, jnp.ones_like(ox)], axis=1)     # (R,4)
    dh = jnp.stack([dx, dy, dz, jnp.zeros_like(dx)], axis=1)
    U = jnp.dot(oh, wu, preferred_element_type=jnp.float32)      # (R,F)
    V = jnp.dot(oh, wv, preferred_element_type=jnp.float32)
    Z = jnp.dot(oh, wz, preferred_element_type=jnp.float32)
    DU = jnp.dot(dh, wu, preferred_element_type=jnp.float32)
    DV = jnp.dot(dh, wv, preferred_element_type=jnp.float32)
    DZ = jnp.dot(dh, wz, preferred_element_type=jnp.float32)
    dz_ok = jnp.abs(DZ) > 1e-12
    t = -Z / jnp.where(dz_ok, DZ, 1.0)
    u = U + t * DU
    v = V + t * DV
    ok = (dz_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t >= mint[:, None]) & (t <= maxt[:, None])
          & face_valid[None, :])
    t = jnp.where(ok, t, _BIG)
    tmin = jnp.min(t, axis=1, keepdims=True)
    face_ids = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    cand = jnp.where((t <= tmin) & ok, face_ids, jnp.int32(0x7FFFFFFF))
    k = jnp.min(cand, axis=1, keepdims=True)
    pick = ((face_ids == k) & ok).astype(jnp.float32)
    return tmin[:, 0], pick


def _path_kernel(cam_ref, meta_ref, wu_ref, wv_ref, wz_ref, fattr_ref,
                 lt_ref, out_ref, *, max_depth, rr_depth, n_faces, spp_pass,
                 width, height):
    """One program = RAY_TILE full camera paths resident in VMEM.

    cam_ref (1,16) SMEM: [R00..R22 row-major dir basis (cols = camera x,y,z
        axes), origin(3), tan_half_fov, seed, sample_base, pad]
    wu/wv/wz (4,F): Woop transforms.
    fattr (F,16): ng(0:3) albedo(3:6) Le(6:9) light_pdf_w(9) pad.
    lt (L,24): light faces: v0(0:3) e1(3:6) e2(6:9) n(9:12) cdf(12)
        weight(13) radiance(14:17) pad.
    out (R,4): rgb + valid flag.
    """
    i = pl.program_id(0)
    R = out_ref.shape[0]

    lane = i * R + jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)[:, 0]
    pixel = lane // spp_pass
    samp = lane % spp_pass + meta_ref[0, 1]
    px = (pixel % width).astype(jnp.float32)
    py = (pixel // width).astype(jnp.float32)
    mixed, _ = _tea(pixel.astype(jnp.uint32), samp.astype(jnp.uint32), 4)
    seed_vec = jnp.full_like(mixed, meta_ref[0, 0].astype(jnp.uint32))
    key, _ = _tea(seed_vec, mixed, 4)

    # film jitter = sampler dims (0,1), like the general wavefront
    jx, jy = _rng2(key, 0)
    sx = (px + jx) / width
    sy = (py + jy) / height
    cam = [cam_ref[0, k] for k in range(13)]  # SMEM: scalar loads only
    tan_half = cam[12]
    aspect = width / height
    cx = -(2.0 * sx - 1.0) * tan_half
    cy = (1.0 - 2.0 * sy) * tan_half / aspect
    inv_len = jax.lax.rsqrt(cx * cx + cy * cy + 1.0)
    lx, ly, lz = cx * inv_len, cy * inv_len, inv_len
    dx = cam[0] * lx + cam[1] * ly + cam[2] * lz
    dy = cam[3] * lx + cam[4] * ly + cam[5] * lz
    dz = cam[6] * lx + cam[7] * ly + cam[8] * lz
    ox = jnp.full((R,), cam[9])
    oy = jnp.full((R,), cam[10])
    oz = jnp.full((R,), cam[11])

    wu = wu_ref[:]
    wv = wv_ref[:]
    wz = wz_ref[:]
    fattr = fattr_ref[:]
    lt = lt_ref[:]
    F = wu.shape[1]
    L = lt.shape[0]
    face_valid = jax.lax.broadcasted_iota(jnp.int32, (F,), 0) < n_faces

    zero = jnp.zeros((R,))
    one = jnp.ones((R,))
    state = (ox, oy, oz, dx, dy, dz,
             one, one, one,            # throughput
             zero, zero, zero,         # result
             jnp.ones((R,), bool),     # active
             zero,                     # prev bsdf pdf (0 => camera ray)
             jnp.zeros((R,), bool))    # valid (first hit)

    def bounce(depth, state):
        (ox, oy, oz, dx, dy, dz, thr_r, thr_g, thr_b,
         res_r, res_g, res_b, active, prev_pdf, valid) = state
        dim0 = 2 + depth * 8

        t, pick = _isect(ox, oy, oz, dx, dy, dz, wu, wv, wz,
                         zero, jnp.full((R,), _BIG), face_valid)
        hit = t < _BIG * 0.5
        valid = valid | jnp.where(depth == 0, hit, jnp.zeros_like(hit))
        A = jnp.dot(pick, fattr, preferred_element_type=jnp.float32)
        ngx, ngy, ngz = A[:, 0], A[:, 1], A[:, 2]
        alb_r, alb_g, alb_b = A[:, 3], A[:, 4], A[:, 5]
        le_r, le_g, le_b = A[:, 6], A[:, 7], A[:, 8]
        lpdf_w = A[:, 9]

        # --- emission with MIS against NEE (one-sided) ---
        cos_hit = -(dx * ngx + dy * ngy + dz * ngz)
        pdf_l_hit = jnp.where(cos_hit > 1e-6,
                              t * t * lpdf_w / jnp.maximum(cos_hit, 1e-6),
                              0.0)
        em_w = jnp.where(prev_pdf > 0.0, _mis(prev_pdf, pdf_l_hit), 1.0)
        wgt = jnp.where(active & hit & (cos_hit > 0), em_w, 0.0)
        res_r = res_r + wgt * thr_r * le_r
        res_g = res_g + wgt * thr_g * le_g
        res_b = res_b + wgt * thr_b * le_b
        active = active & hit

        # shading point + front-side normal
        sgn = jnp.where(cos_hit >= 0, 1.0, -1.0)
        nx, ny, nz = ngx * sgn, ngy * sgn, ngz * sgn
        pxx = ox + t * dx
        pyy = oy + t * dy
        pzz = oz + t * dz
        eps = (1.0 + jnp.maximum(jnp.abs(pxx),
                                 jnp.maximum(jnp.abs(pyy),
                                             jnp.abs(pzz)))) * 1.8e-4

        # --- russian roulette (path.cpp:133-141) ---
        rr_u, _ = _rng2(key, dim0 + 0)
        mx = jnp.maximum(thr_r, jnp.maximum(thr_g, thr_b))
        q = jnp.minimum(mx, 0.95)
        do_rr = depth + 1 > rr_depth
        cont = jnp.logical_or(jnp.logical_not(do_rr), rr_u < q)
        active = active & cont
        inv_q = jnp.where(do_rr, 1.0 / jnp.maximum(q, 1e-8), 1.0)
        thr_r = thr_r * inv_q
        thr_g = thr_g * inv_q
        thr_b = thr_b * inv_q

        # --- NEE over the light-face CDF ---
        u_sel, u_b1 = _rng2(key, dim0 + 1)
        u_b2, _ = _rng2(key, dim0 + 2)
        cdf = lt[:, 12]
        li = jnp.sum((cdf[None, :] <= u_sel[:, None]).astype(jnp.int32),
                     axis=1)
        lids = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
        lpick = (lids == jnp.minimum(li, L - 1)[:, None]).astype(jnp.float32)
        LT = jnp.dot(lpick, lt, preferred_element_type=jnp.float32)
        s_t = jnp.sqrt(jnp.maximum(1.0 - u_b1, 0.0))
        bu = 1.0 - s_t
        bv = u_b2 * s_t
        plx = LT[:, 0] + LT[:, 3] * bu + LT[:, 6] * bv
        ply = LT[:, 1] + LT[:, 4] * bu + LT[:, 7] * bv
        plz = LT[:, 2] + LT[:, 5] * bu + LT[:, 8] * bv
        lnx, lny, lnz = LT[:, 9], LT[:, 10], LT[:, 11]
        lw = LT[:, 13]
        lrad_r, lrad_g, lrad_b = LT[:, 14], LT[:, 15], LT[:, 16]

        dxl = plx - pxx
        dyl = ply - pyy
        dzl = plz - pzz
        dist2 = dxl * dxl + dyl * dyl + dzl * dzl
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
        inv_dist = 1.0 / dist
        dxl, dyl, dzl = dxl * inv_dist, dyl * inv_dist, dzl * inv_dist
        cos_l = -(dxl * lnx + dyl * lny + dzl * lnz)
        cos_s = dxl * nx + dyl * ny + dzl * nz
        pdf_l = jnp.where(cos_l > 1e-6,
                          dist2 * lw / jnp.maximum(cos_l, 1e-6), 0.0)
        # NEE at vertex k+1 creates a path of length k+2: allowed only while
        # k+2 <= max_depth (matches path.cpp's loop structure: max_depth
        # emissions, max_depth-1 NEE terms)
        nee_ok = active & (pdf_l > 0) & (cos_s > 0) \
            & (depth < max_depth - 1)
        ts, _ = _isect(pxx + nx * eps, pyy + ny * eps, pzz + nz * eps,
                       dxl, dyl, dzl, wu, wv, wz,
                       zero, dist * (1.0 - 1e-3), face_valid)
        unoccluded = ts >= _BIG * 0.5
        bsdf_pdf_l = cos_s / _PI
        w_nee = _mis(pdf_l, bsdf_pdf_l)
        scale = jnp.where(nee_ok & unoccluded,
                          w_nee * cos_s
                          / (_PI * jnp.maximum(pdf_l, 1e-20)), 0.0)
        res_r = res_r + thr_r * alb_r * scale * lrad_r
        res_g = res_g + thr_g * alb_g * scale * lrad_g
        res_b = res_b + thr_b * alb_b * scale * lrad_b

        # --- cosine-hemisphere BSDF sample ---
        u_c1, u_c2 = _rng2(key, dim0 + 4)
        cx_, cy_ = _concentric(u_c1, u_c2)
        cz_ = jnp.sqrt(jnp.maximum(1.0 - cx_ * cx_ - cy_ * cy_, 0.0))
        s = jnp.where(nz >= 0, 1.0, -1.0)
        a = -1.0 / (s + nz)
        b = nx * ny * a
        ndx = (1.0 + s * nx * nx * a) * cx_ + b * cy_ + nx * cz_
        ndy = (s * b) * cx_ + (s + ny * ny * a) * cy_ + ny * cz_
        ndz = (-s * nx) * cx_ + (-ny) * cy_ + nz * cz_
        bsdf_pdf = cz_ / _PI
        thr_r = thr_r * jnp.where(active, alb_r, 1.0)
        thr_g = thr_g * jnp.where(active, alb_g, 1.0)
        thr_b = thr_b * jnp.where(active, alb_b, 1.0)
        active = active & (bsdf_pdf > 0) \
            & ((thr_r + thr_g + thr_b) > 0)
        prev_pdf = bsdf_pdf

        return (pxx + nx * eps, pyy + ny * eps, pzz + nz * eps,
                ndx, ndy, ndz, thr_r, thr_g, thr_b,
                res_r, res_g, res_b, active, prev_pdf, valid)

    # unrolled bounce loop (static max_depth keeps Mosaic happy and lets
    # the compiler schedule across bounces)
    for depth in range(max_depth):
        state = bounce(depth, state)
    (_, _, _, _, _, _, _, _, _,
     res_r, res_g, res_b, _, _, valid) = state
    out_ref[:, 0] = res_r
    out_ref[:, 1] = res_g
    out_ref[:, 2] = res_b
    out_ref[:, 3] = valid.astype(jnp.float32)


# ----------------------------------------------------------------------------
# host-side wrapper
# ----------------------------------------------------------------------------

class DiffusePathMegakernel:
    """Builds device tables once and renders pixel-major wavefronts."""

    def __init__(self, scene, interpret: bool = False):
        from .intersect_pallas import build_woop
        g = scene.geom
        v0 = np.asarray(g.v0)
        e1 = np.asarray(g.e1)
        e2 = np.asarray(g.e2)
        wu, wv, wz = build_woop(v0, e1, e2)
        self.n_faces = wu.shape[1]
        F = max(128, int(np.ceil(self.n_faces / 128)) * 128)
        padw = F - self.n_faces

        def padW(w, never=False):
            z = np.zeros((4, padw), np.float32)
            if never:
                z[3] = 1.0
            return np.concatenate([w, z], 1) if padw else w

        self.wu = jnp.asarray(padW(wu))
        self.wv = jnp.asarray(padW(wv))
        self.wz = jnp.asarray(padW(wz, never=True))

        # face attribute table (static parts as numpy; albedo/Le traced)
        fs = np.asarray(g.face_shape)
        ng = np.asarray(g.ng)
        # per-shape albedo from the (merged or plain) diffuse instances
        self._scene = scene
        self._fs = fs
        self._F = F
        # emissive faces -> light table
        le_face = np.zeros((self.n_faces, 3), np.float32)
        lpdf_w = np.zeros((self.n_faces,), np.float32)
        lights = []
        emitters = [e for e in scene.emitters
                    if getattr(e, "_packed", False)]
        n_em = len(scene.emitters)
        for e in emitters:
            areas = np.asarray(e.face_distr.pmf)
            v0e = np.asarray(e.tv0)
            e1e = np.asarray(e.te1)
            e2e = np.asarray(e.te2)
            ne = np.asarray(e.tn)
            rad = np.asarray(e.radiance._rgb_np, np.float32).reshape(3)
            w_e = 1.0 / (e.total_area * n_em)
            # per-face pdf weight + radiance on the global face table
            sidx = scene.shapes.index(e.shape)
            mask = fs == sidx
            le_face[mask] = rad
            lpdf_w[mask] = w_e
            for k in range(len(areas)):
                lights.append(np.concatenate([
                    v0e[k], e1e[k], e2e[k], ne[k],
                    [0.0, w_e], rad, [0.0] * 7]))
        lights = np.asarray(lights, np.float32)
        # cdf over light faces with weights area_f/(area_e*n_em)
        wts = np.asarray([
            0.5 * np.linalg.norm(np.cross(l[3:6], l[6:9])) * l[13]
            for l in lights]) if len(lights) else np.ones(1)
        cdf = np.cumsum(wts / max(wts.sum(), 1e-20))
        if len(lights) == 0:
            lights = np.zeros((1, 24), np.float32)
            lights[0, 12] = 1.0
        else:
            lights[:, 12] = cdf
        Lp = max(8, int(np.ceil(len(lights) / 8)) * 8)
        if Lp > len(lights):
            padl = np.zeros((Lp - len(lights), 24), np.float32)
            padl[:, 12] = 2.0  # cdf sentinel: never selected
            lights = np.concatenate([lights, padl])
        self.lights = jnp.asarray(lights)

        fattr = np.zeros((F, 16), np.float32)
        fattr[:self.n_faces, 0:3] = ng
        fattr[:self.n_faces, 6:9] = le_face
        fattr[:self.n_faces, 9] = lpdf_w
        self._fattr_static = fattr
        self.interpret = interpret

    def _fattr(self):
        """(F,16) with traced per-shape albedo columns (differentiable)."""
        scene = self._scene
        alb_by_shape = []
        for s in scene.shapes:
            tex = s.bsdf.reflectance if hasattr(s.bsdf, "reflectance") \
                else None
            alb_by_shape.append(tex.data.rgb if tex is not None
                                else jnp.zeros(3))
        alb = jnp.stack([jnp.broadcast_to(a, (3,)) for a in alb_by_shape])
        face_alb = alb[self._fs]  # static indices -> cheap
        static = jnp.asarray(self._fattr_static)
        return static.at[:self.n_faces, 3:6].set(face_alb)

    def render_pass(self, sensor, seed, sample_base, spp_pass):
        film = sensor.film
        w, h = film.crop_size
        n = w * h * spp_pass
        n_tiles = n // RAY_TILE
        assert n % RAY_TILE == 0
        mat = jnp.asarray(np.asarray(sensor.world_transform.matrix,
                                     np.float32))
        tan_half = float(np.tan(np.deg2rad(sensor.x_fov) * 0.5))
        cam = jnp.concatenate([
            mat[:3, :3].reshape(-1), mat[:3, 3],
            jnp.asarray([tan_half], jnp.float32),
            jnp.zeros(3, jnp.float32)])[None]
        meta = jnp.stack([jnp.asarray(seed, jnp.int32),
                          jnp.asarray(sample_base, jnp.int32)])[None]
        kernel = functools.partial(
            _path_kernel,
            max_depth=self.max_depth, rr_depth=self.rr_depth,
            n_faces=self.n_faces, spp_pass=spp_pass, width=w, height=h)
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 16), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((4, self.wu.shape[1]), lambda i: (0, 0)),
                pl.BlockSpec((4, self.wu.shape[1]), lambda i: (0, 0)),
                pl.BlockSpec((4, self.wu.shape[1]), lambda i: (0, 0)),
                pl.BlockSpec((self._F, 16), lambda i: (0, 0)),
                pl.BlockSpec((self.lights.shape[0], 24), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((RAY_TILE, 4), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
            interpret=self.interpret,
        )(cam, meta, self.wu, self.wv, self.wz, self._fattr(), self.lights)
        # pixel-major box-filter reduction; filter weight = 1 per sample
        out = out.at[:, 3].set(1.0)
        img = out.reshape(w * h, spp_pass, 4).sum(axis=1)
        return img.reshape(h, w, 4)


def scene_supports_megakernel(scene) -> bool:
    """Fast-path eligibility check."""
    from ..models.bsdfs import SmoothDiffuse
    from ..models.textures import ConstantTexture
    from ..models.emitters import AreaEmitter
    from ..render.scene import _PerShapeTexture
    from ..variants import current
    if not current().is_rgb:
        return False
    if scene.has_media or scene.environment_emitter is not None:
        return False
    if getattr(scene, "n_spheres", 0):
        return False   # analytic quadrics take the wavefront path
    if scene.geom.v0.shape[0] > MAX_FACES or scene.geom.v0.shape[0] == 0:
        return False
    for b in scene.bsdfs:
        if type(b) is not SmoothDiffuse:
            return False
        if not isinstance(b.reflectance, (ConstantTexture, _PerShapeTexture)):
            return False
    for e in scene.emitters:
        if type(e) is not AreaEmitter:
            return False
        if e.radiance.is_spatially_varying():
            return False
    for s in scene.shapes:
        if s.bsdf is None or not hasattr(s.bsdf, "reflectance"):
            return False
        tex = getattr(s.bsdf, "reflectance", None)
        if tex is not None and not isinstance(tex, ConstantTexture):
            return False
    return True
