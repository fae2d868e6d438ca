"""Fused path-tracing megakernel (v4, dense shading layout).

The profiled wavefront renderer is HBM-bound: every XLA fusion boundary
writes full wavefront state (~13 KB/lane/render). This kernel keeps one
whole path bounce — Woop/MXU intersection, analytic sphere quadrics, MIS
NEE, diffuse + GGX-conductor shading, envmap lookups, RNG, Russian
roulette — in VMEM, carrying only 64 B/lane of compact path state through
HBM between bounces. It is the logical endpoint of the reference's GPU
wavefront design (integrator.cpp:140-172) on a TPU memory hierarchy.

v4 layout (measured: v3's ~300 per-lane shading ops ran on ``(R,)``
vectors, which Mosaic lays out as (1, R) — one sublane of eight used, a
21x density loss vs a dense (G, 128) grid on this VPU):
- per-lane path state and ALL shading math live on a dense ``(G, 128)``
  ray grid (G = RAY_TILE/128 sublane groups), so every VPU op uses all
  8 sublanes; the HBM state block is ``(16, G, 128)`` per tile;
- the face sweep stays face-major ``(C, R)`` with rays on the lane axis
  (that layout is already dense and feeds the Woop MXU matmuls); cheap
  row reshapes (measured ~free) bridge the two layouts at the sweep
  boundary;
- one bounce per ``pallas_call`` with the full spp wavefront in a single
  launch; dead tiles copy state through and skip all compute;
- the final bounce is statically specialized to emission-only (no RR,
  NEE, shadow sweep, or BSDF sampling).

Fast-path scope (selected automatically by the path integrator, general
wavefront otherwise):
- BSDFs: diffuse (constant/per-shape/checkerboard albedo), rough
  conductors (GGX, isotropic alpha >= 0.01, constant IOR/specular
  scale), smooth dielectrics (two delta lobes, refraction + eta-aware
  RR), smooth plastic and rough plastic (GGX coat, constant textures),
- emitters: area lights (NEE + power-2 MIS) and ONE lat-long envmap
  (rigid to_world rotations applied in-kernel; importance-sampled env
  NEE via in-kernel marginal/conditional CDF inversion, MIS-complete
  escape weights — envmap.cpp:67 + scene.cpp:165-214 semantics),
- shapes: triangles (VMEM tables <= MAX_FACES; above that an HBM BVH
  tier with pair-node traversal + double-buffered leaf DMA lifts the
  cap to MAX_FACES_HBM) + analytic spheres/disks/cylinders,
- rgb, mono, and spectral (hero-wavelength, in-kernel XYZ develop)
  modes; perspective pinhole camera; all separable rfilters (box fast
  path, shift-splat for gaussian/tent/mitchell/lanczos); flat shading.
Estimator semantics otherwise match path.cpp:92-234 (NEE + power-2 MIS +
RR after rr_depth) on the same TEA sampler substrate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os
RAY_TILE = int(_os.environ.get("MK_TILE", "2048"))
# HBM-tier ray tile: per-row (128-lane) sweep masks make sweep work
# insensitive to tile size, while pops amortize over more rays
_HBM_TILE = int(_os.environ.get("MK_HBM_TILE", "1024"))
# ablation knobs (perf analysis only — bias the image when set)
_ABL_NO_SHADOW = _os.environ.get("MK_NO_SHADOW") == "1"
_ABL_NO_NEE = _os.environ.get("MK_NO_NEE") == "1"
# profiling: HBM-tier traversal counters ride the result channels
# (image becomes [node pops, leaf encounters, row sweeps] totals)
_ABL_SWEEP_STATS = _os.environ.get("MK_SWEEP_STATS") == "1"
# HBM-tier cost isolation (image goes black/wrong — timing only):
# NO_LEAF skips leaf handling entirely (pure pop-loop cost);
# NO_SWEEP starts the leaf DMAs but never sweeps (pops + DMA cost)
_ABL_NO_LEAF = _os.environ.get("MK_NO_LEAF") == "1"
_ABL_NO_SWEEP = _os.environ.get("MK_NO_SWEEP") == "1"
# keep the per-row pl.when dispatch but empty the sweep body: isolates
# Mosaic's predicated-region entry cost from the sweep's vector work
_ABL_SWEEP_EMPTY = _os.environ.get("MK_SWEEP_EMPTY") == "1"
# skip the winner's attribute pick + accumulator update (t-only sweep):
# isolates the _dotpick matmul + 48-row acc RMW share of the sweep body
_ABL_NO_ATTR = _os.environ.get("MK_NO_ATTR") == "1"
# HBM tier: deferred (per-winning-leaf) vs eager (per-chunk) attribute
# resolution — see _sweep_q / the resolve loop in closest_hit
_DEFER_ATTR = _os.environ.get("MK_DEFER_ATTR", "1") == "1"
VMEM_LIMIT = 100 * 1024 * 1024   # scoped-vmem cap requested from Mosaic
FACE_CHUNK = 128         # faces per VMEM sweep when F > FACE_CHUNK
# beyond this many chunks the face sweep switches from the unrolled loop
# to a fori_loop with two-level BVH-AABB culling (see _path_kernel)
UNROLLED_CHUNKS = 8
SUPER = 8                # chunks per super-chunk (second culling level)
MAX_FACES = 65536        # VMEM-resident tables: 64k faces ~ 13.6 MB
# beyond MAX_FACES the face tables stay in HBM: a range-median BVH over
# 512-face leaves is traversed per ray tile with an SMEM stack, surviving
# leaves DMA'd into VMEM scratch and swept (kdtree.h:2079's role, tiled)
LEAF_CHUNKS = int(_os.environ.get("MK_LEAF_CHUNKS", "2"))
#              FACE_CHUNK-chunks per HBM leaf (256 faces). 128-face
#              leaves measure +3% at 262k faces under the deferred
#              resolve (r5 ablation) but halve the 4096-leaf tier cap
#              to 524k faces — MK_LEAF_CHUNKS=1 opts in per run.
MAX_FACES_HBM = 4096 * LEAF_CHUNKS * FACE_CHUNK   # 1M faces (4096 leaves)
_STACK_DEPTH = 64
MAX_SPHERES = 64
MAX_ENV_W = 256          # env table (3W, H) must stay VMEM-friendly
_MONO_LUM = np.array([0.212671, 0.715160, 0.072169], np.float32)
_BIG = 3.0e38
_PI = 3.141592653589793

# state rows (HBM layout (rows, n) float32), nc = color channels (3 rgb /
# 4 spectral hero wavelengths):
# 0:3 o | 3:6 d | 6:6+nc throughput | 6+nc:6+2nc result | 6+2nc prev_pdf
# | +1 active | +2 rng key (uint32 bits) | +3 eta (relative IOR product)
# | +4 pixel id (f32-exact below 2^24) — lanes are re-sorted between
# bounces (see render_pass), so pixel identity must ride the state
_ROWS = 17          # rgb rows incl. pixel (back-compat constant)


def _state_rows(nc, carry_pixel, carry_leaf=False):
    # carry_leaf (HBM tier only): the bounce's hit-leaf id rides one
    # extra row so the host resort can key rows on it — rays that left
    # the same BVH leaf share their near-field overlap set, which is
    # what bounds each 128-ray row's swept-leaf union (see _resort)
    return 6 + 2 * nc + 4 + (1 if carry_pixel else 0) \
        + (1 if carry_leaf else 0)


# ----------------------------------------------------------------------------
# in-kernel helpers (componentwise, VMEM-resident)
# ----------------------------------------------------------------------------

def _split_bf16(a):
    hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, a - hi


def _dot3(a, b):
    """~f32-accurate matmul from 3 bf16 MXU passes (error ~2^-16).

    Mosaic supports only DEFAULT (1 bf16 pass — measured 1% geometry error
    that self-shadowed NEE and darkened renders 18-45%) and HIGHEST (6
    passes — measured 2x whole-render cost). This is the missing middle.
    """
    a_hi, a_lo = _split_bf16(a)
    b_hi, b_lo = _split_bf16(b)
    p = jax.lax.Precision.DEFAULT   # intentionally 1-pass bf16 per product
    return (jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32,
                    precision=p)
            + jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32,
                      precision=p)
            + jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32,
                      precision=p))


def _dot3T(aT, b):
    """_dot3 with a transposed lhs: contract aT's FIRST axis with b's
    first axis ((K, M) x (K, N) -> (M, N)). Storing the Woop table as
    (4, 3F) instead of (3F, 4) cuts its VMEM footprint 16x (a 4-lane
    row-major table wastes 124/128 lanes of every tile)."""
    a_hi, a_lo = _split_bf16(aT)
    b_hi, b_lo = _split_bf16(b)
    p = jax.lax.Precision.DEFAULT
    dn = (((0,), (0,)), ((), ()))
    f = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                          preferred_element_type=jnp.float32, precision=p)
    return f(a_lo, b_hi) + f(a_hi, b_lo) + f(a_hi, b_hi)


def _dotpick(table, pick):
    """table @ one-hot pick, f32-accurate in ONE MXU op: 0/1 picks are
    bf16-exact, so stack the table's hi/lo halves on the M axis and add."""
    t_hi, t_lo = _split_bf16(table)
    m = table.shape[0]
    out = jnp.dot(jnp.concatenate([t_hi, t_lo], axis=0), pick,
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
    return out[:m] + out[m:]


def _atan2(y, x):
    """Polynomial atan2 (~1e-5 rad): Mosaic has no atan2 lowering and the
    envmap uv only needs sub-texel accuracy."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    z = jnp.minimum(ax, ay) / jnp.maximum(jnp.maximum(ax, ay), 1e-30)
    z2 = z * z
    p = z * (0.99986600 + z2 * (-0.33029950 + z2 * (0.18014100 + z2 * (
        -0.08513300 + z2 * 0.02083510))))
    p = jnp.where(ay > ax, 0.5 * _PI - p, p)
    p = jnp.where(x < 0, _PI - p, p)
    return jnp.where(y < 0, -p, p)


def _acos(x):
    """acos via _atan2 (Mosaic also lacks an acos lowering)."""
    x = jnp.clip(x, -1.0, 1.0)
    return _atan2(jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)), x)


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


def _mix32(key, dim):
    """Cheap per-dimension counter RNG: Weyl-offset murmur3 finalizer
    (~10 VPU ops vs ~80 for a 5-round TEA pair). `key` is the per-path
    TEA-whitened uint32 chain key; `dim` a (possibly traced) dimension
    id. The finalizer is a full-avalanche bijection of the Weyl
    sequence — the standard production-PT stream construction
    (PCG-RXS-M-XS class) — used for the high-count volumetric tracking
    streams where TEA's cost dominates the launch (pcg32.h's role at a
    tenth of the ops)."""
    d = jnp.asarray(dim).astype(jnp.uint32)
    h = key + d * jnp.uint32(0x9E3779B9)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


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


def _fresnel_cond(c, eta, k):
    """Exact unpolarized conductor Fresnel (fresnel.h fresnel_conductor)."""
    c2 = c * c
    s2 = 1.0 - c2
    eta2 = eta * eta - k * k
    etak2 = 2.0 * eta * k
    t0 = eta2 - s2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + etak2 * etak2, 0.0))
    t1 = a2b2 + c2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * c
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
    return 0.5 * (rp + rs)


def _ggx_d(hz, a):
    a2 = a * a
    d = hz * hz * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(_PI * d * d, 1e-20)


def _ggx_g1(cz, a):
    """Smith G1 for isotropic GGX from the cosine alone."""
    cz = jnp.maximum(cz, 1e-6)
    a2 = a * a
    t2 = (1.0 - cz * cz) / (cz * cz)
    return 2.0 / (1.0 + jnp.sqrt(1.0 + a2 * t2))


# ---- spectral-mode helpers (hero-wavelength transport in-kernel) -----------
# Matches core/spectrum.py sample_shifted + sample_rgb_spectrum and
# render/srgb.py srgb_model_eval (sigmoid polynomial), so the megakernel's
# spectral estimator agrees with the general wavefront's.
_WL_MIN = 360.0
_WL_MAX = 830.0
_D65_ROWS = 96           # 95-sample CIE table padded to a sublane multiple


def _sigmoid_poly(c0, c1, c2, x):
    """Jakob-Hanika sigmoid reflectance at normalized wavelength x."""
    t = (c0 * x + c1) * x + c2
    return 0.5 + t / (2.0 * jnp.sqrt(1.0 + t * t))


def _wl_norm(wl):
    return (wl - _WL_MIN) / (_WL_MAX - _WL_MIN) * 2.0 - 1.0


def _hero_wavelengths(key, nc):
    """Per-lane hero wavelengths (nc arrays shaped like key) regenerated
    from the path's TEA key at sampler dim 1 (constant along the path).
    Mosaic has no atanh/cosh lowering: atanh via log, cosh via exp."""
    u, _ = _rng2(key, 1)
    wls = []
    wts = []
    for c in range(nc):
        uc = u + c * (1.0 / nc)
        uc = uc - jnp.floor(uc)
        arg = 0.8569106254698279 - 1.8275019724092267 * uc
        ath = 0.5 * jnp.log((1.0 + arg)
                            / jnp.maximum(1.0 - arg, 1e-12))
        wl = 538.0 - ath * 138.88888888888889
        e = jnp.exp(0.0072 * (wl - 538.0))
        ch = 0.5 * (e + 1.0 / e)
        wls.append(wl)
        wts.append(253.82 * ch * ch)
    return wls, wts


# fattr layout (F, 40) built row-major, fed to the kernel transposed (40, F):
#   ng 0:3 | albedo/c0 3:6 | Le 6:9 | lpdf_w 9
#   kind 10 (0 diffuse, 1 ggx-conductor, 2 diffuse-checkerboard,
#            3 dielectric, 4 plastic, 5 roughplastic) | alpha 11
#   eta 12:15 | k 15:18 | c2 18:21 (checker color1 / dielectric
#   specular_transmittance / plastic specular_reflectance) | uv0 21:23
#   duv1 23:25 | duv2 25:27 | to_uv affine [m00 m01 m03 m10 m11 m13] 27:33
#   | diel/plastic: eta_d 33, spec_sampling_weight 34, fdr_int 35,
#   inv_eta2 36, nonlinear 37 | flip (qattr only) 38 | pad 39
#   | bitmap-albedo atlas region 40:43 [v_off, tex_w, tex_h] | pad 43:48
# albedo (3:6) = diffuse/specular reflectance per kind (traced, see
# _shape_albedo); c2 (18:21) is also traced (_shape_c1).
# kind 6 = diffuse with bitmap albedo (atlas fetch at the hit uv).
_FA_COLS = 48
ATLAS_W = 64             # minimum atlas width (the actual atlas width is
#                          the widest scene texture, padded to 8)
MAX_ATLAS_W = 1024       # per-texture width cap (fetch matmul is O(W))
MAX_ATLAS_H = 2048       # total stacked texture rows (VMEM budget)


def _fresnel_diel(cos_i, eta):
    """Unpolarized dielectric Fresnel (render/fresnel.py:13 semantics).
    Returns (F, cos_t_signed, eta_it, eta_ti); handles both sides."""
    outside = cos_i >= 0
    rcp = 1.0 / eta
    eta_it = jnp.where(outside, eta, rcp)
    eta_ti = jnp.where(outside, rcp, eta)
    c2t = 1.0 - eta_ti * eta_ti * (1.0 - cos_i * cos_i)
    aci = jnp.abs(cos_i)
    act_ = jnp.sqrt(jnp.maximum(c2t, 0.0))
    a_s = (aci - eta_it * act_) / jnp.maximum(aci + eta_it * act_, 1e-20)
    a_p = (eta_it * aci - act_) / jnp.maximum(eta_it * aci + act_, 1e-20)
    F = 0.5 * (a_s * a_s + a_p * a_p)
    F = jnp.where(eta == 1.0, 0.0, jnp.where(c2t <= 0.0, 1.0, F))
    cos_t = jnp.where(cos_i >= 0, -act_, act_)
    return F, cos_t, eta_it, eta_ti


def _path_kernel(cam_ref, meta_ref, woop_ref, fattr_ref, lt_ref, sph_ref,
                 sattr_ref, qd_ref, qattr_ref, env_ref, envs_ref, atlas_ref,
                 d65_ref, cab_ref, scab_ref, nodes_ref, ab_ref,
                 st_in_ref, st_out_ref,
                 acc_ref, wbuf_ref, abuf_ref, stk_ref, pp_ref, dsem_ref, *,
                 depth, max_depth, rr_depth, n_faces, chunk, spp_pass,
                 width, height, n_lanes, has_spheres, has_quads, has_env,
                 has_checker, has_bitmap, has_ggx, has_diel, has_plastic,
                 env_w, env_h, env_ws, env_hs, streamed, carry_pixel,
                 nc=3, spectral=False,
                 p_env=0.0, env_rot=None, env_rot_inv=None, hbm=False,
                 carry_leaf=False):
    """One program = one path bounce at static ``depth`` for RAY_TILE rays.

    cam_ref (1,16) SMEM: [R00..R22 row-major dir basis (cols = camera x,y,z
        axes), origin(3), tan_half_fov, pad]
    meta_ref (1,4) SMEM int32: [seed, sample_base, pixel_base, pad]
    woop_ref (4, n_chunks*3C): per-chunk [Wu | Wv | Wz] column blocks,
        transposed (4-row layout wastes only half a tile's sublanes vs
        124/128 lanes for the (3F, 4) layout); padded faces carry the
        never-hit transform (Z=1, DZ=0).
    fattr (40, F): transposed face attributes (_FA_COLS comment above).
    lt (24, L): light faces: v0(0:3) e1(3:6) e2(6:9) n(9:12) cdf(12)
        weight(13) radiance(14:17) pad.
    sph (8, S): analytic spheres cx cy cz r valid. sattr (40, S):
        fattr-layout shading attributes per sphere.
    qd (16, Q): analytic disk/cylinder prims: to_object A rows 0:9,
        translation b 9:12, kind 12 (1 disk, 2 cyl), radius 13,
        length 14, valid 15 (disk.cpp / cylinder.cpp canonical-frame
        intersection). qattr (40, Q): fattr-layout shading attributes
        (cols 0:3 = disk normal / unused for cyl; col 38 = flip).
    env (3W, H): lat-long radiance, channel-blocked rows, transposed.
    cab (n_chunks_pad, 8): per-chunk BVH AABBs [lo3 hi3 pad2] (BVH-leaf
        face order makes chunks spatially tight); padding chunks carry
        inverted boxes so they never pass the slab test.
    scab (n_super_pad, 8): super-chunk AABBs (unions of SUPER chunks).
    st (16, G, 128) block of the (16, n/128, 128) state; see _ROWS.
    acc (8 + _FA_COLS, R) f32 VMEM scratch for the `streamed` sweep:
        row 0 t_best, 1 bary-u, 2 bary-v, 3 shadow-hit count,
        8:8+_FA_COLS A_best.

    When ``streamed`` is set (large meshes), the face sweep runs as a
    two-level fori_loop (super-chunks of SUPER chunks, then chunks) with
    ray-vs-AABB slab tests and `pl.when` predication — boxes no live ray
    segment overlaps cost one dense VPU prologue instead of MXU sweeps.
    This replaces per-ray BVH stack traversal (divergent,
    lockstep-hostile on the VPU) with the reference kd-tree's pruning
    role (kdtree.h:2079) done per tile at two granularities.
    """
    i = pl.program_id(0)
    FA = fattr_ref.shape[0]        # scene-packed attr rows (<= _FA_COLS)
    G = st_out_ref.shape[1]
    R = G * 128
    C = chunk
    # woop layout: (4, 3F) transposed for the streamed sweep (16x VMEM
    # saving), (3F, 4) row-major for the unrolled one (faster MXU form)
    n_chunks = (woop_ref.shape[1] if streamed else
                woop_ref.shape[0]) // (3 * C)
    is_last = depth == max_depth - 1
    need_bary = (has_checker or has_bitmap) and not is_last
    zero = jnp.zeros((R,), jnp.float32)          # face-sweep (flat) domain
    one = jnp.ones((R,), jnp.float32)
    dzero = jnp.zeros((G, 128), jnp.float32)     # dense shading domain
    done_ = jnp.ones((G, 128), jnp.float32)

    def to_flat(x):
        return x.reshape(R)

    def to_dense(x):
        return x.reshape(G, 128)

    def d65_flat(wl_f):
        """Linear interp of the 95-sample CIE D65 table at per-lane
        wavelengths (core/spectrum.py _cie_interp semantics); the table
        rides VMEM as a (96, 8) column, picked via an iota compare."""
        tpos = (wl_f - _WL_MIN) * (94.0 / (_WL_MAX - _WL_MIN))
        i0 = jnp.clip(jnp.floor(tpos), 0.0, 93.0)
        w1 = jnp.clip(tpos - i0, 0.0, 1.0)
        i0i = i0.astype(jnp.int32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (_D65_ROWS, R), 0)
        pickw = (jnp.where(rows == i0i[None, :], 1.0 - w1[None, :], 0.0)
                 + jnp.where(rows == i0i[None, :] + 1, w1[None, :], 0.0))
        return jnp.sum(d65_ref[:, 0:1] * pickw, axis=0)

    def cmf_flat(wl_f):
        """CIE 1931 x/y/z responses at per-lane wavelengths — same VMEM
        iota-pick as d65_flat over cols 1:4 of the SPD table. Used by the
        last bounce's in-kernel XYZ develop (core/spectrum.py _cie_interp
        semantics incl. the zero-outside-range mask)."""
        tpos = (wl_f - _WL_MIN) * (94.0 / (_WL_MAX - _WL_MIN))
        i0 = jnp.clip(jnp.floor(tpos), 0.0, 93.0)
        w1 = jnp.clip(tpos - i0, 0.0, 1.0)
        i0i = i0.astype(jnp.int32)
        ok = ((wl_f >= _WL_MIN) & (wl_f <= _WL_MAX)).astype(jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (_D65_ROWS, R), 0)
        pickw = (jnp.where(rows == i0i[None, :], 1.0 - w1[None, :], 0.0)
                 + jnp.where(rows == i0i[None, :] + 1, w1[None, :], 0.0))
        return [jnp.sum(d65_ref[:, k:k + 1] * pickw, axis=0) * ok
                for k in (1, 2, 3)]

    def _sweep_chunk(W, A_tab, odh, mint, maxt, defer_attr=False):
        """Woop sweep of one chunk -> (tmin, A, u, v, kmin). W is
        (4, 3C) in streamed mode, (3C, 4) unrolled. Lane count comes
        from ``odh`` so subgroup (128-lane) sweeps reuse this body.
        With ``defer_attr`` the winner's attribute pick is SKIPPED
        (A is None, kmin identifies the face): measured MK_NO_ATTR
        ablation put the _dotpick + 48-row accumulator update at ~85%
        of the whole HBM-tier sweep (biggeo 0.61 vs 4.19 Mpaths/s), so
        the HBM path resolves attributes once per ray AFTER the walk
        (see closest_hit's resolve loop) instead of once per chunk."""
        Rl = odh.shape[1] // 2
        OD = _dot3T(W, odh) if streamed else _dot3(W, odh)   # (3C, 2Rl)
        O3, D3 = OD[:, :Rl], OD[:, Rl:]
        U, V, Z = O3[0:C], O3[C:2 * C], O3[2 * C:3 * C]
        DU, DV, DZ = D3[0:C], D3[C:2 * C], D3[2 * C:3 * C]
        # op-lean epilogue (the HBM-tier sweeps are 93% of the biggeo
        # render, biggeo_abl_r5.log): a raw division propagates
        # inf/NaN for parallel rays, which then FAIL every comparison —
        # no dz guard ops needed — and the three barycentric halfplane
        # tests collapse to one min-form test
        t = -Z / DZ
        u = U + t * DU
        v = V + t * DV
        m3 = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)
        ok = ((m3 >= 0.0) & (t >= mint[None, :])
              & (t <= maxt[None, :]))
        t = jnp.where(ok, t, _BIG)
        tmin = jnp.min(t, axis=0)                     # (Rl,)
        ids = jax.lax.broadcasted_iota(jnp.int32, (C, Rl), 0)
        cand = jnp.where(t <= tmin[None, :], ids,
                         jnp.int32(0x7FFFFFFF))
        kmin = jnp.min(cand, axis=0)
        # no-hit rows (tmin == BIG) gate the pick on the cheap (Rl,) row
        hit_row = tmin < _BIG * 0.5
        pick = ((ids == kmin[None, :])
                & hit_row[None, :]).astype(jnp.float32)
        if defer_attr:
            A = None
        elif _ABL_NO_ATTR:
            A = jnp.zeros((A_tab.shape[0], Rl), jnp.float32)
        else:
            A = _dotpick(A_tab, pick)                 # (40, Rl)
        if need_bary:
            # u/v may be inf/NaN on rejected faces; sanitize before the
            # pick-reduction (0 * inf would poison the sum)
            u = jnp.where(ok, u, 0.0)
            v = jnp.where(ok, v, 0.0)
            bu = jnp.sum(pick * u, axis=0)
            bv = jnp.sum(pick * v, axis=0)
        else:
            bu = bv = jnp.zeros((Rl,), jnp.float32)
        return tmin, A, bu, bv, kmin

    def _box_live(bref, idx, o3d, inv3d, mint_d, cap_d):
        """-> number of rays whose [mint, cap] segment overlaps box
        `idx` of table `bref` (0.0 => skip). All math on the dense
        (G, 128) grid — a flat (R,) layout would use 1/8 sublanes."""
        box = bref[pl.ds(idx, 1), :]                  # (1, 8)
        t_near = mint_d * 0.0 - _BIG
        t_far = mint_d * 0.0 + _BIG
        for ax in range(3):
            ta = (box[0, ax] - o3d[ax]) * inv3d[ax]
            tb = (box[0, 3 + ax] - o3d[ax]) * inv3d[ax]
            t_near = jnp.maximum(t_near, jnp.minimum(ta, tb))
            t_far = jnp.minimum(t_far, jnp.maximum(ta, tb))
        box_hit = (t_far >= t_near) & (t_far >= mint_d) & (t_near <= cap_d)
        return jnp.sum(box_hit.astype(jnp.float32))

    def _slab_pair_live(boxrow, o3d, inv3d, mint_d, cap_d):
        """-> (mask_a, mask_b) int32 PER-ROW live bitmasks (bit q set
        iff some ray in dense row q — 128 consecutive sorted lanes —
        overlaps the box) for the TWO child boxes packed in one (1, 16)
        pair-node row (cols 0:6 and 6:12). NaN boxes (empty padding
        leaves) fail every comparison and mask to 0. Row-granular
        liveness is what keeps the tile walk's sweep work near the
        128-ray wedge instead of the full-tile union (the r3 verdict's
        `_box_live` ceiling): a leaf is only swept against rows whose
        own rays overlap it."""
        Gd = mint_d.shape[0]
        # per-row bit positions via int32 iota (Mosaic lowers int iota
        # on the sublane axis; f32 iota and captured np constants don't)
        qbit = jax.lax.broadcasted_iota(jnp.int32, (Gd, 1), 0)
        outs = []
        for base in (0, 6):
            t_near = mint_d * 0.0 - _BIG
            t_far = mint_d * 0.0 + _BIG
            for ax in range(3):
                ta = (boxrow[0, base + ax] - o3d[ax]) * inv3d[ax]
                tb = (boxrow[0, base + 3 + ax] - o3d[ax]) * inv3d[ax]
                t_near = jnp.maximum(t_near, jnp.minimum(ta, tb))
                t_far = jnp.minimum(t_far, jnp.maximum(ta, tb))
            hit = ((t_far >= t_near) & (t_far >= mint_d)
                   & (t_near <= cap_d))
            rows = jnp.max(hit.astype(jnp.int32), axis=1,
                           keepdims=True)          # (Gd, 1)
            outs.append(jnp.sum(rows << qbit))
        return outs[0], outs[1]

    def _dense_rays(ox, oy, oz, dx, dy, dz):
        o3d = (to_dense(ox), to_dense(oy), to_dense(oz))
        inv3d = tuple(
            1.0 / jnp.where(jnp.abs(to_dense(v)) > 1e-12, to_dense(v),
                            1e-12) for v in (dx, dy, dz))
        return o3d, inv3d

    def _bvh_traverse(o3d, inv3d, mint_d, cap_fn, start_leaf_fn,
                      sweep_fn):
        """Tile-uniform child-pair BVH walk with a double-buffered leaf
        DMA pipeline (the HBM tier's kdtree.h:2079 role).

        The SMEM stack holds INTERNAL node ids only: each pop reads one
        (1, 16) pair row and slab-tests BOTH children against the
        tile's per-lane [mint, cap] segments in one vector pass —
        halving the scalar while_loop iterations (and their VPU->SMEM
        reduction syncs) vs a one-box-per-node walk. cap_fn re-reads
        the tightening per-lane cap (current best hit / occlusion)
        every pop, so ordered front-to-back descent prunes far
        subtrees: rays in a tile share a direction octant (the
        between-bounce sort keys on it), one per-tile sign per axis
        picks each split's near child, far is pushed first.

        Leaf children enter a 2-slot pipeline: the NEW leaf's HBM->VMEM
        copy STARTS, then the PREVIOUS leaf — whose copy has had the
        intervening pops to land — is swept. HBM latency hides under
        slab tests and sweeps instead of serializing before each sweep.
        Each pending leaf carries its per-row live bitmask so the sweep
        touches only the 128-ray rows that actually overlap the leaf.
        pp_ref SMEM cells: [0] pending leaf id (<0 none), [1] next DMA
        slot, [2] pending leaf's row mask."""
        stk_ref[0] = jnp.int32(0)
        pp_ref[0] = jnp.int32(-1)
        pp_ref[1] = jnp.int32(0)
        pp_ref[2] = jnp.int32(0)
        # tile-dominant direction sign per axis (rays are octant-sorted,
        # so the majority sign is almost always the unanimous sign)
        dp0 = jnp.sum(inv3d[0]) >= 0.0
        dp1 = jnp.sum(inv3d[1]) >= 0.0
        dp2 = jnp.sum(inv3d[2]) >= 0.0

        def encounter(leaf_id, mask):
            if _ABL_NO_LEAF:
                return
            slot = pp_ref[1]
            start_leaf_fn(leaf_id, slot)

            @pl.when(pp_ref[0] >= 0)
            def _():
                sweep_fn(pp_ref[0], 1 - slot, pp_ref[2])

            pp_ref[0] = leaf_id
            pp_ref[1] = 1 - slot
            pp_ref[2] = mask
            if _ABL_SWEEP_STATS:
                pp_ref[4] = pp_ref[4] + 1
                pc = jnp.int32(0)
                for q in range(G):
                    pc = pc + ((mask >> q) & 1)
                pp_ref[5] = pp_ref[5] + pc

        def tcond(sp):
            return sp > 0

        def tbody(sp):
            sp = sp - 1
            nid = stk_ref[sp]
            if _ABL_SWEEP_STATS:
                pp_ref[3] = pp_ref[3] + 1
            boxrow = nodes_ref[pl.ds(nid, 1), :]          # (1, 16)
            la, lb = _slab_pair_live(boxrow, o3d, inv3d, mint_d,
                                     cap_fn())
            a = ab_ref[4 * nid]
            b = ab_ref[4 * nid + 1]
            axis = ab_ref[4 * nid + 2]
            alow = ab_ref[4 * nid + 3] > 0
            dp = jax.lax.select(axis == 0, dp0,
                                jax.lax.select(axis == 1, dp1, dp2))
            near_a = alow == dp
            n_id = jnp.where(near_a, a, b)
            f_id = jnp.where(near_a, b, a)
            n_mask = jnp.where(near_a, la, lb)
            f_mask = jnp.where(near_a, lb, la)
            n_live = n_mask != 0
            f_live = f_mask != 0
            push_f = f_live & (f_id >= 0)
            push_n = n_live & (n_id >= 0)

            @pl.when(push_f)                   # far: popped later
            def _():
                stk_ref[sp] = f_id

            @pl.when(push_n)                   # near: popped next
            def _():
                stk_ref[sp + jnp.where(push_f, 1, 0)] = n_id

            @pl.when(n_live & (n_id < 0))      # near leaf swept first
            def _():
                encounter(-n_id - 1, n_mask)

            @pl.when(f_live & (f_id < 0))
            def _():
                encounter(-f_id - 1, f_mask)

            return (sp + jnp.where(push_f, 1, 0)
                    + jnp.where(push_n, 1, 0))

        jax.lax.while_loop(tcond, tbody, jnp.int32(1))

        @pl.when(pp_ref[0] >= 0)               # drain the pipeline
        def _():
            sweep_fn(pp_ref[0], 1 - pp_ref[1], pp_ref[2])

    def closest_hit(ox, oy, oz, dx, dy, dz, mint, maxt):
        """Chunked triangle + sphere closest hit over face-major (C, R)
        tiles. Returns (t, A (40,R) attrs, bary u, bary v)."""
        odh = jnp.concatenate([
            jnp.stack([ox, oy, oz, one], axis=0),
            jnp.stack([dx, dy, dz, zero], axis=0)], axis=1)  # (4, 2R)
        if hbm:
            acc_ref[0, :] = jnp.full((R,), _BIG, jnp.float32)
            acc_ref[8:8 + FA, :] = jnp.zeros((FA, R),
                                                   jnp.float32)
            if carry_leaf:
                acc_ref[4, :] = zero
            if need_bary:
                acc_ref[1, :] = zero
                acc_ref[2, :] = zero
            o3d, inv3d = _dense_rays(ox, oy, oz, dx, dy, dz)
            mint_d = to_dense(mint)
            maxt_d = to_dense(maxt)

            def cap():
                return jnp.minimum(maxt_d, to_dense(acc_ref[0, :]))

            LW = LEAF_CHUNKS * 3 * C    # woop lanes per leaf slot
            LA = LEAF_CHUNKS * C        # attr lanes per leaf slot

            def _copy_w(lf, slot):
                return pltpu.make_async_copy(
                    woop_ref.at[:, pl.ds(lf * LW, LW)],
                    wbuf_ref.at[:, pl.ds(slot * LW, LW)],
                    dsem_ref.at[slot, 0])

            def _copy_a(lf, slot):
                return pltpu.make_async_copy(
                    fattr_ref.at[:, pl.ds(lf * LA, LA)],
                    abuf_ref.at[:, pl.ds(slot * LA, LA)],
                    dsem_ref.at[slot, 1])

            def start_leaf(lf, slot):
                _copy_w(lf, slot).start()
                _copy_a(lf, slot).start()

            # per-row (128-lane) ray slices for the subgroup sweeps
            odh_sub = [jnp.concatenate(
                [odh[:, q * 128:(q + 1) * 128],
                 odh[:, R + q * 128:R + (q + 1) * 128]], axis=1)
                for q in range(G)]

            def _sweep_q(q, slot, lf):
                # DEFERRED-ATTRIBUTE sweep (the MK_NO_ATTR ablation
                # measured the per-chunk attr pick + 48-row accumulator
                # update at ~85% of the whole render): the walk tracks
                # only t_best (row 0), bary (1/2), winning leaf (4) and
                # within-leaf face index (5); attributes resolve ONCE
                # per ray after the traversal (closest_hit below).
                # MK_DEFER_ATTR=0 restores the eager per-chunk pick
                # (A/B: with scene-packed attr rows the two are close).
                sl = pl.ds(q * 128, 128)
                if _ABL_SWEEP_EMPTY:
                    acc_ref[0, sl] = acc_ref[0, sl] + 0.0
                    return
                for k in range(LEAF_CHUNKS):
                    tmin, A, bu, bv, kmin = _sweep_chunk(
                        wbuf_ref[:, pl.ds(
                            slot * LW + k * 3 * C, 3 * C)],
                        abuf_ref[:, pl.ds(slot * LA + k * C, C)],
                        odh_sub[q],
                        mint[q * 128:(q + 1) * 128],
                        maxt[q * 128:(q + 1) * 128],
                        defer_attr=_DEFER_ATTR)
                    closer = tmin < acc_ref[0, sl]
                    acc_ref[0, sl] = jnp.where(
                        closer, tmin, acc_ref[0, sl])
                    if _DEFER_ATTR:
                        acc_ref[4, sl] = jnp.where(
                            closer, lf.astype(jnp.float32),
                            acc_ref[4, sl])
                        acc_ref[5, sl] = jnp.where(
                            closer,
                            (kmin + k * C).astype(jnp.float32),
                            acc_ref[5, sl])
                    else:
                        if A is not None:
                            acc_ref[8:8 + FA, sl] = jnp.where(
                                closer[None, :], A,
                                acc_ref[8:8 + FA, sl])
                        acc_ref[4, sl] = jnp.where(
                            closer, lf.astype(jnp.float32),
                            acc_ref[4, sl])
                    if need_bary:
                        acc_ref[1, sl] = jnp.where(
                            closer, bu, acc_ref[1, sl])
                        acc_ref[2, sl] = jnp.where(
                            closer, bv, acc_ref[2, sl])

            def sweep_leaf(lf, slot, mask):
                _copy_w(lf, slot).wait()
                _copy_a(lf, slot).wait()
                if _ABL_NO_SWEEP:
                    return
                for q in range(G):
                    @pl.when((mask >> q) & 1 != 0)
                    def _(q=q):
                        _sweep_q(q, slot, lf)

            _bvh_traverse(o3d, inv3d, mint_d, cap, start_leaf,
                          sweep_leaf)

            # ---- deferred attribute resolve: one pick per DISTINCT
            # winning leaf in the tile (not one per swept chunk, which
            # the MK_NO_ATTR ablation measured at ~85% of the render).
            # The loop walks winning leaves smallest-first with the
            # 2-slot DMA pipeline: slot for leaf i+1 starts before
            # leaf i's pick, so the HBM latency hides under the pick's
            # one-hot build + matmul + accumulator write.
            if _DEFER_ATTR:
                acc_ref[8:8 + FA, :] = jnp.zeros((FA, R), jnp.float32)
            lids_r = jax.lax.broadcasted_iota(jnp.int32, (LA, R), 0)
            acc_ref[6, :] = (acc_ref[0, :] < _BIG * 0.5).astype(
                jnp.float32)

            def _next_lf(und):
                return jnp.min(jnp.where(und, acc_ref[4, :], _BIG))

            def _rcond(c):
                return c[0] > 0.0

            def _rbody(c):
                _n, lf_f, slot = c
                lf = lf_f.astype(jnp.int32)
                und = acc_ref[6, :] > 0.5
                sel = und & (acc_ref[4, :] == lf_f)
                rem = und & ~sel
                n_rem = jnp.sum(rem.astype(jnp.float32))
                nxt = _next_lf(rem)

                @pl.when(n_rem > 0.0)      # prefetch leaf i+1
                def _():
                    _copy_a(nxt.astype(jnp.int32), 1 - slot).start()

                kb = acc_ref[5, :].astype(jnp.int32)
                onehot = ((lids_r == kb[None, :])
                          & sel[None, :]).astype(jnp.float32)
                _copy_a(lf, slot).wait()
                A = _dotpick(
                    abuf_ref[:, pl.ds(slot * LA, LA)], onehot)
                acc_ref[8:8 + FA, :] = jnp.where(
                    sel[None, :], A, acc_ref[8:8 + FA, :])
                acc_ref[6, :] = rem.astype(jnp.float32)
                return (n_rem, nxt, 1 - slot)

            if _DEFER_ATTR and not (_ABL_NO_ATTR or _ABL_NO_SWEEP
                                    or _ABL_NO_LEAF or _ABL_SWEEP_EMPTY):
                und0 = acc_ref[6, :] > 0.5
                n0 = jnp.sum(und0.astype(jnp.float32))
                lf0 = _next_lf(und0)

                @pl.when(n0 > 0.0)
                def _():
                    _copy_a(lf0.astype(jnp.int32), 0).start()

                jax.lax.while_loop(_rcond, _rbody,
                                   (n0, lf0, jnp.int32(0)))
            t_best = acc_ref[0, :]
            A_best = acc_ref[8:8 + FA, :]
            bu_best = acc_ref[1, :] if need_bary else zero
            bv_best = acc_ref[2, :] if need_bary else zero
        elif streamed:
            acc_ref[0, :] = jnp.full((R,), _BIG, jnp.float32)
            acc_ref[8:8 + FA, :] = jnp.zeros((FA, R),
                                                   jnp.float32)
            if need_bary:
                acc_ref[1, :] = zero
                acc_ref[2, :] = zero
            o3d, inv3d = _dense_rays(ox, oy, oz, dx, dy, dz)
            mint_d = to_dense(mint)
            maxt_d = to_dense(maxt)
            n_super = n_chunks // SUPER

            def super_body(s, _):
                cap_d = jnp.minimum(maxt_d,
                                    to_dense(acc_ref[0, :]))
                live_s = _box_live(scab_ref, s, o3d, inv3d, mint_d,
                                   cap_d)

                @pl.when(live_s > 0.0)
                def _():
                    def body(ci, _):
                        c = s * SUPER + ci
                        live_c = _box_live(cab_ref, c, o3d, inv3d,
                                           mint_d, cap_d)

                        @pl.when(live_c > 0.0)
                        def _():
                            W = woop_ref[:, pl.ds(c * 3 * C, 3 * C)]
                            A_tab = fattr_ref[:, pl.ds(c * C, C)]
                            tmin, A, bu, bv, _km = _sweep_chunk(
                                W, A_tab, odh, mint, maxt)
                            closer = tmin < acc_ref[0, :]
                            acc_ref[0, :] = jnp.where(
                                closer, tmin, acc_ref[0, :])
                            acc_ref[8:8 + FA, :] = jnp.where(
                                closer[None, :], A,
                                acc_ref[8:8 + FA, :])
                            if need_bary:
                                acc_ref[1, :] = jnp.where(
                                    closer, bu, acc_ref[1, :])
                                acc_ref[2, :] = jnp.where(
                                    closer, bv, acc_ref[2, :])
                        return 0

                    jax.lax.fori_loop(0, SUPER, body, 0)
                return 0

            jax.lax.fori_loop(0, n_super, super_body, 0)
            t_best = acc_ref[0, :]
            A_best = acc_ref[8:8 + FA, :]
            bu_best = acc_ref[1, :] if need_bary else zero
            bv_best = acc_ref[2, :] if need_bary else zero
        else:
            t_best = jnp.full((R,), _BIG, jnp.float32)
            A_best = jnp.zeros((FA, R), jnp.float32)
            bu_best = zero
            bv_best = zero
            for c in range(n_chunks):
                W = woop_ref[c * 3 * C:(c + 1) * 3 * C, :]   # (3C, 4)
                tmin, A, bu, bv, _km = _sweep_chunk(
                    W, fattr_ref[:, c * C:(c + 1) * C], odh, mint, maxt)
                closer = tmin < t_best
                t_best = jnp.where(closer, tmin, t_best)
                A_best = jnp.where(closer[None, :], A, A_best)
                if need_bary:
                    bu_best = jnp.where(closer, bu, bu_best)
                    bv_best = jnp.where(closer, bv, bv_best)
        if has_spheres:
            sph = sph_ref[:]                               # (8, S)
            S = sph.shape[1]
            cx = sph[0][:, None]
            cy = sph[1][:, None]
            cz = sph[2][:, None]
            r = sph[3][:, None]
            alive = sph[4][:, None] > 0.5
            lx = ox[None, :] - cx                          # (S, R)
            ly = oy[None, :] - cy
            lz = oz[None, :] - cz
            b = lx * dx[None, :] + ly * dy[None, :] + lz * dz[None, :]
            cc = lx * lx + ly * ly + lz * lz - r * r
            disc = b * b - cc
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t0 = -b - sq
            t1 = -b + sq
            ts = jnp.where(t0 > mint[None, :], t0, t1)
            oks = alive & (disc > 0) & (ts > mint[None, :]) \
                & (ts < maxt[None, :])
            ts = jnp.where(oks, ts, _BIG)
            tsmin = jnp.min(ts, axis=0)
            ids = jax.lax.broadcasted_iota(jnp.int32, (S, R), 0)
            cand = jnp.where((ts <= tsmin[None, :]) & oks, ids,
                             jnp.int32(0x7FFFFFFF))
            kmin = jnp.min(cand, axis=0)
            spick = ((ids == kmin[None, :]) & oks).astype(jnp.float32)
            SA = _dotpick(sattr_ref[:], spick)             # (40, R)
            SC = _dotpick(sph, spick)                      # (8, R)
            closer = tsmin < t_best
            tsafe = jnp.where(closer, tsmin, t_best)
            hx = ox + tsafe * dx
            hy = oy + tsafe * dy
            hz = oz + tsafe * dz
            inv_r = 1.0 / jnp.maximum(SC[3], 1e-20)
            sn = jnp.stack([(hx - SC[0]) * inv_r, (hy - SC[1]) * inv_r,
                            (hz - SC[2]) * inv_r], axis=0)   # (3, R)
            SA = jnp.concatenate([sn, SA[3:]], axis=0)
            t_best = jnp.where(closer, tsmin, t_best)
            A_best = jnp.where(closer[None, :], SA, A_best)
            if need_bary:
                # spherical uv (sphere.cpp compute_surface_interaction;
                # scene.py:759-761 wavefront conventions) written into
                # the bary slots — sattr rows carry the identity
                # uv0/duv mapping so the checker/bitmap resolve reads
                # them through unchanged
                su = _atan2(sn[1], sn[0]) * (0.5 / _PI) + 0.5
                sv = _acos(jnp.clip(sn[2], -1.0, 1.0)) * (1.0 / _PI)
                bu_best = jnp.where(closer, su, bu_best)
                bv_best = jnp.where(closer, sv, bv_best)
        if has_quads:
            tq, okq = _quad_hits(ox, oy, oz, dx, dy, dz, mint, maxt)
            Q = tq.shape[0]
            tqmin = jnp.min(tq, axis=0)
            ids = jax.lax.broadcasted_iota(jnp.int32, (Q, R), 0)
            cand = jnp.where((tq <= tqmin[None, :]) & okq, ids,
                             jnp.int32(0x7FFFFFFF))
            kmin = jnp.min(cand, axis=0)
            qpick = ((ids == kmin[None, :]) & okq).astype(jnp.float32)
            QA = _dotpick(qattr_ref[:], qpick)         # (40, R)
            QP = _dotpick(qd_ref[:], qpick)            # (16, R)
            closer = tqmin < t_best
            tsafe = jnp.where(closer, tqmin, t_best)
            hx = ox + tsafe * dx
            hy = oy + tsafe * dy
            hz = oz + tsafe * dz
            # local hit point via the picked to_object rows
            qlx = QP[0] * hx + QP[1] * hy + QP[2] * hz + QP[9]
            qly = QP[3] * hx + QP[4] * hy + QP[5] * hz + QP[10]
            # disk normal precomputed in qattr 0:3 (flip folded in);
            # cylinder: n = A^T (lx, ly, 0)/r * flip (rigid: A^T = B)
            inv_rq = 1.0 / jnp.maximum(QP[13], 1e-20)
            flipq = QA[38]
            cnx = (QP[0] * qlx + QP[3] * qly) * inv_rq * flipq
            cny = (QP[1] * qlx + QP[4] * qly) * inv_rq * flipq
            cnz = (QP[2] * qlx + QP[5] * qly) * inv_rq * flipq
            is_cyl = QP[12] > 1.5
            qn = jnp.stack([jnp.where(is_cyl, cnx, QA[0]),
                            jnp.where(is_cyl, cny, QA[1]),
                            jnp.where(is_cyl, cnz, QA[2])], axis=0)
            QA = jnp.concatenate([qn, QA[3:]], axis=0)
            t_best = jnp.where(closer, tqmin, t_best)
            A_best = jnp.where(closer[None, :], QA, A_best)
            if need_bary:
                # disk uv = (r_local, phi/2pi), cylinder uv = (phi/2pi,
                # z/len) (disk.cpp:182-225 / cylinder.cpp:336-390;
                # scene.py:800-819 wavefront conventions); identity
                # uv0/duv rows in qattr pass them through the
                # checker/bitmap resolve
                qlz = QP[6] * hx + QP[7] * hy + QP[8] * hz + QP[11]
                phi_q = _atan2(qly, qlx) * (0.5 / _PI)
                phi_q = jnp.where(phi_q < 0.0, phi_q + 1.0, phi_q)
                r_loc = jnp.sqrt(jnp.maximum(qlx * qlx + qly * qly,
                                             0.0))
                inv_lq = 1.0 / jnp.maximum(QP[14], 1e-20)
                qu = jnp.where(is_cyl, phi_q, r_loc)
                qv = jnp.where(is_cyl, qlz * inv_lq, phi_q)
                bu_best = jnp.where(closer, qu, bu_best)
                bv_best = jnp.where(closer, qv, bv_best)
        return t_best, A_best, bu_best, bv_best

    def _quad_hits(ox, oy, oz, dx, dy, dz, mint, maxt):
        """(tq, okq) over the analytic disk/cylinder table: rays in each
        prim's canonical object frame (disk: z=0 unit disk; cylinder:
        radius r, z in [0, L])."""
        qd = qd_ref[:]                                 # (16, Q)
        A = [qd[k][:, None] for k in range(9)]
        bx_, by_, bz_ = qd[9][:, None], qd[10][:, None], qd[11][:, None]
        kindq = qd[12][:, None]
        r_q = qd[13][:, None]
        ln_q = qd[14][:, None]
        aliveq = qd[15][:, None] > 0.5
        oxs, oys, ozs = ox[None, :], oy[None, :], oz[None, :]
        dxs, dys, dzs = dx[None, :], dy[None, :], dz[None, :]
        olx = A[0] * oxs + A[1] * oys + A[2] * ozs + bx_   # (Q, R)
        oly = A[3] * oxs + A[4] * oys + A[5] * ozs + by_
        olz = A[6] * oxs + A[7] * oys + A[8] * ozs + bz_
        dlx = A[0] * dxs + A[1] * dys + A[2] * dzs
        dly = A[3] * dxs + A[4] * dys + A[5] * dzs
        dlz = A[6] * dxs + A[7] * dys + A[8] * dzs
        is_disk = kindq < 1.5
        # disk: plane z=0, x^2+y^2 <= 1 (disk.cpp:146-166)
        dz_ok = jnp.abs(dlz) > 1e-12
        t_d = -olz / jnp.where(dz_ok, dlz, 1.0)
        hx_ = olx + t_d * dlx
        hy_ = oly + t_d * dly
        ok_d = dz_ok & (hx_ * hx_ + hy_ * hy_ <= 1.0)
        # cylinder: x^2+y^2 = r^2, z in [0, L] (cylinder.cpp:243-291)
        a2 = dlx * dlx + dly * dly
        b2 = 2.0 * (dlx * olx + dly * oly)
        c2 = olx * olx + oly * oly - r_q * r_q
        disc = b2 * b2 - 4.0 * a2 * c2
        sqd = jnp.sqrt(jnp.maximum(disc, 0.0))
        inv2a = 1.0 / jnp.where(jnp.abs(a2) > 1e-20, 2.0 * a2, 1.0)
        a2ok = jnp.abs(a2) > 1e-20
        t_n = (-b2 - sqd) * inv2a
        t_f = (-b2 + sqd) * inv2a
        zn = olz + dlz * t_n
        zf = olz + dlz * t_f
        n_ok = (zn >= 0) & (zn <= ln_q) & (t_n > mint[None, :]) \
            & (t_n < maxt[None, :])
        f_ok = (zf >= 0) & (zf <= ln_q) & (t_f > mint[None, :]) \
            & (t_f < maxt[None, :])
        ok_c = a2ok & (disc > 0) & (n_ok | f_ok)
        t_c = jnp.where(n_ok, t_n, t_f)
        tq = jnp.where(is_disk, t_d, t_c)
        # no jnp.where on bools (Mosaic lacks the i1 select lowering)
        okq = aliveq & ((is_disk & ok_d) | (~is_disk & ok_c)) \
            & (tq > mint[None, :]) & (tq < maxt[None, :])
        return jnp.where(okq, tq, _BIG), okq

    def _shadow_chunk(W, odh, mint, maxt):
        """Occlusion count of one chunk (no argmin/pick epilogue)."""
        Rl = odh.shape[1] // 2
        OD = _dot3T(W, odh) if streamed else _dot3(W, odh)   # (3C, 2Rl)
        O3, D3 = OD[:, :Rl], OD[:, Rl:]
        U, V, Z = O3[0:C], O3[C:2 * C], O3[2 * C:3 * C]
        DU, DV, DZ = D3[0:C], D3[C:2 * C], D3[2 * C:3 * C]
        # op-lean form (see _sweep_chunk): inf/NaN from the raw divide
        # fail the comparisons, min-form barycentric test
        t = -Z / DZ
        u = U + t * DU
        v = V + t * DV
        m3 = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)
        ok = ((m3 >= 0.0) & (t >= mint[None, :])
              & (t <= maxt[None, :]))
        return jnp.sum(ok.astype(jnp.float32), axis=0)

    def any_hit(ox, oy, oz, dx, dy, dz, mint, maxt):
        """Shadow-ray any-hit: the Woop products without the argmin/pick
        epilogue (roughly halves the per-NEE elementwise work)."""
        odh = jnp.concatenate([
            jnp.stack([ox, oy, oz, one], axis=0),
            jnp.stack([dx, dy, dz, zero], axis=0)], axis=1)  # (4, 2R)
        if hbm:
            acc_ref[3, :] = zero
            o3d, inv3d = _dense_rays(ox, oy, oz, dx, dy, dz)
            mint_d = to_dense(mint)
            maxt_d = to_dense(maxt)

            def cap():
                # already-occluded lanes shrink their segment to empty so
                # fully-occluded subtrees prune
                return jnp.where(to_dense(acc_ref[3, :]) > 0.0, -_BIG,
                                 maxt_d)

            LW = LEAF_CHUNKS * 3 * C

            def _copy_w(lf, slot):
                return pltpu.make_async_copy(
                    woop_ref.at[:, pl.ds(lf * LW, LW)],
                    wbuf_ref.at[:, pl.ds(slot * LW, LW)],
                    dsem_ref.at[slot, 0])

            def start_leaf(lf, slot):
                _copy_w(lf, slot).start()

            odh_sub = [jnp.concatenate(
                [odh[:, q * 128:(q + 1) * 128],
                 odh[:, R + q * 128:R + (q + 1) * 128]], axis=1)
                for q in range(G)]

            def sweep_leaf(lf, slot, mask):
                _copy_w(lf, slot).wait()
                if _ABL_NO_SWEEP:
                    return
                for q in range(G):
                    @pl.when((mask >> q) & 1 != 0)
                    def _(q=q):
                        sl = pl.ds(q * 128, 128)
                        if _ABL_SWEEP_EMPTY:
                            acc_ref[3, sl] = acc_ref[3, sl] + 0.0
                            return
                        for k in range(LEAF_CHUNKS):
                            acc_ref[3, sl] = acc_ref[3, sl] \
                                + _shadow_chunk(
                                    wbuf_ref[:, pl.ds(
                                        slot * LW + k * 3 * C, 3 * C)],
                                    odh_sub[q],
                                    mint[q * 128:(q + 1) * 128],
                                    maxt[q * 128:(q + 1) * 128])

            _bvh_traverse(o3d, inv3d, mint_d, cap, start_leaf,
                          sweep_leaf)
            cnt = acc_ref[3, :]
        elif streamed:
            acc_ref[3, :] = zero
            o3d, inv3d = _dense_rays(ox, oy, oz, dx, dy, dz)
            mint_d = to_dense(mint)
            maxt_d = to_dense(maxt)
            n_super = n_chunks // SUPER

            def super_body(s, _):
                # already-occluded lanes don't need more hits: shrink
                # their segment to empty so fully-occluded tiles skip
                cap_d = jnp.where(to_dense(acc_ref[3, :]) > 0.0, -_BIG,
                                  maxt_d)
                live_s = _box_live(scab_ref, s, o3d, inv3d, mint_d,
                                   cap_d)

                @pl.when(live_s > 0.0)
                def _():
                    def body(ci, _):
                        c = s * SUPER + ci
                        live_c = _box_live(cab_ref, c, o3d, inv3d,
                                           mint_d, cap_d)

                        @pl.when(live_c > 0.0)
                        def _():
                            W = woop_ref[:, pl.ds(c * 3 * C, 3 * C)]
                            acc_ref[3, :] = acc_ref[3, :] \
                                + _shadow_chunk(W, odh, mint, maxt)
                        return 0

                    jax.lax.fori_loop(0, SUPER, body, 0)
                return 0

            jax.lax.fori_loop(0, n_super, super_body, 0)
            cnt = acc_ref[3, :]
        else:
            cnt = zero
            for c in range(n_chunks):
                W = woop_ref[c * 3 * C:(c + 1) * 3 * C, :]
                cnt = cnt + _shadow_chunk(W, odh, mint, maxt)
        if has_spheres:
            sph = sph_ref[:]
            cx = sph[0][:, None]
            cy = sph[1][:, None]
            cz = sph[2][:, None]
            r = sph[3][:, None]
            alive = sph[4][:, None] > 0.5
            lx = ox[None, :] - cx
            ly = oy[None, :] - cy
            lz = oz[None, :] - cz
            b = lx * dx[None, :] + ly * dy[None, :] + lz * dz[None, :]
            cc = lx * lx + ly * ly + lz * lz - r * r
            disc = b * b - cc
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t0 = -b - sq
            t1 = -b + sq
            ts = jnp.where(t0 > mint[None, :], t0, t1)
            oks = alive & (disc > 0) & (ts > mint[None, :]) \
                & (ts < maxt[None, :])
            cnt = cnt + jnp.sum(oks.astype(jnp.float32), axis=0)
        if has_quads:
            _, okq = _quad_hits(ox, oy, oz, dx, dy, dz, mint, maxt)
            cnt = cnt + jnp.sum(okq.astype(jnp.float32), axis=0)
        return cnt    # float occlusion count (flat); > 0 => occluded

    def _rot3(M, dx, dy, dz):
        """Apply a constant 3x3 (row-major 9-tuple) + renormalize."""
        rx = M[0] * dx + M[1] * dy + M[2] * dz
        ry = M[3] * dx + M[4] * dy + M[5] * dz
        rz = M[6] * dx + M[7] * dy + M[8] * dz
        inv = jax.lax.rsqrt(jnp.maximum(rx * rx + ry * ry + rz * rz,
                                        1e-20))
        return rx * inv, ry * inv, rz * inv

    def env_uv(dx, dy, dz):
        """World direction -> env-local (u, v, sin_theta) (envmap.cpp uv
        convention: u = atan2(x, -z)/2pi + .5, v = acos(y)/pi)."""
        if env_rot_inv is not None:
            dx, dy, dz = _rot3(env_rot_inv, dx, dy, dz)
        u = _atan2(dx, -dz) * (0.5 / _PI) + 0.5
        v = _acos(dy) * (1.0 / _PI)
        st = jnp.sqrt(jnp.maximum(1.0 - dy * dy, 1e-12))
        return u, v, st

    n_env_pl = 4 if spectral else 3   # rgb | srgb coeffs + HDR scale

    def env_fetch_uv(u, v):
        """Lat-long bilinear fetch at (u, v) (wrap-u, wrap-v like
        BitmapTexture). env is channel-blocked rows — 3 rgb planes, or
        3 sigmoid-coefficient planes + an HDR scale plane in spectral
        mode (envmap.cpp:95-115's per-texel decomposition, interpolated
        the same way: coefficients and scale bilinearly). Rows via a
        weighted one-hot matmul, columns via a weighted mask-reduce."""
        env = env_ref[:]
        fu = u * env_w - 0.5
        fv = v * env_h - 0.5
        u0 = jnp.floor(fu)
        v0 = jnp.floor(fv)
        wu_ = fu - u0
        wv_ = fv - v0
        iu0 = jnp.mod(u0.astype(jnp.int32), env_w)
        iv0 = jnp.mod(v0.astype(jnp.int32), env_h)
        iu1 = jnp.mod(iu0 + 1, env_w)
        iv1 = jnp.mod(iv0 + 1, env_h)
        H = env.shape[1]
        Wp = env.shape[0] // n_env_pl
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, R), 0)
        wrow = (jnp.where(rows == iv0[None, :], 1.0 - wv_[None, :], 0.0)
                + jnp.where(rows == iv1[None, :], wv_[None, :], 0.0))
        mixed = _dot3(env, wrow)                           # (nP*W, R)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Wp, R), 0)
        wcol = (jnp.where(cols == iu0[None, :], 1.0 - wu_[None, :], 0.0)
                + jnp.where(cols == iu1[None, :], wu_[None, :], 0.0))
        out = []
        for ch in range(n_env_pl):
            plane = mixed[ch * Wp:(ch + 1) * Wp]
            out.append(jnp.sum(plane * wcol, axis=0))
        return out

    def env_lookup(dx, dy, dz):
        u, v, _ = env_uv(dx, dy, dz)
        return env_fetch_uv(u, v)

    def env_pdf(dx, dy, dz):
        """Claimed NEE solid-angle density of the env arm at a world
        direction: nearest-texel pmf * W*H / (2 pi^2 sin_theta). Must be
        the same function of direction the env_sample arm claims, so the
        MIS weights at the sample site and the escape site sum to 1."""
        u, v, st = env_uv(dx, dy, dz)
        iu = jnp.mod(jnp.floor(u * env_ws).astype(jnp.int32), env_ws)
        iv = jnp.clip(jnp.floor(v * env_hs).astype(jnp.int32), 0,
                      env_hs - 1)
        envs = envs_ref[:]
        Wp2 = (envs.shape[0] - 8) // 2
        H = envs.shape[1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, R), 0)
        vrow = (rows == iv[None, :]).astype(jnp.float32)
        pmfcol = _dot3(envs[Wp2:2 * Wp2], vrow)            # (Wp2, R)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Wp2, R), 0)
        pmf = jnp.sum(jnp.where(cols == iu[None, :], pmfcol, 0.0), axis=0)
        return pmf * (env_ws * env_hs) / jnp.maximum(
            2.0 * _PI * _PI * st, 1e-8)

    def env_sample(u1, u2, j1, j2):
        """Importance-sample the env (marginal CDF over rows v, then the
        row's conditional CDF over u, uniform jitter within the texel) —
        the kernel's Hierarchical2D role (envmap.cpp:67). Flat domain.
        -> (dx, dy, dz world, pdf_sa, [payload planes])."""
        envs = envs_ref[:]
        Wp2 = (envs.shape[0] - 8) // 2
        H = envs.shape[1]
        marg_cdf = envs[2 * Wp2]                           # (H,)
        iv = jnp.sum((marg_cdf[:, None] <= u1[None, :]).astype(jnp.int32),
                     axis=0)
        iv = jnp.clip(iv, 0, env_hs - 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, R), 0)
        vrow = (rows == iv[None, :]).astype(jnp.float32)
        both = _dot3(envs[:2 * Wp2], vrow)                 # (2Wp2, R)
        cond_cdf, pmfcol = both[:Wp2], both[Wp2:]
        iu = jnp.sum((cond_cdf <= u2[None, :]).astype(jnp.int32), axis=0)
        iu = jnp.clip(iu, 0, env_ws - 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Wp2, R), 0)
        pmf = jnp.sum(jnp.where(cols == iu[None, :], pmfcol, 0.0), axis=0)
        uu = (iu.astype(jnp.float32) + j1) / env_ws
        vv = (iv.astype(jnp.float32) + j2) / env_hs
        theta = vv * _PI
        phi = (uu - 0.5) * (2.0 * _PI)
        st = jnp.sin(theta)
        ldx = st * jnp.sin(phi)
        ldy = jnp.cos(theta)
        ldz = -st * jnp.cos(phi)
        pdf_sa = pmf * (env_ws * env_hs) / jnp.maximum(
            2.0 * _PI * _PI * st, 1e-8)
        payload = env_fetch_uv(uu, vv)
        if env_rot is not None:
            ldx, ldy, ldz = _rot3(env_rot, ldx, ldy, ldz)
        return ldx, ldy, ldz, pdf_sa, payload

    # ------------------------------------------------------------------
    # load / init state (dense (G, 128) per-lane layout)
    # ------------------------------------------------------------------
    base_aux = 6 + 2 * nc          # first aux row (prev_pdf)
    if depth == 0:
        sub = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 0)
        lnn = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1)
        lane = i * R + sub * 128 + lnn
        lane_ok = lane < n_lanes
        # pixel_base (meta col 2) shifts the pixel ids for band renders
        # (pixel-sharded multichip): the TEA chain keys on the GLOBAL
        # pixel id, so band renders reproduce the full-film samples
        pixel = lane // spp_pass + meta_ref[0, 2]
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
        cam = [cam_ref[0, k] for k in range(13)]  # SMEM: scalars only
        tan_half = cam[12]
        aspect = width / height
        cxs = -(2.0 * sx - 1.0) * tan_half
        cys = (1.0 - 2.0 * sy) * tan_half / aspect
        inv_len = jax.lax.rsqrt(cxs * cxs + cys * cys + 1.0)
        lx, ly, lz = cxs * inv_len, cys * inv_len, inv_len
        dx = cam[0] * lx + cam[1] * ly + cam[2] * lz
        dy = cam[3] * lx + cam[4] * ly + cam[5] * lz
        dz = cam[6] * lx + cam[7] * ly + cam[8] * lz
        ox = jnp.full((G, 128), cam[9])
        oy = jnp.full((G, 128), cam[10])
        oz = jnp.full((G, 128), cam[11])
        if spectral:
            # sensor spectral weight = 1/pdf of hero sampling
            # (sensors.py _sample_wavelengths semantics)
            _, wav_wt = _hero_wavelengths(key, nc)
            thr = list(wav_wt)
        else:
            thr = [done_] * nc
        res = [dzero] * nc
        active = lane_ok
        prev_pdf = dzero             # 0 => camera ray (no MIS at hit)
        eta_st = done_               # cumulative relative IOR (RR uses it)
        # carry the exact lane id (f32-exact below 2^24): the host's
        # unsort then restores the ORIGINAL lane order, which both the
        # box reduce (pixel-major runs) and the rfilter splat (per-lane
        # jitter re-derivation) rely on; padding lanes park past the end
        pix_f = (jnp.where(lane_ok, lane, n_lanes)
                 .astype(jnp.float32) if carry_pixel else None)
        any_alive = jnp.asarray(True)
    else:
        st = st_in_ref[...]
        ox, oy, oz = st[0], st[1], st[2]
        dx, dy, dz = st[3], st[4], st[5]
        thr = [st[6 + c] for c in range(nc)]
        res = [st[6 + nc + c] for c in range(nc)]
        prev_pdf = st[base_aux]
        active = st[base_aux + 1] > 0.5
        key = st[base_aux + 2].view(jnp.uint32)
        eta_st = st[base_aux + 3]
        pix_f = st[base_aux + 4] if carry_pixel else None
        any_alive = jnp.sum(st[base_aux + 1]) > 0.0

    def _cie_develop(res_list, wl_list):
        """In-kernel spectral develop: integrate the accumulated
        hero-wavelength radiance against the CIE CMFs and convert to
        linear sRGB rows HERE, where the table pick is a fused VMEM op —
        per-lane CIE gathers at develop time cost ~1 s at 4M lanes
        (spectrum.h:209 semantics)."""
        xyz = [dzero, dzero, dzero]
        for c in range(nc):
            resp = cmf_flat(to_flat(wl_list[c]))
            for k in range(3):
                xyz[k] = xyz[k] + to_dense(resp[k]) * res_list[c]
        xyz = [x * (1.0 / nc) for x in xyz]
        from ..core.spectrum import XYZ_TO_SRGB as _M
        out = [float(_M[r, 0]) * xyz[0] + float(_M[r, 1]) * xyz[1]
               + float(_M[r, 2]) * xyz[2] for r in range(3)]
        return out + [dzero] * (nc - 3)

    def run_bounce():
        dim0 = 2 + depth * 8
        if hbm and _ABL_SWEEP_STATS:
            pp_ref[3] = jnp.int32(0)   # node pops this bounce
            pp_ref[4] = jnp.int32(0)   # leaf encounters
            pp_ref[5] = jnp.int32(0)   # row sweeps (mask popcounts)

        # ---- face sweep in the flat (lane-major) domain ----
        oxf, oyf, ozf = to_flat(ox), to_flat(oy), to_flat(oz)
        dxf, dyf, dzf = to_flat(dx), to_flat(dy), to_flat(dz)
        # dead lanes get an empty [0, -BIG] segment so the streamed
        # sweep's chunk culling can skip tiles with no live rays
        maxt_f = to_flat(jnp.where(active, _BIG, -_BIG))
        t_f, A_f, bu_f, bv_f = closest_hit(oxf, oyf, ozf, dxf, dyf, dzf,
                                           zero, maxt_f)
        # hit-leaf id for the host resort key (acc row 4, hbm sweeps)
        leaf_d = to_dense(acc_ref[4, :]) if (hbm and carry_leaf) else None

        # checker/bitmap albedo payload resolve stays flat where the A
        # rows live. The payload is 3 floats per lane: linear rgb in rgb
        # mode, sigmoid srgb-model coefficients in spectral mode (the
        # per-channel reflectance is resolved on the dense grid below).
        if need_bary:
            # uv from barycentrics -> affine to_uv -> parity select
            uu = A_f[21] + bu_f * A_f[23] + bv_f * A_f[25]
            vv = A_f[22] + bu_f * A_f[24] + bv_f * A_f[26]
            u2 = A_f[27] * uu + A_f[28] * vv + A_f[29]
            v2 = A_f[30] * uu + A_f[31] * vv + A_f[32]
            par = jnp.mod(jnp.floor(u2) + jnp.floor(v2), 2.0)
            use_c1 = ((A_f[10] > 1.5) & (A_f[10] < 2.5)) & (par > 0.5)
            alb_r_f = jnp.where(use_c1, A_f[18], A_f[3])
            alb_g_f = jnp.where(use_c1, A_f[19], A_f[4])
            alb_b_f = jnp.where(use_c1, A_f[20], A_f[5])
            if has_bitmap:
                # bitmap diffuse (kind 6): bilinear atlas fetch mirroring
                # BitmapTexture._bilinear (repeat wrap, row-major texel
                # grid); atlas is (3*ATLAS_W, Ha) channel-blocked rows,
                # textures stacked along the v axis at A_f[40]
                atl = atlas_ref[:]
                Ha = atl.shape[1]
                Wp = atl.shape[0] // 3
                voff = A_f[40]
                tw = jnp.maximum(A_f[41], 1.0)
                th = jnp.maximum(A_f[42], 1.0)
                fu = uu * tw - 0.5
                fv = vv * th - 0.5
                u0 = jnp.floor(fu)
                v0 = jnp.floor(fv)
                wu_ = fu - u0
                wv_ = fv - v0
                twi = tw.astype(jnp.int32)
                thi = th.astype(jnp.int32)
                iu0 = jnp.mod(u0.astype(jnp.int32), twi)
                iv0 = jnp.mod(v0.astype(jnp.int32), thi)
                iu1 = jnp.mod(iu0 + 1, twi)
                iv1 = jnp.mod(iv0 + 1, thi)
                vo = voff.astype(jnp.int32)
                rows = jax.lax.broadcasted_iota(jnp.int32, (Ha, R), 0)
                wrow = (jnp.where(rows == (iv0 + vo)[None, :],
                                  1.0 - wv_[None, :], 0.0)
                        + jnp.where(rows == (iv1 + vo)[None, :],
                                    wv_[None, :], 0.0))
                mixed = _dot3(atl, wrow)               # (3Wp, R)
                cols = jax.lax.broadcasted_iota(jnp.int32, (Wp, R), 0)
                wcol = (jnp.where(cols == iu0[None, :],
                                  1.0 - wu_[None, :], 0.0)
                        + jnp.where(cols == iu1[None, :],
                                    wu_[None, :], 0.0))
                is_bmp = A_f[10] > 5.5
                tex = []
                for ch in range(3):
                    plane = mixed[ch * Wp:(ch + 1) * Wp]
                    tex.append(jnp.sum(plane * wcol, axis=0))
                alb_r_f = jnp.where(is_bmp, tex[0], alb_r_f)
                alb_g_f = jnp.where(is_bmp, tex[1], alb_g_f)
                alb_b_f = jnp.where(is_bmp, tex[2], alb_b_f)
        else:
            alb_r_f, alb_g_f, alb_b_f = A_f[3], A_f[4], A_f[5]

        # ---- densify the sweep outputs; shade on the (G, 128) grid ----
        t = to_dense(t_f)
        ngx, ngy, ngz = to_dense(A_f[0]), to_dense(A_f[1]), to_dense(A_f[2])
        lpdf_w = to_dense(A_f[9])
        hit = t < _BIG * 0.5

        if spectral:
            # hero wavelengths (constant per path, regenerated from the
            # key) + shared per-bounce D65 interpolation for emission
            wl_d, _ = _hero_wavelengths(key, nc)
            wl_x = [_wl_norm(w) for w in wl_d]
            d65 = [to_dense(d65_flat(to_flat(w))) for w in wl_d]
            le_scale = to_dense(A_f[43])
            le = [_sigmoid_poly(to_dense(A_f[6]), to_dense(A_f[7]),
                                to_dense(A_f[8]), wl_x[c])
                  * d65[c] * le_scale for c in range(nc)]
        else:
            le = [to_dense(A_f[6 + c]) for c in range(nc)]

        res_ = list(res)
        act = active

        # --- environment on escape (MIS against the env NEE arm) ---
        if has_env:
            epl = [to_dense(x) for x in env_lookup(dxf, dyf, dzf)]
            if spectral:
                # sigmoid coeffs + HDR scale planes -> hero radiance
                # (envmap.cpp:293-307: s * whitepoint * f * scale)
                env_ch = [_sigmoid_poly(epl[0], epl[1], epl[2], wl_x[c])
                          * epl[3] * d65[c] for c in range(nc)]
            else:
                env_ch = epl[:nc]
            esc = act & ~hit
            if p_env > 0.0 and depth > 0:
                epdf_esc = to_dense(env_pdf(dxf, dyf, dzf)) * p_env
                w_esc = jnp.where(prev_pdf > 0.0,
                                  _mis(prev_pdf, epdf_esc), 1.0)
            else:
                w_esc = done_
            for c in range(nc):
                res_[c] = res_[c] + jnp.where(esc, w_esc * thr[c]
                                              * env_ch[c], 0.0)

        # --- emission with MIS against NEE (one-sided) ---
        cos_hit = -(dx * ngx + dy * ngy + dz * ngz)
        if depth == 0:
            em_w = done_                 # camera rays: no MIS
        else:
            pdf_l_hit = jnp.where(
                cos_hit > 1e-6,
                t * t * lpdf_w / jnp.maximum(cos_hit, 1e-6), 0.0)
            em_w = jnp.where(prev_pdf > 0.0, _mis(prev_pdf, pdf_l_hit),
                             1.0)
        wgt = jnp.where(act & hit & (cos_hit > 0), em_w, 0.0)
        for c in range(nc):
            res_[c] = res_[c] + wgt * thr[c] * le[c]

        def _stats_override(res_):
            # profiling image: channels become cumulative [node pops,
            # leaf encounters, row sweeps] per tile (uniform over lanes,
            # so the developed sum is the exact total over tiles/bounces)
            inv_r = 1.0 / R
            return [res[c] + pp_ref[3 + c].astype(jnp.float32) * inv_r
                    if c < 3 else res[c] for c in range(nc)]

        if is_last:
            if hbm and _ABL_SWEEP_STATS:
                res_ = _stats_override(res_)
            # final bounce: only emission can contribute — statically skip
            # RR, NEE, the shadow sweep, and BSDF sampling.
            if spectral:
                res_ = _cie_develop(res_, wl_d)
            st_out_ref[...] = jnp.stack(
                [dzero] * (6 + nc) + res_
                + [dzero, dzero, key.view(jnp.float32), dzero]
                + ([pix_f] if carry_pixel else [])
                + ([dzero] if leaf_d is not None else []), axis=0)
            return

        pay = [to_dense(alb_r_f), to_dense(alb_g_f), to_dense(alb_b_f)]
        if spectral:
            alb = [_sigmoid_poly(pay[0], pay[1], pay[2], wl_x[c])
                   for c in range(nc)]
        else:
            alb = pay
        kind = to_dense(A_f[10])
        # static scene-content gates: a pure-diffuse scene (Cornell) skips
        # ~200 dense VPU ops/bounce of GGX/Fresnel math entirely
        need_vndf = has_ggx or has_plastic
        is_ggx = ((kind > 0.5) & (kind < 1.5)) if has_ggx \
            else jnp.zeros_like(dzero, bool)
        if need_vndf:
            alpha = jnp.maximum(to_dense(A_f[11]), 1e-3)
        if has_ggx:
            if spectral:
                # cols 12:15 / 15:18 carry anchored-quadratic IOR curve
                # coefficients (ConductorIORSpectrum; must stay in sync
                # with models/spectra.py): eta(x) = (a x + b) x + c at
                # the hero wavelength's normalized x, clamped to the
                # fit span carried in cols 44/45 (full table span for
                # curve-backed metals, 450-600 nm sRGB anchors for
                # rgb-only materials — ADVICE r4)
                ep = [to_dense(A_f[12 + j]) for j in range(3)]
                kp = [to_dense(A_f[15 + j]) for j in range(3)]
                x_lo = to_dense(A_f[44])
                x_hi = to_dense(A_f[45])
                xc = [jnp.clip(wl_x[c], x_lo, x_hi) for c in range(nc)]
                eta_k = [(ep[0] * xc[c] + ep[1]) * xc[c] + ep[2]
                         for c in range(nc)]
                kap_k = [(kp[0] * xc[c] + kp[1]) * xc[c] + kp[2]
                         for c in range(nc)]
            else:
                eta_k = [to_dense(A_f[12 + min(c, 2)]) for c in range(nc)]
                kap_k = [to_dense(A_f[15 + min(c, 2)]) for c in range(nc)]
        if has_diel or has_plastic:
            is_diel = (kind > 2.5) & (kind < 3.5)
            is_plas = (kind > 3.5) & (kind < 5.5)  # 4 smooth / 5 rough
            is_rplas = (kind > 4.5) & (kind < 5.5)
            c2p = [to_dense(A_f[18]), to_dense(A_f[19]),
                   to_dense(A_f[20])]  # spec trans / spec refl payload
            if spectral:
                c2 = [_sigmoid_poly(c2p[0], c2p[1], c2p[2], wl_x[c])
                      for c in range(nc)]
            else:
                c2 = c2p
            eta_d = jnp.maximum(to_dense(A_f[33]), 1e-3)
            ssw = to_dense(A_f[34])
            fdr = to_dense(A_f[35])
            inv_eta2 = to_dense(A_f[36])
            nonlin = to_dense(A_f[37]) > 0.5
        else:
            is_diel = jnp.zeros_like(dzero, bool)

        # FrontSide-only BSDFs terminate on backside hits (no normal
        # flipping); dielectrics are two-sided (dielectric.cpp)
        if has_diel:
            act = act & hit & ((cos_hit > 0) | is_diel)
        else:
            act = act & hit & (cos_hit > 0)
        nx, ny, nz = ngx, ngy, ngz
        pxx = ox + t * dx
        pyy = oy + t * dy
        pzz = oz + t * dz
        eps = (1.0 + jnp.maximum(jnp.abs(pxx),
                                 jnp.maximum(jnp.abs(pyy),
                                             jnp.abs(pzz)))) * 1.8e-4

        # branchless ONB around n (Duff et al.)
        s = jnp.where(nz >= 0, 1.0, -1.0)
        oa = -1.0 / (s + nz)
        ob = nx * ny * oa
        txx, txy, txz = 1.0 + s * nx * nx * oa, s * ob, -s * nx
        tyx, tyy, tyz = ob, s + ny * ny * oa, -ny
        # local frame columns: X=(txx,txy,txz), Y=(tyx,tyy,tyz), Z=n

        def to_local(vx, vy, vz):
            return (vx * txx + vy * txy + vz * txz,
                    vx * tyx + vy * tyy + vz * tyz,
                    vx * nx + vy * ny + vz * nz)

        def to_world(vx, vy, vz):
            return (vx * txx + vy * tyx + vz * nx,
                    vx * txy + vy * tyy + vz * ny,
                    vx * txz + vy * tyz + vz * nz)

        wix, wiy, wiz_r = to_local(-dx, -dy, -dz)
        wiz = jnp.maximum(wiz_r, 1e-6)   # clamped: FrontSide lobes only

        # --- russian roulette (path.cpp:133-141; static gate per depth) ---
        if depth + 1 > rr_depth:
            rr_u, _ = _rng2(key, dim0 + 0)
            mx = thr[0]
            for c in range(1, nc):
                mx = jnp.maximum(mx, thr[c])
            q = jnp.minimum(mx * eta_st * eta_st, 0.95)
            act = act & (rr_u < q)
            inv_q = 1.0 / jnp.maximum(q, 1e-8)
            thr_ = [thr[c] * inv_q for c in range(nc)]
        else:
            thr_ = list(thr)

        # --- NEE over the light-face CDF (pick via MXU, flat domain) ---
        # with an envmap the strategy is two-armed (scene.cpp:165-214
        # role): env with probability p_env (CDF-inverted Hierarchical2D
        # stand-in), area faces with 1-p_env (the light-table densities
        # already carry that factor)
        u_sel, u_b1 = _rng2(key, dim0 + 1)
        u_b2, _ = _rng2(key, dim0 + 2)
        env_arm = has_env and p_env > 0.0
        if env_arm:
            use_env = u_sel < p_env
            u_area = (u_sel - p_env) / max(1.0 - p_env, 1e-8)
        else:
            u_area = u_sel
        lt = lt_ref[:]                                     # (24, L)
        L = lt.shape[1]
        u_sel_f = to_flat(u_area)
        cdf = lt[12]                                       # (L,)
        li = jnp.sum((cdf[:, None] <= u_sel_f[None, :]).astype(jnp.int32),
                     axis=0)
        lids = jax.lax.broadcasted_iota(jnp.int32, (L, R), 0)
        lpick = (lids == jnp.minimum(li, L - 1)[None, :]).astype(
            jnp.float32)
        LT = _dotpick(lt, lpick)
        LTd = [to_dense(LT[k]) for k in range(18)]
        s_t = jnp.sqrt(jnp.maximum(1.0 - u_b1, 0.0))
        bu = 1.0 - s_t
        bv = u_b2 * s_t
        plx = LTd[0] + LTd[3] * bu + LTd[6] * bv
        ply = LTd[1] + LTd[4] * bu + LTd[7] * bv
        plz = LTd[2] + LTd[5] * bu + LTd[8] * bv
        lnx, lny, lnz = LTd[9], LTd[10], LTd[11]
        lw = LTd[13]
        if spectral:
            # light rows carry srgb coefficients + a D65 scale (row 17)
            lrad = [_sigmoid_poly(LTd[14], LTd[15], LTd[16], wl_x[c])
                    * d65[c] * LTd[17] for c in range(nc)]
        else:
            lrad = [LTd[14 + c] for c in range(nc)]

        dxl = plx - pxx
        dyl = ply - pyy
        dzl = plz - pzz
        dist2 = dxl * dxl + dyl * dyl + dzl * dzl
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
        inv_dist = 1.0 / dist
        dxl, dyl, dzl = dxl * inv_dist, dyl * inv_dist, dzl * inv_dist
        cos_l = -(dxl * lnx + dyl * lny + dzl * lnz)
        pdf_l = jnp.where(cos_l > 1e-6,
                          dist2 * lw / jnp.maximum(cos_l, 1e-6), 0.0)
        if env_arm:
            ej1, ej2 = _rng2(key, dim0 + 5)
            edx_f, edy_f, edz_f, epdf_f, epay = env_sample(
                to_flat(u_b1), to_flat(u_b2), to_flat(ej1), to_flat(ej2))
            dxl = jnp.where(use_env, to_dense(edx_f), dxl)
            dyl = jnp.where(use_env, to_dense(edy_f), dyl)
            dzl = jnp.where(use_env, to_dense(edz_f), dzl)
            pdf_l = jnp.where(use_env, to_dense(epdf_f) * p_env, pdf_l)
            epay = [to_dense(x) for x in epay]
            if spectral:
                erad = [_sigmoid_poly(epay[0], epay[1], epay[2], wl_x[c])
                        * epay[3] * d65[c] for c in range(nc)]
            else:
                erad = epay[:nc]
            lrad = [jnp.where(use_env, erad[c], lrad[c])
                    for c in range(nc)]
            # env shadow rays test the whole open segment
            dist = jnp.where(use_env, 1e7, dist)
        cos_s = dxl * nx + dyl * ny + dzl * nz
        # NEE at vertex k+1 creates a path of length k+2: allowed only while
        # k+2 <= max_depth (static here: this branch has depth<max_depth-1)
        nee_ok = act & (pdf_l > 0) & (cos_s > 0)
        if has_diel:
            nee_ok = nee_ok & ~is_diel           # delta lobes: no NEE arm
        if _ABL_NO_SHADOW:
            occluded = jnp.zeros_like(dzero, bool)
        else:
            occ_f = any_hit(to_flat(pxx + nx * eps),
                            to_flat(pyy + ny * eps),
                            to_flat(pzz + nz * eps),
                            to_flat(dxl), to_flat(dyl), to_flat(dzl),
                            zero,
                            to_flat(jnp.where(nee_ok,
                                              dist * (1.0 - 1e-3),
                                              -_BIG)))
            occluded = to_dense(occ_f) > 0.0

        # BSDF eval toward the light (f*cos, albedo included per lobe)
        wox, woy, woz = to_local(dxl, dyl, dzl)
        # diffuse: f*cos = alb/pi * cos_s ; pdf = cos_s/pi
        pdf_diff_l = jnp.maximum(woz, 0.0) / _PI
        if need_vndf:
            # GGX: h = normalize(wi + wo)
            hx_ = wix + wox
            hy_ = wiy + woy
            hz_ = wiz + woz
            hinv = jax.lax.rsqrt(jnp.maximum(
                hx_ * hx_ + hy_ * hy_ + hz_ * hz_, 1e-20))
            hx_, hy_, hz_ = hx_ * hinv, hy_ * hinv, hz_ * hinv
            ci_h = jnp.maximum(wix * hx_ + wiy * hy_ + wiz * hz_, 0.0)
            D = _ggx_d(hz_, alpha)
            G_s = _ggx_g1(wiz, alpha) \
                * _ggx_g1(jnp.maximum(woz, 1e-6), alpha)
            # f = DGF/(4 ci co); f*cos_o = DGF/(4 ci)
            spec_common = D * G_s / jnp.maximum(4.0 * wiz, 1e-20)
            pdf_ggx_l = _ggx_g1(wiz, alpha) * D \
                / jnp.maximum(4.0 * wiz, 1e-20)
            ggx_ok = (woz > 0).astype(jnp.float32)

        fcos_diff = cos_s / _PI
        if has_ggx:
            F_c = [_fresnel_cond(ci_h, eta_k[c], kap_k[c])
                   for c in range(nc)]
            pdf_bsdf_l = jnp.where(is_ggx, pdf_ggx_l, pdf_diff_l)
            f = [jnp.where(is_ggx, alb[c] * spec_common * F_c[c] * ggx_ok,
                           alb[c] * fcos_diff) for c in range(nc)]
        else:
            pdf_bsdf_l = pdf_diff_l
            f = [alb[c] * fcos_diff for c in range(nc)]
        if has_plastic:
            # (rough)plastic NEE (plastic.cpp eval/pdf, roughplastic.cpp):
            # diffuse base behind the coating + GGX dielectric coat (rough)
            Fp_i, _, _, _ = _fresnel_diel(wiz, eta_d)
            Fp_o, _, _, _ = _fresnel_diel(jnp.maximum(woz, 0.0), eta_d)
            prob_sp = Fp_i * ssw / jnp.maximum(
                Fp_i * ssw + (1.0 - Fp_i) * (1.0 - ssw), 1e-8)
            den = [1.0 - jnp.where(nonlin, alb[c] * fdr, fdr)
                   for c in range(nc)]
            dcom = (1.0 / _PI) * inv_eta2 * jnp.maximum(woz, 0.0) \
                * (1.0 - Fp_i) * (1.0 - Fp_o)
            pd = [alb[c] / jnp.maximum(den[c], 1e-8) * dcom
                  for c in range(nc)]
            Fp_h, _, _, _ = _fresnel_diel(ci_h, eta_d)
            sp = spec_common * Fp_h * ggx_ok
            f = [jnp.where(is_plas,
                           pd[c] + jnp.where(is_rplas, c2[c] * sp, 0.0),
                           f[c]) for c in range(nc)]
            pdf_plas = pdf_diff_l * (1.0 - prob_sp) \
                + jnp.where(is_rplas, pdf_ggx_l * prob_sp, 0.0)
            pdf_bsdf_l = jnp.where(is_plas, pdf_plas, pdf_bsdf_l)
        w_nee = _mis(pdf_l, pdf_bsdf_l)
        base = w_nee / jnp.maximum(pdf_l, 1e-20)
        # gate the WHOLE product: miss lanes carry inf/NaN intermediates
        # (t = BIG positions) that must never touch the accumulator
        gate = nee_ok & ~occluded
        if not _ABL_NO_NEE:
            for c in range(nc):
                res_[c] = res_[c] + jnp.where(gate, thr_[c] * base * f[c]
                                              * lrad[c], 0.0)

        # --- BSDF sampling: cosine (diffuse) / GGX VNDF (Heitz 2018) ---
        u_c1, u_c2 = _rng2(key, dim0 + 4)
        # diffuse candidate
        cx_, cy_ = _concentric(u_c1, u_c2)
        cz_ = jnp.sqrt(jnp.maximum(1.0 - cx_ * cx_ - cy_ * cy_, 0.0))
        pdf_diff = cz_ / _PI
        if need_vndf:
            # GGX VNDF candidate
            vhx = alpha * wix
            vhy = alpha * wiy
            vhz = wiz
            vinv = jax.lax.rsqrt(jnp.maximum(
                vhx * vhx + vhy * vhy + vhz * vhz, 1e-20))
            vhx, vhy, vhz = vhx * vinv, vhy * vinv, vhz * vinv
            lensq = vhx * vhx + vhy * vhy
            linv = jax.lax.rsqrt(jnp.maximum(lensq, 1e-20))
            t1x = jnp.where(lensq > 1e-12, -vhy * linv, 1.0)
            t1y = jnp.where(lensq > 1e-12, vhx * linv, 0.0)
            t1z = jnp.zeros_like(t1x)
            t2x = vhy * t1z - vhz * t1y
            t2y = vhz * t1x - vhx * t1z
            t2z = vhx * t1y - vhy * t1x
            rr = jnp.sqrt(jnp.maximum(u_c1, 0.0))
            phi = 2.0 * _PI * u_c2
            p1 = rr * jnp.cos(phi)
            p2 = rr * jnp.sin(phi)
            s_ = 0.5 * (1.0 + vhz)
            p2 = (1.0 - s_) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) \
                + s_ * p2
            pz = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
            nhx = p1 * t1x + p2 * t2x + pz * vhx
            nhy = p1 * t1y + p2 * t2y + pz * vhy
            nhz = p1 * t1z + p2 * t2z + pz * vhz
            mhx = alpha * nhx
            mhy = alpha * nhy
            mhz = jnp.maximum(nhz, 1e-6)
            minv = jax.lax.rsqrt(mhx * mhx + mhy * mhy + mhz * mhz)
            mhx, mhy, mhz = mhx * minv, mhy * minv, mhz * minv
            wm_dot = wix * mhx + wiy * mhy + wiz * mhz
            gox = 2.0 * wm_dot * mhx - wix
            goy = 2.0 * wm_dot * mhy - wiy
            goz = 2.0 * wm_dot * mhz - wiz
        if has_ggx:
            ggx_valid = (goz > 1e-6) & (wm_dot > 0)
            pdf_ggx = _ggx_g1(wiz, alpha) * _ggx_d(mhz, alpha) \
                / jnp.maximum(4.0 * wiz, 1e-20)
            Fs_c = [_fresnel_cond(jnp.maximum(wm_dot, 0.0),
                                  eta_k[c], kap_k[c]) for c in range(nc)]
            g1o = _ggx_g1(jnp.maximum(goz, 1e-6), alpha)
            # VNDF weight = F * G1(wo) (separable Smith)
            wsel_x = jnp.where(is_ggx, gox, cx_)
            wsel_y = jnp.where(is_ggx, goy, cy_)
            wsel_z = jnp.where(is_ggx, goz, cz_)
            bsdf_pdf = jnp.where(is_ggx, pdf_ggx, pdf_diff)
            ok_lobe = (is_ggx & ggx_valid) | (~is_ggx & (cz_ > 0))
            # full throughput multiplier (albedo folded in per lobe)
            mm = [jnp.where(is_ggx, alb[c] * Fs_c[c] * g1o, alb[c])
                  for c in range(nc)]
        else:
            wsel_x, wsel_y, wsel_z = cx_, cy_, cz_
            bsdf_pdf = pdf_diff
            ok_lobe = cz_ > 0
            mm = [alb[c] for c in range(nc)]
        # MIS pdf carried to the next emitter hit (0 => delta lobe)
        mis_pdf = bsdf_pdf
        eta_mul = done_

        if has_diel or has_plastic:
            u_lobe, _ = _rng2(key, dim0 + 3)

        if has_diel:
            # smooth dielectric: two delta lobes by Fresnel (dielectric.cpp
            # semantics via models/bsdfs.py SmoothDielectric.sample)
            F_d, cos_t, eta_it_d, eta_ti_d = _fresnel_diel(wiz_r, eta_d)
            refl_d = u_lobe <= F_d
            ddx = jnp.where(refl_d, -wix, -eta_ti_d * wix)
            ddy = jnp.where(refl_d, -wiy, -eta_ti_d * wiy)
            ddz = jnp.where(refl_d, wiz_r, cos_t)
            # radiance transport: transmitted weight *= eta_ti^2
            md = [jnp.where(refl_d, alb[c], c2[c] * eta_ti_d * eta_ti_d)
                  for c in range(nc)]
            pdf_d = jnp.where(refl_d, F_d, 1.0 - F_d)
            wsel_x = jnp.where(is_diel, ddx, wsel_x)
            wsel_y = jnp.where(is_diel, ddy, wsel_y)
            wsel_z = jnp.where(is_diel, ddz, wsel_z)
            mm = [jnp.where(is_diel, md[c], mm[c]) for c in range(nc)]
            bsdf_pdf = jnp.where(is_diel, pdf_d, bsdf_pdf)
            mis_pdf = jnp.where(is_diel, 0.0, mis_pdf)
            ok_lobe = ok_lobe | is_diel
            eta_mul = jnp.where(is_diel & ~refl_d, eta_it_d, eta_mul)

        if has_plastic:
            # (rough)plastic: coat w.p. prob_sp else cosine diffuse
            # (plastic.cpp / roughplastic.cpp via models/bsdfs.py)
            sel_sp = u_lobe < prob_sp
            # smooth coat: delta mirror; rough coat: the GGX candidate
            spx = jnp.where(is_rplas, gox, -wix)
            spy = jnp.where(is_rplas, goy, -wiy)
            spz = jnp.where(is_rplas, goz, wiz)
            ppx = jnp.where(sel_sp, spx, cx_)
            ppy = jnp.where(sel_sp, spy, cy_)
            ppz = jnp.where(sel_sp, spz, cz_)
            # shared diffuse factors at the sampled wo
            Fp_os, _, _, _ = _fresnel_diel(jnp.maximum(ppz, 0.0), eta_d)
            dcom_s = (1.0 / _PI) * inv_eta2 * jnp.maximum(ppz, 0.0) \
                * (1.0 - Fp_i) * (1.0 - Fp_os)
            fd = [alb[c] / jnp.maximum(den[c], 1e-8) * dcom_s
                  for c in range(nc)]
            pdf_cos = jnp.maximum(ppz, 0.0) / _PI
            # --- smooth plastic: analytic per-lobe weights; the diffuse
            # lane weight is fd/(pdf_cos*(1-prob_sp)) which reduces to
            # plastic.cpp's diff/denom * inv_eta2 (1-Fi)(1-Fo)/(1-prob_sp)
            inv_pd = 1.0 / jnp.maximum(pdf_cos * (1.0 - prob_sp), 1e-20)
            inv_ps = 1.0 / jnp.maximum(prob_sp, 1e-8)
            msm = [jnp.where(sel_sp, c2[c] * Fp_i * inv_ps,
                             fd[c] * inv_pd) for c in range(nc)]
            pdf_sm = jnp.where(sel_sp, prob_sp,
                               pdf_cos * (1.0 - prob_sp))
            mis_sm = jnp.where(sel_sp, 0.0, pdf_cos * (1.0 - prob_sp))
            # --- rough plastic: value = eval(wo)/pdf(wo), mixture pdf ---
            h2x = wix + ppx
            h2y = wiy + ppy
            h2z = wiz + ppz
            h2inv = jax.lax.rsqrt(jnp.maximum(
                h2x * h2x + h2y * h2y + h2z * h2z, 1e-20))
            ci_h2 = jnp.maximum(
                (wix * h2x + wiy * h2y + wiz * h2z) * h2inv, 0.0)
            D2 = _ggx_d(h2z * h2inv, alpha)
            G2 = _ggx_g1(wiz, alpha) \
                * _ggx_g1(jnp.maximum(ppz, 1e-6), alpha)
            Fp_h2, _, _, _ = _fresnel_diel(ci_h2, eta_d)
            spec2 = D2 * G2 * Fp_h2 / jnp.maximum(4.0 * wiz, 1e-20)
            pdf_g2 = _ggx_g1(wiz, alpha) * D2 \
                / jnp.maximum(4.0 * wiz, 1e-20)
            pdf_rp = pdf_g2 * prob_sp + pdf_cos * (1.0 - prob_sp)
            inv_prp = 1.0 / jnp.maximum(pdf_rp, 1e-20)
            mrp = [(c2[c] * spec2 + fd[c]) * inv_prp for c in range(nc)]
            pm = [jnp.where(is_rplas, mrp[c], msm[c]) for c in range(nc)]
            pdf_p = jnp.where(is_rplas, pdf_rp, pdf_sm)
            mis_p = jnp.where(is_rplas, pdf_rp, mis_sm)
            ok_p = ppz > 1e-6
            wsel_x = jnp.where(is_plas, ppx, wsel_x)
            wsel_y = jnp.where(is_plas, ppy, wsel_y)
            wsel_z = jnp.where(is_plas, ppz, wsel_z)
            mm = [jnp.where(is_plas, pm[c], mm[c]) for c in range(nc)]
            bsdf_pdf = jnp.where(is_plas, pdf_p, bsdf_pdf)
            mis_pdf = jnp.where(is_plas, mis_p, mis_pdf)
            # (no jnp.where on bools: Mosaic lacks the i1 select lowering)
            ok_lobe = (is_plas & ok_p) | (~is_plas & ok_lobe)

        ndx, ndy, ndz = to_world(wsel_x, wsel_y, wsel_z)
        thr_ = [thr_[c] * jnp.where(act, mm[c], 1.0) for c in range(nc)]
        thr_sum = thr_[0]
        for c in range(1, nc):
            thr_sum = thr_sum + thr_[c]
        act = act & ok_lobe & (bsdf_pdf > 0) & (thr_sum > 0)
        eta_st_ = jnp.where(act, eta_st * eta_mul, eta_st)
        # offset the new origin to the side the outgoing ray leaves on
        # (transmission continues through the surface)
        off = jnp.where(wsel_z >= 0.0, eps, -eps)

        if hbm and _ABL_SWEEP_STATS:
            res_ = _stats_override(res_)
        st_out_ref[...] = jnp.stack([
            pxx + nx * off, pyy + ny * off, pzz + nz * off,
            ndx, ndy, ndz] + thr_ + res_ + [mis_pdf,
            act.astype(jnp.float32), key.view(jnp.float32), eta_st_]
            + ([pix_f] if carry_pixel else [])
            + ([leaf_d] if leaf_d is not None else []), axis=0)

    if depth == 0:
        run_bounce()
    else:
        @pl.when(jnp.logical_not(any_alive))
        def _():
            if is_last and spectral:
                # a fully-dead tile still owes its accumulated radiance
                # the CIE develop at the last bounce — the st passthrough
                # would leave raw hero-wavelength rows that the host film
                # reads as sRGB (3-4x too bright for D65-lit sky; bug
                # found round 5: all-sky tiles die at depth 1)
                wl_dd, _ = _hero_wavelengths(key, nc)
                res_d = _cie_develop(list(res), wl_dd)
                st_out_ref[...] = jnp.stack(
                    [dzero] * (6 + nc) + res_d
                    + [dzero, dzero, key.view(jnp.float32), dzero]
                    + ([pix_f] if carry_pixel else [])
                    + ([dzero] if (hbm and carry_leaf) else []), axis=0)
            else:
                st_out_ref[...] = st_in_ref[...]

        @pl.when(any_alive)
        def _():
            run_bounce()


# ----------------------------------------------------------------------------
# host-side wrapper
# ----------------------------------------------------------------------------

def _bsdf_columns(bsdf):
    """-> (kind_name, bsdf) for megakernel-eligible BSDFs; None if the
    scene must fall back to the general wavefront."""
    from ..models.bsdfs import (SmoothDiffuse, RoughConductor,
                                SmoothDielectric, SmoothPlastic,
                                RoughPlastic)
    from ..models.textures import ConstantTexture, CheckerboardTexture
    from ..models.spectra import ConductorIORSpectrum
    from ..render.scene import _PerShapeTexture

    def _const(*texs):
        # ConductorIORSpectrum: anchored-quadratic eta/k curve, carried
        # in-kernel as 3 polynomial coefficient columns (spectral mode)
        return all(isinstance(t, (ConstantTexture, _PerShapeTexture,
                                  ConductorIORSpectrum))
                   for t in texs)

    def _iso_ggx(b):
        if b.dist_type != "ggx" or b.alpha_u != b.alpha_v:
            return None
        try:
            alpha = float(b.alpha_u)
        except TypeError:
            return None
        return alpha if alpha >= 0.01 else None

    insts = getattr(bsdf, "merged_instances", None)
    if insts is not None and type(bsdf) is not SmoothDiffuse:
        # merged dispatch wrappers (models/merged.py): eligible iff every
        # member is (the per-shape table builder uses s.bsdf originals)
        if all(_bsdf_columns(b) is not None for b in insts):
            return ("merged", bsdf)
        return None
    if type(bsdf) is SmoothDiffuse and isinstance(
            bsdf.reflectance, (ConstantTexture, _PerShapeTexture)):
        return ("diffuse", bsdf)
    if type(bsdf) is SmoothDiffuse and isinstance(
            bsdf.reflectance, CheckerboardTexture):
        t = bsdf.reflectance
        if isinstance(t.color0, ConstantTexture) \
                and isinstance(t.color1, ConstantTexture):
            return ("checker", bsdf)
        return None
    from ..models.textures import BitmapTexture
    if type(bsdf) is SmoothDiffuse and isinstance(
            bsdf.reflectance, BitmapTexture):
        w, h = bsdf.reflectance.resolution
        if w <= MAX_ATLAS_W and h <= MAX_ATLAS_H:
            return ("bitmap", bsdf)
        return None
    if type(bsdf) is RoughConductor:
        if _iso_ggx(bsdf) is None:
            return None
        if not _const(bsdf.eta_tex, bsdf.k_tex,
                      bsdf.specular_reflectance):
            return None
        return ("ggx", bsdf)
    if type(bsdf) is SmoothDielectric:
        if not _const(bsdf.specular_reflectance,
                      bsdf.specular_transmittance):
            return None
        return ("dielectric", bsdf)
    if type(bsdf) is SmoothPlastic:
        if not _const(bsdf.diffuse_reflectance,
                      bsdf.specular_reflectance):
            return None
        return ("plastic", bsdf)
    if type(bsdf) is RoughPlastic:
        if _iso_ggx(bsdf) is None or not bsdf.sample_visible:
            return None
        if not _const(bsdf.diffuse_reflectance,
                      bsdf.specular_reflectance):
            return None
        return ("roughplastic", bsdf)
    return None


def _pad8(x):
    return max(8, int(np.ceil(x / 8)) * 8)


def _build_range_bvh(boxes):
    """Range-median binary BVH over contiguous leaf boxes, PAIR-NODE
    layout: every row describes an INTERNAL node and carries BOTH
    children's boxes, so one stack pop slab-tests two subtrees (half the
    scalar while_loop iterations of a one-box-per-node walk). The face
    order is already the host SAH builder's leaf order (scene packing),
    so range splits recover its topology without reordering faces.
    -> (nodes (pad8(Nn), 16) f32 rows [Alo3 Ahi3 | Blo3 Bhi3 | pad4],
       ab (Nn, 4) int32 rows [ref a, ref b, split axis, a_is_lower]
       where ref >= 0 is an internal node id and ref < 0 encodes leaf
       -(leaf_idx + 1)). Padded/empty leaves carry NaN boxes, which fail
       every slab comparison and are never visited. Nn = n_leaves - 1
       (vs 2n-1 single-box nodes), halving the SMEM child table too."""
    rows, ab = [], []

    def rec(i, j):
        """-> (ref, box6) for the leaf range [i, j)."""
        if j - i == 1:
            return -(i + 1), boxes[i, :6]
        idx = len(rows)
        rows.append(None)
        ab.append(None)
        m = (i + j) // 2
        ra, boxa = rec(i, m)
        rb, boxb = rec(m, j)
        rows[idx] = np.concatenate([boxa, boxb, [0.0] * 4])
        ca = np.nan_to_num(boxa[0:3] + boxa[3:6])
        cb = np.nan_to_num(boxb[0:3] + boxb[3:6])
        axis = int(np.argmax(np.abs(cb - ca)))
        ab[idx] = (ra, rb, axis, int(ca[axis] <= cb[axis]))
        # fmin/fmax skip NaN (empty padding subtrees don't poison unions)
        union = np.concatenate([np.fmin(boxa[0:3], boxb[0:3]),
                                np.fmax(boxa[3:6], boxb[3:6])])
        return idx, union

    if len(boxes) == 1:
        # degenerate single-leaf tree: pair it with a NaN (never-live) box
        rows.append(np.concatenate([boxes[0, :6], [np.nan] * 6,
                                    [0.0] * 4]))
        ab.append((-1, -1, 0, 1))
    else:
        rec(0, len(boxes))
    nb = np.asarray(rows, np.float32).reshape(len(rows), 16)
    pad = _pad8(len(nb)) - len(nb)
    if pad:
        nb = np.concatenate([nb, np.full((pad, 16), np.nan, np.float32)])
    return nb, np.asarray(ab, np.int32)


class DiffusePathMegakernel:
    """Builds device tables once and renders pixel-major wavefronts."""

    def __init__(self, scene, interpret: bool = False):
        from .intersect_pallas import build_woop
        from ..variants import current as _current
        var = _current()
        self.spectral = var.is_spectral
        self.mono = var.is_monochromatic
        self.nc = var.n_channels
        g = scene.geom
        v0 = np.asarray(g.v0)
        e1 = np.asarray(g.e1)
        e2 = np.asarray(g.e2)
        wu, wv, wz = build_woop(v0, e1, e2)
        self.n_faces = wu.shape[1]
        # chunked face layout: pad to a sublane multiple (8) for a single
        # chunk, to the chunk size for unrolled multi-chunk sweeps, to a
        # full super-chunk (SUPER chunks) for the streamed sweep, or to a
        # full BVH leaf for the HBM tier (> MAX_FACES)
        import os as _osm
        self.hbm = (self.n_faces > MAX_FACES
                    or _osm.environ.get("MK_HBM") == "1")
        if self.n_faces <= FACE_CHUNK and not self.hbm:
            self.chunk = _pad8(self.n_faces)
            F = self.chunk
        elif self.hbm:
            self.chunk = FACE_CHUNK
            step = LEAF_CHUNKS * FACE_CHUNK
            F = int(np.ceil(self.n_faces / step)) * step
        else:
            self.chunk = FACE_CHUNK
            F = int(np.ceil(self.n_faces / FACE_CHUNK)) * FACE_CHUNK
            if F // FACE_CHUNK > UNROLLED_CHUNKS:
                step = SUPER * FACE_CHUNK
                F = int(np.ceil(self.n_faces / step)) * step
        padw = F - self.n_faces

        def padW(w, never=False):
            z = np.zeros((4, padw), np.float32)
            if never:
                z[3] = 1.0    # never-hit: Z=1, DZ=0
            return np.concatenate([w, z], 1) if padw else w

        wu = padW(wu)
        wv = padW(wv)
        wz = padW(wz, never=True)
        # streamed sweep (large meshes): two-level fori_loop with
        # BVH-AABB culling; faces are already BVH-leaf-ordered by Scene
        # packing, so chunk boxes are spatially tight
        C = self.chunk
        self.streamed = (F // C) > UNROLLED_CHUNKS or self.hbm
        # per-chunk [Wu | Wv | Wz] blocks. Streamed: transposed
        # (4, n_chunks*3C) — the 4-axis on sublanes costs 2x padding vs
        # 32x for a 4-lane row-major table (53 MB at 35k faces).
        # Unrolled (small tables): row-major (n_chunks*3C, 4), the form
        # Mosaic lowers to the faster MXU matmul (~16% whole-render).
        blocks = []
        for c in range(F // C):
            blocks += [wu[:, c * C:(c + 1) * C],
                       wv[:, c * C:(c + 1) * C],
                       wz[:, c * C:(c + 1) * C]]
        woop = np.concatenate(blocks, axis=1)
        self.woop = jnp.asarray(woop if self.streamed else
                                np.ascontiguousarray(woop.T))
        if self.streamed:
            from .bvh import chunk_bounds
            cb = chunk_bounds(v0, e1, e2, C)           # (<=n_chunks, 6)
            n_chunks = F // C
            cab = np.zeros((max(_pad8(n_chunks), 8), 8), np.float32)
            cab[:, 0:3] = np.inf
            cab[:, 3:6] = -np.inf
            cab[:len(cb), :6] = cb
            # super-chunk boxes: union of each SUPER consecutive chunks
            n_super = n_chunks // SUPER
            grp = cab[:n_super * SUPER].reshape(n_super, SUPER, 8)
            scab = np.zeros((max(_pad8(n_super), 8), 8), np.float32)
            scab[:, 0:3] = np.inf
            scab[:, 3:6] = -np.inf
            scab[:n_super, 0:3] = grp[:, :, 0:3].min(1)
            scab[:n_super, 3:6] = grp[:, :, 3:6].max(1)
        else:
            cab = np.zeros((8, 8), np.float32)
            scab = np.zeros((8, 8), np.float32)
        self.cab = jnp.asarray(cab)
        self.scab = jnp.asarray(scab)
        # HBM tier: range-median BVH over LEAF_CHUNKS-chunk leaves
        if self.hbm:
            n_chunks = F // C
            n_leaves = n_chunks // LEAF_CHUNKS
            lb = cab[:n_chunks, :6].reshape(n_leaves, LEAF_CHUNKS, 6)
            llo = lb[:, :, 0:3].min(1)
            lhi = lb[:, :, 3:6].max(1)
            empty = ~np.isfinite(llo).all(1) | ~np.isfinite(lhi).all(1)
            llo[empty] = np.nan
            lhi[empty] = np.nan
            nb, ab = _build_range_bvh(
                np.concatenate([llo, lhi], 1).astype(np.float64))
            self.nodes = jnp.asarray(nb)
            # flat 1-D SMEM layout: a 2-D (Nn, 4) SMEM window pads each
            # 16 B row to ~512 B and blows the 1 MB SMEM budget past
            # ~1000 nodes; flat costs the true 16 B/node
            self.ab = jnp.asarray(ab).reshape(-1)
        else:
            self.nodes = jnp.zeros((8, 16), jnp.float32)
            self.ab = jnp.zeros((32,), jnp.int32)

        # scene bounds for the between-bounce morton sort keys
        bb_lo, bb_hi = scene.bbox()
        bb_lo = np.asarray(bb_lo, np.float32)
        bb_hi = np.asarray(bb_hi, np.float32)
        ok_bb = np.isfinite(bb_lo).all() and np.isfinite(bb_hi).all()
        self._bb_lo = bb_lo if ok_bb else np.zeros(3, np.float32)
        self._bb_hi = bb_hi if ok_bb else np.ones(3, np.float32)

        # face attribute table (static parts as numpy; albedo/Le traced)
        fs = np.asarray(g.face_shape)
        ng = np.asarray(g.ng)
        self._scene = scene
        self._fs = fs
        self._F = F
        env_e = scene.environment_emitter
        self.has_env = env_e is not None
        # emissive faces -> light table. In spectral mode the radiance
        # payload is [srgb coeffs, d65 scale] (srgb_d65.cpp semantics);
        # in rgb it is the linear rgb radiance and scale stays 0.
        le_face = np.zeros((self.n_faces, 3), np.float32)
        le_scale = np.zeros((self.n_faces,), np.float32)
        lpdf_w = np.zeros((self.n_faces,), np.float32)
        lights = []
        light_shape = []
        emitters = [e for e in scene.emitters
                    if getattr(e, "_packed", False)]
        for e in emitters:
            areas = np.asarray(e.face_distr.pmf)
            v0e = np.asarray(e.tv0)
            e1e = np.asarray(e.te1)
            e2e = np.asarray(e.te2)
            ne = np.asarray(e.tn)
            if self.spectral:
                rad = np.asarray(e.radiance._coeff, np.float32).reshape(3)
                rscale = float(e.radiance._d65_scale)
            else:
                rad = np.asarray(e.radiance._rgb_np,
                                 np.float32).reshape(3)
                rscale = 0.0
                if self.mono:
                    # channel 0 carries the luminance the mono wavefront
                    # traces (texture data.mono convention)
                    rad = np.full(3, float(rad @ _MONO_LUM), np.float32)
            sidx = scene.shapes.index(e.shape)
            for k in range(len(areas)):
                lights.append(np.concatenate([
                    v0e[k], e1e[k], e2e[k], ne[k],
                    [0.0, 0.0], rad, [rscale], [0.0] * 6]))
                light_shape.append(sidx)
        lights = np.asarray(lights, np.float32)
        # NEE arm selection: with an envmap present, env is sampled with
        # probability p_env and the area-face arm with 1-p_env; the
        # per-area densities below carry that factor so MIS weights stay
        # the actual sampling density (scene.cpp:165-214 role)
        self.p_env = (0.5 if len(lights) else 1.0) if self.has_env else 0.0
        # init-time read so equal-time A/B runs can toggle it in-process
        if _osm.environ.get("MK_NO_ENVNEE") == "1":
            self.p_env = 0.0   # BSDF-sampling-only env (higher variance)
        if len(lights):
            # area faces are sampled area-weighted within their arm; the
            # claimed density MUST be the actual renormalized one — a
            # 1/n_em uniform-pick factor here makes mixed area+env scenes
            # ~n_em x too bright
            tri_area = 0.5 * np.linalg.norm(
                np.cross(lights[:, 3:6], lights[:, 6:9]), axis=1)
            sel = tri_area / max(tri_area.sum(), 1e-20)
            dens = sel / np.maximum(tri_area, 1e-20)   # per-area density
            dens = dens * (1.0 - self.p_env)
            lights[:, 13] = dens
            cdf = np.cumsum(sel)
            lights[:, 12] = cdf
            for row, sidx in enumerate(light_shape):
                mask = fs == sidx
                le_face[mask] = lights[row, 14:17]
                le_scale[mask] = lights[row, 17]
                lpdf_w[mask] = dens[row]
        else:
            lights = np.zeros((1, 24), np.float32)
            lights[0, 12] = 1.0
        Lp = _pad8(len(lights))
        if Lp > len(lights):
            padl = np.zeros((Lp - len(lights), 24), np.float32)
            padl[:, 12] = 2.0  # cdf sentinel: never selected
            lights = np.concatenate([lights, padl])
        self.lights = jnp.asarray(lights.T.copy())         # (24, L)

        # per-shape BSDF static columns (kind/alpha/eta/k/extra)
        shp_kind = np.zeros(max(len(scene.shapes), 1), np.float32)
        shp_alpha = np.zeros_like(shp_kind)
        shp_eta = np.zeros((len(shp_kind), 3), np.float32)
        shp_k = np.zeros_like(shp_eta)
        # IOR quadratic clamp span in normalized x (cols 44/45)
        shp_span = np.zeros((len(shp_kind), 2), np.float32)
        shp_touv = np.zeros((len(shp_kind), 6), np.float32)
        shp_touv[:, 0] = 1.0
        shp_touv[:, 4] = 1.0
        # [eta_d, spec_sampling_weight, fdr_int, inv_eta2, nonlinear]
        shp_extra = np.zeros((len(shp_kind), 5), np.float32)
        # bitmap-albedo atlas regions [v_off, tex_w, tex_h]
        shp_atlas = np.zeros((len(shp_kind), 3), np.float32)
        atlas_slot = {}
        atlas_cursor = 0
        for s_idx, s in enumerate(scene.shapes):
            info = _bsdf_columns(s.bsdf)
            if info is None:
                continue
            kind, b = info
            if kind == "ggx":
                shp_kind[s_idx] = 1.0
                shp_alpha[s_idx] = float(b.alpha_u)
                if self.spectral:
                    # anchored-quadratic IOR curves: cols 12:15 / 15:18
                    # carry the (a, b, c) polynomial coefficients in the
                    # sigmoid-normalized wavelength x (ConductorIOR-
                    # Spectrum; roughconductor.cpp:306-430's role)
                    shp_eta[s_idx] = np.asarray(b.eta_tex._coeff,
                                                np.float32).reshape(3)
                    shp_k[s_idx] = np.asarray(b.k_tex._coeff,
                                              np.float32).reshape(3)
                    shp_span[s_idx] = [b.eta_tex._x_lo, b.eta_tex._x_hi]
                else:
                    eta3 = np.asarray(b.eta_tex._rgb_np,
                                      np.float32).reshape(3)
                    k3 = np.asarray(b.k_tex._rgb_np,
                                    np.float32).reshape(3)
                    if self.mono:
                        # mono conductors trace the luminance IOR (texture
                        # data.mono convention); only column 12/15 is read
                        eta3 = np.full(3, float(eta3 @ _MONO_LUM),
                                       np.float32)
                        k3 = np.full(3, float(k3 @ _MONO_LUM), np.float32)
                    shp_eta[s_idx] = eta3
                    shp_k[s_idx] = k3
            elif kind == "checker":
                shp_kind[s_idx] = 2.0
                tex = b.reflectance
                if tex.to_uv is not None:
                    M = np.asarray(tex.to_uv.matrix, np.float32)
                    shp_touv[s_idx] = [M[0, 0], M[0, 1], M[0, 3],
                                       M[1, 0], M[1, 1], M[1, 3]]
            elif kind == "bitmap":
                shp_kind[s_idx] = 6.0
                tex = b.reflectance
                key = id(tex)
                if key not in atlas_slot:
                    # spectral: the atlas carries per-texel srgb model
                    # coefficients (bitmap.cpp upsamples at load too);
                    # mono: the luminance plane repeated (channel 0 read)
                    if self.spectral:
                        data = np.asarray(tex.data.coeff, np.float32)
                    elif self.mono:
                        data = np.repeat(
                            np.asarray(tex.data.mono, np.float32), 3, -1)
                    else:
                        data = np.asarray(tex._rgb_np, np.float32)
                    atlas_slot[key] = (atlas_cursor, data)
                    atlas_cursor += data.shape[0]
                shp_atlas[s_idx] = [atlas_slot[key][0],
                                    tex.resolution[0],
                                    tex.resolution[1]]
            elif kind == "dielectric":
                shp_kind[s_idx] = 3.0
                shp_extra[s_idx, 0] = float(b.eta)
            elif kind in ("plastic", "roughplastic"):
                shp_kind[s_idx] = 4.0 if kind == "plastic" else 5.0
                if kind == "roughplastic":
                    shp_alpha[s_idx] = float(b.alpha_u)
                shp_extra[s_idx] = [float(b.eta),
                                    float(b.specular_sampling_weight),
                                    float(b.fdr_int),
                                    float(b.inv_eta_2),
                                    1.0 if b.nonlinear else 0.0]

        fattr = np.zeros((F, _FA_COLS), np.float32)
        fattr[:self.n_faces, 0:3] = ng
        fattr[:self.n_faces, 6:9] = le_face
        fattr[:self.n_faces, 43] = le_scale
        fattr[:self.n_faces, 9] = lpdf_w
        fattr[:self.n_faces, 10] = shp_kind[fs]
        fattr[:self.n_faces, 11] = shp_alpha[fs]
        fattr[:self.n_faces, 12:15] = shp_eta[fs]
        fattr[:self.n_faces, 15:18] = shp_k[fs]
        uv0 = np.asarray(g.uv0)
        uv1 = np.asarray(g.uv1)
        uv2 = np.asarray(g.uv2)
        fattr[:self.n_faces, 21:23] = uv0
        fattr[:self.n_faces, 23:25] = uv1 - uv0
        fattr[:self.n_faces, 25:27] = uv2 - uv0
        fattr[:self.n_faces, 27:33] = shp_touv[fs]
        fattr[:self.n_faces, 33:38] = shp_extra[fs]
        fattr[:self.n_faces, 40:43] = shp_atlas[fs]
        fattr[:self.n_faces, 44:46] = shp_span[fs]
        self.has_checker = bool((shp_kind == 2.0).any())
        self.has_bitmap = bool((shp_kind == 6.0).any())
        # channel-blocked (3*aw, Ha) texture atlas, v-stacked; the atlas
        # width is the widest scene texture (the kernel reads it from the
        # ref shape), so photo-sized textures stay on the fast path
        if self.has_bitmap:
            if atlas_cursor > MAX_ATLAS_H:
                raise RuntimeError(
                    f"bitmap atlas rows {atlas_cursor} > {MAX_ATLAS_H}")
            aw = _pad8(max([ATLAS_W] + [d.shape[1]
                                        for _, d in atlas_slot.values()]))
            Ha = _pad8(max(atlas_cursor, 8))
            atlas = np.zeros((3 * aw, Ha), np.float32)
            for voff, data in atlas_slot.values():
                h, w = data.shape[0], data.shape[1]
                for c in range(3):
                    atlas[c * aw:c * aw + w,
                          voff:voff + h] = data[..., c].T
            self.atlas = jnp.asarray(atlas)
        else:
            self.atlas = jnp.zeros((3 * ATLAS_W, 8), jnp.float32)
        self.has_ggx = bool((shp_kind == 1.0).any())
        self.has_diel = bool((shp_kind == 3.0).any())
        self.has_plastic = bool((shp_kind >= 4.0).any())
        self._has_c2 = self.has_checker or self.has_diel or self.has_plastic
        self._fattr_static = fattr

        # analytic spheres (sph geometry + sattr shading rows)
        self.has_spheres = bool(getattr(scene, "n_spheres", 0))
        S = 8
        sph = np.zeros((S, 8), np.float32)
        sattr = np.zeros((S, _FA_COLS), np.float32)
        self._sph_shape_idx = []
        if self.has_spheres:
            tab = np.asarray(scene.sph_table)
            ns = tab.shape[0]
            S = _pad8(ns)
            sph = np.zeros((S, 8), np.float32)
            sattr = np.zeros((S, _FA_COLS), np.float32)
            sph[:ns, 0:4] = tab[:, 0:4]
            sph[:ns, 4] = 1.0
            for si in range(ns):
                s_idx = int(tab[si, 4])
                self._sph_shape_idx.append(s_idx)
                sattr[si, 10] = shp_kind[s_idx]
                sattr[si, 11] = shp_alpha[s_idx]
                sattr[si, 12:15] = shp_eta[s_idx]
                sattr[si, 15:18] = shp_k[s_idx]
                # identity uv mapping: the sphere hit writes spherical
                # uv into the bary slots, so uv = 0 + bu*(1,0) + bv*(0,1)
                sattr[si, 23] = 1.0
                sattr[si, 26] = 1.0
                sattr[si, 27:33] = shp_touv[s_idx]
                sattr[si, 33:38] = shp_extra[s_idx]
                sattr[si, 40:43] = shp_atlas[s_idx]
                sattr[si, 44:46] = shp_span[s_idx]
        self.sph = jnp.asarray(sph.T.copy())               # (8, S)
        self._sattr_static = sattr

        # analytic disk/cylinder prims (scene.quad_table -> in-kernel qd)
        self.has_quads = bool(getattr(scene, "n_quads", 0))
        Qp = 8
        qd = np.zeros((Qp, 16), np.float32)
        qattr = np.zeros((Qp, _FA_COLS), np.float32)
        self._quad_shape_idx = []
        if self.has_quads:
            qt = np.asarray(scene.quad_table)
            nq = qt.shape[0]
            Qp = _pad8(nq)
            qd = np.zeros((Qp, 16), np.float32)
            qattr = np.zeros((Qp, _FA_COLS), np.float32)
            qd[:nq, 0:12] = qt[:, 0:12]                # A rows + b
            qd[:nq, 12] = qt[:, 21]                    # kind
            qd[:nq, 13] = qt[:, 22]                    # radius
            qd[:nq, 14] = qt[:, 23]                    # length
            qd[:nq, 15] = 1.0
            for qi in range(nq):
                s_idx = int(qt[qi, 24])
                self._quad_shape_idx.append(s_idx)
                # disk normal = normalize(A row 2) * flip (constant)
                arow = qt[qi, 6:9]
                nrm = arow / max(np.linalg.norm(arow), 1e-20)
                flip = qt[qi, 29]
                qattr[qi, 0:3] = nrm * flip
                qattr[qi, 10] = shp_kind[s_idx]
                qattr[qi, 11] = shp_alpha[s_idx]
                qattr[qi, 12:15] = shp_eta[s_idx]
                qattr[qi, 15:18] = shp_k[s_idx]
                # identity uv mapping (disk/cylinder hits write their
                # analytic uv into the bary slots)
                qattr[qi, 23] = 1.0
                qattr[qi, 26] = 1.0
                qattr[qi, 27:33] = shp_touv[s_idx]
                qattr[qi, 33:38] = shp_extra[s_idx]
                qattr[qi, 40:43] = shp_atlas[s_idx]
                qattr[qi, 44:46] = shp_span[s_idx]
                qattr[qi, 38] = flip
        self.qd = jnp.asarray(qd.T.copy())             # (16, Q)
        self._qattr_static = qattr

        # scene-packed attribute row count: every A_f reader above row
        # 10 sits behind a static feature flag, so scenes that don't
        # use a feature don't pay its rows in the per-chunk attribute
        # pick, the accumulator where-updates, or the HBM-tier deferred
        # resolve (the MK_NO_ATTR ablation put those at ~85% of the
        # 262k-face render: a diffuse-only scene packs 48 -> 16 rows).
        fa = 11                                        # ng/alb/Le/lpdf/kind
        if self.has_ggx or self.has_plastic:
            fa = 12                                    # alpha
        if self.has_ggx:
            fa = 18                                    # eta/k
        need_uv = self.has_checker or self.has_bitmap
        if need_uv or self.has_diel or self.has_plastic:
            fa = 21                                    # c2 payload
        if need_uv:
            fa = 33                                    # uv/duv/to_uv
        if self.has_diel or self.has_plastic:
            fa = 38                                    # eta_d/ssw/fdr/...
        if self.has_quads:
            fa = 39                                    # quad flip
        if self.has_bitmap:
            fa = 43                                    # atlas region
        if self.spectral:
            fa = max(fa, 44)                           # le_scale
        if self.spectral and self.has_ggx:
            fa = 46                                    # conductor fit span
        self.fa = min(_pad8(fa), _FA_COLS)

        # envmap (rigid to_world rotations handled in-kernel)
        env_e = scene.environment_emitter
        self.has_env = env_e is not None
        self.env_rot = self.env_rot_inv = None
        if self.has_env:
            data = np.asarray(env_e.bitmap._rgb_np, np.float32)
            h, w = data.shape[0], data.shape[1]
            wp, hp = _pad8(w), _pad8(h)
            if self.spectral:
                # envmap.cpp:95-115 per-texel HDR decomposition: scale =
                # 2*max(rgb), srgb sigmoid coefficients of rgb/scale;
                # plane layout c0|c1|c2|scale, all bilinearly interpolated
                # in-kernel like the reference's Vector4f texels
                from ..render.srgb import srgb_model_fetch
                from ..core.spectrum import d65_y_normalization
                sc = 2.0 * data.max(axis=-1)
                unit = data / np.maximum(sc, 1e-8)[..., None]
                coeff = np.asarray(srgb_model_fetch(unit), np.float32)
                env = np.zeros((4 * wp, hp), np.float32)
                for c in range(3):
                    env[c * wp:c * wp + w, :h] = coeff[..., c].T
                # whitepoint normalization folded into the scale plane
                # (the kernel multiplies by the raw D65 table)
                env[3 * wp:3 * wp + w, :h] = \
                    (sc / d65_y_normalization()).T
            elif self.mono:
                # plane 0 carries the luminance the mono wavefront sees
                env = np.zeros((3 * wp, hp), np.float32)
                env[:w, :h] = (data @ _MONO_LUM).T
            else:
                env = np.zeros((3 * wp, hp), np.float32)
                for c in range(3):
                    env[c * wp:c * wp + w, :h] = data[..., c].T
            self.env_w, self.env_h = w, h
            self.env = jnp.asarray(env)                    # (nP*W, H)
            # NEE tables (Hierarchical2D role, envmap.cpp:67): texel
            # importance = luminance * sin(theta_row); rows 0:wp = per-row
            # conditional CDF over u, rows wp:2wp = joint pmf, row 2wp =
            # marginal CDF over v. Padded entries: cdf 2.0 (never
            # selected), pmf 0.
            lum = (0.2126 * data[..., 0] + 0.7152 * data[..., 1]
                   + 0.0722 * data[..., 2])
            stheta = np.sin((np.arange(h) + 0.5) * np.pi / h)
            imp = np.maximum(lum, 0.0) * stheta[:, None] + 1e-12
            # SAMPLING runs on a sum-pooled coarse importance grid
            # (<=128x64): the env NEE arm was 37% of matpreview
            # (prof_matpreview_abl), almost all of it the CDF-inversion
            # matmuls + one-hot picks whose cost is O(W*H). Coverage is
            # exact (sum-pooling preserves support), the estimator stays
            # unbiased because env_pdf claims the SAME coarse density
            # the sampler uses while the radiance payload is still the
            # full-res bilinear fetch; only variance near sub-texel
            # features changes (envmap.cpp:67's Hierarchical2D is also
            # a mip hierarchy, not the full-res grid).
            ws, hs = w, h
            cap_w = int(_osm.environ.get("MK_ENV_SAMPLE_W", "64"))
            cap_h = int(_osm.environ.get("MK_ENV_SAMPLE_H", "32"))
            # ADAPTIVE: only coarsen while no texel concentrates the
            # importance (max pmf < conc x uniform). A sub-texel sun
            # (the matpreview ^400 blob) fails the guard and keeps full
            # resolution — measured: coarsening past it broke the
            # 2.5x env-NEE variance-parity bar while buying +8%
            # throughput; smooth HDRIs coarsen safely.
            conc = float(_osm.environ.get("MK_ENV_SAMPLE_CONC", "32"))

            def _diffuse_enough(a):
                return a.max() / a.sum() * a.size < conc

            while ((ws > cap_w and ws % 2 == 0)
                   or (hs > cap_h and hs % 2 == 0)):
                nxt = imp
                nw, nh = ws, hs
                if ws > cap_w and ws % 2 == 0:
                    nxt = nxt.reshape(nxt.shape[0], -1, 2).sum(-1)
                    nw //= 2
                if hs > cap_h and hs % 2 == 0:
                    nxt = nxt.reshape(-1, 2, nxt.shape[1]).sum(1)
                    nh //= 2
                if not _diffuse_enough(nxt):
                    break
                imp, ws, hs = nxt, nw, nh
            self.env_ws, self.env_hs = ws, hs
            wps, hps = _pad8(ws), _pad8(hs)
            pmf = (imp / imp.sum()).astype(np.float32)     # (hs, ws)
            row_sum = pmf.sum(axis=1)
            marg_cdf = np.cumsum(row_sum)
            cond_cdf = np.cumsum(
                pmf / np.maximum(row_sum[:, None], 1e-20), axis=1)
            envs = np.zeros((2 * wps + 8, hps), np.float32)
            envs[:wps, :] = 2.0
            envs[:ws, :hs] = cond_cdf.T
            envs[wps:wps + ws, :hs] = pmf.T
            envs[2 * wps, :hs] = marg_cdf
            envs[2 * wps, hs:] = 2.0
            self.envs = jnp.asarray(envs)                  # (2Ws+8, Hs)
            M = np.asarray(env_e.to_world.matrix, np.float32)[:3, :3]
            if not np.allclose(M, np.eye(3), atol=1e-6):
                self.env_rot = tuple(float(x) for x in M.reshape(-1))
                self.env_rot_inv = tuple(
                    float(x) for x in M.T.reshape(-1))
        else:
            self.env_w, self.env_h = 8, 8
            self.env_ws, self.env_hs = 8, 8
            self.env = jnp.zeros((24, 8), jnp.float32)
            self.envs = jnp.zeros((24, 8), jnp.float32)

        # spectral SPD table: col 0 = D65 illuminant (in-kernel emitter
        # spectra), cols 1:4 = CIE 1931 x/y/z CMFs (in-kernel XYZ develop
        # at the last bounce — per-lane gathers at develop time cost ~1 s
        # at 4M lanes on TPU, the VMEM iota-pick is ~free)
        if self.spectral:
            from ..core.spectrum import CIE_D65_TABLE, CIE_XYZ_TABLE
            tbl = np.asarray(CIE_D65_TABLE, np.float32)      # (95,)
            cmf = np.asarray(CIE_XYZ_TABLE, np.float32)      # (95, 3)
            d65 = np.zeros((_D65_ROWS, 8), np.float32)
            d65[:95, 0] = tbl
            d65[95, 0] = tbl[94]
            d65[:95, 1:4] = cmf
            d65[95, 1:4] = cmf[94]
            self.d65 = jnp.asarray(d65)
        else:
            self.d65 = jnp.zeros((_D65_ROWS, 8), jnp.float32)
        self.interpret = interpret

    def _payload(self, tex):
        """Per-variant color payload of a constant texture: linear rgb,
        the 3 srgb sigmoid coefficients in spectral mode, or the
        luminance scalar in mono mode (broadcasts into the rgb cols;
        only channel 0 is read when nc == 1)."""
        if self.spectral:
            return tex.data.coeff
        if self.mono:
            return tex.data.mono
        return tex.data.rgb

    def _shape_albedo(self, s):
        """Primary traced color (fattr cols 3:6): diffuse reflectance for
        diffuse/plastic, checker color0, specular reflectance otherwise."""
        from ..models.textures import CheckerboardTexture, BitmapTexture
        b = s.bsdf
        tex = getattr(b, "reflectance", None)
        if isinstance(tex, CheckerboardTexture):
            return self._payload(tex.color0)
        if isinstance(tex, BitmapTexture):
            return jnp.zeros(3)          # kind 6 fetches the atlas
        if tex is None:
            tex = getattr(b, "diffuse_reflectance", None)
        if tex is None:
            tex = getattr(b, "specular_reflectance", None)
        return self._payload(tex) if tex is not None else jnp.zeros(3)

    def _shape_c1(self, s):
        """Secondary traced color (fattr cols 18:21): checker color1,
        dielectric specular_transmittance, plastic specular_reflectance."""
        from ..models.bsdfs import (SmoothDielectric, SmoothPlastic,
                                    RoughPlastic)
        from ..models.textures import CheckerboardTexture
        b = s.bsdf
        tex = getattr(b, "reflectance", None)
        if isinstance(tex, CheckerboardTexture):
            return self._payload(tex.color1)
        if type(b) is SmoothDielectric:
            return self._payload(b.specular_transmittance)
        if type(b) in (SmoothPlastic, RoughPlastic):
            return self._payload(b.specular_reflectance)
        return jnp.zeros(3)

    def _fattr(self):
        """(40,F) with traced per-shape albedo columns (differentiable)."""
        scene = self._scene
        alb = jnp.stack([jnp.broadcast_to(self._shape_albedo(s), (3,))
                         for s in scene.shapes])
        face_alb = alb[self._fs]  # static indices -> cheap
        static = jnp.asarray(self._fattr_static)
        static = static.at[:self.n_faces, 3:6].set(face_alb)
        if self._has_c2:
            c1 = jnp.stack([jnp.broadcast_to(self._shape_c1(s), (3,))
                            for s in scene.shapes])
            static = static.at[:self.n_faces, 18:21].set(c1[self._fs])
        return static.T[:self.fa]

    def _qattr(self):
        static = jnp.asarray(self._qattr_static)
        if not self._quad_shape_idx:
            return static.T[:self.fa]
        scene = self._scene
        alb = jnp.stack([
            jnp.broadcast_to(
                self._shape_albedo(scene.shapes[s_idx]), (3,))
            for s_idx in self._quad_shape_idx])
        static = static.at[:len(self._quad_shape_idx), 3:6].set(alb)
        if self._has_c2:
            c1 = jnp.stack([
                jnp.broadcast_to(
                    self._shape_c1(scene.shapes[s_idx]), (3,))
                for s_idx in self._quad_shape_idx])
            static = static.at[:len(self._quad_shape_idx),
                               18:21].set(c1)
        return static.T[:self.fa]

    def _sattr(self):
        static = jnp.asarray(self._sattr_static)
        if not self._sph_shape_idx:
            return static.T[:self.fa]
        scene = self._scene
        alb = jnp.stack([
            jnp.broadcast_to(
                self._shape_albedo(scene.shapes[s_idx]), (3,))
            for s_idx in self._sph_shape_idx])
        static = static.at[:len(self._sph_shape_idx), 3:6].set(alb)
        if self._has_c2:
            c1 = jnp.stack([
                jnp.broadcast_to(
                    self._shape_c1(scene.shapes[s_idx]), (3,))
                for s_idx in self._sph_shape_idx])
            static = static.at[:len(self._sph_shape_idx), 18:21].set(c1)
        return static.T[:self.fa]

    def render_pass(self, sensor, seed, sample_base, spp_pass,
                    row0=0, n_rows=None):
        """Render spp_pass samples/pixel. row0/n_rows select a horizontal
        band (pixel-sharded multichip): lanes cover rows [row0,
        row0+n_rows) but the TEA chain keys on GLOBAL pixel ids, so a
        band render reproduces exactly the full film's samples."""
        film = sensor.film
        w, h = film.crop_size
        n_rows = h if n_rows is None else n_rows
        n = w * n_rows * spp_pass
        # HBM tier: 1024-ray tiles — the tile-uniform BVH walk culls a
        # per-tile wedge (origin patch x direction cone), and halving
        # the tile tightens the wedge more than it costs in dispatch
        # (measured 0.295 -> 0.362 Mpaths/s at 262k faces; 512 is below
        # the (8, 128) min block shape)
        tile = _HBM_TILE if self.hbm else RAY_TILE
        if self.hbm and tile // 128 > 32:
            # per-row live bitmasks (_slab_pair_live) pack one bit per
            # 128-lane row into ONE int32 — G > 32 would overflow the
            # shifts and silently corrupt leaf-sweep masks (ADVICE r4)
            raise ValueError(
                f"MK_HBM_TILE={tile} gives {tile // 128} rows > 32; the "
                "HBM tier's per-row int32 live bitmasks cap the tile at "
                "4096 rays")
        n_pad = int(np.ceil(n / tile)) * tile
        n_tiles = n_pad // tile
        G = tile // 128
        # the 17-row lane gather costs ~130 ms at 4M lanes (column
        # gather), so re-sorting pays only when it saves sweeps that
        # cost more — i.e. the streamed many-chunk path, where it took
        # the 35k-face bench from 0.48 to 0.89 Mpaths/s. Small unrolled
        # scenes (Cornell: ~19 ms/bounce) lose outright (36 -> 4.5), so
        # they keep the 16-row state and pixel-major lanes throughout.
        import os
        sort_env = os.environ.get("MK_SORT")
        do_sort = self.streamed if sort_env is None else sort_env == "1"
        # sort cadence: the lane re-order costs ~200 ms at 4M lanes
        # (argsort 35 ms + 17-row gather 165 ms, measured), but skipping
        # bounces loses MORE to incoherent sweeps (35k-face bench:
        # every=1 0.89 Mpaths/s, every=2 0.63) — sort every bounce
        sort_every = int(os.environ.get("MK_SORT_EVERY", "1"))
        # HBM tier: key the resort on the bounce's HIT LEAF (carried in
        # an extra state row) — rays that left the same BVH leaf share
        # their near-field overlap set, so rows assembled from one leaf
        # sweep close to the per-ray ideal instead of a 128-ray union
        # (sim_bvh_culling: union 49-78 leaves/tile vs ideal 2-3.6;
        # per-row masks got to 16-20). MK_SORT_KEY=morton restores the
        # round-4 origin-morton key for A/B measurement.
        _sort_key_mode = os.environ.get("MK_SORT_KEY", "leaf")
        carry_leaf = (do_sort and self.hbm
                      and _sort_key_mode != "morton")
        rows = _state_rows(self.nc, do_sort, carry_leaf)
        base_aux = 6 + 2 * self.nc
        mat = jnp.asarray(np.asarray(sensor.world_transform.matrix,
                                     np.float32))
        tan_half = float(np.tan(np.deg2rad(sensor.x_fov) * 0.5))
        cam = jnp.concatenate([
            mat[:3, :3].reshape(-1), mat[:3, 3],
            jnp.asarray([tan_half], jnp.float32),
            jnp.zeros(3, jnp.float32)])[None]
        meta = jnp.stack([jnp.asarray(seed, jnp.int32),
                          jnp.asarray(sample_base, jnp.int32),
                          jnp.asarray(row0 * w, jnp.int32),
                          jnp.asarray(0, jnp.int32)])[None]
        if self.hbm:
            # face tables stay in HBM; leaves are DMA'd by the traversal
            woop_spec = pl.BlockSpec(memory_space=pl.ANY)
            fattr_spec = pl.BlockSpec(memory_space=pl.ANY)
        else:
            woop_spec = pl.BlockSpec(self.woop.shape, lambda i: (0, 0))
            fattr_spec = pl.BlockSpec((self.fa, self._F),
                                      lambda i: (0, 0))
        in_specs = [
            pl.BlockSpec((1, 16), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            woop_spec,
            fattr_spec,
            pl.BlockSpec(self.lights.shape, lambda i: (0, 0)),
            pl.BlockSpec(self.sph.shape, lambda i: (0, 0)),
            pl.BlockSpec((self.fa, self.sph.shape[1]),
                         lambda i: (0, 0)),
            pl.BlockSpec(self.qd.shape, lambda i: (0, 0)),
            pl.BlockSpec((self.fa, self.qd.shape[1]),
                         lambda i: (0, 0)),
            pl.BlockSpec(self.env.shape, lambda i: (0, 0)),
            pl.BlockSpec(self.envs.shape, lambda i: (0, 0)),
            pl.BlockSpec(self.atlas.shape, lambda i: (0, 0)),
            pl.BlockSpec(self.d65.shape, lambda i: (0, 0)),
            pl.BlockSpec(self.cab.shape, lambda i: (0, 0)),
            pl.BlockSpec(self.scab.shape, lambda i: (0, 0)),
            pl.BlockSpec(self.nodes.shape, lambda i: (0, 0)),
            pl.BlockSpec(self.ab.shape, lambda i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, G, 128), lambda i: (0, i, 0)),
        ]
        tables = (cam, meta, self.woop, self._fattr(), self.lights,
                  self.sph, self._sattr(), self.qd, self._qattr(),
                  self.env, self.envs, self.atlas, self.d65, self.cab,
                  self.scab, self.nodes, self.ab)
        # between-bounce ray reordering (the live-ray compaction the
        # reference never had, SURVEY §5): key = origin-morton (8
        # bits/axis over the scene bbox) . direction-octant; dead lanes
        # key to +inf. Sorting costs ~0.1 ms for 4M lanes x 17 rows
        # (measured) and buys (a) dead lanes packed into whole tiles the
        # kernel skips via its any_alive gate — depth cost becomes
        # proportional to live rays — and (b) origin/direction-coherent
        # tiles, which is what makes the streamed sweep's per-chunk AABB
        # culling effective for secondary bounces.
        lo, hi = self._bb_lo, self._bb_hi
        inv_ext = 255.0 / np.maximum(hi - lo, 1e-20)

        def _spread3(x):
            x = (x | (x << 16)) & 0x030000FF
            x = (x | (x << 8)) & 0x0300F00F
            x = (x | (x << 4)) & 0x030C30C3
            x = (x | (x << 2)) & 0x09249249
            return x

        def _resort(state):
            flat = state.reshape(rows, n_pad)
            q = []
            for ax in range(3):
                v = jnp.clip((flat[ax] - lo[ax]) * inv_ext[ax],
                             0.0, 255.0).astype(jnp.int32)
                q.append(_spread3(v))
            octant = ((flat[3] > 0).astype(jnp.int32)
                      + 2 * (flat[4] > 0).astype(jnp.int32)
                      + 4 * (flat[5] > 0).astype(jnp.int32))
            morton = (q[0] << 2) | (q[1] << 1) | q[2]
            if self.hbm and carry_leaf:
                if _sort_key_mode == "dir":
                    # octant . |d|-order cone (6 sub-cones per octant) .
                    # full morton: measured A/B against the leaf key —
                    # the hit-leaf key reproduced the morton key's
                    # counters exactly (179 vs 181 row-sweeps/tile-
                    # bounce), so the row unions are DIRECTION-spread;
                    # this key trades origin-tail bits for a ~20-30
                    # degree direction cone per row.
                    ax = jnp.abs(flat[3])
                    ay = jnp.abs(flat[4])
                    az = jnp.abs(flat[5])
                    d3 = ((ax > ay).astype(jnp.int32)
                          + 2 * (ay > az).astype(jnp.int32)
                          + 4 * (ax > az).astype(jnp.int32))
                    key = (octant << 28) | (d3 << 25) | (morton >> 0)
                elif _sort_key_mode == "dirleaf":
                    ax = jnp.abs(flat[3])
                    ay = jnp.abs(flat[4])
                    az = jnp.abs(flat[5])
                    d3 = ((ax > ay).astype(jnp.int32)
                          + 2 * (ay > az).astype(jnp.int32)
                          + 4 * (ax > az).astype(jnp.int32))
                    leaf_i = flat[base_aux + 5].astype(jnp.int32)
                    key = ((octant << 28) | (d3 << 25)
                           | (leaf_i << 13) | (morton >> 11))
                else:
                    # octant . HIT-LEAF . coarse-morton: rows built from
                    # one (octant, leaf) bucket pay only that bucket's
                    # shared near-field leaf set in the per-row sweep
                    # masks. Leaf ids fit 12 bits (<= 4096 leaves),
                    # morton keeps its top 16 bits for in-bucket origin
                    # locality.
                    leaf_i = flat[base_aux + 5].astype(jnp.int32)
                    key = (octant << 28) | (leaf_i << 16) | (morton >> 8)
            elif self.hbm:
                # HBM BVH tier: octant in the HIGH bits. The ordered
                # traversal picks each split's near child from the
                # tile-dominant direction sign, and the per-tile wedge
                # (origin patch x direction cone) is what the node slab
                # tests cull — a morton-first key packs tiles with
                # mixed-direction rays whose wedge covers half the scene
                # (measured 0.18 Mpaths/s at 262k faces); octant-first
                # restores both assumptions.
                key = (octant << 27) | morton
            else:
                key = (morton << 3) | octant
            key = jnp.where(flat[base_aux + 1] > 0.5, key,
                            jnp.int32(0x7FFFFFFF))
            order = jnp.argsort(key)
            return jnp.take(flat, order, axis=1).reshape(
                rows, n_pad // 128, 128)

        state = jnp.zeros((rows, n_pad // 128, 128), jnp.float32)
        for depth in range(self.max_depth):
            if do_sort and 0 < depth < self.max_depth \
                    and (depth - 1) % sort_every == 0:
                state = _resort(state)
            kernel = functools.partial(
                _path_kernel,
                depth=depth, max_depth=self.max_depth,
                rr_depth=self.rr_depth, n_faces=self.n_faces,
                chunk=self.chunk, spp_pass=spp_pass, width=w, height=h,
                n_lanes=n, has_spheres=self.has_spheres,
                has_quads=self.has_quads,
                has_env=self.has_env, has_checker=self.has_checker,
                has_bitmap=self.has_bitmap,
                has_ggx=self.has_ggx,
                has_diel=self.has_diel, has_plastic=self.has_plastic,
                env_w=self.env_w, env_h=self.env_h,
                env_ws=self.env_ws, env_hs=self.env_hs,
                streamed=self.streamed, carry_pixel=do_sort,
                carry_leaf=carry_leaf,
                nc=self.nc, spectral=self.spectral,
                p_env=self.p_env, env_rot=self.env_rot,
                env_rot_inv=self.env_rot_inv, hbm=self.hbm)
            C = self.chunk
            state = pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((rows, G, 128),
                                       lambda i: (0, i, 0)),
                out_shape=jax.ShapeDtypeStruct(
                    (rows, n_pad // 128, 128), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((8 + self.fa, tile), jnp.float32),
                    # 2 leaf slots (double-buffered HBM->VMEM pipeline)
                    pltpu.VMEM((4, 2 * LEAF_CHUNKS * 3 * C), jnp.float32),
                    pltpu.VMEM((self.fa, 2 * LEAF_CHUNKS * C),
                               jnp.float32),
                    pltpu.SMEM((_STACK_DEPTH,), jnp.int32),
                    # [0] pending leaf, [1] next DMA slot, [2] row mask,
                    # [3:6] MK_SWEEP_STATS traversal counters
                    pltpu.SMEM((6,), jnp.int32),
                    pltpu.SemaphoreType.DMA((2, 2)),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=VMEM_LIMIT),
                interpret=self.interpret,
            )(*tables, state)
        # box-filter reduction: restore pixel-major lane order (lanes
        # were re-sorted between bounces; padding lanes carry the trash
        # pixel w*h and sort past the real ones), then reshape-reduce
        flat = state.reshape(rows, n_pad)
        res_rows = flat[6 + self.nc:6 + 2 * self.nc]
        if do_sort:
            order = jnp.argsort(flat[base_aux + 4].astype(jnp.int32))
            res_rows = jnp.take(res_rows, order, axis=1)
        vals = res_rows[:, :n]
        if self.spectral:
            # the LAST kernel launch already integrated the hero-
            # wavelength radiance against the CIE CMFs and wrote linear
            # sRGB into res rows 0:3 (in-kernel develop — per-lane CIE
            # gathers out here cost ~1 s at 4M lanes on TPU)
            rgb = vals[:3]
        elif self.nc == 1:
            # mono: three identical output channels (wavefront develop
            # convention, tests/test_spectral.py::test_mono_render)
            rgb = jnp.broadcast_to(vals, (3, vals.shape[1]))
        else:
            rgb = vals
        rfilter = sensor.film.rfilter
        from ..models.rfilters import BoxFilter
        if isinstance(rfilter, BoxFilter):
            rgb = rgb.reshape(3, w * n_rows, spp_pass).sum(axis=2)
            img = jnp.concatenate(
                [rgb, jnp.full((1, w * n_rows), float(spp_pass),
                               jnp.float32)],
                axis=0)
            return img.T.reshape(n_rows, w, 4)
        # --- general reconstruction filters (the reference default is
        # gaussian, hdrfilm.cpp:52): separable shift-splat. The per-tap
        # filter weight depends only on the subpixel jitter, which is
        # re-derived from the kernel's own TEA chain, so each of the
        # (2b+1)^2 taps is an elementwise weighted spp-reduction plus a
        # statically-shifted add into the bordered block — no scatter,
        # kernel unchanged (imageblock.cpp:62 semantics).
        lane = jnp.arange(n, dtype=jnp.uint32)
        pixel = (lane // jnp.uint32(spp_pass)
                 + jnp.asarray(row0 * w).astype(jnp.uint32))  # global id
        samp = (lane % jnp.uint32(spp_pass)
                + jnp.asarray(sample_base, jnp.uint32))
        mixed, _ = _tea(pixel, samp, 4)
        seed_vec = jnp.full_like(mixed, jnp.asarray(seed, jnp.uint32))
        pkey, _ = _tea(seed_vec, mixed, 4)
        jx, jy = _rng2(pkey, 0)
        b = int(np.ceil(rfilter.radius - 0.5))
        fx = [rfilter.eval(jnp.float32(o) + 0.5 - jx)
              for o in range(-b, b + 1)]
        fy = [rfilter.eval(jnp.float32(o) + 0.5 - jy)
              for o in range(-b, b + 1)]
        vals4 = jnp.concatenate([rgb, jnp.ones((1, n), jnp.float32)],
                                axis=0)
        acc = jnp.zeros((n_rows + 2 * b, w + 2 * b, 4), jnp.float32)
        for ti, oy in enumerate(range(-b, b + 1)):
            for tj, ox in enumerate(range(-b, b + 1)):
                wgt = fx[tj] * fy[ti]
                tap = (vals4 * wgt[None, :]).reshape(
                    4, w * n_rows, spp_pass).sum(axis=2)
                acc = acc.at[b + oy:b + oy + n_rows,
                             b + ox:b + ox + w].add(
                    tap.T.reshape(n_rows, w, 4))
        return acc


def megakernel_ineligibility(scene):
    """-> None if the scene can ride the fast path, else a short reason
    string (logged by the integrator so fallbacks are observable)."""
    from ..models.emitters import AreaEmitter, EnvironmentMap
    from ..variants import current
    import numpy as _np
    var = current()
    if var.polarized:
        return "polarized variant"
    if var.double_precision:
        return "double-precision variant"
    if var.is_spectral:
        # spectral fast path: hero-wavelength transport in-kernel with
        # srgb-upsampled reflectances + D65 emitter spectra (envmaps ride
        # coefficient+scale planes, envmap.cpp:95-115); scenes outside
        # that scope ride the wavefront
        from ..models.bsdfs import RoughConductor
        from ..models.spectra import ConductorIORSpectrum
        for b in scene.bsdfs:
            members = getattr(b, "merged_instances", None) or [b]
            for bb in members:
                if type(bb) is RoughConductor and not (
                        isinstance(bb.eta_tex, ConductorIORSpectrum)
                        and isinstance(bb.k_tex, ConductorIORSpectrum)):
                    # user-supplied curve spectra stay on the wavefront;
                    # rgb-anchored IORs ride the kernel as quadratic
                    # coefficient columns
                    return "conductor IOR curve spectra in spectral mode"
        for e in scene.emitters:
            if type(e) is AreaEmitter and (
                    not hasattr(e.radiance, "_coeff")
                    or not hasattr(e.radiance, "_d65_scale")):
                return ("area emitter spectrum without srgb_d65 payload "
                        "in spectral mode")
    if scene.has_media:
        return "participating media"
    if scene.geom.v0.shape[0] > MAX_FACES_HBM:
        return f"face count {scene.geom.v0.shape[0]} > {MAX_FACES_HBM}"
    if not scene.shapes:
        return "no shapes"
    if getattr(scene, "n_spheres", 0) > MAX_SPHERES:
        return f"sphere count > {MAX_SPHERES}"
    if getattr(scene, "n_quads", 0) > MAX_SPHERES:
        return f"disk/cylinder count > {MAX_SPHERES}"
    if getattr(scene, "n_instances", 0):
        return "shared-geometry instances (wavefront path only)"
    for b in scene.bsdfs:
        if _bsdf_columns(b) is None:
            return f"unsupported BSDF {type(b).__name__}"
    for sh in scene.shapes:
        if sh.is_analytic():
            # checker/bitmap ride the kernel: analytic hits compute
            # their uv in-kernel (spherical / polar / cylindrical) and
            # share the mesh path's atlas fetch (bitmap.cpp role)
            if _bsdf_columns(sh.bsdf) is None:
                return "unsupported BSDF on analytic shape"
    env = scene.environment_emitter
    for e in scene.emitters:
        if isinstance(e, EnvironmentMap):
            if e is not env:
                return "multiple envmaps"
            if e.res[0] > MAX_ENV_W or e.res[1] > MAX_ENV_W:
                return f"envmap larger than {MAX_ENV_W}"
            M = _np.asarray(e.to_world.matrix)[:3, :3]
            if not _np.allclose(M @ M.T, _np.eye(3), atol=1e-5):
                return "non-rigid envmap to_world"
            continue
        if type(e) is not AreaEmitter:
            return f"unsupported emitter {type(e).__name__}"
        if e.radiance.is_spatially_varying():
            return "textured area emitter"
    return None


def scene_supports_megakernel(scene) -> bool:
    """Fast-path eligibility check."""
    return megakernel_ineligibility(scene) is None
