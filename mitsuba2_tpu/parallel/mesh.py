"""Multi-chip rendering over a jax.sharding.Mesh.

New design space (the reference has no distributed path — zmq11.h is dead
code, SURVEY.md §2.4): Monte Carlo rendering is embarrassingly parallel over
samples and pixels, so the sharding story is:

- **sample axis** (default): every chip renders the full film at spp/n_chips
  samples with decorrelated RNG streams (sample indices are globally unique,
  so the counter-based sampler needs no coordination); film accumulation
  buffers are reduced with `psum` over ICI.
- **pixel axis** (film too large for replication): shard rows of the film;
  each chip owns its crop and no collective is needed until assembly.

Both compile through `shard_map` and run unchanged on the CPU-mesh test rig
(`--xla_force_host_platform_device_count`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def default_mesh(devices=None, axis_name: str = "chips") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def render_multichip(scene, sensor=0, seed=0, spp=None, mesh=None,
                     axis_name: str = "chips", develop=True,
                     force_megakernel=False):
    """Sample-axis-sharded render: each chip renders spp/n samples of the
    full film; blocks psum-reduce over the mesh.

    force_megakernel: route through the megakernel branch even off-TPU
    (interpret-mode pallas) — CI exercises THIS function's kernel branch
    on the virtual CPU mesh instead of a hand-copied facsimile."""
    if isinstance(sensor, int):
        sensor = scene.sensors[sensor]
    integrator = scene.integrator
    film = sensor.film
    sampler = sensor.sampler
    if mesh is None:
        mesh = default_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size
    if spp is None:
        spp = sampler.sample_count
    if spp % n_dev != 0:
        raise ValueError(f"spp ({spp}) must divide by mesh size ({n_dev})")
    spp_per_dev = spp // n_dev

    # the megakernel is per-lane (no collectives), so it composes with
    # shard_map directly on TPU; each chip renders spp/n samples through
    # the same pallas_call and only the film psum rides the ICI
    mk = None
    if (jax.default_backend() == "tpu" or force_megakernel) \
            and hasattr(integrator, "_megakernel_for") \
            and not getattr(integrator, "_disable_megakernel", False):
        if force_megakernel:
            integrator._force_megakernel = True
        try:
            mk = integrator._megakernel_for(scene, sensor)
        finally:
            if force_megakernel:
                integrator._force_megakernel = False

    if mk is not None:
        # check_vma=False: pallas_call's ShapeDtypeStruct outputs carry
        # no varying-mesh-axes annotation, which the checker rejects
        # (found by tests/test_parallel.py's n=2 megakernel parity test)
        @partial(jax.shard_map, mesh=mesh, in_specs=P(axis_name),
                 out_specs=P(), check_vma=False)
        def shard_fn(dev_ids):
            base = dev_ids[0] * jnp.int32(spp_per_dev)
            img = mk.render_pass(sensor, jnp.int32(seed), base,
                                 spp_per_dev)
            return jax.lax.psum(img, axis_name)

        integrator.last_engine = "megakernel"
        data = jax.jit(shard_fn)(jnp.arange(n_dev, dtype=jnp.int32))
    else:
        @partial(jax.shard_map, mesh=mesh, in_specs=P(axis_name),
                 out_specs=P())
        def shard_fn(dev_ids):
            base = dev_ids[0] * jnp.uint32(spp_per_dev)
            data = integrator.render_wavefront(
                scene, sensor, sampler, jnp.uint32(seed), base,
                spp_per_dev, spp)
            return jax.lax.psum(data, axis_name)

        dev_ids = jnp.arange(n_dev, dtype=jnp.uint32)
        # the XLA-wavefront fallback cannot host the Woop pallas
        # intersector inside the sharded region on non-TPU meshes
        if jax.default_backend() == "tpu":
            from ..core import logger as _log
            _log.Log(_log.Info, "multichip: XLA wavefront inside "
                     "shard_map (scene not megakernel-eligible)")
        integrator._disable_megakernel = True
        scene._disable_pallas = True
        try:
            data = jax.jit(shard_fn)(dev_ids)
        finally:
            integrator._disable_megakernel = False
            scene._disable_pallas = False

    from ..render.film import ImageBlock
    w, h = film.crop_size
    n_aovs = len(integrator.aov_names())
    block = ImageBlock((w, h), 3 + n_aovs, film.rfilter)
    state = block.create()._replace(data=data)
    if develop:
        return block.develop(state)
    return state


def render_multichip_pixel_sharded(scene, sensor=0, seed=0, spp=None,
                                   mesh=None, axis_name: str = "chips",
                                   force_megakernel=False):
    """Pixel-axis sharding: each chip renders a horizontal band of the film
    (no cross-chip reduction; bands concatenate on the host). Border rows
    overlap by the filter radius so splats crossing band edges stay exact.

    Eligible scenes ride the megakernel per band (render_pass row0/n_rows
    band support — the TEA chain keys on global pixel ids, so the union
    of bands is sample-for-sample the single-chip render)."""
    if isinstance(sensor, int):
        sensor = scene.sensors[sensor]
    integrator = scene.integrator
    film = sensor.film
    sampler = sensor.sampler
    if mesh is None:
        mesh = default_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size
    if spp is None:
        spp = sampler.sample_count
    w, h = film.crop_size
    if h % n_dev != 0:
        raise ValueError(f"film height ({h}) must divide by mesh ({n_dev})")
    band_h = h // n_dev

    from ..render.film import ImageBlock
    block_full = ImageBlock((w, h), 3, film.rfilter)
    b = block_full.border

    mk = None
    if (jax.default_backend() == "tpu" or force_megakernel) \
            and hasattr(integrator, "_megakernel_for") \
            and not getattr(integrator, "_disable_megakernel", False):
        if force_megakernel:
            integrator._force_megakernel = True
        try:
            mk = integrator._megakernel_for(scene, sensor)
        finally:
            if force_megakernel:
                integrator._force_megakernel = False

    if mk is not None:
        from ..models.rfilters import BoxFilter
        is_box = isinstance(film.rfilter, BoxFilter)

        @partial(jax.shard_map, mesh=mesh, in_specs=P(axis_name),
                 out_specs=P(axis_name), check_vma=False)
        def shard_fn(dev_ids):
            row0 = dev_ids[0] * jnp.int32(band_h)
            img = mk.render_pass(sensor, jnp.int32(seed), 0, spp,
                                 row0=row0, n_rows=band_h)
            return img[None]

        integrator.last_engine = "megakernel"
        bands = np.asarray(jax.jit(shard_fn)(
            jnp.arange(n_dev, dtype=jnp.int32)))
        if is_box:   # (n_dev, band_h, w, 4) — no border overlap
            full = bands.reshape(h, w, 4)
            return full[..., :3] / np.maximum(full[..., 3:], 1e-20)
        full = np.zeros((h + 2 * b, w + 2 * b, 4), np.float32)
        for i in range(n_dev):
            full[i * band_h:i * band_h + band_h + 2 * b] += bands[i]
        core = full[b:b + h, b:b + w]
        return core[..., :3] / np.maximum(core[..., 3:], 1e-20)

    @partial(jax.shard_map, mesh=mesh, in_specs=P(axis_name),
             out_specs=P(axis_name))
    def shard_fn(dev_ids):
        row0 = dev_ids[0] * jnp.uint32(band_h)
        data = _render_band(scene, sensor, sampler, integrator,
                            jnp.uint32(seed), row0, band_h, spp)
        return data[None]

    dev_ids = jnp.arange(n_dev, dtype=jnp.uint32)
    integrator._disable_megakernel = True
    scene._disable_pallas = True
    try:
        bands = jax.jit(shard_fn)(dev_ids)  # (n_dev, band_h+2b, w+2b, ch)
    finally:
        integrator._disable_megakernel = False
        scene._disable_pallas = False
    # assemble with overlap-add of the borders
    full = np.zeros((h + 2 * b, w + 2 * b, bands.shape[-1]), np.float32)
    bands = np.asarray(bands)
    for i in range(n_dev):
        full[i * band_h:i * band_h + band_h + 2 * b] += bands[i]
    core = full[b:b + h, b:b + w]
    weight = core[..., -1:]
    return core[..., :-1] / np.maximum(weight, 1e-20)


def _render_band(scene, sensor, sampler, integrator, seed, row0, band_h,
                 spp):
    """Render all lanes of a band of rows; returns the band's padded
    accumulation buffer."""
    from ..render.film import ImageBlock
    from ..variants import current as current_variant
    film = sensor.film
    w, h = film.crop_size
    var = current_variant()
    dt = var.dtype
    n = w * band_h * spp
    lane = jnp.arange(n, dtype=jnp.uint32)
    local_pixel = lane // jnp.uint32(spp)
    sample_id = lane % jnp.uint32(spp)
    px = (local_pixel % jnp.uint32(w)).astype(dt)
    py_local = local_pixel // jnp.uint32(w)
    py = (py_local + row0).astype(dt)
    pixel_id = local_pixel + row0 * jnp.uint32(w)
    state = sampler.seed(seed, pixel_id, sample_id)
    jitter, state = sampler.next_2d(state)
    pos_px = jnp.stack([px, py], -1) + jitter
    pos01 = pos_px / jnp.asarray([w, h], dt)
    ap, state = sampler.next_2d(state)
    tsamp, state = sampler.next_1d(state)
    wsamp, state = sampler.next_1d(state)
    ray, ray_weight = sensor.sample_ray(sensor.shutter_open, wsamp, pos01,
                                        ap, True)
    spec, valid, aovs = integrator.sample(scene, sampler, state, ray)
    spec = spec * ray_weight
    from ..core import spectrum as spec_mod
    if var.is_spectral:
        rgb = spec_mod.xyz_to_srgb(spec_mod.spectrum_to_xyz(spec,
                                                            ray.wavelengths))
    elif var.is_monochromatic:
        rgb = jnp.repeat(spec, 3, axis=-1)
    else:
        rgb = spec
    band_block = ImageBlock((w, band_h), 3, film.rfilter)
    bstate = band_block.create()
    pos_band = pos_px - jnp.asarray([0.0, 1.0], dt) * row0.astype(dt)
    bstate = band_block.put(bstate, pos_band, rgb)
    return bstate.data
