"""Checkpoint / resume for long renders and inverse-rendering runs.

No reference counterpart (SURVEY.md §5: the reference only has SIGHUP
partial-image develop) — a genuine improvement: film accumulation state and
optimizer state persist across preemptions via orbax.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _ckpt(path):
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer(), ocp


def save_film_state(path: str, state, pass_index: int, meta: dict | None
                    = None):
    """Persist an ImageBlockState mid-render (per-pass accumulation)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    cp = ocp.StandardCheckpointer()
    payload = {
        "data": np.asarray(state.data),
        "border": np.asarray(state.border),
        "pass_index": np.asarray(pass_index),
    }
    if meta:
        payload["meta"] = {k: np.asarray(v) for k, v in meta.items()}
    cp.save(path, payload, force=True)
    cp.wait_until_finished()


def load_film_state(path: str, expect_meta: dict | None = None):
    """-> (ImageBlockState, pass_index).

    When `expect_meta` is given, every key it contains must match the
    checkpoint's stored meta — resuming after changing spp, resolution,
    or channel count would otherwise silently mis-weight the film."""
    import orbax.checkpoint as ocp
    import jax.numpy as jnp
    from ..render.film import ImageBlockState
    cp = ocp.StandardCheckpointer()
    payload = cp.restore(os.path.abspath(path))
    if expect_meta:
        stored = payload.get("meta") or {}
        for k, v in expect_meta.items():
            if k not in stored:
                raise ValueError(
                    f"checkpoint {path} has no '{k}' in its meta; refusing "
                    f"to resume (expected {v!r})")
            got = np.asarray(stored[k])
            if not np.array_equal(got, np.asarray(v)):
                raise ValueError(
                    f"checkpoint {path} was written with {k}={got}, but "
                    f"this render uses {k}={np.asarray(v)}; delete the "
                    f"checkpoint or restore the original settings")
    state = ImageBlockState(jnp.asarray(payload["data"]),
                            int(payload["border"]), (0, 0))
    return state, int(payload["pass_index"])


def save_optimizer(path: str, optimizer):
    """Persist Adam/SGD state + current parameter values."""
    import orbax.checkpoint as ocp
    cp = ocp.StandardCheckpointer()
    sd = optimizer.state_dict()
    payload = {
        "t": np.asarray(sd["t"]),
        "m": {k: np.asarray(v) for k, v in sd["m"].items()},
        "v": {k: np.asarray(v) for k, v in sd["v"].items()},
        "params": {k: np.asarray(v) for k, v in sd["params"].items()},
    }
    cp.save(os.path.abspath(path), payload, force=True)
    cp.wait_until_finished()


def load_optimizer(path: str, optimizer):
    import orbax.checkpoint as ocp
    import jax.numpy as jnp
    cp = ocp.StandardCheckpointer()
    payload = cp.restore(os.path.abspath(path))
    optimizer.load_state_dict({
        "t": int(payload["t"]),
        "m": {k: jnp.asarray(v) for k, v in payload["m"].items()},
        "v": {k: jnp.asarray(v) for k, v in payload["v"].items()},
        "params": {k: jnp.asarray(v) for k, v in payload["params"].items()},
    })
    return optimizer


def render_with_checkpoints(scene, sensor=0, seed=0, spp=None,
                            checkpoint_path=None, checkpoint_every=4):
    """Resumable render: accumulates per-pass film state and checkpoints
    every `checkpoint_every` passes; resumes automatically if the
    checkpoint exists."""
    import jax.numpy as jnp
    from ..render.film import ImageBlock
    if isinstance(sensor, int):
        sensor = scene.sensors[sensor]
    integrator = scene.integrator
    sampler = sensor.sampler
    film = sensor.film
    w, h = film.crop_size
    if spp is None:
        spp = sampler.sample_count
    spp_per_pass = max(1, min(spp, integrator.MAX_WAVEFRONT // (w * h)))
    while spp % spp_per_pass != 0:
        spp_per_pass -= 1
    n_passes = spp // spp_per_pass
    n_aovs = len(integrator.aov_names())
    block = ImageBlock((w, h), 3 + n_aovs, film.rfilter)
    state = block.create()
    start = 0
    # spp/resolution/channel identity of this run; a resume must match
    run_meta = {"spp": spp, "spp_per_pass": spp_per_pass,
                "crop_w": w, "crop_h": h, "n_aovs": n_aovs, "seed": seed}
    if checkpoint_path and os.path.exists(checkpoint_path):
        state, start = load_film_state(checkpoint_path,
                                       expect_meta=run_meta)
    for p in range(start, n_passes):
        data = integrator.render_wavefront(
            scene, sensor, sampler, jnp.uint32(seed),
            jnp.uint32(p * spp_per_pass), spp_per_pass, spp)
        state = state._replace(data=state.data + data)
        if checkpoint_path and ((p + 1) % checkpoint_every == 0
                                or p + 1 == n_passes):
            save_film_state(checkpoint_path, state, p + 1,
                            meta=run_meta)
    return block.develop(state)
