"""Integrator bases + the wavefront render drive.

Parity: include/mitsuba/render/integrator.h:37-143. The reference has two
drives — a TBB block loop (CPU, integrator.cpp:99-139) and a CUDA wavefront
(integrator.cpp:140-172). The TPU build keeps ONE jitted wavefront: lanes =
pixels x samples-per-pass, sharded across chips by parallel/ (SURVEY.md §2.4).
``render_sample``'s pipeline (film sample -> sensor ray -> Li -> XYZ -> film
splat, integrator.cpp:233-288) is the traced function body here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.object import Object
from ..core import math as m
from ..core import spectrum as spec_mod
from ..render.film import ImageBlock
from ..variants import current as current_variant


class Integrator(Object):
    """(integrator.h:37-51) — including the cooperative-stop surface:
    `cancel()`, a wall-clock `timeout` property (integrator.h:136-145),
    and partial-image develop between passes (the reference's SIGHUP
    handler, mitsuba.cpp:109-121, gets this via `develop_partial`)."""

    def __init__(self, props=None):
        super().__init__(props)
        self.timeout = float(props.float_("timeout", -1.0)) \
            if props is not None else -1.0
        self._cancel = False
        self._render_start = None
        self._partial = None          # (ImageBlock, state) of last pass

    def render(self, scene, sensor=0, seed=0, spp=None):
        raise NotImplementedError

    def cancel(self):
        """(integrator.h:51) request a cooperative stop: the render drive
        checks between passes and develops what it has."""
        self._cancel = True

    def should_stop(self):
        """(integrator.h:136-145) true once cancelled or past timeout."""
        if self._cancel:
            return True
        if self.timeout > 0.0 and self._render_start is not None:
            import time
            return (time.time() - self._render_start) > self.timeout
        return False

    def develop_partial(self):
        """Develop the passes accumulated so far (SIGHUP partial-image
        semantics, mitsuba.cpp:109-121); None before the first pass
        finishes. Weights are per-pass, so the partial image is already
        correctly normalized."""
        if self._partial is None:
            return None
        block, state = self._partial
        return block.develop(state)


class SamplingIntegrator(Integrator):
    """(integrator.h:70) renders by Monte Carlo sampling a radiance
    estimator `sample()` per film sample."""

    # lanes per jitted pass — bounds the wavefront's HBM working set
    MAX_WAVEFRONT = 1 << 20

    def __init__(self, props=None):
        super().__init__(props)

    def aov_names(self):
        return []

    def wavefront_cap(self, scene, sensor):
        """Max lanes per jitted pass; engines with a smaller per-lane HBM
        footprint (the megakernel) override this upward."""
        return self.MAX_WAVEFRONT

    def sample(self, scene, sampler, state, ray, medium=None, active=True):
        """-> (spectrum, valid_mask, aov list)."""
        raise NotImplementedError

    # ------------------------------------------------------------------ drive
    def render(self, scene, sensor=0, seed=0, spp=None, develop=True):
        from ..variants import variant as _variant_name
        got = getattr(scene, "variant_name", None)
        if got is not None and got != _variant_name():
            raise RuntimeError(
                f"scene was loaded under variant {got!r} but the active "
                f"variant is {_variant_name()!r}; reload the scene after "
                "set_variant (scenes cannot cross variants, like the "
                "reference's per-variant modules)")
        if isinstance(sensor, int):
            sensor = scene.sensors[sensor]
        film = sensor.film
        sampler = sensor.sampler
        w, h = film.crop_size
        if spp is None:
            spp = sampler.sample_count
        n_pixels = w * h
        cap = self.wavefront_cap(scene, sensor)
        spp_per_pass = max(1, min(spp, cap // n_pixels))
        while spp % spp_per_pass != 0:
            spp_per_pass -= 1
        n_passes = spp // spp_per_pass

        n_aovs = len(self.aov_names())
        block = ImageBlock((w, h), 3 + n_aovs, film.rfilter)

        # cache the compiled pass across render() calls (seed/pass index are
        # traced arguments, so one executable serves every seed)
        from ..core.object import param_epoch
        # engine toggles are trace-time routing decisions — they must key
        # the executable cache or a toggled render reuses the wrong engine
        cache_key = (id(scene), id(sensor), spp_per_pass, spp,
                     param_epoch(),
                     getattr(self, "_disable_megakernel", False),
                     getattr(scene, "_disable_pallas", False))
        cache = getattr(self, "_pass_cache", None)
        if cache is None:
            cache = self._pass_cache = {}
        render_pass = cache.get(cache_key)
        if render_pass is None:
            # evict executables from older parameter epochs
            for k in list(cache):
                if k[:4] == cache_key[:4] and k[4] != cache_key[4]:
                    del cache[k]
            render_pass = jax.jit(
                lambda s, base: self.render_wavefront(
                    scene, sensor, sampler, s, base, spp_per_pass, spp))
            cache[cache_key] = render_pass

        import time
        self._cancel = False
        self._render_start = time.time()
        state = block.create()
        for p in range(n_passes):
            if p > 0 and self.should_stop():
                from ..core import logger as _log
                _log.Log(_log.Warn,
                         f"render stopped after {p}/{n_passes} passes "
                         f"({'cancelled' if self._cancel else 'timeout'});"
                         f" developing partial image")
                break
            data = render_pass(jnp.uint32(seed),
                               jnp.uint32(p * spp_per_pass))
            state = state._replace(data=state.data + data)
            self._partial = (block, state)
        image = block.develop(state)
        if develop:
            return image
        return state

    def render_wavefront(self, scene, sensor, sampler, seed, sample_base,
                         spp_pass, spp_total):
        """One jitted pass over w*h*spp_pass lanes; returns the image block
        accumulation buffer for this pass."""
        film = sensor.film
        w, h = film.crop_size
        n_pixels = w * h
        n = n_pixels * spp_pass
        var = current_variant()
        dt = var.dtype

        lane = jnp.arange(n, dtype=jnp.uint32)
        pixel_id = lane // jnp.uint32(spp_pass)
        sample_id = lane % jnp.uint32(spp_pass) + sample_base
        px = (pixel_id % jnp.uint32(w)).astype(dt)
        py = (pixel_id // jnp.uint32(w)).astype(dt)

        state = sampler.seed(seed, pixel_id, sample_id)

        # film sample position (integrator.cpp:250-258)
        jitter, state = sampler.next_2d(state)
        pos_px = jnp.stack([px, py], -1) + jitter
        pos01 = pos_px / jnp.asarray([w, h], dt)

        # sensor ray
        ap_sample, state = sampler.next_2d(state)
        time_sample, state = sampler.next_1d(state)
        wav_sample, state = sampler.next_1d(state)
        time = sensor.shutter_open
        if sensor.shutter_close != sensor.shutter_open:
            time = sensor.shutter_open + time_sample \
                * (sensor.shutter_close - sensor.shutter_open)
        ray, ray_weight = sensor.sample_ray(time, wav_sample, pos01,
                                            ap_sample, True)

        spec, valid, aovs = self.sample(scene, sampler, state, ray)
        spec = spec * ray_weight

        # -> working RGB (integrator.cpp:269-277)
        def to_rgb(s):
            if var.is_spectral:
                # channel-major conversion: (n, S)-minor layouts pad the
                # S axis to 128 lanes on TPU and the per-lane CIE gathers
                # dominate the whole develop (see cie1931_xyz_rows)
                return spec_mod.spectrum_to_srgb_rows(
                    s.T, ray.wavelengths.T).T
            if var.is_monochromatic:
                return jnp.repeat(s, 3, axis=-1)
            return s

        rgb = to_rgb(spec)
        if aovs and getattr(self, "SPECTRAL_AOVS", False):
            # radiometric aovs (e.g. Stokes components): same ray weight
            # and color conversion as the main spectrum
            conv = []
            for a in aovs:
                a_rgb = to_rgb(a * ray_weight)
                conv.extend(a_rgb[..., c] for c in range(3))
            aovs = conv
        values = rgb if not aovs else jnp.concatenate(
            [rgb] + [a[..., None] for a in aovs], axis=-1)

        n_aovs = len(self.aov_names())
        block = ImageBlock((w, h), 3 + n_aovs, film.rfilter)
        from ..models.rfilters import BoxFilter
        if isinstance(film.rfilter, BoxFilter) and block.border == 0:
            # box-filter fast path: jittered samples stay inside their own
            # pixel and lanes are pixel-major, so the splat is a reshape +
            # reduction over the spp axis — no scatter at all
            vals_w = jnp.concatenate(
                [values, jnp.ones(values.shape[:-1] + (1,), values.dtype)],
                axis=-1)
            img = vals_w.reshape(n_pixels, spp_pass, -1).sum(axis=1)
            return img.reshape(h, w, -1)
        bstate = block.create()
        bstate = block.put(bstate, pos_px, values)
        return bstate.data


class MonteCarloIntegrator(SamplingIntegrator):
    """(integrator.h:143) adds max_depth / rr_depth handling
    (integrator.cpp:302-315)."""

    def __init__(self, props=None):
        super().__init__(props)
        p = props
        self.max_depth = int(p.int_("max_depth", -1)) if p else -1
        self.rr_depth = int(p.int_("rr_depth", 5)) if p else 5
        if self.max_depth < 0:
            if self.max_depth != -1:
                raise RuntimeError("max_depth must be >= 0 or -1")
            # unbounded depth: RR terminates lanes; hard cap for safety
            self.max_depth = 1024


def mis_weight(pdf_a, pdf_b):
    """Power-2 MIS heuristic (path.cpp:223-227)."""
    pdf_a = pdf_a * pdf_a
    pdf_b = pdf_b * pdf_b
    return m.safe_div(pdf_a, pdf_a + pdf_b, 0.0)
