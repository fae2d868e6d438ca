"""Film + ImageBlock.

Parity: include/mitsuba/render/film.h:21 (crop window, prepare/put/develop)
and imageblock.h:20 (filter-splatted accumulation). The reference's CPU path
spirals over blocks (spiral.h) and its GPU path scatter_adds into one
film-sized block (imageblock.cpp:159-168) — the TPU build keeps only the
wavefront path: lanes splat into a border-padded accumulation buffer with
``.at[].add`` (an XLA scatter-add) and ``develop`` normalizes by the filter
weight channel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.object import Object


class ImageBlockState(NamedTuple):
    data: jnp.ndarray     # (h + 2b, w + 2b, ch + 1) values + weight channel
    border: int
    offset: tuple         # crop offset


class ImageBlock:
    """Functional image block: ``put`` returns an updated pytree."""

    def __init__(self, size, n_channels, rfilter, border=None, dtype=jnp.float32):
        self.size = tuple(int(s) for s in size)  # (w, h)
        self.n_channels = int(n_channels)
        self.rfilter = rfilter
        self.border = int(np.ceil(rfilter.radius - 0.5)) if border is None \
            else border
        self.dtype = dtype

    def create(self) -> ImageBlockState:
        w, h = self.size
        b = self.border
        return ImageBlockState(
            jnp.zeros((h + 2 * b, w + 2 * b, self.n_channels + 1), self.dtype),
            b, (0, 0))

    def put(self, state: ImageBlockState, pos, values, active=None,
            weight=None) -> ImageBlockState:
        """Splat values (N, ch) at continuous film positions pos (N, 2).

        Filter taps are a static (2border+1)^2 stencil around the pixel the
        sample falls into (imageblock.cpp:62 semantics: filter evaluated at
        tap_center - sample_pos)."""
        b = self.border
        n_taps = 2 * b + 1
        w, h = self.size
        px = jnp.floor(pos[..., 0])
        py = jnp.floor(pos[..., 1])
        data = state.data
        if weight is None:
            weight = jnp.ones(pos.shape[:-1], self.dtype)
        if active is not None:
            weight = jnp.where(active, weight, 0.0)
            values = jnp.where(active[..., None], values, 0.0)
        vals_w = jnp.concatenate([values, weight[..., None]], axis=-1)
        for ty in range(n_taps):
            for tx in range(n_taps):
                cx = px + (tx - b)
                cy = py + (ty - b)
                fw = (self.rfilter.eval(cx + 0.5 - pos[..., 0])
                      * self.rfilter.eval(cy + 0.5 - pos[..., 1]))
                ix = jnp.clip(cx.astype(jnp.int32) + b, 0, w + 2 * b - 1)
                iy = jnp.clip(cy.astype(jnp.int32) + b, 0, h + 2 * b - 1)
                in_bounds = ((cx >= -b) & (cx < w + b)
                             & (cy >= -b) & (cy < h + b))
                contrib = vals_w * jnp.where(in_bounds, fw, 0.0)[..., None]
                data = data.at[iy, ix].add(contrib)
        return state._replace(data=data)

    def develop(self, state: ImageBlockState):
        """-> (h, w, ch) image normalized by accumulated filter weight."""
        b = self.border
        w, h = self.size
        core = state.data[b:b + h, b:b + w]
        weight = core[..., -1:]
        return core[..., :-1] / jnp.maximum(weight, 1e-20)


class Film(Object):
    """Film base (film.h:21)."""

    def __init__(self, props=None):
        super().__init__(props)
        p = props
        self.size = (int(p.int_("width", 768)), int(p.int_("height", 576))) \
            if p else (768, 576)
        cw = p.int_("crop_width", self.size[0]) if p else self.size[0]
        ch = p.int_("crop_height", self.size[1]) if p else self.size[1]
        cx = p.int_("crop_offset_x", 0) if p else 0
        cy = p.int_("crop_offset_y", 0) if p else 0
        self.crop_size = (int(cw), int(ch))
        self.crop_offset = (int(cx), int(cy))
        self.rfilter = None
        if p is not None:
            for _, obj in p.objects():
                if getattr(obj, "plugin_category", "") == "rfilter":
                    self.rfilter = obj
        if self.rfilter is None:
            from ..models.rfilters import GaussianFilter
            self.rfilter = GaussianFilter()

    def set_crop_window(self, offset, size):
        self.crop_offset = tuple(int(x) for x in offset)
        self.crop_size = tuple(int(x) for x in size)
