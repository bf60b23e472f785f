"""Debanding (reference: deband.c, avfilter alias of FFmpeg deband).

For each pixel, four reference samples at pseudo-random offsets within
``range`` are averaged; if every reference is within ``thresh`` of the
pixel, the pixel is replaced by the average. The per-pixel offsets come
from a position hash (deterministic, no host RNG), realized as a one-hot
select over a small set of candidate static shifts — gather-free.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..core.buffer import Buffer
from .base import Filter, FilterInit, register
from ..job import schema as S


def _shift2(a, dy, dx):
    h, w = a.shape
    ys = np.clip(np.arange(h) + dy, 0, h - 1)
    xs = np.clip(np.arange(w) + dx, 0, w - 1)
    return a[ys][:, xs]


@functools.partial(jax.jit, static_argnames=("rng", "thresh", "maxval"))
def deband_plane(plane, rng: int = 16, thresh: int = 12, maxval: int = 255):
    x = plane.astype(jnp.int32)
    h, w = plane.shape
    # position hash → one of 8 candidate offset quadruples
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    sel = ((yy * 7 + xx * 13 + (yy >> 3) * 31) % 8)
    cands = []
    for k in range(8):
        r1 = 1 + (k * 5 + 3) % rng
        r2 = 1 + (k * 11 + 7) % rng
        refs = [_shift2(x, -r1, 0), _shift2(x, r1, 0),
                _shift2(x, 0, -r2), _shift2(x, 0, r2)]
        avg = (refs[0] + refs[1] + refs[2] + refs[3] + 2) >> 2
        ok = ((jnp.abs(refs[0] - x) < thresh)
              & (jnp.abs(refs[1] - x) < thresh)
              & (jnp.abs(refs[2] - x) < thresh)
              & (jnp.abs(refs[3] - x) < thresh))
        cands.append(jnp.where(ok, avg, x))
    out = x
    for k in range(8):
        out = jnp.where(sel == k, cands[k], out)
    return jnp.clip(out, 0, maxval).astype(plane.dtype)


@register
class DebandFilter(Filter):
    id = S.FILTER_DEBAND
    name = "deband"

    def init(self, fi: FilterInit) -> FilterInit:
        s = self.settings
        self.range = max(1, int(s.get("range", 16)))
        self.thresh = int(s.get("thresh", 12))
        self.maxval = (1 << fi.pix_fmt.bit_depth) - 1
        self.fi = fi.copy()
        return self.fi

    def work(self, buf: Buffer) -> list:
        if buf.is_eof() or buf.planes is None:
            return [buf]
        sc = 1 << (buf.pix_fmt.bit_depth - 8)
        planes = [deband_plane(jnp.asarray(p), rng=self.range,
                               thresh=self.thresh * sc, maxval=self.maxval)
                  for p in buf.planes]
        return [Buffer(planes=planes, pix_fmt=buf.pix_fmt).copy_props(buf)]
