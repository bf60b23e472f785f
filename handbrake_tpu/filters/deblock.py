"""Deblocking (reference: deblock.c, avfilter alias of FFmpeg deblock).

H.264-style weak/strong boundary smoothing on a fixed block grid:
at each vertical/horizontal block edge, if the local gradient is below
``thresh`` (a real edge otherwise), the boundary samples are pulled toward
each other (weak: p0/q0 only; strong: p1/q1 too). Whole grid vectorized —
boundary columns/rows are strided static slices.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.buffer import Buffer
from .base import Filter, FilterInit, register
from ..job import schema as S


@functools.partial(jax.jit, static_argnames=("bs", "thresh", "strong",
                                             "maxval"))
def deblock_plane(plane, bs: int = 8, thresh: int = 20, strong: bool = False,
                  maxval: int = 255):
    x = plane.astype(jnp.int32)
    h, w = plane.shape

    def filter_edges(a, axis):
        n = a.shape[axis]
        out = a
        for edge in range(bs, n - 1, bs):
            if axis == 1:
                p1, p0 = out[:, edge - 2], out[:, edge - 1]
                q0, q1 = out[:, edge], out[:, edge + 1]
            else:
                p1, p0 = out[edge - 2], out[edge - 1]
                q0, q1 = out[edge], out[edge + 1]
            gate = (jnp.abs(p0 - q0) < thresh) \
                & (jnp.abs(p1 - p0) < thresh) \
                & (jnp.abs(q1 - q0) < thresh)
            delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3,
                             -thresh, thresh)
            np0 = jnp.where(gate, jnp.clip(p0 + delta, 0, maxval), p0)
            nq0 = jnp.where(gate, jnp.clip(q0 - delta, 0, maxval), q0)
            if strong:
                np1 = jnp.where(gate, (p1 + np0 + 1) >> 1, p1)
                nq1 = jnp.where(gate, (q1 + nq0 + 1) >> 1, q1)
            else:
                np1, nq1 = p1, q1
            if axis == 1:
                out = out.at[:, edge - 2].set(np1).at[:, edge - 1].set(np0)
                out = out.at[:, edge].set(nq0).at[:, edge + 1].set(nq1)
            else:
                out = out.at[edge - 2].set(np1).at[edge - 1].set(np0)
                out = out.at[edge].set(nq0).at[edge + 1].set(nq1)
        return out

    x = filter_edges(x, 1)
    x = filter_edges(x, 0)
    return jnp.clip(x, 0, maxval).astype(plane.dtype)


@register
class DeblockFilter(Filter):
    id = S.FILTER_DEBLOCK
    name = "deblock"

    def init(self, fi: FilterInit) -> FilterInit:
        s = self.settings
        self.bs = max(4, int(s.get("blocksize", 8)))
        self.thresh = int(s.get("thresh", 20))
        self.strong = s.get("strength", "weak") == "strong"
        self.maxval = (1 << fi.pix_fmt.bit_depth) - 1
        self.fi = fi.copy()
        return self.fi

    def work(self, buf: Buffer) -> list:
        if buf.is_eof() or buf.planes is None:
            return [buf]
        sc = 1 << (buf.pix_fmt.bit_depth - 8)
        planes = [deblock_plane(jnp.asarray(p), bs=self.bs,
                                thresh=self.thresh * sc, strong=self.strong,
                                maxval=self.maxval)
                  for p in buf.planes]
        return [Buffer(planes=planes, pix_fmt=buf.pix_fmt).copy_props(buf)]
