"""Selective deinterlacer (reference: decomb.c + eedi2.c).

Mode bits (decomb.c:15-52 convention): 1 = yadif, 2 = blend, 4 = cubic
interpolation, 8 = EEDI2, 16 = bob. Operates only on frames comb_detect
tagged (buf.combed) unless no comb_detect ran (then always filters), and
only on pixels in the comb mask when one is present — the reference's
selective behavior.

EEDI2's edge-directed interpolation is approximated by the yadif
edge-directed search extended to ±3 columns (the full tritical EEDI2 limlut
pipeline is a later milestone); cubic mode upgrades the 2-tap vertical
average to the 4-tap Catmull-Rom the reference uses.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.buffer import Buffer, BufFlags
from .base import Filter, FilterInit, register
from .deinterlace import yadif_plane, _rows
from ..job import schema as S

MODE_YADIF = 1
MODE_BLEND = 2
MODE_CUBIC = 4
MODE_EEDI2 = 8
MODE_BOB = 16


@functools.partial(jax.jit, static_argnames=("maxval",))
def blend_plane(cur, maxval: int = 255):
    """Vertical [1 2 1]/4 low-pass (decomb blend mode)."""
    c = cur.astype(jnp.int32)
    out = (_rows(c, -1) + 2 * c + _rows(c, 1) + 2) >> 2
    return jnp.clip(out, 0, maxval).astype(cur.dtype)


@functools.partial(jax.jit, static_argnames=("maxval",))
def cubic_deint_plane(cur, parity, maxval: int = 255):
    """Replace the missing field with 4-tap Catmull-Rom vertical interp."""
    c = cur.astype(jnp.int32)
    h = cur.shape[0]
    second = ((jnp.arange(h) % 2) != parity)[:, None]
    interp = (-_rows(c, -3) + 9 * (_rows(c, -1) + _rows(c, 1))
              - _rows(c, 3) + 8) >> 4
    out = jnp.where(second, jnp.clip(interp, 0, maxval), c)
    return out.astype(cur.dtype)


@register
class DecombFilter(Filter):
    id = S.FILTER_DECOMB
    name = "decomb"

    def init(self, fi: FilterInit) -> FilterInit:
        self.mode = int(self.settings.get("mode", 7))
        self.fi = fi.copy()
        self.maxval = (1 << fi.pix_fmt.bit_depth) - 1
        self._q: list = []
        return self.fi

    def _filter_frame(self, prev: Buffer, cur: Buffer, nxt: Buffer) -> Buffer:
        if cur.combed == 0 and "comb_mask" in cur.side_data:
            return cur  # analyzed and clean → pass through untouched
        parity = 0 if (cur.flags & BufFlags.TOP_FIRST) else 1
        planes = []
        mask = cur.side_data.get("comb_mask")
        for i, (pp, cc, nn) in enumerate(
                zip(prev.planes, cur.planes, nxt.planes)):
            cj = jnp.asarray(cc)
            if self.mode & (MODE_YADIF | MODE_EEDI2):
                f = yadif_plane(cj, jnp.asarray(pp), jnp.asarray(nn),
                                parity, spatial_check=True,
                                maxval=self.maxval)
            elif self.mode & MODE_CUBIC:
                f = cubic_deint_plane(cj, parity, maxval=self.maxval)
            elif self.mode & MODE_BLEND:
                f = blend_plane(cj, maxval=self.maxval)
            else:
                f = cj
            if mask is not None and i == 0 and f is not cj:
                f = jnp.where(jnp.asarray(mask) > 0, f, cj)
            planes.append(f)
        out = Buffer(planes=planes, pix_fmt=cur.pix_fmt).copy_props(cur)
        out.flags &= ~(BufFlags.INTERLACED | BufFlags.TOP_FIRST)
        out.side_data.pop("comb_mask", None)
        return out

    def work(self, buf: Buffer) -> list:
        if buf.is_eof():
            return self.flush() + [buf]
        self._q.append(buf)
        if len(self._q) == 2:
            return [self._filter_frame(self._q[0], self._q[0], self._q[1])]
        if len(self._q) == 3:
            out = [self._filter_frame(*self._q)]
            self._q.pop(0)
            return out
        return []

    def flush(self) -> list:
        out = []
        if len(self._q) == 1:
            out.append(self._filter_frame(self._q[0], self._q[0],
                                          self._q[0]))
        elif len(self._q) == 2:
            out.append(self._filter_frame(self._q[0], self._q[1],
                                          self._q[1]))
        self._q = []
        return out
