"""Deinterlace: YADIF and BWDIF (reference: deinterlace.c, an avfilter
alias over FFmpeg's yadif/bwdif — here native vectorized jnp kernels).

Mode bits (deinterlace.c settings convention):
  1 = enable, 2 = spatial interlacing check (yadif) , 4 = bob (2x rate,
  emit both fields), 8 = take field parity from stream flags.

The per-pixel recurrences of yadif/bwdif are purely local (5x5 window over
cur/prev/next) so the whole frame vectorizes: column offsets become static
slices of an edge-padded plane; XLA fuses the lot into one VPU pass.
"""
from __future__ import annotations

import functools
from fractions import Fraction

import numpy as np

import jax
import jax.numpy as jnp

from ..core.buffer import Buffer, BufFlags
from .base import Filter, FilterInit, register
from ..job import schema as S

MODE_ENABLE = 1
MODE_SPATIAL = 2
MODE_BOB = 4


def _shift_x(a, j):
    """Horizontal shift with edge replicate: out[x] = a[x+j]."""
    if j == 0:
        return a
    if j > 0:
        return jnp.concatenate([a[:, j:], jnp.repeat(a[:, -1:], j, 1)], 1)
    return jnp.concatenate([jnp.repeat(a[:, :1], -j, 1), a[:, :j]], 1)


def _rows(a, off):
    """Vertical neighbour with edge clamp: out[y] = a[clip(y+off)]."""
    h = a.shape[0]
    idx = np.clip(np.arange(h) + off, 0, h - 1)
    return a[idx]


@functools.partial(jax.jit, static_argnames=("spatial_check", "maxval"))
def yadif_plane(cur, prev, nxt, parity, spatial_check: bool = True,
                maxval: int = 255):
    """One deinterlaced field: keeps rows with row%2==parity, interpolates
    the rest. parity: 0 = keep even rows (top field), traced scalar."""
    c32, p32, n32 = (x.astype(jnp.int32) for x in (cur, prev, nxt))
    h, w = cur.shape
    # prev2/next2 per FFmpeg convention relative to the field being built
    second = ((jnp.arange(h) % 2) != parity)[:, None]  # rows to interpolate
    prev2 = p32
    next2 = c32
    prev2b = c32
    next2b = n32
    # which pair applies: building the field NOT present in cur at those rows
    # parity of built field = 1 - parity of kept rows... FFmpeg: when the
    # constructed field is the "newer" one, prev2=cur,next2=next.
    use_b = parity == 1
    pr2 = jnp.where(use_b, prev2b, prev2)
    nx2 = jnp.where(use_b, next2b, next2)

    cm1, cp1 = _rows(c32, -1), _rows(c32, 1)
    d = (pr2 + nx2) >> 1
    td0 = jnp.abs(pr2 - nx2)
    td1 = (jnp.abs(_rows(p32, -1) - cm1) + jnp.abs(_rows(p32, 1) - cp1)) >> 1
    td2 = (jnp.abs(_rows(n32, -1) - cm1) + jnp.abs(_rows(n32, 1) - cp1)) >> 1
    diff = jnp.maximum(jnp.maximum(td0 >> 1, td1), td2)

    spatial_pred = (cm1 + cp1) >> 1
    spatial_score = (jnp.abs(_shift_x(cm1, -1) - _shift_x(cp1, -1))
                     + jnp.abs(cm1 - cp1)
                     + jnp.abs(_shift_x(cm1, 1) - _shift_x(cp1, 1)) - 1)

    def check(j, score, pred):
        s = (jnp.abs(_shift_x(cm1, j - 1) - _shift_x(cp1, -j - 1))
             + jnp.abs(_shift_x(cm1, j) - _shift_x(cp1, -j))
             + jnp.abs(_shift_x(cm1, j + 1) - _shift_x(cp1, -j + 1)))
        p = (_shift_x(cm1, j) + _shift_x(cp1, -j)) >> 1
        better = s < score
        return jnp.where(better, s, score), jnp.where(better, p, pred), better

    sc, sp, b1 = check(-1, spatial_score, spatial_pred)
    sc2, sp2, _ = check(-2, sc, sp)
    sc, sp = jnp.where(b1, sc2, sc), jnp.where(b1, sp2, sp)
    scp, spp, b2 = check(1, sc, sp)
    scp2, spp2, _ = check(2, scp, spp)
    scp, spp = jnp.where(b2, scp2, scp), jnp.where(b2, spp2, spp)
    spatial_pred = spp
    if spatial_check:
        bq = (_rows(pr2, -2) + _rows(nx2, -2)) >> 1
        fq = (_rows(pr2, 2) + _rows(nx2, 2)) >> 1
        vmax = jnp.maximum(jnp.maximum(d - cp1, d - cm1),
                           jnp.minimum(bq - cm1, fq - cp1))
        vmin = jnp.minimum(jnp.minimum(d - cp1, d - cm1),
                           jnp.maximum(bq - cm1, fq - cp1))
        diff = jnp.maximum(jnp.maximum(diff, vmin), -vmax)
    interp = jnp.clip(spatial_pred, d - diff, d + diff)
    out = jnp.where(second, interp, c32)
    return jnp.clip(out, 0, maxval).astype(cur.dtype)


_BW_LF = (4309, 213)
_BW_HF = (5570, 3801, 1016)
_BW_SP = (5077, 981)


@functools.partial(jax.jit, static_argnames=("maxval",))
def bwdif_plane(cur, prev, nxt, parity, maxval: int = 255):
    c32, p32, n32 = (x.astype(jnp.int32) for x in (cur, prev, nxt))
    h, w = cur.shape
    second = ((jnp.arange(h) % 2) != parity)[:, None]
    use_b = parity == 1
    pr2 = jnp.where(use_b, c32, p32)
    nx2 = jnp.where(use_b, n32, c32)

    cm1, cp1 = _rows(c32, -1), _rows(c32, 1)
    cm3, cp3 = _rows(c32, -3), _rows(c32, 3)
    d = (pr2 + nx2) >> 1
    td0 = jnp.abs(pr2 - nx2)
    td1 = (jnp.abs(_rows(p32, -1) - cm1) + jnp.abs(_rows(p32, 1) - cp1)) >> 1
    td2 = (jnp.abs(_rows(n32, -1) - cm1) + jnp.abs(_rows(n32, 1) - cp1)) >> 1
    diff = jnp.maximum(jnp.maximum(td0 >> 1, td1), td2)

    b = ((_rows(pr2, -2) + _rows(nx2, -2)) >> 1) - cm1
    f = ((_rows(pr2, 2) + _rows(nx2, 2)) >> 1) - cp1
    dc = d - cm1
    de = d - cp1
    mmax = jnp.maximum(jnp.maximum(de, dc), jnp.minimum(b, f))
    mmin = jnp.minimum(jnp.minimum(de, dc), jnp.maximum(b, f))
    diff = jnp.maximum(jnp.maximum(diff, mmin), -mmax)

    hf = (_BW_HF[0] * (pr2 + nx2)
          - _BW_HF[1] * (_rows(pr2, -2) + _rows(nx2, -2)
                         + _rows(pr2, 2) + _rows(nx2, 2))
          + _BW_HF[2] * (_rows(pr2, -4) + _rows(nx2, -4)
                         + _rows(pr2, 4) + _rows(nx2, 4))) >> 2
    interp1 = (hf + _BW_LF[0] * (cm1 + cp1)
               - _BW_LF[1] * (cm3 + cp3)) >> 13
    interp2 = (_BW_SP[0] * (cm1 + cp1) - _BW_SP[1] * (cm3 + cp3)) >> 13
    interp = jnp.where(jnp.abs(cm1 - cp1) > td0, interp1, interp2)
    interp = jnp.clip(interp, d - diff, d + diff)
    out = jnp.where(diff == 0, d, interp)
    out = jnp.where(second, out, c32)
    return jnp.clip(out, 0, maxval).astype(cur.dtype)


class _DeintBase(Filter):
    """3-frame window management shared by yadif/bwdif."""

    def __init__(self, settings=None):
        super().__init__(settings)
        self._q: list = []

    def init(self, fi: FilterInit) -> FilterInit:
        self.mode = int(self.settings.get("mode", 3))
        self.parity = int(self.settings.get("parity", -1))
        self.fi = fi.copy()
        if self.mode & MODE_BOB:
            self.fi.vrate = fi.vrate * 2
        self.maxval = (1 << fi.pix_fmt.bit_depth) - 1
        return self.fi

    def _field_parity(self, buf: Buffer) -> int:
        if self.parity >= 0:
            return self.parity
        return 0 if (buf.flags & BufFlags.TOP_FIRST) else 1

    def _deint(self, prev, cur, nxt, parity):
        raise NotImplementedError

    def _emit(self, prev: Buffer, cur: Buffer, nxt: Buffer) -> list:
        if not (self.mode & MODE_ENABLE):
            return [cur]
        par = self._field_parity(cur)
        outs = []
        bobs = [par, 1 - par] if (self.mode & MODE_BOB) else [par]
        for k, p in enumerate(bobs):
            planes = [self._deint(pp, cc, nn, p) for pp, cc, nn in
                      zip(prev.planes, cur.planes, nxt.planes)]
            ob = Buffer(planes=planes, pix_fmt=cur.pix_fmt).copy_props(cur)
            ob.flags &= ~(BufFlags.INTERLACED | BufFlags.TOP_FIRST)
            if self.mode & MODE_BOB and cur.duration:
                ob.duration = cur.duration // 2
                if ob.pts is not None:
                    ob.pts = cur.pts + k * ob.duration
                ob.stop = (ob.pts + ob.duration
                           if ob.pts is not None else None)
            outs.append(ob)
        return outs

    def work(self, buf: Buffer) -> list:
        if buf.is_eof():
            return self.flush() + [buf]
        self._q.append(buf)
        if len(self._q) == 2:
            # first frame: prev = itself
            return self._emit(self._q[0], self._q[0], self._q[1])
        if len(self._q) == 3:
            out = self._emit(self._q[0], self._q[1], self._q[2])
            self._q.pop(0)
            return out
        return []

    def flush(self) -> list:
        out = []
        if len(self._q) == 1:
            out += self._emit(self._q[0], self._q[0], self._q[0])
        elif len(self._q) == 2:
            out += self._emit(self._q[0], self._q[1], self._q[1])
        self._q = []
        return out


@register
class YadifFilter(_DeintBase):
    id = S.FILTER_YADIF
    name = "yadif"

    def _deint(self, prev, cur, nxt, parity):
        return yadif_plane(jnp.asarray(cur), jnp.asarray(prev),
                           jnp.asarray(nxt), parity,
                           spatial_check=bool(self.mode & MODE_SPATIAL),
                           maxval=self.maxval)


@register
class BwdifFilter(_DeintBase):
    id = S.FILTER_BWDIF
    name = "bwdif"

    def _deint(self, prev, cur, nxt, parity):
        return bwdif_plane(jnp.asarray(cur), jnp.asarray(prev),
                           jnp.asarray(nxt), parity, maxval=self.maxval)
