"""Inverse telecine (reference: detelecine.c — MPlayer pullup).

Field-matching IVTC: for each incoming frame, evaluate three weave
candidates — C (keep both fields), P (current top + previous bottom),
N (current bottom + previous top) — score each by the vertical combing
energy of the woven result (a device reduction, the pullup "breaks/affinity"
metric analog, detelecine.c:15-51), weave the best, and drop the 5th frame
of a stable 3:2 cadence (the duplicate), restoring 4 progressive frames
from every 5 telecined ones.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.buffer import Buffer, BufFlags
from .base import Filter, FilterInit, register
from ..job import schema as S


@jax.jit
def comb_energy(y):
    """Vertical alternation energy — high for interlaced weaves."""
    a = y.astype(jnp.float32)
    d = a[:-2] - 2 * a[1:-1] + a[2:]
    return jnp.mean(jnp.abs(d))


def _weave(top_src, bot_src):
    """Take even rows from top_src, odd rows from bot_src (per plane)."""
    out = []
    for t, b in zip(top_src, bot_src):
        tj, bj = jnp.asarray(t), jnp.asarray(b)
        o = jnp.where((jnp.arange(tj.shape[0]) % 2 == 0)[:, None], tj, bj)
        out.append(o)
    return out


@register
class DetelecineFilter(Filter):
    id = S.FILTER_DETELECINE
    name = "detelecine"

    def init(self, fi: FilterInit) -> FilterInit:
        self.prev: Buffer | None = None
        self.cadence: list = []   # recent match choices, for dup detection
        self.since_drop = 0
        self.fi = fi.copy()
        # 3:2 pulldown removal: 30000/1001 → 24000/1001 when cadence locks
        self.fi.cfr = 0
        self.maxval = (1 << fi.pix_fmt.bit_depth) - 1
        return self.fi

    def work(self, buf: Buffer) -> list:
        if buf.is_eof():
            self.prev = None
            return [buf]
        if buf.planes is None:
            return [buf]
        if self.prev is None:
            self.prev = buf
            return [buf]
        prev = self.prev
        self.prev = buf
        cands = {
            "c": buf.planes,
            "p": _weave(buf.planes, prev.planes),
            "n": _weave(prev.planes, buf.planes),
        }
        scores = {k: float(comb_energy(jnp.asarray(v[0])))
                  for k, v in cands.items()}
        best = min(scores, key=scores.get)
        self.cadence.append(best)
        if len(self.cadence) > 10:
            self.cadence.pop(0)
        self.since_drop += 1
        # duplicate detection: a matched weave that equals the previous
        # output (low combing AND low motion) in a 5-frame cadence → drop
        if best != "c" and self.since_drop >= 5:
            motion = float(jnp.mean(jnp.abs(
                jnp.asarray(cands[best][0], jnp.float32)
                - jnp.asarray(prev.planes[0], jnp.float32))))
            if motion < 2.0:
                self.since_drop = 0
                return []  # drop the duplicate; VFR filter re-times
        if best == "c":
            return [buf]
        out = Buffer(planes=cands[best],
                     pix_fmt=buf.pix_fmt).copy_props(buf)
        out.flags &= ~(BufFlags.INTERLACED | BufFlags.TOP_FIRST)
        return [out]
