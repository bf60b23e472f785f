"""Interlacing detection (reference: comb_detect.c — native+taskset there;
one fused device pass here, block reduction included).

Per-pixel combing evidence on the luma plane, motion-gated against the
previous frame, accumulated over block_width x block_height tiles; a frame
is tagged combed (buf.combed: 0 none / 1 light / 2 heavy, the s.combed
analog internal.h:110-113) when any block exceeds block_thresh.

spatial_metric: 0 = sign test (up-cur)(down-cur) > T^2,
2 = 5-tap filtered metric (the reference's default "filtered combing").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.buffer import Buffer, BufFlags
from .base import Filter, FilterInit, register
from ..job import schema as S

COMBED_NONE = 0
COMBED_LIGHT = 1
COMBED_HEAVY = 2


def _rows(a, off):
    h = a.shape[0]
    if off == 0:
        return a
    if off > 0:
        return jnp.concatenate([a[off:], jnp.repeat(a[-1:], off, 0)], 0)
    return jnp.concatenate([jnp.repeat(a[:1], -off, 0), a[:off]], 0)


@functools.partial(jax.jit, static_argnames=(
    "spatial_metric", "spatial_thresh", "motion_thresh", "block_w",
    "block_h"))
def comb_mask_and_blocks(cur, prev, spatial_metric: int = 2,
                         spatial_thresh: int = 3, motion_thresh: int = 1,
                         block_w: int = 16, block_h: int = 16):
    """Returns (mask uint8 HxW, block_scores (H//bh, W//bw) int32)."""
    c = cur.astype(jnp.int32)
    up, down = _rows(c, -1), _rows(c, 1)
    if spatial_metric == 0:
        comb = ((up - c) * (down - c)) > (spatial_thresh * spatial_thresh)
    else:
        up2, down2 = _rows(c, -2), _rows(c, 2)
        # 5-tap vertical high-pass; strong response = alternating fields
        val = jnp.abs(up2 - 4 * up + 6 * c - 4 * down + down2)
        comb = val > (6 * spatial_thresh)
        comb = comb & (((up - c) * (down - c)) > 0)
    motion = jnp.abs(c - prev.astype(jnp.int32)) > motion_thresh
    mask = (comb & motion).astype(jnp.uint8)
    h, w = cur.shape
    bh, bw = h // block_h, w // block_w
    blocks = mask[:bh * block_h, :bw * block_w].astype(jnp.int32)
    blocks = blocks.reshape(bh, block_h, bw, block_w).sum((1, 3))
    return mask, blocks


@register
class CombDetectFilter(Filter):
    id = S.FILTER_COMB_DETECT
    name = "comb_detect"

    def init(self, fi: FilterInit) -> FilterInit:
        s = self.settings
        self.spatial_metric = int(s.get("spatial_metric", 2))
        self.spatial_thresh = int(s.get("spatial_thresh", 3))
        self.motion_thresh = int(s.get("motion_thresh", 1))
        self.block_thresh = int(s.get("block_thresh", 40))
        self.block_w = int(s.get("block_width", 16))
        self.block_h = int(s.get("block_height", 16))
        self.force = int(s.get("force_analysis", 0))
        self.prev = None
        self.fi = fi.copy()
        return self.fi

    def work(self, buf: Buffer) -> list:
        if buf.is_eof() or buf.planes is None:
            return [buf]
        if not self.force and not (buf.flags & BufFlags.INTERLACED):
            # progressive-flagged content: still analyze (the reference
            # checks everything unless told otherwise), cheap on device
            pass
        y = jnp.asarray(buf.planes[0])
        prev = self.prev if self.prev is not None else y
        mask, blocks = comb_mask_and_blocks(
            y, prev, spatial_metric=self.spatial_metric,
            spatial_thresh=self.spatial_thresh,
            motion_thresh=self.motion_thresh,
            block_w=self.block_w, block_h=self.block_h)
        self.prev = y
        peak = int(jnp.max(blocks))
        total = int(jnp.sum(blocks))
        if peak > self.block_thresh:
            buf.combed = COMBED_HEAVY
        elif total > self.block_thresh:
            buf.combed = COMBED_LIGHT
        else:
            buf.combed = COMBED_NONE
        buf.side_data["comb_mask"] = mask
        return [buf]
