"""H.264 integer transforms and quantization — exact spec arithmetic.

All functions are array-module agnostic (pass numpy or jax.numpy as ``xp``) and
operate on batches of 4x4 blocks shaped (..., 4, 4) in int32, so the same code
is the host reference and the TPU device path (jitted). Batched 4x4 transforms
become (N,4,4)x(4,4) einsums → MXU-friendly on TPU.

Spec refs: fwd core transform + quant = JM/x264 style (compatible with 8.5.9
dequant); inverse transform 8.5.10-8.5.12; DC Hadamard 8.5.6/8.5.8.
"""
from __future__ import annotations

import numpy as np

from .tables import MF4x4, V4x4, QBITS_BASE, CHROMA_QP

# Core transform matrices
_CF = np.array([[1, 1, 1, 1],
                [2, 1, -1, -2],
                [1, -1, -1, 1],
                [1, -2, 2, -1]], dtype=np.int32)
_CF_T = _CF.T.copy()
_H4 = np.array([[1, 1, 1, 1],
                [1, 1, -1, -1],
                [1, -1, -1, 1],
                [1, -1, 1, -1]], dtype=np.int32)
_H2 = np.array([[1, 1], [1, -1]], dtype=np.int32)


def _mm(xp, a, b):
    """Integer matmul on the trailing 2 dims."""
    return xp.einsum("...ij,jk->...ik", a, b)


def _mml(xp, a, b):
    return xp.einsum("ij,...jk->...ik", a, b)


def fdct4x4(xp, d):
    """Forward 4x4 core transform: W = C d C^T.  d: (...,4,4) int32."""
    cf = xp.asarray(_CF)
    cft = xp.asarray(_CF_T)
    return _mm(xp, _mml(xp, cf, d.astype(xp.int32)), cft)


def hadamard4x4(xp, dc):
    """4x4 Hadamard for Intra16x16 luma DC (encoder side, unscaled).

    The /2 normalization is folded into quant_dc's (qbits+1) shift, keeping the
    encoder compatible with the 8.5.10 decoder-side dequant.
    """
    h = xp.asarray(_H4)
    return _mm(xp, _mml(xp, h, dc.astype(xp.int32)), h)


def ihadamard4x4(xp, f):
    """Inverse 4x4 Hadamard (no scaling)."""
    h = xp.asarray(_H4)
    return _mm(xp, _mml(xp, h, f.astype(xp.int32)), h)


def hadamard2x2(xp, dc):
    """2x2 Hadamard for chroma DC (both directions, no scale)."""
    h = xp.asarray(_H2)
    return _mm(xp, _mml(xp, h, dc.astype(xp.int32)), h)


def quant4x4(xp, w, qp: int, intra: bool, dc_only_scale: bool = False):
    """Quantize 4x4 coefficients. w: (...,4,4) int32 → levels int32.

    level = sign(w) * ((|w| * MF[qp%6][i,j] + f) >> qbits)
    f = (1<<qbits)/3 intra, /6 inter.
    """
    qbits = QBITS_BASE + qp // 6
    mf = xp.asarray(MF4x4[qp % 6])
    if dc_only_scale:
        mf = xp.full_like(mf, int(MF4x4[qp % 6][0, 0]))
    f = ((1 << qbits) // 3) if intra else ((1 << qbits) // 6)
    aw = xp.abs(w).astype(xp.int64)
    lv = ((aw * mf + f) >> qbits).astype(xp.int32)
    return xp.where(w < 0, -lv, lv)


def quant_dc(xp, w, qp: int, intra: bool):
    """Quantize DC-transformed coefficients (luma I16x16 DC / chroma DC):
    uses MF(0,0), qbits+1, 2f."""
    qbits = QBITS_BASE + qp // 6
    mf00 = int(MF4x4[qp % 6][0, 0])
    f = ((1 << qbits) // 3) if intra else ((1 << qbits) // 6)
    aw = xp.abs(w).astype(xp.int64)
    lv = ((aw * mf00 + 2 * f) >> (qbits + 1)).astype(xp.int32)
    return xp.where(w < 0, -lv, lv)


def dequant4x4(xp, levels, qp: int):
    """AC dequant (8.5.9): d = level * V[qp%6][i,j] << (qp//6)."""
    v = xp.asarray(V4x4[qp % 6])
    return (levels.astype(xp.int32) * v.astype(xp.int32)) << (qp // 6)


def dequant_luma_dc(xp, f, qp: int):
    """Intra16x16 luma DC dequant (8.5.10). f: inverse-Hadamard output.

    LevelScale4x4 = weightScale * normAdjust = 16 * V for the flat default
    scaling list; the 16 does NOT cancel here (unlike the AC path where the
    spec's >>4 absorbs it). Validated against FFmpeg decode of our streams.
    """
    ls = 16 * int(V4x4[qp % 6][0, 0])
    if qp >= 36:
        return (f * ls) << (qp // 6 - 6)
    rnd = 1 << (5 - qp // 6)
    return (f * ls + rnd) >> (6 - qp // 6)


def dequant_chroma_dc(xp, f, qp: int):
    """Chroma DC dequant (8.5.11, 4:2:0): ((f * 16*V00) << (qp//6)) >> 5."""
    ls = 16 * int(V4x4[qp % 6][0, 0])
    return ((f * ls) << (qp // 6)) >> 5


def idct4x4(xp, d):
    """Inverse 4x4 core transform (8.5.12): returns residual BEFORE the
    final (x+32)>>6 rounding IS included here — output is the spec's r_ij."""
    d = d.astype(xp.int32)
    # horizontal (rows): e/f per spec
    d0 = d[..., :, 0]
    d1 = d[..., :, 1]
    d2 = d[..., :, 2]
    d3 = d[..., :, 3]
    e0 = d0 + d2
    e1 = d0 - d2
    e2 = (d1 >> 1) - d3
    e3 = d1 + (d3 >> 1)
    f0 = e0 + e3
    f1 = e1 + e2
    f2 = e1 - e2
    f3 = e0 - e3
    f = xp.stack([f0, f1, f2, f3], axis=-1)
    # vertical (cols)
    g0 = f[..., 0, :] + f[..., 2, :]
    g1 = f[..., 0, :] - f[..., 2, :]
    g2 = (f[..., 1, :] >> 1) - f[..., 3, :]
    g3 = f[..., 1, :] + (f[..., 3, :] >> 1)
    h0 = g0 + g3
    h1 = g1 + g2
    h2 = g1 - g2
    h3 = g0 - g3
    h = xp.stack([h0, h1, h2, h3], axis=-2)
    return (h + 32) >> 6


def chroma_qp(qp: int, offset: int = 0) -> int:
    qpi = min(max(qp + offset, 0), 51)
    return int(CHROMA_QP[qpi])


# ---------------------------------------------------------------------------
# Block (de)composition helpers: image plane <-> (N,4,4) batches
# ---------------------------------------------------------------------------
def to_blocks4(xp, plane):
    """(H,W) → (H/4*W/4, 4, 4) in raster block order."""
    H, W = plane.shape[-2], plane.shape[-1]
    b = plane.reshape(*plane.shape[:-2], H // 4, 4, W // 4, 4)
    b = xp.swapaxes(b, -3, -2)
    return b.reshape(*plane.shape[:-2], (H // 4) * (W // 4), 4, 4)


def from_blocks4(xp, blocks, H, W):
    """(N,4,4) raster block order → (H,W)."""
    lead = blocks.shape[:-3]
    b = blocks.reshape(*lead, H // 4, W // 4, 4, 4)
    b = xp.swapaxes(b, -3, -2)
    return b.reshape(*lead, H, W)


def mb_block_order(mb_w: int, mb_h: int):
    """Raster 4x4-block index → H.264 luma coded block order within the frame.

    H.264 codes a MB's 16 luma 4x4 blocks in 'zig' order: 4 8x8 quadrants in
    raster order, 4 blocks raster within each quadrant. Returns an index array
    `order` such that blocks_raster[order] is coded order, and its inverse.
    """
    W4 = mb_w * 4
    idx = np.arange(mb_w * mb_h * 16)
    mb = idx // 16
    k = idx % 16
    mby, mbx = mb // mb_w, mb % mb_w
    q = k // 4          # quadrant 0..3
    r = k % 4           # block in quadrant
    by = mby * 4 + (q // 2) * 2 + (r // 2)
    bx = mbx * 4 + (q % 2) * 2 + (r % 2)
    order = by * W4 + bx
    inv = np.argsort(order)
    return order.astype(np.int32), inv.astype(np.int32)


def mb_block_order_chroma(mb_w: int, mb_h: int):
    """Chroma: each MB has 4 4x4 blocks (8x8 plane area), raster within MB."""
    W4 = mb_w * 2
    idx = np.arange(mb_w * mb_h * 4)
    mb = idx // 4
    k = idx % 4
    mby, mbx = mb // mb_w, mb % mb_w
    by = mby * 2 + k // 2
    bx = mbx * 2 + k % 2
    order = by * W4 + bx
    inv = np.argsort(order)
    return order.astype(np.int32), inv.astype(np.int32)
