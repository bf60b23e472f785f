"""BM3D denoise (reference: bm3d.c, avfilter alias; named in north star).

First-cut TPU formulation (hard-thresholding step of BM3D):
  * 8x8 blocks on a half-overlapping grid (step 4) — four phase-shifted
    full-frame block decompositions, all static reshapes.
  * Block matching: for each candidate offset in a small window, the
    per-block SSD against the reference block — static shifts, batched.
    The best ``group_size`` candidates form the 3D group.
  * 2D DCT over each block (einsum on the MXU) + 1D Haar across the group,
    hard threshold at sigma*lambda, inverse, aggregate with per-block
    weights 1/(1+N_retained).
The Wiener second step is a later milestone (the first step is what
dominates BM3D's quality).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..core.buffer import Buffer
from .base import Filter, FilterInit, register
from ..job import schema as S

B = 8  # block size


def _dct_mat(n):
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m.astype(np.float32)


# numpy at module scope: a jnp.asarray here would initialize the JAX
# backend at import time (breaks import when the TPU is held elsewhere);
# jnp ops inside the jitted fn consume the numpy constant directly.
_D = _dct_mat(B)


def _to_blocks(x, oy, ox):
    h, w = x.shape
    nh = (h - oy) // B
    nw = (w - ox) // B
    v = x[oy:oy + nh * B, ox:ox + nw * B]
    v = v.reshape(nh, B, nw, B).swapaxes(1, 2)
    return v, nh, nw


@functools.partial(jax.jit, static_argnames=("sigma", "maxval", "bm_range",
                                             "group_size"))
def bm3d_plane(plane, sigma: float = 4.0, maxval: int = 255,
               bm_range: int = 4, group_size: int = 4):
    x = plane.astype(jnp.float32)
    h, w = x.shape
    lam = 2.7 * sigma
    acc = jnp.zeros_like(x)
    wgt = jnp.zeros_like(x)
    offsets = [(dy, dx) for dy in range(-bm_range, bm_range + 1, 2)
               for dx in range(-bm_range, bm_range + 1, 2)]

    def shifted(dy, dx):
        ys = np.clip(np.arange(h) + dy, 0, h - 1)
        xs = np.clip(np.arange(w) + dx, 0, w - 1)
        return x[ys][:, xs]

    for oy in (0, B // 2):
        for ox in (0, B // 2):
            ref, nh, nw = _to_blocks(x, oy, ox)
            # block matching over static shifts
            cands = []
            ssds = []
            for dy, dx in offsets:
                s, _, _ = _to_blocks(shifted(dy, dx), oy, ox)
                cands.append(s)
                ssds.append(((s - ref) ** 2).sum((-1, -2)))
            ssds = jnp.stack(ssds)                 # (C, nh, nw)
            k = min(group_size, len(offsets))
            _, top = jax.lax.top_k(-ssds.reshape(len(offsets), -1).T, k)
            cs = jnp.stack(cands)                  # (C, nh, nw, B, B)
            csf = cs.reshape(len(offsets), -1, B, B)
            grp = jnp.take_along_axis(
                csf, top.T[..., None, None], axis=0)  # (k, nh*nw, B, B)
            # 2D DCT per block
            t = jnp.einsum("ij,knjl,ml->knim", _D, grp, _D)
            # 1D Haar across group (k=4 → two levels; k=2 → one)
            if k >= 2:
                s0 = (t[0::2] + t[1::2]) / np.sqrt(2.0)
                d0 = (t[0::2] - t[1::2]) / np.sqrt(2.0)
                if s0.shape[0] == 2:
                    s1 = (s0[0:1] + s0[1:2]) / np.sqrt(2.0)
                    d1 = (s0[0:1] - s0[1:2]) / np.sqrt(2.0)
                    coeffs = jnp.concatenate([s1, d1, d0])
                else:
                    coeffs = jnp.concatenate([s0, d0])
            else:
                coeffs = t
            kept = jnp.abs(coeffs) > lam
            # keep every group DC path intact
            coeffs = jnp.where(kept, coeffs, 0.0)
            coeffs = coeffs.at[0, :, 0, 0].set(t.mean(0)[:, 0, 0]
                                               * np.sqrt(k))
            nret = kept.sum((0, 2, 3)) + 1
            # inverse Haar
            if k >= 2:
                if k == 4:
                    s0a = (coeffs[0:1] + coeffs[1:2]) / np.sqrt(2.0)
                    s0b = (coeffs[0:1] - coeffs[1:2]) / np.sqrt(2.0)
                    s0 = jnp.concatenate([s0a, s0b])
                    d0 = coeffs[2:]
                else:
                    s0, d0 = coeffs[0:1], coeffs[1:2]
                ta = (s0 + d0) / np.sqrt(2.0)
                tb = (s0 - d0) / np.sqrt(2.0)
                t2 = jnp.stack([ta, tb], 1).reshape(k, -1, B, B)
            else:
                t2 = coeffs
            blocks = jnp.einsum("ji,knjl,lm->knim", _D, t2, _D)
            est = blocks[0].reshape(nh, nw, B, B)   # estimate for ref pos
            wb = (1.0 / nret.astype(jnp.float32)).reshape(nh, nw, 1, 1)
            est_img = (est * wb).swapaxes(1, 2).reshape(nh * B, nw * B)
            w_img = jnp.broadcast_to(wb, (nh, nw, B, B)) \
                .swapaxes(1, 2).reshape(nh * B, nw * B)
            acc = acc.at[oy:oy + nh * B, ox:ox + nw * B].add(est_img)
            wgt = wgt.at[oy:oy + nh * B, ox:ox + nw * B].add(w_img)
    out = jnp.where(wgt > 0, acc / jnp.maximum(wgt, 1e-6), x)
    return jnp.clip(jnp.round(out), 0, maxval).astype(plane.dtype)


@register
class BM3DFilter(Filter):
    id = S.FILTER_BM3D
    name = "bm3d"

    def init(self, fi: FilterInit) -> FilterInit:
        s = self.settings
        self.sigma = float(s.get("sigma", 4.0))
        self.bm_range = int(s.get("bm_range", 4))
        self.group_size = int(s.get("group_size", 4))
        self.maxval = (1 << fi.pix_fmt.bit_depth) - 1
        self.fi = fi.copy()
        return self.fi

    def work(self, buf: Buffer) -> list:
        if buf.is_eof() or buf.planes is None:
            return [buf]
        sc = 1 << (buf.pix_fmt.bit_depth - 8)
        planes = [bm3d_plane(jnp.asarray(p), sigma=self.sigma * sc,
                             maxval=self.maxval, bm_range=self.bm_range,
                             group_size=self.group_size)
                  for p in buf.planes]
        return [Buffer(planes=planes, pix_fmt=buf.pix_fmt).copy_props(buf)]
