"""Shared jnp kernel helpers for the filter suite.

Resampling follows the zimg model the reference uses via zscale
(cropscale.c:150-157): separable filters with exact sample-grid math and
chroma-siting offsets. On TPU the separable passes are dense matmuls on the
MXU: out = A_v @ img @ A_h^T with precomputed weight matrices — far faster
than gather-based convolution for arbitrary ratios.
"""
from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# resample weight matrices (host, cached)
# ---------------------------------------------------------------------------
def _sinc(x):
    return np.sinc(x)


def _lanczos(x, a):
    x = np.asarray(x, np.float64)
    return np.where(np.abs(x) < a, _sinc(x) * _sinc(x / a), 0.0)


def _bicubic(x, b=0.0, c=0.5):  # Catmull-Rom default (zimg "bicubic")
    x = np.abs(np.asarray(x, np.float64))
    x2, x3 = x * x, x * x * x
    p1 = ((12 - 9 * b - 6 * c) * x3 + (-18 + 12 * b + 6 * c) * x2
          + (6 - 2 * b)) / 6
    p2 = ((-b - 6 * c) * x3 + (6 * b + 30 * c) * x2
          + (-12 * b - 48 * c) * x + (8 * b + 24 * c)) / 6
    return np.where(x < 1, p1, np.where(x < 2, p2, 0.0))


def _bilinear(x):
    x = np.abs(np.asarray(x, np.float64))
    return np.maximum(1.0 - x, 0.0)


_KERNELS = {
    "lanczos": (lambda x, s: _lanczos(x / s, 3.0), 3.0),
    "bicubic": (lambda x, s: _bicubic(x / s), 2.0),
    "bilinear": (lambda x, s: _bilinear(x / s), 1.0),
    "point": (None, 0.5),
}


@functools.lru_cache(maxsize=256)
def resample_matrix(n_in: int, n_out: int, kind: str = "lanczos",
                    shift_in: float = 0.0, shift_out: float = 0.0):
    """(n_out, n_in) float32 weight matrix.

    shift_in/shift_out: sample-grid offsets in the respective pixel units
    (chroma siting: left-sited 4:2:0 horizontal = -0.25).
    Sample j sits at physical position j + 0.5 + shift (units of its own
    grid); rows are normalized to sum 1 (edge clamp = weight folding).
    """
    scale = n_in / n_out
    if kind == "point":
        A = np.zeros((n_out, n_in), np.float32)
        for i in range(n_out):
            src = min(n_in - 1, max(0, int((i + 0.5) * scale)))
            A[i, src] = 1.0
        return A
    fn, base_support = _KERNELS[kind]
    s = max(scale, 1.0)  # widen when downscaling
    support = base_support * s
    A = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        center = (i + 0.5 + shift_out) * scale - 0.5 - shift_in
        lo = max(0, int(math.floor(center - support)))
        hi = min(n_in - 1, int(math.ceil(center + support)))
        j = np.arange(lo, hi + 1)
        w = fn(j - center, s)
        tot = w.sum()
        if tot == 0:
            A[i, min(n_in - 1, max(0, int(round(center))))] = 1.0
        else:
            A[i, lo:hi + 1] = w / tot
    return A.astype(np.float32)


@functools.partial(jax.jit, static_argnums=(3,))
def _apply_separable(img, av, ah, maxval: int):
    x = img.astype(jnp.float32)
    x = jnp.einsum("oh,hw->ow", av, x)
    x = jnp.einsum("ow,cw->oc", x, ah)
    return jnp.clip(jnp.round(x), 0, maxval).astype(
        jnp.uint8 if maxval <= 255 else jnp.uint16)


def resample_plane(plane, out_h: int, out_w: int, kind: str = "lanczos",
                   shift_in=(0.0, 0.0), shift_out=(0.0, 0.0),
                   maxval: int = 255):
    """Resample one plane with separable MXU matmuls."""
    in_h, in_w = plane.shape
    av = jnp.asarray(resample_matrix(in_h, out_h, kind,
                                     shift_in[0], shift_out[0]))
    ah = jnp.asarray(resample_matrix(in_w, out_w, kind,
                                     shift_in[1], shift_out[1]))
    return _apply_separable(jnp.asarray(plane), av, ah, maxval)


# ---------------------------------------------------------------------------
# small convolution helpers (VPU-friendly shifted adds, edge replicate)
# ---------------------------------------------------------------------------
def pad_edge(x, t, b, l, r):
    return jnp.pad(x, ((t, b), (l, r)), mode="edge")


def conv2d_small(x, k):
    """x: (H, W) float32; k: (kh, kw) numpy. Edge-replicate convolution via
    shifted adds (unrolled — XLA fuses to one VPU loop)."""
    kh, kw = k.shape
    ph, pw = kh // 2, kw // 2
    xp = pad_edge(x, ph, ph, pw, pw)
    out = jnp.zeros_like(x)
    for dy in range(kh):
        for dx in range(kw):
            w = float(k[dy, dx])
            if w != 0.0:
                out = out + w * xp[dy:dy + x.shape[0], dx:dx + x.shape[1]]
    return out


def maxval_of(pix_fmt) -> int:
    return (1 << pix_fmt.bit_depth) - 1
