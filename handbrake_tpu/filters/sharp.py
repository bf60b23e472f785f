"""Sharpen / smooth filters: UNSHARP, LAPSHARP, CHROMA_SMOOTH
(reference: unsharp.c, lapsharp.c, chroma_smooth.c — native mt_frame-wrapped
kernels there; stateless per-frame jnp convolutions here, so batching =
the mt_frame analog).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..core.buffer import Buffer
from .base import Filter, FilterInit, register
from .kernels import conv2d_small
from ..job import schema as S


def _gauss1d(size: int) -> np.ndarray:
    sigma = size / 3.0
    x = np.arange(size) - (size - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("size", "strength", "maxval",
                                             "direction"))
def _blur_blend(plane, size: int, strength: float, maxval: int,
                direction: int):
    """Separable gaussian blur; direction=+1 sharpen (unsharp mask),
    -1 smooth (blend toward blur)."""
    k = _gauss1d(size)
    x = plane.astype(jnp.float32)
    kv = jnp.asarray(k)
    pad = size // 2
    xp = jnp.pad(x, ((pad, pad), (0, 0)), mode="edge")
    bl = sum(kv[i] * xp[i:i + x.shape[0]] for i in range(size))
    blp = jnp.pad(bl, ((0, 0), (pad, pad)), mode="edge")
    bl = sum(kv[i] * blp[:, i:i + x.shape[1]] for i in range(size))
    out = x + direction * strength * (x - bl)
    return jnp.clip(jnp.round(out), 0, maxval).astype(plane.dtype)


# lapsharp kernels (identity + laplacian variants, normalized)
_KERNELS = {
    "lap": np.array([[0, -1, 0], [-1, 5, -1], [0, -1, 0]], np.float32),
    "isolap": np.array([[-1, -4, -1], [-4, 21, -4], [-1, -4, -1]],
                       np.float32),
    "log": np.array([[0, 0, -1, 0, 0], [0, -1, -2, -1, 0],
                     [-1, -2, 17, -2, -1], [0, -1, -2, -1, 0],
                     [0, 0, -1, 0, 0]], np.float32),
    "isolog": np.array([[0, -1, -1, -1, 0], [-1, -2, -4, -2, -1],
                        [-1, -4, 41, -4, -1], [-1, -2, -4, -2, -1],
                        [0, -1, -1, -1, 0]], np.float32),
}


@functools.partial(jax.jit, static_argnames=("kernel", "strength", "maxval"))
def _lapsharp_plane(plane, kernel: str, strength: float, maxval: int):
    k = _KERNELS[kernel]
    k = k / k.sum()  # normalize so conv includes identity response
    x = plane.astype(jnp.float32)
    c = conv2d_small(x, k)
    out = x * (1.0 - strength) + c * strength
    return jnp.clip(jnp.round(out), 0, maxval).astype(plane.dtype)


@register
class UnsharpFilter(Filter):
    id = S.FILTER_UNSHARP
    name = "unsharp"

    def init(self, fi: FilterInit) -> FilterInit:
        s = self.settings
        self.y = (float(s.get("y_strength", 0.25)),
                  int(s.get("y_size", 7)) | 1)
        self.c = (float(s.get("cb_strength", self.y[0] / 2)),
                  int(s.get("cb_size", self.y[1])) | 1)
        self.maxval = (1 << fi.pix_fmt.bit_depth) - 1
        self.fi = fi.copy()
        return self.fi

    def work(self, buf: Buffer) -> list:
        if buf.is_eof() or buf.planes is None:
            return [buf]
        planes = []
        for i, p in enumerate(buf.planes):
            st, sz = self.y if i == 0 else self.c
            if st <= 0:
                planes.append(p)
            else:
                planes.append(_blur_blend(jnp.asarray(p), size=sz,
                                          strength=st, maxval=self.maxval,
                                          direction=1))
        return [Buffer(planes=planes, pix_fmt=buf.pix_fmt).copy_props(buf)]


@register
class LapsharpFilter(Filter):
    id = S.FILTER_LAPSHARP
    name = "lapsharp"

    def init(self, fi: FilterInit) -> FilterInit:
        s = self.settings
        kern = s.get("kernel", s.get("y_kernel", "isolap"))
        self.y = (float(s.get("y_strength", 0.2)), kern)
        self.c = (float(s.get("cb_strength", self.y[0] / 2)),
                  s.get("cb_kernel", kern))
        self.maxval = (1 << fi.pix_fmt.bit_depth) - 1
        self.fi = fi.copy()
        return self.fi

    def work(self, buf: Buffer) -> list:
        if buf.is_eof() or buf.planes is None:
            return [buf]
        planes = []
        for i, p in enumerate(buf.planes):
            st, kern = self.y if i == 0 else self.c
            if st <= 0:
                planes.append(p)
            else:
                planes.append(_lapsharp_plane(jnp.asarray(p), kernel=kern,
                                              strength=st,
                                              maxval=self.maxval))
        return [Buffer(planes=planes, pix_fmt=buf.pix_fmt).copy_props(buf)]


@register
class ChromaSmoothFilter(Filter):
    id = S.FILTER_CHROMA_SMOOTH
    name = "chroma_smooth"

    def init(self, fi: FilterInit) -> FilterInit:
        s = self.settings
        self.cb = (float(s.get("cb_strength", 1.2)),
                   int(s.get("cb_size", 7)) | 1)
        self.cr = (float(s.get("cr_strength", self.cb[0])),
                   int(s.get("cr_size", self.cb[1])) | 1)
        self.maxval = (1 << fi.pix_fmt.bit_depth) - 1
        self.fi = fi.copy()
        return self.fi

    def work(self, buf: Buffer) -> list:
        if buf.is_eof() or buf.planes is None:
            return [buf]
        planes = [buf.planes[0]]
        for p, (st, sz) in zip(buf.planes[1:], (self.cb, self.cr)):
            if st <= 0:
                planes.append(p)
            else:
                planes.append(_blur_blend(
                    jnp.asarray(p), size=sz, strength=min(st, 1.0),
                    maxval=self.maxval, direction=-1))
        return [Buffer(planes=planes, pix_fmt=buf.pix_fmt).copy_props(buf)]
