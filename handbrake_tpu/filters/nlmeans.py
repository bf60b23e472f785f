"""NLMeans denoiser (reference: nlmeans.c — native+taskset with a
per-plane tuned weighting function; named in the north star).

TPU formulation: for every search offset (dx, dy) the patch SSD for ALL
pixels at once is a box filter over the squared difference plane (two
separable ones-convolutions), then w = exp(-ssd / (h^2 * npix)) — the whole
O(window^2) loop is static shifts + VPU math, no gathers. Temporal search
reuses the same kernel against a ring of previous frames (y_frame_count).

Settings (param.c table names): {y,cb}_strength, _origin_tune, _patch_size,
_range, _frame_count.
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
    h, w = a.shape[-2], a.shape[-1]
    ys = np.clip(np.arange(h) + dy, 0, h - 1)
    xs = np.clip(np.arange(w) + dx, 0, w - 1)
    return a[..., ys, :][..., :, xs]


def _box(a, size):
    """Separable ones-filter (patch sum), edge replicate."""
    p = size // 2
    ap = jnp.pad(a, ((p, p), (0, 0)), mode="edge")
    v = sum(ap[i:i + a.shape[0]] for i in range(size))
    vp = jnp.pad(v, ((0, 0), (p, p)), mode="edge")
    return sum(vp[:, i:i + a.shape[1]] for i in range(size))


@functools.partial(jax.jit, static_argnames=("strength", "origin_tune",
                                             "patch", "rng", "maxval"))
def nlmeans_plane(cur, refs, strength: float = 6.0,
                  origin_tune: float = 0.9, patch: int = 7, rng: int = 3,
                  maxval: int = 255):
    """cur: (H, W); refs: (T, H, W) search planes (refs[0] == cur)."""
    x = cur.astype(jnp.float32)
    h2npix = (strength * strength) * (patch * patch)
    acc = x * origin_tune
    wsum = jnp.full_like(x, origin_tune)
    T = refs.shape[0]
    for t in range(T):
        r = refs[t].astype(jnp.float32)
        for dy in range(-rng, rng + 1):
            for dx in range(-rng, rng + 1):
                if t == 0 and dy == 0 and dx == 0:
                    continue  # origin handled above
                s = _shift2(r, dy, dx)
                ssd = _box((x - s) ** 2, patch)
                w = jnp.exp(-ssd / h2npix)
                acc = acc + w * s
                wsum = wsum + w
    out = acc / wsum
    return jnp.clip(jnp.round(out), 0, maxval).astype(cur.dtype)


@register
class NLMeansFilter(Filter):
    id = S.FILTER_NLMEANS
    name = "nlmeans"

    def init(self, fi: FilterInit) -> FilterInit:
        s = self.settings
        scale = float(s.get("y_strength_scale", 1.0))
        fc = int(s.get("frame_count", s.get("y_frame_count", 2)))
        self.y = dict(strength=float(s.get("y_strength", 6.0)) * scale,
                      origin_tune=float(s.get("y_origin_tune", 0.9)),
                      patch=int(s.get("y_patch_size", 7)),
                      rng=int(s.get("y_range", 3)),
                      frames=max(1, fc))
        self.c = dict(strength=float(s.get("cb_strength",
                                           self.y["strength"])),
                      origin_tune=float(s.get("cb_origin_tune",
                                              self.y["origin_tune"])),
                      patch=int(s.get("cb_patch_size", 7)),
                      rng=int(s.get("cb_range", 3)),
                      frames=max(1, int(s.get("cb_frame_count", fc))))
        self.hist: list = []  # ring of previous frames' planes
        self.maxval = (1 << fi.pix_fmt.bit_depth) - 1
        self.fi = fi.copy()
        return self.fi

    def work(self, buf: Buffer) -> list:
        if buf.is_eof() or buf.planes is None:
            return [buf]
        maxframes = max(self.y["frames"], self.c["frames"])
        planes = []
        for i, p in enumerate(buf.planes):
            cfg = self.y if i == 0 else self.c
            if cfg["strength"] <= 0:
                planes.append(p)
                continue
            pj = jnp.asarray(p)
            past = [h[i] for h in self.hist[-(cfg["frames"] - 1):]] \
                if cfg["frames"] > 1 else []
            refs = jnp.stack([pj] + past)
            planes.append(nlmeans_plane(
                pj, refs, strength=cfg["strength"],
                origin_tune=cfg["origin_tune"], patch=cfg["patch"],
                rng=cfg["rng"], maxval=self.maxval))
        self.hist.append([jnp.asarray(p) for p in buf.planes])
        if len(self.hist) >= maxframes:
            self.hist = self.hist[-(maxframes - 1):] if maxframes > 1 else []
        return [Buffer(planes=planes, pix_fmt=buf.pix_fmt).copy_props(buf)]
