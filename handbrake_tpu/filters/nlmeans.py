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
        # tile-parallel: shard each plane over N devices with ppermute
        # halo exchange (parallel/mesh.py, SURVEY §2.8.2 — the taskset
        # slice pool re-expressed on the mesh); bit-exact vs unsharded
        self._tiles = int(s.get("tile_parallel", 0) or 0)
        self._tile_mesh = None
        self._tile_fns: dict = {}
        if self._tiles > 1:
            import jax
            devs = jax.devices()
            if len(devs) >= self._tiles:
                import numpy as _np
                from jax.sharding import Mesh
                self._tile_mesh = Mesh(
                    _np.asarray(devs[:self._tiles]), ("tile",))
            else:
                from ..utils.logging import log
                log(f"nlmeans: tile_parallel={self._tiles} but only "
                    f"{len(devs)} devices — running unsharded")
        self.fi = fi.copy()
        return self.fi

    def _sharded(self, cfg, H, W):
        """Cached tile-sharded kernel for this plane geometry, or None
        when the shard constraints don't hold (tiny planes)."""
        if self._tile_mesh is None:
            return None
        n = self._tiles
        halo = cfg["rng"] + cfg["patch"]
        Hp = (H + n - 1) // n * n
        if Hp // n < halo:
            return None
        key = (H, W, cfg["strength"], cfg["origin_tune"], cfg["patch"],
               cfg["rng"])
        fn = self._tile_fns.get(key)
        if fn is None:
            from ..parallel.mesh import tile_shard_nlmeans
            fn = tile_shard_nlmeans(
                self._tile_mesh, strength=cfg["strength"],
                origin_tune=cfg["origin_tune"], patch=cfg["patch"],
                rng=cfg["rng"], maxval=self.maxval)
            self._tile_fns[key] = fn
        return fn, Hp

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
            sh = self._sharded(cfg, pj.shape[0], pj.shape[1])
            if sh is not None:
                fn, Hp = sh
                H0 = pj.shape[0]
                if Hp != H0:
                    # edge-replicate rows to the tile multiple: identical
                    # to the kernel's clip-based boundary handling, so
                    # the kept rows stay bit-exact
                    pad = ((0, Hp - H0), (0, 0))
                    pj2 = jnp.pad(pj, pad, mode="edge")
                    refs2 = jnp.pad(refs, ((0, 0),) + pad, mode="edge")
                else:
                    pj2, refs2 = pj, refs
                planes.append(fn(pj2, refs2)[:H0])
                continue
            planes.append(nlmeans_plane(
                pj, refs, strength=cfg["strength"],
                origin_tune=cfg["origin_tune"], patch=cfg["patch"],
                rng=cfg["rng"], maxval=self.maxval))
        self.hist.append([jnp.asarray(p) for p in buf.planes])
        if len(self.hist) >= maxframes:
            self.hist = self.hist[-(maxframes - 1):] if maxframes > 1 else []
        return [Buffer(planes=planes, pix_fmt=buf.pix_fmt).copy_props(buf)]
