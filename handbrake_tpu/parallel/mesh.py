"""Device-mesh sharding for the transcode pipeline.

The reference's concurrency (SURVEY.md §2.8 mapping) re-expressed on a TPU
mesh with two axes:

  gop  — frame/GOP data parallelism across chips/hosts: the analog of
         HandBrake's frame-MT (mt_frame_filter.c) and of GOP-chunked
         distributed transcoding. Frames within a GOP shard are independent
         given their reference frame, so a batch of P-frame analyses shards
         cleanly on the leading (frame) axis.
  tile — spatial tile parallelism within a frame: the analog of libhb's
         taskset slice threads (taskset.c:17, comb_detect.c:37-43 segment
         overlap). Filters run under shard_map with explicit halo exchange
         via jax.lax.ppermute, mirroring the reference's segment_start /
         segment_height overlap handling.

Everything here is ordinary jax.sharding — no NCCL/MPI translation; XLA
inserts ICI collectives from the specs.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def make_mesh(n_devices: int | None = None, tile: int | None = None) -> Mesh:
    """Mesh over the first n devices, shaped (gop, tile).

    tile defaults to 2 when the device count allows it so both axes are
    exercised; pass tile=1 for pure GOP parallelism.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if tile is None:
        tile = 2 if (n >= 2 and n % 2 == 0) else 1
    return Mesh(np.asarray(devs).reshape(n // tile, tile), ("gop", "tile"))


def _halo_blur_local(x, *, n_tiles: int):
    """Per-shard vertical [1,2,1]/4 smooth with 1-row halo exchange.

    x: (B_loc, H_loc, W) int32 rows of the frames owned by this tile shard.
    Boundary rows come from the neighbouring shard over the "tile" axis via
    ppermute; outer frame edges replicate (same edge handling as the
    reference's per-segment filters).
    """
    if n_tiles == 1:
        up = x[:, :1]
        down = x[:, -1:]
    else:
        idx = jax.lax.axis_index("tile")
        fwd = [(i, (i + 1) % n_tiles) for i in range(n_tiles)]
        bwd = [(i, (i - 1) % n_tiles) for i in range(n_tiles)]
        from_above = jax.lax.ppermute(x[:, -1:], "tile", fwd)
        from_below = jax.lax.ppermute(x[:, :1], "tile", bwd)
        up = jnp.where(idx == 0, x[:, :1], from_above)
        down = jnp.where(idx == n_tiles - 1, x[:, -1:], from_below)
    xp = jnp.concatenate([up, x, down], axis=1)
    return (xp[:, :-2] + 2 * xp[:, 1:-1] + xp[:, 2:] + 2) >> 2


def tile_smooth(mesh: Mesh):
    """(B, H, W) int32 → smoothed, sharded P("gop", "tile", None)."""
    fn = functools.partial(_halo_blur_local, n_tiles=mesh.shape["tile"])
    return shard_map(fn, mesh=mesh,
                     in_specs=P("gop", "tile", None),
                     out_specs=P("gop", "tile", None))


def build_multichip_step(mesh: Mesh, mb_w: int, mb_h: int):
    """Jitted full pipeline step over the mesh.

    (frames, refs) batch → tile-sharded pre-filter (sp, halo exchange) →
    GOP-sharded batched P-frame analysis (dp). One jit: XLA places the
    resharding collective between the stages.

    Returns step(y, u, v, ry, ru, rv, qp, qpc) with y/u/v/ry/ru/rv batched
    on axis 0 (batch must be a multiple of mesh.shape["gop"]).
    """
    from handbrake_tpu.codecs.h264.encoder_tpu import build_p_analyzer_fn

    smooth = tile_smooth(mesh)
    analyze = jax.vmap(build_p_analyzer_fn(mb_w, mb_h),
                       in_axes=(0, 0, 0, 0, 0, 0, None, None))
    gop_sh = NamedSharding(mesh, P("gop"))

    @functools.partial(jax.jit, static_argnums=(6, 7))
    def step(y, u, v, ry, ru, rv, qp, qpc):
        y = smooth(y.astype(jnp.int32))
        y = jax.lax.with_sharding_constraint(y, gop_sh)
        out = analyze(y, u, v, ry, ru, rv, qp, qpc)
        return out

    return step


def _halo_pad(x, halo: int, n_tiles: int):
    """Attach `halo` rows from the neighbouring tile shards (ppermute over
    the "tile" axis); the outer frame edges replicate, matching the
    clip/edge-pad semantics of the host filters (comb_detect.c:37-43
    segment overlap analog).  x: (..., H_loc, W)."""
    def rep(row, n):
        return jnp.concatenate([row] * n, axis=-2)
    top_edge = rep(x[..., :1, :], halo)
    bot_edge = rep(x[..., -1:, :], halo)
    if n_tiles == 1:
        top, bot = top_edge, bot_edge
    else:
        idx = jax.lax.axis_index("tile")
        fwd = [(i, (i + 1) % n_tiles) for i in range(n_tiles)]
        bwd = [(i, (i - 1) % n_tiles) for i in range(n_tiles)]
        from_above = jax.lax.ppermute(x[..., -halo:, :], "tile", fwd)
        from_below = jax.lax.ppermute(x[..., :halo, :], "tile", bwd)
        top = jnp.where(idx == 0, top_edge, from_above)
        bot = jnp.where(idx == n_tiles - 1, bot_edge, from_below)
    return jnp.concatenate([top, x, bot], axis=-2)


def tile_shard_nlmeans(mesh: Mesh, *, strength=6.0, origin_tune=0.9,
                       patch=7, rng=3, maxval=255):
    """The PRODUCTION NLMeans kernel (filters/nlmeans.py nlmeans_plane)
    tile-sharded across the mesh's "tile" axis with halo exchange.

    Bit-identical to the unsharded filter: the halo (rng + patch) covers
    the kernel's full spatial reach, and outer-edge replication reproduces
    its clip-based boundary handling.  cur: (H, W), refs: (T, H, W) —
    H must divide by mesh.shape["tile"].
    """
    from ..filters.nlmeans import nlmeans_plane

    n_tiles = mesh.shape["tile"]
    halo = rng + patch

    def local(cur, refs):
        # each shard must own at least `halo` rows to source its
        # neighbour's exchange (ppermute moves one hop)
        assert cur.shape[0] >= halo, (cur.shape, halo)
        cur_p = _halo_pad(cur, halo, n_tiles)
        refs_p = _halo_pad(refs, halo, n_tiles)
        out = nlmeans_plane(cur_p, refs_p, strength=strength,
                            origin_tune=origin_tune, patch=patch,
                            rng=rng, maxval=maxval)
        return out[halo:-halo]

    return jax.jit(shard_map(local, mesh=mesh,
                             in_specs=(P("tile", None),
                                       P(None, "tile", None)),
                             out_specs=P("tile", None)))
