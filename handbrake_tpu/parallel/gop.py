"""GOP-parallel transcode across the mesh "gop" axis (SURVEY.md §2.8:
keyframe-aligned chunking ≈ HandBrake's frame-MT generalized to hosts).

Each GOP starts with an IDR so shards are independent after chunking; the
device runs the P-frame analysis for frame t of EVERY gop in one sharded
call (SPMD over the gop axis — XLA places each gop's analysis on its own
device), while the host entropy-codes each gop's frame t-1. Encoded
bitstream segments are gathered to rank 0 in gop order and muxed — the
muxcommon.c interleave semantics preserved (video-only here; audio rides
the same path in work.py).

Pass-1 rate stats cross the mesh with a psum (exchange_rc_stats) — the
two-pass global allocation the reference keeps in hb_interjob_t.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def split_gops(n_frames: int, n_gops: int) -> list:
    """Contiguous keyframe-aligned chunks: [(start, length)] per gop."""
    base = n_frames // n_gops
    rem = n_frames % n_gops
    out = []
    s = 0
    for g in range(n_gops):
        ln = base + (1 if g < rem else 0)
        out.append((s, ln))
        s += ln
    return out


def exchange_rc_stats(mesh: Mesh, complexity: np.ndarray,
                      total_bits: float) -> np.ndarray:
    """Two-pass global bit allocation across gop shards.

    complexity: (n_gops,) measured pass-1 complexity per gop. Each shard
    contributes its local value; the global sum crosses the mesh with a
    psum (the DCN stats exchange of SURVEY §2.8.5) and every shard returns
    its proportional share of total_bits.
    """
    n = mesh.shape["gop"]

    def local(c):
        tot = jax.lax.psum(jnp.sum(c), "gop")
        return c / jnp.maximum(tot, 1e-9) * total_bits

    fn = shard_map(local, mesh=mesh, in_specs=P("gop"), out_specs=P("gop"))
    c = jnp.asarray(complexity, jnp.float32)
    assert c.shape[0] % n == 0 or c.shape[0] == n
    return np.asarray(fn(c))


def encode_gop_parallel(frames, width: int, height: int, qp: int,
                        mesh: Mesh, fps=(30000, 1001)):
    """Encode frames as mesh.shape['gop'] independent GOPs in parallel.

    Returns (streams, full_stream): per-gop annex-B segments (rank-0 gather
    order) and their concatenation. Bit-identical to encoding each chunk
    serially with its own encoder — tests assert this.
    """
    from ..codecs.h264.encoder import EncoderConfig, H264Encoder
    from ..codecs.h264.encoder_tpu import build_p_analyzer_fn

    G = mesh.shape["gop"]
    chunks = split_gops(len(frames), G)
    assert all(ln > 0 for _, ln in chunks), "more gops than frames"
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16

    encs = [H264Encoder(EncoderConfig(width=width, height=height, qp=qp,
                                      gop=max(ln, 1), fps=fps,
                                      backend="host"))
            for _, ln in chunks]

    gop_sh = NamedSharding(mesh, P("gop"))
    analyze = jax.jit(jax.vmap(build_p_analyzer_fn(mb_w, mb_h),
                               in_axes=(0, 0, 0, 0, 0, 0, None, None)),
                      static_argnums=(6, 7))

    streams = [b"" for _ in range(G)]
    # frame 0 of each gop: IDR on host (native I-slice walker)
    for g, (s, ln) in enumerate(chunks):
        streams[g] += encs[g].encode_frame(*frames[s])

    from ..codecs.h264.transform import chroma_qp
    qpc = chroma_qp(qp, 0)
    max_len = max(ln for _, ln in chunks)
    for t in range(1, max_len):
        ys, us, vs, rys, rus, rvs = [], [], [], [], [], []
        live = []
        for g, (s, ln) in enumerate(chunks):
            # pad finished gops with their last frame (output discarded)
            fi = s + min(t, ln - 1)
            y, u, v = frames[fi]
            ys.append(encs[g]._pad_to_mb(y, 16))
            us.append(encs[g]._pad_to_mb(u, 8))
            vs.append(encs[g]._pad_to_mb(v, 8))
            rys.append(np.asarray(encs[g].recon_y, np.uint8))
            rus.append(np.asarray(encs[g].recon_u, np.uint8))
            rvs.append(np.asarray(encs[g].recon_v, np.uint8))
            live.append(t < ln)
        args = [jax.device_put(np.stack(a), gop_sh)
                for a in (ys, us, vs, rys, rus, rvs)]
        dev = jax.device_get(analyze(*args, qp, qpc))
        for g in range(G):
            if not live[g]:
                continue
            devg = jax.tree_util.tree_map(lambda a: a[g], dev)
            streams[g] += encs[g].encode_p_from_analysis(
                ys[g], us[g], vs[g], devg, qp)
    return streams, b"".join(streams)
