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


def encode_gop_parallel(frames, width: int, height: int, qp,
                        mesh: Mesh, fps=(30000, 1001)):
    """Encode frames as mesh.shape['gop'] independent GOPs in parallel.

    qp: scalar, or per-gop list of scalars, or per-gop list of per-frame
    qp sequences (two-pass rate control feeds the latter). qp rides the
    device call as a traced per-gop array — per-gop rate control never
    recompiles.

    Per-gop host entropy runs on a thread pool (the native CAVLC stage
    releases the GIL), so shards entropy-code concurrently while the next
    device step is prepared.

    Returns (streams, full_stream, frame_aus): per-gop annex-B segments
    (rank-0 gather order), their concatenation, and per-gop per-frame AU
    lists (the muxer needs sample boundaries). Bit-identical to encoding
    each chunk serially with its own encoder — tests assert this.
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..codecs.h264.encoder import EncoderConfig, H264Encoder
    from ..codecs.h264.encoder_tpu import build_p_analyzer_fn
    from ..codecs.h264.transform import chroma_qp

    G = mesh.shape["gop"]
    chunks = split_gops(len(frames), G)
    assert all(ln > 0 for _, ln in chunks), "more gops than frames"
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16

    def qp_of(g, t):
        if np.isscalar(qp):
            return int(qp)
        q = qp[g]
        return int(q) if np.isscalar(q) else int(q[min(t, len(q) - 1)])

    encs = [H264Encoder(EncoderConfig(width=width, height=height,
                                      qp=qp_of(g, 0), gop=max(ln, 1),
                                      fps=fps, backend="host"))
            for g, (_, ln) in enumerate(chunks)]

    gop_sh = NamedSharding(mesh, P("gop"))
    analyze = jax.jit(jax.vmap(build_p_analyzer_fn(mb_w, mb_h),
                               in_axes=(0, 0, 0, 0, 0, 0, 0, 0)))

    frame_aus = [[] for _ in range(G)]
    # frame 0 of each gop: IDR on host (native I-slice walker)
    for g, (s, ln) in enumerate(chunks):
        frame_aus[g].append(encs[g].encode_frame(*frames[s],
                                                 qp=qp_of(g, 0)))

    max_len = max(ln for _, ln in chunks)
    pool = ThreadPoolExecutor(max_workers=min(G, 8))
    for t in range(1, max_len):
        ys, us, vs, rys, rus, rvs, qps = [], [], [], [], [], [], []
        live = []
        for g, (s, ln) in enumerate(chunks):
            # pad finished gops with their last frame (output discarded;
            # near-equal chunking bounds the waste to one trailing step)
            fi = s + min(t, ln - 1)
            y, u, v = frames[fi]
            ys.append(encs[g]._pad_to_mb(y, 16))
            us.append(encs[g]._pad_to_mb(u, 8))
            vs.append(encs[g]._pad_to_mb(v, 8))
            rys.append(np.asarray(encs[g].recon_y, np.uint8))
            rus.append(np.asarray(encs[g].recon_u, np.uint8))
            rvs.append(np.asarray(encs[g].recon_v, np.uint8))
            qps.append(qp_of(g, t))
            live.append(t < ln)
        args = [jax.device_put(np.stack(a), gop_sh)
                for a in (ys, us, vs, rys, rus, rvs)]
        qv = jax.device_put(np.asarray(qps, np.int32), gop_sh)
        qcv = jax.device_put(
            np.asarray([chroma_qp(q, 0) for q in qps], np.int32), gop_sh)
        dev = jax.device_get(analyze(*args, qv, qcv))

        def entropy_one(g):
            devg = jax.tree_util.tree_map(lambda a: a[g], dev)
            return encs[g].encode_p_from_analysis(
                ys[g], us[g], vs[g], devg, qps[g])
        parts = list(pool.map(entropy_one,
                              [g for g in range(G) if live[g]]))
        it = iter(parts)
        for g in range(G):
            if live[g]:
                frame_aus[g].append(next(it))
    pool.shutdown(wait=False)
    streams = [b"".join(a) for a in frame_aus]
    return streams, b"".join(streams), frame_aus


def encode_gop_parallel_2pass(frames, width: int, height: int,
                              target_kbps: float, mesh: Mesh,
                              fps=(30000, 1001), qp1: int = 32):
    """Two-pass GOP-parallel encode to a bitrate target.

    Pass 1 measures per-gop complexity (actual bits at qp1); the global
    allocation crosses the mesh via exchange_rc_stats (psum — the
    hb_interjob_t stats handoff, handbrake.h:122-136); pass 2 maps each
    gop's budget to a fractional qp via the 2^(-qp/6) rate model, dithered
    across frames so the effective qp is fractional.

    Returns (streams, full_stream, stats dict).
    """
    G = mesh.shape["gop"]
    chunks = split_gops(len(frames), G)
    fps_f = fps[0] / fps[1]
    duration_s = len(frames) / fps_f
    total_bits = target_kbps * 1000.0 * duration_s

    p1_streams, _, _ = encode_gop_parallel(frames, width, height, qp1, mesh,
                                        fps)
    complexity = np.asarray([len(s) * 8.0 for s in p1_streams], np.float64)
    budgets = exchange_rc_stats(mesh, complexity, total_bits)

    qfs = []
    for g, (_, ln) in enumerate(chunks):
        dq = 6.0 * np.log2(max(complexity[g], 1.0)
                           / max(float(budgets[g]), 1.0))
        qfs.append(float(qp1 + dq))

    def dither(qf, ln):
        qf = float(np.clip(qf, 10, 48))
        lo, frac = int(np.floor(qf)), qf % 1.0
        # deterministic error-diffusion dither → fractional effective qp
        seq, acc = [], 0.0
        for _ in range(ln):
            acc += frac
            if acc >= 1.0:
                seq.append(lo + 1)
                acc -= 1.0
            else:
                seq.append(lo)
        return seq

    streams = full = frame_aus = None
    corr = 0.0
    for _attempt in range(3):
        qps = [dither(qfs[g] + corr, ln)
               for g, (_, ln) in enumerate(chunks)]
        streams, full, frame_aus = encode_gop_parallel(
            frames, width, height, qps, mesh, fps)
        actual_kbps = len(full) * 8.0 / duration_s / 1000.0
        if abs(actual_kbps - target_kbps) <= 0.04 * target_kbps:
            break
        # rate-model correction toward the target
        corr += 6.0 * np.log2(actual_kbps / target_kbps)
    return streams, full, {"target_kbps": target_kbps,
                           "actual_kbps": actual_kbps,
                           "budgets": budgets.tolist(),
                           "pass1_bits": complexity.tolist(),
                           "qps": [q[0] for q in qps],
                           "frame_aus": frame_aus}
