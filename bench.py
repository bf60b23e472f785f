"""Headline bench: 1080p H.264 END-TO-END encode throughput on one chip.

Measures the full per-frame cost of H264Encoder in its FLAGSHIP quality
configuration — device analysis (coarse+full+quarter-pel ME, MC,
transform/quant/recon for every macroblock) chained with the in-loop
deblocking wavefront on device, per-MB 4x4/8x8 transform RDO (High
profile), CABAC entropy in the native C++ stage, and NAL packing — i.e.
what a transcode job actually pays per frame (encx264.c work-loop role;
the x264 DEFAULT toolset: CABAC + deblock + 8x8dct).

Baseline 30 fps ≈ x264 medium 1080p single-socket CPU encode (HandBrake
publishes no absolute numbers — see BASELINE.md).

Note: the axon tunnel's host↔device bandwidth/latency fluctuates by
>10x over time (shared infrastructure; measured 10 MB/s..1.1 GB/s on
different days), so e2e varies run to run. The breakdown fields and
device_only_fps (pure on-chip throughput, no host round trips) separate
engine speed from tunnel weather.

Measured platform quirk (r5): before the first device->host transfer
of a session the tunnel acknowledges dispatches without waiting for
real completion (timings look ~1000x too fast); after the first D2H it
switches to a synchronous mode costing ~30 ms per dispatch PLUS
compute at a heavily-penalized per-kernel rate (~33 ms/frame marginal
for the full 1080p toolset inside a lax.scan — the honest engine
ceiling on this infrastructure, and what device_only_fps measures via
a two-point slope that cancels the fixed dispatch cost).
cfg.dispatch_batch=8 amortizes the fixed dispatch cost by scanning 8
frames per call (byte-identical streams, asserted in tests).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np  # noqa: E402

BASELINE_FPS = 30.0  # x264 medium 1080p, typical 8-core CPU


def make_clip(w, h, n, seed=0):
    """Moving structured content + light noise (realistic coded-MB mix)."""
    rng = np.random.default_rng(seed)
    bw, bh = w + 128, h + 128
    yy, xx = np.mgrid[0:bh, 0:bw]
    base = (96 + 60 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
            + 40 * ((xx // 64 + yy // 64) % 2)).astype(np.float32)
    base = np.clip(base + rng.normal(0, 3, base.shape), 0, 255)
    base = base.astype(np.uint8)
    cb = np.clip(128 + 40 * np.sin(xx[::2, ::2] / 31.0), 0, 255).astype(np.uint8)
    cr = np.clip(128 + 40 * np.cos(yy[::2, ::2] / 29.0), 0, 255).astype(np.uint8)
    frames = []
    for t in range(n):
        ox, oy = 8 + 3 * t, 8 + t
        frames.append((
            np.ascontiguousarray(base[oy:oy + h, ox:ox + w]),
            np.ascontiguousarray(cb[oy // 2:oy // 2 + h // 2,
                                    ox // 2:ox // 2 + w // 2]),
            np.ascontiguousarray(cr[oy // 2:oy // 2 + h // 2,
                                    ox // 2:ox // 2 + w // 2])))
    return frames


def main():
    from handbrake_tpu.codecs.h264.encoder import H264Encoder, EncoderConfig

    W, H = 1920, 1080
    NB = 8                            # dispatch batch (see EncoderConfig)
    n_warm, n_serial, n_pipe = 1 + NB, NB, 4 * NB
    frames = make_clip(W, H, n_warm + n_serial + n_pipe + 1)
    import collections
    import jax

    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=26, gop=600,
                                    backend="device", deblock=True,
                                    cabac=True, transform8x8=True,
                                    dispatch_batch=NB))

    t_compile0 = time.perf_counter()
    # warmup: IDR + one full batch through entropy (compiles everything)
    total_bytes = 0
    total_bytes += len(enc.encode_frame(*frames[0]))
    pend = [enc.begin_frame(*f) for f in frames[1:1 + NB]]
    for p in pend:
        total_bytes += len(enc.finish_frame(p))
    compile_s = time.perf_counter() - t_compile0

    # phase 1 — one serial batch (per-stage breakdown diagnostics)
    ta = time.perf_counter()
    pend = [enc.begin_frame(*f) for f in frames[n_warm:n_warm + n_serial]]
    tb = time.perf_counter()
    rec = pend[-1].batch[0]
    jax.block_until_ready(rec.outs["packed_small"])
    tc = time.perf_counter()
    for p in pend:
        total_bytes += len(enc.finish_frame(p))
    td = time.perf_counter()
    t_begin, t_dev, t_entropy = tb - ta, tc - tb, td - tc
    n_run = n_serial
    fps_serial = n_serial / (td - ta)

    # phase 2 — pipelined (headline): keep ~2 batches in flight so batch
    # N's payload fetch + host CABAC overlap batch N+1's upload + device
    # scan (the begin/finish API built for this; work.c:2434 overlap).
    pend = collections.deque()
    t0 = time.perf_counter()
    for i in range(n_warm + n_serial, n_warm + n_serial + n_pipe):
        p = enc.begin_frame(*frames[i])
        pend.append(p)
        if len(pend) > NB + 2:
            total_bytes += len(enc.finish_frame(pend.popleft()))
    while pend:
        total_bytes += len(enc.finish_frame(pend.popleft()))
    dt = (time.perf_counter() - t0) / n_pipe
    fps = 1.0 / dt

    # tunnel weather: raw host→device bandwidth right now for one frame's
    # packed planes (3.1 MB at 1080p), measured live — it varies >10x
    pk = np.concatenate([
        enc._pad_to_mb(frames[0][0], 16).ravel(),
        enc._pad_to_mb(frames[0][1], 8).ravel(),
        enc._pad_to_mb(frames[0][2], 8).ravel()])
    jax.block_until_ready(jax.device_put(pk))
    tu0 = time.perf_counter()
    for _ in range(4):
        jax.block_until_ready(jax.device_put(pk))
    upload_ms = (time.perf_counter() - tu0) / 4 * 1000

    # device-only ceiling: analysis + in-loop deblock chained on device,
    # no host fetch — the pure engine speed a direct-attached host sees
    devfps = None
    if enc._batch_analyzer is not None:
        # Two-point slope: time ONE dispatch of an 8-frame scan and ONE
        # of a 32-frame scan; the difference isolates pure on-chip
        # compute from the tunnel's per-dispatch cost (which ranges
        # 1-250 ms with the weather and would otherwise dominate).
        from handbrake_tpu.codecs.h264.encoder_tpu import \
            build_p_analyzer_batch
        ry, ru, rv = enc.recon_y, enc.recon_u, enc.recon_v
        scal = enc._dbscal(26, 26)
        times = {}
        for nb in (NB, 4 * NB):
            an = enc._batch_analyzer if nb == NB else \
                build_p_analyzer_batch(120, 68, nb, deblock=True,
                                       transform8x8=True)
            srcs = jax.device_put(np.stack([pk] * nb))
            outs = an(srcs, ry, ru, rv, 26, 26, scal)
            jax.block_until_ready(outs["packed_small"])
            best = None
            for _ in range(3):
                t0b = time.perf_counter()
                outs = an(srcs, outs["carry_y"], outs["carry_u"],
                          outs["carry_v"], 26, 26, scal)
                jax.block_until_ready(outs["packed_small"])
                dtb = time.perf_counter() - t0b
                best = dtb if best is None else min(best, dtb)
            times[nb] = best
        slope = (times[4 * NB] - times[NB]) / (3 * NB)
        if slope > 0:
            devfps = 1.0 / slope

    print(json.dumps({
        "metric": "h264_1080p_encode_fps_e2e_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "toolset": "CABAC+deblock+8x8 (High), device analysis+loopfilter",
        "ms_per_frame": round(dt * 1000, 1),
        "pipelined": True,
        "serial_fps": round(fps_serial, 2),
        "breakdown_ms_serial": {
            "upload_dispatch": round(t_begin / n_run * 1000, 1),
            "device_wait": round(t_dev / n_run * 1000, 1),
            "fetch_entropy": round(t_entropy / n_run * 1000, 1),
        },
        "upload_only_ms_per_frame": round(upload_ms, 1),
        "device_only_fps": round(devfps, 2) if devfps else None,
        "warmup_incl_compile_s": round(compile_s, 1),
        "kbit_per_frame": round(
            total_bytes * 8 / (n_warm + n_serial + n_pipe) / 1000, 1),
    }))


if __name__ == "__main__":
    main()
