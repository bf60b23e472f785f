"""Headline bench: 1080p H.264 P-frame device analysis throughput on one chip.

Measures the TPU compute path of the encoder (motion search, sub-pel MC,
transform/quant/recon for every macroblock — encoder_tpu.build_p_analyzer)
at 1920x1088. Baseline 30 fps ≈ x264 medium 1080p single-socket CPU encode
(the reference's encx264.c path; HandBrake publishes no absolute numbers —
see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np  # noqa: E402

BASELINE_FPS = 30.0  # x264 medium 1080p, typical 8-core CPU


def main():
    import jax
    from handbrake_tpu.codecs.h264.encoder_tpu import build_p_analyzer

    mb_w, mb_h = 120, 68  # 1920x1088
    w, h = mb_w * 16, mb_h * 16
    analyze = build_p_analyzer(mb_w, mb_h)

    rng = np.random.default_rng(0)
    base = (np.add.outer(np.arange(h), np.arange(w)) % 256).astype(np.uint8)

    def frame(i):
        y = np.roll(base, 2 * i, axis=1)
        u = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        return y, u, v

    ry, ru, rv = frame(0)
    y1, u1, v1 = frame(1)
    # warm-up (compile)
    jax.block_until_ready(analyze(y1, u1, v1, ry, ru, rv, 26, 26))

    n = 8
    t0 = time.perf_counter()
    for i in range(n):
        out = analyze(y1, u1, v1, ry, ru, rv, 26, 26)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    fps = 1.0 / dt
    print(json.dumps({
        "metric": "h264_1080p_p_frame_analysis_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
