"""RD (rate–distortion) harness: PSNR/SSIM vs bitrate for every codec.

Encodes a fixed synthetic clip at several QPs per codec, decodes with our
own (conformance-tested) decoders, and reports PSNR/SSIM + kbps. Writes
RD.json at the repo root — the regression anchor for the north-star metric
(BASELINE.md: "≥ x264-medium PSNR at equal bitrate").

Usage: python tools/rd_harness.py [--frames N] [--size WxH] [--codecs h264,hevc]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from handbrake_tpu.utils.quality import psnr, psnr_yuv, ssim  # noqa: E402


def make_clip(w, h, n, seed=7):
    """Structured moving content with noise — deterministic fixture."""
    rng = np.random.default_rng(seed)
    bw, bh = w + 96, h + 96
    yy, xx = np.mgrid[0:bh, 0:bw]
    base = (110 + 70 * np.sin(xx / 13.0 + yy / 41.0)
            + 30 * np.cos(yy / 9.0)).astype(np.float32)
    base = np.clip(base + rng.normal(0, 4, base.shape), 16, 235).astype(np.uint8)
    cb = np.clip(128 + 30 * np.sin(xx[::2, ::2] / 23.0), 16, 240).astype(np.uint8)
    cr = np.clip(128 + 30 * np.cos(yy[::2, ::2] / 19.0), 16, 240).astype(np.uint8)
    out = []
    for t in range(n):
        ox, oy = 4 + 2 * t, 4 + t
        out.append((np.ascontiguousarray(base[oy:oy + h, ox:ox + w]),
                    np.ascontiguousarray(cb[oy // 2:oy // 2 + h // 2,
                                            ox // 2:ox // 2 + w // 2]),
                    np.ascontiguousarray(cr[oy // 2:oy // 2 + h // 2,
                                            ox // 2:ox // 2 + w // 2])))
    return out


def run_h264(frames, w, h, qp, fps):
    from handbrake_tpu.codecs.h264.encoder import EncoderConfig, H264Encoder
    from handbrake_tpu.codecs.h264.decoder import H264Decoder
    enc = H264Encoder(EncoderConfig(width=w, height=h, qp=qp, gop=len(frames)))
    stream = b"".join(enc.encode_frame(*f) for f in frames)
    dec = H264Decoder().decode(stream)
    return stream, dec


def run_hevc(frames, w, h, qp, fps):
    from handbrake_tpu.codecs.hevc.encoder import EncoderConfig, HEVCEncoder
    from handbrake_tpu.codecs.hevc.decoder import HEVCDecoder
    enc = HEVCEncoder(EncoderConfig(width=w, height=h, qp=qp, gop=len(frames)))
    stream = b"".join(enc.encode_frame(*f) for f in frames)
    dec = HEVCDecoder().decode(stream)
    return stream, dec


def run_av1(frames, w, h, qp, fps):
    from handbrake_tpu.codecs.av1.encoder import AV1Encoder, EncoderConfig
    from handbrake_tpu.codecs.av1.decoder import AV1Decoder
    enc = AV1Encoder(EncoderConfig(width=w, height=h, qp=qp, gop=len(frames)))
    stream = b"".join(enc.encode_frame(*f) for f in frames)
    dec = AV1Decoder().decode(stream)
    return stream, dec


RUNNERS = {"h264": run_h264, "hevc": run_hevc, "av1": run_av1}


def measure(codec, frames, w, h, qps, fps=30.0):
    rows = []
    for qp in qps:
        t0 = time.perf_counter()
        stream, dec = RUNNERS[codec](frames, w, h, qp, fps)
        wall = time.perf_counter() - t0
        n = min(len(dec), len(frames))
        py = np.mean([psnr(frames[i][0][:h, :w], np.asarray(dec[i][0])[:h, :w])
                      for i in range(n)])
        pyuv = np.mean([psnr_yuv(
            frames[i], tuple(np.asarray(p)[:s.shape[0], :s.shape[1]]
                             for p, s in zip(dec[i], frames[i])))
            for i in range(n)])
        sy = np.mean([ssim(frames[i][0][:h, :w], np.asarray(dec[i][0])[:h, :w])
                      for i in range(n)])
        kbps = len(stream) * 8 * fps / len(frames) / 1000.0
        rows.append({"qp": qp, "kbps": round(kbps, 1),
                     "psnr_y": round(float(py), 3),
                     "psnr_yuv": round(float(pyuv), 3),
                     "ssim_y": round(float(sy), 5),
                     "enc_dec_s": round(wall, 2)})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--size", default="320x192")
    ap.add_argument("--codecs", default="h264,hevc,av1")
    ap.add_argument("--qps", default="22,28,34,40")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "RD.json"))
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))
    qps = [int(q) for q in args.qps.split(",")]
    frames = make_clip(w, h, args.frames)
    report = {"size": args.size, "frames": args.frames, "codecs": {}}
    for codec in args.codecs.split(","):
        report["codecs"][codec] = measure(codec, frames, w, h, qps)
        print(codec, json.dumps(report["codecs"][codec]), flush=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
