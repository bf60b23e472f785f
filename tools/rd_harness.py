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
    """The BENCHED configuration (bench.py): device path with
    CABAC + deblock + 8x8 — the quality rows and the throughput rows now
    measure the same encoder (VERDICT r3 #1)."""
    from handbrake_tpu.codecs.h264.encoder import EncoderConfig, H264Encoder
    from handbrake_tpu.codecs.h264.native_decoder import NativeH264Decoder
    enc = H264Encoder(EncoderConfig(width=w, height=h, qp=qp,
                                    gop=len(frames), backend="device",
                                    cabac=True, transform8x8=True,
                                    deblock=True))
    stream = b"".join(enc.encode_frame(*f) for f in frames)
    dec = NativeH264Decoder().decode(stream)
    return stream, dec


def run_h264_host_i4(frames, w, h, qp, fps):
    """Host walker with Intra_4x4 (not yet in the device path) — tracks
    the remaining RD headroom vs the benched config."""
    from handbrake_tpu.codecs.h264.encoder import EncoderConfig, H264Encoder
    from handbrake_tpu.codecs.h264.native_decoder import NativeH264Decoder
    enc = H264Encoder(EncoderConfig(width=w, height=h, qp=qp,
                                    gop=len(frames), intra4x4=True,
                                    transform8x8=True, deblock=True,
                                    backend="host"))
    stream = b"".join(enc.encode_frame(*f) for f in frames)
    dec = NativeH264Decoder().decode(stream)
    return stream, dec


def run_h264_p_host(frames, w, h, qp, fps):
    """Host walker, P-only CAVLC, no deblock/8x8 — the TOOLSET-MATCHED
    baseline for h264_b (same walker, B structure being the only
    difference), so the B rows measure B-frames, not entropy coding."""
    from handbrake_tpu.codecs.h264.encoder import EncoderConfig, H264Encoder
    from handbrake_tpu.codecs.h264.native_decoder import NativeH264Decoder
    enc = H264Encoder(EncoderConfig(width=w, height=h, qp=qp,
                                    gop=len(frames), backend="host"))
    stream = b"".join(enc.encode_frame(*f) for f in frames)
    dec = NativeH264Decoder().decode(stream)
    return stream, dec


def run_h264_b(frames, w, h, qp, fps):
    """IBBP GOP with 2 refs (encoder_b.py) — the bitrate-saving GOP
    structure; decode via the universal native decoder (handles the
    reorder)."""
    from handbrake_tpu.codecs.h264.encoder import EncoderConfig
    from handbrake_tpu.codecs.h264.encoder_b import H264BEncoder
    from handbrake_tpu.codecs.h264.native_decoder import NativeH264Decoder
    enc = H264BEncoder(EncoderConfig(width=w, height=h, qp=qp,
                                     gop=len(frames)), bframes=2, refs=2)
    stream = b""
    for f in frames:
        for _d, au in enc.push_frame(*f):
            stream += au
    for _d, au in enc.flush():
        stream += au
    dec = NativeH264Decoder().decode(stream)
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


RUNNERS = {"h264": run_h264, "h264_host_i4": run_h264_host_i4,
           "h264_p_host": run_h264_p_host, "h264_b": run_h264_b,
           "hevc": run_hevc, "av1": run_av1}


def measure_anchors(frames, w, h, fps=30.0, full=True):
    """Independent-encoder anchor curves via the system GPL libavcodec
    (tests/ffvideo.py).  The headline anchors are **x264 medium** and
    **x265 medium** CRF sweeps — the exact north-star references
    (BASELINE.md; encx264.c:288 role) — plus libvpx-vp9 and mpeg4 to
    bracket from both sides."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    import ffdec
    import ffvideo
    if not ffvideo.available():
        return {}
    anchors = {}

    def rate_points(name, make_packets, dec_codec, params):
        rows = []
        for prm in params:
            t0 = time.perf_counter()
            pkts = make_packets(prm)
            wall = time.perf_counter() - t0
            dec = ffdec.decode_yuv_packets(pkts, dec_codec)
            n = min(len(dec), len(frames))
            if n == 0:
                continue
            py = np.mean([psnr(frames[i][0][:h, :w],
                               np.asarray(dec[i][0])[:h, :w])
                          for i in range(n)])
            size = sum(len(p) for p in pkts)
            rows.append({"param": prm,
                         "kbps": round(size * 8 * fps / len(frames) / 1e3,
                                       1),
                         "psnr_y": round(float(py), 3),
                         "enc_dec_s": round(wall, 2)})
        anchors[name] = rows

    def vp9(crf):
        enc = ffvideo.FFVideoEncoder(
            "libvpx-vp9", w, h, int(fps), bit_rate=0,
            opts={"crf": crf, "deadline": "good", "cpu-used": 2})
        return enc.encode(frames)

    def mpeg4(kbps):
        enc = ffvideo.FFVideoEncoder("mpeg4", w, h, int(fps),
                                     bit_rate=kbps * 1000)
        return enc.encode(frames)

    def x264(crf):
        enc = ffvideo.FFVideoEncoder(
            "libx264", w, h, int(fps), bit_rate=0,
            opts={"preset": "medium", "crf": crf})
        return enc.encode(frames)

    def x265(crf):
        enc = ffvideo.FFVideoEncoder(
            "libx265", w, h, int(fps), bit_rate=0,
            opts={"preset": "medium", "crf": crf,
                  "x265-params": "log-level=error"})
        return enc.encode(frames)

    try:
        rate_points("x264_medium", x264, "h264", [18, 23, 28, 33, 38])
    except Exception as e:  # noqa: BLE001 — anchor best-effort
        print("x264 anchor failed:", e)
    try:
        rate_points("x265_medium", x265, "hevc", [18, 23, 28, 33, 38])
    except Exception as e:  # noqa: BLE001
        print("x265 anchor failed:", e)
    if full:
        try:
            rate_points("vp9_crf", vp9, "vp9", [20, 28, 36, 44, 52])
        except Exception as e:  # noqa: BLE001
            print("vp9 anchor failed:", e)
        try:
            rate_points("mpeg4_abr", mpeg4, "mpeg4", [500, 250, 120, 60])
        except Exception as e:  # noqa: BLE001
            print("mpeg4 anchor failed:", e)
    return anchors


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


def anchor_deltas(report, anchor_name, key):
    """PSNR delta at equal bitrate vs an anchor (log-rate interp)."""
    rows_a = report["anchors"].get(anchor_name) or []
    if len(rows_a) < 2:
        return
    order = np.argsort([r["kbps"] for r in rows_a])
    xs = np.log([rows_a[i]["kbps"] for i in order])
    ys = np.asarray([rows_a[i]["psnr_y"] for i in order])
    deltas = {}
    for codec, rows in report["codecs"].items():
        ds = []
        for r in rows:
            if not (xs.min() <= np.log(r["kbps"]) <= xs.max()):
                continue
            anchor_psnr = float(np.interp(np.log(r["kbps"]), xs, ys))
            ds.append({"kbps": r["kbps"],
                       f"delta_db_vs_{key}": round(r["psnr_y"]
                                                   - anchor_psnr, 2)})
        deltas[codec] = ds
    report[f"psnr_delta_vs_{key}"] = deltas
    print(f"deltas vs {key}", json.dumps(deltas), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--size", default="320x192")
    ap.add_argument("--codecs", default="h264,h264_host_i4,h264_b,hevc,av1")
    ap.add_argument("--qps", default="22,28,34,40")
    ap.add_argument("--corpus", default="synthetic",
                    choices=["synthetic", "real"],
                    help="real = photographic 720p-class corpus "
                         "(tools/corpus.py), the north-star measurement")
    ap.add_argument("--merge", action="store_true",
                    help="merge this run into --out under a corpus key "
                         "instead of overwriting the whole file")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "RD.json"))
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))
    qps = [int(q) for q in args.qps.split(",")]
    if args.corpus == "real":
        import corpus
        frames = corpus.make_clip(w, h, args.frames)
    else:
        frames = make_clip(w, h, args.frames)
    report = {"size": args.size, "frames": args.frames,
              "corpus": args.corpus, "codecs": {}}
    for codec in args.codecs.split(","):
        if not codec:
            continue
        report["codecs"][codec] = measure(codec, frames, w, h, qps)
        print(codec, json.dumps(report["codecs"][codec]), flush=True)
    report["anchors"] = measure_anchors(frames, w, h,
                                        full=args.corpus == "synthetic")
    print("anchors", json.dumps(report["anchors"]), flush=True)
    anchor_deltas(report, "x264_medium", "x264")
    anchor_deltas(report, "x265_medium", "x265")
    anchor_deltas(report, "vp9_crf", "vp9")
    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            merged = json.load(f)
        merged[f"{args.corpus}_{args.size}"] = report
        report = merged
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
