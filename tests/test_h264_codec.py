"""End-to-end H.264 encoder/decoder tests.

Two oracles (SURVEY.md §4 'golden-path bit-exactness'):
  1. our decoder must reproduce the encoder's reconstruction bit-exactly;
  2. FFmpeg (via cv2) must decode our streams to the same pictures
     (compared in BGR after identical colorspace conversion, tol ≤ 4).
"""
import numpy as np
import pytest

from handbrake_tpu.codecs.h264.decoder import H264Decoder
from handbrake_tpu.codecs.h264.encoder import EncoderConfig, H264Encoder

cv2 = pytest.importorskip("cv2")


def synth_clip(W, H, n, seed=0, motion=4):
    """Deterministic moving-crop clip (smooth + structure)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(30, 220, (H + 64, W + 64)).astype(np.uint8)
    base = cv2.GaussianBlur(base, (0, 0), 3)
    cb = rng.integers(100, 156, ((H + 64) // 2, (W + 64) // 2)).astype(np.uint8)
    cr = rng.integers(100, 156, ((H + 64) // 2, (W + 64) // 2)).astype(np.uint8)
    for t in range(n):
        ox, oy = 16 + t * motion, 16 + (t * motion) // 2
        yield (base[oy:oy + H, ox:ox + W],
               cb[oy // 2:oy // 2 + H // 2, ox // 2:ox // 2 + W // 2],
               cr[oy // 2:oy // 2 + H // 2, ox // 2:ox // 2 + W // 2])


def encode_clip(W, H, n, qp=28, gop=4, seed=0, motion=4):
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=qp, gop=gop,
                                    search_range=12))
    stream = b""
    recons = []
    for y, u, v in synth_clip(W, H, n, seed, motion):
        stream += enc.encode_frame(y, u, v)
        recons.append((enc.recon_y.copy(), enc.recon_u.copy(),
                       enc.recon_v.copy()))
    return stream, recons


def ffmpeg_decode_bgr(stream, tmp_path, n):
    p = str(tmp_path / "t.h264")
    open(p, "wb").write(stream)
    cap = cv2.VideoCapture(p)
    out = []
    for _ in range(n):
        ok, bgr = cap.read()
        assert ok, "ffmpeg failed to decode frame"
        out.append(bgr)
    return out


def recon_to_bgr(ry, ru, rv, Hc, Wc):
    i420 = np.vstack([ry[:Hc, :Wc].astype(np.uint8),
                      ru[:Hc // 2, :Wc // 2].astype(np.uint8).reshape(Hc // 4, Wc),
                      rv[:Hc // 2, :Wc // 2].astype(np.uint8).reshape(Hc // 4, Wc)])
    return cv2.cvtColor(i420, cv2.COLOR_YUV2BGR_I420)


def test_own_decoder_bit_exact():
    stream, recons = encode_clip(64, 48, 6, qp=28)
    frames = H264Decoder().decode(stream)
    assert len(frames) == 6
    for (fy, fu, fv), (ry, ru, rv) in zip(frames, recons):
        assert np.array_equal(fy, ry.astype(np.uint8))
        assert np.array_equal(fu, ru.astype(np.uint8))
        assert np.array_equal(fv, rv.astype(np.uint8))


def test_ffmpeg_conformance_ip(tmp_path):
    W, H = 64, 48
    stream, recons = encode_clip(W, H, 6, qp=28, gop=3)
    bgrs = ffmpeg_decode_bgr(stream, tmp_path, 6)
    for bgr, (ry, ru, rv) in zip(bgrs, recons):
        ours = recon_to_bgr(ry, ru, rv, *bgr.shape[:2][::-1][::-1])
        d = np.abs(ours.astype(int) - bgr.astype(int)).max()
        assert d <= 4, f"ffmpeg mismatch {d}"


@pytest.mark.parametrize("qp", [0, 12, 40, 51])
def test_ffmpeg_conformance_qp(tmp_path, qp):
    W, H = 48, 32
    stream, recons = encode_clip(W, H, 3, qp=qp, gop=3, seed=qp)
    bgrs = ffmpeg_decode_bgr(stream, tmp_path, 3)
    for bgr, (ry, ru, rv) in zip(bgrs, recons):
        Hc, Wc = bgr.shape[:2]
        ours = recon_to_bgr(ry, ru, rv, Hc, Wc)
        assert np.abs(ours.astype(int) - bgr.astype(int)).max() <= 4


def test_ffmpeg_conformance_cropped(tmp_path):
    """Dimensions not multiples of 16 exercise SPS cropping."""
    W, H = 72, 52
    stream, recons = encode_clip(W, H, 4, qp=30)
    bgrs = ffmpeg_decode_bgr(stream, tmp_path, 4)
    assert bgrs[0].shape[:2] == (H, W)
    for bgr, (ry, ru, rv) in zip(bgrs, recons):
        ours = recon_to_bgr(ry, ru, rv, H, W)
        assert np.abs(ours.astype(int) - bgr.astype(int)).max() <= 4


def test_quality_sane():
    """Reconstruction PSNR must be reasonable for midrange qp."""
    W, H = 64, 48
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=26, gop=4))
    psnrs = []
    for y, u, v in synth_clip(W, H, 5):
        enc.encode_frame(y, u, v)
        mse = np.mean((enc.recon_y[:H, :W].astype(float) - y.astype(float)) ** 2)
        psnrs.append(10 * np.log10(255 ** 2 / max(mse, 1e-9)))
    assert min(psnrs) > 30, psnrs


def test_bitrate_monotonic_in_qp():
    # covers the coarse-qp regime where a fixed intra threshold + the
    # SSD-domain lambda once inverted the rate curve (RD.json qp-40 bug)
    sizes = []
    for qp in (16, 22, 28, 34, 40, 46):
        stream, _ = encode_clip(48, 32, 4, qp=qp)
        sizes.append(len(stream))
    assert all(a > b for a, b in zip(sizes, sizes[1:])), sizes


def encode_clip_deblock(W, H, n, qp=28, gop=4, seed=0, motion=4):
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=qp, gop=gop,
                                    search_range=12, deblock=True))
    stream = b""
    recons = []
    for y, u, v in synth_clip(W, H, n, seed, motion):
        stream += enc.encode_frame(y, u, v)
        recons.append((enc.recon_y.copy(), enc.recon_u.copy(),
                       enc.recon_v.copy()))
    return stream, recons


def test_deblock_own_decoder_bit_exact():
    """Loop-filtered streams: our decoder must match the encoder recon
    exactly (encoder refs = filtered frames, so any filter divergence
    drifts and fails)."""
    stream, recons = encode_clip_deblock(64, 48, 6, qp=32)
    frames = H264Decoder().decode(stream)
    assert len(frames) == 6
    for i, ((fy, fu, fv), (ry, ru, rv)) in enumerate(zip(frames, recons)):
        assert np.array_equal(fy, ry.astype(np.uint8)), f"frame {i} luma"
        assert np.array_equal(fu, ru.astype(np.uint8)), f"frame {i} cb"
        assert np.array_equal(fv, rv.astype(np.uint8)), f"frame {i} cr"


def ffmpeg_decode_luma(stream, tmp_path, n, H, W):
    """Exact luma planes from FFmpeg (CAP_PROP_CONVERT_RGB=0 hands back the
    Y plane untouched — no BGR conversion noise)."""
    p = str(tmp_path / "t.h264")
    open(p, "wb").write(stream)
    cap = cv2.VideoCapture(p)
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    out = []
    for _ in range(n):
        ok, fy = cap.read()
        assert ok, "ffmpeg failed to decode frame"
        out.append(fy.reshape(-1, W)[:H])
    return out


@pytest.mark.parametrize("qp", [20, 28, 36, 44])
def test_deblock_ffmpeg_conformance(qp):
    """FFmpeg must reconstruct our deblocked streams BIT-EXACTLY in all
    three planes (exact-YUV oracle via libavcodec, tests/ffdec.py) — this
    empirically pins the alpha/beta/tc0 tables, the chroma strong-filter
    mirror, and the 8.7 edge order (P-frame chains amplify divergence)."""
    import ffdec
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    W, H = 64, 48
    stream, recons = encode_clip_deblock(W, H, 6, qp=qp, gop=6, seed=qp)
    frames = ffdec.decode_yuv(stream, "h264")
    assert len(frames) == 6
    for i, ((fy, fu, fv), (ry, ru, rv)) in enumerate(zip(frames, recons)):
        assert np.array_equal(fy, ry[:H, :W].astype(np.uint8)), \
            f"qp {qp} frame {i} luma"
        assert np.array_equal(fu, ru[:H // 2, :W // 2].astype(np.uint8)), \
            f"qp {qp} frame {i} cb"
        assert np.array_equal(fv, rv[:H // 2, :W // 2].astype(np.uint8)), \
            f"qp {qp} frame {i} cr"


def test_deblock_improves_low_bitrate_quality():
    """At high QP the loop filter should not hurt (usually helps) PSNR."""
    W, H = 64, 48
    _, off = encode_clip(W, H, 5, qp=40, gop=5)
    _, on = encode_clip_deblock(W, H, 5, qp=40, gop=5)
    src = list(synth_clip(W, H, 5))
    def avg_psnr(recons):
        es = []
        for (ry, _, _), (sy, _, _) in zip(recons, src):
            mse = np.mean((ry[:H, :W].astype(float) - sy.astype(float)) ** 2)
            es.append(10 * np.log10(255 ** 2 / max(mse, 1e-9)))
        return np.mean(es)
    assert avg_psnr(on) > avg_psnr(off) - 0.15


# ---------------------------------------------------------------------------
# CABAC (Main profile, spec 9.3 — native cabac264.h stage)
# ---------------------------------------------------------------------------
def encode_clip_cabac(W, H, n, qp=28, gop=4, seed=0, motion=4):
    import jax
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=qp, gop=gop,
                                    search_range=12, cabac=True))
    assert enc.cfg.cabac, "native lib required for CABAC tests"
    stream = b""
    recons = []
    for y, u, v in synth_clip(W, H, n, seed, motion):
        stream += enc.encode_frame(y, u, v)
        recons.append(tuple(np.asarray(p, np.uint8) for p in jax.device_get(
            (enc.recon_y, enc.recon_u, enc.recon_v))))
    return stream, recons


@pytest.mark.parametrize("qp", [18, 28, 40])
def test_cabac_ffmpeg_conformance(qp):
    """libavcodec must reconstruct our CABAC streams bit-exactly — pins
    the arithmetic engine, the extracted init tables (extract_fftables.py)
    and every ctxIdx increment the emitted syntax uses."""
    import ffdec
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    W, H = 64, 48
    stream, recons = encode_clip_cabac(W, H, 6, qp=qp, gop=3, seed=qp)
    frames = ffdec.decode_yuv(stream, "h264")
    assert len(frames) == 6
    for i, ((fy, fu, fv), (ry, ru, rv)) in enumerate(zip(frames, recons)):
        assert np.array_equal(fy, ry[:H, :W]), f"qp {qp} frame {i} luma"
        assert np.array_equal(fu, ru[:H // 2, :W // 2]), f"qp {qp} fr {i} cb"
        assert np.array_equal(fv, rv[:H // 2, :W // 2]), f"qp {qp} fr {i} cr"


def test_cabac_dense_gt1_levels_regression():
    """Regression: blocks with ≥4 levels of magnitude >1 exercise the
    5+min(4,numGt1)=9 context (was wrongly capped at 8)."""
    import ffdec
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    rng = np.random.default_rng(3)
    y = np.clip(128 + rng.integers(0, 2, (16, 16)) * 40 - 20,
                0, 255).astype(np.uint8)
    u = np.full((8, 8), 90, np.uint8)
    v = np.full((8, 8), 150, np.uint8)
    enc = H264Encoder(EncoderConfig(width=16, height=16, qp=26, gop=1,
                                    cabac=True, backend="host"))
    s = enc.encode_frame(y, u, v)
    f = ffdec.decode_yuv(s, "h264")
    assert len(f) == 1
    assert np.array_equal(np.asarray(enc.recon_y, np.uint8), f[0][0])


def test_cabac_beats_cavlc_bitrate():
    """CABAC should compress textured content better than CAVLC (the
    ~10-15% bitrate win that motivated encx264's default)."""
    W, H = 96, 64
    # same (device) backend for both so the entropy stage is the only
    # difference — the host walker's mode decisions diverge
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=30, gop=8,
                                    search_range=12, backend="device"))
    cavlc = b""
    for y, u, v in synth_clip(W, H, 8):
        cavlc += enc.encode_frame(y, u, v)
    cab, _ = encode_clip_cabac(W, H, 8, qp=30, gop=8)
    assert len(cab) < len(cavlc), (len(cab), len(cavlc))


def test_cabac_profile_signalled():
    enc = H264Encoder(EncoderConfig(width=32, height=32, qp=30, cabac=True))
    assert enc.sps.profile_idc == 77
    from handbrake_tpu.codecs.h264.syntax import PPS
    from handbrake_tpu.codecs.h264.bits import ebsp_to_rbsp, split_annexb
    hdr = enc.headers()
    nals = list(split_annexb(hdr))
    pps = PPS.parse(ebsp_to_rbsp(nals[1][1:]))
    assert pps.cabac


def test_intra4x4_conformance_and_rd():
    """Intra_4x4 MBs (cfg.intra4x4): streams must stay bit-exact through
    libavcodec AND the encoder's internal reconstruction must equal the
    true decode (the in-loop recon feeds P-frame prediction). Also the
    RD motivation: i4 should not cost bytes at equal qp on structured
    content (x264 enables it at every preset)."""
    import ffdec
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    W, H, n = 96, 64, 4
    sizes = {}
    for i4 in (False, True):
        enc = H264Encoder(EncoderConfig(width=W, height=H, qp=28, gop=n,
                                        search_range=12, intra4x4=i4))
        stream = b""
        recons = []
        for y, u, v in synth_clip(W, H, n, seed=5):
            stream += enc.encode_frame(y, u, v)
            recons.append(enc.recon_y.copy())
        frames = ffdec.decode_yuv(stream, "h264")
        assert len(frames) == n
        for r, f in zip(recons, frames):
            assert np.array_equal(np.asarray(r, np.uint8), f[0])
        sizes[i4] = len(stream)
        if i4:   # at least one MB actually used Intra_4x4 modes
            assert np.any(enc._ipred4[:4, :] != 2) or \
                np.any(enc._ipred4 != enc._ipred4[0, 0])
    assert sizes[True] <= sizes[False] * 1.02, sizes


def test_transform8x8_conformance():
    """8x8 inter transform (cfg.transform8x8, High profile): streams decode
    bit-exactly to the encoder recon in both our decoder and libavcodec,
    the flag is actually exercised, and High-profile headers are emitted."""
    import ffdec
    from handbrake_tpu.codecs.h264 import encoder as E
    from handbrake_tpu.codecs.h264.native_decoder import NativeH264Decoder
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    n_t8 = [0]
    orig = E.H264Encoder._write_luma_residual_inter8
    def counting(self, *a, **k):
        n_t8[0] += 1
        return orig(self, *a, **k)
    E.H264Encoder._write_luma_residual_inter8 = counting
    try:
        W, H, n = 96, 64, 4
        # smooth ramps: the 8x8 basis should win at least somewhere
        yy, xx = np.mgrid[0:H + 32, 0:W + 32]
        base = (90 + 70 * np.sin(xx / 33.0) * np.sin(yy / 29.0)).astype(np.uint8)
        frames = [(np.ascontiguousarray(base[t:t + H, 2 * t:2 * t + W]),
                   np.full((H // 2, W // 2), 120, np.uint8),
                   np.full((H // 2, W // 2), 135, np.uint8))
                  for t in range(n)]
        enc = E.H264Encoder(E.EncoderConfig(width=W, height=H, qp=28,
                                            gop=n, transform8x8=True))
        assert enc.sps.profile_idc == 100
        stream = b""
        recons = []
        for y, u, v in frames:
            stream += enc.encode_frame(y, u, v)
            recons.append(enc.recon_y.copy())
        own = NativeH264Decoder().decode(stream)
        ff = ffdec.decode_yuv(stream, "h264")
        assert len(own) == len(ff) == n
        for r, o, f in zip(recons, own, ff):
            assert np.array_equal(np.asarray(r, np.uint8), o[0])
            assert np.array_equal(np.asarray(r, np.uint8), f[0])
        assert n_t8[0] > 0, "no MB ever chose the 8x8 transform"
    finally:
        E.H264Encoder._write_luma_residual_inter8 = orig


def test_transform8x8_with_deblock_and_i4():
    """The full CAVLC High toolset together — Intra_4x4 + 8x8 transform +
    in-loop deblocking — must stay recon-consistent and oracle-exact
    (the t8 deblock rules: no internal 4x4 luma edges, OR-of-cells bS)."""
    import ffdec
    from handbrake_tpu.codecs.h264.native_decoder import NativeH264Decoder
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    W, H, n = 96, 64, 4
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=30, gop=n,
                                    transform8x8=True, intra4x4=True,
                                    deblock=True, search_range=12))
    stream = b""
    recons = []
    for y, u, v in synth_clip(W, H, n, seed=2):
        stream += enc.encode_frame(y, u, v)
        recons.append((enc.recon_y.copy(), enc.recon_u.copy(),
                       enc.recon_v.copy()))
    own = NativeH264Decoder().decode(stream)
    ff = ffdec.decode_yuv(stream, "h264")
    assert len(own) == len(ff) == n
    for r, o, f in zip(recons, own, ff):
        for pl in range(3):
            assert np.array_equal(np.asarray(r[pl], np.uint8), o[pl])
            assert np.array_equal(np.asarray(r[pl], np.uint8), f[pl])


@pytest.mark.parametrize("cabac", [False, True])
def test_device_deblock_conformance(cabac):
    """Device path with in-loop deblock (deblock_tpu wavefront chained in
    the analyzer) + CABAC: encoder recon must equal the true decode for
    every frame, including scene cuts that force the host intra-fallback
    patch + native re-deblock path (encx264.c b_deblocking_filter role)."""
    import jax
    import ffdec
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    rng = np.random.default_rng(3)
    W, H, n = 96, 64, 8
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for t in range(n):
        if t in (3, 6):                  # scene cuts -> intra fallbacks
            y = np.clip(rng.normal(128, 60, (H, W)), 0, 255).astype(np.uint8)
        else:
            y = (96 + 70 * np.sin((xx + 2 * t) / 9.0)
                 * np.cos((yy + t) / 7.0)).clip(0, 255).astype(np.uint8)
        u = np.clip(128 + 40 * np.sin(xx[::2, ::2] / 11.0 + t), 0,
                    255).astype(np.uint8)
        v = np.clip(128 + 40 * np.cos(yy[::2, ::2] / 13.0 + t), 0,
                    255).astype(np.uint8)
        frames.append((y, u, v))
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=30, gop=n,
                                    backend="device", deblock=True,
                                    cabac=cabac))
    if cabac and not enc.cfg.cabac:
        pytest.skip("native CABAC stage unavailable")
    stream = b""
    recons = []
    for f in frames:
        stream += enc.encode_frame(*f)
        recons.append(tuple(np.array(jax.device_get(p), np.uint8) for p in
                            (enc.recon_y, enc.recon_u, enc.recon_v)))
    dec = ffdec.decode_yuv(stream, "h264")
    assert len(dec) == n
    for i, (r, f) in enumerate(zip(recons, dec)):
        for pi in range(3):
            assert np.array_equal(r[pi], f[pi]), (i, pi)
    # deblock was actually signalled on
    from handbrake_tpu.codecs.h264.native_decoder import NativeH264Decoder
    ours = NativeH264Decoder().decode(stream)
    assert all(np.array_equal(np.asarray(a[0]), f[0])
               for a, f in zip(ours, dec))


def test_device_deblock_pipelined_scene_cut():
    """begin/finish pipelining across an intra-fallback frame: the redo
    machinery must re-dispatch in-flight analyses against the corrected
    (host re-deblocked) reference."""
    import jax
    import ffdec
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    rng = np.random.default_rng(5)
    W, H, n = 96, 64, 7
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for t in range(n):
        if t == 3:
            y = np.clip(rng.normal(120, 55, (H, W)), 0, 255).astype(np.uint8)
        else:
            y = (90 + 70 * np.sin((xx + 3 * t) / 8.0)
                 * np.cos((yy + 2 * t) / 6.0)).clip(0, 255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 105, np.uint8)
        v = np.full((H // 2, W // 2), 150, np.uint8)
        frames.append((y, u, v))
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=31, gop=n,
                                    backend="device", deblock=True,
                                    cabac=True))
    pend = []
    stream = b""
    for f in frames:
        pend.append(enc.begin_frame(*f))
        if len(pend) >= 2:
            stream += enc.finish_frame(pend.pop(0))
    while pend:
        stream += enc.finish_frame(pend.pop(0))
    dec = ffdec.decode_yuv(stream, "h264")
    assert len(dec) == n
    # final recon chain must equal the final decoded frame (no drift)
    assert np.array_equal(np.array(jax.device_get(enc.recon_y), np.uint8),
                          dec[-1][0])


def _moving_object_clip(W, H, n, seed=7):
    """Static textured background + moving object + light noise — the
    canonical B-frame-friendly content (large skippable area)."""
    rng = np.random.default_rng(seed)
    bg = cv2.GaussianBlur(rng.integers(40, 210, (H, W)).astype(np.uint8),
                          (0, 0), 1.8)
    obj = cv2.GaussianBlur(rng.integers(0, 255, (24, 24)).astype(np.uint8),
                           (0, 0), 1.2)
    frames = []
    for t in range(n):
        y = bg.copy().astype(np.int16)
        ox, oy = 10 + 4 * t, 20 + int(1.5 * t)
        if ox + 24 < W and oy + 24 < H:
            y[oy:oy + 24, ox:ox + 24] = obj
        y = np.clip(y + rng.integers(-2, 3, (H, W)), 0, 255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 112, np.uint8)
        v = np.full((H // 2, W // 2), 135, np.uint8)
        frames.append((y, u, v))
    return frames


def test_bframes_conformance_and_reorder():
    """IBBP encoding (encoder_b.py): decode order ≠ display order, POC
    type 0 carries display order, spatial direct + B_Skip/L0/L1/Bi MBs.
    Both decoders must reproduce the encoder recon bit-exactly, including
    a mid-stream IDR (gop boundary) and the flush tail."""
    import ffdec
    from handbrake_tpu.codecs.h264.encoder_b import H264BEncoder
    from handbrake_tpu.codecs.h264.native_decoder import NativeH264Decoder
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    W, H, n = 96, 64, 13
    frames = _moving_object_clip(W, H, n)
    enc = H264BEncoder(EncoderConfig(width=W, height=H, qp=30, gop=8,
                                     search_range=12), bframes=2, refs=2)
    order = []
    stream = b""
    for f in frames:
        for d, au in enc.push_frame(*f):
            order.append(d)
            stream += au
    for d, au in enc.flush():
        order.append(d)
        stream += au
    assert sorted(order) == list(range(n))
    assert order != sorted(order)          # reordering actually happened
    dec = ffdec.decode_yuv(stream, "h264")
    assert len(dec) == n
    for i in range(n):                     # display-order comparison
        for pi in range(3):
            assert np.array_equal(
                np.asarray(enc.recons[i][pi], np.uint8), dec[i][pi]), (i, pi)
    ours = NativeH264Decoder().decode(stream)
    assert len(ours) == n
    for i in range(n):
        assert np.array_equal(np.asarray(ours[i][0]), dec[i][0]), i


def test_bframes_rd_gain():
    """B=2 must save bits vs the no-B engine at equal qp on
    skip-friendly content (the point of the feature: VERDICT r3 #3)."""
    import ffdec
    from handbrake_tpu.codecs.h264.encoder_b import H264BEncoder
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    W, H, n = 160, 96, 25
    frames = _moving_object_clip(W, H, n)
    qp = 30
    e = H264Encoder(EncoderConfig(width=W, height=H, qp=qp, gop=n,
                                  search_range=16, backend="host"))
    s_nob = b"".join(e.encode_frame(*f) for f in frames)
    eb = H264BEncoder(EncoderConfig(width=W, height=H, qp=qp, gop=n,
                                    search_range=16), bframes=2, refs=2)
    s_b = b""
    for f in frames:
        for _d, au in eb.push_frame(*f):
            s_b += au
    for _d, au in eb.flush():
        s_b += au
    assert len(s_b) < 0.95 * len(s_nob), (len(s_b), len(s_nob))
    # and the quality cost stays small (< 0.5 dB luma)
    def py(dec):
        return np.mean([10 * np.log10(255 ** 2 / max(1e-9, np.mean(
            (dec[i][0].astype(np.float64) - frames[i][0]) ** 2)))
            for i in range(n)])
    pA = py(ffdec.decode_yuv(s_nob, "h264"))
    pB = py(ffdec.decode_yuv(s_b, "h264"))
    assert pA - pB < 0.5, (pA, pB)


def test_multiref_p_conformance():
    """Multi-reference P slices (ref_idx_l0 per MB, 3 refs): both
    decoders agree; ref_idx > 0 is actually chosen somewhere (flashing
    background makes the 2-back reference the better match)."""
    import ffdec
    from handbrake_tpu.codecs.h264 import encoder_b as EB
    from handbrake_tpu.codecs.h264.native_decoder import NativeH264Decoder
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    W, H, n = 96, 64, 9
    rng = np.random.default_rng(9)
    a = cv2.GaussianBlur(rng.integers(30, 220, (H, W)).astype(np.uint8),
                         (0, 0), 1.5)
    b = cv2.GaussianBlur(rng.integers(30, 220, (H, W)).astype(np.uint8),
                         (0, 0), 1.5)
    frames = []
    for t in range(n):
        base = a if t % 2 == 0 else b      # alternating: best ref is 2 back
        y = np.clip(base.astype(np.int16) + rng.integers(-2, 3, (H, W)),
                    0, 255).astype(np.uint8)
        frames.append((y, np.full((H // 2, W // 2), 110, np.uint8),
                       np.full((H // 2, W // 2), 140, np.uint8)))
    used_refs = set()
    orig = EB.H264BEncoder._encode_p_mb
    def spy(self, bw, ctx, ms, yp, up, vp, ny, nu, nv, pads, nref, mbx,
            mby, qp, qpc, skip_run, mvout, refout, srs):
        r = orig(self, bw, ctx, ms, yp, up, vp, ny, nu, nv, pads, nref,
                 mbx, mby, qp, qpc, skip_run, mvout, refout, srs)
        if refout[mby, mbx] >= 0:
            used_refs.add(int(refout[mby, mbx]))
        return r
    EB.H264BEncoder._encode_p_mb = spy
    try:
        enc = EB.H264BEncoder(EncoderConfig(width=W, height=H, qp=28,
                                            gop=n, search_range=12),
                              bframes=0, refs=3)
        stream = b""
        for f in frames:
            for _d, au in enc.push_frame(*f):
                stream += au
        for _d, au in enc.flush():
            stream += au
    finally:
        EB.H264BEncoder._encode_p_mb = orig
    assert 1 in used_refs or 2 in used_refs, used_refs
    dec = ffdec.decode_yuv(stream, "h264")
    assert len(dec) == n
    for i in range(n):
        assert np.array_equal(np.asarray(enc.recons[i][0], np.uint8),
                              dec[i][0]), i
    ours = NativeH264Decoder().decode(stream)
    for i in range(n):
        assert np.array_equal(np.asarray(ours[i][0]), dec[i][0]), i


@pytest.mark.parametrize("cabac,deblock", [(False, False), (True, False),
                                           (False, True), (True, True)])
def test_device_transform8x8(cabac, deblock):
    """8x8 transform in the DEVICE path (High profile): per-MB 4x4/8x8
    RDO on device, CAVLC sub-streams / CABAC cat-5 residuals in the
    native stage, composed with deblock — the full x264-default toolset
    in one configuration (VERDICT r3 #1)."""
    import jax
    import ffdec
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    rng = np.random.default_rng(0)
    W, H, n = 96, 64, 6
    yy, xx = np.mgrid[0:H + 64, 0:W + 64]
    # smooth ramps: the 8x8 basis wins somewhere
    base = np.clip(96 + 90 * np.sin(xx / 40.0) * np.cos(yy / 35.0)
                   + rng.normal(0, 2, (H + 64, W + 64)), 0,
                   255).astype(np.uint8)
    frames = [(np.ascontiguousarray(base[4 + t:4 + t + H,
                                         4 + 3 * t:4 + 3 * t + W]),
               np.full((H // 2, W // 2), 110, np.uint8),
               np.full((H // 2, W // 2), 140, np.uint8))
              for t in range(n)]
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=30, gop=n,
                                    backend="device", deblock=deblock,
                                    cabac=cabac, transform8x8=True))
    stream = b""
    recons = []
    for f in frames:
        stream += enc.encode_frame(*f)
        recons.append(np.array(jax.device_get(enc.recon_y), np.uint8))
    # the 8x8 decision actually fires on this content
    enc2 = H264Encoder(EncoderConfig(width=W, height=H, qp=30, gop=n,
                                     backend="device", deblock=deblock,
                                     cabac=cabac, transform8x8=True))
    enc2.encode_frame(*frames[0])
    p = enc2.begin_frame(*frames[1])
    assert int(np.asarray(jax.device_get(p.dev["t8"])).sum()) > 0
    enc2.finish_frame(p)
    dec = ffdec.decode_yuv(stream, "h264")
    assert len(dec) == n
    for i in range(n):
        assert np.array_equal(recons[i], dec[i][0]), i
