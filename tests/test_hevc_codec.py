"""HEVC codec tests: primitives, CABAC, residual coding, enc/dec round-trip.

Strategy per SURVEY.md §4: the reference ships no test suite; we validate
golden-path bit-exactness through our own conformant decoder (the same
mirror-decoder approach used for H.264).
"""
import numpy as np
import pytest

from handbrake_tpu.codecs.hevc import transform as T
from handbrake_tpu.codecs.hevc.cabac import (CabacDecoder, CabacEncoder,
                                             ContextSet)
from handbrake_tpu.codecs.hevc.decoder import HEVCDecoder
from handbrake_tpu.codecs.hevc.encoder import EncoderConfig, HEVCEncoder
from handbrake_tpu.codecs.hevc.residual import decode_residual, encode_residual
from handbrake_tpu.codecs.hevc.tables import chroma_qp, dct_matrix, diag_scan
from handbrake_tpu.codecs.h264.bits import BitReader, BitWriter


def test_dct_matrices_canonical():
    t4 = dct_matrix(4)
    assert t4.tolist() == [[64, 64, 64, 64], [83, 36, -36, -83],
                           [64, -64, -64, 64], [36, -83, 83, -36]]
    t8 = dct_matrix(8)
    assert t8[1].tolist() == [89, 75, 50, 18, -18, -50, -75, -89]
    t32 = dct_matrix(32)
    assert t32[1][:4].tolist() == [90, 90, 88, 85]
    # near-orthogonality (the spec matrices are norm-tuned, not exact)
    for n in (4, 8, 16, 32):
        t = dct_matrix(n).astype(np.float64)
        g = t @ t.T
        off = np.abs(g - np.diag(np.diag(g))).max()
        assert off / np.diag(g).mean() < 0.005


def test_diag_scan():
    s = diag_scan(4)
    assert s[0].tolist() == [0, 0]
    assert s[1].tolist() == [0, 1] and s[2].tolist() == [1, 0]
    assert len(set(map(tuple, s.tolist()))) == 16


def test_chroma_qp_table():
    assert chroma_qp(29) == 29
    assert chroma_qp(30) == 29
    assert chroma_qp(35) == 33
    assert chroma_qp(43) == 37
    assert chroma_qp(44) == 38


@pytest.mark.parametrize("log2n", [2, 3, 4, 5])
def test_transform_quant_roundtrip_error(log2n):
    rng = np.random.default_rng(0)
    n = 1 << log2n
    res = rng.integers(-60, 60, (8, n, n)).astype(np.int32)
    c = T.fwd_transform(np, res, log2n)
    lv = T.quant(np, c, 20, log2n, True)
    d = T.dequant(np, lv, 20, log2n)
    r = T.inv_transform(np, d, log2n)
    assert np.abs(r - res).mean() < 3.0


def test_cabac_roundtrip():
    import random
    random.seed(9)
    seq = []
    for _ in range(3000):
        p = random.random()
        if p < 0.6:
            seq.append(("ctx", "sig", random.randint(0, 41),
                        random.randint(0, 1)))
        elif p < 0.95:
            seq.append(("byp", random.randint(0, 1)))
        else:
            seq.append(("trm", 0))
    seq.append(("trm", 1))
    enc = CabacEncoder(ContextSet(1, 28))
    for s in seq:
        if s[0] == "ctx":
            enc.bin(s[1], s[2], s[3])
        elif s[0] == "byp":
            enc.bypass(s[1])
        else:
            enc.terminate(s[1])
    bw = BitWriter()
    enc.write_to(bw)
    dec = CabacDecoder(ContextSet(1, 28), BitReader(bw.get_rbsp()))
    for s in seq:
        if s[0] == "ctx":
            assert dec.bin(s[1], s[2]) == s[3]
        elif s[0] == "byp":
            assert dec.bypass() == s[1]
        else:
            assert dec.terminate() == s[1]


@pytest.mark.parametrize("log2n,cidx", [(4, 0), (5, 0), (4, 1), (3, 2)])
def test_residual_roundtrip(log2n, cidx):
    rng = np.random.default_rng(log2n * 10 + cidx)
    n = 1 << log2n
    for density in (0.02, 0.2, 0.7):
        c = np.zeros((n, n), np.int32)
        mask = rng.random((n, n)) < density
        c[mask] = rng.integers(-300, 300, int(mask.sum()))
        c[0, 0] = 77
        enc = CabacEncoder(ContextSet(1, 30))
        encode_residual(enc, c, log2n, cidx)
        enc.terminate(1)
        bw = BitWriter()
        enc.write_to(bw)
        dec = CabacDecoder(ContextSet(1, 30), BitReader(bw.get_rbsp()))
        c2 = decode_residual(dec, log2n, cidx)
        assert np.array_equal(c, c2)


def _gradient_frames(W, H, n, rng):
    base = (np.add.outer(np.arange(H * 2), np.arange(W * 2)) * 3
            % 256).astype(np.uint8)
    out = []
    for i in range(n):
        y = np.clip(np.roll(base[:H, :W], 2 * i, axis=1).astype(int)
                    + rng.integers(-6, 6, (H, W)), 0, 255).astype(np.uint8)
        u = np.roll(base[:H // 2, :W // 2], i, axis=0)
        v = base[:H // 2, :W // 2].copy()
        out.append((y, u, v))
    return out


def test_hevc_roundtrip_bit_exact():
    rng = np.random.default_rng(5)
    W, H = 96, 64
    enc = HEVCEncoder(EncoderConfig(width=W, height=H, qp=30, gop=3))
    frames = _gradient_frames(W, H, 5, rng)
    stream = b""
    recons = []
    for y, u, v in frames:
        stream += enc.encode_frame(y, u, v)
        recons.append((enc.recon_y[:H, :W].astype(np.uint8),
                       enc.recon_u[:H // 2, :W // 2].astype(np.uint8),
                       enc.recon_v[:H // 2, :W // 2].astype(np.uint8)))
    out = HEVCDecoder().decode(stream)
    assert len(out) == len(frames)
    for dec_f, rec_f in zip(out, recons):
        for a, b in zip(dec_f, rec_f):
            assert np.array_equal(a, b)


def test_hevc_scene_cut_intra_fallback():
    rng = np.random.default_rng(11)
    W, H = 64, 64
    enc = HEVCEncoder(EncoderConfig(width=W, height=H, qp=32, gop=10))
    frames = _gradient_frames(W, H, 2, rng)
    # scene cut: pure noise frame forces intra fallback inside a P slice
    frames.append((rng.integers(0, 256, (H, W), dtype=np.uint8),
                   rng.integers(0, 256, (H // 2, W // 2), dtype=np.uint8),
                   rng.integers(0, 256, (H // 2, W // 2), dtype=np.uint8)))
    stream = b""
    recons = []
    for y, u, v in frames:
        stream += enc.encode_frame(y, u, v)
        recons.append((enc.recon_y[:H, :W].astype(np.uint8),
                       enc.recon_u[:H // 2, :W // 2].astype(np.uint8),
                       enc.recon_v[:H // 2, :W // 2].astype(np.uint8)))
    out = HEVCDecoder().decode(stream)
    for dec_f, rec_f in zip(out, recons):
        for a, b in zip(dec_f, rec_f):
            assert np.array_equal(a, b)


def _ffmpeg_decode_y(cv2, stream, tmp_path, n, W, H):
    """Decode with FFmpeg (via cv2) returning RAW luma planes (no BGR
    conversion — bit-exact oracle; cv2 exposes only Y in raw mode)."""
    p = str(tmp_path / "t.hevc")
    open(p, "wb").write(stream)
    cap = cv2.VideoCapture(p)
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    out = []
    for _ in range(n):
        ok, raw = cap.read()
        assert ok, "ffmpeg failed to decode frame"
        out.append(raw.reshape(-1, raw.shape[-1])[:H, :W])
    return out


def _ffmpeg_decode_bgr(cv2, stream, tmp_path, n):
    p = str(tmp_path / "tb.hevc")
    open(p, "wb").write(stream)
    cap = cv2.VideoCapture(p)
    out = []
    for _ in range(n):
        ok, bgr = cap.read()
        assert ok, "ffmpeg failed to decode frame"
        out.append(bgr)
    return out


def _encode_recons(enc, frames):
    H, W = frames[0][0].shape
    stream = b""
    recons = []
    for y, u, v in frames:
        stream += enc.encode_frame(y, u, v)
        recons.append((enc.recon_y[:H, :W].astype(np.uint8),
                       enc.recon_u[:H // 2, :W // 2].astype(np.uint8),
                       enc.recon_v[:H // 2, :W // 2].astype(np.uint8)))
    return stream, recons


@pytest.mark.parametrize("qp,gop", [(30, 4), (22, 2), (38, 8)])
def test_hevc_ffmpeg_conformance_luma_bit_exact(tmp_path, qp, gop):
    """FFmpeg must decode our streams to our luma reconstruction
    BIT-EXACTLY (noisy gradient content exercises intra + inter +
    merge/skip + high-energy residual paths)."""
    cv2 = pytest.importorskip("cv2")
    W, H = 64, 64
    rng = np.random.default_rng(qp)
    enc = HEVCEncoder(EncoderConfig(width=W, height=H, qp=qp, gop=gop))
    stream, recons = _encode_recons(enc, _gradient_frames(W, H, 6, rng))
    for ff_y, ours in zip(_ffmpeg_decode_y(cv2, stream, tmp_path, 6, W, H),
                          recons):
        assert np.array_equal(ff_y, ours[0])


def test_hevc_ffmpeg_conformance_chroma(tmp_path):
    """Chroma check via BGR compare on in-gamut content (cv2 raw mode
    exposes only luma; out-of-gamut colors clip differently in the two
    BGR converters, so chroma is confined to 100..156 here)."""
    cv2 = pytest.importorskip("cv2")
    W, H = 64, 64
    rng = np.random.default_rng(1)
    frames = []
    base = (np.add.outer(np.arange(H), np.arange(W)) * 2 % 130 + 65
            ).astype(np.uint8)
    for i in range(6):
        y = np.clip(np.roll(base, 2 * i, axis=1).astype(int)
                    + rng.integers(-6, 6, (H, W)), 65, 195).astype(np.uint8)
        u = (rng.integers(112, 144, (H // 2, W // 2))).astype(np.uint8)
        v = (rng.integers(112, 144, (H // 2, W // 2))).astype(np.uint8)
        frames.append((y, u, v))
    enc = HEVCEncoder(EncoderConfig(width=W, height=H, qp=28, gop=3))
    stream, recons = _encode_recons(enc, frames)
    for bgr, (ry, ru, rv) in zip(_ffmpeg_decode_bgr(cv2, stream, tmp_path, 6),
                                 recons):
        i420 = np.vstack([ry, ru.reshape(H // 4, W), rv.reshape(H // 4, W)])
        ours = cv2.cvtColor(i420, cv2.COLOR_YUV2BGR_I420)
        d = np.abs(ours.astype(int) - bgr.astype(int)).max()
        assert d <= 4, f"ffmpeg mismatch {d}"


def test_hevc_ffmpeg_conformance_cropped(tmp_path):
    """Dimensions not multiples of 32 exercise SPS conformance window."""
    cv2 = pytest.importorskip("cv2")
    W, H = 72, 52
    rng = np.random.default_rng(3)
    enc = HEVCEncoder(EncoderConfig(width=W, height=H, qp=30, gop=3))
    stream, recons = _encode_recons(enc, _gradient_frames(W, H, 4, rng))
    for ff_y, ours in zip(_ffmpeg_decode_y(cv2, stream, tmp_path, 4, W, H),
                          recons):
        assert np.array_equal(ff_y, ours[0])


def test_hevc_device_analyzer_exact_and_bit_exact():
    """Device backend: analyzer mv/sad must agree with host mc_luma
    arithmetic, and device-driven streams stay decoder-bit-exact."""
    import handbrake_tpu.codecs.hevc.predict as P
    from handbrake_tpu.codecs.hevc.encoder import PAD
    from handbrake_tpu.codecs.hevc.encoder_tpu import build_ctu_analyzer
    rng = np.random.default_rng(8)
    W, H = 96, 64
    frames = _gradient_frames(W, H, 4, rng)
    enc = HEVCEncoder(EncoderConfig(width=W, height=H, qp=30, gop=4,
                                    backend="device"))
    stream = b""
    recons = []
    for y, u, v in frames:
        stream += enc.encode_frame(y, u, v)
        recons.append((enc.recon_y[:H, :W].astype(np.uint8),
                       enc.recon_u[:H // 2, :W // 2].astype(np.uint8),
                       enc.recon_v[:H // 2, :W // 2].astype(np.uint8)))
    out = HEVCDecoder().decode(stream)
    for dec_f, rec_f in zip(out, recons):
        for a, b in zip(dec_f, rec_f):
            assert np.array_equal(a, b)

    # analyzer SAD == host SAD of the mv it returned (exact 8-tap MC)
    an = build_ctu_analyzer(3, 2, 30)
    y0 = np.asarray(frames[0][0], np.int32)
    y1 = np.asarray(frames[1][0], np.int32)
    dev = an(y1, None, None, y0, None, None)
    mv = np.asarray(dev["mv"])
    sad = np.asarray(dev["sad"])
    ref_pad = P.pad_plane(y0, PAD)
    for i in range(6):
        cy, cx = divmod(i, 3)
        pred = P.mc_luma(ref_pad, PAD, cx * 32, cy * 32, 32, 32,
                         int(mv[i, 0]), int(mv[i, 1]))
        host_sad = np.abs(y1[cy * 32:cy * 32 + 32,
                             cx * 32:cx * 32 + 32].astype(np.int64)
                          - pred).sum()
        assert host_sad == int(sad[i]), (i, host_sad, sad[i])


def test_hevc_quality_monotone_in_qp():
    rng = np.random.default_rng(2)
    W, H = 96, 64
    frames = _gradient_frames(W, H, 3, rng)
    sizes, psnrs = [], []
    for qp in (22, 34):
        enc = HEVCEncoder(EncoderConfig(width=W, height=H, qp=qp, gop=10))
        stream = b"".join(enc.encode_frame(*f) for f in frames)
        out = HEVCDecoder().decode(stream)
        mse = np.mean([(o[0].astype(float) - f[0].astype(float)) ** 2
                       for o, f in zip(out, frames)])
        sizes.append(len(stream))
        psnrs.append(10 * np.log10(255 ** 2 / max(mse, 1e-9)))
    assert sizes[0] > sizes[1]      # lower QP -> more bits
    assert psnrs[0] > psnrs[1]      # lower QP -> higher quality


# ---------------------------------------------------------------------------
# 10-bit (Main 10) — encx265.c multi-depth analog (BASELINE.md config 3)
# ---------------------------------------------------------------------------
def _gradient_frames10(W, H, n, rng):
    base = ((np.add.outer(np.arange(H), np.arange(W)) * 7) % 1024).astype(
        np.uint16)
    out = []
    for i in range(n):
        y = np.clip(np.roll(base, 3 * i, axis=1).astype(np.int32)
                    + rng.integers(-12, 13, (H, W)), 0, 1023).astype(
            np.uint16)
        u = np.full((H // 2, W // 2), 512 + 8 * i, np.uint16)
        v = np.full((H // 2, W // 2), 400, np.uint16)
        out.append((y, u, v))
    return out


def test_hevc10_roundtrip_bit_exact():
    rng = np.random.default_rng(5)
    W, H = 96, 64
    enc = HEVCEncoder(EncoderConfig(width=W, height=H, qp=30, gop=3,
                                    bit_depth=10))
    frames = _gradient_frames10(W, H, 5, rng)
    stream = b""
    recons = []
    for y, u, v in frames:
        stream += enc.encode_frame(y, u, v)
        recons.append((enc.recon_y[:H, :W].astype(np.uint16),
                       enc.recon_u[:H // 2, :W // 2].astype(np.uint16),
                       enc.recon_v[:H // 2, :W // 2].astype(np.uint16)))
    dec = HEVCDecoder()
    out = dec.decode(stream)
    assert dec.sps.bit_depth == 10
    assert len(out) == len(frames)
    for dec_f, rec_f in zip(out, recons):
        for a, b in zip(dec_f, rec_f):
            assert a.dtype == np.uint16
            assert np.array_equal(a, b)


@pytest.mark.parametrize("qp", [24, 34])
def test_hevc10_ffmpeg_conformance(qp):
    """Main-10 streams must decode BIT-EXACTLY in libavcodec (all planes,
    10-bit) — pins the depth-parameterized transforms/MC/prediction."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    import ffdec
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    rng = np.random.default_rng(100 + qp)
    W, H = 96, 64
    enc = HEVCEncoder(EncoderConfig(width=W, height=H, qp=qp, gop=3,
                                    bit_depth=10))
    frames = _gradient_frames10(W, H, 6, rng)
    stream = b""
    recons = []
    for y, u, v in frames:
        stream += enc.encode_frame(y, u, v)
        recons.append((enc.recon_y[:H, :W], enc.recon_u[:H // 2, :W // 2],
                       enc.recon_v[:H // 2, :W // 2]))
    out = ffdec.decode_yuv(stream, "hevc", bits=10)
    # hevc emits in decode order == output order here (no reorder)
    assert len(out) == len(frames)
    for i, ((fy, fu, fv), (ry, ru, rv)) in enumerate(zip(out, recons)):
        assert np.array_equal(np.asarray(fy, np.int32), ry), f"f{i} luma"
        assert np.array_equal(np.asarray(fu, np.int32), ru), f"f{i} cb"
        assert np.array_equal(np.asarray(fv, np.int32), rv), f"f{i} cr"


def test_hevc10_quality_scales():
    rng = np.random.default_rng(9)
    W, H = 64, 64
    enc = HEVCEncoder(EncoderConfig(width=W, height=H, qp=24, gop=4,
                                    bit_depth=10))
    frames = _gradient_frames10(W, H, 4, rng)
    for y, u, v in frames:
        enc.encode_frame(y, u, v)
        err = np.abs(enc.recon_y[:H, :W].astype(int)
                     - y.astype(int)).mean()
        assert err < 12.0  # ~3 8-bit units at qp24


def test_main10_device_analyzer_conformant():
    """Main 10 no longer falls back to host: the device CTU analyzer runs
    at 10-bit (f32 one-hot fetch) and the stream stays bit-exact vs
    libavcodec."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    import ffdec
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    enc = HEVCEncoder(EncoderConfig(width=64, height=48, qp=30, gop=3,
                                    bit_depth=10, backend="device"))
    assert enc.cfg.backend == "device" and enc._analyzer is not None
    rng = np.random.default_rng(0)
    stream = b""
    for _ in range(3):
        stream += enc.encode_frame(
            rng.integers(0, 1024, (48, 64), np.uint16),
            np.full((24, 32), 500, np.uint16),
            np.full((24, 32), 600, np.uint16))
    ref = ffdec.decode_yuv(stream, "hevc", bits=10)
    assert len(ref) == 3
    assert np.array_equal(np.asarray(ref[-1][0]),
                          np.asarray(enc.recon_y)[:48, :64]
                          .astype(np.uint16))
