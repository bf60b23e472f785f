"""AV1 codec: range-coder round-trip, transform exactness, encoder/decoder
bit-exact reconstruction, OBU framing, device-ME agreement."""
import numpy as np
import pytest

from handbrake_tpu.codecs.av1 import obu
from handbrake_tpu.codecs.av1 import transform as T
from handbrake_tpu.codecs.av1.decoder import AV1Decoder
from handbrake_tpu.codecs.av1.encoder import AV1Encoder, EncoderConfig
from handbrake_tpu.codecs.av1.rangecoder import (RangeDecoder, RangeEncoder,
                                                 uniform_cdf)


def make_frames(n, w, h, seed=7):
    rng = np.random.default_rng(seed)
    base_y = (np.add.outer(np.arange(h) * 3, np.arange(w)) % 256)
    frames = []
    for i in range(n):
        y = np.roll(base_y, i * 3, axis=1).astype(np.uint8)
        y[10:30, 10:40] = (i * 40) % 256            # moving-ish content
        u = np.full((h // 2, w // 2), 100 + i, np.uint8)
        v = rng.integers(0, 255, (h // 2, w // 2), dtype=np.uint8)
        frames.append((y, u, v))
    return frames


def test_rangecoder_roundtrip():
    cdf_e = uniform_cdf(8)
    cdf_d = uniform_cdf(8)
    enc = RangeEncoder()
    syms = [0, 1, 7, 3, 3, 3, 3, 0, 5, 2] * 50
    for s in syms:
        enc.encode_symbol(s, cdf_e)
        enc.encode_sgolomb(s - 4)
    data = enc.finish()
    dec = RangeDecoder(data)
    for s in syms:
        assert dec.decode_symbol(cdf_d) == s
        assert dec.decode_sgolomb() == s - 4


def test_transform_near_lossless_at_low_q():
    rng = np.random.default_rng(0)
    blocks = rng.integers(-255, 255, (10, 8, 8)).astype(np.int32)
    rec = T.idct8x8(T.dequantize(
        np.stack([T.quantize(c, 1, True) for c in T.fdct8x8(blocks)]), 1))
    assert np.abs(rec - blocks).max() <= 4


def test_leb128():
    for v in (0, 1, 127, 128, 300, 2**20):
        b = obu.leb128(v)
        got, pos = obu.read_leb128(b, 0)
        assert got == v and pos == len(b)


def test_obu_roundtrip():
    sh = obu.sequence_header(321, 241)
    parsed = list(obu.parse_obus(sh))
    assert parsed[0][0] == obu.OBU_SEQUENCE_HEADER
    info = obu.parse_sequence_header(parsed[0][1])
    assert info["width"] == 321 and info["height"] == 241


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_av1_encode_decode_bit_exact_recon():
    w, h = 96, 64
    enc = AV1Encoder(EncoderConfig(width=w, height=h, qp=24, gop=4,
                                   backend="host"))
    dec = AV1Decoder()
    frames = make_frames(6, w, h)
    for i, (y, u, v) in enumerate(frames):
        au = enc.encode_frame(y, u, v)
        out = dec.decode(au)
        assert len(out) == 1
        dy, du, dv = out[0]
        # decoder output == encoder reconstruction, bit-exact
        np.testing.assert_array_equal(dy, enc.recon_y[:h, :w])
        np.testing.assert_array_equal(du, enc.recon_u[:h // 2, :w // 2])
        np.testing.assert_array_equal(dv, enc.recon_v[:h // 2, :w // 2])
        assert _psnr(dy, y) > 30.0


def test_av1_inter_beats_intra_on_static_content():
    """P frames of a still scene must be tiny (skip blocks dominate)."""
    w, h = 64, 64
    enc = AV1Encoder(EncoderConfig(width=w, height=h, qp=30, gop=10,
                                   backend="host"))
    y = (np.add.outer(np.arange(h), np.arange(w)) % 200).astype(np.uint8)
    u = np.full((32, 32), 90, np.uint8)
    v = np.full((32, 32), 140, np.uint8)
    key = enc.encode_frame(y, u, v)
    p = enc.encode_frame(y, u, v)
    assert len(p) < len(key) // 4


def test_av1_device_me_matches_host_semantics():
    """Device path streams must still decode bit-exactly."""
    w, h = 64, 64
    frames = make_frames(4, w, h, seed=3)
    enc = AV1Encoder(EncoderConfig(width=w, height=h, qp=28, gop=8,
                                   backend="device"))
    dec = AV1Decoder()
    for (y, u, v) in frames:
        au = enc.encode_frame(y, u, v)
        (dy, du, dv), = dec.decode(au)
        np.testing.assert_array_equal(dy, enc.recon_y[:h, :w])


def test_av1_through_work_pipeline(tmp_path):
    """Full transcode into mp4 with the av1 encoder + av1C extradata."""
    from handbrake_tpu.mux.mp4 import MP4Writer
    w, h = 64, 48
    enc = AV1Encoder(EncoderConfig(width=w, height=h, qp=30, gop=4))
    path = str(tmp_path / "o.mp4")
    mw = MP4Writer(path)
    t = mw.add_video_track(codec="av1", width=w, height=h)
    for (y, u, v) in make_frames(3, w, h):
        au = enc.encode_frame(y, u, v)
        mw.write_sample(t, au, duration=3000, sync=enc.last_frame_was_idr)
    mw.finalize()
    blob = open(path, "rb").read()
    assert b"av01" in blob and b"av1C" in blob
