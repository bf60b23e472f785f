"""Native (C++) slice coder vs the Python reference — bit-exact equality.

The native module replaces the serial host stage (CAVLC walk, NAL packing)
of the H.264 encoder; its output must be byte-identical to the Python
reference paths in codecs/h264/encoder.py on every frame type.
"""
import os

import numpy as np
import pytest

from handbrake_tpu.native import get_lib
from handbrake_tpu.codecs.h264.encoder import H264Encoder, EncoderConfig

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


def _frames(w, h, n, seed=0, scene_cut_at=None):
    rng = np.random.default_rng(seed)
    base_y = rng.integers(0, 256, (h, w), np.uint8)
    base_u = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
    base_v = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
    noise = rng.integers(-4, 5, (n, h, w))
    out = []
    for i in range(n):
        if scene_cut_at is not None and i == scene_cut_at:
            # fully uncorrelated content mid-GOP: per-MB SAD blows past the
            # intra threshold, forcing the P-slice intra-fallback path
            base_y = rng.integers(0, 256, (h, w), np.uint8)
            base_u = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
            base_v = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
        y = np.clip(np.roll(base_y, 2 * i, axis=1).astype(np.int32)
                    + noise[i], 0, 255).astype(np.uint8)
        out.append((y, np.roll(base_u, i, axis=1), base_v))
    return out


def _encode_all(backend, native, frames, w, h, qp):
    prev = os.environ.get("HBTPU_NATIVE")
    os.environ["HBTPU_NATIVE"] = "1" if native else "0"
    try:
        enc = H264Encoder(EncoderConfig(width=w, height=h, qp=qp, gop=4,
                                        backend=backend))
        if not native:
            enc._natlib = None
        payloads = [enc.encode_frame(*f) for f in frames]
        return payloads, (enc.recon_y, enc.recon_u, enc.recon_v)
    finally:
        if prev is None:
            os.environ.pop("HBTPU_NATIVE", None)
        else:
            os.environ["HBTPU_NATIVE"] = prev


@pytest.mark.parametrize("qp", [22, 30, 38])
def test_i_slice_bit_exact(qp):
    w, h = 64, 48
    frames = _frames(w, h, 1, seed=qp)
    nat, (ny, nu, nv) = _encode_all("host", True, frames, w, h, qp)
    ref, (py, pu, pv) = _encode_all("host", False, frames, w, h, qp)
    assert nat[0] == ref[0]
    np.testing.assert_array_equal(np.asarray(ny, np.uint8),
                                  np.asarray(py, np.uint8))
    np.testing.assert_array_equal(np.asarray(nu, np.uint8),
                                  np.asarray(pu, np.uint8))


@pytest.mark.parametrize("qp", [24, 32])
def test_p_slice_device_bit_exact(qp):
    # scene cut at frame 2 (mid-GOP) exercises the C++ intra-fallback
    # branch (pick_i16_mode/write_intra_mb inside a P slice)
    w, h = 64, 48
    frames = _frames(w, h, 4, seed=100 + qp, scene_cut_at=2)
    nat, (ny, _, _) = _encode_all("device", True, frames, w, h, qp)
    ref, (py, _, _) = _encode_all("device", False, frames, w, h, qp)
    assert [len(a) for a in nat] == [len(a) for a in ref]
    for i, (a, b) in enumerate(zip(nat, ref)):
        assert a == b, f"frame {i} differs"
    np.testing.assert_array_equal(np.asarray(ny, np.uint8),
                                  np.asarray(py, np.uint8))


def test_pipelined_begin_finish_matches_serial():
    """begin/finish overlap (device N+1 in flight during host entropy of N)
    must produce the identical stream to serial encode_frame — including
    across a scene cut, where the intra-fallback patch forces an in-flight
    re-analysis (the redo_refs path)."""
    w, h = 64, 48
    frames = _frames(w, h, 6, seed=42, scene_cut_at=3)
    serial, _ = _encode_all("device", True, frames, w, h, 28)

    prev = os.environ.get("HBTPU_NATIVE")
    os.environ["HBTPU_NATIVE"] = "1"
    try:
        enc = H264Encoder(EncoderConfig(width=w, height=h, qp=28, gop=4,
                                        backend="device"))
        pend = []
        out = []
        for f in frames:
            pend.append(enc.begin_frame(*f))
            if len(pend) > 1:
                out.append(enc.finish_frame(pend.pop(0)))
        while pend:
            out.append(enc.finish_frame(pend.pop(0)))
    finally:
        if prev is None:
            os.environ.pop("HBTPU_NATIVE", None)
        else:
            os.environ["HBTPU_NATIVE"] = prev
    assert out == serial


def test_native_stream_decodes():
    """Round-trip through our own decoder (FFmpeg-conformance is asserted
    for the Python path in test_h264_codec; native == python by the tests
    above, so this is a sanity check of the full NAL framing)."""
    from handbrake_tpu.codecs.h264.decoder import H264Decoder
    w, h = 48, 32
    frames = _frames(w, h, 3, seed=7)
    nat, _ = _encode_all("device", True, frames, w, h, 28)
    stream = b"".join(nat)
    decoded = H264Decoder().decode(stream)
    assert len(decoded) == 3
    for (dy, du, dv), (sy, su, sv) in zip(decoded, frames):
        assert dy.shape == sy.shape
        # lossy but correlated
        err = np.abs(dy.astype(np.int32) - sy.astype(np.int32)).mean()
        assert err < 40
