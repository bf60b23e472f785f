"""Muxer tests: our MP4/MKV containers must be readable by OpenCV/FFmpeg
(the independent oracle — no system ffmpeg binary exists in this image)."""
import numpy as np
import pytest

from handbrake_tpu.codecs.h264.encoder import H264Encoder, EncoderConfig
from handbrake_tpu.core.buffer import Buffer, FrameType
from handbrake_tpu.mux import MKVWriter, MP4Writer, Muxer
from handbrake_tpu.mux.nal import (annexb_to_avcc, avcc_to_annexb,
                                   build_avcc, extract_sps_pps,
                                   split_annexb)

W, H, N = 128, 96, 5


@pytest.fixture(scope="module")
def encoded_frames():
    rng = np.random.default_rng(3)
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=30, gop=N))
    frames = []
    ys = []
    base = (np.add.outer(np.arange(H), np.arange(W)) % 256).astype(np.uint8)
    for i in range(N):
        y = np.roll(base, 2 * i, axis=1)
        u = np.full((H // 2, W // 2), 128, np.uint8)
        v = np.full((H // 2, W // 2), 128, np.uint8)
        data = enc.encode_frame(y, u, v)
        frames.append((data, i == 0))
        ys.append(y)
    return frames, ys


def _check_with_cv2(path, ys):
    import cv2
    cap = cv2.VideoCapture(path)
    n = 0
    while True:
        ok, frm = cap.read()
        if not ok:
            break
        gy = cv2.cvtColor(frm, cv2.COLOR_BGR2YUV)[:, :, 0]
        mse = np.mean((gy.astype(float) - ys[n].astype(float)) ** 2)
        assert 10 * np.log10(255 ** 2 / max(mse, 1e-9)) > 25, f"frame {n}"
        n += 1
    cap.release()
    assert n == len(ys)


def test_nal_roundtrip(encoded_frames):
    frames, _ = encoded_frames
    data = frames[0][0]
    nals = split_annexb(data)
    assert len(nals) >= 3  # SPS, PPS, slice
    sps, pps = extract_sps_pps(data)
    assert sps and pps
    avcc = build_avcc(sps, pps)
    assert avcc[0] == 1
    lp = annexb_to_avcc(data)
    back = avcc_to_annexb(lp)
    assert split_annexb(back) == nals


def test_mp4_mux_cv2_readable(tmp_path, encoded_frames):
    frames, ys = encoded_frames
    path = str(tmp_path / "out.mp4")
    w = MP4Writer(path)
    vt = w.add_video_track("h264", W, H)
    for data, idr in frames:
        w.write_sample(vt, data, 3003, sync=idr, annexb=True)
    w.finalize()
    _check_with_cv2(path, ys)


def test_mkv_mux_cv2_readable(tmp_path, encoded_frames):
    frames, ys = encoded_frames
    path = str(tmp_path / "out.mkv")
    w = MKVWriter(path)
    vt = w.add_video_track("h264", W, H, fps=29.97)
    for i, (data, idr) in enumerate(frames):
        w.write_sample(vt, data, i * 3003, 3003, sync=idr, annexb=True)
    w.finalize()
    _check_with_cv2(path, ys)


def test_muxer_interleave(tmp_path, encoded_frames):
    frames, ys = encoded_frames
    path = str(tmp_path / "out2.mp4")
    w = MP4Writer(path)
    vt = w.add_video_track("h264", W, H)
    m = Muxer(w, "mp4")
    tv = m.add_track(vt)
    for i, (data, idr) in enumerate(frames):
        b = Buffer(data=data, pts=i * 3003, duration=3003,
                   frametype=FrameType.IDR if idr else FrameType.P)
        m.queue(tv, b)
    m.finish()
    _check_with_cv2(path, ys)


def test_mp4_chapters_and_metadata(tmp_path, encoded_frames):
    frames, ys = encoded_frames
    path = str(tmp_path / "meta.mp4")
    w = MP4Writer(path)
    vt = w.add_video_track("h264", W, H)
    w.metadata["title"] = "test title"
    w.add_chapter(0, "Chapter 1")
    w.add_chapter(2 * 3003, "Chapter 2")
    for data, idr in frames:
        w.write_sample(vt, data, 3003, sync=idr, annexb=True)
    w.finalize()
    _check_with_cv2(path, ys)
    raw = open(path, "rb").read()
    assert b"chpl" in raw and b"test title" in raw


def test_mkv_multi_cluster_cues(tmp_path, encoded_frames):
    """Keyframes landing in later clusters must still get cue entries —
    the cue-offset patch loop used to crash finalize() once earlier
    entries had already been patched to 3-tuples."""
    import cv2
    frames, ys = encoded_frames
    path = str(tmp_path / "long.mkv")
    w = MKVWriter(path)
    vi = w.add_video_track(codec="h264", width=W, height=H, fps=30.0)
    # spread the 5 frames 6 s apart: every sample starts a new cluster,
    # and frames 0 (IDR) + repeats land in different clusters
    for rep in range(3):
        for i, (data, sync) in enumerate(frames):
            pts = (rep * len(frames) + i) * 6 * 90000
            w.write_sample(vi, data, pts_90k=pts, duration_90k=3003,
                           sync=(i == 0), annexb=True)
    w.finalize()
    cap = cv2.VideoCapture(path)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 15
