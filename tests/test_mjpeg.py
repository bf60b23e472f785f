"""MJPEG decode + AVI demux: real-world third-party input files.

The fixture AVI is produced entirely by OpenCV/FFmpeg (libavformat
container + libavcodec mjpeg encoder) — nothing in it came from this
framework, so these tests demonstrate the decavcodec.c role: point the
engine at someone else's file and transcode it.

JPEG does not mandate a bit-exact IDCT, so decode conformance against
libavcodec allows |diff| <= 2 (IEEE-1180-style tolerance).
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def avi_file(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("avi") / "cam.avi")
    w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"MJPG"), 25, (128, 96))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (140, 180, 3), np.uint8)
    base = cv2.GaussianBlur(base, (0, 0), 2)
    for i in range(10):
        w.write(base[i:i + 96, i * 2:i * 2 + 128])
    w.release()
    return p


def test_avi_probe(avi_file):
    from handbrake_tpu.sources.probe import open_source
    src = open_source(avi_file)
    assert type(src).__name__ == "AVIDemuxer"
    t = src.tracks[0]
    assert (t.kind, t.codec, t.width, t.height) == ("video", "mjpeg",
                                                    128, 96)
    assert t.frame_rate == (25, 1)
    pkts = [b for trk, b in src.packets() if t.kind == "video"]
    assert len(pkts) == 10
    assert pkts[0].data[:2] == b"\xff\xd8"        # JPEG SOI
    src.close()


def test_mjpeg_decode_matches_libavcodec(avi_file):
    import sys
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    import ffdec
    if not ffdec.available():
        pytest.skip("libavcodec oracle unavailable")
    from handbrake_tpu.codecs.registry import create_video_decoder
    from handbrake_tpu.sources.probe import open_source
    src = open_source(avi_file)
    dec = create_video_decoder("mjpeg")
    n = 0
    for trk, b in src.packets():
        if src.tracks[trk].kind != "video":
            continue
        frames = dec.feed(b)
        assert len(frames) == 1
        ref = ffdec.decode_yuv(b.data, "mjpeg")
        assert ref
        for k in range(3):
            d = np.abs(frames[0].planes[k].astype(int)
                       - ref[0][k].astype(int)).max()
            assert d <= 2, f"frame {n} plane {k} diff {d}"
        n += 1
    assert n == 10


def test_transcode_real_world_avi(avi_file, tmp_path, monkeypatch):
    """The headline capability: a file this framework did not produce,
    transcoded end-to-end to H.264 mp4."""
    monkeypatch.setenv("HB_TPU_DISABLE_DEVICE", "1")
    from handbrake_tpu import work
    from handbrake_tpu.job.schema import Job
    out = str(tmp_path / "o.mp4")
    stats = work.do_job(Job(path=avi_file, file=out, mux="mp4",
                            quality=26.0))
    assert stats["frames_out"] == 10
    cap = cv2.VideoCapture(out)
    n = 0
    good = []
    while True:
        ok, bgr = cap.read()
        if not ok:
            break
        good.append(bgr)
        n += 1
    assert n == 10
    # sanity: output correlates with the original content
    cap2 = cv2.VideoCapture(avi_file)
    _, orig = cap2.read()
    mse = np.mean((good[0].astype(float) - orig.astype(float)) ** 2)
    psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-9))
    assert psnr > 25, psnr
