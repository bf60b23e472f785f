"""Rate control: CQ/ABR/two-pass (reference: x264 ratecontrol via
encx264.c stats files + hb_job_setup_passes hb.c:1945; ours is engine
native — SURVEY.md §2.5 "replace entirely").
"""
import numpy as np
import pytest

from handbrake_tpu.codecs.ratecontrol import (RateController,
                                              estimate_start_qp,
                                              qp_to_qscale, qscale_to_qp)
from handbrake_tpu.job.schema import Job
from handbrake_tpu import work
from handbrake_tpu.hb import setup_passes

W, H, N = 64, 48, 24
FPS = 30.0


@pytest.fixture(autouse=True)
def host_encoder(monkeypatch):
    monkeypatch.setenv("HB_TPU_DISABLE_DEVICE", "1")


def test_qscale_roundtrip():
    for qp in (4, 12, 26, 40, 51):
        assert abs(qscale_to_qp(qp_to_qscale(qp)) - qp) < 1e-9
    assert estimate_start_qp(8000, 1920, 1080, 30) < \
        estimate_start_qp(800, 1920, 1080, 30)


def _simulate(rc, cplx_seq, n_per_gop=8):
    """Ideal encoder model: bits = cplx / qscale(qp)."""
    used = []
    for i, cx in enumerate(cplx_seq):
        idr = (i % n_per_gop) == 0
        qp = rc.frame_qp(idr)
        bits = int(cx / qp_to_qscale(qp))
        rc.update(bits, qp, idr)
        used.append(bits)
    return used


def test_abr_converges_on_model():
    target_kbps = 300.0
    rc = RateController("abr", bitrate_kbps=target_kbps, fps=FPS,
                        width=W, height=H)
    rng = np.random.default_rng(0)
    cplx = [8e4 * (1.0 + 0.3 * rng.random()) for _ in range(240)]
    used = _simulate(rc, cplx)
    rate = sum(used) * FPS / len(used) / 1000.0
    assert abs(rate - target_kbps) / target_kbps < 0.12, rate


def test_two_pass_allocates_by_complexity():
    target_kbps = 400.0
    rng = np.random.default_rng(1)
    cplx = [5e4 if i < 60 else 2.5e5 for i in range(120)]  # easy→hard cut
    p1 = RateController("pass1", bitrate_kbps=target_kbps, fps=FPS,
                        width=W, height=H)
    _simulate(p1, cplx)
    p2 = RateController("pass2", bitrate_kbps=target_kbps, fps=FPS,
                        stats=p1.stats)
    used = _simulate(p2, cplx)
    rate = sum(used) * FPS / len(used) / 1000.0
    assert abs(rate - target_kbps) / target_kbps < 0.08, rate
    # qcomp < 1: hard frames get more bits but not proportionally more
    easy = np.mean(used[10:60])
    hard = np.mean(used[70:])
    assert hard > 1.5 * easy
    assert hard < 5.0 * easy


@pytest.fixture(scope="module")
def y4m_src(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rc") / "in.y4m")
    rng = np.random.default_rng(3)
    base = (np.add.outer(np.arange(H * 2), np.arange(W * 2)) * 3
            % 256).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{W} H{H} F30:1 Ip A1:1 C420\n".encode())
        for i in range(N):
            f.write(b"FRAME\n")
            y = np.clip(base[:H, 2 * i:2 * i + W].astype(int)
                        + rng.integers(-8, 8, (H, W)), 0, 255)
            f.write(y.astype(np.uint8).tobytes())
            f.write(bytes([120]) * (W // 2 * H // 2))
            f.write(bytes([130]) * (W // 2 * H // 2))
    return path


def test_setup_passes_expansion():
    j = Job(path="x", vbitrate=500, multipass=True, quality=None)
    passes = setup_passes(j)
    assert [p.pass_id for p in passes] == [1, 2]
    assert passes[0].interjob is passes[1].interjob


def test_do_job_two_pass_abr(y4m_src, tmp_path):
    """End-to-end config-2 shape: two-pass ABR hits the target bitrate
    better than (or as well as) single-pass ABR on the real encoder."""
    target = 200  # kbps

    def run(multipass):
        out = str(tmp_path / f"o{int(multipass)}.mp4")
        j = Job(path=y4m_src, file=out, mux="mp4", quality=None,
                vbitrate=target, multipass=multipass)
        total = 0
        for p in setup_passes(j):
            stats = work.do_job(p)
            total = stats["bytes_out"]
        rate = total * 8 * FPS / N / 1000.0
        return rate

    r2 = run(True)
    assert abs(r2 - target) / target < 0.10, r2
    # output exists and is a decodable mp4
    from handbrake_tpu.sources.mp4 import MP4Demuxer
    d = MP4Demuxer(str(tmp_path / "o1.mp4"))
    assert d.n_samples(0) == N
    d.close()
