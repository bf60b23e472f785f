"""CLI + Handle API (reference: test/test.c EventLoop + hb.c lifecycle)."""
import json
import time

import numpy as np
import pytest

from handbrake_tpu.cli.__main__ import main as cli_main
from handbrake_tpu.hb import Handle, setup_passes
from handbrake_tpu.job.schema import Job
from handbrake_tpu.sources.mkv import MKVDemuxer
from handbrake_tpu.sources.mp4 import MP4Demuxer

W, H, N = 64, 48, 10


@pytest.fixture(scope="module")
def y4m(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "in.y4m")
    base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256).astype(
        np.uint8)
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{W} H{H} F30:1 Ip A1:1 C420\n".encode())
        for i in range(N):
            f.write(b"FRAME\n")
            f.write(np.roll(base, i, axis=1).tobytes())
            f.write(bytes([110]) * (W // 2 * H // 2))
            f.write(bytes([60]) * (W // 2 * H // 2))
    return path


@pytest.fixture(autouse=True)
def host_encoder(monkeypatch):
    monkeypatch.setenv("HB_TPU_DISABLE_DEVICE", "1")


def test_cli_scan_json(y4m, capsys):
    rc = cli_main(["-i", y4m, "--scan", "--json"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    t = out["TitleList"][0]
    assert t["Geometry"]["Width"] == W
    assert t["VideoCodec"] == "rawvideo"


def test_cli_encode(y4m, tmp_path, capsys):
    out = str(tmp_path / "o.mp4")
    rc = cli_main(["-i", y4m, "-o", out, "-q", "28", "-a", "none"])
    assert rc == 0
    d = MP4Demuxer(out)
    assert d.n_samples(0) == N
    d.close()


def test_cli_encode_filters_mkv(y4m, tmp_path, capsys):
    out = str(tmp_path / "o.mkv")
    rc = cli_main(["-i", y4m, "-o", out, "-q", "28", "-w", "32", "-l", "24",
                   "--cfr", "-r", "15", "-a", "none"])
    assert rc == 0
    d = MKVDemuxer(out)
    assert d.tracks[0].width == 32
    n = sum(1 for _ in d.packets())
    assert 4 <= n <= 6       # 30 → 15 fps CFR halves the frame count
    d.close()


def test_cli_preset_list(capsys):
    assert cli_main(["--preset-list"]) == 0
    out = capsys.readouterr().out
    assert "Fast 1080p30" in out


def test_handle_lifecycle(y4m, tmp_path):
    h = Handle()
    h.scan(y4m)
    h.scan_wait(30)
    assert h.get_state()["State"] == "SCANDONE"
    assert len(h.titles) == 1
    out = str(tmp_path / "h.mp4")
    job_json = {
        "Source": {"Path": y4m, "Title": 1},
        "Destination": {"Mux": "mp4", "File": out},
        "Video": {"Encoder": "h264_tpu", "Quality": 30.0},
    }
    h.add_json(job_json)
    h.start()
    err = h.work_wait(60)
    assert err == 0
    assert h.get_state()["State"] == "WORKDONE"
    d = MP4Demuxer(out)
    assert d.n_samples(0) == N
    d.close()
    h.close()


def test_setup_passes_multipass():
    j = Job(vbitrate=1000, quality=None, multipass=True)
    ps = setup_passes(j)
    assert [p.pass_id for p in ps] == [1, 2]
    assert ps[0].interjob is ps[1].interjob
    j2 = Job(quality=22.0)
    assert [p.pass_id for p in setup_passes(j2)] == [0]


def test_cli_anamorphic_and_queue(tmp_path):
    """--loose-anamorphic resolves output geometry via
    set_anamorphic_size2; --queue-import-file runs saved job JSON."""
    import json
    import numpy as np
    from handbrake_tpu.cli.__main__ import main
    from handbrake_tpu.sources.probe import open_source

    W, H, N = 96, 64, 4
    src = tmp_path / "in.y4m"
    with open(src, "wb") as f:
        f.write(f"YUV4MPEG2 W{W} H{H} F25:1 Ip A1:1 C420\n".encode())
        for i in range(N):
            f.write(b"FRAME\n")
            f.write(np.full((H, W), 60 + i, np.uint8).tobytes())
            f.write(np.full((H // 2, W // 2), 128, np.uint8).tobytes())
            f.write(np.full((H // 2, W // 2), 128, np.uint8).tobytes())
    out = tmp_path / "out.mp4"
    rc = main(["-i", str(src), "-o", str(out), "-q", "30",
               "--loose-anamorphic", "--modulus", "16",
               "--maxWidth", "80", "-a", "none"])
    assert rc == 0
    d = open_source(str(out))
    vt = d.tracks[0]
    assert vt.width % 16 == 0 and vt.width <= 80

    # saved-queue run
    out2 = tmp_path / "out2.mp4"
    q = [{"Job": {"Source": {"Path": str(src), "Title": 1},
                  "Destination": {"File": str(out2), "Mux": "mp4"},
                  "Video": {"Encoder": "h264", "Quality": 30.0},
                  "Audio": {"AudioList": []}}}]
    qf = tmp_path / "queue.json"
    qf.write_text(json.dumps(q))
    rc = main(["--queue-import-file", str(qf)])
    assert rc == 0
    assert out2.exists() and out2.stat().st_size > 500
