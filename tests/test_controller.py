"""Multi-host job controller (parallel/controller.py): worker processes
encode GOP ranges dispatched over sockets; rank 0 aggregates state and
remuxes — HandBrake.Worker Program.cs:48-102 generalized to the
DCN scale-out role (SURVEY §2.8.5)."""
import os
import subprocess
import sys
import time

import numpy as np
import pytest

from handbrake_tpu.parallel.controller import Controller, WorkerServer

W, H, N = 64, 48, 16


@pytest.fixture
def y4m_src(tmp_path):
    path = str(tmp_path / "in.y4m")
    base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256).astype(
        np.uint8)
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{W} H{H} F30:1 Ip A1:1 C420\n".encode())
        for i in range(N):
            f.write(b"FRAME\n")
            f.write(np.roll(base, i, axis=1).tobytes())
            f.write(bytes([110 + i]) * (W // 2 * H // 2))
            f.write(bytes([60]) * (W // 2 * H // 2))
    return path


_WORKER_MAIN = """
import sys
from handbrake_tpu.parallel.controller import WorkerServer
srv = WorkerServer(port=int(sys.argv[1]), token=sys.argv[2]).start()
print("READY", srv.port, flush=True)
import time
time.sleep(600)
"""


def test_two_worker_hosts_end_to_end(y4m_src, tmp_path, monkeypatch):
    """TWO separate worker PROCESSES (true multi-process, the multi-host
    emulation): controller splits 16 frames into 2 ranges, aggregates
    per-host counters into one hb_state dict, gathers + remuxes."""
    monkeypatch.setenv("HB_TPU_DISABLE_DEVICE", "1")
    env = dict(os.environ)
    env["HB_TPU_DISABLE_DEVICE"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    ports = []
    try:
        for k in range(2):
            p = subprocess.Popen([sys.executable, "-c", _WORKER_MAIN,
                                  "0", "tok"], stdout=subprocess.PIPE,
                                 env=env, text=True)
            line = p.stdout.readline().split()
            assert line[0] == "READY"
            ports.append(int(line[1]))
            procs.append(p)
        out = str(tmp_path / "dist.mp4")
        job_json = {"Source": {"Path": y4m_src},
                    "Destination": {"Mux": "mp4", "File": out},
                    "Video": {"Encoder": "h264", "Quality": 28.0}}
        ctl = Controller([("127.0.0.1", pt) for pt in ports], token="tok")
        res = ctl.run(job_json, n_frames=N)
        assert not res.get("error"), res
        assert res["frames_out"] == N
        assert res["per_host"] == [N // 2, N // 2]
        assert ctl.state["State"] == "WORKDONE"
        assert ctl.state["Working"]["Progress"] == 1.0
        # final container: N frames, 2 sync samples (one IDR per host)
        from handbrake_tpu.sources.mp4 import MP4Demuxer
        d = MP4Demuxer(out)
        assert d.n_samples(0) == N
        n_sync = sum(1 for k in range(N) if d.read_sample(0, k).frametype)
        assert n_sync == 2
        # decodes end to end
        from handbrake_tpu.codecs.registry import create_video_decoder
        dec = create_video_decoder("h264", d.tracks[0].extradata)
        frames = []
        for _t, b in d.packets():
            frames.extend(dec.feed(b))
        assert len(frames) == N
        base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256
                ).astype(np.uint8)
        err = np.abs(np.asarray(frames[0].planes[0]).astype(int)
                     - base.astype(int)).mean()
        assert err < 12.0
        d.close()
    finally:
        for p in procs:
            p.kill()


def test_worker_in_process_state_stream(y4m_src, tmp_path, monkeypatch):
    """Single in-process worker: token auth enforced, state lines stream
    during the encode (hb_get_state2 poll analog)."""
    monkeypatch.setenv("HB_TPU_DISABLE_DEVICE", "1")
    srv = WorkerServer(token="secret").start()
    try:
        out = str(tmp_path / "one.mp4")
        job_json = {"Source": {"Path": y4m_src},
                    "Destination": {"Mux": "mp4", "File": out},
                    "Video": {"Encoder": "h264", "Quality": 30.0}}
        bad = Controller([("127.0.0.1", srv.port)], token="wrong")
        res = bad.run(job_json, n_frames=N)
        assert res.get("error") or res.get("frames_out", 0) == 0
        ctl = Controller([("127.0.0.1", srv.port)], token="secret")
        res = ctl.run(job_json, n_frames=N)
        assert res["frames_out"] == N
        from handbrake_tpu.sources.mp4 import MP4Demuxer
        d = MP4Demuxer(out)
        assert d.n_samples(0) == N
        d.close()
    finally:
        srv.stop()


def test_controller_remux_carries_audio_and_mkv(tmp_path, monkeypatch):
    """Rank-0 remux carries EVERY track (VERDICT r4 weak #5): a 2-worker
    job with an audio track lands in an MKV destination with both video
    and decodable AAC audio — no more silent movies."""
    monkeypatch.setenv("HB_TPU_DISABLE_DEVICE", "1")
    from handbrake_tpu.codecs.h264.encoder import EncoderConfig, H264Encoder
    from handbrake_tpu.mux.mkv import MKVWriter
    src = str(tmp_path / "src.mkv")
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=30, gop=N))
    w = MKVWriter(src)
    vi = w.add_video_track(codec="h264", width=W, height=H, fps=30.0)
    ai = w.add_audio_track(codec="pcm_s16le", sample_rate=48000,
                           channels=2)
    base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256).astype(
        np.uint8)
    t = np.arange(4800) / 48000.0
    tone = (np.clip(np.stack([np.sin(2 * np.pi * 440 * t)] * 2, 1), -1, 1)
            * 12000).astype("<i2").tobytes()
    for i in range(N):
        au = enc.encode_frame(np.roll(base, i, 1),
                              np.full((H // 2, W // 2), 110, np.uint8),
                              np.full((H // 2, W // 2), 60, np.uint8))
        w.write_sample(vi, au, pts_90k=i * 3000, duration_90k=3000,
                       sync=(i == 0), annexb=True)
    for k in range(6):
        w.write_sample(ai, tone, pts_90k=k * 9000, duration_90k=9000)
    w.finalize()

    s1 = WorkerServer(token="tk").start()
    s2 = WorkerServer(token="tk").start()
    try:
        out = str(tmp_path / "dist.mkv")
        job_json = {"Source": {"Path": src},
                    "Destination": {"Mux": "mkv", "File": out},
                    "Video": {"Encoder": "h264", "Quality": 30.0},
                    "Audio": {"AudioList": [
                        {"Track": 1, "Encoder": "aac",
                         "Mixdown": "stereo", "Bitrate": 128}]}}
        ctl = Controller([("127.0.0.1", s1.port),
                          ("127.0.0.1", s2.port)], token="tk")
        res = ctl.run(job_json, n_frames=N)
        assert not res.get("error"), res
        from handbrake_tpu.sources.mkv import MKVDemuxer
        d = MKVDemuxer(out)
        kinds = [t.kind for t in d.tracks]
        assert "video" in kinds and "audio" in kinds, kinds
        ai_out = [i for i, tt in enumerate(d.tracks)
                  if tt.kind == "audio"][0]
        assert d.tracks[ai_out].codec == "aac"
        vn = sum(1 for trk, _p in d.packets()
                 if d.tracks[trk].kind == "video")
        an = sum(1 for trk, _p in d.packets() if trk == ai_out)
        assert vn == N and an > 8, (vn, an)
        d.close()
    finally:
        s1.stop()
        s2.stop()
