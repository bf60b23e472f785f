"""PGS bitmap subtitles (subtitles/pgs.py): RLE + palette + composition
decode, and the burn-in path end-to-end (decavsub.c:739 + rendersub.c
blend roles, VERDICT r3 #10)."""
import numpy as np
import pytest

from handbrake_tpu.subtitles.pgs import (PgsDecoder, build_display_set,
                                         rle_decode, rle_encode)


def _bitmap(w=60, h=24):
    idx = np.zeros((h, w), np.uint8)
    idx[2:-2, 2:-2] = 1                      # box of color 1
    idx[6:10, 10:50] = 2                     # stripe of color 2
    idx[12, ::3] = 3                         # dotted line (short runs)
    return idx


PALETTE = [(0, 128, 128, 0),                 # 0: transparent
           (235, 128, 128, 255),             # 1: white, opaque
           (81, 90, 240, 255),               # 2: red-ish
           (145, 54, 34, 200)]               # 3: green-ish, translucent


def test_rle_roundtrip():
    idx = _bitmap()
    assert np.array_equal(rle_decode(rle_encode(idx), *idx.shape[::-1]),
                          idx)
    rng = np.random.default_rng(0)
    wild = rng.integers(0, 4, (37, 129)).astype(np.uint8)
    wild[:, 90:] = 0                         # long zero runs
    assert np.array_equal(rle_decode(rle_encode(wild), 129, 37), wild)


def test_pgs_display_set_decode():
    pal = np.zeros((256, 4), np.uint8)
    for i, v in enumerate(PALETTE):
        pal[i] = v
    idx = _bitmap()
    pkt = build_display_set(90000, idx, pal, x=100, y=200)
    dec = PgsDecoder()
    evs = dec.feed(pkt, 90000)
    assert len(evs) == 2                     # clear marker + 1 object
    assert evs[0].rgba is None
    ev = evs[1]
    assert (ev.x, ev.y) == (100, 200)
    assert ev.rgba.shape == (24, 60, 4)
    # transparent background, opaque interior
    assert ev.rgba[0, 0, 3] == 0
    assert ev.rgba[4, 4, 3] == 255
    # white box is near-white RGB
    assert all(ev.rgba[4, 4, c] > 230 for c in range(3))
    # clear set terminates
    clr = build_display_set(180000, idx, pal, 0, 0, clear=True)
    evs2 = dec.feed(clr, 180000)
    assert len(evs2) == 1 and evs2[0].rgba is None


def test_pgs_burn_in_end_to_end(tmp_path, monkeypatch):
    """MKV with video + S_HDMV/PGS track → do_job with Burn → the box
    appears in the decoded output frames during its window and is gone
    after the clear."""
    monkeypatch.setenv("HB_TPU_DISABLE_DEVICE", "1")
    from handbrake_tpu import work
    from handbrake_tpu.codecs.h264.encoder import EncoderConfig, H264Encoder
    from handbrake_tpu.codecs.registry import create_video_decoder
    from handbrake_tpu.job.schema import Job, SubtitleJobTrack
    from handbrake_tpu.mux.mkv import MKVWriter
    from handbrake_tpu.sources.mkv import MKVDemuxer

    W, H, N = 96, 64, 10
    src_path = str(tmp_path / "pgs.mkv")
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=24, gop=N))
    w = MKVWriter(src_path)
    vi = w.add_video_track(codec="h264", width=W, height=H, fps=30.0)
    si = w.add_subtitle_track(codec="pgs")
    pal = np.zeros((256, 4), np.uint8)
    for i, v in enumerate(PALETTE):
        pal[i] = v
    idx = np.zeros((16, 32), np.uint8)
    idx[:] = 1                               # solid white card
    show = build_display_set(2 * 3000, idx, pal, x=30, y=20,
                             screen=(W, H))
    hide = build_display_set(7 * 3000, idx, pal, 0, 0, screen=(W, H),
                             clear=True)
    for i in range(N):
        y = np.full((H, W), 40, np.uint8)
        u = np.full((H // 2, W // 2), 110, np.uint8)
        v = np.full((H // 2, W // 2), 128, np.uint8)
        w.write_sample(vi, enc.encode_frame(y, u, v), pts_90k=i * 3000,
                       duration_90k=3000, sync=(i == 0), annexb=True)
        if i == 0:
            w.write_sample(si, show, pts_90k=2 * 3000, sync=True)
            w.write_sample(si, hide, pts_90k=7 * 3000, sync=True)
    w.finalize()

    out = str(tmp_path / "burned.mkv")
    j = Job(path=src_path, file=out, mux="mkv", quality=20.0)
    j.subtitles = [SubtitleJobTrack(track=0, burn=True)]
    stats = work.do_job(j)
    assert not stats.get("error"), stats
    assert stats["frames_out"] == N

    d = MKVDemuxer(out)
    dec = create_video_decoder("h264", d.tracks[0].extradata)
    frames = []
    for _t, b in d.packets():
        frames.extend(dec.feed(b))
    assert len(frames) == N
    def patch_mean(i):
        y = np.asarray(frames[i].planes[0])
        return float(y[20:36, 30:62].mean())
    assert patch_mean(0) < 60                # before: dark
    assert patch_mean(4) > 180               # white card burned in
    assert patch_mean(8) < 60                # after the clear: dark again
    d.close()
