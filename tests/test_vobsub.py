"""VOBSUB / DVD subpicture decode (subtitles/vobsub.py): 2-bit RLE in
two fields, command sequence (palette/alpha/coords/offsets/stop), .idx
palette parse, and burn-in end-to-end through an MKV S_VOBSUB track
(decavsub.c VOBSUB personality + rendersub.c blend roles)."""
import numpy as np

from handbrake_tpu.subtitles.vobsub import (VobSubDecoder, build_spu,
                                            parse_idx_palette)

IDX = (b"# VobSub index file, v7\n"
       b"size: 720x480\n"
       b"palette: 000000, ffffff, ff0000, 00ff00, 0000ff, 123456, "
       b"654321, 808080, 404040, c0c0c0, 111111, 222222, 333333, "
       b"444444, 555555, 666666\n")


def _bitmap(w=62, h=22):
    idx = np.zeros((h, w), np.uint8)
    idx[2:-2, 2:-2] = 1                      # box of color 1
    idx[5:9, 10:52] = 2                      # stripe (runs > 15)
    idx[12, ::2] = 3                         # 1-px runs
    idx[15, :] = 2                           # full line (end-of-line code)
    return idx


def test_parse_idx_palette():
    pal = parse_idx_palette(IDX)
    assert pal[1] == 0xFFFFFF and pal[2] == 0xFF0000 and pal[4] == 0x0000FF
    assert len(parse_idx_palette(b"garbage")) == 16


def test_spu_roundtrip_bitmap_and_palette():
    idx = _bitmap()
    spu = build_spu(idx, x=40, y=30, pal_sel=(0, 1, 2, 4),
                    alpha=(0, 15, 12, 8), start_delay=2, stop_delay=200)
    dec = VobSubDecoder(parse_idx_palette(IDX))
    evs = dec.feed(spu, pts=90000)
    # clear marker, bitmap, stop clear
    assert len(evs) == 3
    assert evs[0].rgba is None
    ev = evs[1]
    assert ev.pts == 90000 + 2 * 1024
    assert (ev.x, ev.y) == (40, 30)
    assert ev.rgba.shape == (22, 62, 4)
    # color 1 → CLUT[1] white opaque; color 2 → CLUT[2] red a=12*17
    assert tuple(ev.rgba[10, 10]) == (255, 255, 255, 255)
    assert tuple(ev.rgba[6, 20]) == (255, 0, 0, 204)
    # color 3 → CLUT[4] blue a=8*17; background transparent
    assert tuple(ev.rgba[12, 4]) == (0, 0, 255, 136)
    assert ev.rgba[0, 0, 3] == 0
    # reconstructed index map matches exactly
    lut = {(0, 0, 0, 0): 0, (255, 255, 255, 255): 1,
           (255, 0, 0, 204): 2, (0, 0, 255, 136): 3}
    got = np.zeros(idx.shape, np.uint8)
    for k, v in lut.items():
        got[np.all(ev.rgba == np.array(k), axis=-1)] = v
    assert np.array_equal(got, idx)
    assert evs[2].rgba is None and evs[2].pts == 90000 + 200 * 1024


def test_spu_split_across_packets():
    idx = _bitmap(33, 17)
    spu = build_spu(idx, x=0, y=0)
    dec = VobSubDecoder()
    assert dec.feed(spu[:10], pts=0) == []
    evs = dec.feed(spu[10:], pts=0)
    assert len(evs) == 2 and evs[1].rgba.shape == (17, 33, 4)


def test_vobsub_burn_in_end_to_end(tmp_path, monkeypatch):
    """MKV with video + S_VOBSUB track (idx palette in CodecPrivate) →
    do_job with Burn → the white card shows up in decoded output."""
    monkeypatch.setenv("HB_TPU_DISABLE_DEVICE", "1")
    from handbrake_tpu import work
    from handbrake_tpu.codecs.h264.encoder import (EncoderConfig,
                                                   H264Encoder)
    from handbrake_tpu.codecs.registry import create_video_decoder
    from handbrake_tpu.job.schema import Job, SubtitleJobTrack
    from handbrake_tpu.mux.mkv import MKVWriter
    from handbrake_tpu.sources.mkv import MKVDemuxer

    W, H, N = 96, 64, 10
    src_path = str(tmp_path / "vob.mkv")
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=24, gop=N))
    w = MKVWriter(src_path)
    vi = w.add_video_track(codec="h264", width=W, height=H, fps=30.0)
    si = w.add_subtitle_track(codec="vobsub", private=IDX)
    card = np.ones((16, 32), np.uint8)       # color 1 → white
    spu = build_spu(card, x=30, y=20, pal_sel=(0, 1, 2, 3),
                    alpha=(0, 15, 15, 15), stop_delay=(5 * 3000) // 1024)
    for i in range(N):
        y = np.full((H, W), 40, np.uint8)
        u = np.full((H // 2, W // 2), 110, np.uint8)
        v = np.full((H // 2, W // 2), 128, np.uint8)
        w.write_sample(vi, enc.encode_frame(y, u, v), pts_90k=i * 3000,
                       duration_90k=3000, sync=(i == 0), annexb=True)
        if i == 0:
            w.write_sample(si, spu, pts_90k=2 * 3000, sync=True)
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
        return float(np.asarray(frames[i].planes[0])[20:36, 30:62].mean())
    assert patch_mean(0) < 60                # before display: dark
    assert patch_mean(3) > 180               # white card burned in
    assert patch_mean(9) < 60                # after stop: cleared
