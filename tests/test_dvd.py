"""DVD-Video folder scan (sources/dvd.py — dvd.c hb_dvdread role):
VMG/VTS IFO parse, PGC duration/chapters/palette, multi-VOB
concatenation, and transcode through do_job with VOBSUB burn using the
IFO CLUT."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import ffvideo  # noqa: E402


def _bcd(v):
    return ((v // 10) << 4) | (v % 10)


def _pb_time(seconds, fps=30):
    s = int(seconds)
    f = int(round((seconds - s) * fps))
    return bytes([_bcd(s // 3600), _bcd((s % 3600) // 60), _bcd(s % 60),
                  (0xC0 if fps == 30 else 0x40) | _bcd(f)])


def _make_vmg(n_titles, entries):
    """entries: list of (nr_ptts, vts_nr, vts_ttn)."""
    ifo = bytearray(2048)
    ifo[0:12] = b"DVDVIDEO-VMG"
    ifo[0xC4:0xC8] = (1).to_bytes(4, "big")     # TT_SRPT at sector 1
    srpt = bytearray(8 + 12 * n_titles)
    srpt[0:2] = n_titles.to_bytes(2, "big")
    for i, (ptts, vts, ttn) in enumerate(entries):
        e = 8 + i * 12
        srpt[e] = 0x38                          # playback type
        srpt[e + 1] = 1                         # angles
        srpt[e + 2:e + 4] = ptts.to_bytes(2, "big")
        srpt[e + 6] = vts
        srpt[e + 7] = ttn
    return bytes(ifo) + bytes(srpt).ljust(2048, b"\x00")


def _make_vts(duration_s, cell_secs, palette_yuv):
    ifo = bytearray(2048)
    ifo[0:12] = b"DVDVIDEO-VTS"
    ifo[0xCC:0xD0] = (1).to_bytes(4, "big")     # VTS_PGCIT at sector 1
    n_cells = len(cell_secs)
    pgc = bytearray(0x100 + n_cells * 24)
    pgc[2] = n_cells                            # programs == cells here
    pgc[3] = n_cells
    pgc[4:8] = _pb_time(duration_s)
    for i, v in enumerate(palette_yuv):
        pgc[0xA4 + 4 * i:0xA8 + 4 * i] = v.to_bytes(4, "big")
    pm_off = 0xF0
    cp_off = 0x100
    pgc[0xE6:0xE8] = pm_off.to_bytes(2, "big")
    pgc[0xE8:0xEA] = cp_off.to_bytes(2, "big")
    for p in range(n_cells):
        pgc[pm_off + p] = p + 1                 # program p → cell p+1
    for c, dur in enumerate(cell_secs):
        pgc[cp_off + c * 24 + 4:cp_off + c * 24 + 8] = _pb_time(dur)
    pgcit = bytearray(8 + 8)
    pgcit[0:2] = (1).to_bytes(2, "big")
    pgcit[12:16] = (16).to_bytes(4, "big")      # pgc offset from table
    return bytes(ifo) + (bytes(pgcit) + bytes(pgc)).ljust(2048, b"\x00")


def _pes(sid, p, payload):
    body = bytearray(b"\x80\x80\x05")
    body += bytes([0x21 | ((p >> 29) & 0x0E), (p >> 22) & 0xFF,
                   0x01 | ((p >> 14) & 0xFE), (p >> 7) & 0xFF,
                   0x01 | ((p << 1) & 0xFE)])
    body += payload
    return (b"\x00\x00\x01" + bytes([sid])
            + len(body).to_bytes(2, "big") + bytes(body))


@pytest.fixture
def dvd_dir(tmp_path):
    if not ffvideo.available():
        pytest.skip("libavcodec oracle unavailable")
    import cv2
    from handbrake_tpu.subtitles.vobsub import build_spu
    vt = tmp_path / "disc" / "VIDEO_TS"
    vt.mkdir(parents=True)
    W, H, n = 96, 64, 12
    rng = np.random.default_rng(3)
    base = cv2.GaussianBlur(
        rng.integers(20, 230, (H + 64, W + 64)).astype(np.uint8),
        (0, 0), 1.6)
    frames = [(np.ascontiguousarray(base[t:t + H, 2 * t:2 * t + W]),
               np.full((H // 2, W // 2), 110, np.uint8),
               np.full((H // 2, W // 2), 140, np.uint8))
              for t in range(n)]
    vpkts = ffvideo.FFVideoEncoder(
        "mpeg2video", W, H, 30, bit_rate=1_000_000,
        opts={"bf": 0}).encode(frames)
    # white card SPU on subpicture stream 0x20, palette entry 1 = white
    card = np.ones((16, 32), np.uint8)
    spu = build_spu(card, x=30, y=20, stop_delay=(6 * 3000) // 1024)
    out = bytearray(b"\x00\x00\x01\xba"
                    + bytes([0x44, 0, 4, 0, 4, 1, 0, 1, 0x89, 0xF8]))
    vpts = 0
    for i, pkt in enumerate(vpkts):
        out += _pes(0xE0, vpts, pkt)
        if i == 0:
            out += _pes(0xBD, 3000, bytes([0x20]) + spu)
        vpts += 3000
    # split across two VOBs to exercise concatenation
    half = (len(out) // 2) & ~0x7FF or len(out) // 2
    (vt / "VTS_01_1.VOB").write_bytes(bytes(out[:half]))
    (vt / "VTS_01_2.VOB").write_bytes(bytes(out[half:]))
    # palette: 0=black, 1=white (YCrCb)
    pal = [0x108080, 0xEB8080] + [0x108080] * 14
    (vt / "VTS_01_0.IFO").write_bytes(_make_vts(0.4, [0.2, 0.2], pal))
    (vt / "VIDEO_TS.IFO").write_bytes(_make_vmg(1, [(2, 1, 1)]))
    return str(tmp_path / "disc")


def test_dvd_scan(dvd_dir):
    from handbrake_tpu.sources.dvd import scan_dvd
    titles = scan_dvd(dvd_dir)
    assert len(titles) == 1
    t = titles[0]
    assert abs(t.duration_s - 0.4) < 0.05
    assert len(t.chapter_times) == 2
    assert abs(t.chapter_times[1] - 0.2) < 0.05
    assert t.palette[1] == 0xFFFFFF            # white CLUT entry
    assert len(t.vob_paths) == 2


def test_dvd_scan_title(dvd_dir):
    from handbrake_tpu.scan import scan
    titles = scan(dvd_dir, preview_count=2)
    assert len(titles) == 1
    t = titles[0]
    assert t.video_codec == "mpeg2"
    assert len(t.chapters) == 2
    kinds = [s.source for s in t.subtitles]
    assert "vobsub" in kinds


def test_dvd_transcode_with_vobsub_burn(dvd_dir, tmp_path, monkeypatch):
    monkeypatch.setenv("HB_TPU_DISABLE_DEVICE", "1")
    from handbrake_tpu import work
    from handbrake_tpu.codecs.registry import create_video_decoder
    from handbrake_tpu.job.schema import Job, SubtitleJobTrack
    from handbrake_tpu.sources.probe import open_source
    out = str(tmp_path / "out.mp4")
    j = Job(path=dvd_dir, file=out, mux="mp4", vcodec="h264",
            quality=24.0)
    j.subtitles = [SubtitleJobTrack(track=0, burn=True)]
    stats = work.do_job(j)
    assert not stats.get("error"), stats
    assert stats["frames_out"] == 12, stats
    d = open_source(out)
    dec = create_video_decoder("h264", d.tracks[0].extradata)
    frames = []
    for k in range(d.n_samples(0)):
        frames.extend(dec.feed(d.read_sample(0, k)))
    assert len(frames) == 12

    def patch_mean(i):
        return float(np.asarray(frames[i].planes[0])[20:36, 30:62]
                     .mean())
    assert patch_mean(2) > patch_mean(0) + 60   # white card burned


# ---------------------------------------------------------------------------
# Blu-ray folder (sources/bd.py — bd.c hb_bd role)
# ---------------------------------------------------------------------------
def _m2ts_wrap(ts_bytes):
    """188-byte TS → m2ts (4-byte arrival timestamp prefix per packet)."""
    out = bytearray()
    for i in range(0, len(ts_bytes), 188):
        out += (i // 188).to_bytes(4, "big") + ts_bytes[i:i + 188]
    return bytes(out)


@pytest.fixture
def bd_dir(tmp_path):
    sys.path.insert(0, os.path.dirname(__file__))
    import test_ts as tsfix
    from handbrake_tpu.codecs.h264.encoder import (EncoderConfig,
                                                   H264Encoder)
    W, H, n = 96, 64, 12
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=28, gop=n))
    ts = tsfix.pat() + tsfix.pmt()
    cc = 0
    base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256).astype(
        np.uint8)
    for i in range(n):
        au = enc.encode_frame(np.roll(base, i, 1),
                              np.full((H // 2, W // 2), 110, np.uint8),
                              np.full((H // 2, W // 2), 60, np.uint8))
        pk = tsfix.ts_packets(0x100, tsfix.pes(0xE0, i * 3003, au), cc)
        cc += len(pk) // 188
        ts += pk
    bd = tmp_path / "disc" / "BDMV"
    (bd / "PLAYLIST").mkdir(parents=True)
    (bd / "STREAM").mkdir()
    m2ts = _m2ts_wrap(ts)
    half = (len(m2ts) // 2 // 192) * 192
    (bd / "STREAM" / "00001.m2ts").write_bytes(m2ts[:half])
    (bd / "STREAM" / "00002.m2ts").write_bytes(m2ts[half:])
    dur_ticks = int(n / 30.0 * 45000)

    def play_item(clip):
        # clip(5) codec(4) flags(2) stc_id(1) in(4) out(4)
        body = (clip.encode() + b"M2TS" + b"\x00\x00\x00"
                + (0).to_bytes(4, "big")
                + (dur_ticks // 2).to_bytes(4, "big") + b"\x00" * 8)
        return len(body).to_bytes(2, "big") + body

    items = play_item("00001") + play_item("00002")
    playlist = (b"\x00\x00\x00\x00" + b"\x00\x00"
                + (2).to_bytes(2, "big") + (0).to_bytes(2, "big")
                + items)
    marks = (b"\x00\x00\x00\x00" + (2).to_bytes(2, "big")
             + bytes([0, 1]) + (0).to_bytes(2, "big")
             + (0).to_bytes(4, "big") + b"\xff\xff" + (0).to_bytes(4, "big")
             + bytes([0, 1]) + (1).to_bytes(2, "big")
             + (dur_ticks // 4).to_bytes(4, "big") + b"\xff\xff"
             + (0).to_bytes(4, "big"))
    hdr = b"MPLS0200" + (40).to_bytes(4, "big") \
        + (40 + len(playlist)).to_bytes(4, "big") + (0).to_bytes(4, "big")
    mpls = hdr.ljust(40, b"\x00") + playlist + marks
    (bd / "PLAYLIST" / "00000.mpls").write_bytes(mpls)
    return str(tmp_path / "disc")


def test_bd_scan_and_transcode(bd_dir, tmp_path, monkeypatch):
    monkeypatch.setenv("HB_TPU_DISABLE_DEVICE", "1")
    from handbrake_tpu.sources.bd import scan_bd
    from handbrake_tpu.scan import scan
    from handbrake_tpu import work
    from handbrake_tpu.job.schema import Job

    titles = scan_bd(bd_dir)
    assert len(titles) == 1
    t = titles[0]
    assert len(t.clip_paths) == 2
    assert abs(t.duration_s - 0.4) < 0.05
    assert len(t.chapter_times) == 2
    assert abs(t.chapter_times[1] - 0.3) < 0.05  # item1 +0.1s clip time

    ts = scan(bd_dir, preview_count=2)
    assert len(ts) == 1 and ts[0].video_codec == "h264"
    assert len(ts[0].chapters) == 2

    out = str(tmp_path / "bd.mp4")
    j = Job(path=bd_dir, file=out, mux="mp4", vcodec="h264",
            quality=26.0)
    stats = work.do_job(j)
    assert not stats.get("error"), stats
    assert stats["frames_out"] == 12, stats
    import cv2
    cap = cv2.VideoCapture(out)
    nf = 0
    while cap.read()[0]:
        nf += 1
    assert nf == 12
