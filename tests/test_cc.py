"""CEA-608 closed captions (subtitles/cea608.py — deccc608sub.c role):
pop-on/roll-up decode, A/53 cc_data extraction from MPEG-2 user_data,
and end-to-end: captions in the video ES come out as an MKV text
track."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import ffvideo  # noqa: E402

from handbrake_tpu.subtitles.cea608 import (Cea608Decoder,  # noqa: E402
                                            extract_cc_mpeg2)


def _pairs_for(text_rows):
    pairs = [(0x14, 0x20), (0x14, 0x20)]       # RCL (doubled)
    pairs.append((0x14, 0x2E))                 # ENM
    for r, row in enumerate(text_rows):
        pairs.append((0x14, 0x40 + r))         # PAC → new row
        data = row.encode("ascii")
        for i in range(0, len(data), 2):
            b1 = data[i]
            b2 = data[i + 1] if i + 1 < len(data) else 0
            pairs.append((b1, b2))
    return pairs


def test_cea608_popon_and_erase():
    dec = Cea608Decoder()
    evs = dec.feed(_pairs_for(["HELLO", "WORLD"]), pts=0)
    assert evs == []
    evs = dec.feed([(0x14, 0x2F), (0x14, 0x2F)], pts=90000)  # EOC
    assert evs == []                           # shown, not yet closed
    evs = dec.feed([(0x14, 0x2C)], pts=3 * 90000)            # EDM
    assert len(evs) == 1
    assert evs[0].text == "HELLO\nWORLD"
    assert evs[0].pts == 90000 and evs[0].stop == 3 * 90000


def test_cea608_rollup():
    dec = Cea608Decoder()
    pairs = [(0x14, 0x25)]                     # RU2
    for ch in b"HI":
        pairs.append((ch, 0))
    evs = dec.feed(pairs, 0)
    evs += dec.feed([(0x14, 0x2D)], 90000)     # CR scrolls + emits
    assert any("HI" in e.text for e in evs)


def _cc_user_data(pairs):
    trips = b"".join(bytes([0xFC, a, b]) for a, b in pairs)
    cc = bytes([0x40 | len(pairs), 0xFF]) + trips
    return b"\x00\x00\x01\xb2GA94\x03" + cc + b"\xff"


def test_extract_cc_mpeg2_roundtrip():
    pairs = _pairs_for(["TEST"])
    es = (b"\x00\x00\x01\xb3" + b"\x06\x00\x40" + b"\x00" * 5
          + _cc_user_data(pairs) + b"\x00\x00\x01\x00" + b"\x00" * 4)
    got = extract_cc_mpeg2(es)
    assert got == [(a & 0x7F, b & 0x7F) for a, b in pairs] or got == pairs


def test_cc_to_text_track_end_to_end(tmp_path, monkeypatch):
    """MPEG-2 PS with GA94 captions in the picture user_data → do_job
    with a CC subtitle track → MKV S_TEXT cues."""
    if not ffvideo.available():
        pytest.skip("libavcodec oracle unavailable")
    monkeypatch.setenv("HB_TPU_DISABLE_DEVICE", "1")
    import cv2
    from handbrake_tpu import work
    from handbrake_tpu.job.schema import Job, SubtitleJobTrack
    from handbrake_tpu.sources.mkv import MKVDemuxer

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
    # captions: load on frame 1, EOC on frame 2, EDM on frame 8
    inject = {1: _cc_user_data(_pairs_for(["CAPTION ONE"])),
              2: _cc_user_data([(0x14, 0x2F)]),
              8: _cc_user_data([(0x14, 0x2C)])}

    def pes(sid, p, payload):
        body = bytearray(b"\x80\x80\x05")
        body += bytes([0x21 | ((p >> 29) & 0x0E), (p >> 22) & 0xFF,
                       0x01 | ((p >> 14) & 0xFE), (p >> 7) & 0xFF,
                       0x01 | ((p << 1) & 0xFE)])
        body += payload
        return (b"\x00\x00\x01" + bytes([sid])
                + len(body).to_bytes(2, "big") + bytes(body))

    out = bytearray(b"\x00\x00\x01\xba"
                    + bytes([0x44, 0, 4, 0, 4, 1, 0, 1, 0x89, 0xF8]))
    for i, pkt in enumerate(vpkts):
        payload = inject.get(i, b"") + pkt
        out += pes(0xE0, i * 3000, payload)
    src_path = str(tmp_path / "cc.mpg")
    with open(src_path, "wb") as f:
        f.write(bytes(out))

    out_mkv = str(tmp_path / "cc.mkv")
    j = Job(path=src_path, file=out_mkv, mux="mkv", vcodec="h264",
            quality=26.0)
    j.subtitles = [SubtitleJobTrack(cc=True, language="eng")]
    stats = work.do_job(j)
    assert not stats.get("error"), stats
    assert stats["frames_out"] == n

    d = MKVDemuxer(out_mkv)
    texts = [p.data for trk, p in d.packets()
             if d.tracks[trk].kind == "subtitle"]
    joined = b"|".join(texts)
    assert b"CAPTION ONE" in joined, texts


def test_scan_detects_cc_track(tmp_path):
    """scan_title surfaces a 'cc' subtitle track when GA94 captions ride
    the video ES (the reference's preview-decode CC detection)."""
    if not ffvideo.available():
        pytest.skip("libavcodec oracle unavailable")
    import cv2
    from handbrake_tpu.scan import scan_title

    W, H, n = 96, 64, 8
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

    def pes(sid, p, payload):
        body = bytearray(b"\x80\x80\x05")
        body += bytes([0x21 | ((p >> 29) & 0x0E), (p >> 22) & 0xFF,
                       0x01 | ((p >> 14) & 0xFE), (p >> 7) & 0xFF,
                       0x01 | ((p << 1) & 0xFE)])
        body += payload
        return (b"\x00\x00\x01" + bytes([sid])
                + len(body).to_bytes(2, "big") + bytes(body))

    cc = _cc_user_data(_pairs_for(["SCAN ME"]))
    out = bytearray(b"\x00\x00\x01\xba"
                    + bytes([0x44, 0, 4, 0, 4, 1, 0, 1, 0x89, 0xF8]))
    for i, pkt in enumerate(vpkts):
        out += pes(0xE0, i * 3000, (cc if i == 1 else b"") + pkt)
    p = str(tmp_path / "cc_scan.mpg")
    with open(p, "wb") as f:
        f.write(bytes(out))
    t = scan_title(p, preview_count=2)
    assert t is not None
    assert any(s.source == "cc" for s in t.subtitles)


def test_cli_selects_cc_track(tmp_path, monkeypatch):
    """`-s cc` (or a scanned cc track index) maps to a CC job track."""
    if not ffvideo.available():
        pytest.skip("libavcodec oracle unavailable")
    monkeypatch.setenv("HB_TPU_DISABLE_DEVICE", "1")
    import cv2
    from handbrake_tpu.cli.__main__ import main
    from handbrake_tpu.sources.mkv import MKVDemuxer

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
    inject = {1: _cc_user_data(_pairs_for(["FROM CLI"])),
              2: _cc_user_data([(0x14, 0x2F)]),
              8: _cc_user_data([(0x14, 0x2C)])}

    def pes(sid, p, payload):
        body = bytearray(b"\x80\x80\x05")
        body += bytes([0x21 | ((p >> 29) & 0x0E), (p >> 22) & 0xFF,
                       0x01 | ((p >> 14) & 0xFE), (p >> 7) & 0xFF,
                       0x01 | ((p << 1) & 0xFE)])
        body += payload
        return (b"\x00\x00\x01" + bytes([sid])
                + len(body).to_bytes(2, "big") + bytes(body))

    out = bytearray(b"\x00\x00\x01\xba"
                    + bytes([0x44, 0, 4, 0, 4, 1, 0, 1, 0x89, 0xF8]))
    for i, pkt in enumerate(vpkts):
        out += pes(0xE0, i * 3000, inject.get(i, b"") + pkt)
    src = str(tmp_path / "cli_cc.mpg")
    with open(src, "wb") as f:
        f.write(bytes(out))
    dst = str(tmp_path / "cli_cc.mkv")
    rc = main(["-i", src, "-o", dst, "-e", "h264", "-q", "26",
               "-s", "cc"])
    assert rc == 0
    d = MKVDemuxer(dst)
    texts = b"|".join(p.data for trk, p in d.packets()
                      if d.tracks[trk].kind == "subtitle")
    assert b"FROM CLI" in texts
