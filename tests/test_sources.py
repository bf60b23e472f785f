"""Sources layer: mp4/mkv demux round trips, y4m, probe, scan.

Reference behaviors modeled: stream.c probe → title, scan.c DecodePreviews
(geometry/autocrop/interlace), batch.c directory expansion.
"""
import numpy as np
import pytest

from handbrake_tpu.codecs.h264.decoder import H264Decoder
from handbrake_tpu.codecs.h264.encoder import EncoderConfig, H264Encoder
from handbrake_tpu.codecs.registry import create_video_decoder
from handbrake_tpu.mux.mkv import MKVWriter
from handbrake_tpu.mux.mp4 import MP4Writer
from handbrake_tpu.sources.mkv import MKVDemuxer
from handbrake_tpu.sources.mp4 import MP4Demuxer
from handbrake_tpu.sources.probe import open_source, scan_paths
from handbrake_tpu.sources.raw import Y4MReader
from handbrake_tpu import scan as hbscan

W, H, N = 64, 48, 12


def _frames():
    base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256).astype(
        np.uint8)
    out = []
    for i in range(N):
        y = np.roll(base, i, axis=1)
        u = np.full((H // 2, W // 2), 100 + i, np.uint8)
        v = np.full((H // 2, W // 2), 60, np.uint8)
        out.append((y, u, v))
    return out


@pytest.fixture(scope="module")
def encoded_mp4(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("src") / "rt.mp4")
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=28, gop=6))
    w = MP4Writer(path)
    vi = w.add_video_track(codec="h264", width=W, height=H)
    for i, f in enumerate(_frames()):
        au = enc.encode_frame(*f)
        w.write_sample(vi, au, duration=3003, sync=(i % 6 == 0),
                       annexb=True)
    w.finalize()
    return path


def test_mp4_demux_tracks(encoded_mp4):
    d = MP4Demuxer(encoded_mp4)
    assert len(d.tracks) == 1
    t = d.tracks[0]
    assert (t.kind, t.codec, t.width, t.height) == ("video", "h264", W, H)
    assert t.extradata[:1] == b"\x01"       # avcC
    assert d.n_samples(0) == N
    d.close()


def test_mp4_roundtrip_bitexact(encoded_mp4):
    """mp4 → annex-B → decode must equal direct decode of the stream."""
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=28, gop=6))
    direct = H264Decoder().decode(
        b"".join(enc.encode_frame(*f) for f in _frames()))
    d = MP4Demuxer(encoded_mp4)
    dec = create_video_decoder("h264", d.tracks[0].extradata)
    out = []
    for _, b in d.packets():
        out.extend(dec.feed(b))
    assert len(out) == len(direct) == N
    for a, (dy, du, dv) in zip(out, direct):
        assert np.array_equal(np.asarray(a.planes[0]), dy)
        assert np.array_equal(np.asarray(a.planes[1]), du)
        assert np.array_equal(np.asarray(a.planes[2]), dv)
    d.close()


def test_mp4_seek_snaps_to_sync(encoded_mp4):
    d = MP4Demuxer(encoded_mp4)
    idx = d.seek(7 * 3003)      # mid-GOP → snap back to frame 6 (IDR)
    assert idx[0] == 6
    d.close()


def test_mkv_roundtrip(tmp_path):
    path = str(tmp_path / "rt.mkv")
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=28, gop=6))
    w = MKVWriter(path)
    vi = w.add_video_track(codec="h264", width=W, height=H, fps=29.97)
    w.add_chapter(0, "Intro")
    for i, f in enumerate(_frames()):
        au = enc.encode_frame(*f)
        w.write_sample(vi, au, pts_90k=i * 3003, duration_90k=3003,
                       sync=(i % 6 == 0), annexb=True)
    w.finalize()
    d = MKVDemuxer(path)
    assert d.tracks[0].codec == "h264"
    assert d.tracks[0].width == W
    assert d.chapters == [(0, "Intro")]
    dec = create_video_decoder("h264", d.tracks[0].extradata)
    out = []
    for _, b in d.packets():
        out.extend(dec.feed(b))
    assert len(out) == N
    d.close()


def test_y4m_reader(tmp_path):
    path = str(tmp_path / "t.y4m")
    with open(path, "wb") as f:
        f.write(b"YUV4MPEG2 W64 H48 F30000:1001 Ip A1:1 C420\n")
        for i in range(5):
            f.write(b"FRAME\n")
            f.write(bytes([i]) * (64 * 48))
            f.write(bytes([128]) * (32 * 24) * 2)
    r = Y4MReader(path)
    assert r.width == 64 and r.height == 48
    assert r.n_frames == 5
    frames = list(r.packets())
    assert len(frames) == 5
    _, b0 = frames[0]
    assert b0.planes[0].shape == (48, 64)
    assert b0.planes[0][0, 0] == 0
    _, b3 = frames[3]
    assert b3.planes[0][0, 0] == 3
    assert b3.pts == int(3 * 90000 * 1001 / 30000)
    r.close()


def test_probe_dispatch(encoded_mp4, tmp_path):
    assert isinstance(open_source(encoded_mp4), MP4Demuxer)
    y4m = str(tmp_path / "p.y4m")
    with open(y4m, "wb") as f:
        f.write(b"YUV4MPEG2 W16 H16 F25:1 C420\n")
        f.write(b"FRAME\n" + bytes(16 * 16 + 2 * 64))
    assert isinstance(open_source(y4m), Y4MReader)
    assert scan_paths(str(tmp_path)) == [y4m]


def test_scan_title(encoded_mp4):
    t = hbscan.scan_title(encoded_mp4, preview_count=4)
    assert t.width == W and t.height == H
    assert t.video_codec == "h264"
    assert t.nframes == N
    assert t.duration == N * 3003
    js = t.to_json()
    assert js["Geometry"]["Width"] == W
    assert js["Duration"]["Ticks"] == N * 3003


def test_scan_autocrop(tmp_path):
    """Letterboxed y4m → crop detected on the dark bars."""
    path = str(tmp_path / "lb.y4m")
    w, h, bar = 64, 64, 8
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F25:1 C420\n".encode())
        for i in range(4):
            y = np.full((h, w), 150, np.uint8)
            y[:bar] = 4
            y[-bar:] = 4
            f.write(b"FRAME\n" + y.tobytes()
                    + bytes([128]) * (w // 2) * (h // 2) * 2)
    t = hbscan.scan_title(path, preview_count=3)
    assert t.crop[0] == bar and t.crop[1] == bar
    assert t.crop[2] == 0 and t.crop[3] == 0


def test_detect_comb():
    rng = np.random.default_rng(0)
    prog = rng.integers(100, 110, (64, 64)).astype(np.uint8)
    assert not hbscan.detect_comb(prog)
    combed = prog.copy()
    combed[::2] += 60          # alternate-line offset = classic combing
    assert hbscan.detect_comb(combed)


# ---------------------------------------------------------------------------
# MPEG program stream (PS / VOB)
# ---------------------------------------------------------------------------
def _write_ps(path, video_es, audio_frames=None):
    """Minimal MPEG-2 program stream: pack headers + PES packets wrapping
    an H.264 ES (video E0) and optional private-1 AC-3 substream."""
    def pack_header():
        # MPEG-2 pack: '01' + SCR 0 + mux rate, no stuffing
        b = bytearray(14)
        b[0:4] = b"\x00\x00\x01\xba"
        b[4] = 0x44            # '01' + scr bits + marker
        b[5] = 0x00
        b[6] = 0x04
        b[7] = 0x00
        b[8] = 0x04
        b[9] = 0x01
        b[10] = 0x00
        b[11] = 0x00
        b[12] = 0x03           # mux rate low + markers
        b[13] = 0xF8           # reserved + stuffing len 0
        return bytes(b)

    def pes(sid, payload, pts=None, sub=None):
        hdr_ext = b""
        flags = 0
        if pts is not None:
            flags = 0x80
            v = pts & ((1 << 33) - 1)
            hdr_ext = bytes([
                0x20 | (((v >> 30) & 7) << 1) | 1,
                (v >> 22) & 0xFF,
                (((v >> 15) & 0x7F) << 1) | 1,
                (v >> 7) & 0xFF,
                ((v & 0x7F) << 1) | 1])
        if sub is not None:
            payload = bytes([sub, 0, 0, 0]) + payload   # AC-3 preamble
        body = bytes([0x80, flags, len(hdr_ext)]) + hdr_ext + payload
        return b"\x00\x00\x01" + bytes([sid]) \
            + len(body).to_bytes(2, "big") + body

    out = b""
    chunk = 1800
    t = 0
    for off in range(0, len(video_es), chunk):
        out += pack_header()
        out += pes(0xE0, video_es[off:off + chunk],
                   pts=t if off % (chunk * 2) == 0 else None)
        t += 3003
    for i, af in enumerate(audio_frames or []):
        out += pack_header()
        out += pes(0xBD, af, pts=i * 2880, sub=0x80)
    out += b"\x00\x00\x01\xb9"
    with open(path, "wb") as f:
        f.write(out)


def test_ps_demux_roundtrip(tmp_path):
    """PS-wrapped H.264 ES demuxes back byte-identical with PTS and the
    AC-3 private-1 substream split out (demuxmpeg.c PS path)."""
    import numpy as np
    from handbrake_tpu.codecs.h264.encoder import EncoderConfig, H264Encoder
    from handbrake_tpu.sources.probe import open_source

    W, H = 64, 48
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=30, gop=4,
                                    backend="host"))
    rng = np.random.default_rng(0)
    es = b"".join(enc.encode_frame(
        rng.integers(0, 255, (H, W), np.uint8),
        np.full((H // 2, W // 2), 100, np.uint8),
        np.full((H // 2, W // 2), 150, np.uint8)) for _ in range(4))
    ac3 = [bytes([0x0B, 0x77, i]) + bytes(61) for i in range(3)]
    p = tmp_path / "t.vob"
    _write_ps(str(p), es, ac3)

    src = open_source(str(p))
    assert type(src).__name__ == "PSDemuxer"
    kinds = [(t.kind, t.codec) for t in src.tracks]
    assert ("video", "h264") in kinds and ("audio", "ac3") in kinds
    vtrk = kinds.index(("video", "h264"))
    atrk = kinds.index(("audio", "ac3"))
    ves = b""
    apkts = []
    for trk, b in src.packets():
        if trk == vtrk:
            ves += b.data
        elif trk == atrk:
            apkts.append(b.data)
    assert ves == es
    assert apkts == ac3
    assert src.tracks[vtrk].width == W
    assert src.duration > 0
    # the universal decoder consumes the demuxed ES
    from handbrake_tpu.codecs.h264.native_decoder import NativeH264Decoder
    assert len(NativeH264Decoder().decode(ves)) == 4
    src.close()
