"""libavcodec catalog layer (codecs/avcodec.py): the decavcodec.c /
encavcodec.c / encavcodecaudio.c role — E-AC-3/DTS decode, MP3/Opus/
Vorbis encode, and the classic video-encoder catalog, wired through
real jobs."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from handbrake_tpu.codecs import avcodec as av  # noqa: E402
from handbrake_tpu.job.schema import AudioJobTrack, Job  # noqa: E402
from handbrake_tpu import work  # noqa: E402

pytestmark = pytest.mark.skipif(not av.available(),
                                reason="system libavcodec unavailable")

W, H, N = 96, 64, 8


def _tone(sr, n, hz=440.0):
    t = np.arange(n) / sr
    return np.stack([np.sin(2 * np.pi * hz * t)] * 2, 1).astype(
        np.float32) * 0.35


def _peak_hz(pcm, sr):
    seg = pcm[len(pcm) // 4:len(pcm) // 4 + 4096, 0]
    f = np.fft.rfft(seg * np.hanning(len(seg)))
    return np.argmax(np.abs(f)) * sr / len(seg)


def _make_av_source(path, acodec="pcm_s16le", apackets=None, sr=48000,
                    priv=b""):
    """Tiny mkv: h264 video + one audio track."""
    from handbrake_tpu.codecs.h264.encoder import EncoderConfig, H264Encoder
    from handbrake_tpu.mux.mkv import MKVWriter
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=30, gop=N))
    w = MKVWriter(path)
    vi = w.add_video_track(codec="h264", width=W, height=H, fps=30.0)
    ai = w.add_audio_track(codec=acodec, sample_rate=sr, channels=2,
                           private=priv)
    base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256).astype(
        np.uint8)
    if apackets is None:
        tone = (np.clip(_tone(sr, sr // 10), -1, 1)
                * 32767).astype("<i2").tobytes()
        apackets = [(tone, 9000)] * 3
    ap = 0
    for i in range(N):
        u = np.full((H // 2, W // 2), 110, np.uint8)
        v = np.full((H // 2, W // 2), 60, np.uint8)
        au = enc.encode_frame(np.roll(base, i, 1), u, v)
        w.write_sample(vi, au, pts_90k=i * 3003, duration_90k=3003,
                       sync=(i == 0), annexb=True)
    for data, dur in apackets:
        w.write_sample(ai, data, pts_90k=ap, duration_90k=dur)
        ap += dur
    w.finalize()


@pytest.mark.parametrize("codec", ["mp3", "opus", "vorbis"])
def test_lossy_audio_encode_job(tmp_path, codec):
    """-E mp3/opus/vorbis no longer degrades to FLAC: the job encodes a
    real stream that libavcodec decodes back to the source tone."""
    src = str(tmp_path / "src.mkv")
    _make_av_source(src)
    out = str(tmp_path / f"out_{codec}.mkv")
    j = Job(path=src, file=out, mux="mkv", quality=30.0)
    j.audio = [AudioJobTrack(track=0, encoder=codec, mixdown="stereo",
                             bitrate=128)]
    stats = work.do_job(j)
    assert not stats.get("error"), stats
    from handbrake_tpu.sources.mkv import MKVDemuxer
    d = MKVDemuxer(out)
    at = [i for i, t in enumerate(d.tracks) if t.kind == "audio"]
    assert len(at) == 1 and d.tracks[at[0]].codec == codec
    ti = d.tracks[at[0]]
    if codec in ("opus", "vorbis"):
        assert ti.extradata          # OpusHead / Xiph lacing
    dec = av.AVAudioDecoder(codec, extradata=bytes(ti.extradata or b""),
                            sample_rate=ti.sample_rate, channels=2)
    pcm = [dec.decode(p.data) for trk, p in d.packets() if trk == at[0]]
    pcm = np.concatenate([x for x in pcm if x.shape[0]] or
                         [np.zeros((1, 2), np.float32)], 0)
    assert pcm.shape[0] > 4096
    assert abs(_peak_hz(pcm, ti.sample_rate) - 440) < 25
    d.close()


def test_mp3_track_in_mp4(tmp_path):
    """MP3 output into mp4 rides mp4a+esds with OTI 0x6B."""
    src = str(tmp_path / "src.mkv")
    _make_av_source(src)
    out = str(tmp_path / "out.mp4")
    j = Job(path=src, file=out, mux="mp4", quality=30.0)
    j.audio = [AudioJobTrack(track=0, encoder="mp3", mixdown="stereo",
                             bitrate=128)]
    stats = work.do_job(j)
    assert not stats.get("error"), stats
    from handbrake_tpu.sources.probe import open_source
    s = open_source(out)
    ati = [i for i, t in enumerate(s.tracks) if t.kind == "audio"]
    assert len(ati) == 1
    assert s.tracks[ati[0]].codec in ("mp3", "mpa")
    dec = av.AVAudioDecoder("mp3")
    pcm = []
    for trk, p in s.packets():
        if trk == ati[0]:
            pcm.append(dec.decode(p.data))
    pcm = np.concatenate([x for x in pcm if x.shape[0]], 0)
    assert abs(_peak_hz(pcm, 48000) - 440) < 25


@pytest.mark.parametrize("acodec,enc_name", [("eac3", "eac3"),
                                             ("dts", "dca")])
def test_disc_audio_input_decodes(tmp_path, acodec, enc_name):
    """The flagship disc operation: E-AC-3 / DTS source track → AAC at
    160 kbps (decavcodec.c:192-347 personality; was passthrough-only)."""
    sr = 48000
    e = av.AVAudioEncoder(enc_name, sr, 2,
                          768000 if enc_name == "dca" else 256000)
    pkts = e.encode(_tone(sr, sr)) + e.flush()
    src = str(tmp_path / "src.mkv")
    _make_av_source(src, acodec=acodec,
                    apackets=[(p, int(round(d * 90000 / sr)))
                              for p, d in pkts], sr=sr)
    out = str(tmp_path / "out.mp4")
    j = Job(path=src, file=out, mux="mp4", quality=30.0)
    j.audio = [AudioJobTrack(track=0, encoder="aac", mixdown="stereo",
                             bitrate=160)]
    stats = work.do_job(j)
    assert not stats.get("error"), stats
    from handbrake_tpu.sources.probe import open_source
    from handbrake_tpu.audio.aacdec import AACDecoder
    s = open_source(out)
    ati = [i for i, t in enumerate(s.tracks) if t.kind == "audio"]
    assert s.tracks[ati[0]].codec == "aac"
    dec = AACDecoder(bytes(s.tracks[ati[0]].extradata))
    pcm = []
    for trk, p in s.packets():
        if trk == ati[0]:
            out_f = dec.decode_frame(bytes(p.data))
            if out_f is not None and len(out_f):
                pcm.append(out_f)
    pcm = np.concatenate(pcm, 0) if pcm else np.zeros((1, 2))
    assert pcm.shape[0] > 8192
    assert abs(_peak_hz(np.asarray(pcm, np.float32), 48000) - 440) < 25


@pytest.mark.parametrize("vcodec", ["vp9", "mpeg4", "theora", "ffv1"])
def test_video_catalog_roundtrip(tmp_path, vcodec):
    """encavcodec.c catalog: encode TO the classic codec, then transcode
    the result BACK through our pipeline (decode fallback personality)."""
    src = str(tmp_path / "src.mkv")
    _make_av_source(src)
    mid = str(tmp_path / f"mid_{vcodec}.mkv")
    j = Job(path=src, file=mid, mux="mkv", vcodec=vcodec, quality=20.0)
    j.vbitrate = 1200
    j.quality = 20.0 if vcodec == "vp9" else None
    j.audio = []
    stats = work.do_job(j)
    assert not stats.get("error"), stats
    assert stats["frames_out"] == N, stats
    from handbrake_tpu.sources.mkv import MKVDemuxer
    d = MKVDemuxer(mid)
    vt = [t for t in d.tracks if t.kind == "video"][0]
    assert vt.codec == vcodec
    d.close()
    # decode side: catalog input → h264 output
    out = str(tmp_path / f"back_{vcodec}.mp4")
    j2 = Job(path=mid, file=out, mux="mp4", vcodec="h264", quality=28.0)
    j2.audio = []
    stats2 = work.do_job(j2)
    assert not stats2.get("error"), stats2
    assert stats2["frames_out"] == N, stats2


def test_universal_hevc_input(tmp_path):
    """A REAL x265 stream (CU quadtrees, SAO — beyond the native HEVC
    subset) transcodes end-to-end: ResilientHEVCDecoder switches to the
    libavcodec personality and replays the buffered packets."""
    import ffvideo
    from handbrake_tpu.mux.mkv import MKVWriter
    frames = []
    rng = np.random.default_rng(4)
    base = rng.integers(0, 255, (H + 32, W + 32), np.uint8)
    for t in range(N):
        frames.append((np.ascontiguousarray(base[t:t + H, 2 * t:2 * t + W]),
                       np.full((H // 2, W // 2), 110, np.uint8),
                       np.full((H // 2, W // 2), 60, np.uint8)))
    enc = ffvideo.FFVideoEncoder(
        "libx265", W, H, 30, bit_rate=500000,
        opts={"x265-params": "bframes=0:keyint=4:log-level=error"})
    pkts = enc.encode(frames)
    assert len(pkts) == N
    src = str(tmp_path / "x265.mkv")
    w = MKVWriter(src)
    vi = w.add_video_track(codec="hevc", width=W, height=H, fps=30.0)
    for i, p in enumerate(pkts):
        w.write_sample(vi, p, pts_90k=i * 3003, duration_90k=3003,
                       sync=(b"\x00\x00\x00\x01\x28" in p[:6]
                             or b"\x00\x00\x00\x01\x26" in p[:64]
                             or i == 0), annexb=True)
    w.finalize()
    out = str(tmp_path / "out.mp4")
    j = Job(path=src, file=out, mux="mp4", vcodec="h264", quality=28.0)
    j.audio = []
    stats = work.do_job(j)
    assert not stats.get("error"), stats
    assert stats["frames_out"] == N, stats
    # quality sanity: decoded output ~matches the x265 source frames
    import ffdec
    from handbrake_tpu.sources.probe import open_source
    s = open_source(out)
    vt = [t for t in s.tracks if t.kind == "video"][0]
    ed = vt.extradata
    nsps = ed[5] & 0x1F
    off = 6
    stream = b""
    for _ in range(nsps):
        ln = int.from_bytes(ed[off:off + 2], "big")
        off += 2
        stream += b"\x00\x00\x00\x01" + ed[off:off + ln]
        off += ln
    npps = ed[off]
    off += 1
    for _ in range(npps):
        ln = int.from_bytes(ed[off:off + 2], "big")
        off += 2
        stream += b"\x00\x00\x00\x01" + ed[off:off + ln]
        off += ln
    for i in range(s.n_samples(0)):
        stream += bytes(s.read_sample(0, i).data)
    dec = ffdec.decode_yuv(stream, "h264")
    assert len(dec) == N
    p0 = 10 * np.log10(255.0 ** 2 / max(
        1e-9, np.mean((dec[2][0][:H, :W].astype(np.float64)
                       - frames[2][0]) ** 2)))
    assert p0 > 26, p0


def test_bd_style_ts_eac3_dts_to_aac(tmp_path):
    """BD-style M2TS flagship operation (VERDICT r4 #5 done criterion):
    an H.264 TS with E-AC-3 (stream_type 0x87) and DTS (0x82) audio
    tracks transcodes to AAC at 160 kbps end-to-end."""
    from test_ts import pat, psi_packet, pes, ts_packets
    from handbrake_tpu.codecs.h264.encoder import EncoderConfig, H264Encoder

    sr = 48000
    pcm = _tone(sr, sr)
    ee = av.AVAudioEncoder("eac3", sr, 2, 256000)
    eac3_pkts = ee.encode(pcm) + ee.flush()
    de = av.AVAudioEncoder("dca", sr, 2, 768000)
    dts_pkts = de.encode(pcm) + de.flush()

    def pmt3(cc=0):
        es = (bytes([0x1B, 0xE1, 0x00, 0xF0, 0x00])      # H.264 @0x100
              + bytes([0x87, 0xE1, 0x01, 0xF0, 0x00])    # E-AC-3 @0x101
              + bytes([0x82, 0xE1, 0x02, 0xF0, 0x00]))   # DTS @0x102
        body = (b"\x02"
                + (0xB000 | (9 + 4 + len(es) + 4)).to_bytes(2, "big")
                + b"\x00\x01\xc1\x00\x00"
                + bytes([0xE1, 0x00]) + b"\xf0\x00" + es)
        return psi_packet(0x20, body, cc)

    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=28, gop=N))
    base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256).astype(
        np.uint8)
    u = np.full((H // 2, W // 2), 110, np.uint8)
    v = np.full((H // 2, W // 2), 60, np.uint8)
    out = pat() + pmt3()
    cc = 0
    n_frames = 30
    for i in range(n_frames):
        au = enc.encode_frame(np.roll(base, i % 8, axis=1), u, v)
        out += ts_packets(0x100, pes(0xE0, 90000 + i * 3003, au), cc)
        cc += 200
    apts = 90000
    for p, d in eac3_pkts:
        out += ts_packets(0x101, pes(0xBD, apts, p), cc)
        apts += int(round(d * 90000 / sr))
        cc += 100
    apts = 90000
    for p, d in dts_pkts:
        out += ts_packets(0x102, pes(0xBD, apts, p), cc)
        apts += int(round(d * 90000 / sr))
        cc += 100
    src = str(tmp_path / "bd.m2ts")
    with open(src, "wb") as f:
        f.write(out)

    from handbrake_tpu.sources.probe import open_source
    s = open_source(src)
    codecs = sorted(t.codec for t in s.tracks if t.kind == "audio")
    assert codecs == ["dts", "eac3"], codecs
    s.close()

    dst = str(tmp_path / "out.mp4")
    j = Job(path=src, file=dst, mux="mp4", quality=30.0)
    j.audio = [AudioJobTrack(track=0, encoder="aac", mixdown="stereo",
                             bitrate=160),
               AudioJobTrack(track=1, encoder="aac", mixdown="stereo",
                             bitrate=160)]
    stats = work.do_job(j)
    assert not stats.get("error"), stats
    assert stats["frames_out"] == n_frames, stats
    so = open_source(dst)
    atracks = [i for i, t in enumerate(so.tracks) if t.kind == "audio"]
    assert len(atracks) == 2
    from handbrake_tpu.audio.aacdec import AACDecoder
    for ti in atracks:
        dec = AACDecoder(bytes(so.tracks[ti].extradata))
        pcm_out = []
        for trk, p in so.packets():
            if trk == ti:
                f = dec.decode_frame(bytes(p.data))
                if f is not None and len(f):
                    pcm_out.append(f)
        pcm_out = np.concatenate(pcm_out, 0)
        assert pcm_out.shape[0] > 8192
        assert abs(_peak_hz(np.asarray(pcm_out, np.float32), sr)
                   - 440) < 25
