"""Subtitle pipeline: SRT parse (decsrtsub.c semantics), mux tracks
(tx3g mp4 / S_TEXT/UTF8 mkv), and burn-in through rendersub."""
import numpy as np
import pytest

from handbrake_tpu.core.buffer import CLOCK
from handbrake_tpu.subtitles import parse_srt

SRT = b"""1
00:00:01,000 --> 00:00:02,500
Hello <i>world</i>

2
00:00:03.000 --> 00:00:04.000
Line one
Line two

garbage-not-an-index
00:00:05,000 --> 00:00:04,000
negative duration dropped

3
00:00:06,000 --> 00:00:07,250
{\\an8}Styled away
"""


def test_parse_srt_basic():
    evs = parse_srt(SRT)
    assert len(evs) == 3
    assert evs[0].pts == CLOCK and evs[0].stop == CLOCK * 5 // 2
    assert evs[0].text == "Hello world"
    assert evs[1].text == "Line one\nLine two"
    assert evs[2].pts == 6 * CLOCK
    assert evs[2].text == "Styled away"


def test_parse_srt_bom_and_offset():
    data = b"\xef\xbb\xbf" + SRT
    evs = parse_srt(data, offset_ms=500)
    assert evs[0].pts == CLOCK + CLOCK // 2
    u16 = ("1\n00:00:01,000 --> 00:00:02,000\nUnié\n\n").encode(
        "utf-16-le")
    evs = parse_srt(b"\xff\xfe" + u16)
    assert evs[0].text == "Unié"


def test_parse_srt_latin1_fallback():
    data = "1\n00:00:01,000 --> 00:00:02,000\nCaf\xe9\n\n".encode("latin-1")
    evs = parse_srt(data)
    assert evs[0].text == "Caf\xe9"


@pytest.fixture
def srt_file(tmp_path):
    p = tmp_path / "subs.srt"
    p.write_bytes(b"1\n00:00:00,100 --> 00:00:00,200\nFirst cue\n\n"
                  b"2\n00:00:00,233 --> 00:00:00,300\nSecond cue\n\n")
    return str(p)


def _y4m(tmp_path, w=64, h=48, n=12):
    path = str(tmp_path / "in.y4m")
    base = (np.add.outer(np.arange(h), np.arange(w)) * 3 % 256).astype(
        np.uint8)
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F30000:1001 Ip A1:1 C420\n".encode())
        for i in range(n):
            f.write(b"FRAME\n")
            f.write(np.roll(base, i, axis=1).tobytes())
            f.write(bytes([110]) * (w // 2 * h // 2))
            f.write(bytes([60]) * (w // 2 * h // 2))
    return path


def test_mkv_subtitle_track(tmp_path, srt_file, monkeypatch):
    monkeypatch.setenv("HB_TPU_DISABLE_DEVICE", "1")
    from handbrake_tpu import work
    from handbrake_tpu.job.schema import Job, SubtitleJobTrack
    from handbrake_tpu.sources.mkv import MKVDemuxer
    out = str(tmp_path / "o.mkv")
    j = Job(path=_y4m(tmp_path), file=out, mux="mkv", quality=30.0)
    j.subtitles = [SubtitleJobTrack(track=-1, import_file=srt_file,
                                    language="eng")]
    work.do_job(j)
    d = MKVDemuxer(out)
    subs = [t for t in d.tracks if t.kind == "subtitle"]
    assert len(subs) == 1
    assert subs[0].language in ("eng", "und")
    texts = [pkt.data for trk, pkt in d.packets()
             if d.tracks[trk].kind == "subtitle"]
    assert b"First cue" in b"|".join(texts)
    assert b"Second cue" in b"|".join(texts)


def test_mp4_tx3g_subtitle_track(tmp_path, srt_file, monkeypatch):
    monkeypatch.setenv("HB_TPU_DISABLE_DEVICE", "1")
    from handbrake_tpu import work
    from handbrake_tpu.job.schema import Job, SubtitleJobTrack
    from handbrake_tpu.sources.mp4 import MP4Demuxer
    out = str(tmp_path / "o.mp4")
    j = Job(path=_y4m(tmp_path), file=out, mux="mp4", quality=30.0)
    j.subtitles = [SubtitleJobTrack(track=-1, import_file=srt_file,
                                    language="eng")]
    work.do_job(j)
    d = MP4Demuxer(out)
    subs = [i for i, t in enumerate(d.tracks) if t.kind == "subtitle"]
    assert len(subs) == 1
    payload = b"".join(pkt.data for trk, pkt in d.packets()
                       if trk == subs[0] and pkt.data)
    assert b"First cue" in payload and b"Second cue" in payload


def test_burn_in_changes_pixels(tmp_path, srt_file, monkeypatch):
    monkeypatch.setenv("HB_TPU_DISABLE_DEVICE", "1")
    from handbrake_tpu import work
    from handbrake_tpu.codecs.registry import create_video_decoder
    from handbrake_tpu.job.schema import Job, SubtitleJobTrack
    from handbrake_tpu.sources.mp4 import MP4Demuxer

    def encode(with_burn):
        out = str(tmp_path / f"b{int(with_burn)}.mp4")
        j = Job(path=_y4m(tmp_path), file=out, mux="mp4", quality=20.0)
        if with_burn:
            j.subtitles = [SubtitleJobTrack(track=-1, import_file=srt_file,
                                            burn=True)]
        work.do_job(j)
        d = MP4Demuxer(out)
        dec = create_video_decoder("h264", d.tracks[0].extradata)
        frames = []
        for trk, b in d.packets():
            if trk == 0:
                frames.extend(dec.feed(b))
        return frames

    plain = encode(False)
    burned = encode(True)
    assert len(plain) == len(burned) == 12
    # cue 1 covers frames 0-6-ish at 29.97 fps (100..250 ms ≈ frames 3-7)
    def luma(f):
        return np.asarray(f.planes[0] if hasattr(f, "planes") else f[0])

    diffs = [int(np.abs(luma(b).astype(int) - luma(p).astype(int)).max())
             for p, b in zip(plain, burned)]
    assert max(diffs[3:6]) > 40, diffs        # text visibly burned
    # after the last cue only P-ref ripple remains (no text ⇒ ≪ 40)
    assert diffs[-1] < 40, diffs


# -- SSA/ASS + WebVTT import (decssasub.c / IMPORTVTT roles) ---------------
ASS = b"""[Script Info]
Title: t
ScriptType: v4.00+

[V4+ Styles]
Format: Name, Fontname
Style: Default,Arial

[Events]
Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text
Dialogue: 0,0:00:01.00,0:00:02.50,Default,,0,0,0,,Hello {\\i1}world{\\i0}
Dialogue: 0,0:00:03.20,0:00:04.00,Default,,0,0,0,,Line one\\NLine two, with comma
Comment: 0,0:00:05.00,0:00:06.00,Default,,0,0,0,,not shown
"""

VTT = b"""WEBVTT

NOTE this block
is skipped

cue-1
00:01.000 --> 00:02.500 position:50%
Hello <b>world</b>

00:00:03.200 --> 00:00:04.000
Line one
Line two
"""


def test_parse_ssa():
    from handbrake_tpu.subtitles import parse_ssa
    evs = parse_ssa(ASS)
    assert len(evs) == 2
    assert evs[0].pts == CLOCK and evs[0].stop == CLOCK * 5 // 2
    assert evs[0].text == "Hello world"
    assert evs[1].pts == 32 * CLOCK // 10
    assert evs[1].text == "Line one\nLine two, with comma"


def test_parse_vtt():
    from handbrake_tpu.subtitles import parse_vtt
    evs = parse_vtt(VTT)
    assert len(evs) == 2
    assert evs[0].pts == CLOCK and evs[0].stop == CLOCK * 5 // 2
    assert evs[0].text == "Hello world"
    assert evs[1].text == "Line one\nLine two"


def test_parse_textsub_sniff():
    from handbrake_tpu.subtitles import parse_textsub
    assert parse_textsub(ASS)[0].text == "Hello world"     # sniffed SSA
    assert parse_textsub(VTT)[0].text == "Hello world"     # sniffed VTT
    assert parse_textsub(SRT, fmt="SRT")[0].text == "Hello world"
    assert parse_textsub(ASS, fmt="SSA")[1].pts == 32 * CLOCK // 10


def test_ass_import_end_to_end(tmp_path, monkeypatch):
    """.ass import file flows through do_job into an MKV text track."""
    monkeypatch.setenv("HB_TPU_DISABLE_DEVICE", "1")
    from handbrake_tpu import work
    from handbrake_tpu.job.schema import Job, SubtitleJobTrack
    from handbrake_tpu.sources.mkv import MKVDemuxer
    p = tmp_path / "subs.ass"
    p.write_bytes(
        b"[Events]\nFormat: Layer, Start, End, Style, Name, MarginL, "
        b"MarginR, MarginV, Effect, Text\n"
        b"Dialogue: 0,0:00:00.10,0:00:00.20,Default,,0,0,0,,First cue\n"
        b"Dialogue: 0,0:00:00.23,0:00:00.30,Default,,0,0,0,,Second cue\n")
    out = str(tmp_path / "o.mkv")
    j = Job(path=_y4m(tmp_path), file=out, mux="mkv", quality=30.0)
    j.subtitles = [SubtitleJobTrack(track=-1, import_file=str(p),
                                    import_format="SSA", language="eng")]
    work.do_job(j)
    d = MKVDemuxer(out)
    texts = [pkt.data for trk, pkt in d.packets()
             if d.tracks[trk].kind == "subtitle"]
    joined = b"|".join(texts)
    assert b"First cue" in joined and b"Second cue" in joined


def test_instream_tx3g_to_mkv_and_burn(tmp_path, monkeypatch):
    """mp4 tx3g subtitle track (dectx3gsub.c role): decoded from the
    source container, copied into an MKV S_TEXT track, and burnable."""
    monkeypatch.setenv("HB_TPU_DISABLE_DEVICE", "1")
    import numpy as np
    from handbrake_tpu import work
    from handbrake_tpu.codecs.h264.encoder import (EncoderConfig,
                                                   H264Encoder)
    from handbrake_tpu.codecs.registry import create_video_decoder
    from handbrake_tpu.job.schema import Job, SubtitleJobTrack
    from handbrake_tpu.mux.mp4 import MP4Writer
    from handbrake_tpu.sources.mkv import MKVDemuxer

    W, H, N = 96, 64, 12
    src_path = str(tmp_path / "txt.mp4")
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=24, gop=N))
    w = MP4Writer(src_path)
    vi = w.add_video_track(codec="h264", width=W, height=H)
    si = w.add_subtitle_track(codec="tx3g")
    for i in range(N):
        y = np.full((H, W), 40, np.uint8)
        u = np.full((H // 2, W // 2), 110, np.uint8)
        v = np.full((H // 2, W // 2), 128, np.uint8)
        w.write_sample(vi, enc.encode_frame(y, u, v), duration=3003,
                       sync=(i == 0), annexb=True)
    cue = "Hello tx3g".encode("utf-8")
    w.write_sample(si, b"\x00\x00", duration=2 * 3003)   # empty lead-in
    w.write_sample(si, len(cue).to_bytes(2, "big") + cue,
                   duration=6 * 3003)
    w.write_sample(si, b"\x00\x00", duration=4 * 3003)
    w.finalize()

    # copy path: tx3g → MKV S_TEXT
    out = str(tmp_path / "copy.mkv")
    j = Job(path=src_path, file=out, mux="mkv", quality=24.0)
    j.subtitles = [SubtitleJobTrack(track=0, language="eng")]
    stats = work.do_job(j)
    assert not stats.get("error"), stats
    d = MKVDemuxer(out)
    texts = [p.data for trk, p in d.packets()
             if d.tracks[trk].kind == "subtitle"]
    assert any(b"Hello tx3g" in t for t in texts), texts

    # burn path: text pixels appear mid-clip
    out2 = str(tmp_path / "burn.mp4")
    j2 = Job(path=src_path, file=out2, mux="mp4", quality=20.0)
    j2.subtitles = [SubtitleJobTrack(track=0, burn=True)]
    stats = work.do_job(j2)
    assert not stats.get("error"), stats
    from handbrake_tpu.sources.probe import open_source
    dd = open_source(out2)
    dec = create_video_decoder("h264", dd.tracks[0].extradata)
    frames = []
    for k in range(dd.n_samples(0)):
        frames.extend(dec.feed(dd.read_sample(0, k)))
    assert len(frames) == N
    def lum(i):
        return float(np.asarray(frames[i].planes[0]).astype(int).max())
    assert lum(5) > lum(0) + 50      # burned text adds bright pixels
