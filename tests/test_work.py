"""End-to-end work orchestrator (do_job analog, work.c:1729): source →
decode → sync → filters → encode → mux, then re-open the output and
verify structure + content.
"""
import math
import os

import numpy as np
import pytest

from handbrake_tpu import work
from handbrake_tpu.codecs.registry import create_video_decoder
from handbrake_tpu.job import schema as S
from handbrake_tpu.job.schema import FilterSpec, Job, RangeSpec
from handbrake_tpu.sources.mp4 import MP4Demuxer
from handbrake_tpu.sources.mkv import MKVDemuxer

W, H, N = 64, 48, 12
FPS = (30000, 1001)


@pytest.fixture(scope="module")
def y4m_src(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("work") / "in.y4m")
    base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256).astype(
        np.uint8)
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{W} H{H} F{FPS[0]}:{FPS[1]} Ip A1:1 C420\n"
                .encode())
        for i in range(N):
            f.write(b"FRAME\n")
            f.write(np.roll(base, i, axis=1).tobytes())
            f.write(bytes([110 + i]) * (W // 2 * H // 2))
            f.write(bytes([60]) * (W // 2 * H // 2))
    return path


@pytest.fixture(autouse=True)
def host_encoder(monkeypatch):
    # unit tests exercise the host entropy path; device analysis is
    # covered by the bench/entry compile checks
    monkeypatch.setenv("HB_TPU_DISABLE_DEVICE", "1")


def test_do_job_mp4(y4m_src, tmp_path):
    out = str(tmp_path / "out.mp4")
    j = Job(path=y4m_src, file=out, mux="mp4", quality=28.0)
    stats = work.do_job(j)
    assert stats["frames_in"] == N
    assert stats["frames_out"] == N
    d = MP4Demuxer(out)
    assert d.tracks[0].codec == "h264"
    assert (d.tracks[0].width, d.tracks[0].height) == (W, H)
    assert d.n_samples(0) == N
    dec = create_video_decoder("h264", d.tracks[0].extradata)
    frames = []
    for _, b in d.packets():
        frames.extend(dec.feed(b))
    assert len(frames) == N
    # quality sanity: qp 28 on synthetic gradient should be close
    base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256).astype(
        np.uint8)
    err = np.abs(np.asarray(frames[0].planes[0]).astype(int)
                 - base.astype(int)).mean()
    assert err < 12.0
    d.close()


def test_do_job_scaled_mkv(y4m_src, tmp_path):
    out = str(tmp_path / "out.mkv")
    j = Job(path=y4m_src, file=out, mux="mkv", quality=28.0)
    j.filters = [FilterSpec(S.FILTER_CROP_SCALE,
                            {"width": 32, "height": 24})]
    stats = work.do_job(j)
    assert stats["frames_out"] == N
    assert (stats["width"], stats["height"]) == (32, 24)
    d = MKVDemuxer(out)
    assert (d.tracks[0].width, d.tracks[0].height) == (32, 24)
    dec = create_video_decoder("h264", d.tracks[0].extradata)
    frames = []
    for _, b in d.packets():
        frames.extend(dec.feed(b))
    assert len(frames) == N
    assert np.asarray(frames[0].planes[0]).shape == (24, 32)
    d.close()


def test_do_job_hevc_mp4(y4m_src, tmp_path):
    """HEVC encode path end-to-end: hvc1 track + hvcC, decodable by our
    own HEVC decoder (2nd oracle: FFmpeg conformance in test_hevc_codec)."""
    out = str(tmp_path / "out_hevc.mp4")
    j = Job(path=y4m_src, file=out, mux="mp4", quality=30.0,
            vcodec="hevc_tpu")
    stats = work.do_job(j)
    assert stats["frames_out"] == N
    d = MP4Demuxer(out)
    assert d.tracks[0].codec == "hevc"
    assert (d.tracks[0].width, d.tracks[0].height) == (W, H)
    assert d.tracks[0].extradata[:1] == b"\x01"   # hvcC version
    dec = create_video_decoder("hevc", d.tracks[0].extradata)
    frames = []
    for _, b in d.packets():
        frames.extend(dec.feed(b))
    assert len(frames) == N
    base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256).astype(
        np.uint8)
    err = np.abs(np.asarray(frames[0].planes[0]).astype(int)
                 - base.astype(int)).mean()
    assert err < 12.0
    d.close()


def test_do_job_hevc_mkv(y4m_src, tmp_path):
    out = str(tmp_path / "out_hevc.mkv")
    j = Job(path=y4m_src, file=out, mux="mkv", quality=30.0, vcodec="x265")
    stats = work.do_job(j)
    assert stats["frames_out"] == N
    d = MKVDemuxer(out)
    assert d.tracks[0].codec == "hevc"
    dec = create_video_decoder("hevc", d.tracks[0].extradata)
    frames = []
    for _, b in d.packets():
        frames.extend(dec.feed(b))
    assert len(frames) == N
    d.close()


def test_do_job_frame_range(y4m_src, tmp_path):
    out = str(tmp_path / "rng.mp4")
    j = Job(path=y4m_src, file=out, mux="mp4", quality=28.0,
            range=RangeSpec(type="frame", start=1, end=6))
    stats = work.do_job(j)
    assert stats["frames_out"] == 6
    d = MP4Demuxer(out)
    assert d.n_samples(0) == 6
    d.close()


def test_do_job_transcode_mp4_to_mp4(y4m_src, tmp_path):
    """Second generation: transcode our own mp4 output (decode path)."""
    first = str(tmp_path / "gen1.mp4")
    work.do_job(Job(path=y4m_src, file=first, mux="mp4", quality=24.0))
    out = str(tmp_path / "gen2.mp4")
    stats = work.do_job(Job(path=first, file=out, mux="mp4", quality=30.0))
    assert stats["frames_in"] == N
    assert stats["frames_out"] == N
    d = MP4Demuxer(out)
    assert d.n_samples(0) == N
    d.close()


def test_job_json_roundtrip_drives_work(y4m_src, tmp_path):
    """hb_add_json path: job dict → Job → run."""
    out = str(tmp_path / "json.mp4")
    jd = {
        "Source": {"Path": y4m_src, "Title": 1,
                   "Range": {"Type": "frame", "Start": 1, "End": 4}},
        "Destination": {"Mux": "mp4", "File": out},
        "Video": {"Encoder": "h264_tpu", "Quality": 30.0},
        "Filters": {"FilterList": [
            {"ID": S.FILTER_CROP_SCALE,
             "Settings": {"width": 32, "height": 32}}]},
    }
    j = Job.from_json(jd)
    stats = work.do_job(j)
    assert stats["frames_out"] == 4
    assert stats["width"] == 32


def test_do_job_with_audio_flac(tmp_path):
    """A/V source (pcm in mp4) → H.264 + FLAC, audio bit-exact."""
    from handbrake_tpu.audio.flac import FlacDecoder
    from handbrake_tpu.codecs.h264.encoder import EncoderConfig, H264Encoder
    from handbrake_tpu.job.schema import AudioJobTrack
    from handbrake_tpu.mux.mp4 import MP4Writer

    src_path = str(tmp_path / "av.mp4")
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=28, gop=6))
    w = MP4Writer(src_path)
    vi = w.add_video_track(codec="h264", width=W, height=H)
    ai = w.add_audio_track(codec="pcm_s16le", sample_rate=48000, channels=2)
    base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256).astype(
        np.uint8)
    rng2 = np.random.default_rng(3)
    t = np.arange(1600) / 48000.0
    audio = (0.4 * np.sin(2 * np.pi * 440 * t)
             + 0.02 * rng2.standard_normal(1600))
    audio16 = np.clip(np.stack([audio, audio], 1) * 32767,
                      -32768, 32767).astype(np.int16)
    for i in range(N):
        y = np.roll(base, i, axis=1)
        u = np.full((H // 2, W // 2), 110, np.uint8)
        v = np.full((H // 2, W // 2), 60, np.uint8)
        w.write_sample(vi, enc.encode_frame(y, u, v), duration=3003,
                       sync=(i % 6 == 0), annexb=True)
        w.write_sample(ai, audio16.astype("<i2").tobytes(), duration=1600)
    w.finalize()

    out = str(tmp_path / "av_out.mkv")
    j = Job(path=src_path, file=out, mux="mkv", quality=28.0)
    j.audio = [AudioJobTrack(track=0, encoder="flac", mixdown="stereo")]
    stats = work.do_job(j)
    assert stats["frames_out"] == N

    d = MKVDemuxer(out)
    kinds = [(t.kind, t.codec) for t in d.tracks]
    assert ("audio", "flac") in kinds
    atrk = kinds.index(("audio", "flac"))
    frames = [b.data for trk, b in d.packets() if trk == atrk]
    assert frames
    stream = d.tracks[atrk].extradata + b"".join(frames)
    dec = FlacDecoder(stream)
    got = dec.decode_all()
    ref = np.tile(audio16.astype(np.int32), (N, 1))
    # float32 path in the chain: ±1 LSB vs the int source
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() <= 1
    d.close()


def test_do_job_hevc_main10(y4m_src, tmp_path):
    """BASELINE config-3 shape: 10-bit HEVC encode from an 8-bit source
    (FORMAT-filter range scaling), decodable by our own decoder."""
    out = str(tmp_path / "out10.mkv")
    j = Job(path=y4m_src, file=out, mux="mkv", quality=30.0,
            vcodec="hevc_tpu")
    j.encoder_profile = "main10"
    stats = work.do_job(j)
    assert stats["frames_out"] == N
    d = MKVDemuxer(out)
    assert d.tracks[0].codec == "hevc"
    vdec = create_video_decoder("hevc", d.tracks[0].extradata)
    frames = []
    for trk, pkt in d.packets():
        if d.tracks[trk].kind == "video":
            frames.extend(f.planes for f in vdec.feed(pkt))
    assert vdec.dec.sps.bit_depth == 10
    assert len(frames) == N
    assert frames[0][0].dtype == np.uint16
    # range-scaled content: mean around 8-bit source mean << 2
    base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256)
    assert abs(float(frames[0][0].mean()) - base.mean() * 4) < 40


def test_pipeline_backpressure():
    """Bounded FIFOs stall fast producers (hb_fifo_push_wait semantics):
    a slow consumer must cap the queue at capacity — the reader can never
    run ahead and buffer the whole file."""
    import time
    from handbrake_tpu.core.buffer import Buffer
    from handbrake_tpu.core.pipeline import Pipeline, WorkObject

    N_BUFS, CAP = 64, 4
    seen = []
    max_depth = [0]

    class Producer(WorkObject):
        name = "producer"

        def generate(self):
            for i in range(N_BUFS):
                yield Buffer(pts=i)
            yield Buffer.eof()

    class SlowConsumer(WorkObject):
        name = "consumer"

        def work(self, buf):
            max_depth[0] = max(max_depth[0], len(self.fifo_in) + 1)
            if not buf.is_eof():
                time.sleep(0.002)
                seen.append(buf.pts)
            return []

    pl = Pipeline()
    f = pl.make_fifo(CAP, "bp")
    p = Producer()
    p.fifo_out = f
    c = SlowConsumer()
    c.fifo_in = f
    pl.add_work(p)
    pl.add_work(c)
    pl.run()
    assert pl.error is None
    assert seen == list(range(N_BUFS))
    assert max_depth[0] <= CAP + 1, max_depth[0]


def test_do_job_stage_threads_used(y4m_src, tmp_path, monkeypatch):
    """do_job runs on the threaded substrate (work.c:2242 analog)."""
    from handbrake_tpu.core import pipeline as pl_mod
    ran = []
    orig = pl_mod.Pipeline.run

    def spy(self, *a, **k):
        ran.append(len(self.threads))
        return orig(self, *a, **k)
    monkeypatch.setattr(pl_mod.Pipeline, "run", spy)
    out = str(tmp_path / "bp.mp4")
    work.do_job(Job(path=y4m_src, file=out, mux="mp4", quality=30.0))
    assert ran and ran[0] == 4   # reader, decode+sync, filter+encode, mux


def test_flac_input_decodes_and_aac_degrades_loudly(tmp_path):
    """gen1: pcm→FLAC in mkv; gen2: FLAC input decoded (FlacPacketDecoder)
    and a requested 'aac' track degrades to FLAC with a loud log — never
    silently to raw PCM (VERDICT round-1 item)."""
    from handbrake_tpu.audio.flac import FlacDecoder, FLAC_MARKER
    from handbrake_tpu.codecs.h264.encoder import EncoderConfig, H264Encoder
    from handbrake_tpu.job.schema import AudioJobTrack
    from handbrake_tpu.mux.mp4 import MP4Writer

    # A/V source with PCM audio
    src_path = str(tmp_path / "src.mp4")
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=30, gop=6))
    w = MP4Writer(src_path)
    vi = w.add_video_track(codec="h264", width=W, height=H)
    ai = w.add_audio_track(codec="pcm_s16le", sample_rate=48000, channels=2)
    base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256).astype(
        np.uint8)
    t = np.arange(1600) / 48000.0
    tone = np.clip(np.stack([np.sin(2 * np.pi * 440 * t)] * 2, 1) * 12000,
                   -32768, 32767).astype(np.int16)
    for i in range(N):
        u = np.full((H // 2, W // 2), 110, np.uint8)
        v = np.full((H // 2, W // 2), 60, np.uint8)
        w.write_sample(vi, enc.encode_frame(np.roll(base, i, 1), u, v),
                       duration=3003, sync=(i % 6 == 0), annexb=True)
        w.write_sample(ai, tone.astype("<i2").tobytes(), duration=1600)
    w.finalize()

    gen1 = str(tmp_path / "gen1.mkv")
    j = Job(path=src_path, file=gen1, mux="mkv", quality=30.0)
    j.audio = [AudioJobTrack(track=0, encoder="flac", mixdown="stereo")]
    work.do_job(j)

    # gen2: FLAC input; request aac → native AAC-LC encode (no degrade)
    gen2 = str(tmp_path / "gen2.mkv")
    j2 = Job(path=gen1, file=gen2, mux="mkv", quality=30.0)
    j2.audio = [AudioJobTrack(track=0, encoder="aac", mixdown="stereo")]
    stats = work.do_job(j2)
    assert stats["frames_out"] == N
    d = MKVDemuxer(gen2)
    at = [i for i, tt in enumerate(d.tracks) if tt.kind == "audio"]
    assert len(at) == 1
    assert d.tracks[at[0]].codec == "aac"
    asc = d.tracks[at[0]].extradata
    assert len(asc) >= 2 and (asc[0] >> 3) == 2       # AAC-LC config
    aus = [p.data for trk, p in d.packets() if trk == at[0]]
    assert aus and all(a for a in aus)
    # the 440 Hz tone must survive two generations (libavcodec decode)
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(__file__))
    try:
        import ffaudio
        ok = ffaudio.available()
    except Exception:
        ok = False
    if ok:
        mp3 = ('/opt/venv/lib/python3.12/site-packages/pygame/examples/'
               'data/house_lo.mp3')
        if _os.path.exists(mp3):
            ffaudio.FFAudioDecoder("mp3").decode_packets(
                [open(mp3, 'rb').read()])
        from handbrake_tpu.audio.aac import AACEncoder
        hdr = AACEncoder(48000, 2)
        adts = b"".join(hdr.adts_header(len(a)) + a for a in aus)
        pcm = ffaudio.FFAudioDecoder("aac").decode_packets([adts])
        seg = pcm[2048:6048, 0]
        f = np.fft.rfft(seg * np.hanning(len(seg)))
        peak_hz = np.argmax(np.abs(f)) * 48000 / len(seg)
        assert abs(peak_hz - 440) < 20, peak_hz
    d.close()


def test_hdr_metadata_end_to_end(tmp_path):
    """HDR10 static metadata (mastering SEI 137 + CLL SEI 144) and a DoVi
    RPU NAL survive a transcode byte-identically: parsed from the source
    ES, carried as side_data, re-emitted as SEI/RPU NALs in the output
    stream, and written as mdcv/clli sample-entry boxes in the mp4
    (hdr10plus.c:133 / rpu.c:245 / muxavformat.c roles)."""
    import numpy as np
    from handbrake_tpu.codecs.hdr import (build_sei_rbsp,
                                          extract_hdr_side_data)
    from handbrake_tpu.codecs.hevc.encoder import (EncoderConfig,
                                                   HEVCEncoder)
    from handbrake_tpu.codecs.hevc.syntax import nal_unit
    from handbrake_tpu.job.schema import Job
    from handbrake_tpu.work import do_job

    W, H, N = 64, 48, 4
    mastering = bytes(range(10, 34))          # 24 distinctive bytes
    cll = bytes([0x03, 0xE8, 0x01, 0x90])     # 1000 / 400 nits
    rpu = b"\x19\x08" + bytes(range(40))      # opaque RPU payload
    sd_in = {"mastering_display": mastering, "content_light": cll}

    enc = HEVCEncoder(EncoderConfig(width=W, height=H, qp=30, gop=N))
    rng = np.random.default_rng(0)
    es = b""
    for i in range(N):
        au = enc.encode_frame(rng.integers(0, 255, (H, W), np.uint8),
                              np.full((H // 2, W // 2), 100, np.uint8),
                              np.full((H // 2, W // 2), 150, np.uint8))
        pre = b""
        if i == 0:
            pre += nal_unit(39, build_sei_rbsp(sd_in))   # prefix SEI
        if i == 1:
            pre += nal_unit(62, rpu)                     # DoVi RPU
        es += pre + au
    src = tmp_path / "in.hevc"
    src.write_bytes(es)

    out = tmp_path / "out.mp4"
    job = Job(path=str(src), file=str(out), mux="mp4", vcodec="x265",
              quality=30.0)
    res = do_job(job)
    assert not res.get("error"), res
    data = out.read_bytes()
    # mp4 boxes carry the static metadata byte-identically
    im = data.find(b"mdcv")
    ic = data.find(b"clli")
    assert im > 0 and data[im + 4:im + 28] == mastering
    assert ic > 0 and data[ic + 4:ic + 8] == cll
    # the output HEVC stream re-emits the SEI + RPU
    from handbrake_tpu.sources.probe import open_source
    d = open_source(str(out))
    oes = b""
    for trk, b in ((t, bb) for t, bb in
                   ((0, d.read_sample(0, k)) for k in
                    range(d.n_samples(0)))):
        oes += b.data
    sd_out = extract_hdr_side_data(oes, "hevc")
    assert sd_out.get("mastering_display") == mastering
    assert sd_out.get("content_light") == cll
    assert sd_out.get("dovi_rpu") == rpu


def test_do_job_aac_to_aac_reencode(tmp_path):
    """AAC source in mp4 → decode (audio/aacdec.py) → re-encode AAC:
    HandBrake's default audio operation, previously passthrough-only
    (decavcodec.c:367 role).  The output AAC must decode (libavcodec) to
    PCM close to the original tone."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    import ffaudio
    if not ffaudio.available():
        pytest.skip("libavcodec oracle unavailable")
    from handbrake_tpu.audio.aac import AACEncoder
    from handbrake_tpu.codecs.h264.encoder import EncoderConfig, H264Encoder
    from handbrake_tpu.job.schema import AudioJobTrack
    from handbrake_tpu.mux.mp4 import MP4Writer
    from handbrake_tpu.sources.probe import open_source

    sr = 48000
    src_path = str(tmp_path / "av_aac.mp4")
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=28, gop=6))
    aenc = AACEncoder(sr, 2, quality=118)
    w = MP4Writer(src_path)
    vi = w.add_video_track(codec="h264", width=W, height=H)
    ai = w.add_audio_track(codec="aac", sample_rate=sr, channels=2,
                           extradata=aenc.audio_specific_config())
    base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256).astype(
        np.uint8)
    n_aud = (N * 3003 * sr // 90000 // 1024 + 2) * 1024
    t = np.arange(n_aud) / sr
    tone = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    pcm = np.stack([tone, tone * 0.7], 1)
    aus = aenc.encode(pcm) + aenc.flush()
    for i in range(N):
        y = np.roll(base, i, axis=1)
        u = np.full((H // 2, W // 2), 110, np.uint8)
        v = np.full((H // 2, W // 2), 60, np.uint8)
        w.write_sample(vi, enc.encode_frame(y, u, v), duration=3003,
                       sync=(i % 6 == 0), annexb=True)
    for au in aus:
        w.write_sample(ai, au, duration=1024)
    w.finalize()

    out = str(tmp_path / "aac_out.mp4")
    j = Job(path=src_path, file=out, mux="mp4", quality=28.0)
    j.audio = [AudioJobTrack(track=0, encoder="aac", mixdown="stereo",
                             bitrate=160)]
    stats = work.do_job(j)
    assert not stats.get("error"), stats
    d = open_source(out)
    atrk = next(i for i, ti in enumerate(d.tracks) if ti.kind == "audio")
    assert d.tracks[atrk].codec == "aac"
    pkts = [d.read_sample(atrk, k).data for k in range(d.n_samples(atrk))]
    assert len(pkts) > 5
    adts = [ffaudio.adts_wrap([p], sample_rate=sr, channels=2)
            for p in pkts]
    got = np.asarray(ffaudio.FFAudioDecoder("aac").decode_packets(adts),
                     np.float64)
    # tone survives the decode→re-encode round trip: correlate vs a 440Hz
    # reference (phase-free via quadrature projection) over the interior
    # (both codecs pad/prime the edges)
    g = got[4096:len(got) - 4096, 0]
    tt = np.arange(len(g)) / sr
    c = np.sin(2 * np.pi * 440 * tt)
    s = np.cos(2 * np.pi * 440 * tt)
    amp = 2 * math.hypot(float(g @ c) / len(g), float(g @ s) / len(g))
    assert 0.3 < amp < 0.5, amp
    resid = g - (2 * float(g @ c) / len(g) * c
                 + 2 * float(g @ s) / len(g) * s)
    snr = 10 * np.log10((amp ** 2 / 2) / max(1e-12, float(
        (resid ** 2).mean())))
    assert snr > 25, snr


def test_do_job_gop_parallel(tmp_path, y4m_src):
    """Job.gop_parallel shards the encode into keyframe-aligned GOP
    chunks over the device mesh inside do_job itself (VERDICT r3 #5:
    the scale-out path reachable from a job JSON / --gop-parallel)."""
    import jax
    from handbrake_tpu.job.schema import Job
    from handbrake_tpu.sources.probe import open_source

    out = str(tmp_path / "gp.mp4")
    j = Job(path=y4m_src, file=out, mux="mp4", vcodec="h264",
            quality=28.0, gop_parallel=4)
    # round-trips through the JSON schema (the compatibility surface)
    j2 = Job.from_json(j.to_json())
    assert j2.gop_parallel == 4
    stats = work.do_job(j)
    assert not stats.get("error"), stats
    assert stats["frames_out"] == N

    d = open_source(out)
    n_sync = sum(1 for k in range(d.n_samples(0))
                 if d.read_sample(0, k).frametype)
    G = min(4, len(jax.devices()), N)
    assert n_sync == G, (n_sync, G)   # one IDR per gop shard
    # decodes fine end to end
    es = b""
    for k in range(d.n_samples(0)):
        es += d.read_sample(0, k).data
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(__file__))
    import ffdec
    if ffdec.available():
        ed = d.tracks[0].extradata
        hdr = b""
        off = 5
        nsps = ed[off] & 0x1F
        off += 1
        for _ in range(nsps):
            ln = int.from_bytes(ed[off:off + 2], "big")
            off += 2
            hdr += b"\x00\x00\x00\x01" + ed[off:off + ln]
            off += ln
        npps = ed[off]
        off += 1
        for _ in range(npps):
            ln = int.from_bytes(ed[off:off + 2], "big")
            off += 2
            hdr += b"\x00\x00\x00\x01" + ed[off:off + ln]
            off += ln
        dec = ffdec.decode_yuv(hdr + es, "h264")
        assert len(dec) == N


def test_scan_retry_ladder(tmp_path):
    """A corrupted region at a preview seek point must not lose the
    preview: the scan retries with a fresh decoder and reads past the
    damage (scan.c:298-313 'try harder' analog)."""
    from handbrake_tpu.codecs.h264.encoder import EncoderConfig, H264Encoder
    from handbrake_tpu.mux.mp4 import MP4Writer
    from handbrake_tpu.scan import scan_title

    src_path = str(tmp_path / "dmg.mp4")
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=28, gop=4))
    w = MP4Writer(src_path)
    vi = w.add_video_track(codec="h264", width=W, height=H)
    base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256).astype(
        np.uint8)
    for i in range(N):
        au = enc.encode_frame(np.roll(base, i, axis=1),
                              np.full((H // 2, W // 2), 110, np.uint8),
                              np.full((H // 2, W // 2), 60, np.uint8))
        if i == 5:
            au = au[:len(au) // 2] + b"\xde\xad" * 8   # corrupt mid-GOP
        w.write_sample(vi, au, duration=3003, sync=(i % 4 == 0),
                       annexb=True)
    w.finalize()
    t = scan_title(src_path, preview_count=4)
    assert t is not None
    assert t.width == W and t.height == H


def test_bframes_job_end_to_end(tmp_path, y4m_src):
    """--bframes routes H.264 through the IB..BP walker (encoder_b.py):
    the mp4 carries decode-order samples with ctts offsets, libavcodec
    reorders them back to the source display order (VERDICT r4 #3 —
    B-frames reachable from a real job)."""
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(__file__))
    import ffdec
    out = str(tmp_path / "b.mp4")
    j = Job(path=y4m_src, file=out, mux="mp4", vcodec="h264",
            quality=28.0)
    j.bframes = 2
    stats = work.do_job(j)
    assert not stats.get("error"), stats
    n = stats["frames_out"]
    assert n == stats["frames_in"] and n > 4
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
    btypes = set()
    for i in range(s.n_samples(0)):
        data = bytes(s.read_sample(0, i).data)
        stream += data
        btypes.add(data[4] & 0x1F)
    dec = ffdec.decode_yuv(stream, "h264")
    assert len(dec) == n, (len(dec), n)
    # the stream genuinely contains non-reference B slices (nal_ref_idc
    # 0 slices exist)
    assert any((b & 0x1F) in (1,) for b in btypes)
    # display order restored: consecutive decoded frames must differ
    # from each other but match the y4m source ordering (rough check:
    # frame 1 must be closer to source frame 1 than to source frame 4)
    import numpy as np
    from handbrake_tpu.sources.probe import open_source as osrc
    ys = []
    src = osrc(y4m_src)
    for trk, p in src.packets():
        if src.tracks[trk].kind == "video" and p.planes is not None:
            ys.append(np.asarray(p.planes[0]))
    d11 = np.mean(np.abs(dec[1][0].astype(int) - ys[1].astype(int)))
    d14 = np.mean(np.abs(dec[1][0].astype(int) - ys[min(4, len(ys) - 1)]
                         .astype(int)))
    assert d11 < d14, (d11, d14)


def test_checkpoint_resume_gop_boundary(tmp_path, y4m_src):
    """GOP-boundary checkpoint/resume (SURVEY §5, VERDICT r4 #10): a job
    killed mid-encode resumes from <dest>.ckpt at the last complete GOP
    and the video sample sequence matches the uninterrupted run."""
    import os as _os
    from handbrake_tpu.sources.mp4 import MP4Demuxer

    # reference: uninterrupted run (gop = 4 frames via encoder options)
    ref = str(tmp_path / "ref.mp4")
    j = Job(path=y4m_src, file=ref, mux="mp4", vcodec="h264",
            quality=30.0, encoder_options="keyint=4")
    work.do_job(j)

    # checkpointed run — complete, then simulate a kill by truncating
    # the journal to its prefix and deleting the output
    out = str(tmp_path / "ck.mp4")
    j2 = Job(path=y4m_src, file=out, mux="mp4", vcodec="h264",
             quality=30.0, encoder_options="keyint=4")
    j2.checkpoint = True
    work.do_job(j2)
    assert not _os.path.exists(out + ".ckpt")   # complete → removed

    # run again, capture the journal mid-way this time: monkey-free
    # approach — rerun with checkpoint and STOP the journal cleanup by
    # killing after first GOP via a small gop: instead, rebuild a
    # truncated journal from a fresh run by interrupting finalize
    from handbrake_tpu import work as workmod
    j3 = Job(path=y4m_src, file=out, mux="mp4", vcodec="h264",
             quality=30.0, encoder_options="keyint=4")
    j3.checkpoint = True
    orig_close = workmod._CkptJournal.close

    def no_cleanup(self, complete=False):
        self.f.flush()
        self.f.close()          # keep the journal file (simulated kill)
    workmod._CkptJournal.close = no_cleanup
    try:
        work.do_job(j3)
    finally:
        workmod._CkptJournal.close = orig_close
    assert _os.path.exists(out + ".ckpt")
    # truncate to the FIRST complete GOP (find the first 'gop' marker)
    import pickle
    data = open(out + ".ckpt", "rb").read()
    i = 0
    cut = None
    while i + 4 <= len(data):
        ln = int.from_bytes(data[i:i + 4], "big")
        rec = pickle.loads(data[i + 4:i + 4 + ln])
        i += 4 + ln
        if rec[0] == "gop":
            cut = i
            break
    assert cut is not None
    with open(out + ".ckpt", "wb") as f:
        f.write(data[:cut])
    _os.unlink(out)

    # resume: replays the first GOP, encodes the rest
    j4 = Job(path=y4m_src, file=out, mux="mp4", vcodec="h264",
             quality=30.0, encoder_options="keyint=4")
    j4.resume = True
    stats = work.do_job(j4)
    assert not stats.get("error"), stats

    dref = MP4Demuxer(ref)
    dout = MP4Demuxer(out)
    assert dout.n_samples(0) == dref.n_samples(0)
    same = sum(1 for k in range(dref.n_samples(0))
               if bytes(dref.read_sample(0, k).data)
               == bytes(dout.read_sample(0, k).data))
    # every sample byte-identical (stateless filters, fixed qp)
    assert same == dref.n_samples(0), (same, dref.n_samples(0))
    dref.close()
    dout.close()
