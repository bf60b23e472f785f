"""AC-3 (A/52) decoder — conformance vs libavcodec's ac3 codec across
coding modes, and the DVD path end-to-end (AC-3 in private-stream-1 →
decode → AAC), the decavcodec.c AC-3 personality role."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import ffaudio  # noqa: E402
import ffvideo  # noqa: E402

from handbrake_tpu.audio.ac3dec import Ac3Decoder  # noqa: E402


def _probe():
    """Locate ffaudio's AVFrame offsets with a known-good stream."""
    from handbrake_tpu.audio.aac import AACEncoder
    t0 = np.arange(2048) / 48000
    pe = AACEncoder(48000, 2, quality=120)
    pk = pe.encode(np.stack([np.sin(2 * np.pi * 440 * t0)] * 2,
                            1).astype(np.float32) * 0.3) + pe.flush()
    ffaudio.FFAudioDecoder("aac").decode_packets(
        [ffaudio.adts_wrap([p], sample_rate=48000, channels=2)
         for p in pk])


def _signal(sr, ch, n, seed=2):
    t = np.arange(n) / sr
    rng = np.random.default_rng(seed)
    chans = []
    for c in range(ch):
        # channel 3 of a 5.1 layout is the LFE: band-limited by design
        # (7 transform bins), so give it a proper low-frequency tone
        f = 60.0 if (ch == 6 and c == 3) else 220 * (c + 1.3)
        chans.append(0.3 * np.sin(2 * np.pi * f * t)
                     + (0.03 * rng.standard_normal(n)
                        if f > 100 else 0.0))
    return np.stack(chans, 1).astype(np.float32)


def _snr(got, want):
    d = got - want
    return 10 * np.log10((want ** 2).mean() / max((d ** 2).mean(), 1e-20))


@pytest.mark.parametrize("sr,ch,br", [
    (48000, 2, 192000),
    (48000, 1, 96000),
    (44100, 2, 192000),
    (32000, 2, 128000),
    (48000, 6, 384000),
])
def test_ac3_decoder_conformance(sr, ch, br):
    """Decode libavcodec ac3 streams.  bap==0 mantissas are decoder
    dither (implementation-defined noise we substitute with silence), so
    the bar is: high SNR vs the oracle, and at least as close to the
    ORIGINAL pcm as the oracle's own decode is."""
    if not ffaudio.available():
        pytest.skip("libavcodec oracle unavailable")
    _probe()
    n = 1536 * 6
    sig = _signal(sr, ch, n)
    enc = ffaudio.FFAudioEncoder("ac3", sample_rate=sr, channels=ch,
                                 bit_rate=br)
    pkts = enc.encode(sig)
    ref = ffaudio.FFAudioDecoder("ac3").decode_packets(pkts)
    ref = np.concatenate(ref, 0) if isinstance(ref, list) else ref
    dec = Ac3Decoder()
    ours = dec.decode(b"".join(pkts))
    assert dec.sample_rate == sr
    o = np.concatenate([f.T for f in ours], 0)
    assert o.shape[1] == ref.shape[1]
    m = min(len(o), len(ref))
    assert m >= 1536 * 5
    assert _snr(o[:m], ref[:m]) > 22.0
    # both decodes vs the encoder input (256-sample transform latency)
    lag = 256
    s = sig[:m - lag]
    snr_ref = _snr(ref[lag:lag + len(s)], s)
    snr_ours = _snr(o[lag:lag + len(s)], s)
    assert snr_ours > snr_ref - 1.0, (snr_ours, snr_ref)


def test_ac3_split_packets_and_resync():
    """Frames split across feeds decode identically; garbage before the
    first syncword is skipped."""
    if not ffaudio.available():
        pytest.skip("libavcodec oracle unavailable")
    _probe()
    sig = _signal(48000, 2, 1536 * 4)
    enc = ffaudio.FFAudioEncoder("ac3", sample_rate=48000, channels=2,
                                 bit_rate=192000)
    stream = b"".join(enc.encode(sig))
    whole = np.concatenate([f.T for f in
                            Ac3Decoder().decode(stream)], 0)
    dec = Ac3Decoder()
    chunks = []
    data = b"\x00\x0b\x13\x37" + stream      # leading garbage
    for i in range(0, len(data), 301):
        chunks += dec.feed(data[i:i + 301])
    split = np.concatenate([f.T for f in chunks], 0)
    assert split.shape == whole.shape
    assert np.array_equal(split, whole)


def test_vob_ac3_transcode_to_aac(tmp_path):
    """VOB with MPEG-2 video + AC-3 (substream 0x80) → do_job → mp4 with
    AAC: the standard DVD audio path decodes natively end-to-end."""
    if not (ffaudio.available() and ffvideo.available()):
        pytest.skip("libavcodec oracle unavailable")
    _probe()
    from handbrake_tpu.job.schema import Job, AudioJobTrack
    from handbrake_tpu.sources.probe import open_source
    from handbrake_tpu import work
    from handbrake_tpu.audio.aacdec import AACDecoder

    W, H, n = 96, 64, 10
    import cv2
    rng = np.random.default_rng(3)
    base = cv2.GaussianBlur(
        rng.integers(20, 230, (H + 64, W + 64)).astype(np.uint8),
        (0, 0), 1.6)
    frames = [(np.ascontiguousarray(base[t:t + H, 2 * t:2 * t + W]),
               np.full((H // 2, W // 2), 110, np.uint8),
               np.full((H // 2, W // 2), 140, np.uint8))
              for t in range(n)]
    venc = ffvideo.FFVideoEncoder("mpeg2video", W, H, 30,
                                  bit_rate=1_000_000, opts={"bf": 0})
    vpkts = venc.encode(frames)

    sr = 48000
    dur_s = n / 30.0
    ns = int(sr * dur_s) + 1536
    t = np.arange(ns) / sr
    tone = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    aenc = ffaudio.FFAudioEncoder("ac3", sample_rate=sr, channels=2,
                                  bit_rate=192000)
    apkts = aenc.encode(np.stack([tone, tone * 0.5], 1))

    # program stream: video PES (0xE0) + AC-3 in private stream 1 with
    # the 4-byte DVD substream preamble (id, frame count, 1st AU ptr)
    out = bytearray(b"\x00\x00\x01\xba"
                    + bytes([0x44, 0, 4, 0, 4, 1, 0, 1, 0x89, 0xF8]))
    apts = 0
    ak = 0
    vpts = 0
    for k, pkt in enumerate(vpkts):
        def pes(sid, p, payload):
            body = bytearray(b"\x80\x80\x05")
            body += bytes([0x21 | ((p >> 29) & 0x0E), (p >> 22) & 0xFF,
                           0x01 | ((p >> 14) & 0xFE), (p >> 7) & 0xFF,
                           0x01 | ((p << 1) & 0xFE)])
            body += payload
            return (b"\x00\x00\x01" + bytes([sid])
                    + len(body).to_bytes(2, "big") + bytes(body))
        out += pes(0xE0, vpts, pkt)
        vpts += 3000
        while ak < len(apkts) and apts <= vpts:
            out += pes(0xBD, apts,
                       bytes([0x80, 1, 0x00, 0x01]) + apkts[ak])
            apts += 1536 * 90000 // sr
            ak += 1
    vob = str(tmp_path / "movie.vob")
    with open(vob, "wb") as f:
        f.write(bytes(out))

    src = open_source(vob)
    kinds = {(ti.kind, ti.codec) for ti in src.tracks}
    src.close()
    assert ("audio", "ac3") in kinds

    mp4 = str(tmp_path / "out.mp4")
    j = Job(path=vob, file=mp4, mux="mp4", vcodec="h264", quality=26.0)
    j.audio = [AudioJobTrack(track=0, encoder="aac", bitrate=128)]
    stats = work.do_job(j)
    assert not stats.get("error"), stats
    assert stats["frames_out"] == n, stats

    d = open_source(mp4)
    ati = [i for i, ti in enumerate(d.tracks) if ti.kind == "audio"]
    assert ati, "no audio track in output"
    adec = AACDecoder(d.tracks[ati[0]].extradata)
    pcm = []
    for k in range(d.n_samples(ati[0])):
        pcm.append(adec.decode_frame(d.read_sample(ati[0], k).data))
    got = np.concatenate(pcm, 0)
    mid = got[2048:len(got) - 2048, 0]
    assert len(mid) > sr // 6
    # 440 Hz tone must dominate the decoded AAC audio
    tt = np.arange(len(mid)) / sr
    c = np.sqrt((mid * np.cos(2 * np.pi * 440 * tt)) ** 2
                + (mid * np.sin(2 * np.pi * 440 * tt)) ** 2).mean()
    amp = np.hypot((mid * np.cos(2 * np.pi * 440 * tt)).mean() * 2,
                   (mid * np.sin(2 * np.pi * 440 * tt)).mean() * 2)
    assert 0.25 < amp < 0.55, amp
    d.close()


# ---------------------------------------------------------------------------
# AC-3 encoder (audio/ac3enc.py — encavcodecaudio.c AC-3 personality)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("sr,ch,br,min_snr", [
    (48000, 2, 192000, 20.0),
    (48000, 1, 96000, 20.0),
    (44100, 2, 192000, 20.0),
    (48000, 6, 448000, 16.0),   # lean toolset: no coupling across 5 ch
])
def test_ac3_encoder_conformance(sr, ch, br, min_snr):
    """Our AC-3 syncframes must decode in libavcodec (the consumer
    ecosystem) AND in our own decoder, to the same PCM."""
    if not ffaudio.available():
        pytest.skip("libavcodec oracle unavailable")
    _probe()
    from handbrake_tpu.audio.ac3enc import Ac3Encoder
    n = 1536 * 6
    sig = _signal(sr, ch, n, seed=7)
    enc = Ac3Encoder(sr, ch, br)
    frames = enc.encode(sig)
    assert len(frames) == 6
    assert all(len(f) == enc.frame_bytes for f in frames)
    ref = ffaudio.FFAudioDecoder("ac3").decode_packets(frames)
    ref = np.concatenate(ref, 0) if isinstance(ref, list) else ref
    assert ref.shape == (n, ch)
    lag = 256                              # MDCT latency
    m = n - lag
    assert _snr(ref[lag:lag + m], sig[:m]) > min_snr
    ours = Ac3Decoder().decode(b"".join(frames))
    o = np.concatenate([f.T for f in ours], 0)
    # no dither flags are set, so the two decodes agree numerically
    assert _snr(o[:n], ref[:n]) > 80.0


def test_do_job_aac_to_ac3(tmp_path):
    """mp4 with AAC tone → do_job -E ac3 → mkv with an A_AC3 track that
    libavcodec decodes back to the tone (DVD/AVR interchange path)."""
    if not ffaudio.available():
        pytest.skip("libavcodec oracle unavailable")
    _probe()
    from handbrake_tpu.audio.aac import AACEncoder
    from handbrake_tpu.codecs.h264.encoder import (EncoderConfig,
                                                   H264Encoder)
    from handbrake_tpu.job.schema import Job, AudioJobTrack
    from handbrake_tpu.mux.mp4 import MP4Writer
    from handbrake_tpu.sources.probe import open_source
    from handbrake_tpu import work

    os.environ["HB_TPU_DISABLE_DEVICE"] = "1"
    sr, W, H, N = 48000, 96, 64, 16
    src_path = str(tmp_path / "src.mp4")
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=28, gop=8))
    aenc = AACEncoder(sr, 2, quality=118)
    w = MP4Writer(src_path)
    vi = w.add_video_track(codec="h264", width=W, height=H)
    ai = w.add_audio_track(codec="aac", sample_rate=sr, channels=2,
                           extradata=aenc.audio_specific_config())
    n_aud = (N * 3003 * sr // 90000 // 1024 + 2) * 1024
    t = np.arange(n_aud) / sr
    tone = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    aus = aenc.encode(np.stack([tone, tone * 0.7], 1)) + aenc.flush()
    base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256).astype(
        np.uint8)
    for i in range(N):
        w.write_sample(vi, enc.encode_frame(
            np.roll(base, i, 1), np.full((H // 2, W // 2), 110, np.uint8),
            np.full((H // 2, W // 2), 60, np.uint8)),
            duration=3003, sync=(i % 8 == 0), annexb=True)
    for au in aus:
        w.write_sample(ai, au, duration=1024)
    w.finalize()

    out = str(tmp_path / "out.mkv")
    j = Job(path=src_path, file=out, mux="mkv", quality=28.0)
    j.audio = [AudioJobTrack(track=0, encoder="ac3", mixdown="stereo",
                             bitrate=192)]
    stats = work.do_job(j)
    assert not stats.get("error"), stats

    d = open_source(out)
    atrk = next(i for i, ti in enumerate(d.tracks)
                if ti.kind == "audio")
    assert d.tracks[atrk].codec == "ac3"
    stream = b"".join(pkt.data for trk, pkt in d.packets()
                      if trk == atrk)
    got = ffaudio.FFAudioDecoder("ac3").decode_packets(
        [stream[i:i + 1920] for i in range(0, len(stream), 1920)])
    got = np.concatenate(got, 0) if isinstance(got, list) else got
    g = got[2048:len(got) - 2048, 0].astype(np.float64)
    assert len(g) > sr // 6
    tt = np.arange(len(g)) / sr
    amp = 2 * np.hypot((g * np.cos(2 * np.pi * 440 * tt)).mean(),
                       (g * np.sin(2 * np.pi * 440 * tt)).mean())
    assert 0.3 < amp < 0.5, amp
    d.close()


def test_eac3_frames_skipped_safely():
    """E-AC-3 syncframes are recognised and sized (bsid 16 framing) so
    they skip cleanly — no garbage output, and AC-3 frames following
    E-AC-3 data in the same stream still decode."""
    if not ffaudio.available():
        pytest.skip("libavcodec oracle unavailable")
    _probe()
    sig = _signal(48000, 2, 1536 * 2)
    enc = ffaudio.FFAudioEncoder("eac3", sample_rate=48000, channels=2,
                                 bit_rate=192000)
    enc.frame_size = 1536
    e_frames = enc.encode(sig)
    a_enc = ffaudio.FFAudioEncoder("ac3", sample_rate=48000, channels=2,
                                   bit_rate=192000)
    a_frames = a_enc.encode(sig)
    dec = Ac3Decoder()
    out = dec.decode(b"".join(e_frames) + b"".join(a_frames))
    # only the AC-3 frames decode; the E-AC-3 ones skip by exact size
    assert len(out) == len(a_frames)
    ref = ffaudio.FFAudioDecoder("ac3").decode_packets(a_frames)
    ref = np.concatenate(ref, 0) if isinstance(ref, list) else ref
    o = np.concatenate([f.T for f in out], 0)
    assert _snr(o[:len(ref)], ref) > 22.0


def test_ac3_passthrough_to_mkv(tmp_path):
    """copy:ac3 keeps the compressed syncframes intact through do_job
    (WORK_PASS role): the MKV A_AC3 track byte-equals the source ES."""
    if not (ffaudio.available() and ffvideo.available()):
        pytest.skip("libavcodec oracle unavailable")
    _probe()
    import cv2
    from handbrake_tpu.job.schema import Job, AudioJobTrack
    from handbrake_tpu.sources.mkv import MKVDemuxer
    from handbrake_tpu import work

    os.environ["HB_TPU_DISABLE_DEVICE"] = "1"
    W, H, n = 96, 64, 10
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
    sr = 48000
    ns = int(sr * n / 30.0) + 1536
    t = np.arange(ns) / sr
    tone = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    apkts = ffaudio.FFAudioEncoder(
        "ac3", sample_rate=sr, channels=2,
        bit_rate=192000).encode(np.stack([tone, tone * 0.5], 1))

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
    apts = ak = vpts = 0
    for pkt in vpkts:
        out += pes(0xE0, vpts, pkt)
        vpts += 3000
        while ak < len(apkts) and apts <= vpts:
            out += pes(0xBD, apts, bytes([0x80, 1, 0x00, 0x01])
                       + apkts[ak])
            apts += 1536 * 90000 // sr
            ak += 1
    vob = str(tmp_path / "pass.vob")
    with open(vob, "wb") as f:
        f.write(bytes(out))

    mkv = str(tmp_path / "pass.mkv")
    j = Job(path=vob, file=mkv, mux="mkv", vcodec="h264", quality=26.0)
    j.audio = [AudioJobTrack(track=0, encoder="copy:ac3")]
    stats = work.do_job(j)
    assert not stats.get("error"), stats

    d = MKVDemuxer(mkv)
    atrk = next(i for i, ti in enumerate(d.tracks)
                if ti.kind == "audio")
    assert d.tracks[atrk].codec == "ac3"
    got = b"".join(p.data for trk, p in d.packets() if trk == atrk)
    src_es = b"".join(apkts[:ak])
    assert got and got in src_es or src_es.startswith(got) \
        or got.startswith(src_es[:len(got)])
    # and it still decodes in the oracle
    ref = ffaudio.FFAudioDecoder("ac3").decode_packets(
        [got[i:i + 1920] for i in range(0, len(got), 1920)])
    ref = np.concatenate(ref, 0) if isinstance(ref, list) else ref
    assert len(ref) >= 1536 * 3


def test_ac3_passthrough_to_mp4_dac3(tmp_path):
    """copy:ac3 into MP4 gets a synthesized dac3 box and the track
    decodes in the oracle."""
    if not (ffaudio.available() and ffvideo.available()):
        pytest.skip("libavcodec oracle unavailable")
    _probe()
    import cv2
    from handbrake_tpu.job.schema import Job, AudioJobTrack
    from handbrake_tpu.sources.probe import open_source
    from handbrake_tpu import work

    os.environ["HB_TPU_DISABLE_DEVICE"] = "1"
    W, H, n = 96, 64, 10
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
    sr = 48000
    ns = int(sr * n / 30.0) + 1536
    t = np.arange(ns) / sr
    tone = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    apkts = ffaudio.FFAudioEncoder(
        "ac3", sample_rate=sr, channels=2,
        bit_rate=192000).encode(np.stack([tone, tone * 0.5], 1))

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
    apts = ak = vpts = 0
    for pkt in vpkts:
        out += pes(0xE0, vpts, pkt)
        vpts += 3000
        while ak < len(apkts) and apts <= vpts:
            out += pes(0xBD, apts, bytes([0x80, 1, 0x00, 0x01])
                       + apkts[ak])
            apts += 1536 * 90000 // sr
            ak += 1
    vob = str(tmp_path / "p.vob")
    with open(vob, "wb") as f:
        f.write(bytes(out))

    mp4 = str(tmp_path / "p.mp4")
    j = Job(path=vob, file=mp4, mux="mp4", vcodec="h264", quality=26.0)
    j.audio = [AudioJobTrack(track=0, encoder="copy:ac3")]
    stats = work.do_job(j)
    assert not stats.get("error"), stats
    with open(mp4, "rb") as f:
        blob = f.read()
    assert b"ac-3" in blob and b"dac3" in blob
    i = blob.find(b"dac3")
    dac3 = blob[i + 4:i + 7]
    assert (dac3[0] >> 6) == 0                  # fscod 48 kHz
    assert ((int.from_bytes(dac3, "big") >> 11) & 7) == 2  # acmod 2/0

    d = open_source(mp4)
    atrk = next(i for i, ti in enumerate(d.tracks)
                if ti.kind == "audio")
    es = b"".join(d.read_sample(atrk, k).data
                  for k in range(d.n_samples(atrk)))
    ref = ffaudio.FFAudioDecoder("ac3").decode_packets(
        [es[i:i + 1920] for i in range(0, len(es), 1920)])
    ref = np.concatenate(ref, 0) if isinstance(ref, list) else ref
    assert len(ref) >= 1536 * 3
    d.close()
