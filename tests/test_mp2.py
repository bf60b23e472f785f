"""MPEG-1 Layer II audio decoder (audio/mp2dec.py) — conformance vs
libavcodec's mp2 codec, and the DVB/DVD path end-to-end (MP2 in a
program stream → decode → AAC), the decavcodec.c MPEG-audio role."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import ffaudio  # noqa: E402
import ffvideo  # noqa: E402

from handbrake_tpu.audio.mp2dec import Mp2Decoder  # noqa: E402


def _probe():
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
    return np.stack(
        [0.3 * np.sin(2 * np.pi * 220 * (c + 1.3) * t)
         + 0.03 * rng.standard_normal(n) for c in range(ch)],
        1).astype(np.float32)


def _snr(got, want):
    d = got - want
    return 10 * np.log10((want ** 2).mean() / max((d ** 2).mean(), 1e-20))


@pytest.mark.parametrize("sr,ch,br", [
    (48000, 2, 192000),     # table B.2a (high rate, 48 kHz)
    (48000, 1, 96000),
    (44100, 2, 160000),     # table B.2b
    (32000, 2, 128000),
    (48000, 2, 64000),      # table B.2c/d (low rate per channel)
    (48000, 2, 384000),
])
def test_mp2_decoder_conformance(sr, ch, br):
    """All four ISO B.2 allocation tables: decode to the oracle's PCM
    (bounded only by its fixed-point synthesis, ~84 dB)."""
    if not ffaudio.available():
        pytest.skip("libavcodec oracle unavailable")
    _probe()
    n = 1152 * 8
    sig = _signal(sr, ch, n)
    enc = ffaudio.FFAudioEncoder("mp2", sample_rate=sr, channels=ch,
                                 bit_rate=br, sample_fmt="s16")
    pkts = enc.encode(sig)
    ref = ffaudio.FFAudioDecoder("mp2").decode_packets(pkts)
    ref = np.concatenate(ref, 0) if isinstance(ref, list) else ref
    dec = Mp2Decoder()
    ours = dec.decode(b"".join(pkts))
    assert dec.sample_rate == sr and dec.channels == ch
    o = np.concatenate(ours, 0)
    m = min(len(o), len(ref))
    assert m >= 1152 * 7
    assert _snr(o[:m], ref[:m]) > 70.0


def test_mp2_split_feed():
    if not ffaudio.available():
        pytest.skip("libavcodec oracle unavailable")
    _probe()
    sig = _signal(48000, 2, 1152 * 4)
    enc = ffaudio.FFAudioEncoder("mp2", sample_rate=48000, channels=2,
                                 bit_rate=192000, sample_fmt="s16")
    stream = b"".join(enc.encode(sig))
    whole = np.concatenate(Mp2Decoder().decode(stream), 0)
    dec = Mp2Decoder()
    got = []
    for i in range(0, len(stream), 173):
        got += dec.feed(stream[i:i + 173])
    split = np.concatenate(got, 0)
    assert split.shape == whole.shape
    assert np.array_equal(split, whole)


def test_vob_mp2_transcode_to_aac(tmp_path):
    """PS with MPEG-2 video + MP2 audio (stream 0xC0) → do_job → mp4
    with AAC: the DVB/DVD broadcast audio path decodes natively."""
    if not (ffaudio.available() and ffvideo.available()):
        pytest.skip("libavcodec oracle unavailable")
    _probe()
    import cv2
    from handbrake_tpu.job.schema import Job, AudioJobTrack
    from handbrake_tpu.sources.probe import open_source
    from handbrake_tpu import work
    from handbrake_tpu.audio.aacdec import AACDecoder

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
    ns = int(sr * n / 30.0) + 1152
    t = np.arange(ns) / sr
    tone = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    apkts = ffaudio.FFAudioEncoder(
        "mp2", sample_rate=sr, channels=2, bit_rate=192000,
        sample_fmt="s16").encode(np.stack([tone, tone * 0.5], 1))

    out = bytearray(b"\x00\x00\x01\xba"
                    + bytes([0x44, 0, 4, 0, 4, 1, 0, 1, 0x89, 0xF8]))

    def pes(sid, p, payload):
        body = bytearray(b"\x80\x80\x05")
        body += bytes([0x21 | ((p >> 29) & 0x0E), (p >> 22) & 0xFF,
                       0x01 | ((p >> 14) & 0xFE), (p >> 7) & 0xFF,
                       0x01 | ((p << 1) & 0xFE)])
        body += payload
        return (b"\x00\x00\x01" + bytes([sid])
                + len(body).to_bytes(2, "big") + bytes(body))

    apts = ak = vpts = 0
    for pkt in vpkts:
        out += pes(0xE0, vpts, pkt)
        vpts += 3000
        while ak < len(apkts) and apts <= vpts:
            out += pes(0xC0, apts, apkts[ak])
            apts += 1152 * 90000 // sr
            ak += 1
    ps = str(tmp_path / "dvb.mpg")
    with open(ps, "wb") as f:
        f.write(bytes(out))

    src = open_source(ps)
    kinds = {(ti.kind, ti.codec) for ti in src.tracks}
    src.close()
    assert ("audio", "mp2") in kinds

    mp4 = str(tmp_path / "out.mp4")
    j = Job(path=ps, file=mp4, mux="mp4", vcodec="h264", quality=26.0)
    j.audio = [AudioJobTrack(track=0, encoder="aac", bitrate=128)]
    stats = work.do_job(j)
    assert not stats.get("error"), stats
    assert stats["frames_out"] == n, stats

    d = open_source(mp4)
    ati = [i for i, ti in enumerate(d.tracks) if ti.kind == "audio"]
    assert ati, "no audio track in output"
    adec = AACDecoder(d.tracks[ati[0]].extradata)
    pcm = [adec.decode_frame(d.read_sample(ati[0], k).data)
           for k in range(d.n_samples(ati[0]))]
    got = np.concatenate(pcm, 0)
    mid = got[2048:len(got) - 2048, 0]
    assert len(mid) > sr // 6
    tt = np.arange(len(mid)) / sr
    amp = np.hypot((mid * np.cos(2 * np.pi * 440 * tt)).mean() * 2,
                   (mid * np.sin(2 * np.pi * 440 * tt)).mean() * 2)
    assert 0.25 < amp < 0.55, amp
    d.close()


def test_mp2_passthrough_ps_to_mkv(tmp_path):
    """copy:mp2 from a broadcast PS lands byte-intact in an A_MPEG/L2
    MKV track that the oracle decodes."""
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
    ns = int(sr * n / 30.0) + 1152
    t = np.arange(ns) / sr
    tone = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    apkts = ffaudio.FFAudioEncoder(
        "mp2", sample_rate=sr, channels=2, bit_rate=192000,
        sample_fmt="s16").encode(np.stack([tone, tone * 0.5], 1))

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
            out += pes(0xC0, apts, apkts[ak])
            apts += 1152 * 90000 // sr
            ak += 1
    ps = str(tmp_path / "b.mpg")
    with open(ps, "wb") as f:
        f.write(bytes(out))

    mkv = str(tmp_path / "b.mkv")
    j = Job(path=ps, file=mkv, mux="mkv", vcodec="h264", quality=26.0)
    j.audio = [AudioJobTrack(track=0, encoder="copy:mp2")]
    stats = work.do_job(j)
    assert not stats.get("error"), stats

    d = MKVDemuxer(mkv)
    atrk = next(i for i, ti in enumerate(d.tracks)
                if ti.kind == "audio")
    assert d.tracks[atrk].codec == "mp2"
    got = b"".join(p.data for trk, p in d.packets() if trk == atrk)
    src_es = b"".join(apkts[:ak])
    assert got and (got in src_es or src_es.startswith(got))
    ref = ffaudio.FFAudioDecoder("mp2").decode_packets(
        [got[i:i + 1728] for i in range(0, len(got), 1728)])
    ref = np.concatenate(ref, 0) if isinstance(ref, list) else ref
    assert len(ref) >= 1152 * 3
