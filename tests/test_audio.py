"""Audio subsystem: FLAC codec round trips, DSP, and the work-pipeline
audio chain (reference roles: encavcodecaudio.c, audio_resample,
acompressor/agate).
"""
import numpy as np
import pytest

from handbrake_tpu.audio import dsp
from handbrake_tpu.audio.chain import AudioChain
from handbrake_tpu.audio.flac import FlacDecoder, FlacEncoder
from handbrake_tpu.core.buffer import Buffer
from handbrake_tpu.job.schema import AudioJobTrack
from handbrake_tpu.sources.common import TrackInfo


def _sig(n, ch=2, sr=48000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    base = 0.5 * np.sin(2 * np.pi * 440 * t) \
        + 0.05 * rng.standard_normal(n)
    return np.stack([np.roll(base, 7 * c) for c in range(ch)], axis=1)


# -- FLAC ---------------------------------------------------------------------
@pytest.mark.parametrize("kind", ["tone", "silence", "noise", "ramp"])
def test_flac_lossless(kind, rng):
    n = 9000
    if kind == "tone":
        pcm = _sig(n)
    elif kind == "silence":
        pcm = np.zeros((n, 2))
    elif kind == "noise":
        pcm = rng.uniform(-1, 1, (n, 2))
    else:
        pcm = np.tile((np.arange(n) % 2000 / 1000 - 1)[:, None], (1, 2))
    pcm16 = np.clip(pcm * 32767, -32768, 32767).astype(np.int32)
    enc = FlacEncoder(48000, 2, 16)
    stream = None
    frames = enc.encode(pcm16) + enc.flush()
    stream = enc.header() + frames
    dec = FlacDecoder(stream)
    assert (dec.sr, dec.ch, dec.bits) == (48000, 2, 16)
    out = dec.decode_all()
    assert np.array_equal(out, pcm16)


def test_flac_compresses_tonal():
    pcm16 = np.clip(_sig(48000) * 32767, -32768, 32767).astype(np.int32)
    enc = FlacEncoder(48000, 2, 16)
    stream = enc.header() + enc.encode(pcm16) + enc.flush()
    # fixed predictors only (LPC later): ~0.85 on a noisy sine
    assert len(stream) < pcm16.size * 2 * 0.9


def test_flac_md5_in_streaminfo():
    import hashlib
    pcm16 = np.clip(_sig(5000) * 32767, -32768, 32767).astype(np.int32)
    enc = FlacEncoder(48000, 2, 16)
    enc.encode(pcm16)
    enc.flush()
    si = enc.streaminfo()
    assert si[18:34] == hashlib.md5(pcm16.astype("<i2").tobytes()).digest()


# -- DSP ----------------------------------------------------------------------
def test_mixdown_stereo_from_51():
    pcm = np.zeros((100, 6), np.float32)
    pcm[:, 2] = 1.0          # center only
    out = dsp.apply_mixdown(pcm, "stereo")
    assert out.shape == (100, 2)
    assert np.allclose(out[:, 0], dsp.CLEV)
    assert np.allclose(out[:, 1], dsp.CLEV)


def test_mixdown_mono():
    pcm = np.ones((50, 2), np.float32)
    out = dsp.apply_mixdown(pcm, "mono")
    assert out.shape == (50, 1)
    assert np.allclose(out, 1.0)


def test_resample_preserves_tone():
    sr1, sr2 = 48000, 44100
    n = 4800
    t = np.arange(n) / sr1
    pcm = np.sin(2 * np.pi * 1000 * t)[:, None].astype(np.float32)
    out = dsp.resample(pcm, sr1, sr2)
    assert abs(len(out) - n * sr2 / sr1) <= 1
    # measure dominant frequency of the middle section
    mid = out[len(out) // 4: 3 * len(out) // 4, 0]
    spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
    freq = np.argmax(spec) * sr2 / len(mid)
    assert abs(freq - 1000) < 30


def test_gain_and_drc():
    pcm = np.full((10, 1), 0.5, np.float32)
    assert np.allclose(dsp.apply_gain(pcm, 6.0), 0.5 * 10 ** 0.3)
    loud = np.full((10, 1), 0.9, np.float32)
    out = dsp.apply_drc(loud, 2.0)
    assert np.all(out < 0.9)          # compressed above -20 dB
    quiet = np.full((10, 1), 0.05, np.float32)
    assert np.allclose(dsp.apply_drc(quiet, 2.0), quiet)


def test_compressor_reduces_peaks():
    sr = 48000
    pcm = np.concatenate([np.full(2000, 0.05), np.full(2000, 0.9)])[:, None]
    c = dsp.Compressor(sr, threshold_db=-18, ratio=4.0)
    out = c.process(pcm.astype(np.float32))
    assert out[-1, 0] < 0.6           # loud tail compressed
    assert abs(out[500, 0] - 0.05) < 0.01


def test_gate_cuts_silence():
    sr = 48000
    # long quiet tail so the release-time envelope actually decays
    pcm = np.concatenate([np.full(3000, 0.5),
                          np.full(40000, 0.001)])[:, None]
    g = dsp.Gate(sr, threshold_db=-40)
    out = g.process(pcm.astype(np.float32))
    assert abs(out[1000, 0] - 0.5) < 0.01
    assert abs(out[-1, 0]) < 5e-4


# -- chain --------------------------------------------------------------------
def _chain(encoder="flac", mixdown="stereo", samplerate=0, ch=2):
    spec = AudioJobTrack(track=0, encoder=encoder, mixdown=mixdown,
                         samplerate=samplerate)
    ti = TrackInfo(kind="audio", codec="pcm_s16le", sample_rate=48000,
                   channels=ch)
    return AudioChain(spec, ti)


def test_chain_flac_roundtrip():
    chain = _chain("flac")
    pcm = _sig(9000)
    buf = Buffer(track_kind="audio", pts=0)
    buf.planes = [pcm.astype(np.float32)]
    pkts = chain.process(buf) + chain.flush()
    assert pkts
    stream = b"fLaC" + chain.extradata() + b"".join(p.data for p in pkts)
    dec = FlacDecoder(stream)
    out = dec.decode_all()
    # same float32 path the chain takes (float64 ref differs by ±1 LSB)
    ref = np.clip(pcm.astype(np.float32) * 32767.0,
                  -32768, 32767).astype(np.int32)
    assert np.array_equal(out, ref)
    # timing: packets tile the stream sample-accurately
    assert pkts[0].pts == 0
    total = sum(p.duration for p in pkts)
    assert abs(total - 9000 * 90000 // 48000) <= 1


def test_chain_mixdown_51_to_stereo():
    chain = _chain("pcm_s16le", mixdown="stereo", ch=6)
    pcm = np.zeros((1000, 6), np.float32)
    pcm[:, 0] = 0.5
    buf = Buffer(track_kind="audio", pts=0)
    buf.planes = [pcm]
    pkts = chain.process(buf)
    out = np.frombuffer(pkts[0].data, "<i2").reshape(-1, 2)
    assert abs(out[0, 0] - int(0.5 * 32767)) <= 1
    assert out[0, 1] == 0


def test_chain_resample_pts():
    chain = _chain("pcm_s16le", samplerate=24000)
    pcm = _sig(4800)
    buf = Buffer(track_kind="audio", pts=0)
    buf.planes = [pcm.astype(np.float32)]
    pkts = chain.process(buf)
    out = np.frombuffer(pkts[0].data, "<i2").reshape(-1, 2)
    assert abs(len(out) - 2400) <= 1


def test_chain_dynamics_wired_from_job():
    """Compressor/Gate reachable from job JSON (acompressor/agate)."""
    import numpy as np
    from handbrake_tpu.audio.chain import AudioChain
    from handbrake_tpu.job.schema import Job

    d = {"Audio": {"AudioList": [
        {"Track": 1, "Encoder": "pcm_s16le", "Compressor": 3.0,
         "Gate": -45.0}]}}
    j = Job.from_json(d)
    spec = j.audio[0]
    assert spec.compressor == 3.0 and spec.gate == -45.0

    class TI:
        sample_rate = 48000
        channels = 2
        codec = "pcm_s16le"
        extradata = b""
    ch = AudioChain(spec, TI())
    assert ch.compressor is not None and ch.gate is not None
    from handbrake_tpu.core.buffer import Buffer
    t = np.arange(4800) / 48000.0
    loud = (0.9 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    buf = Buffer(planes=[np.stack([loud, loud], 1)], track_kind="audio")
    out = ch.process(buf)
    assert out and out[0].data
    # compressor reduces peak amplitude of a loud tone
    pcm = np.frombuffer(out[0].data, "<i2").astype(np.float32) / 32767.0
    assert 0.05 < np.abs(pcm).max() < 0.9
    # JSON round-trip preserves the settings
    assert j.to_json()["Audio"]["AudioList"][0]["Compressor"] == 3.0


def test_aac_encoder_roundtrip_psnr():
    """From-scratch AAC-LC roundtrips through libavcodec with better
    time-domain PSNR than libav's own encoder manages at 128 kbps
    (ISO codebooks + sf/escape semantics pinned by the oracle)."""
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    import numpy as np
    import pytest
    try:
        import ffaudio
    except Exception:
        pytest.skip("audio oracle unavailable")
    if not ffaudio.available():
        pytest.skip("audio oracle unavailable")
    mp3 = ('/opt/venv/lib/python3.12/site-packages/pygame/examples/'
           'data/house_lo.mp3')
    if os.path.exists(mp3):
        ffaudio.FFAudioDecoder("mp3").decode_packets(
            [open(mp3, 'rb').read()])   # locate AVFrame layout
    from handbrake_tpu.audio.aac import AACEncoder

    sr = 48000
    t = np.arange(sr) / sr
    sig = np.stack([0.4 * np.sin(2 * np.pi * 440 * t)
                    + 0.05 * np.sin(2 * np.pi * 3000 * t),
                    0.4 * np.sin(2 * np.pi * 660 * t)], 1)
    sig = sig.astype(np.float32)
    enc = AACEncoder(sr, 2, quality=132)
    aus = enc.encode(sig) + enc.flush()
    assert len(aus) >= 47
    # one ADTS frame per packet: the system libavcodec decodes only the
    # first AU of a multi-frame packet ("Multiple frames in a packet")
    out = ffaudio.FFAudioDecoder("aac").decode_packets(
        [enc.adts_header(len(a)) + a for a in aus])
    d = 1024                             # MDCT latency
    n = min(len(sig), out.shape[0] - d)
    a = sig[4096:n - 4096]
    b = out[d + 4096:d + n - 4096, :2]
    err = a - b
    psnr = 10 * np.log10(np.mean(a ** 2) / (np.mean(err ** 2) + 1e-12))
    kbps = sum(map(len, aus)) * 8 / (len(sig) / sr) / 1000
    assert psnr > 22, (psnr, kbps)
    assert kbps < 200, kbps


def test_aac_chain_and_work(tmp_path):
    """AAC request no longer degrades to FLAC: the chain encodes AAC-LC,
    the mp4 carries mp4a+esds with our AudioSpecificConfig, and the track
    decodes via libavcodec."""
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    import numpy as np
    import pytest
    from handbrake_tpu.audio.chain import AudioChain
    from handbrake_tpu.core.buffer import Buffer
    from handbrake_tpu.job.schema import AudioJobTrack

    class TI:
        sample_rate = 48000
        channels = 2
        codec = "pcm_s16le"
        extradata = b""
    spec = AudioJobTrack(encoder="aac", bitrate=160, mixdown="stereo")
    ch = AudioChain(spec, TI())
    assert ch.out_codec() == "aac"
    asc = ch.extradata()
    assert len(asc) == 2 and (asc[0] >> 3) == 2       # AAC-LC
    t = np.arange(9600) / 48000.0
    pcm = np.stack([0.3 * np.sin(2 * np.pi * 500 * t)] * 2, 1)
    buf = Buffer(planes=[pcm.astype(np.float32)], track_kind="audio")
    pkts = ch.process(buf) + ch.flush()
    assert pkts and all(p.data for p in pkts)
    try:
        import ffaudio
        if ffaudio.available():
            mp3 = ('/opt/venv/lib/python3.12/site-packages/pygame/'
                   'examples/data/house_lo.mp3')
            if os.path.exists(mp3):
                ffaudio.FFAudioDecoder("mp3").decode_packets(
                    [open(mp3, 'rb').read()])
            enc = ch._enc
            adts = b"".join(enc.adts_header(len(p.data)) + p.data
                            for p in pkts)
            out = ffaudio.FFAudioDecoder("aac").decode_packets([adts])
            assert out.shape[0] >= 9600
    except Exception:
        pytest.skip("oracle unavailable for decode check")


# ---------------------------------------------------------------------------
# AAC-LC decoder (audio/aacdec.py) — decavcodec.c audio personality role
# ---------------------------------------------------------------------------
import ffaudio  # noqa: E402


def _aac_probe():
    """Locate ffaudio's AVFrame offsets with a known-good stream."""
    from handbrake_tpu.audio.aac import AACEncoder
    t0 = np.arange(2048) / 48000
    pe = AACEncoder(48000, 2, quality=120)
    pk = pe.encode(np.stack([np.sin(2 * np.pi * 440 * t0)] * 2,
                            1).astype(np.float32) * 0.3) + pe.flush()
    ffaudio.FFAudioDecoder("aac").decode_packets(
        [ffaudio.adts_wrap([p], sample_rate=48000, channels=2)
         for p in pk])


def _ff_aac_encoder(sr, ch, bitrate, opts=()):
    """libavcodec native AAC encoder with priv options set pre-open."""
    import ctypes as C
    a = ffaudio._a()
    u = ffaudio._u()
    orig = a.avcodec_open2

    class Hook:
        def __call__(self, ctx, codec, o):
            for k, v in opts:
                u.av_opt_set(ctx, k, v, 1)
            return orig(ctx, codec, o)

    a.avcodec_open2 = Hook()
    try:
        return ffaudio.FFAudioEncoder("aac", sample_rate=sr, channels=ch,
                                      bit_rate=bitrate)
    finally:
        a.avcodec_open2 = orig


def test_aac_decoder_conformance_vs_libavcodec():
    """Decode libavcodec's native AAC encoder output (short windows,
    window transitions, M/S, intensity stereo, every codebook) to within
    float tolerance of libavcodec's own decoder.  PNS is disabled in the
    encoder: noise substitution is decoder-random by design."""
    if not ffaudio.available():
        pytest.skip("libavcodec oracle unavailable")
    from handbrake_tpu.audio.aacdec import AACDecoder
    _aac_probe()
    sr = 48000
    rng = np.random.default_rng(1)
    t = np.arange(2 * sr) / sr
    pcm = 0.3 * np.sin(2 * np.pi * 440 * t) \
        + 0.1 * np.sin(2 * np.pi * 3000 * t + 0.2) \
        + 0.02 * rng.standard_normal(len(t))
    for click in range(8):
        i = int((0.11 + 0.22 * click) * sr)
        pcm[i:i + 200] += 0.5 * np.hanning(200)
    st = np.clip(np.stack([pcm, 0.8 * pcm
                           + 0.1 * np.sin(2 * np.pi * 770 * t)], 1),
                 -0.99, 0.99).astype(np.float32)
    for bitrate in (192000, 96000):
        enc = _ff_aac_encoder(sr, 2, bitrate, [(b"aac_pns", b"0")])
        pkts = enc.encode(st)
        adts = [ffaudio.adts_wrap([p], sample_rate=sr, channels=2)
                for p in pkts]
        ff = np.asarray(ffaudio.FFAudioDecoder("aac")
                        .decode_packets(adts), np.float64)
        d = AACDecoder(None)
        ours = np.concatenate([d.decode_frame(p) for p in adts],
                              0).astype(np.float64)
        n = min(len(ff), len(ours))
        a, b = ours[1024:n], ff[1024:n]
        rel = np.sqrt(((a - b) ** 2).mean()) \
            / (np.sqrt((b ** 2).mean()) + 1e-12)
        assert rel < 1e-5, (bitrate, rel)


def test_aac_decoder_mono_441():
    if not ffaudio.available():
        pytest.skip("libavcodec oracle unavailable")
    from handbrake_tpu.audio.aacdec import AACDecoder
    _aac_probe()
    sr = 44100
    t = np.arange(sr) / sr
    pcm = np.clip(0.4 * np.sin(2 * np.pi * 523 * t)
                  + 0.2 * np.sign(np.sin(2 * np.pi * 3 * t)), -0.99,
                  0.99).astype(np.float32)[:, None]
    enc = _ff_aac_encoder(sr, 1, 80000, [(b"aac_pns", b"0")])
    pkts = enc.encode(pcm)
    adts = [ffaudio.adts_wrap([p], sample_rate=sr, channels=1)
            for p in pkts]
    ff = np.asarray(ffaudio.FFAudioDecoder("aac").decode_packets(adts),
                    np.float64)
    d = AACDecoder(None)
    ours = np.concatenate([d.decode_frame(p) for p in adts],
                          0).astype(np.float64)
    n = min(len(ff), len(ours))
    rel = np.sqrt(((ours[1024:n, :1] - ff[1024:n, :1]) ** 2).mean()) \
        / (np.sqrt((ff[1024:n] ** 2).mean()) + 1e-12)
    assert rel < 1e-5, rel


def test_aac_decoder_tns_synthetic():
    """TNS inverse filtering: hand-built SCE with a TNS filter, decoded
    by us and libavcodec — the intricate tns_decode_coef conversion and
    the all-pole band filter must agree."""
    if not ffaudio.available():
        pytest.skip("libavcodec oracle unavailable")
    from handbrake_tpu.audio.aac import AACEncoder
    from handbrake_tpu.audio.aacdec import AACDecoder
    from handbrake_tpu.codecs.h264.bits import BitWriter
    _aac_probe()
    rng = np.random.default_rng(3)
    enc = AACEncoder(48000, 1, quality=110)
    max_sfb = enc.max_sfb
    swb = enc.swb
    q = rng.integers(-12, 13, 1024)
    aus = []
    for coef_res, direction, compress, order in (
            (0, 0, 0, 3), (1, 0, 0, 7), (1, 1, 0, 12), (0, 0, 1, 4)):
        bw = BitWriter()
        bw.put(0, 3)                    # SCE
        bw.put(0, 4)                    # tag
        bw.put(110, 8)                  # global_gain
        bw.put_bit(0)                   # ics_reserved
        bw.put(0, 2)                    # ONLY_LONG
        bw.put_bit(0)                   # sine shape
        bw.put(max_sfb, 6)
        bw.put_bit(0)                   # predictor
        ln = max_sfb                    # one cb-11 section
        bw.put(11, 4)
        while ln >= 31:
            bw.put(31, 5)
            ln -= 31
        bw.put(ln, 5)
        for _ in range(max_sfb):
            enc._sf_delta(bw, 0)
        bw.put_bit(0)                   # pulse
        bw.put_bit(1)                   # tns_data_present
        bw.put(1, 2)                    # n_filt = 1
        bw.put(coef_res, 1)
        bw.put(20, 6)                   # length (sfbs)
        bw.put(order, 5)
        bw.put(direction, 1)
        bw.put(compress, 1)
        cb = coef_res + 3 - compress
        # low-magnitude reflection coefficients: keep the all-pole filter
        # well away from instability, where libavcodec's float32 and our
        # float64 recursions would legitimately diverge
        for i in range(order):
            bw.put((1, 2, (1 << cb) - 1, (1 << cb) - 2)[i % 4], cb)
        bw.put_bit(0)                   # gain control
        for sfb in range(max_sfb):
            enc._code_band(bw, q, swb[sfb], swb[sfb + 1])
        bw.put(7, 3)                    # END
        bw.put(0, (8 - (bw._nbits % 8)) % 8)
        aus.append(bw.get_rbsp())
    adts = [ffaudio.adts_wrap([au], sample_rate=48000, channels=1)
            for au in aus]
    ff = np.asarray(ffaudio.FFAudioDecoder("aac").decode_packets(adts),
                    np.float64)
    d = AACDecoder(None)
    ours = np.concatenate([d.decode_frame(p) for p in adts],
                          0).astype(np.float64)
    n = min(len(ff), len(ours))
    rel = np.sqrt(((ours[:n] - ff[:n]) ** 2).mean()) \
        / (np.sqrt((ff[:n] ** 2).mean()) + 1e-12)
    assert rel < 1e-6, rel


def test_adts_ts_aac_passthrough_to_mp4(tmp_path):
    """TS with ADTS AAC → copy:aac → mp4: the synthesized ASC matches
    the stream and the track decodes in the oracle (WORK_PASS +
    muxavformat extradata-from-track-info role)."""
    if not ffaudio.available():
        pytest.skip("libavcodec oracle unavailable")
    _aac_probe()
    import os
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(__file__))
    import test_ts as tsfix
    from handbrake_tpu.audio.aac import AACEncoder
    from handbrake_tpu.codecs.h264.encoder import (EncoderConfig,
                                                   H264Encoder)
    from handbrake_tpu.job.schema import Job, AudioJobTrack
    from handbrake_tpu.sources.probe import open_source
    from handbrake_tpu import work

    os.environ["HB_TPU_DISABLE_DEVICE"] = "1"
    W, H, n = 96, 64, 12
    sr = 48000
    venc = H264Encoder(EncoderConfig(width=W, height=H, qp=28, gop=n))
    aenc = AACEncoder(sr, 2, quality=118)
    na = (n * 3003 * sr // 90000 // 1024 + 2) * 1024
    t = np.arange(na) / sr
    tone = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    aus = aenc.encode(np.stack([tone, tone * 0.7], 1)) + aenc.flush()

    # PAT/PMT with H.264 + ADTS AAC (stream type 0x0F on pid 0x101)
    def pmt_av(cc=0):
        es = (bytes([0x1B, 0xE1, 0x00, 0xF0, 0x00])
              + bytes([0x0F, 0xE1, 0x01, 0xF0, 0x00]))
        body = (b"\x02"
                + (0xB000 | (9 + 4 + len(es) + 4)).to_bytes(2, "big")
                + b"\x00\x01\xc1\x00\x00"
                + bytes([0xE1, 0x00]) + b"\xf0\x00" + es)
        return tsfix.psi_packet(0x20, body, cc)

    ts = tsfix.pat() + pmt_av()
    ccv = cca = 0
    base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256).astype(
        np.uint8)
    apts = 0
    ai = 0
    for i in range(n):
        au = venc.encode_frame(np.roll(base, i, 1),
                               np.full((H // 2, W // 2), 110, np.uint8),
                               np.full((H // 2, W // 2), 60, np.uint8))
        pk = tsfix.ts_packets(0x100, tsfix.pes(0xE0, i * 3003, au), ccv)
        ccv += len(pk) // 188
        ts += pk
        while ai < len(aus) and apts <= i * 3003:
            adts = ffaudio.adts_wrap([aus[ai]], sample_rate=sr,
                                     channels=2)
            pk = tsfix.ts_packets(0x101, tsfix.pes(0xC0, apts, adts),
                                  cca)
            cca += len(pk) // 188
            ts += pk
            apts += 1024 * 90000 // sr
            ai += 1
    src_path = str(tmp_path / "a.ts")
    with open(src_path, "wb") as f:
        f.write(ts)

    mp4 = str(tmp_path / "a.mp4")
    j = Job(path=src_path, file=mp4, mux="mp4", vcodec="h264",
            quality=26.0)
    j.audio = [AudioJobTrack(track=0, encoder="copy:aac")]
    stats = work.do_job(j)
    assert not stats.get("error"), stats

    d = open_source(mp4)
    atrk = next(i for i, ti in enumerate(d.tracks)
                if ti.kind == "audio")
    ti = d.tracks[atrk]
    assert ti.codec == "aac" and ti.sample_rate == sr
    pkts = [d.read_sample(atrk, k).data for k in range(d.n_samples(atrk))]
    assert len(pkts) > 5
    adts = [ffaudio.adts_wrap([p], sample_rate=sr, channels=2)
            for p in pkts]
    got = np.asarray(ffaudio.FFAudioDecoder("aac").decode_packets(adts),
                     np.float64)
    g = got[2048:len(got) - 2048, 0]
    tt = np.arange(len(g)) / sr
    amp = 2 * np.hypot((g * np.cos(2 * np.pi * 440 * tt)).mean(),
                       (g * np.sin(2 * np.pi * 440 * tt)).mean())
    assert 0.3 < amp < 0.5, amp
    d.close()


def test_aac_abr_rate_control():
    """AAC closed-loop ABR: the per-frame quantizer adapts toward the
    bit budget on hard (noise) content where constant-q overshoots
    badly (encavcodecaudio.c rate-control role)."""
    import numpy as np
    from handbrake_tpu.audio.aac import AACEncoder

    sr = 48000
    rng = np.random.default_rng(7)
    # noisy + tonal mix, 6 seconds: hard for the constant quantizer
    t = np.arange(6 * sr) / sr
    sig = (0.25 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * rng.normal(0, 1, len(t))).astype(np.float32)
    pcm = np.clip(np.stack([sig, sig], 1), -1, 1)

    def measure(bitrate):
        enc = AACEncoder(sr, 2, quality=120, bitrate=bitrate)
        aus = enc.encode(pcm) + enc.flush()
        tail = aus[len(aus) // 3:]        # steady state after convergence
        dur = len(tail) * 1024 / sr
        return sum(map(len, tail)) * 8 / dur / 1000.0

    kbps_cq = measure(0)              # constant-q reference
    for target in (96, 160):
        got = measure(target * 1000)
        assert abs(got - target) <= 0.2 * target, (target, got, kbps_cq)
    # constant-q on this content is far from 96k (else the test is vacuous)
    assert abs(kbps_cq - 96) > 0.25 * 96, kbps_cq
