"""Production ctypes binding of the system libavcodec.

Role parity: the reference links FFmpeg and exposes it through three
work objects — decavcodec.c (ALL audio decode + secondary video
decode), encavcodec.c (the classic video-encoder catalog: MPEG-2/4,
VP8/9, ProRes, FFV1, ...), and encavcodecaudio.c (MP3/Opus/Vorbis/AAC
audio encoders).  This module is the same architectural layer for the
TPU build: the *native* decoders/encoders (H.264/HEVC/AV1/MPEG-2/MJPEG
video, AAC/AC-3/MP2/FLAC/LPCM audio) stay the default data path;
libavcodec covers the long tail exactly as it does upstream
(decavcodec.c:192-347, encavcodec.c:1-2414, encavcodecaudio.c:573).

No FFmpeg headers are available in this image, so struct field offsets
(AVCodecContext sample_fmt/frame_size/extradata, AVFrame layout) are
located empirically at init by probing — the same clean-room technique
as tests/ffdec.py, hardened for production use.  Everything degrades to
`available() == False` when the library is absent.
"""
from __future__ import annotations

import ctypes as C
import os
import threading

import numpy as np

_LIBDIR = "/usr/lib/x86_64-linux-gnu"

AV_SAMPLE_FMT = {"u8": 0, "s16": 1, "s32": 2, "flt": 3, "dbl": 4,
                 "u8p": 5, "s16p": 6, "s32p": 7, "fltp": 8, "dblp": 9}
AV_PIX_FMT_YUV420P = 0

_lock = threading.RLock()
_state = {}


def _libs():
    if "avcodec" in _state:
        return _state.get("avutil"), _state.get("avcodec")
    try:
        avutil = C.CDLL(os.path.join(_LIBDIR, "libavutil.so.57"),
                        mode=C.RTLD_GLOBAL)
        avcodec = C.CDLL(os.path.join(_LIBDIR, "libavcodec.so.59"),
                         mode=C.RTLD_GLOBAL)
    except OSError:
        avutil = avcodec = None
    if avcodec is not None:
        for name, restype in (
                ("avcodec_find_decoder_by_name", C.c_void_p),
                ("avcodec_find_encoder_by_name", C.c_void_p),
                ("avcodec_alloc_context3", C.c_void_p),
                ("av_packet_alloc", C.c_void_p)):
            getattr(avcodec, name).restype = restype
        avcodec.avcodec_find_decoder_by_name.argtypes = [C.c_char_p]
        avcodec.avcodec_find_encoder_by_name.argtypes = [C.c_char_p]
        avcodec.avcodec_alloc_context3.argtypes = [C.c_void_p]
        avutil.av_frame_alloc.restype = C.c_void_p
        avutil.av_malloc.restype = C.c_void_p
        avutil.av_malloc.argtypes = [C.c_size_t]
        avutil.av_opt_set.argtypes = [C.c_void_p, C.c_char_p, C.c_char_p,
                                      C.c_int]
        avutil.av_opt_set_int.argtypes = [C.c_void_p, C.c_char_p,
                                          C.c_longlong, C.c_int]
        avutil.av_channel_layout_default.argtypes = [C.c_void_p, C.c_int]
    _state["avutil"], _state["avcodec"] = avutil, avcodec
    return avutil, avcodec


def available() -> bool:
    return _libs()[1] is not None


# ---------------------------------------------------------------------------
# empirical struct-offset probes (once per process)
# ---------------------------------------------------------------------------
def _ctx_offsets():
    """AVCodecContext offsets: sample_rate, ch_layout, sample_fmt,
    frame_size, extradata(+size), width(pair), pix_fmt, time_base."""
    if "ctx_off" in _state:
        return _state["ctx_off"]
    u, a = _libs()
    off = {}
    # --- audio side: probe an aac encoder context ---
    codec = a.avcodec_find_encoder_by_name(b"aac")
    ctx = a.avcodec_alloc_context3(C.c_void_p(codec))
    magic = 48271
    assert u.av_opt_set_int(C.c_void_p(ctx), b"ar", magic, 0) == 0
    raw = C.cast(ctx, C.POINTER(C.c_int * 700)).contents
    off["sample_rate"] = [i * 4 for i in range(700)
                          if raw[i] == magic][0]
    u.av_opt_set_int(C.c_void_p(ctx), b"ar", 0, 0)
    r = u.av_opt_set(C.c_void_p(ctx), b"ch_layout", b"7c", 0)
    if r != 0:
        u.av_opt_set_int(C.c_void_p(ctx), b"ac", 7, 0)
    raw = C.cast(ctx, C.POINTER(C.c_int * 700)).contents
    cand = [i * 4 for i in range(1, 700) if raw[i] == 7
            and raw[i - 1] in (0, 1)]
    off["ch_layout"] = cand[0] - 4
    # sample_fmt: the -1 int whose overwrite lets aac open (fresh ctx per
    # attempt; open2 is not retryable on a failed context)
    raw0 = C.cast(ctx, C.POINTER(C.c_int * 700)).contents
    for o in sorted((i * 4 for i in range(700) if raw0[i] == -1),
                    key=lambda o: abs(o - off["sample_rate"])):
        c2 = a.avcodec_alloc_context3(C.c_void_p(codec))
        u.av_opt_set_int(C.c_void_p(c2), b"ar", 44100, 0)
        u.av_opt_set_int(C.c_void_p(c2), b"b", 128000, 0)
        u.av_channel_layout_default(C.c_void_p(c2 + off["ch_layout"]), 2)
        C.cast(c2 + o, C.POINTER(C.c_int)).contents.value = \
            AV_SAMPLE_FMT["fltp"]
        if a.avcodec_open2(C.c_void_p(c2), C.c_void_p(codec), None) >= 0:
            off["sample_fmt"] = o
            ctx_open = c2
            break
    else:
        raise RuntimeError("avcodec: sample_fmt probe failed")
    # frame_size: offsets holding 1024 for aac ∩ 1536 for ac3
    sets = []
    for name, want, c in (("aac", 1024, ctx_open), ("ac3", 1536, None)):
        if c is None:
            cd = a.avcodec_find_encoder_by_name(name.encode())
            c = a.avcodec_alloc_context3(C.c_void_p(cd))
            u.av_opt_set_int(C.c_void_p(c), b"ar", 48000, 0)
            u.av_opt_set_int(C.c_void_p(c), b"b", 192000, 0)
            u.av_channel_layout_default(C.c_void_p(c + off["ch_layout"]), 2)
            C.cast(c + off["sample_fmt"],
                   C.POINTER(C.c_int)).contents.value = \
                AV_SAMPLE_FMT["fltp"]
            if a.avcodec_open2(C.c_void_p(c), C.c_void_p(cd), None) < 0:
                raise RuntimeError("avcodec: ac3 open failed")
        raw = C.cast(c, C.POINTER(C.c_int * 700)).contents
        sets.append({i * 4 for i in range(700) if raw[i] == want})
    off["frame_size"] = sorted(sets[0] & sets[1])[0]
    # extradata/extradata_size: open aac with global_header → ASC
    cd = a.avcodec_find_encoder_by_name(b"aac")
    c3 = a.avcodec_alloc_context3(C.c_void_p(cd))
    u.av_opt_set_int(C.c_void_p(c3), b"ar", 44100, 0)
    u.av_opt_set_int(C.c_void_p(c3), b"b", 128000, 0)
    u.av_opt_set(C.c_void_p(c3), b"flags", b"+global_header", 0)
    u.av_channel_layout_default(C.c_void_p(c3 + off["ch_layout"]), 2)
    C.cast(c3 + off["sample_fmt"], C.POINTER(C.c_int)).contents.value = \
        AV_SAMPLE_FMT["fltp"]
    assert a.avcodec_open2(C.c_void_p(c3), C.c_void_p(cd), None) >= 0
    found = None
    for o in range(0, 2800, 8):
        ptr = C.cast(c3 + o, C.POINTER(C.c_void_p)).contents.value
        size = C.cast(c3 + o + 8, C.POINTER(C.c_int)).contents.value
        if ptr and 0 < size <= 64:
            try:
                first = C.cast(ptr, C.POINTER(C.c_uint8)).contents.value
            except Exception:
                continue
            if first == 0x12:          # 44.1k stereo AAC-LC ASC = 12 10
                found = o
                break
    if found is None:
        raise RuntimeError("avcodec: extradata probe failed")
    off["extradata"] = found
    # --- video side: probe an mpeg4 encoder context ---
    cd = a.avcodec_find_encoder_by_name(b"mpeg4")
    c4 = a.avcodec_alloc_context3(C.c_void_p(cd))
    mw, mh = 1452, 788
    assert u.av_opt_set(C.c_void_p(c4), b"video_size",
                        f"{mw}x{mh}".encode(), 0) == 0
    raw = C.cast(c4, C.POINTER(C.c_int * 700)).contents
    off["width"] = [i * 4 for i in range(699)
                    if raw[i] == mw and raw[i + 1] == mh][0]
    off["tb_option"] = u.av_opt_set(C.c_void_p(c4), b"time_base",
                                    b"1/30", 0) == 0
    for pf in range(off["width"] + 8, off["width"] + 160, 4):
        c5 = a.avcodec_alloc_context3(C.c_void_p(cd))
        u.av_opt_set(C.c_void_p(c5), b"video_size", b"64x48", 0)
        u.av_opt_set_int(C.c_void_p(c5), b"b", 400000, 0)
        if off["tb_option"]:
            u.av_opt_set(C.c_void_p(c5), b"time_base", b"1/30", 0)
        old = C.cast(c5 + pf, C.POINTER(C.c_int)).contents.value
        if old != -1:
            continue
        C.cast(c5 + pf, C.POINTER(C.c_int)).contents.value = \
            AV_PIX_FMT_YUV420P
        if a.avcodec_open2(C.c_void_p(c5), C.c_void_p(cd), None) >= 0:
            off["pix_fmt"] = pf
            break
    else:
        raise RuntimeError("avcodec: pix_fmt probe failed")
    _state["ctx_off"] = off
    return off


class _Frame:
    """AVFrame accessor (classic stable prefix: data[8]@0, linesize[8]@64,
    width@104, height@108, nb_samples@112, format@116, pts@120)."""
    LINESIZE = 64
    WIDTH = 104
    HEIGHT = 108
    NB_SAMPLES = 112
    FORMAT = 116
    PTS = 120

    def __init__(self):
        u, _ = _libs()
        self.ptr = u.av_frame_alloc()

    def ints(self, n=200):
        return C.cast(self.ptr, C.POINTER(C.c_int * n)).contents

    def data(self):
        return C.cast(self.ptr, C.POINTER(C.c_void_p * 8)).contents

    def linesize(self):
        return C.cast(self.ptr + self.LINESIZE,
                      C.POINTER(C.c_int * 8)).contents


def _frame_ch_layout_off(frame_ptr):
    """Locate AVFrame.ch_layout after a successful audio decode: the
    LAST (order, nb_channels, mask) pattern (the deprecated
    channel_layout pair appears earlier in the struct)."""
    if "frame_chl" in _state:
        return _state["frame_chl"]
    ints = C.cast(frame_ptr, C.POINTER(C.c_int * 200)).contents
    hits = []
    for i in range(30, 190):
        if ints[i] in (0, 1) and 1 <= ints[i + 1] <= 8:
            mask = C.cast(frame_ptr + i * 4 + 8,
                          C.POINTER(C.c_ulonglong)).contents.value
            if mask and bin(mask).count("1") == ints[i + 1]:
                hits.append(i * 4)
    if not hits:
        raise RuntimeError("avcodec: frame ch_layout probe failed")
    _state["frame_chl_cands"] = hits
    _state["frame_chl"] = hits[-1]
    return hits[-1]


def _new_packet(data: bytes):
    u, a = _libs()
    pkt = a.av_packet_alloc()
    buf = u.av_malloc(len(data) + 64)
    C.memmove(buf, data, len(data))
    C.memset(buf + len(data), 0, 64)
    if a.av_packet_from_data(C.c_void_p(pkt), C.c_void_p(buf),
                             len(data)) < 0:
        raise RuntimeError("av_packet_from_data failed")
    return pkt


def _set_extradata(ctx, extradata: bytes):
    u, _ = _libs()
    off = _ctx_offsets()["extradata"]
    buf = u.av_malloc(len(extradata) + 64)
    C.memmove(buf, extradata, len(extradata))
    C.memset(buf + len(extradata), 0, 64)
    C.cast(ctx + off, C.POINTER(C.c_void_p)).contents.value = buf
    C.cast(ctx + off + 8, C.POINTER(C.c_int)).contents.value = \
        len(extradata)


# ---------------------------------------------------------------------------
# audio decode (decavcodecaInit role, decavcodec.c:367)
# ---------------------------------------------------------------------------
class AVAudioDecoder:
    """Streaming audio decoder → float32 (n, ch) chunks.

    Covers the codecs without native decoders yet: eac3, dca (DTS),
    truehd/mlp, mp3, vorbis (needs extradata), opus."""

    def __init__(self, codec: str, extradata: bytes = b"",
                 sample_rate: int = 0, channels: int = 0):
        u, a = _libs()
        if a is None:
            raise RuntimeError("libavcodec unavailable")
        self.codec_name = codec
        self.codec = a.avcodec_find_decoder_by_name(codec.encode())
        if not self.codec:
            raise RuntimeError(f"no decoder {codec}")
        self.ctx = a.avcodec_alloc_context3(C.c_void_p(self.codec))
        off = _ctx_offsets()
        if sample_rate:
            u.av_opt_set_int(C.c_void_p(self.ctx), b"ar", sample_rate, 0)
        if channels:
            u.av_channel_layout_default(
                C.c_void_p(self.ctx + off["ch_layout"]), channels)
        if extradata:
            _set_extradata(self.ctx, extradata)
        if a.avcodec_open2(C.c_void_p(self.ctx), C.c_void_p(self.codec),
                           None) < 0:
            raise RuntimeError(f"avcodec_open2({codec}) failed")
        self.frame = _Frame()
        self.sample_rate = 0
        self.channels = 0

    def _recv_all(self, out):
        _, a = _libs()
        while True:
            if a.avcodec_receive_frame(C.c_void_p(self.ctx),
                                       C.c_void_p(self.frame.ptr)) < 0:
                return
            f = self.frame
            ints = f.ints()
            nb = ints[_Frame.NB_SAMPLES // 4]
            fmt = ints[_Frame.FORMAT // 4]
            chl = _frame_ch_layout_off(f.ptr)
            nch = ints[chl // 4 + 1]
            self.channels = nch
            datap = f.data()

            def planar(ctype, scale):
                chans = []
                for c in range(nch):
                    arr = np.ctypeslib.as_array(
                        C.cast(datap[c], C.POINTER(ctype)), (nb,))
                    chans.append(arr.astype(np.float32) * scale)
                return np.stack(chans, 1)

            def packed(ctype, scale):
                arr = np.ctypeslib.as_array(
                    C.cast(datap[0], C.POINTER(ctype)), (nb * nch,))
                return (arr.astype(np.float32) * scale).reshape(nb, nch)

            if fmt == AV_SAMPLE_FMT["fltp"]:
                out.append(planar(C.c_float, 1.0))
            elif fmt == AV_SAMPLE_FMT["flt"]:
                out.append(packed(C.c_float, 1.0))
            elif fmt == AV_SAMPLE_FMT["s16p"]:
                out.append(planar(C.c_int16, 1 / 32768.0))
            elif fmt == AV_SAMPLE_FMT["s16"]:
                out.append(packed(C.c_int16, 1 / 32768.0))
            elif fmt == AV_SAMPLE_FMT["s32p"]:
                out.append(planar(C.c_int32, 1 / 2147483648.0))
            elif fmt == AV_SAMPLE_FMT["s32"]:
                out.append(packed(C.c_int32, 1 / 2147483648.0))
            else:
                raise RuntimeError(f"unhandled sample fmt {fmt}")

    def decode(self, packet: bytes) -> np.ndarray:
        """One compressed packet/syncframe → (n, ch) float32 PCM."""
        _, a = _libs()
        out: list = []
        with _lock:
            pkt = _new_packet(bytes(packet))
            a.avcodec_send_packet(C.c_void_p(self.ctx), C.c_void_p(pkt))
            a.av_packet_unref(C.c_void_p(pkt))
            self._recv_all(out)
        if not out:
            return np.zeros((0, max(1, self.channels)), np.float32)
        return np.concatenate(out, 0)

    def flush(self) -> np.ndarray:
        _, a = _libs()
        out: list = []
        with _lock:
            a.avcodec_send_packet(C.c_void_p(self.ctx), None)
            self._recv_all(out)
        if not out:
            return np.zeros((0, max(1, self.channels)), np.float32)
        return np.concatenate(out, 0)


def _bootstrap_frame_probe():
    """Locate AVFrame audio-field offsets by decoding a short AAC burst
    produced by OUR native encoder (read-only pattern scan; safe)."""
    from ..audio.aac import AACEncoder
    t = np.arange(4096) / 48000.0
    pcm = (np.stack([np.sin(2 * np.pi * 440 * t)] * 2, 1)
           .astype(np.float32) * 0.3)
    enc = AACEncoder(48000, 2, quality=120)
    pkts = enc.encode(pcm) + enc.flush()
    srates = [96000, 88200, 64000, 48000, 44100, 32000]
    sri = srates.index(48000)
    dec = AVAudioDecoder("aac")
    for p in pkts:
        ln = len(p) + 7
        hdr = bytes([0xFF, 0xF1, (1 << 6) | (sri << 2),
                     (2 & 3) << 6 | ((ln >> 11) & 3), (ln >> 3) & 0xFF,
                     ((ln & 7) << 5) | 0x1F, 0xFC])
        dec.decode(hdr + p)
        if "frame_chl_cands" in _state:
            return
    raise RuntimeError("avcodec: frame probe decode produced no frames")


# ---------------------------------------------------------------------------
# audio encode (encavcodecaudio.c role)
# ---------------------------------------------------------------------------
_ENC_FMT = {"libmp3lame": "fltp", "libopus": "flt", "libvorbis": "fltp",
            "aac": "fltp", "ac3": "fltp", "eac3": "fltp",
            "libtwolame": "fltp", "flac": "s16", "dca": "s32",
            "mlp": "s16", "truehd": "s16"}


class AVAudioEncoder:
    """Audio encoder over libavcodec (MP3/Opus/Vorbis and friends)."""

    def __init__(self, codec: str, sample_rate: int = 48000,
                 channels: int = 2, bit_rate: int = 160000):
        u, a = _libs()
        if a is None:
            raise RuntimeError("libavcodec unavailable")
        self.codec_name = codec
        self.codec = a.avcodec_find_encoder_by_name(codec.encode())
        if not self.codec:
            raise RuntimeError(f"no encoder {codec}")
        off = _ctx_offsets()
        self.ctx = a.avcodec_alloc_context3(C.c_void_p(self.codec))
        u.av_opt_set_int(C.c_void_p(self.ctx), b"ar", sample_rate, 0)
        u.av_opt_set_int(C.c_void_p(self.ctx), b"b", bit_rate, 0)
        u.av_opt_set_int(C.c_void_p(self.ctx), b"strict", -2, 0)
        u.av_opt_set(C.c_void_p(self.ctx), b"flags", b"+global_header", 0)
        u.av_channel_layout_default(
            C.c_void_p(self.ctx + off["ch_layout"]), channels)
        self.fmt = AV_SAMPLE_FMT[_ENC_FMT.get(codec, "fltp")]
        C.cast(self.ctx + off["sample_fmt"],
               C.POINTER(C.c_int)).contents.value = self.fmt
        if a.avcodec_open2(C.c_void_p(self.ctx), C.c_void_p(self.codec),
                           None) < 0:
            raise RuntimeError(f"open {codec} failed")
        self.frame_size = C.cast(self.ctx + off["frame_size"],
                                 C.POINTER(C.c_int)).contents.value or 1024
        # extradata (Xiph headers for vorbis, OpusHead for opus)
        ptr = C.cast(self.ctx + off["extradata"],
                     C.POINTER(C.c_void_p)).contents.value
        size = C.cast(self.ctx + off["extradata"] + 8,
                      C.POINTER(C.c_int)).contents.value
        self.extradata = C.string_at(ptr, size) if ptr and size > 0 else b""
        self.sample_rate = sample_rate
        self.channels = channels
        self.frame = _Frame()
        self.pkt = a.av_packet_alloc()
        self._pcount = 0
        self._rem = np.zeros((0, channels), np.float32)

    def _recv(self, packets):
        """Drain → [(bytes, duration_samples)] (AVPacket.duration@64 in
        1/sample_rate time_base units — the classic packet layout)."""
        _, a = _libs()
        while True:
            if a.avcodec_receive_packet(C.c_void_p(self.ctx),
                                        C.c_void_p(self.pkt)) < 0:
                return
            p = C.cast(self.pkt, C.POINTER(C.c_void_p * 6)).contents
            ints = C.cast(self.pkt, C.POINTER(C.c_int * 12)).contents
            dur = C.cast(self.pkt + 64,
                         C.POINTER(C.c_longlong)).contents.value
            if not (0 < dur <= 65536):
                dur = self.frame_size
            packets.append((C.string_at(p[3], ints[8]), int(dur)))
            a.av_packet_unref(C.c_void_p(self.pkt))

    def _send_chunk(self, chunk, packets):
        u, a = _libs()
        fs = chunk.shape[0]
        f = self.frame
        u.av_frame_unref(C.c_void_p(f.ptr))
        f.ints()[_Frame.NB_SAMPLES // 4] = fs
        f.ints()[_Frame.FORMAT // 4] = self.fmt
        if "frame_chl_cands" not in _state:
            _bootstrap_frame_probe()
        ok = False
        ordered = ([_state["frame_chl"]] +
                   [c for c in _state["frame_chl_cands"]
                    if c != _state["frame_chl"]])
        for cand in ordered:
            u.av_channel_layout_default(C.c_void_p(f.ptr + cand),
                                        self.channels)
            if u.av_frame_get_buffer(C.c_void_p(f.ptr), 0) >= 0:
                _state["frame_chl"] = cand
                ok = True
                break
            u.av_frame_unref(C.c_void_p(f.ptr))
            f.ints()[_Frame.NB_SAMPLES // 4] = fs
            f.ints()[_Frame.FORMAT // 4] = self.fmt
        if not ok:
            raise RuntimeError("av_frame_get_buffer failed")
        datap = f.data()
        if self.fmt == AV_SAMPLE_FMT["fltp"]:
            for c in range(self.channels):
                ch = np.ascontiguousarray(chunk[:, c], np.float32)
                C.memmove(datap[c], ch.ctypes.data, fs * 4)
        elif self.fmt == AV_SAMPLE_FMT["flt"]:
            fl = np.ascontiguousarray(chunk, np.float32)
            C.memmove(datap[0], fl.ctypes.data, fs * self.channels * 4)
        elif self.fmt == AV_SAMPLE_FMT["s16"]:
            i16 = np.ascontiguousarray(
                np.clip(chunk * 32767.0, -32768, 32767)).astype("<i2")
            C.memmove(datap[0], i16.ctypes.data, fs * self.channels * 2)
        elif self.fmt == AV_SAMPLE_FMT["s32"]:
            i32 = np.ascontiguousarray(np.clip(
                chunk * 2147483392.0, -2 ** 31, 2 ** 31 - 1)).astype("<i4")
            C.memmove(datap[0], i32.ctypes.data, fs * self.channels * 4)
        elif self.fmt == AV_SAMPLE_FMT["s16p"]:
            for c in range(self.channels):
                i16 = np.ascontiguousarray(np.clip(
                    chunk[:, c] * 32767.0, -32768, 32767)).astype("<i2")
                C.memmove(datap[c], i16.ctypes.data, fs * 2)
        else:
            raise RuntimeError("unsupported encode fmt")
        C.cast(f.ptr + _Frame.PTS,
               C.POINTER(C.c_longlong)).contents.value = self._pcount
        self._pcount += fs
        if a.avcodec_send_frame(C.c_void_p(self.ctx),
                                C.c_void_p(f.ptr)) < 0:
            raise RuntimeError("send_frame failed")
        self._recv(packets)

    def encode(self, pcm: np.ndarray) -> list:
        """(n, ch) float32 → list of packets; buffers the remainder."""
        packets: list = []
        with _lock:
            pcm = np.concatenate([self._rem, pcm], 0)
            fs = self.frame_size
            pos = 0
            while pos + fs <= pcm.shape[0]:
                self._send_chunk(pcm[pos:pos + fs], packets)
                pos += fs
            self._rem = pcm[pos:]
        return packets

    def flush(self) -> list:
        _, a = _libs()
        packets: list = []
        with _lock:
            if self._rem.shape[0]:
                pad = np.zeros((self.frame_size - self._rem.shape[0],
                                self.channels), np.float32)
                self._send_chunk(np.concatenate([self._rem, pad], 0),
                                 packets)
                self._rem = self._rem[:0]
            a.avcodec_send_frame(C.c_void_p(self.ctx), None)
            self._recv(packets)
        return packets


# ---------------------------------------------------------------------------
# video encode (encavcodec.c role) + decode fallback (decavcodec.c)
# ---------------------------------------------------------------------------
VIDEO_ENCODERS = {
    # job vcodec → (libavcodec encoder, output ES codec id)
    "mpeg2": ("mpeg2video", "mpeg2"),
    "mpeg4": ("mpeg4", "mpeg4"),
    "vp9": ("libvpx-vp9", "vp9"),
    "ffv1": ("ffv1", "ffv1"),
    "prores": ("prores", "prores"),
    "theora": ("libtheora", "theora"),
    "x264": ("libx264", "h264"),
    "x265": ("libx265", "hevc"),
}


class AVVideoEncoder:
    """YUV420 8-bit encode via the libavcodec catalog."""

    def __init__(self, codec: str, width: int, height: int, fps=(30, 1),
                 bit_rate: int = 0, quality: float | None = None,
                 opts: dict | None = None):
        u, a = _libs()
        if a is None:
            raise RuntimeError("libavcodec unavailable")
        name = VIDEO_ENCODERS.get(codec, (codec,))[0]
        self.codec = a.avcodec_find_encoder_by_name(name.encode())
        if not self.codec:
            raise RuntimeError(f"no encoder {name}")
        off = _ctx_offsets()
        self.ctx = a.avcodec_alloc_context3(C.c_void_p(self.codec))
        u.av_opt_set(C.c_void_p(self.ctx), b"video_size",
                     f"{width}x{height}".encode(), 0)
        if bit_rate:
            u.av_opt_set_int(C.c_void_p(self.ctx), b"b", bit_rate, 0)
        if off["tb_option"]:
            u.av_opt_set(C.c_void_p(self.ctx), b"time_base",
                         f"{fps[1]}/{fps[0]}".encode(), 0)
        C.cast(self.ctx + off["pix_fmt"],
               C.POINTER(C.c_int)).contents.value = AV_PIX_FMT_YUV420P
        u.av_opt_set(C.c_void_p(self.ctx), b"flags", b"+global_header", 0)
        all_opts = dict(opts or {})
        if quality is not None and name in ("libx264", "libx265"):
            all_opts.setdefault("crf", quality)
        elif quality is not None and name == "libvpx-vp9":
            all_opts.setdefault("crf", quality)
        for k, v in all_opts.items():
            u.av_opt_set(C.c_void_p(self.ctx), str(k).encode(),
                         str(v).encode(), 1)
        if a.avcodec_open2(C.c_void_p(self.ctx), C.c_void_p(self.codec),
                           None) < 0:
            raise RuntimeError(f"open {name} failed")
        ptr = C.cast(self.ctx + off["extradata"],
                     C.POINTER(C.c_void_p)).contents.value
        size = C.cast(self.ctx + off["extradata"] + 8,
                      C.POINTER(C.c_int)).contents.value
        self.extradata = C.string_at(ptr, size) if ptr and size > 0 else b""
        self.w, self.h = width, height
        self.frame = _Frame()
        self.pkt = a.av_packet_alloc()
        self._n = 0

    def _recv(self, packets):
        _, a = _libs()
        while True:
            if a.avcodec_receive_packet(C.c_void_p(self.ctx),
                                        C.c_void_p(self.pkt)) < 0:
                return
            p = C.cast(self.pkt, C.POINTER(C.c_void_p * 6)).contents
            ints = C.cast(self.pkt, C.POINTER(C.c_int * 12)).contents
            flags = ints[10]             # AVPacket.flags (after size)
            packets.append((C.string_at(p[3], ints[8]),
                            bool(flags & 1)))
            a.av_packet_unref(C.c_void_p(self.pkt))

    def encode(self, y, u_, v_) -> list:
        """One frame → [(packet_bytes, keyframe)] (0..n packets)."""
        u, a = _libs()
        packets: list = []
        with _lock:
            f = self.frame
            u.av_frame_unref(C.c_void_p(f.ptr))
            f.ints()[_Frame.WIDTH // 4] = self.w
            f.ints()[_Frame.HEIGHT // 4] = self.h
            f.ints()[_Frame.FORMAT // 4] = AV_PIX_FMT_YUV420P
            if u.av_frame_get_buffer(C.c_void_p(f.ptr), 0) < 0:
                raise RuntimeError("av_frame_get_buffer failed")
            datap = f.data()
            lines = f.linesize()
            for ci, plane in enumerate((y, u_, v_)):
                src = np.ascontiguousarray(plane, np.uint8)
                ph, pw = src.shape
                for row in range(ph):
                    C.memmove(datap[ci] + row * lines[ci],
                              src.ctypes.data + row * pw, pw)
            C.cast(f.ptr + _Frame.PTS,
                   C.POINTER(C.c_longlong)).contents.value = self._n
            self._n += 1
            if a.avcodec_send_frame(C.c_void_p(self.ctx),
                                    C.c_void_p(f.ptr)) < 0:
                raise RuntimeError("send_frame failed")
            self._recv(packets)
        return packets

    def flush(self) -> list:
        _, a = _libs()
        packets: list = []
        with _lock:
            a.avcodec_send_frame(C.c_void_p(self.ctx), None)
            self._recv(packets)
        return packets


class AVVideoDecoder:
    """Video decode fallback (decavcodec.c:1709 role) for codecs whose
    native decoders don't cover the stream yet: vp9, theora, and
    universal hevc/av1 input."""

    def __init__(self, codec: str, extradata: bytes = b"",
                 width: int = 0, height: int = 0):
        _, a = _libs()
        if a is None:
            raise RuntimeError("libavcodec unavailable")
        self.codec = a.avcodec_find_decoder_by_name(codec.encode())
        if not self.codec:
            raise RuntimeError(f"no decoder {codec}")
        self.ctx = a.avcodec_alloc_context3(C.c_void_p(self.codec))
        if width and height:
            # intra codecs with out-of-band config (ffv1/prores) need
            # the coded dimensions from the container before open
            off = _ctx_offsets()
            C.cast(self.ctx + off["width"],
                   C.POINTER(C.c_int)).contents.value = width
            C.cast(self.ctx + off["width"] + 4,
                   C.POINTER(C.c_int)).contents.value = height
        if extradata:
            _set_extradata(self.ctx, extradata)
        if a.avcodec_open2(C.c_void_p(self.ctx), C.c_void_p(self.codec),
                           None) < 0:
            raise RuntimeError(f"open {codec} failed")
        self.frame = _Frame()

    def _recv_all(self, out):
        _, a = _libs()
        while True:
            if a.avcodec_receive_frame(C.c_void_p(self.ctx),
                                       C.c_void_p(self.frame.ptr)) < 0:
                return
            f = self.frame
            ints = f.ints()
            w = ints[_Frame.WIDTH // 4]
            h = ints[_Frame.HEIGHT // 4]
            datap = f.data()
            lines = f.linesize()

            def plane(idx, ph, pw):
                ls = lines[idx]
                buf = C.cast(datap[idx],
                             C.POINTER(C.c_uint8 * (ls * ph))).contents
                return np.frombuffer(buf, np.uint8).reshape(
                    ph, ls)[:, :pw].copy()

            out.append((plane(0, h, w),
                        plane(1, (h + 1) // 2, (w + 1) // 2),
                        plane(2, (h + 1) // 2, (w + 1) // 2)))

    def decode(self, packet: bytes) -> list:
        _, a = _libs()
        out: list = []
        with _lock:
            pkt = _new_packet(bytes(packet))
            a.avcodec_send_packet(C.c_void_p(self.ctx), C.c_void_p(pkt))
            a.av_packet_unref(C.c_void_p(pkt))
            self._recv_all(out)
        return out

    def flush(self) -> list:
        _, a = _libs()
        out: list = []
        with _lock:
            a.avcodec_send_packet(C.c_void_p(self.ctx), None)
            self._recv_all(out)
        return out
