"""Audio encode/decode oracle via ctypes on cv2's bundled libavcodec.

Drives the public C API (avcodec_send_packet/receive_frame and
send_frame/receive_packet).  Struct field offsets are located
empirically at import time — AVFrame audio fields by decoding a probe
stream, AVCodecContext fields via AVOption round-trips — so no private
headers are required (same approach as tests/ffdec.py).

Used to GENERATE real-world audio bitstreams (AAC/AC3/...) as decoder
test vectors and to independently verify our encoders' output.
"""
from __future__ import annotations

import ctypes as C

import numpy as np

import ffdec

AV_SAMPLE_FMT_S16 = 1
AV_SAMPLE_FMT_FLT = 3
AV_SAMPLE_FMT_S16P = 6
AV_SAMPLE_FMT_FLTP = 8

_CODEC_IDS = {"aac": 86018, "ac3": 86019, "mp3": 86017, "flac": 86028,
              "vorbis": 86021, "opus": 86076, "mp2": 86016}

AVERROR_EAGAIN = -11

# classic stable AVFrame prefix: data[8] @0, linesize[8] @64,
# extended_data @96, width @104, height @108, nb_samples @112, format @116
FRAME_NB_SAMPLES = 112
FRAME_FORMAT = 116
_frame_ch_layout_off = None     # located by probe decode
_frame_ch_layout_cands = []     # all plausible offsets (old vs new field)
_ctx_off = {}                   # per-field AVCodecContext offsets


def available():
    return ffdec._avcodec is not None


def _a():
    return ffdec._avcodec


def _u():
    return ffdec._avutil


def _setup_protos():
    a, u = _a(), _u()
    a.avcodec_find_encoder_by_name.restype = C.c_void_p
    a.avcodec_find_encoder_by_name.argtypes = [C.c_char_p]
    a.avcodec_find_encoder.restype = C.c_void_p
    a.avcodec_find_decoder.restype = C.c_void_p
    a.avcodec_find_decoder_by_name.restype = C.c_void_p
    a.avcodec_find_decoder_by_name.argtypes = [C.c_char_p]
    a.avcodec_alloc_context3.restype = C.c_void_p
    a.avcodec_alloc_context3.argtypes = [C.c_void_p]
    a.av_packet_alloc.restype = C.c_void_p
    u.av_frame_alloc.restype = C.c_void_p
    u.av_malloc.restype = C.c_void_p
    u.av_malloc.argtypes = [C.c_size_t]
    u.av_opt_set_int.argtypes = [C.c_void_p, C.c_char_p, C.c_longlong,
                                 C.c_int]
    u.av_channel_layout_default.argtypes = [C.c_void_p, C.c_int]


_setup_protos()


def _locate_ctx_offsets(ctx):
    """Find sample_rate / sample_fmt / ch_layout offsets via AVOptions."""
    global _ctx_off
    if _ctx_off:
        return
    u = _u()
    magic = 48271
    assert u.av_opt_set_int(C.c_void_p(ctx), b"ar", magic, 0) == 0
    raw = C.cast(ctx, C.POINTER(C.c_int * 700)).contents
    srs = [i * 4 for i in range(700) if raw[i] == magic]
    assert len(srs) == 1, srs
    _ctx_off["sample_rate"] = srs[0]
    u.av_opt_set_int(C.c_void_p(ctx), b"ar", 0, 0)
    # ch_layout: set 7 channels (uncommon), find the AVChannelLayout
    # pattern (order, nb_channels=7) in the context
    u.av_opt_set.argtypes = [C.c_void_p, C.c_char_p, C.c_char_p, C.c_int]
    r = u.av_opt_set(C.c_void_p(ctx), b"ch_layout", b"7c", 0)
    if r != 0:
        r = u.av_opt_set_int(C.c_void_p(ctx), b"ac", 7, 0)
    assert r == 0, f"cannot set channel count ({r})"
    raw = C.cast(ctx, C.POINTER(C.c_int * 700)).contents
    cand = [i * 4 for i in range(1, 700) if raw[i] == 7
            and raw[i - 1] in (0, 1)]
    assert cand, "ch_layout not found"
    _ctx_off["ch_layout"] = cand[0] - 4   # order field
    # sample_fmt: no AVOption — probe adjacent to sample_rate later
    return


class FFAudioDecoder:
    """Feed packets of an elementary audio stream; get float32 PCM."""

    def __init__(self, codec="aac", extradata=b""):
        a, u = _a(), _u()
        self.codec = a.avcodec_find_decoder_by_name(codec.encode()) or \
            a.avcodec_find_decoder(_CODEC_IDS[codec])
        if not self.codec:
            raise RuntimeError(f"no decoder {codec}")
        self.ctx = a.avcodec_alloc_context3(C.c_void_p(self.codec))
        if extradata:
            buf = u.av_malloc(len(extradata) + 64)
            C.memmove(buf, extradata, len(extradata))
            C.memset(buf + len(extradata), 0, 64)
            # extradata/extradata_size offsets: locate by scanning for the
            # pointer after writing via av_opt? Use field probe: set via
            # known layout — extradata follows flags/flags2 (version
            # dependent); instead use av_opt "extradata"? Not an option.
            # Locate empirically: write pointer at candidate offsets is
            # unsafe; instead parse-time config via packet side data is
            # unavailable — so we require ADTS for AAC (self-contained).
            raise NotImplementedError("use ADTS/self-contained streams")
        if a.avcodec_open2(C.c_void_p(self.ctx), C.c_void_p(self.codec),
                           None) < 0:
            raise RuntimeError("open2 failed")
        self.frame = u.av_frame_alloc()
        self.pkt = a.av_packet_alloc()

    def _recv_all(self, out):
        global _frame_ch_layout_off
        a = _a()
        while True:
            r = a.avcodec_receive_frame(C.c_void_p(self.ctx),
                                        C.c_void_p(self.frame))
            if r < 0:
                return
            f = self.frame
            ints = C.cast(f, C.POINTER(C.c_int * 200)).contents
            nb = ints[FRAME_NB_SAMPLES // 4]
            fmt = ints[FRAME_FORMAT // 4]
            if _frame_ch_layout_off is None:
                # AVChannelLayout: order(0/1), nb_channels, u.mask with
                # popcount(mask) == nb_channels (or mask 0, custom order).
                # Older libavutil also has a deprecated channel_layout
                # mask + channels pair that can false-positive; collect
                # ALL candidates, encoders validate via get_buffer.
                for i in range(30, 190):
                    if ints[i] in (0, 1) and 1 <= ints[i + 1] <= 8:
                        mask = (C.cast(f + i * 4 + 8,
                                       C.POINTER(C.c_ulonglong))
                                .contents.value)
                        if mask and bin(mask).count("1") == ints[i + 1]:
                            if i * 4 not in _frame_ch_layout_cands:
                                _frame_ch_layout_cands.append(i * 4)
                assert _frame_ch_layout_cands
                # the deprecated channel_layout pair appears EARLIER in
                # the struct; the real AVChannelLayout is the last hit
                _frame_ch_layout_off = _frame_ch_layout_cands[-1]
            nch = ints[_frame_ch_layout_off // 4 + 1]
            datap = C.cast(f, C.POINTER(C.c_void_p * 8)).contents
            if fmt == AV_SAMPLE_FMT_FLTP:
                chans = []
                for c in range(nch):
                    arr = np.ctypeslib.as_array(
                        C.cast(datap[c], C.POINTER(C.c_float)), (nb,))
                    chans.append(arr.copy())
                out.append(np.stack(chans, 1))
            elif fmt == AV_SAMPLE_FMT_FLT:
                arr = np.ctypeslib.as_array(
                    C.cast(datap[0], C.POINTER(C.c_float)), (nb * nch,))
                out.append(arr.copy().reshape(nb, nch))
            elif fmt == AV_SAMPLE_FMT_S16P:
                chans = []
                for c in range(nch):
                    arr = np.ctypeslib.as_array(
                        C.cast(datap[c], C.POINTER(C.c_int16)), (nb,))
                    chans.append(arr.astype(np.float32) / 32768.0)
                out.append(np.stack(chans, 1))
            elif fmt == AV_SAMPLE_FMT_S16:
                arr = np.ctypeslib.as_array(
                    C.cast(datap[0], C.POINTER(C.c_int16)), (nb * nch,))
                out.append((arr.astype(np.float32) / 32768.0)
                           .reshape(nb, nch))
            else:
                raise RuntimeError(f"unhandled sample fmt {fmt}")

    def decode_packets(self, packets):
        """packets: list of bytes → (n_samples, n_ch) float32."""
        a, u = _a(), _u()
        out = []
        for p in packets:
            buf = u.av_malloc(len(p) + 64)
            C.memmove(buf, p, len(p))
            C.memset(buf + len(p), 0, 64)
            a.av_packet_from_data(C.c_void_p(self.pkt), C.c_void_p(buf),
                                  len(p))
            a.avcodec_send_packet(C.c_void_p(self.ctx), C.c_void_p(self.pkt))
            a.av_packet_unref(C.c_void_p(self.pkt))
            self._recv_all(out)
        a.avcodec_send_packet(C.c_void_p(self.ctx), None)
        self._recv_all(out)
        if not out:
            return np.zeros((0, 1), np.float32)
        return np.concatenate(out, 0)


def _locate_frame_size():
    """Find AVCodecContext.frame_size by opening aac (frame_size 1024)
    and ac3 (1536) and intersecting the candidate offsets."""
    a, u = _a(), _u()
    cands = None
    for name, want in (("aac", 1024), ("ac3", 1536)):
        codec = a.avcodec_find_encoder_by_name(name.encode())
        if not codec:
            return
        ctx = a.avcodec_alloc_context3(C.c_void_p(codec))
        _locate_ctx_offsets(ctx)
        u.av_opt_set_int(C.c_void_p(ctx), b"ar", 48000, 0)
        u.av_opt_set_int(C.c_void_p(ctx), b"b", 192000, 0)
        u.av_channel_layout_default(
            C.c_void_p(ctx + _ctx_off["ch_layout"]), 2)
        if "sample_fmt" in _ctx_off:
            C.cast(ctx + _ctx_off["sample_fmt"],
                   C.POINTER(C.c_int)).contents.value = AV_SAMPLE_FMT_FLTP
        if a.avcodec_open2(C.c_void_p(ctx), C.c_void_p(codec), None) < 0:
            return
        raw = C.cast(ctx, C.POINTER(C.c_int * 700)).contents
        here = {i * 4 for i in range(700) if raw[i] == want}
        cands = here if cands is None else (cands & here)
    if cands and len(cands) >= 1:
        _ctx_off["frame_size"] = sorted(cands)[0]


class FFAudioEncoder:
    """Encode float32 PCM with a bundled libavcodec encoder (e.g. aac)."""

    def __init__(self, codec="aac", sample_rate=44100, channels=2,
                 bit_rate=128000, sample_fmt="fltp"):
        a, u = _a(), _u()
        self.codec_name = codec
        self.codec = a.avcodec_find_encoder_by_name(codec.encode())
        if not self.codec:
            raise RuntimeError(f"no encoder {codec}")
        self.ctx = a.avcodec_alloc_context3(C.c_void_p(self.codec))
        _locate_ctx_offsets(self.ctx)
        off_sr = _ctx_off["sample_rate"]
        u.av_opt_set_int(C.c_void_p(self.ctx), b"ar", sample_rate, 0)
        u.av_opt_set_int(C.c_void_p(self.ctx), b"b", bit_rate, 0)
        u.av_opt_set_int(C.c_void_p(self.ctx), b"strict", -2, 0)
        u.av_channel_layout_default(
            C.c_void_p(self.ctx + _ctx_off["ch_layout"]), channels)
        # sample_fmt: probe int fields near sample_rate; aac wants
        # fltp(8); mp2/pcm-style encoders want packed s16(1)
        self.sample_fmt = {"fltp": AV_SAMPLE_FMT_FLTP, "s16": 1,
                           "s32": 2, "flt": 3, "s16p": 6,
                           "s32p": 7}[sample_fmt]
        opened = False
        if "sample_fmt" in _ctx_off:
            off = _ctx_off["sample_fmt"]
            C.cast(self.ctx + off, C.POINTER(C.c_int)).contents.value = \
                self.sample_fmt
            opened = a.avcodec_open2(C.c_void_p(self.ctx),
                                     C.c_void_p(self.codec), None) >= 0
        else:
            # sample_fmt has no AVOption; it defaults to
            # AV_SAMPLE_FMT_NONE (-1).  Probe every -1 int field near
            # sample_rate with a FRESH context per attempt (open2 is not
            # retryable on a failed context in all versions).
            raw0 = C.cast(self.ctx, C.POINTER(C.c_int * 700)).contents
            cands = [i * 4 for i in range(700) if raw0[i] == -1]
            cands.sort(key=lambda o: abs(o - off_sr))
            for off in cands:
                ctx2 = a.avcodec_alloc_context3(C.c_void_p(self.codec))
                u.av_opt_set_int(C.c_void_p(ctx2), b"ar", sample_rate, 0)
                u.av_opt_set_int(C.c_void_p(ctx2), b"b", bit_rate, 0)
                u.av_opt_set_int(C.c_void_p(ctx2), b"strict", -2, 0)
                u.av_channel_layout_default(
                    C.c_void_p(ctx2 + _ctx_off["ch_layout"]), channels)
                C.cast(ctx2 + off, C.POINTER(C.c_int)).contents.value = \
                    self.sample_fmt
                if a.avcodec_open2(C.c_void_p(ctx2), C.c_void_p(self.codec),
                                   None) >= 0:
                    _ctx_off["sample_fmt"] = off
                    self.ctx = ctx2
                    opened = True
                    break
        if not opened:
            raise RuntimeError("could not open encoder (sample_fmt probe)")
        # frame_size: locate the AVCodecContext field once by
        # intersecting offsets holding known sizes for aac (1024) and
        # ac3 (1536) freshly-opened contexts, then read it here.
        if "frame_size" not in _ctx_off:
            _locate_frame_size()
        if "frame_size" in _ctx_off:
            self.frame_size = C.cast(
                self.ctx + _ctx_off["frame_size"],
                C.POINTER(C.c_int)).contents.value
        else:
            try:
                a.av_get_audio_frame_duration.restype = C.c_int
                self.frame_size = a.av_get_audio_frame_duration(
                    C.c_void_p(self.ctx), 0)
            except Exception:
                self.frame_size = 0
        if not self.frame_size:
            self.frame_size = 1024
        self.channels = channels
        self.sample_rate = sample_rate
        self.frame = u.av_frame_alloc()
        self.pkt = a.av_packet_alloc()

    def encode(self, pcm):
        """pcm: (n, ch) float32 → list of encoded packets (bytes)."""
        global _frame_ch_layout_off
        a, u = _a(), _u()
        if _frame_ch_layout_off is None:
            raise RuntimeError("decode a probe stream first "
                               "(frame ch_layout offset unknown)")
        packets = []
        n = pcm.shape[0]
        fs = self.frame_size
        pos = 0
        pkt_i64 = C.cast(self.pkt, C.POINTER(C.c_longlong * 4)).contents

        def recv():
            while True:
                r = a.avcodec_receive_packet(C.c_void_p(self.ctx),
                                             C.c_void_p(self.pkt))
                if r < 0:
                    return
                # AVPacket: buf*, pts, dts, data*, size
                p = C.cast(self.pkt,
                           C.POINTER(C.c_void_p * 6)).contents
                ints = C.cast(self.pkt, C.POINTER(C.c_int * 12)).contents
                data = p[3]
                size = ints[8]
                packets.append(C.string_at(data, size))
                a.av_packet_unref(C.c_void_p(self.pkt))

        while pos < n:
            chunk = pcm[pos:pos + fs]
            pos += fs
            if chunk.shape[0] < fs:
                chunk = np.vstack([chunk, np.zeros(
                    (fs - chunk.shape[0], self.channels), np.float32)])
            f = self.frame
            u.av_frame_unref(C.c_void_p(f))
            C.cast(f + FRAME_NB_SAMPLES,
                   C.POINTER(C.c_int)).contents.value = fs
            C.cast(f + FRAME_FORMAT,
                   C.POINTER(C.c_int)).contents.value = self.sample_fmt
            # the decode probe may collect both the new AVChannelLayout
            # and the deprecated channel_layout pair; validate via
            # get_buffer which requires a usable layout
            ok = False
            for cand in ([_frame_ch_layout_off] +
                         [c for c in _frame_ch_layout_cands
                          if c != _frame_ch_layout_off]):
                u.av_channel_layout_default(
                    C.c_void_p(f + cand), self.channels)
                if u.av_frame_get_buffer(C.c_void_p(f), 0) >= 0:
                    _frame_ch_layout_off = cand
                    ok = True
                    break
            if not ok:
                raise RuntimeError("av_frame_get_buffer failed")
            datap = C.cast(f, C.POINTER(C.c_void_p * 8)).contents
            if self.sample_fmt == 1:       # packed s16, interleaved
                i16 = np.ascontiguousarray(
                    np.clip(chunk * 32767.0, -32768, 32767), np.float32
                ).astype("<i2")
                C.memmove(datap[0], i16.ctypes.data,
                          fs * self.channels * 2)
            elif self.sample_fmt == 2:     # packed s32, interleaved
                i32 = np.ascontiguousarray(np.clip(
                    chunk * 2147483392.0, -2 ** 31,
                    2 ** 31 - 1)).astype("<i4")
                C.memmove(datap[0], i32.ctypes.data,
                          fs * self.channels * 4)
            elif self.sample_fmt == 3:     # packed float, interleaved
                fl = np.ascontiguousarray(chunk, np.float32)
                C.memmove(datap[0], fl.ctypes.data,
                          fs * self.channels * 4)
            elif self.sample_fmt == 6:     # planar s16
                for c in range(self.channels):
                    i16 = np.ascontiguousarray(np.clip(
                        chunk[:, c] * 32767.0, -32768, 32767)).astype("<i2")
                    C.memmove(datap[c], i16.ctypes.data, fs * 2)
            elif self.sample_fmt == 7:     # planar s32
                for c in range(self.channels):
                    i32 = np.ascontiguousarray(np.clip(
                        chunk[:, c] * 2147483392.0, -2 ** 31,
                        2 ** 31 - 1)).astype("<i4")
                    C.memmove(datap[c], i32.ctypes.data, fs * 4)
            else:
                for c in range(self.channels):
                    ch = np.ascontiguousarray(chunk[:, c], np.float32)
                    C.memmove(datap[c], ch.ctypes.data, fs * 4)
            if a.avcodec_send_frame(C.c_void_p(self.ctx),
                                    C.c_void_p(f)) < 0:
                raise RuntimeError("send_frame failed")
            recv()
        a.avcodec_send_frame(C.c_void_p(self.ctx), None)
        recv()
        return packets


def adts_wrap(packets, sample_rate=44100, channels=2, profile=1):
    """Wrap raw AAC packets in ADTS headers (for self-contained decode)."""
    srates = [96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
              16000, 12000, 11025, 8000, 7350]
    sri = srates.index(sample_rate)
    out = b""
    for p in packets:
        ln = len(p) + 7
        hdr = bytearray(7)
        hdr[0] = 0xFF
        hdr[1] = 0xF1                      # MPEG-4, no CRC
        hdr[2] = (profile << 6) | (sri << 2) | (channels >> 2)
        hdr[3] = ((channels & 3) << 6) | ((ln >> 11) & 3)
        hdr[4] = (ln >> 3) & 0xFF
        hdr[5] = ((ln & 7) << 5) | 0x1F
        hdr[6] = 0xFC
        out += bytes(hdr) + p
    return out
