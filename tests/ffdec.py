"""Exact-YUV FFmpeg decode oracle via ctypes on cv2's bundled libavcodec.

cv2.VideoCapture only exposes BGR (its converter differs from ours around
chroma edges), so conformance tests drive libavcodec's public C API
directly and read the raw decoded planes. Struct field offsets (AVFrame
width/height/format) are located empirically at import by decoding a probe
stream — no private headers required.
"""
from __future__ import annotations

import ctypes as C
import glob
import os

import numpy as np

_AV_CODEC_IDS = {"h264": 27, "hevc": 173, "mpeg2": 2, "av1": 226,
                 "vp9": 167, "mpeg4": 12}


def _libs():
    # Prefer the system GPL build: it links libx264/libx265/libmp3lame/
    # libopus/libvorbis (superset of OpenCV's LGPL bundle), enabling the
    # north-star x264/x265 anchors and real-stream conformance fixtures.
    sysdir = "/usr/lib/x86_64-linux-gnu"
    try:
        avutil = C.CDLL(os.path.join(sysdir, "libavutil.so.57"),
                        mode=C.RTLD_GLOBAL)
        avcodec = C.CDLL(os.path.join(sysdir, "libavcodec.so.59"),
                         mode=C.RTLD_GLOBAL)
        return avutil, avcodec
    except OSError:
        pass
    import cv2
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(cv2.__file__))), "opencv_python.libs")
    def one(pat):
        m = sorted(glob.glob(os.path.join(root, pat)))
        return C.CDLL(m[-1], mode=C.RTLD_GLOBAL) if m else None
    avutil = one("libavutil*.so*")
    avcodec = one("libavcodec*.so*")
    return avutil, avcodec


_avutil, _avcodec = (None, None)
try:
    _avutil, _avcodec = _libs()
except Exception:
    pass

AVERROR_EAGAIN = -11
AVERROR_EOF = -0x20464F45  # 'EOF '


class _FrameLayout:
    """Empirically located AVFrame offsets (stable: data[8] then
    linesize[8] lead the struct; width/height found by probing)."""
    data_off = 0
    linesize_off = 64
    width_off = None
    height_off = None

    @classmethod
    def locate(cls, frame_ptr, w, h):
        raw = C.cast(frame_ptr, C.POINTER(C.c_int * 64)).contents
        for i in range(2, 60):
            if raw[i] == w and raw[i + 1] == h:
                cls.width_off = i * 4
                cls.height_off = (i + 1) * 4
                return True
        return False


class FFDecoder:
    """Minimal push decoder: feed whole elementary stream, get YUV planes."""

    def __init__(self, codec: str = "h264", bits: int = 8):
        if _avcodec is None:
            raise RuntimeError("libavcodec unavailable")
        self.bits = bits
        self.codec_name = codec
        a = _avcodec
        a.avcodec_find_decoder.restype = C.c_void_p
        a.avcodec_find_decoder_by_name.restype = C.c_void_p
        a.avcodec_alloc_context3.restype = C.c_void_p
        a.av_packet_alloc.restype = C.c_void_p
        _avutil.av_frame_alloc.restype = C.c_void_p
        _avutil.av_malloc.restype = C.c_void_p
        self.codec = a.avcodec_find_decoder_by_name(codec.encode()) \
            or a.avcodec_find_decoder(_AV_CODEC_IDS.get(codec, 0))
        if not self.codec:
            raise RuntimeError(f"no decoder for {codec}")
        self.ctx = a.avcodec_alloc_context3(C.c_void_p(self.codec))
        if a.avcodec_open2(C.c_void_p(self.ctx), C.c_void_p(self.codec),
                           None) < 0:
            raise RuntimeError("avcodec_open2 failed")
        self.frame = _avutil.av_frame_alloc()
        self.pkt = a.av_packet_alloc()

    def _send(self, data: bytes | None):
        a = _avcodec
        if data is None:
            return a.avcodec_send_packet(C.c_void_p(self.ctx), None)
        buf = _avutil.av_malloc(len(data) + 64)
        C.memmove(buf, data, len(data))
        C.memset(buf + len(data), 0, 64)
        if a.av_packet_from_data(C.c_void_p(self.pkt), C.c_void_p(buf),
                                 len(data)) < 0:
            raise RuntimeError("av_packet_from_data failed")
        r = a.avcodec_send_packet(C.c_void_p(self.ctx), C.c_void_p(self.pkt))
        a.av_packet_unref(C.c_void_p(self.pkt))
        return r

    def _recv(self):
        r = _avcodec.avcodec_receive_frame(C.c_void_p(self.ctx),
                                           C.c_void_p(self.frame))
        if r < 0:
            return None
        return self._planes()

    def _planes(self):
        f = self.frame
        datap = C.cast(f, C.POINTER(C.c_void_p * 8)).contents
        lines = C.cast(f + _FrameLayout.linesize_off,
                       C.POINTER(C.c_int * 8)).contents
        if _FrameLayout.width_off is None:
            # find (w, h) pair: scan for two plausible consecutive ints
            # matching linesize[0] >= w
            raw = C.cast(f, C.POINTER(C.c_int * 96)).contents
            for i in range(24, 90):
                w_, h_ = raw[i], raw[i + 1]
                if 16 <= w_ <= 8192 and 16 <= h_ <= 8192 \
                        and lines[0] >= w_ and lines[1] >= (w_ + 1) // 2:
                    _FrameLayout.width_off = i * 4
                    _FrameLayout.height_off = (i + 1) * 4
                    break
            if _FrameLayout.width_off is None:
                raise RuntimeError("could not locate AVFrame width/height")
        raw = C.cast(f, C.POINTER(C.c_int * 96)).contents
        w = raw[_FrameLayout.width_off // 4]
        h = raw[_FrameLayout.height_off // 4]

        def plane(idx, ph, pw, bps=1):
            ls = lines[idx]
            buf = C.cast(datap[idx],
                         C.POINTER(C.c_uint8 * (ls * ph))).contents
            arr = np.frombuffer(buf, np.uint8).reshape(ph, ls)
            if bps == 2:
                return arr[:, :pw * 2].copy().view("<u2")[:, :pw].copy()
            return arr[:, :pw].copy()

        bps = 2 if self.bits > 8 else 1
        y = plane(0, h, w, bps=bps)
        u = plane(1, (h + 1) // 2, (w + 1) // 2, bps=bps)
        v = plane(2, (h + 1) // 2, (w + 1) // 2, bps=bps)
        return y, u, v

    @staticmethod
    def _split_aus_annexb(stream: bytes, kind: str) -> list:
        """Split an annex-B stream into access units.  A picture may span
        several slice NALs; a new AU starts at a VCL NAL whose
        first_mb_in_slice is 0 (first slice-header bit '1' for h264;
        first_slice_segment_in_pic flag for hevc)."""
        import re
        # x264/x265 use 4-byte start codes for AU-leading NALs and 3-byte
        # for the rest; match 3-byte and absorb a preceding zero.
        starts = []
        for m in re.finditer(b"\x00\x00\x01", stream):
            s = m.start()
            if s > 0 and stream[s - 1] == 0:
                s -= 1
            starts.append(s)
        starts = [s for i, s in enumerate(starts)
                  if i == 0 or s > starts[i - 1] + 2]
        if not starts:
            return [stream]
        starts.append(len(stream))
        aus, cur = [], b""
        cur_has_vcl = False
        for s, e in zip(starts, starts[1:]):
            nal = stream[s:e]
            off = 4 if nal[:4] == b"\x00\x00\x00\x01" else 3
            if kind == "h264":
                vcl = (nal[off] & 0x1F) in (1, 5)
                first = vcl and len(nal) > off + 1 and \
                    (nal[off + 1] & 0x80) != 0
            else:  # hevc: nal_unit_type in [0, 31] are VCL
                vcl = ((nal[off] >> 1) & 0x3F) <= 31
                first = vcl and len(nal) > off + 2 and \
                    (nal[off + 2] & 0x80) != 0
            if vcl and first and cur_has_vcl:
                aus.append(cur)
                cur = b""
                cur_has_vcl = False
            cur += nal
            cur_has_vcl = cur_has_vcl or vcl
        if cur:
            aus.append(cur)
        return aus

    def decode(self, stream: bytes) -> list:
        """Feed an elementary stream; return all decoded frames in output
        order. Annex-B input is split into per-access-unit packets (the
        decoder wants one AU per avcodec_send_packet)."""
        if self.codec_name in ("h264", "hevc"):
            pkts = self._split_aus_annexb(stream, self.codec_name)
        else:
            pkts = [stream]
        out = []
        for p in pkts:
            self._send(p)
            while True:
                f = self._recv()
                if f is None:
                    break
                out.append(f)
        self._send(None)  # flush
        while True:
            f = self._recv()
            if f is None:
                break
            out.append(f)
        return out

    def close(self):
        pass


def decode_yuv(stream: bytes, codec: str = "h264", bits: int = 8) -> list:
    """One-shot exact-YUV decode of an elementary stream."""
    return FFDecoder(codec, bits=bits).decode(stream)


def available() -> bool:
    return _avcodec is not None


def decode_yuv_packets(packets, codec: str, bits: int = 8) -> list:
    """Decode a list of pre-framed packets (e.g. VP9/AV1 OBU frames)."""
    d = FFDecoder(codec, bits=bits)
    out = []
    for p in packets:
        d._send(p)
        while True:
            f = d._recv()
            if f is None:
                break
            out.append(f)
    d._send(None)
    while True:
        f = d._recv()
        if f is None:
            break
        out.append(f)
    return out
