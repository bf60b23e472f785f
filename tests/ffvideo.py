"""Video encode oracle via ctypes on cv2's bundled libavcodec.

Provides FFVideoEncoder for the encoders the bundle ships (libvpx-vp9,
mpeg4, mpeg2video) so the RD harness can anchor our codecs against
independent encoders at multiple rate points.  AVCodecContext field
offsets (width/height/pix_fmt/time_base) are located empirically — same
approach as tests/ffdec.py / tests/ffaudio.py.
"""
from __future__ import annotations

import ctypes as C

import numpy as np

import ffdec

AV_OPT_SEARCH_CHILDREN = 1
AV_PIX_FMT_YUV420P = 0

_off = {}


def available():
    return ffdec._avcodec is not None


def _a():
    return ffdec._avcodec


def _u():
    return ffdec._avutil


def _protos():
    a, u = _a(), _u()
    a.avcodec_find_encoder_by_name.restype = C.c_void_p
    a.avcodec_find_encoder_by_name.argtypes = [C.c_char_p]
    a.avcodec_alloc_context3.restype = C.c_void_p
    a.avcodec_alloc_context3.argtypes = [C.c_void_p]
    a.av_packet_alloc.restype = C.c_void_p
    u.av_frame_alloc.restype = C.c_void_p
    u.av_opt_set.argtypes = [C.c_void_p, C.c_char_p, C.c_char_p, C.c_int]
    u.av_opt_set_int.argtypes = [C.c_void_p, C.c_char_p, C.c_longlong,
                                 C.c_int]


_protos()


def _locate_video_offsets():
    """Find width/height/pix_fmt/time_base offsets in AVCodecContext by
    probing an mpeg4 encoder context with open2 as the oracle."""
    if _off:
        return
    a, u = _a(), _u()
    codec = a.avcodec_find_encoder_by_name(b"mpeg4")
    assert codec
    # width/height: set via the "video_size" AVOption if present, else by
    # scanning after av_opt failure is not an option → use video_size
    ctx = a.avcodec_alloc_context3(C.c_void_p(codec))
    magicw, magich = 1452, 788
    r = u.av_opt_set(C.c_void_p(ctx), b"video_size",
                     f"{magicw}x{magich}".encode(), 0)
    assert r == 0, f"video_size option missing ({r})"
    raw = C.cast(ctx, C.POINTER(C.c_int * 700)).contents
    cand = [i * 4 for i in range(699) if raw[i] == magicw
            and raw[i + 1] == magich]
    assert cand, "width/height not found"
    _off["width"] = cand[0]
    # time_base: try the AVOption first
    tb_opt = u.av_opt_set(C.c_void_p(ctx), b"time_base", b"1/30", 0) == 0
    _off["tb_option"] = tb_opt
    if not tb_opt:
        # probe: known AVRational near bit_rate_tolerance; brute force over
        # int-pair offsets, validated by a successful open below
        pass
    # pix_fmt + (maybe) time_base via open2 probe
    found = False
    tb_candidates = [None] if tb_opt else list(range(96, 400, 4))
    for tb in tb_candidates:
        for pf in range(_off["width"] + 8, _off["width"] + 160, 4):
            ctx2 = a.avcodec_alloc_context3(C.c_void_p(codec))
            u.av_opt_set(C.c_void_p(ctx2), b"video_size", b"64x48", 0)
            u.av_opt_set_int(C.c_void_p(ctx2), b"b", 400000, 0)
            if tb_opt:
                u.av_opt_set(C.c_void_p(ctx2), b"time_base", b"1/30", 0)
            else:
                C.cast(ctx2 + tb, C.POINTER(C.c_int * 2)).contents[:] = \
                    [1, 30]
            old = C.cast(ctx2 + pf, C.POINTER(C.c_int)).contents.value
            if old != -1:        # pix_fmt defaults to AV_PIX_FMT_NONE
                continue
            C.cast(ctx2 + pf, C.POINTER(C.c_int)).contents.value = \
                AV_PIX_FMT_YUV420P
            if a.avcodec_open2(C.c_void_p(ctx2), C.c_void_p(codec),
                               None) >= 0:
                _off["pix_fmt"] = pf
                if not tb_opt:
                    _off["time_base"] = tb
                found = True
                break
        if found:
            break
    assert found, "pix_fmt/time_base probe failed"


class FFVideoEncoder:
    """Encode uint8 YUV420 frames with a bundled libavcodec encoder."""

    def __init__(self, codec="libvpx-vp9", width=320, height=192, fps=30,
                 bit_rate=0, opts=None):
        _locate_video_offsets()
        a, u = _a(), _u()
        self.codec = a.avcodec_find_encoder_by_name(codec.encode())
        if not self.codec:
            raise RuntimeError(f"no encoder {codec}")
        self.ctx = a.avcodec_alloc_context3(C.c_void_p(self.codec))
        u.av_opt_set(C.c_void_p(self.ctx), b"video_size",
                     f"{width}x{height}".encode(), 0)
        u.av_opt_set_int(C.c_void_p(self.ctx), b"b", bit_rate, 0)
        if _off["tb_option"]:
            u.av_opt_set(C.c_void_p(self.ctx), b"time_base",
                         f"1/{fps}".encode(), 0)
        else:
            C.cast(self.ctx + _off["time_base"],
                   C.POINTER(C.c_int * 2)).contents[:] = [1, fps]
        C.cast(self.ctx + _off["pix_fmt"],
               C.POINTER(C.c_int)).contents.value = AV_PIX_FMT_YUV420P
        for k, v in (opts or {}).items():
            u.av_opt_set(C.c_void_p(self.ctx), k.encode(),
                         str(v).encode(), AV_OPT_SEARCH_CHILDREN)
        if a.avcodec_open2(C.c_void_p(self.ctx), C.c_void_p(self.codec),
                           None) < 0:
            raise RuntimeError("open2 failed")
        self.w, self.h = width, height
        self.frame = u.av_frame_alloc()
        self.pkt = a.av_packet_alloc()

    def encode(self, frames):
        """frames: [(y, u, v)] uint8 → list of packets (bytes)."""
        a, u = _a(), _u()
        packets = []

        def recv():
            while True:
                if a.avcodec_receive_packet(C.c_void_p(self.ctx),
                                            C.c_void_p(self.pkt)) < 0:
                    return
                p = C.cast(self.pkt, C.POINTER(C.c_void_p * 6)).contents
                ints = C.cast(self.pkt, C.POINTER(C.c_int * 12)).contents
                packets.append(C.string_at(p[3], ints[8]))
                a.av_packet_unref(C.c_void_p(self.pkt))

        for n, (y, uu, vv) in enumerate(frames):
            f = self.frame
            u.av_frame_unref(C.c_void_p(f))
            C.cast(f + ffdec._FrameLayout.linesize_off - 0,
                   C.POINTER(C.c_int)).contents.value = 0  # noop keep
            # width @104, height @108, format @116 (classic layout)
            C.cast(f + 104, C.POINTER(C.c_int)).contents.value = self.w
            C.cast(f + 108, C.POINTER(C.c_int)).contents.value = self.h
            C.cast(f + 116, C.POINTER(C.c_int)).contents.value = \
                AV_PIX_FMT_YUV420P
            if u.av_frame_get_buffer(C.c_void_p(f), 0) < 0:
                raise RuntimeError("av_frame_get_buffer failed")
            datap = C.cast(f, C.POINTER(C.c_void_p * 8)).contents
            lines = C.cast(f + ffdec._FrameLayout.linesize_off,
                           C.POINTER(C.c_int * 8)).contents
            for ci, plane in enumerate((y, uu, vv)):
                ph, pw = plane.shape
                src = np.ascontiguousarray(plane, np.uint8)
                for row in range(ph):
                    C.memmove(datap[ci] + row * lines[ci],
                              src.ctypes.data + row * pw, pw)
            # pts @ offset 120? set via int64 write at frame+120..128 is
            # version-fragile; monotonically increasing pts via av_opt not
            # available — most encoders accept AV_NOPTS but libvpx needs
            # pts: frame.pts is the first int64 after format/pict_type…
            # empirically at offset 120 for the classic layout.
            C.cast(f + 120, C.POINTER(C.c_longlong)).contents.value = n
            if a.avcodec_send_frame(C.c_void_p(self.ctx),
                                    C.c_void_p(f)) < 0:
                raise RuntimeError("send_frame failed")
            recv()
        a.avcodec_send_frame(C.c_void_p(self.ctx), None)
        recv()
        return packets
