"""Build + load the native runtime library (g++, cached by source hash).

The reference builds its native engine with a custom make system
(contrib/ + libhb); here a single translation unit per module keeps the
toolchain to `g++ -O3 -shared -fPIC` with no external dependencies. The
compiled .so is cached under ~/.cache/handbrake_tpu keyed by the sha256 of
the sources, so rebuilds happen only when the source or tables change.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.environ.get(
    "HBTPU_NATIVE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "handbrake_tpu"))

_lock = threading.Lock()
_lib = [None]
_failed = [False]


def _sources() -> tuple:
    from . import gen_tables
    tables = gen_tables.generate()
    with open(os.path.join(_DIR, "hb264.cpp")) as f:
        cpp = f.read()
    aux = {}
    for name in ("cabac264.h", "cabac_tables_h264.h", "hbdec264.cpp",
                 "hbdecmjpeg.cpp"):
        with open(os.path.join(_DIR, name)) as f:
            aux[name] = f.read()
    return tables, cpp, aux


def _build() -> str | None:
    tables, cpp, aux = _sources()
    key = hashlib.sha256(
        (tables + cpp + "".join(aux.values())).encode()).hexdigest()[:16]
    os.makedirs(_CACHE, exist_ok=True)
    so_path = os.path.join(_CACHE, f"hb264_{key}.so")
    if os.path.exists(so_path):
        return so_path
    workdir = os.path.join(_CACHE, f"build_{key}")
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "cavlc_tables.h"), "w") as f:
        f.write(tables)
    for name, text in aux.items():
        with open(os.path.join(workdir, name), "w") as f:
            f.write(text)
    src = os.path.join(workdir, "hb264.cpp")
    with open(src, "w") as f:
        f.write(cpp)
    src2 = os.path.join(workdir, "hbdec264.cpp")
    src3 = os.path.join(workdir, "hbdecmjpeg.cpp")
    # per-process tmp name: concurrent first builds must not publish a .so
    # another process is still writing (os.replace is atomic per file only)
    tmp = f"{so_path}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-I", workdir, src, src2, src3, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError):
        return None
    os.replace(tmp, so_path)
    return so_path


def _bind(lib):
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i8p = ctypes.POINTER(ctypes.c_int8)
    i16p = ctypes.POINTER(ctypes.c_int16)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.hb264_encode_i_slice.restype = ctypes.c_int
    lib.hb264_encode_i_slice.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        u8p, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
        u8p, u8p, u8p, u8p, u8p, u8p, u8p, ctypes.c_int]
    lib.hb264_encode_p_slice.restype = ctypes.c_int
    lib.hb264_encode_p_slice.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        u8p, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
        u8p, u8p, u8p,
        i16p, i32p, i16p, i8p, i8p, i16p, i16p, i16p, i16p, i8p, i8p,
        u8p, u8p, u8p, u8p, ctypes.c_int, i8p, i8p]
    lib.hb264_deblock.restype = None
    lib.hb264_deblock.argtypes = [
        u8p, u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, i8p, i32p, i8p, i8p]
    lib.hb264_rbsp_to_ebsp.restype = ctypes.c_int
    lib.hb264_rbsp_to_ebsp.argtypes = [u8p, ctypes.c_int, u8p, ctypes.c_int]
    # MJPEG decoder (hbdecmjpeg.cpp)
    lib.hbdecmjpeg_info.restype = ctypes.c_int
    lib.hbdecmjpeg_info.argtypes = [
        u8p, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.hbdecmjpeg_decode.restype = ctypes.c_int
    lib.hbdecmjpeg_decode.argtypes = [u8p, ctypes.c_int, u8p, u8p, u8p]
    # universal H.264 decoder (hbdec264.cpp)
    lib.hbdec264_create.restype = ctypes.c_void_p
    lib.hbdec264_free.argtypes = [ctypes.c_void_p]
    lib.hbdec264_error.restype = ctypes.c_char_p
    lib.hbdec264_error.argtypes = [ctypes.c_void_p]
    lib.hbdec264_send_nal.restype = ctypes.c_int
    lib.hbdec264_send_nal.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int]
    lib.hbdec264_get_frame.restype = ctypes.c_int
    lib.hbdec264_get_frame.argtypes = [
        ctypes.c_void_p, u8p, u8p, u8p,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_int)]
    lib.hbdec264_geometry.restype = ctypes.c_int
    lib.hbdec264_geometry.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    return lib


def get_lib():
    """Return the loaded native library, or None if unavailable.

    Disabled entirely when HBTPU_NATIVE=0 (Python reference paths run
    instead — same output bits, slower)."""
    if os.environ.get("HBTPU_NATIVE", "1") == "0":
        return None
    with _lock:
        if _lib[0] is not None:
            return _lib[0]
        if _failed[0]:
            return None
        so = _build()
        if so is None:
            _failed[0] = True
            return None
        try:
            _lib[0] = _bind(ctypes.CDLL(so))
        except OSError:
            # corrupt cache entry (e.g. interrupted build): drop and disable
            try:
                os.unlink(so)
            except OSError:
                pass
            _failed[0] = True
            return None
        return _lib[0]
