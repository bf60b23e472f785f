"""NAL bitstream utilities (reference: nal_units.c, extradata.c,
bitstream.c — annex-B ↔ length-prefixed conversion and codec-config boxes).
"""
from __future__ import annotations

import struct


def split_annexb(data: bytes) -> list:
    """Split an annex-B stream into raw NAL payloads (no start codes)."""
    nals = []
    i = 0
    n = len(data)
    # find first start code
    while i < n - 3:
        if data[i:i + 3] == b"\x00\x00\x01":
            i += 3
            break
        if data[i:i + 4] == b"\x00\x00\x00\x01":
            i += 4
            break
        i += 1
    else:
        return []
    start = i
    while i < n - 3:
        if data[i:i + 3] == b"\x00\x00\x01":
            end = i
            while end > start and data[end - 1] == 0:
                end -= 1
            nals.append(data[start:end])
            i += 3
            start = i
        else:
            i += 1
    nals.append(data[start:])
    return [x for x in nals if x]


def annexb_to_avcc(data: bytes, length_size: int = 4) -> bytes:
    """Annex-B frame → length-prefixed (ISO/IEC 14496-15) sample."""
    out = bytearray()
    for nal in split_annexb(data):
        out += len(nal).to_bytes(length_size, "big")
        out += nal
    return bytes(out)


def avcc_to_annexb(data: bytes, length_size: int = 4) -> bytes:
    out = bytearray()
    i = 0
    while i + length_size <= len(data):
        ln = int.from_bytes(data[i:i + length_size], "big")
        i += length_size
        out += b"\x00\x00\x00\x01" + data[i:i + ln]
        i += ln
    return bytes(out)


def extract_sps_pps(data: bytes) -> tuple:
    """(sps_list, pps_list) from an annex-B H.264 stream."""
    sps, pps = [], []
    for nal in split_annexb(data):
        t = nal[0] & 0x1F
        if t == 7:
            sps.append(nal)
        elif t == 8:
            pps.append(nal)
    return sps, pps


def strip_parameter_sets(data: bytes) -> bytes:
    """Remove SPS/PPS/AUD NALs (they live in avcC for mp4)."""
    out = bytearray()
    for nal in split_annexb(data):
        t = nal[0] & 0x1F
        if t in (7, 8, 9):
            continue
        out += b"\x00\x00\x00\x01" + nal
    return bytes(out)


def build_avcc(sps_list: list, pps_list: list,
               length_size: int = 4) -> bytes:
    """avcC box payload (hb_set_h264_extradata analog, extradata.c:32)."""
    sps = sps_list[0]
    out = bytearray()
    out += bytes([1, sps[1], sps[2], sps[3]])  # ver, profile, compat, level
    out += bytes([0xFC | (length_size - 1)])
    out += bytes([0xE0 | len(sps_list)])
    for s in sps_list:
        out += struct.pack(">H", len(s)) + s
    out += bytes([len(pps_list)])
    for p in pps_list:
        out += struct.pack(">H", len(p)) + p
    return bytes(out)


def build_hvcc(vps: bytes, sps: bytes, pps: bytes,
               length_size: int = 4) -> bytes:
    """hvcC payload (simplified: profile fields parsed from SPS assumed
    Main; arrays carry VPS/SPS/PPS verbatim)."""
    out = bytearray()
    out += bytes([1])
    # profile_space/tier/profile_idc + compat flags + constraints + level:
    # conservative Main profile defaults; precise values come from the SPS
    # when our HEVC encoder lands.
    out += bytes([0x01])                      # main profile
    out += struct.pack(">I", 0x60000000)      # compat flags
    out += b"\x90\x00\x00\x00\x00\x00"        # constraint flags
    out += bytes([0x5D])                      # level 3.1
    out += struct.pack(">H", 0xF000)          # spatial seg idc
    out += bytes([0xFC, 0xFD, 0xF8, 0xF8])    # chroma/bitdepth
    out += struct.pack(">H", 0)               # avg frame rate
    out += bytes([(length_size - 1) | 0x03 | 0x04 | 0x08 << 1])
    out = out[:22]
    out += bytes([0x0F | ((length_size - 1) << 0) | 0x80])
    out += bytes([3])                         # num arrays
    for t, nal in ((32, vps), (33, sps), (34, pps)):
        out += bytes([0x80 | t])
        out += struct.pack(">H", 1)
        out += struct.pack(">H", len(nal)) + nal
    return bytes(out)
