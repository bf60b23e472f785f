"""Extract AAC spec constant tables from the bundled libavcodec binary.

The tables are normative constants from ISO/IEC 14496-3 (the AAC
scalefactor Huffman codebook, spectral codebook 11, and the 1024-sample
scalefactor-band offsets) — same provenance category as the CABAC init
tables (see native/extract_fftables.py).  Located structurally:

  * scalefactor bits: the unique 121-byte array with exactly one 1-bit
    code (the zero delta), values 1..19 and Kraft sum exactly 1; the
    paired uint32 code array sits alongside it (prefix-free vs the bits).
  * codebook 11 bits: a 289-byte array, values 1..16, Kraft sum 1, in
    the same rodata cluster; codes are the adjacent uint16 array.
  * swb offsets (48/44.1 kHz, long windows): increasing uint16 multiples
    of 4 from 0 to 1024 with 50 entries.

Writes handbrake_tpu/audio/aac_tables.py.
"""
from __future__ import annotations

import glob
import os
import struct
import sys


def _libavcodec_bytes():
    import cv2
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(cv2.__file__))), "opencv_python.libs")
    so = sorted(glob.glob(os.path.join(root, "libavcodec*.so*")))[-1]
    return open(so, "rb").read()


def _kraft(bits):
    return sum(2.0 ** -b for b in bits)


def _prefix_free(codes, bits):
    pairs = sorted(zip(bits, codes))
    for i, (b1, c1) in enumerate(pairs):
        if c1 >= (1 << b1):
            return False
        for b2, c2 in pairs[i + 1:]:
            if b1 < b2 and (c2 >> (b2 - b1)) == c1:
                return False
            if b1 == b2 and c1 == c2:
                return False
    return True


def extract():
    data = _libavcodec_bytes()

    # -- scalefactor codebook (121 symbols, deltas -60..+60) --------------
    sf_off = None
    for i in range(len(data) - 121):
        w = data[i:i + 121]
        if w[60] != 1 or w.count(1) != 1:
            continue
        if not all(1 <= b <= 19 for b in w):
            continue
        if abs(_kraft(w) - 1.0) < 1e-9:
            sf_off = i
            break
    assert sf_off is not None, "scalefactor bits not found"
    sf_bits = list(data[sf_off:sf_off + 121])
    sf_codes = None
    for off in range(sf_off - 1024, sf_off + 1024, 4):
        codes = struct.unpack_from("<121I", data, off)
        if _prefix_free(codes, sf_bits):
            sf_codes = list(codes)
            break
    assert sf_codes, "scalefactor codes not found"

    # -- spectral codebook 11 (289 symbols, ESC pairs) --------------------
    b11_off = None
    for i in range(len(data) - 289):
        w = data[i:i + 289]
        if not all(1 <= b <= 16 for b in w):
            continue
        if abs(_kraft(w) - 1.0) < 1e-9:
            b11_off = i
            break
    assert b11_off is not None, "codebook 11 bits not found"
    b11_bits = list(data[b11_off:b11_off + 289])
    b11_codes = None
    for off in range(b11_off - 4096, b11_off + 4096, 2):
        codes = struct.unpack_from("<289H", data, off)
        if _prefix_free(codes, b11_bits):
            b11_codes = list(codes)
            break
    assert b11_codes, "codebook 11 codes not found"

    # -- spectral codebooks 1..10 -----------------------------------------
    # aactab.c declares ff_aac_spectral_bits1..11 in order, so the rodata
    # cluster around codebook 11 holds six 81-entry books (1-6), two
    # 64-entry (7,8) and two 169-entry (9,10), address-ordered.  Each is
    # a complete prefix code (Kraft sum 1); codes are nearby uint16.
    def find_books(length, count, lo, hi):
        found = []
        i = lo
        while i < hi and len(found) < count + 4:
            w = data[i:i + length]
            if (all(1 <= b <= 16 for b in w)
                    and abs(_kraft(w) - 1.0) < 1e-9):
                if not found or i >= found[-1] + length:
                    found.append(i)
                    i += length
                    continue
            i += 1
        return found

    lo, hi = b11_off - (1 << 16), b11_off + (1 << 16)
    offs81 = find_books(81, 6, lo, hi)
    offs64 = find_books(64, 2, lo, hi)
    offs169 = find_books(169, 2, lo, hi)
    # 81-length windows can false-positive inside the 169/289 books;
    # drop candidates overlapping a longer book
    spans = ([(o, o + 169) for o in offs169] + [(b11_off, b11_off + 289)])
    offs81 = [o for o in offs81
              if not any(s <= o < e for s, e in spans)][:6]
    offs64 = [o for o in offs64
              if not any(s <= o < e or s <= o + 63 < e for s, e in spans)
              and not any(a <= o < a + 81 for a in offs81)][:2]
    assert len(offs81) == 6, ("codebooks 1-6", offs81)
    assert len(offs64) == 2, ("codebooks 7-8", offs64)
    assert len(offs169) == 2, ("codebooks 9-10", offs169)

    def codes_for(off, n, bits):
        for o in range(off - (1 << 14), off + (1 << 14), 2):
            try:
                codes = struct.unpack_from("<%dH" % n, data, o)
            except struct.error:
                continue
            if _prefix_free(codes, bits):
                return list(codes)
        return None

    # identify which physical array is which codebook by normative
    # structural fingerprints (max code length, length of the all-zero /
    # centre symbol) — rodata order is not the spec order
    def fp81(bits):
        m = max(bits)
        if m == 11:                  # cb1 vs cb6: centre symbol is 1 bit
            return 1 if bits[40] == 1 else 6
        return {9: 2, 16: 3, 12: 4, 13: 5}[m]

    def fp64(bits):
        return {(12, 1): 7, (10, 5): 8}[(max(bits), bits[0])]

    def fp169(bits):
        return {(15, 1): 9, (12, 6): 10}[(max(bits), bits[0])]

    books = {}
    for offs, n, fp in ((offs81, 81, fp81), (offs64, 64, fp64),
                        (offs169, 169, fp169)):
        for off in offs:
            bits = list(data[off:off + n])
            cb = fp(bits)
            codes = codes_for(off, n, bits)
            assert codes, ("codes for cb", cb)
            books["B%d_BITS" % cb] = bits
            books["B%d_CODES" % cb] = codes
    assert sorted(books) == sorted(
        ["B%d_%s" % (i, s) for i in range(1, 11)
         for s in ("BITS", "CODES")]), sorted(books)

    # -- swb offsets for 44.1/48 kHz long windows -------------------------
    swb48 = None
    for i in range(0, len(data) - 120, 2):
        vals = struct.unpack_from("<60H", data, i)
        if vals[0] != 0 or vals[1] != 4:
            continue
        seq = [0]
        for v in vals[1:]:
            if v <= seq[-1] or v > 1024 or v % 4:
                break
            seq.append(v)
            if v == 1024:
                break
        if seq[-1] == 1024 and len(seq) == 50 and seq[-2] == 928:
            swb48 = seq
            break
    assert swb48, "swb_offset_1024_48 not found"
    return dict(SF_BITS=sf_bits, SF_CODES=sf_codes, B11_BITS=b11_bits,
                B11_CODES=b11_codes, SWB_1024_48=swb48, **books)


_HDR = '''"""AAC spec constant tables (generated — do not edit).

ISO/IEC 14496-3 normative tables extracted structurally from the bundled
libavcodec (see tools/extract_aactables.py for provenance): scalefactor
Huffman codebook (121 delta symbols), spectral codebook 11 (ESC pairs),
and the 44.1/48 kHz long-window scalefactor band offsets.
"""
'''


def main():
    tabs = extract()
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "handbrake_tpu", "audio",
        "aac_tables.py")
    with open(out, "w") as f:
        f.write(_HDR)
        for name, vals in tabs.items():
            f.write(f"{name} = {vals!r}\n")
    print("wrote", out)


if __name__ == "__main__":
    sys.exit(main())
