"""Generator for ITU-T H.264 (ISO/IEC 14496-10) CABAC constant tables.

The H.264 spec defines several large constant tables that a CABAC
encoder/decoder must reproduce exactly:

- Tables 9-12..9-33: context-variable initialisation (m, n) pairs for
  ctxIdx 0..1023, one set for I/SI slices and three (cabac_init_idc)
  for P/B slices.
- Table 9-44: rangeTabLPS[pStateIdx][qCodIRangeIdx].
- Table 9-45: state transitions transIdxLPS (transIdxMPS is the
  formula min(s+1, 62) with 63 absorbing).
- Table 9-43: ctxIdx increment maps for significant_coeff_flag /
  last_significant_coeff_flag of 8x8 blocks (frame + field scans).

No copy of the spec ships in this environment, so this tool recovers the
constants from the one authoritative artifact that does: the libavcodec
shared object bundled with OpenCV (located exactly as tests/ffdec.py
does).  These are pure spec constants — the same category as the
ZIGZAG/quant tables in gen_tables.py — not library code; each table is
located by an anchor prefix, decoded out of FFmpeg's engine-specific
memory layout back into the spec's layout, and checked against strong
structural invariants here plus behavioural conformance (bit-exact
decode against libavcodec) in tests/test_h264_codec.py.

Run:  python -m handbrake_tpu.native.extract_fftables
Writes handbrake_tpu/codecs/h264/cabac_tables.py and
native/cabac_tables_h264.h (both committed; regeneratable).
"""
from __future__ import annotations

import glob
import os


def _libavcodec_bytes() -> bytes:
    import cv2
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(cv2.__file__))), "opencv_python.libs")
    path = sorted(glob.glob(os.path.join(root, "libavcodec*.so*")))[-1]
    with open(path, "rb") as f:
        return f.read()


def _find_all(hay: bytes, needle: bytes):
    out, i = [], -1
    while True:
        i = hay.find(needle, i + 1)
        if i < 0:
            return out
        out.append(i)


def _s8(b: int) -> int:
    return b - 256 if b >= 128 else b


def extract():
    so = _libavcodec_bytes()

    # -- context init tables (Tables 9-12..9-33) ---------------------------
    # Anchor: ctxIdx 0..10 (mb_type SI/I) shared verbatim by all four sets.
    anchor = bytes(v & 0xFF for v in
                   [20, -15, 2, 54, 3, 74, 20, -15, 2, 54, 3, 74,
                    -28, 127, -23, 104, -6, 53, -1, 54, 7, 51])
    hits = _find_all(so, anchor)
    assert len(hits) == 4, f"context-init anchor hits: {hits}"
    assert [h - hits[0] for h in hits] == [0, 2048, 4096, 6144], \
        "init tables must be contiguous [1024][2] int8 arrays"
    sets = []
    for h in hits:
        raw = so[h:h + 2048]
        sets.append([( _s8(raw[2 * i]), _s8(raw[2 * i + 1]))
                     for i in range(1024)])
    # Identify the I/SI-slice set: it zero-fills ctxIdx 11..23 (P-slice
    # mb_type contexts, never used in I slices); exactly one table may.
    zero_row = [(0, 0)] * 13
    i_idx = [k for k, t in enumerate(sets) if t[11:24] == zero_row]
    assert len(i_idx) == 1, f"init_I discriminator matched {i_idx}"
    init_i = sets[i_idx[0]]
    init_pb = [t for k, t in enumerate(sets) if k != i_idx[0]]
    # cross-check: PB[0] ctx 11..16 must match spec Table 9-13
    assert init_pb[0][11:17] == [(23, 33), (23, 2), (21, 0), (1, 9),
                                 (0, 49), (-37, 118)], "PB set order"
    # invariant: initial pStateIdx must be representable for any SliceQP
    for tab in sets:
        for qp in (0, 26, 51):
            for m, n in tab:
                pre = max(1, min(126, ((m * min(max(qp, 0), 51)) >> 4) + n))
                assert 1 <= pre <= 126

    # -- rangeTabLPS (Table 9-44) -------------------------------------------
    # FFmpeg engine layout: 4 blocks of 128 (one per qCodIRangeIdx), each
    # spec value duplicated for the engine's (pStateIdx<<1|valMPS) states.
    pat = bytes([128] * 6 + [123, 123, 116, 116, 111, 111])
    lhits = _find_all(so, pat)
    assert len(lhits) == 1, f"lps anchor hits: {lhits}"
    blk = so[lhits[0]:lhits[0] + 512]
    assert all(blk[128 * q + 2 * s] == blk[128 * q + 2 * s + 1]
               for q in range(4) for s in range(64))
    lps = [[blk[128 * q + 2 * s] for q in range(4)] for s in range(64)]
    assert lps[0] == [128, 176, 208, 240] and lps[63] == [2, 2, 2, 2]
    for s in range(62):            # decreasing in state, increasing in q
        assert all(lps[s + 1][q] <= lps[s][q] for q in range(4))
        assert all(lps[s][q] < lps[s][q + 1] for q in range(3))

    # -- state transitions (Table 9-45) -------------------------------------
    # FFmpeg mlps_state sits right after the 512-byte LPS block:
    # next after MPS = mlps[128+s], next after LPS = mlps[127-s],
    # with s = (pStateIdx<<1) | valMPS.
    mlps = so[lhits[0] + 512:lhits[0] + 512 + 256]
    trans_lps, trans_mps = [], []
    for p in range(64):
        s1 = (p << 1) | 1
        nxt = mlps[127 - s1]
        trans_lps.append(nxt >> 1)
        if p == 0:                 # LPS at state 0 flips valMPS
            assert nxt == 0
        mnxt = mlps[128 + s1]
        trans_mps.append(mnxt >> 1)
    assert trans_mps == [min(p + 1, 62) for p in range(63)] + [63]
    assert trans_lps[0] == 0 and trans_lps[63] == 63
    assert all(trans_lps[p] <= p for p in range(64))

    # -- 8x8 residual ctx maps (Table 9-43) ----------------------------------
    sig_anchor = bytes([0, 1, 2, 3, 4, 5, 5, 4, 4, 3, 3, 4, 4, 4, 5, 5])
    shits = _find_all(so, sig_anchor)
    assert len(shits) == 1, f"sig8x8 anchor hits: {shits}"
    sig8x8_frame = list(so[shits[0]:shits[0] + 63])
    sig8x8_field = list(so[shits[0] + 63:shits[0] + 126])
    assert max(sig8x8_frame) == 14 and max(sig8x8_field) == 14
    # last_coeff map follows the mlps block in FFmpeg's engine blob
    last8x8 = list(so[lhits[0] + 768:lhits[0] + 768 + 63])
    assert last8x8[0] == 0 and max(last8x8) == 8
    assert all(last8x8[i] <= last8x8[i + 1] for i in range(62))

    return dict(CABAC_INIT_I=init_i, CABAC_INIT_PB=init_pb,
                RANGE_TAB_LPS=lps, TRANS_IDX_LPS=trans_lps,
                TRANS_IDX_MPS=trans_mps,
                SIG_COEFF_8X8_FRAME=sig8x8_frame,
                SIG_COEFF_8X8_FIELD=sig8x8_field,
                LAST_COEFF_8X8=last8x8)


_HDR = '''"""H.264 CABAC spec constants (generated — do not edit).

ITU-T H.264 Tables 9-12..9-33 (context init), 9-43 (8x8 residual ctx
maps), 9-44 (rangeTabLPS), 9-45 (transIdx).  Generated by
handbrake_tpu/native/extract_fftables.py; see that file for provenance.
"""
'''


def _py_fmt(name, val, indent=0):
    import pprint
    return f"{name} = {pprint.pformat(val, width=78, compact=True)}\n\n"


def write_python(tabs, path):
    with open(path, "w") as f:
        f.write(_HDR)
        for k, v in tabs.items():
            f.write(_py_fmt(k, v))


def write_header(tabs, path):
    def carr(vals):
        return ",".join(str(v) for v in vals)
    with open(path, "w") as f:
        f.write("// H.264 CABAC spec constants (generated by "
                "extract_fftables.py — do not edit).\n"
                "// ITU-T H.264 Tables 9-12..9-33, 9-43, 9-44, 9-45.\n"
                "#pragma once\n#include <cstdint>\n\n")
        f.write("static const int8_t kCabacInitI[1024][2] = {")
        f.write(",".join("{%d,%d}" % t for t in tabs["CABAC_INIT_I"]))
        f.write("};\n\n")
        f.write("static const int8_t kCabacInitPB[3][1024][2] = {")
        f.write(",".join(
            "{" + ",".join("{%d,%d}" % t for t in tab) + "}"
            for tab in tabs["CABAC_INIT_PB"]))
        f.write("};\n\n")
        f.write("static const uint8_t kRangeTabLPS[64][4] = {")
        f.write(",".join("{" + carr(r) + "}" for r in tabs["RANGE_TAB_LPS"]))
        f.write("};\n\n")
        f.write("static const uint8_t kTransIdxLPS[64] = {"
                + carr(tabs["TRANS_IDX_LPS"]) + "};\n")
        f.write("static const uint8_t kTransIdxMPS[64] = {"
                + carr(tabs["TRANS_IDX_MPS"]) + "};\n")
        f.write("static const uint8_t kSigCoeff8x8Frame[63] = {"
                + carr(tabs["SIG_COEFF_8X8_FRAME"]) + "};\n")
        f.write("static const uint8_t kSigCoeff8x8Field[63] = {"
                + carr(tabs["SIG_COEFF_8X8_FIELD"]) + "};\n")
        f.write("static const uint8_t kLastCoeff8x8[63] = {"
                + carr(tabs["LAST_COEFF_8X8"]) + "};\n")


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    tabs = extract()
    write_python(tabs, os.path.join(
        here, "..", "codecs", "h264", "cabac_tables.py"))
    write_header(tabs, os.path.join(here, "cabac_tables_h264.h"))
    print("wrote cabac_tables.py / cabac_tables_h264.h")


if __name__ == "__main__":
    main()
