"""Random legal H.264 CAVLC stream synthesizer — decoder conformance.

Emits syntactically valid (but rate-distortion-nonsensical) streams that
exercise the full Baseline/Main CAVLC syntax space: I_4x4 with all nine
prediction modes, I_16x16, I_PCM, every P partition shape down to 4x4,
multiple reference frames with per-partition ref_idx, mb_qp_delta,
skip runs, per-slice deblock parameters and multi-slice pictures.

No reconstruction happens here: libavcodec (tests/ffdec.py) decodes the
stream as ground truth and the universal decoder (hbdec264) must produce
identical pixels — equivalent to fuzzing the decoder against the spec.

Role: the conformance-bitstream suites the reference relies on its
upstream codec libraries having passed (SURVEY.md §4).
"""
from __future__ import annotations

import numpy as np

from handbrake_tpu.codecs.h264.bits import BitWriter, nal_unit
from handbrake_tpu.codecs.h264.cavlc import encode_residual
from handbrake_tpu.codecs.h264.tables import CBP_INTER_INV, CBP_INTRA4x4_INV

NAL_IDR, NAL_SLICE, NAL_SPS, NAL_PPS = 5, 1, 7, 8
ZS16 = [0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15]

# 8x8 zig-zag scan (spec Table 8-8) and normAdjust8x8 class map (8.5.13)
ZIG8 = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]
V8 = [[20, 18, 32, 19, 25, 24], [22, 19, 35, 21, 28, 26],
      [26, 23, 42, 24, 33, 31], [28, 25, 45, 26, 35, 33],
      [32, 28, 51, 30, 40, 38], [36, 32, 58, 34, 46, 43]]


def v8cls(i):
    r, c = i >> 3, i & 7
    if r % 4 == 0 and c % 4 == 0:
        return 0
    if r % 2 == 1 and c % 2 == 1:
        return 1
    if r % 4 == 2 and c % 4 == 2:
        return 2
    if (r % 4 == 0 and c % 2 == 1) or (r % 2 == 1 and c % 4 == 0):
        return 3
    if (r % 4 == 0 and c % 4 == 2) or (r % 4 == 2 and c % 4 == 0):
        return 4
    return 5


def write_scaling_list(bw, vals):
    """Emit one scaling list; vals in scan order, each in 1..255."""
    last = 8
    for v in vals:
        bw.se((v - last + 128) % 256 - 128)
        last = v


def random_scaling(rng, size):
    """A legal random scaling list (smooth walk, no zero deltas traps)."""
    vals = []
    v = 16
    for _ in range(size):
        v = int(min(40, max(8, v + rng.integers(-3, 4))))
        vals.append(v)
    return vals


def write_sps(mb_w, mb_h, max_ref=4, log2_mfn=4, poc_type=2,
              log2_poc=6, direct_8x8_inference=1, profile=66,
              seq_scaling=None):
    bw = BitWriter()
    bw.put(profile, 8)
    bw.put(0b11000000 if profile == 66 else 0, 8)
    bw.put(30, 8)
    bw.ue(0)               # sps_id
    if profile >= 100:     # High profile extension
        bw.ue(1)           # chroma_format_idc 4:2:0
        bw.ue(0)           # bit_depth_luma 8
        bw.ue(0)           # bit_depth_chroma 8
        bw.put_bit(0)      # qpprime_y_zero_transform_bypass
        if seq_scaling is None:
            bw.put_bit(0)
        else:
            bw.put_bit(1)
            for i in range(8):
                if seq_scaling[i] is None:
                    bw.put_bit(0)
                else:
                    bw.put_bit(1)
                    write_scaling_list(bw, seq_scaling[i])
    bw.ue(log2_mfn - 4)
    bw.ue(poc_type)
    if poc_type == 0:
        bw.ue(log2_poc - 4)
    bw.ue(max_ref)
    bw.put_bit(0)
    bw.ue(mb_w - 1)
    bw.ue(mb_h - 1)
    bw.put_bit(1)          # frame_mbs_only
    bw.put_bit(direct_8x8_inference)
    bw.put_bit(0)          # no cropping
    bw.put_bit(0)          # no vui
    bw.rbsp_trailing()
    return nal_unit(3, NAL_SPS, bw.get_rbsp())


def write_pps(wbidc=0, cabac=0, t8=0, pic_scaling=None,
              second_cqo=0):
    bw = BitWriter()
    bw.ue(0)
    bw.ue(0)
    bw.put_bit(cabac)
    bw.put_bit(0)
    bw.ue(0)               # one slice group
    bw.ue(0)               # num_ref_idx_l0_default_active_minus1
    bw.ue(0)
    bw.put_bit(0)          # weighted_pred
    bw.put(wbidc, 2)       # weighted_bipred_idc (0 default / 2 implicit)
    bw.se(0)               # pic_init_qp 26
    bw.se(0)
    bw.se(0)               # chroma_qp_offset
    bw.put_bit(1)          # deblocking_filter_control_present
    bw.put_bit(0)
    bw.put_bit(0)
    if t8 or pic_scaling is not None or second_cqo:
        bw.put_bit(t8)     # transform_8x8_mode_flag
        if pic_scaling is None:
            bw.put_bit(0)
        else:
            bw.put_bit(1)
            for i in range(6 + 2 * t8):
                if pic_scaling[i] is None:
                    bw.put_bit(0)
                else:
                    bw.put_bit(1)
                    write_scaling_list(bw, pic_scaling[i])
        bw.se(second_cqo)  # second_chroma_qp_index_offset
    bw.rbsp_trailing()
    return nal_unit(3, NAL_PPS, bw.get_rbsp())


class Synth:
    def __init__(self, mb_w, mb_h, rng, max_ref=4, force_i4_mode=None,
                 force_mb=None, poc_type=2, wbidc=0, direct_spatial=None,
                 inference=1, profile=66, t8=0, scaling=False):
        self.mb_w, self.mb_h = mb_w, mb_h
        self.rng = rng
        self.force_i4_mode = force_i4_mode
        self.force_mb = force_mb
        self.force_deblock = None
        self.max_ref = max_ref
        self.log2_mfn = 4
        self.log2_poc = 6
        self.poc_type = poc_type
        self.wbidc = wbidc
        self.direct_spatial = direct_spatial   # None → random per B slice
        self.inference = inference
        self.profile = profile
        self.t8 = t8                   # pps transform_8x8_mode
        # random scaling matrices (some lists absent → fallback rules)
        self.seq_scaling = None
        self.pic_scaling = None
        self.wmax = 16                 # conservative dequant-bound scale
        if scaling:
            self.seq_scaling = [random_scaling(rng, 16 if i < 6 else 64)
                                if rng.random() < 0.7 else None
                                for i in range(8)]
            self.pic_scaling = ([random_scaling(rng, 16 if i < 6 else 64)
                                 if rng.random() < 0.5 else None
                                 for i in range(6 + 2 * t8)]
                                if rng.random() < 0.5 else None)
            allv = [v for ls in ([x for x in self.seq_scaling if x]
                                 + ([x for x in (self.pic_scaling or [])
                                     if x]))
                    for v in ls]
            self.wmax = max([16] + allv)
        self.frame_num = 0
        self.n_refs = 0            # refs currently in DPB

    def headers(self):
        return (write_sps(self.mb_w, self.mb_h, self.max_ref,
                          self.log2_mfn, self.poc_type, self.log2_poc,
                          self.inference, self.profile, self.seq_scaling)
                + write_pps(self.wbidc, 0, self.t8, self.pic_scaling))

    # ---- residual helpers -------------------------------------------------
    # Conformant streams must keep every inverse-transform intermediate in
    # 16 bits (spec 8.5); bound each dequantized coefficient so that holds
    # with margin regardless of the random draw.
    _V4 = [[10, 16, 13], [11, 18, 14], [13, 20, 16],
           [14, 23, 18], [16, 25, 20], [18, 29, 23]]
    _ZIG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
    _BOUND = 1200

    @staticmethod
    def _v4cls(i):
        r, c = i // 4, i % 4
        if r % 2 == 0 and c % 2 == 0:
            return 0
        if r % 2 == 1 and c % 2 == 1:
            return 1
        return 2

    def _unit4(self, qp, raster_i):
        ls = 16 * self._V4[qp % 6][self._v4cls(raster_i)]
        qp6 = qp // 6
        return (ls << (qp6 - 4)) if qp6 >= 4 else max(1, ls >> (4 - qp6))

    def _levels(self, n, density=0.3, amp=12, qp=None, kind="ac"):
        """Random levels in scan order, bounded so dequant stays small.
        kind: ac (4x4/AC), ldc (I16 luma DC), cdc (chroma DC)."""
        qp = self.cur_qp if qp is None else qp
        qp6 = qp // 6
        lv = np.zeros(n, np.int64)
        mask = self.rng.random(n) < density
        wsc = self.wmax / 16.0         # scaling-matrix headroom
        for i in np.nonzero(mask)[0]:
            if kind == "ac":
                scan_pos = i if n == 16 else i + 1
                unit = int(self._unit4(qp, self._ZIG[scan_pos]) * wsc)
                cap = max(1, self._BOUND // max(1, unit))
            elif kind == "ldc":
                ls = 16 * self._V4[qp % 6][0]
                unit = 16 * (ls << (qp6 - 6) if qp >= 36
                             else max(1, ls >> (6 - qp6)))
                cap = max(0, self._BOUND // max(1, int(unit * wsc)))
            else:                                      # chroma dc
                ls = 16 * self._V4[qp % 6][0]
                unit = max(1, int(((4 * ls << qp6) >> 5) * wsc))
                cap = max(0, self._BOUND // unit)
            if cap <= 0:
                continue
            a = int(self.rng.integers(1, min(cap, amp) + 1))
            lv[i] = a * int(self.rng.choice([-1, 1]))
        return [int(v) for v in lv]

    def _unit8(self, qp, raster_i):
        ls = 16 * V8[qp % 6][v8cls(raster_i)]
        qp6 = qp // 6
        u = (ls << (qp6 - 6)) if qp6 >= 6 else max(1, ls >> (6 - qp6))
        return max(1, int(u * self.wmax / 16.0))

    def _levels8(self, density=0.2, amp=10):
        """64 levels in 8x8 scan order, dequant-bounded."""
        qp = self.cur_qp
        lv = [0] * 64
        mask = self.rng.random(64) < density
        for i in np.nonzero(mask)[0]:
            cap = max(0, self._BOUND // self._unit8(qp, ZIG8[i]))
            if cap <= 0:
                continue
            a = int(self.rng.integers(1, min(cap, amp) + 1))
            lv[i] = a * int(self.rng.choice([-1, 1]))
        return lv

    def _write_luma8_residual(self, bw, mbx, mby, cbp_luma):
        """CAVLC 8x8: per coded 8x8 block, 4 interleaved 4x4 streams."""
        b0y, b0x = mby * 4, mbx * 4
        for k in range(16):
            b = ZS16[k]
            quad = (b // 8) * 2 + (b % 4) // 2
            by, bx = b0y + b // 4, b0x + b % 4
            if not ((cbp_luma >> quad) & 1):
                self.nnz_l[by, bx] = 0
                continue
            if (k & 3) == 0:
                self._cur_lv8 = self._levels8()
            sub = [self._cur_lv8[4 * j + (k & 3)] for j in range(16)]
            nc = self._nc_luma(by, bx)
            tc = encode_residual(bw, sub, nc, 16)
            self.nnz_l[by, bx] = tc

    def _i8_modes(self, mbx, mby):
        modes = []
        for b8 in range(4):
            bx, by = (b8 & 1) * 2, (b8 >> 1) * 2
            gx, gy = mbx * 4 + bx, mby * 4 + by
            has_left = self._nb_ok(gx - 1, gy, mbx, mby)
            has_top = self._nb_ok(gx, gy - 1, mbx, mby)
            has_tl = self._nb_ok(gx - 1, gy - 1, mbx, mby)
            ok = [2]
            if has_top:
                ok += [0, 3, 7]
            if has_left:
                ok += [1, 8]
            if has_top and has_left and has_tl:
                ok += [4, 5, 6]
            modes.append(int(self.rng.choice(ok)))
        return modes

    def _nc_luma(self, by, bx):
        na = int(self.nnz_l[by, bx - 1]) if bx > 0 else -1
        nb = int(self.nnz_l[by - 1, bx]) if by > 0 else -1
        # availability mirrors slice bounds via -1 sentinel
        if na >= 0 and nb >= 0:
            return (na + nb + 1) >> 1
        if na >= 0:
            return na
        if nb >= 0:
            return nb
        return 0

    def _nc_chroma(self, comp, cy, cx):
        g = self.nnz_c[comp]
        na = g[cy, cx - 1] if cx > 0 else -1
        nb = g[cy - 1, cx] if cy > 0 else -1
        if na >= 0 and nb >= 0:
            return (na + nb + 1) >> 1
        if na >= 0:
            return na
        if nb >= 0:
            return nb
        return 0

    def _write_luma_residual(self, bw, mbx, mby, cbp_luma, i16):
        b0y, b0x = mby * 4, mbx * 4
        if i16:
            nc = self._nc_luma(b0y, b0x)
            encode_residual(bw, self._levels(16, 0.4, 8, kind="ldc"),
                            nc, 16)
        maxc = 15 if i16 else 16
        for k in range(16):
            b = ZS16[k]
            quad = (b // 8) * 2 + (b % 4) // 2
            by, bx = b0y + b // 4, b0x + b % 4
            if not ((cbp_luma >> quad) & 1):
                self.nnz_l[by, bx] = 0
                continue
            nc = self._nc_luma(by, bx)
            tc = encode_residual(bw, self._levels(maxc), nc, maxc)
            self.nnz_l[by, bx] = tc

    def _write_chroma_residual(self, bw, mbx, mby, cbp_chroma):
        c0y, c0x = mby * 2, mbx * 2
        if cbp_chroma == 0:
            for comp in range(2):
                self.nnz_c[comp][c0y:c0y + 2, c0x:c0x + 2] = 0
            return
        qpc = self._chroma_qp()
        for comp in range(2):
            encode_residual(bw, self._levels(4, 0.5, 8, qp=qpc,
                                             kind="cdc"), -1, 4)
        if cbp_chroma == 2:
            for comp in range(2):
                for b in range(4):
                    cy, cx = c0y + b // 2, c0x + b % 2
                    nc = self._nc_chroma(comp, cy, cx)
                    tc = encode_residual(
                        bw, self._levels(15, 0.25, 8, qp=qpc), nc, 15)
                    self.nnz_c[comp][cy, cx] = tc
        else:
            for comp in range(2):
                self.nnz_c[comp][c0y:c0y + 2, c0x:c0x + 2] = 0

    # ---- intra modes with availability constraints ------------------------
    def _nb_ok(self, gx, gy, mbx, mby):
        """Sample-group availability: inside picture, and either inside the
        current MB (z-order guarantees left/top precede) or already coded
        in THIS slice (ipred4 sentinel)."""
        if gx < 0 or gy < 0:
            return False
        if gx // 4 == mbx and gy // 4 == mby:
            return True
        return self.ipred4[gy, gx] >= 0

    def _i4_modes(self, mbx, mby):
        modes = []
        for k in range(16):
            b = ZS16[k]
            bx, by = b % 4, b // 4
            gx, gy = mbx * 4 + bx, mby * 4 + by
            has_left = self._nb_ok(gx - 1, gy, mbx, mby)
            has_top = self._nb_ok(gx, gy - 1, mbx, mby)
            has_tl = self._nb_ok(gx - 1, gy - 1, mbx, mby)
            # top-right availability (conservative: only when the block
            # above-right is decoded before this one)
            ok = [2]                                   # DC always
            if has_top:
                ok += [0, 3, 7]                        # V, DDL, VL
            if has_left:
                ok += [1, 8]                           # H, HU
            if has_top and has_left and has_tl:
                ok += [4, 5, 6]                        # DDR, VR, HD
            if self.force_i4_mode is not None:
                modes.append(self.force_i4_mode
                             if self.force_i4_mode in ok else 2)
            else:
                modes.append(int(self.rng.choice(ok)))
        return modes

    def _cmode(self, mbx, mby):
        hl = self._nb_ok(mbx * 4 - 1, mby * 4, mbx, mby)
        ht = self._nb_ok(mbx * 4, mby * 4 - 1, mbx, mby)
        htl = self._nb_ok(mbx * 4 - 1, mby * 4 - 1, mbx, mby)
        ok = [0]
        if hl:
            ok.append(1)
        if ht:
            ok.append(2)
        if hl and ht and htl:          # plane needs the corner sample
            ok.append(3)
        return int(self.rng.choice(ok))

    def _i16_mode(self, mbx, mby):
        hl = self._nb_ok(mbx * 4 - 1, mby * 4, mbx, mby)
        ht = self._nb_ok(mbx * 4, mby * 4 - 1, mbx, mby)
        htl = self._nb_ok(mbx * 4 - 1, mby * 4 - 1, mbx, mby)
        ok = [2]
        if ht:
            ok.append(0)
        if hl:
            ok.append(1)
        if hl and ht and htl:          # plane needs the corner sample
            ok.append(3)
        return int(self.rng.choice(ok))

    # ---- macroblocks ------------------------------------------------------
    def _write_intra_mb(self, bw, mbx, mby, p_slice, skip_run):
        # p_slice: mb_type offset for intra in inter slices (False/0 → I
        # slice, True → +5 (P), 23 → +23 (B))
        r = self.rng.random()
        if isinstance(self.force_mb, (tuple, list)):
            pick = self.rng.choice(self.force_mb)
            r = {"pcm": 0.0, "i4": 0.3, "i16": 0.9}[pick]
        elif self.force_mb == "i4":
            r = 0.3
        elif self.force_mb == "i16":
            r = 0.9
        elif self.force_mb == "pcm":
            r = 0.0
        off = 23 if p_slice == 'b' else (5 if p_slice else 0)
        if r < 0.04:
            # I_PCM (mb_type 25)
            bw.ue(25 + off)
            while bw._nbits % 8:
                bw.put_bit(0)
            for _ in range(384):
                bw.put(int(self.rng.integers(0, 256)), 8)
            self.nnz_l[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 16
            for comp in range(2):
                self.nnz_c[comp][mby * 2:mby * 2 + 2,
                                 mbx * 2:mbx * 2 + 2] = 16
            self.ipred4[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 2
            return
        if r < 0.5:
            # I_NxN (4x4 or, under transform_8x8_mode, 8x8)
            bw.ue(off)
            use8 = self.t8 and self.rng.random() < 0.5
            if self.t8:
                bw.put_bit(1 if use8 else 0)
            cbp = int(self.rng.integers(0, 48))
            if use8:
                modes = self._i8_modes(mbx, mby)
                for b8 in range(4):
                    bx, by = (b8 & 1) * 2, (b8 >> 1) * 2
                    gx, gy = mbx * 4 + bx, mby * 4 + by
                    pa = self.ipred4[gy, gx - 1] if gx > 0 else -1
                    pb = self.ipred4[gy - 1, gx] if gy > 0 else -1
                    mpm = 2 if (pa < 0 or pb < 0) else min(pa, pb)
                    mode = modes[b8]
                    if mode == mpm:
                        bw.put_bit(1)
                    else:
                        bw.put_bit(0)
                        bw.put(mode if mode < mpm else mode - 1, 3)
                    self.ipred4[gy:gy + 2, gx:gx + 2] = mode
                bw.ue(self._cmode(mbx, mby))
                bw.ue(CBP_INTRA4x4_INV[cbp])
                if cbp:
                    self._qp_delta(bw)
                self._write_luma8_residual(bw, mbx, mby, cbp & 15)
                self._write_chroma_residual(bw, mbx, mby, cbp >> 4)
                return
            modes = self._i4_modes(mbx, mby)
            for k in range(16):
                b = ZS16[k]
                gx, gy = mbx * 4 + b % 4, mby * 4 + b // 4
                pa = self.ipred4[gy, gx - 1] if gx > 0 else -1
                pb = self.ipred4[gy - 1, gx] if gy > 0 else -1
                mpm = 2 if (pa < 0 or pb < 0) else min(pa, pb)
                mode = modes[k]
                if mode == mpm:
                    bw.put_bit(1)
                else:
                    bw.put_bit(0)
                    bw.put(mode if mode < mpm else mode - 1, 3)
                self.ipred4[gy, gx] = mode
            bw.ue(self._cmode(mbx, mby))
            bw.ue(CBP_INTRA4x4_INV[cbp])
            if cbp:
                self._qp_delta(bw)
            self._write_luma_residual(bw, mbx, mby, cbp & 15, False)
            self._write_chroma_residual(bw, mbx, mby, cbp >> 4)
            return
        # I_16x16
        imode = self._i16_mode(mbx, mby)
        cbp_c = int(self.rng.integers(0, 3))
        cbp_ac = int(self.rng.integers(0, 2))
        t = 1 + imode + 4 * cbp_c + 12 * cbp_ac
        bw.ue(t + off)
        bw.ue(self._cmode(mbx, mby))
        self._qp_delta(bw)
        self._write_luma_residual(bw, mbx, mby, 15 if cbp_ac else 0, True)
        if not cbp_ac:
            self.nnz_l[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 0
        self._write_chroma_residual(bw, mbx, mby, cbp_c)
        self.ipred4[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 2

    _QPC_MAP = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
                17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 29, 30,
                31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37, 38, 38,
                38, 39, 39, 39, 39]

    def _chroma_qp(self):
        return self._QPC_MAP[max(0, min(51, self.cur_qp))]

    def _qp_delta(self, bw):
        lo = max(-4, 10 - self.cur_qp)
        hi = min(4, 44 - self.cur_qp)
        d = int(self.rng.integers(lo, hi + 1))
        self.cur_qp += d
        bw.se(d)

    def _mv(self):
        return (int(self.rng.integers(-40, 41)),
                int(self.rng.integers(-40, 41)))

    def _write_inter_mb(self, bw, mbx, mby, nref):
        shape = int(self.rng.integers(0, 4))
        bw.ue(shape if shape < 3 else 3)
        nparts = [1, 2, 2, 4][shape]
        def wref():
            if nref <= 1:
                return
            r = int(self.rng.integers(0, nref))
            if nref == 2:
                bw.put_bit(1 - r)
            else:
                bw.ue(r)
        if shape < 3:
            for _ in range(nparts):
                wref()
            for _ in range(nparts):
                mvx, mvy = self._mv()
                bw.se(mvx)
                bw.se(mvy)
        else:
            subs = [int(self.rng.integers(0, 4)) for _ in range(4)]
            for s in subs:
                bw.ue(s)
            for _ in range(4):
                wref()
            for s in subs:
                for _ in range([1, 2, 2, 4][s]):
                    mvx, mvy = self._mv()
                    bw.se(mvx)
                    bw.se(mvy)
        cbp = int(self.rng.integers(0, 48))
        bw.ue(CBP_INTER_INV[cbp])
        use8 = False
        if (self.t8 and (cbp & 15)
                and (shape < 3 or all(s == 0 for s in subs))):
            use8 = self.rng.random() < 0.5
            bw.put_bit(1 if use8 else 0)
        if cbp:
            self._qp_delta(bw)
        if use8:
            self._write_luma8_residual(bw, mbx, mby, cbp & 15)
        else:
            self._write_luma_residual(bw, mbx, mby, cbp & 15, False)
        self._write_chroma_residual(bw, mbx, mby, cbp >> 4)
        self.ipred4[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 2

    # B mb_type tables (spec Table 7-14 / 7-18), decoder-independent copy
    B_SHAPE = [0, 0, 0, 0, 1, 2, 1, 2, 1, 2, 1, 2,
               1, 2, 1, 2, 1, 2, 1, 2, 1, 2, 3]
    B_PRED = [(0, 0), (1, 0), (2, 0), (3, 0),
              (1, 1), (1, 1), (2, 2), (2, 2), (1, 2), (1, 2), (2, 1),
              (2, 1), (1, 3), (1, 3), (2, 3), (2, 3), (3, 1), (3, 1),
              (3, 2), (3, 2), (3, 3), (3, 3), (0, 0)]
    B_SUB_PRED = [0, 1, 2, 3, 1, 1, 2, 2, 3, 3, 1, 2, 3]
    B_SUB_NSUB = [1, 1, 1, 1, 2, 2, 2, 2, 2, 2, 4, 4, 4]

    def _wref(self, bw, nref):
        r = int(self.rng.integers(0, nref))
        if nref == 2:
            bw.put_bit(1 - r)
        else:
            bw.ue(r)

    def _write_b_inter_mb(self, bw, mbx, mby, nref):
        """One non-skip B inter MB; nref = (active_l0, active_l1)."""
        mb_type = int(self.rng.integers(0, 23))
        bw.ue(mb_type)
        if mb_type == 0:                       # B_Direct_16x16
            pass
        elif mb_type < 22:
            shape = self.B_SHAPE[mb_type]
            np_ = 1 if shape == 0 else 2
            for l in range(2):
                for p in range(np_):
                    if (self.B_PRED[mb_type][p] >> l) & 1 and nref[l] > 1:
                        self._wref(bw, nref[l])
            for l in range(2):
                for p in range(np_):
                    if (self.B_PRED[mb_type][p] >> l) & 1:
                        mvx, mvy = self._mv()
                        bw.se(mvx)
                        bw.se(mvy)
        else:                                  # B_8x8
            subs = [int(self.rng.integers(0, 13)) for _ in range(4)]
            for s in subs:
                bw.ue(s)
            for l in range(2):
                for q in range(4):
                    s = subs[q]
                    if s and (self.B_SUB_PRED[s] >> l) & 1 and nref[l] > 1:
                        self._wref(bw, nref[l])
            for l in range(2):
                for q in range(4):
                    s = subs[q]
                    if s and (self.B_SUB_PRED[s] >> l) & 1:
                        for _ in range(self.B_SUB_NSUB[s]):
                            mvx, mvy = self._mv()
                            bw.se(mvx)
                            bw.se(mvy)
        cbp = int(self.rng.integers(0, 48))
        bw.ue(CBP_INTER_INV[cbp])
        use8 = False
        if self.t8 and (cbp & 15):
            if mb_type == 0:
                ok8 = bool(self.inference)
            elif mb_type < 22:
                ok8 = True
            else:
                ok8 = all((s == 0 and self.inference) or 1 <= s <= 3
                          for s in subs)
            if ok8:
                use8 = self.rng.random() < 0.5
                bw.put_bit(1 if use8 else 0)
        if cbp:
            self._qp_delta(bw)
        if use8:
            self._write_luma8_residual(bw, mbx, mby, cbp & 15)
        else:
            self._write_luma_residual(bw, mbx, mby, cbp & 15, False)
        self._write_chroma_residual(bw, mbx, mby, cbp >> 4)
        self.ipred4[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 2

    # ---- slices -----------------------------------------------------------
    def frame(self, idr=False, n_slices=1, kind=None, poc=0, ref=True):
        """Emit one coded frame (one or more slices).

        kind: None → legacy auto (I on idr else P); 'i'/'p'/'b' explicit.
        poc: pic_order_cnt_lsb (poc_type 0 only). ref: reference picture.
        """
        n_mb = self.mb_w * self.mb_h
        if idr:
            self.frame_num = 0
            self.n_refs = 0
        if kind is None:
            kind = 'i' if idr or self.n_refs == 0 else 'p'
        out = b""
        bounds = [0, n_mb]
        if n_slices == 2 and n_mb >= 4:
            bounds = [0, int(self.rng.integers(1, n_mb)), n_mb]
        p_slice = kind == 'p'
        b_slice = kind == 'b'
        navail = min(self.n_refs, self.max_ref)
        nref = navail if p_slice else 0
        for si in range(len(bounds) - 1):
            first_mb, end_mb = bounds[si], bounds[si + 1]
            # per-slice neighbour state: blocks outside this slice are
            # unavailable for every context derivation (-1 sentinel)
            self.nnz_l = np.full((self.mb_h * 4, self.mb_w * 4), -1,
                                 np.int32)
            self.nnz_c = [np.full((self.mb_h * 2, self.mb_w * 2), -1,
                                  np.int32) for _ in range(2)]
            self.ipred4 = np.full((self.mb_h * 4, self.mb_w * 4), -1,
                                  np.int32)
            bw = BitWriter()
            bw.ue(first_mb)
            bw.ue({'p': 0, 'b': 1, 'i': 2}[kind] + 5)
            bw.ue(0)                       # pps
            bw.put(self.frame_num, self.log2_mfn)
            if idr:
                bw.ue(0)                   # idr_pic_id
            if self.poc_type == 0:
                bw.put(poc % (1 << self.log2_poc), self.log2_poc)
            if b_slice:
                ds = (int(self.rng.integers(0, 2))
                      if self.direct_spatial is None else
                      int(self.direct_spatial))
                bw.put_bit(ds)             # direct_spatial_mv_pred
                nref_b = (min(navail, 1 + int(self.rng.integers(0, 2))),
                          min(navail, 1 + int(self.rng.integers(0, 2))))
                bw.put_bit(1)              # num_ref_idx override
                bw.ue(nref_b[0] - 1)
                bw.ue(nref_b[1] - 1)
                bw.put_bit(0)              # no reordering l0
                bw.put_bit(0)              # no reordering l1
            if p_slice:
                if nref != 1:
                    bw.put_bit(1)          # num_ref_idx override
                    bw.ue(nref - 1)
                else:
                    bw.put_bit(0)
                bw.put_bit(0)              # no reordering
            if idr:
                bw.put_bit(0)
                bw.put_bit(0)
            elif ref:
                bw.put_bit(0)              # no adaptive marking
            qp = 24 + int(self.rng.integers(0, 8))
            self.cur_qp = qp
            bw.se(qp - 26)
            if self.force_deblock is not None:
                dbl, ao, bo = self.force_deblock
            else:
                dbl = int(self.rng.choice([0, 0, 1]))
                ao = int(self.rng.integers(-3, 4))
                bo = int(self.rng.integers(-3, 4))
            bw.ue(dbl)
            if dbl != 1:
                bw.se(ao)
                bw.se(bo)

            mb = first_mb
            while mb < end_mb:
                mbx, mby = mb % self.mb_w, mb // self.mb_w
                if p_slice or b_slice:
                    # skip run (P_Skip / B_Skip)
                    run = 0
                    while (mb + run < end_mb and
                           self.rng.random() < 0.2):
                        run += 1
                    bw.ue(run)
                    for _ in range(run):
                        x, y = mb % self.mb_w, mb // self.mb_w
                        self.nnz_l[y * 4:y * 4 + 4, x * 4:x * 4 + 4] = 0
                        for comp in range(2):
                            self.nnz_c[comp][y * 2:y * 2 + 2,
                                             x * 2:x * 2 + 2] = 0
                        self.ipred4[y * 4:y * 4 + 4, x * 4:x * 4 + 4] = 2
                        mb += 1
                    if mb >= end_mb:
                        break
                    mbx, mby = mb % self.mb_w, mb // self.mb_w
                if b_slice and self.rng.random() < 0.2:
                    self._write_intra_mb(bw, mbx, mby, 'b', 0)
                elif b_slice:
                    self._write_b_inter_mb(bw, mbx, mby, nref_b)
                elif p_slice and self.rng.random() < 0.25:
                    self._write_intra_mb(bw, mbx, mby, True, 0)
                elif p_slice:
                    self._write_inter_mb(bw, mbx, mby, nref)
                else:
                    self._write_intra_mb(bw, mbx, mby, False, 0)
                mb += 1
            bw.rbsp_trailing()
            out += nal_unit(3 if ref else 0,
                            NAL_IDR if idr else NAL_SLICE,
                            bw.get_rbsp())
        if ref:
            self.frame_num = (self.frame_num + 1) % (1 << self.log2_mfn)
            self.n_refs = min(self.n_refs + 1, self.max_ref)
        return out


def synth_stream(mb_w=5, mb_h=4, n_frames=6, seed=0, max_ref=3,
                 multi_slice=False, force_i4_mode=None, force_mb=None):
    rng = np.random.default_rng(seed)
    s = Synth(mb_w, mb_h, rng, max_ref=max_ref,
              force_i4_mode=force_i4_mode, force_mb=force_mb)
    out = s.headers()
    for i in range(n_frames):
        ns = 2 if (multi_slice and i % 2 == 1) else 1
        out += s.frame(idr=(i == 0), n_slices=ns)
    return out


def synth_stream_b(mb_w=5, mb_h=4, n_gops=3, seed=0, max_ref=3,
                   direct_spatial=None, wbidc=2, inference=1,
                   multi_slice=False):
    """IPBB... stream with reordered POCs (poc_type 0), non-reference B
    frames, direct modes (spatial/temporal) and implicit weighting."""
    rng = np.random.default_rng(seed)
    s = Synth(mb_w, mb_h, rng, max_ref=max_ref, poc_type=0, wbidc=wbidc,
              direct_spatial=direct_spatial, inference=inference)
    out = s.headers()
    out += s.frame(idr=True, kind='i', poc=0, ref=True)
    poc = 0
    for g in range(n_gops):
        ns = 2 if (multi_slice and g % 2 == 1) else 1
        out += s.frame(kind='p', poc=poc + 6, ref=True)
        out += s.frame(kind='b', poc=poc + 2, ref=False, n_slices=ns)
        out += s.frame(kind='b', poc=poc + 4, ref=False)
        poc += 6
    return out


def synth_stream_high(mb_w=5, mb_h=4, n_gops=2, seed=0, max_ref=3,
                      scaling=False, b_frames=True):
    """High-profile CAVLC stream: 8x8 transform (intra + inter + B),
    optional seq/pic scaling matrices with fall-back rules."""
    rng = np.random.default_rng(seed)
    s = Synth(mb_w, mb_h, rng, max_ref=max_ref, poc_type=0, wbidc=2,
              profile=100, t8=1, scaling=scaling)
    out = s.headers()
    out += s.frame(idr=True, kind='i', poc=0, ref=True)
    poc = 0
    for g in range(n_gops):
        out += s.frame(kind='p', poc=poc + 6, ref=True)
        if b_frames:
            out += s.frame(kind='b', poc=poc + 2, ref=False)
            out += s.frame(kind='b', poc=poc + 4, ref=False)
        poc += 6
    return out
