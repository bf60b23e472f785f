"""Random legal H.264 CABAC stream synthesizer — decoder conformance.

CABAC sibling of tools/h264_synth.py: emits syntactically valid streams
covering the CABAC syntax space (mb_skip_flag, I/P/B mb_types with the
Table 9-34/9-37 binarizations, sub_mb_types, ref_idx/mvd with neighbour
contexts, cbp, mb_qp_delta, intra modes, residual categories 0-4 with
sig/last maps and the level node machine, end_of_slice terminate bins).
libavcodec (tests/ffdec.py) is ground truth; hbdec264 must match exactly.

The arithmetic engine implements spec 9.3.4 (EncodeDecision / Bypass /
Terminate / Flush) over the context-init tables shared with the native
decoder (codecs/h264/cabac_tables.py, see extract_fftables.py).
"""
from __future__ import annotations

import numpy as np

from handbrake_tpu.codecs.h264.bits import BitWriter, nal_unit
from handbrake_tpu.codecs.h264.cabac_tables import (CABAC_INIT_I,
                                                    CABAC_INIT_PB,
                                                    RANGE_TAB_LPS,
                                                    TRANS_IDX_LPS,
                                                    TRANS_IDX_MPS)
from handbrake_tpu.codecs.h264.tables import ZIGZAG_4x4

from tools.h264_synth import NAL_IDR, NAL_PPS, NAL_SLICE, NAL_SPS, ZS16, \
    Synth, write_pps, write_sps


def write_pps_cabac(wbidc=0):
    bw = BitWriter()
    bw.ue(0)
    bw.ue(0)
    bw.put_bit(1)          # CABAC
    bw.put_bit(0)
    bw.ue(0)               # one slice group
    bw.ue(0)
    bw.ue(0)
    bw.put_bit(0)          # weighted_pred
    bw.put(wbidc, 2)
    bw.se(0)               # pic_init_qp 26
    bw.se(0)
    bw.se(0)
    bw.put_bit(1)          # deblocking_filter_control_present
    bw.put_bit(0)
    bw.put_bit(0)
    bw.rbsp_trailing()
    return nal_unit(3, NAL_PPS, bw.get_rbsp())


class CabacEnc:
    """Arithmetic encoder, spec 9.3.4 (bit-granular, matches hbdec264)."""

    def __init__(self, qp, i_slice, init_idc):
        tab = CABAC_INIT_I if i_slice else CABAC_INIT_PB[init_idc]
        qp = min(max(qp, 0), 51)
        self.state = []
        for m, n in tab:
            pre = min(max(1, ((m * qp) >> 4) + n), 126)
            if pre <= 63:
                self.state.append([63 - pre, 0])
            else:
                self.state.append([pre - 64, 1])
        self.low = 0
        self.range = 510
        self.bits = []
        self.outstanding = 0
        self.first = True

    def _putbit(self, b):
        if self.first:
            self.first = False
        else:
            self.bits.append(b)
        while self.outstanding:
            self.bits.append(1 - b)
            self.outstanding -= 1

    def _renorm(self):
        while self.range < 256:
            if self.low < 256:
                self._putbit(0)
            elif self.low >= 512:
                self.low -= 512
                self._putbit(1)
            else:
                self.low -= 256
                self.outstanding += 1
            self.range <<= 1
            self.low <<= 1

    def encode(self, ctx, b):
        st, mps = self.state[ctx]
        lps = RANGE_TAB_LPS[st][(self.range >> 6) & 3]
        self.range -= lps
        if b != mps:
            self.low += self.range
            self.range = lps
            if st == 0:
                self.state[ctx][1] = 1 - mps
            self.state[ctx][0] = TRANS_IDX_LPS[st]
        else:
            self.state[ctx][0] = TRANS_IDX_MPS[st]
        self._renorm()

    def bypass(self, b):
        self.low <<= 1
        if b:
            self.low += self.range
        if self.low >= 1024:
            self._putbit(1)
            self.low -= 1024
        elif self.low < 512:
            self._putbit(0)
        else:
            self.low -= 512
            self.outstanding += 1

    def terminate(self, b):
        self.range -= 2
        if b:
            self.low += self.range
            self.range = 2
            self._renorm()
            self._putbit((self.low >> 9) & 1)
            self.bits.append((self.low >> 8) & 1)
            self.bits.append(1)            # rbsp stop bit (flush)
        else:
            self._renorm()

    def eg(self, val, k):
        """Exp-Golomb order-k bypass suffix (mirror of decoder eg())."""
        lz = 0
        while val >= ((2 << lz) - 1) << k:
            lz += 1
        self_bits = []
        for _ in range(lz):
            self.bypass(1)
        self.bypass(0)
        rem = val - (((1 << lz) - 1) << k)
        for i in range(k + lz - 1, -1, -1):
            self.bypass((rem >> i) & 1)
        return self_bits

    def get_bytes(self):
        bits = self.bits[:]
        while len(bits) % 8:
            bits.append(0)                 # trailing alignment zero bits
        out = bytearray()
        for i in range(0, len(bits), 8):
            v = 0
            for b in bits[i:i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)


# residual context bases (mirror hbdec264 cabac_residual_dec)
CBF = [85, 89, 93, 97, 101]
SIG = [105, 120, 134, 149, 152]
LST = [166, 181, 195, 210, 213]
LVL = [227, 237, 247, 257, 266]
L1 = [1, 2, 3, 4, 0, 0, 0, 0]
LG = [5, 5, 5, 5, 6, 7, 8, 9]
TR0 = [1, 2, 3, 3, 4, 5, 6, 7]
TR1 = [4, 4, 4, 4, 5, 6, 7, 7]
CAT_LDC, CAT_LAC, CAT_L4, CAT_CDC, CAT_CAC = range(5)


class CabacSynth(Synth):
    """CABAC stream generator; reuses Synth's level/QP/intra-mode logic."""

    def headers(self):
        return (write_sps(self.mb_w, self.mb_h, self.max_ref,
                          self.log2_mfn, self.poc_type, self.log2_poc,
                          self.inference)
                + write_pps_cabac(self.wbidc))

    # ---- per-slice state -------------------------------------------------
    def _reset_slice(self):
        w, h = self.mb_w, self.mb_h
        self.nnz_l = np.full((h * 4, w * 4), -1, np.int32)
        self.nnz_c = [np.full((h * 2, w * 2), -1, np.int32)
                      for _ in range(2)]
        self.ipred4 = np.full((h * 4, w * 4), -1, np.int32)
        self.mb_av = np.zeros((h, w), bool)       # decoded in this slice
        self.mb_skipf = np.zeros((h, w), bool)
        self.mb_intra = np.zeros((h, w), bool)
        self.mb_i16 = np.zeros((h, w), bool)
        self.mb_bds = np.zeros((h, w), bool)      # B skip/direct16
        self.mb_cbp = np.zeros((h, w), np.int32)
        self.mb_cmode = np.zeros((h, w), np.int32)
        self.mb_dc_cbf = np.zeros((h, w), np.int32)
        self.mb_cdc_cbf = np.zeros((2, h, w), np.int32)
        # per-4x4 per-list refidx (-3 none, -1 no-list/intra, >=0 ref)
        self.refg = np.full((2, h * 4, w * 4), -3, np.int32)
        self.directg = np.zeros((h * 4, w * 4), bool)   # B direct cells
        self.amvd = np.zeros((2, h * 4, w * 4, 2), np.int32)
        self.prev_qp_nz = 0

    # ---- neighbour context helpers (mirror hbdec264) ---------------------
    def _mbav(self, x, y):
        return 0 <= x < self.mb_w and 0 <= y < self.mb_h and self.mb_av[y, x]

    def _skip_inc(self, mbx, mby):
        a = self._mbav(mbx - 1, mby) and not self.mb_skipf[mby, mbx - 1]
        b = self._mbav(mbx, mby - 1) and not self.mb_skipf[mby - 1, mbx]
        return int(a) + int(b)

    def _inxn_inc(self, mbx, mby):
        def term(x, y):
            if not self._mbav(x, y):
                return 0
            return 1 if self.mb_i16[y, x] else 0
        return term(mbx - 1, mby) + term(mbx, mby - 1)

    def _bds_inc(self, mbx, mby):
        def term(x, y):
            if not self._mbav(x, y):
                return 0
            return 0 if self.mb_bds[y, x] else 1
        return term(mbx - 1, mby) + term(mbx, mby - 1)

    def _cmode_inc(self, mbx, mby):
        def term(x, y):
            if not self._mbav(x, y):
                return 0
            return 1 if (self.mb_intra[y, x] and
                         self.mb_cmode[y, x] != 0) else 0
        return term(mbx - 1, mby) + term(mbx, mby - 1)

    # ---- syntax element writers ------------------------------------------
    def _w_qp_delta(self, enc, delta):
        if delta == 0:
            enc.encode(60 + self.prev_qp_nz, 0)
            self.prev_qp_nz = 0
            return
        k = 2 * delta - 1 if delta > 0 else -2 * delta
        enc.encode(60 + self.prev_qp_nz, 1)
        self.prev_qp_nz = 1
        if k == 1:
            enc.encode(62, 0)
        else:
            enc.encode(62, 1)
            for _ in range(k - 2):
                enc.encode(63, 1)
            if k < 79:
                enc.encode(63, 0)

    def _w_cbp(self, enc, mbx, mby, cbp):
        li = (mbx - 1, mby) if self._mbav(mbx - 1, mby) else None
        ti = (mbx, mby - 1) if self._mbav(mbx, mby - 1) else None
        cbp_l = self.mb_cbp[li[1], li[0]] & 0xF if li else 0xF
        cbp_t = self.mb_cbp[ti[1], ti[0]] & 0xF if ti else 0xF
        cur = 0
        for q in range(4):
            abit = (cur >> (q - 1)) & 1 if q & 1 else (cbp_l >> (q + 1)) & 1
            bbit = (cur >> (q - 2)) & 1 if q & 2 else (cbp_t >> (q + 2)) & 1
            inc = (0 if abit else 1) + 2 * (0 if bbit else 1)
            bit = (cbp >> q) & 1
            enc.encode(73 + inc, bit)
            cur |= bit << q
        ca = self.mb_cbp[li[1], li[0]] >> 4 if li else 0
        ct = self.mb_cbp[ti[1], ti[0]] >> 4 if ti else 0
        cc = cbp >> 4
        inc0 = (1 if ca > 0 else 0) + 2 * (1 if ct > 0 else 0)
        enc.encode(77 + inc0, 1 if cc else 0)
        if cc:
            inc1 = (1 if ca == 2 else 0) + 2 * (1 if ct == 2 else 0)
            enc.encode(81 + inc1, 1 if cc == 2 else 0)

    def _w_ref(self, enc, l, gx, gy, r):
        def term(x, y):
            if x < 0 or y < 0 or x >= self.mb_w * 4 or y >= self.mb_h * 4:
                return 0
            if self.directg[y, x]:         # 9.3.3.1.1.6: direct → 0
                return 0
            v = self.refg[l, y, x]
            return 1 if v > 0 else 0
        inc = term(gx - 1, gy) + 2 * term(gx, gy - 1)
        if r == 0:
            enc.encode(54 + inc, 0)
            return
        enc.encode(54 + inc, 1)
        if r == 1:
            enc.encode(58, 0)
            return
        enc.encode(58, 1)
        for _ in range(r - 2):
            enc.encode(59, 1)
        if r < 32:
            enc.encode(59, 0)

    def _w_mvd(self, enc, l, comp, gx, gy, v):
        base = 40 if comp == 0 else 47
        def amvd(x, y):
            if x < 0 or y < 0 or x >= self.mb_w * 4 or y >= self.mb_h * 4:
                return 0
            if self.refg[l, y, x] <= -1:      # -3 none / -1 no-list
                return 0
            return int(self.amvd[l, y, x, comp])
        e = amvd(gx - 1, gy) + amvd(gx, gy - 1)
        inc = 0 if e < 3 else (2 if e > 32 else 1)
        a = abs(v)
        if a == 0:
            enc.encode(base + inc, 0)
            return
        enc.encode(base + inc, 1)
        off = [3, 4, 5, 6, 6, 6, 6, 6]
        n = min(a, 9)
        for j in range(n - 1):
            enc.encode(base + off[j if j < 8 else 7], 1)
        if a < 9:
            enc.encode(base + off[(a - 1) if (a - 1) < 8 else 7], 0)
        else:
            enc.eg(a - 9, 3)
        enc.bypass(1 if v < 0 else 0)

    def _w_residual(self, enc, cat, inc, levels, n, has_cbf=True):
        """levels: list length n in scan order. Returns total_coeff."""
        nz = [i for i, v in enumerate(levels) if v]
        if has_cbf:
            enc.encode(CBF[cat] + inc, 1 if nz else 0)
            if not nz:
                return 0
        last = max(nz)
        for i in range(n - 1):
            sig = 1 if levels[i] else 0
            if i > last:
                break
            enc.encode(SIG[cat] + i, sig)
            if sig:
                enc.encode(LST[cat] + i, 1 if i == last else 0)
                if i == last:
                    break
        node = 0
        for i in range(last, -1, -1):
            v = levels[i]
            if not v:
                continue
            a = abs(v)
            if a == 1:
                enc.encode(LVL[cat] + L1[node], 0)
                node = TR0[node]
            else:
                enc.encode(LVL[cat] + L1[node], 1)
                g = LVL[cat] + LG[node]
                m = a - 2
                for _ in range(min(m, 13)):
                    enc.encode(g, 1)
                if m < 13:
                    enc.encode(g, 0)
                else:
                    enc.eg(a - 15, 0)
                node = TR1[node]
            enc.bypass(1 if v < 0 else 0)
        return len(nz)

    def _cbf_inc_dc(self, mbx, mby, intra, which, comp=0):
        """which: 'ldc' or 'cdc'."""
        def term(x, y):
            if not self._mbav(x, y):
                return 1 if intra else 0
            if which == 'ldc':
                return (self.mb_dc_cbf[y, x]
                        if self.mb_i16[y, x] else 0)
            return self.mb_cdc_cbf[comp, y, x]
        return term(mbx - 1, mby) + 2 * term(mbx, mby - 1)

    def _cbf_inc_grid(self, g, gx, gy, intra, chroma, comp=0):
        gw = self.mb_w * (2 if chroma else 4)
        gh = self.mb_h * (2 if chroma else 4)
        def term(x, y):
            if x < 0 or y < 0 or x >= gw or y >= gh:
                return 1 if intra else 0
            v = g[y, x]
            if v < 0:                      # other slice / not decoded
                return 1 if intra else 0
            return 1 if v > 0 else 0
        return term(gx - 1, gy) + 2 * term(gx, gy - 1)

    def _w_luma_residual(self, enc, mbx, mby, cbp_luma, i16, intra):
        g0y, g0x = mby * 4, mbx * 4
        if i16:
            lv = self._levels(16, 0.4, 8, kind="ldc")
            inc = self._cbf_inc_dc(mbx, mby, intra, 'ldc')
            tc = self._w_residual(enc, CAT_LDC, inc, lv, 16)
            self.mb_dc_cbf[mby, mbx] = 1 if tc else 0
        maxc = 15 if i16 else 16
        for k in range(16):
            b = ZS16[k]
            quad = (b // 8) * 2 + (b % 4) // 2
            by, bx = g0y + b // 4, g0x + b % 4
            if not ((cbp_luma >> quad) & 1):
                self.nnz_l[by, bx] = 0
                continue
            inc = self._cbf_inc_grid(self.nnz_l, bx, by, intra, False)
            lv = self._levels(maxc)
            cat = CAT_LAC if i16 else CAT_L4
            tc = self._w_residual(enc, cat, inc, lv, maxc)
            self.nnz_l[by, bx] = tc

    def _w_chroma_residual(self, enc, mbx, mby, cbp_c, intra):
        c0y, c0x = mby * 2, mbx * 2
        if cbp_c == 0:
            for comp in range(2):
                self.nnz_c[comp][c0y:c0y + 2, c0x:c0x + 2] = 0
                self.mb_cdc_cbf[comp, mby, mbx] = 0
            return
        qpc = self._chroma_qp()
        for comp in range(2):
            lv = self._levels(4, 0.5, 8, qp=qpc, kind="cdc")
            inc = self._cbf_inc_dc(mbx, mby, intra, 'cdc', comp)
            tc = self._w_residual(enc, CAT_CDC, inc, lv, 4)
            self.mb_cdc_cbf[comp, mby, mbx] = 1 if tc else 0
        if cbp_c == 2:
            for comp in range(2):
                for b in range(4):
                    cy, cx = c0y + b // 2, c0x + b % 2
                    inc = self._cbf_inc_grid(self.nnz_c[comp], cx, cy,
                                             intra, True, comp)
                    lv = self._levels(15, 0.25, 8, qp=qpc)
                    tc = self._w_residual(enc, CAT_CAC, inc, lv, 15)
                    self.nnz_c[comp][cy, cx] = tc
        else:
            for comp in range(2):
                self.nnz_c[comp][c0y:c0y + 2, c0x:c0x + 2] = 0

    # ---- macroblocks -----------------------------------------------------
    def _mark_inter(self, mbx, mby):
        self.ipred4[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 2

    def _set_refs(self, l, gx, gy, w4, h4, r, mdx=0, mdy=0):
        self.refg[l, gy:gy + h4, gx:gx + w4] = r
        self.amvd[l, gy:gy + h4, gx:gx + w4, 0] = abs(mdx)
        self.amvd[l, gy:gy + h4, gx:gx + w4, 1] = abs(mdy)

    def _spatial_direct_refs(self, mbx, mby):
        """Derived (ref0, ref1) of spatial direct (MinPositive over A,B,C);
        needed so later ref_idx/skip contexts see what the decoder derives.
        """
        gx, gy = mbx * 4, mby * 4
        gw, gh = self.mb_w * 4, self.mb_h * 4
        out = []
        for l in range(2):
            def rat(x, y):
                if x < 0 or y < 0 or x >= gw or y >= gh:
                    return -3
                return int(self.refg[l, y, x])
            A = rat(gx - 1, gy)
            B = rat(gx, gy - 1)
            C = rat(gx + 4, gy - 1)
            if C == -3:
                C = rat(gx - 1, gy - 1)
            def mp(a, b):
                if a >= 0 and b >= 0:
                    return min(a, b)
                return max(a, b)
            r = mp(mp(max(A, -1), max(B, -1)), max(C, -1))
            out.append(r)
        if out[0] < 0 and out[1] < 0:
            return (0, 0)
        return tuple(out)

    def _apply_direct(self, mbx, mby):
        r0, r1 = self._spatial_direct_refs(mbx, mby)
        gx, gy = mbx * 4, mby * 4
        self._set_refs(0, gx, gy, 4, 4, r0 if r0 >= 0 else -1)
        self._set_refs(1, gx, gy, 4, 4, r1 if r1 >= 0 else -1)
        self.directg[gy:gy + 4, gx:gx + 4] = True

    def _w_intra_mb(self, enc, mbx, mby, slice_kind):
        # choose I_4x4 or I_16x16 (no PCM in CABAC synth)
        i16 = self.rng.random() < 0.5
        inc = self._inxn_inc(mbx, mby)
        self.mb_intra[mby, mbx] = True
        self.refg[:, mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = -1
        self.amvd[:, mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 0
        if slice_kind == 'i':
            base0, ctx0 = 3 + inc, (6, 7, 8, 9, 10)
        elif slice_kind == 'p':
            enc.encode(14, 1)
            base0, ctx0 = 17, (18, 19, 19, 20, 20)
        else:
            # B intra escape: prefix 11 + bits 13
            enc.encode(27 + self._bds_inc(mbx, mby), 1)
            enc.encode(30, 1)
            enc.encode(31, 1)
            enc.encode(32, 1)
            enc.encode(32, 0)
            enc.encode(32, 1)
            base0, ctx0 = 32, (33, 34, 34, 35, 35)
        if not i16:
            enc.encode(base0, 0)
            modes = self._i4_modes(mbx, mby)
            for k in range(16):
                b = ZS16[k]
                gx = mbx * 4 + b % 4
                gy = mby * 4 + b // 4
                pa = self.ipred4[gy, gx - 1] if gx > 0 else -1
                pb = self.ipred4[gy - 1, gx] if gy > 0 else -1
                mpm = 2 if (pa < 0 or pb < 0) else min(pa, pb)
                mode = modes[k]
                if mode == mpm:
                    enc.encode(68, 1)
                else:
                    enc.encode(68, 0)
                    r = mode if mode < mpm else mode - 1
                    enc.encode(69, r & 1)
                    enc.encode(69, (r >> 1) & 1)
                    enc.encode(69, (r >> 2) & 1)
                self.ipred4[gy, gx] = mode
            cm = self._cmode(mbx, mby)
            cminc = self._cmode_inc(mbx, mby)
            if cm == 0:
                enc.encode(64 + cminc, 0)
            else:
                enc.encode(64 + cminc, 1)
                if cm == 1:
                    enc.encode(67, 0)
                else:
                    enc.encode(67, 1)
                    enc.encode(67, 1 if cm == 3 else 0)
            self.mb_cmode[mby, mbx] = cm
            cbp = int(self.rng.integers(0, 48))
            self._w_cbp(enc, mbx, mby, cbp)
            if cbp:
                d = self._qp_delta_val()
                self._w_qp_delta(enc, d)
            else:
                self.prev_qp_nz = 0
            self._w_luma_residual(enc, mbx, mby, cbp & 15, False, True)
            self._w_chroma_residual(enc, mbx, mby, cbp >> 4, True)
            self.mb_cbp[mby, mbx] = cbp
            return
        # I_16x16
        enc.encode(base0, 1)
        enc.terminate(0)                   # not PCM
        imode = self._i16_mode(mbx, mby)
        cbp_c = int(self.rng.integers(0, 3))
        cbp_ac = int(self.rng.integers(0, 2))
        enc.encode(ctx0[0], cbp_ac)
        enc.encode(ctx0[1], 1 if cbp_c else 0)
        if cbp_c:
            enc.encode(ctx0[2], 1 if cbp_c == 2 else 0)
        enc.encode(ctx0[3], imode >> 1)
        enc.encode(ctx0[4], imode & 1)
        self.mb_i16[mby, mbx] = True
        cm = self._cmode(mbx, mby)
        cminc = self._cmode_inc(mbx, mby)
        if cm == 0:
            enc.encode(64 + cminc, 0)
        else:
            enc.encode(64 + cminc, 1)
            if cm == 1:
                enc.encode(67, 0)
            else:
                enc.encode(67, 1)
                enc.encode(67, 1 if cm == 3 else 0)
        self.mb_cmode[mby, mbx] = cm
        d = self._qp_delta_val()
        self._w_qp_delta(enc, d)
        self._w_luma_residual(enc, mbx, mby, 15 if cbp_ac else 0, True,
                              True)
        if not cbp_ac:
            self.nnz_l[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 0
        self._w_chroma_residual(enc, mbx, mby, cbp_c, True)
        self.mb_cbp[mby, mbx] = (15 if cbp_ac else 0) | (cbp_c << 4)
        self.ipred4[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 2

    def _qp_delta_val(self):
        lo = max(-4, 10 - self.cur_qp)
        hi = min(4, 44 - self.cur_qp)
        d = int(self.rng.integers(lo, hi + 1))
        self.cur_qp += d
        return d

    def _w_p_mb(self, enc, mbx, mby, nref):
        mb_type = int(self.rng.integers(0, 4))
        enc.encode(14, 0)
        b1, b2 = {0: (0, 0), 3: (0, 1), 2: (1, 0), 1: (1, 1)}[mb_type]
        enc.encode(15, b1)
        enc.encode(17 if b1 else 16, b2)
        g0x, g0y = mbx * 4, mby * 4
        self._mark_inter(mbx, mby)
        self.refg[1, g0y:g0y + 4, g0x:g0x + 4] = -1
        if mb_type == 0:
            r = int(self.rng.integers(0, nref))
            if nref > 1:
                self._w_ref(enc, 0, g0x, g0y, r)
            dx, dy = self._mv()
            self._w_mvd(enc, 0, 0, g0x, g0y, dx)
            self._w_mvd(enc, 0, 1, g0x, g0y, dy)
            self._set_refs(0, g0x, g0y, 4, 4, r, dx, dy)
        elif mb_type in (1, 2):
            for p in range(2):
                if mb_type == 1:
                    px, py, w4, h4 = g0x, g0y + p * 2, 4, 2
                else:
                    px, py, w4, h4 = g0x + p * 2, g0y, 2, 4
                r = int(self.rng.integers(0, nref))
                if nref > 1:
                    self._w_ref(enc, 0, px, py, r)
                self._set_refs(0, px, py, w4, h4, r)
            for p in range(2):
                if mb_type == 1:
                    px, py, w4, h4 = g0x, g0y + p * 2, 4, 2
                else:
                    px, py, w4, h4 = g0x + p * 2, g0y, 2, 4
                dx, dy = self._mv()
                self._w_mvd(enc, 0, 0, px, py, dx)
                self._w_mvd(enc, 0, 1, px, py, dy)
                self._set_refs(0, px, py, w4, h4,
                               int(self.refg[0, py, px]), dx, dy)
        else:
            # P_8x8: sub types, then refs, then mvds
            subs = [int(self.rng.integers(0, 4)) for _ in range(4)]
            for s in subs:
                if s == 0:
                    enc.encode(21, 1)
                elif s == 1:
                    enc.encode(21, 0)
                    enc.encode(22, 0)
                elif s == 2:
                    enc.encode(21, 0)
                    enc.encode(22, 1)
                    enc.encode(23, 1)
                else:
                    enc.encode(21, 0)
                    enc.encode(22, 1)
                    enc.encode(23, 0)
            refs = []
            for q in range(4):
                qx, qy = g0x + (q & 1) * 2, g0y + (q >> 1) * 2
                r = int(self.rng.integers(0, nref))
                if nref > 1:
                    self._w_ref(enc, 0, qx, qy, r)
                refs.append(r)
                self._set_refs(0, qx, qy, 2, 2, r)
            for q in range(4):
                qx, qy = g0x + (q & 1) * 2, g0y + (q >> 1) * 2
                st = subs[q]
                parts = {0: [(0, 0, 2, 2)],
                         1: [(0, 0, 2, 1), (0, 1, 2, 1)],
                         2: [(0, 0, 1, 2), (1, 0, 1, 2)],
                         3: [(0, 0, 1, 1), (1, 0, 1, 1),
                             (0, 1, 1, 1), (1, 1, 1, 1)]}[st]
                for (bx, by, w4, h4) in parts:
                    dx, dy = self._mv()
                    self._w_mvd(enc, 0, 0, qx + bx, qy + by, dx)
                    self._w_mvd(enc, 0, 1, qx + bx, qy + by, dy)
                    self._set_refs(0, qx + bx, qy + by, w4, h4,
                                   refs[q], dx, dy)
        cbp = int(self.rng.integers(0, 48))
        self._w_cbp(enc, mbx, mby, cbp)
        if cbp:
            self._w_qp_delta(enc, self._qp_delta_val())
        else:
            self.prev_qp_nz = 0
        self._w_luma_residual(enc, mbx, mby, cbp & 15, False, False)
        self._w_chroma_residual(enc, mbx, mby, cbp >> 4, False)
        self.mb_cbp[mby, mbx] = cbp

    def _w_b_mbtype(self, enc, mbx, mby, t):
        inc = self._bds_inc(mbx, mby)
        if t == 0:
            enc.encode(27 + inc, 0)
            return
        enc.encode(27 + inc, 1)
        if t in (1, 2):
            enc.encode(30, 0)
            enc.encode(32, t - 1)
            return
        enc.encode(30, 1)
        if 3 <= t <= 10:
            b = t - 3
            enc.encode(31, 0)
            enc.encode(32, (b >> 2) & 1)
            enc.encode(32, (b >> 1) & 1)
            enc.encode(32, b & 1)
            return
        if t == 11:
            bits = 14
        elif t == 22:
            bits = 15
        else:
            v = t + 4
            bits = v >> 1
            enc.encode(31, (bits >> 3) & 1)
            enc.encode(32, (bits >> 2) & 1)
            enc.encode(32, (bits >> 1) & 1)
            enc.encode(32, bits & 1)
            enc.encode(32, v & 1)
            return
        enc.encode(31, (bits >> 3) & 1)
        enc.encode(32, (bits >> 2) & 1)
        enc.encode(32, (bits >> 1) & 1)
        enc.encode(32, bits & 1)

    def _w_b_sub(self, enc, t):
        if t == 0:
            enc.encode(36, 0)
            return
        enc.encode(36, 1)
        if t in (1, 2):
            enc.encode(37, 0)
            enc.encode(39, t - 1)
            return
        enc.encode(37, 1)
        if t in (11, 12):
            enc.encode(38, 1)
            enc.encode(39, 1)
            enc.encode(39, t - 11)
            return
        if 3 <= t <= 6:
            enc.encode(38, 0)
            b = t - 3
        else:
            enc.encode(38, 1)
            enc.encode(39, 0)
            b = t - 7
        enc.encode(39, (b >> 1) & 1)
        enc.encode(39, b & 1)

    def _w_b_mb(self, enc, mbx, mby, nref):
        t = int(self.rng.integers(0, 23))
        self._w_b_mbtype(enc, mbx, mby, t)
        g0x, g0y = mbx * 4, mby * 4
        self._mark_inter(mbx, mby)
        if t == 0:
            self._apply_direct(mbx, mby)
            self.mb_bds[mby, mbx] = True
        elif t < 22:
            shape = self.B_SHAPE[t]
            np_ = 1 if shape == 0 else 2
            refs = [[-1, -1], [-1, -1]]
            for l in range(2):
                for p in range(np_):
                    bx0 = g0x + (p * 2 if shape == 2 else 0)
                    by0 = g0y + (p * 2 if shape == 1 else 0)
                    w4 = 2 if shape == 2 else 4
                    h4 = 2 if shape == 1 else 4
                    if (self.B_PRED[t][p] >> l) & 1:
                        r = int(self.rng.integers(0, nref[l]))
                        if nref[l] > 1:
                            self._w_ref(enc, l, bx0, by0, r)
                        refs[l][p] = r
                        self._set_refs(l, bx0, by0, w4, h4, r)
                    else:
                        self._set_refs(l, bx0, by0, w4, h4, -1)
            for l in range(2):
                for p in range(np_):
                    if refs[l][p] < 0:
                        continue
                    bx0 = g0x + (p * 2 if shape == 2 else 0)
                    by0 = g0y + (p * 2 if shape == 1 else 0)
                    w4 = 2 if shape == 2 else 4
                    h4 = 2 if shape == 1 else 4
                    dx, dy = self._mv()
                    self._w_mvd(enc, l, 0, bx0, by0, dx)
                    self._w_mvd(enc, l, 1, bx0, by0, dy)
                    self._set_refs(l, bx0, by0, w4, h4, refs[l][p],
                                   dx, dy)
        else:
            subs = [int(self.rng.integers(0, 13)) for _ in range(4)]
            for s in subs:
                self._w_b_sub(enc, s)
            # direct quadrants derive refs before ref parsing (decoder
            # applies direct early; contexts must agree)
            dr = self._spatial_direct_refs(mbx, mby)
            for q in range(4):
                if subs[q] == 0:
                    qx, qy = g0x + (q & 1) * 2, g0y + (q >> 1) * 2
                    self._set_refs(0, qx, qy, 2, 2,
                                   dr[0] if dr[0] >= 0 else -1)
                    self._set_refs(1, qx, qy, 2, 2,
                                   dr[1] if dr[1] >= 0 else -1)
                    self.directg[qy:qy + 2, qx:qx + 2] = True
            refs = [[-1] * 4, [-1] * 4]
            for l in range(2):
                for q in range(4):
                    s = subs[q]
                    if s == 0:
                        continue
                    qx, qy = g0x + (q & 1) * 2, g0y + (q >> 1) * 2
                    if (self.B_SUB_PRED[s] >> l) & 1:
                        r = int(self.rng.integers(0, nref[l]))
                        if nref[l] > 1:
                            self._w_ref(enc, l, qx, qy, r)
                        refs[l][q] = r
                        self._set_refs(l, qx, qy, 2, 2, r)
                    else:
                        self._set_refs(l, qx, qy, 2, 2, -1)
            for l in range(2):
                for q in range(4):
                    s = subs[q]
                    if s == 0 or refs[l][q] < 0:
                        continue
                    qx, qy = g0x + (q & 1) * 2, g0y + (q >> 1) * 2
                    shape = self.B_SUB_NSUB[s]
                    parts = {1: [(0, 0, 2, 2)],
                             2: ([(0, 0, 2, 1), (0, 1, 2, 1)]
                                 if self.B_SUB_PRED[s] and
                                 s in (4, 6, 8) else
                                 [(0, 0, 1, 2), (1, 0, 1, 2)]),
                             4: [(0, 0, 1, 1), (1, 0, 1, 1),
                                 (0, 1, 1, 1), (1, 1, 1, 1)]}[shape]
                    for (bx, by, w4, h4) in parts:
                        dx, dy = self._mv()
                        self._w_mvd(enc, l, 0, qx + bx, qy + by, dx)
                        self._w_mvd(enc, l, 1, qx + bx, qy + by, dy)
                        self._set_refs(l, qx + bx, qy + by, w4, h4,
                                       refs[l][q], dx, dy)
        cbp = int(self.rng.integers(0, 48))
        self._w_cbp(enc, mbx, mby, cbp)
        if cbp:
            self._w_qp_delta(enc, self._qp_delta_val())
        else:
            self.prev_qp_nz = 0
        self._w_luma_residual(enc, mbx, mby, cbp & 15, False, False)
        self._w_chroma_residual(enc, mbx, mby, cbp >> 4, False)
        self.mb_cbp[mby, mbx] = cbp

    # ---- slices ----------------------------------------------------------
    def frame(self, idr=False, n_slices=1, kind=None, poc=0, ref=True):
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
        navail = min(self.n_refs, self.max_ref)
        for si in range(len(bounds) - 1):
            first_mb, end_mb = bounds[si], bounds[si + 1]
            self._reset_slice()
            bw = BitWriter()
            bw.ue(first_mb)
            bw.ue({'p': 0, 'b': 1, 'i': 2}[kind] + 5)
            bw.ue(0)
            bw.put(self.frame_num, self.log2_mfn)
            if idr:
                bw.ue(0)
            if self.poc_type == 0:
                bw.put(poc % (1 << self.log2_poc), self.log2_poc)
            nref = navail
            nref_b = (1, 1)
            if kind == 'b':
                ds = (int(self.rng.integers(0, 2))
                      if self.direct_spatial is None else
                      int(self.direct_spatial))
                bw.put_bit(ds)
                nref_b = (min(navail, 1 + int(self.rng.integers(0, 2))),
                          min(navail, 1 + int(self.rng.integers(0, 2))))
                bw.put_bit(1)
                bw.ue(nref_b[0] - 1)
                bw.ue(nref_b[1] - 1)
                bw.put_bit(0)
                bw.put_bit(0)
            if kind == 'p':
                if nref != 1:
                    bw.put_bit(1)
                    bw.ue(nref - 1)
                else:
                    bw.put_bit(0)
                bw.put_bit(0)
            if idr:
                bw.put_bit(0)
                bw.put_bit(0)
            elif ref:
                bw.put_bit(0)
            init_idc = 0
            if kind != 'i':
                init_idc = int(self.rng.integers(0, 3))
                bw.ue(init_idc)
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
            while bw._nbits % 8:
                bw.put_bit(1)              # cabac_alignment_one_bit
            enc = CabacEnc(qp, kind == 'i', init_idc)
            self.prev_qp_nz = 0
            for mb in range(first_mb, end_mb):
                mbx, mby = mb % self.mb_w, mb // self.mb_w
                self.mb_av[mby, mbx] = True
                if kind != 'i':
                    skip = self.rng.random() < 0.2
                    enc.encode((24 if kind == 'b' else 11)
                               + self._skip_inc(mbx, mby), 1 if skip else 0)
                    if skip:
                        self.mb_skipf[mby, mbx] = True
                        self.prev_qp_nz = 0
                        self._mark_inter(mbx, mby)
                        self.nnz_l[mby * 4:mby * 4 + 4,
                                   mbx * 4:mbx * 4 + 4] = 0
                        for comp in range(2):
                            self.nnz_c[comp][mby * 2:mby * 2 + 2,
                                             mbx * 2:mbx * 2 + 2] = 0
                        if kind == 'b':
                            self._apply_direct(mbx, mby)
                            self.mb_bds[mby, mbx] = True
                        else:
                            self._set_refs(0, mbx * 4, mby * 4, 4, 4, 0)
                            self.refg[1, mby * 4:mby * 4 + 4,
                                      mbx * 4:mbx * 4 + 4] = -1
                        enc.terminate(0 if mb != end_mb - 1 else 1)
                        continue
                if kind == 'i' or self.rng.random() < 0.2:
                    self._w_intra_mb(enc, mbx, mby, kind)
                elif kind == 'b':
                    self._w_b_mb(enc, mbx, mby, nref_b)
                else:
                    self._w_p_mb(enc, mbx, mby, nref)
                enc.terminate(0 if mb != end_mb - 1 else 1)
            payload = bw.get_rbsp() + enc.get_bytes()
            out += nal_unit(3 if ref else 0,
                            NAL_IDR if idr else NAL_SLICE, payload)
        if ref:
            self.frame_num = (self.frame_num + 1) % (1 << self.log2_mfn)
            self.n_refs = min(self.n_refs + 1, self.max_ref)
        return out


def synth_stream_cabac(mb_w=5, mb_h=4, n_frames=6, seed=0, max_ref=3,
                       multi_slice=False):
    """I/P CABAC stream (poc_type 2)."""
    rng = np.random.default_rng(seed)
    s = CabacSynth(mb_w, mb_h, rng, max_ref=max_ref)
    out = s.headers()
    for i in range(n_frames):
        ns = 2 if (multi_slice and i % 2 == 1) else 1
        out += s.frame(idr=(i == 0), n_slices=ns)
    return out


def synth_stream_cabac_b(mb_w=5, mb_h=4, n_gops=3, seed=0, max_ref=3,
                         wbidc=2, multi_slice=False):
    """IPBB CABAC stream with reordered POCs; spatial direct only (the
    synthesizer tracks refs, not motion, so temporal direct ref contexts
    stay CAVLC-covered)."""
    rng = np.random.default_rng(seed)
    s = CabacSynth(mb_w, mb_h, rng, max_ref=max_ref, poc_type=0,
                   wbidc=wbidc, direct_spatial=1)
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
