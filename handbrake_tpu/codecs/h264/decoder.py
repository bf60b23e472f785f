"""H.264 decoder — Baseline CAVLC subset matching encoder.py's output
(I16x16 / P_L0_16x16 / P_Skip, one reference, deblocking off).

Role of the reference's decavcodec.c video personality (SURVEY.md §2.3):
bit-exact decode of our own streams for round-trip tests, scan previews, and
the transcode read path. Entropy decode is host-side; pixel reconstruction
uses the same array-module-agnostic transform code as the encoder.
"""
from __future__ import annotations

import numpy as np

from . import predict as P
from . import transform as T
from .bits import BitReader, ebsp_to_rbsp, split_annexb
from .cavlc import decode_residual, nc_context
from .encoder import PAD, _CODED_ORDER, MBCtx
from .syntax import (NAL_IDR, NAL_PPS, NAL_SLICE, NAL_SPS, PPS, SLICE_I,
                     SLICE_P, SPS, SliceHeader)
from .tables import CBP_INTER, CBP_INTRA4x4, ZIGZAG_4x4


def _unzigzag(levels16):
    out = np.zeros(16, np.int32)
    out[ZIGZAG_4x4] = levels16
    return out.reshape(4, 4)


class H264Decoder:
    """Feed annex-B bytes; yields (y, u, v) uint8 frames."""

    def __init__(self):
        self.sps = None
        self.pps = None
        self.recon_y = None
        self.recon_u = None
        self.recon_v = None

    # -- public ------------------------------------------------------------
    def decode(self, data: bytes):
        """Decode a complete annex-B stream → list of (y,u,v) frames."""
        frames = []
        for nal in split_annexb(data):
            f = self.decode_nal(nal)
            if f is not None:
                frames.append(f)
        return frames

    def decode_nal(self, nal: bytes):
        nal_type = nal[0] & 0x1F
        rbsp = ebsp_to_rbsp(nal[1:])
        if nal_type == NAL_SPS:
            self.sps = SPS.parse(rbsp)
            return None
        if nal_type == NAL_PPS:
            self.pps = PPS.parse(rbsp)
            return None
        if nal_type in (NAL_SLICE, NAL_IDR):
            return self._decode_slice(rbsp, nal_type)
        return None

    # -- slice -------------------------------------------------------------
    def _decode_slice(self, rbsp: bytes, nal_type: int):
        sps, pps = self.sps, self.pps
        br = BitReader(rbsp)
        hdr = SliceHeader.parse(br, sps, pps, nal_type)
        mb_w, mb_h = sps.width_mbs, sps.height_mbs
        W, H = mb_w * 16, mb_h * 16
        y = np.zeros((H, W), np.int32)
        u = np.zeros((H // 2, W // 2), np.int32)
        v = np.zeros((H // 2, W // 2), np.int32)
        ctx = MBCtx(mb_w, mb_h)
        qp = hdr.qp
        qpc = T.chroma_qp(qp, pps.chroma_qp_index_offset)
        ref_y = ref_u = ref_v = None
        if hdr.slice_type == SLICE_P:
            ref_y = P.pad_plane(self.recon_y, PAD)
            ref_u = P.pad_plane(self.recon_u, PAD)
            ref_v = P.pad_plane(self.recon_v, PAD)

        n_mbs = mb_w * mb_h
        mb = 0
        while mb < n_mbs:
            if hdr.slice_type == SLICE_P:
                run = br.ue()  # mb_skip_run
                for _ in range(run):
                    self._decode_skip_mb(y, u, v, ref_y, ref_u, ref_v, ctx,
                                         mb % mb_w, mb // mb_w, mb_w)
                    mb += 1
                if mb >= n_mbs:
                    break
            self._decode_mb(br, y, u, v, ref_y, ref_u, ref_v, ctx,
                            mb % mb_w, mb // mb_w, mb_w, qp, qpc,
                            hdr.slice_type)
            mb += 1
        if hdr.disable_deblocking == 0:
            from .deblock import deblock_frame
            mb_intra = np.zeros((mb_h, mb_w), bool)
            mvs = np.zeros((mb_h, mb_w, 2), np.int32)
            for (mbx, mby), r in ctx.refs.items():
                mb_intra[mby, mbx] = (r == -1)
            for (mbx, mby), mv in ctx.mvs.items():
                mvs[mby, mbx] = mv
            deblock_frame(y, u, v, qp, qpc, mb_intra, mvs, ctx.nnz_l)
        self.recon_y, self.recon_u, self.recon_v = y, u, v
        cw = sps.width
        ch = sps.height
        return (y[:ch, :cw].astype(np.uint8),
                u[:ch // 2, :cw // 2].astype(np.uint8),
                v[:ch // 2, :cw // 2].astype(np.uint8))

    # -- macroblocks -------------------------------------------------------
    def _decode_skip_mb(self, y, u, v, ref_y, ref_u, ref_v, ctx, mbx, mby,
                        mb_w):
        mv = P.skip_mv(ctx.mvs, ctx.refs, mbx, mby, mb_w)
        x0, y0 = mbx * 16, mby * 16
        cx0, cy0 = mbx * 8, mby * 8
        y[y0:y0 + 16, x0:x0 + 16] = P.mc_luma_block(
            ref_y, PAD, x0, y0, 16, 16, mv[0], mv[1])
        u[cy0:cy0 + 8, cx0:cx0 + 8] = P.mc_chroma_block(
            ref_u, PAD, cx0, cy0, 8, 8, mv[0], mv[1])
        v[cy0:cy0 + 8, cx0:cx0 + 8] = P.mc_chroma_block(
            ref_v, PAD, cx0, cy0, 8, 8, mv[0], mv[1])
        ctx.mvs[(mbx, mby)] = tuple(mv)
        ctx.refs[(mbx, mby)] = 0
        ctx.nnz_l[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 0
        ctx.nnz_cb[mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0
        ctx.nnz_cr[mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0

    def _decode_mb(self, br, y, u, v, ref_y, ref_u, ref_v, ctx, mbx, mby,
                   mb_w, qp, qpc, slice_type):
        mb_type = br.ue()
        if slice_type == SLICE_P:
            if mb_type < 5:
                if mb_type != 0:
                    raise NotImplementedError(f"P mb_type {mb_type}")
                return self._decode_inter_mb(br, y, u, v, ref_y, ref_u,
                                             ref_v, ctx, mbx, mby, mb_w, qp,
                                             qpc)
            mb_type -= 5
        if mb_type == 0:
            raise NotImplementedError("I_4x4")
        if mb_type == 25:
            raise NotImplementedError("I_PCM")
        t = mb_type - 1
        imode = t % 4
        cbp_chroma = (t // 4) % 3
        cbp_ac = 15 if t >= 12 else 0
        self._decode_intra_mb(br, y, u, v, ctx, mbx, mby, qp, qpc, imode,
                              cbp_chroma, cbp_ac)

    def _decode_intra_mb(self, br, y, u, v, ctx, mbx, mby, qp, qpc, imode,
                         cbp_chroma, cbp_ac):
        from .encoder import _chroma_neighbors, _i16_neighbors
        cmode = br.ue()
        br.se()  # mb_qp_delta (fixed-QP streams)

        x0, y0 = mbx * 16, mby * 16
        cx0, cy0 = mbx * 8, mby * 8
        b0y, b0x = mby * 4, mbx * 4

        # luma DC
        nc = ctx.nc_luma(b0y, b0x)
        dc_scan, _ = decode_residual(br, nc, 16)
        dclv = np.zeros(16, np.int32)
        dclv[ZIGZAG_4x4] = dc_scan
        dclv = dclv.reshape(4, 4)
        aclv = np.zeros((16, 4, 4), np.int32)
        if cbp_ac:
            for k in range(16):
                ridx = _CODED_ORDER[k]
                by, bx = b0y + ridx // 4, b0x + ridx % 4
                nc = ctx.nc_luma(by, bx)
                lv, tc = decode_residual(br, nc, 15)
                aclv[ridx] = _unzigzag([0] + lv)
                ctx.nnz_l[by, bx] = tc
        else:
            ctx.nnz_l[b0y:b0y + 4, b0x:b0x + 4] = 0

        top, left, topleft = _i16_neighbors(y, mbx, mby)
        pred = P.intra16_pred(imode, top, left, topleft)
        f = T.ihadamard4x4(np, dclv[None])[0]
        dcq = T.dequant_luma_dc(np, f, qp)
        dq = T.dequant4x4(np, aclv, qp)
        dq[:, 0, 0] = dcq.reshape(16)
        r = T.idct4x4(np, dq)
        y[y0:y0 + 16, x0:x0 + 16] = np.clip(
            pred + T.from_blocks4(np, r, 16, 16), 0, 255)

        # chroma
        tu, lu, tlu = _chroma_neighbors(u, mbx, mby)
        tv, lv_, tlv = _chroma_neighbors(v, mbx, mby)
        predu = P.chroma_pred(cmode, tu, lu, tlu)
        predv = P.chroma_pred(cmode, tv, lv_, tlv)
        urec, vrec = self._decode_chroma_residual(br, ctx, mbx, mby,
                                                  cbp_chroma, qpc, predu,
                                                  predv)
        u[cy0:cy0 + 8, cx0:cx0 + 8] = urec
        v[cy0:cy0 + 8, cx0:cx0 + 8] = vrec
        ctx.refs[(mbx, mby)] = -1

    def _decode_inter_mb(self, br, y, u, v, ref_y, ref_u, ref_v, ctx, mbx,
                         mby, mb_w, qp, qpc):
        x0, y0 = mbx * 16, mby * 16
        cx0, cy0 = mbx * 8, mby * 8
        b0y, b0x = mby * 4, mbx * 4
        pred_mv = P.predict_mv_16x16(ctx.mvs, ctx.refs, mbx, mby, mb_w)
        mvd = (br.se(), br.se())
        mv = (pred_mv[0] + mvd[0], pred_mv[1] + mvd[1])
        cbp = CBP_INTER[br.ue()]
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        if cbp != 0:
            br.se()  # mb_qp_delta

        mc_y = P.mc_luma_block(ref_y, PAD, x0, y0, 16, 16, mv[0], mv[1])
        lv = np.zeros((16, 4, 4), np.int32)
        if cbp_luma:
            for k in range(16):
                ridx = _CODED_ORDER[k]
                quad = (ridx // 8) * 2 + (ridx % 4) // 2
                by, bx = b0y + ridx // 4, b0x + ridx % 4
                if not (cbp_luma >> quad) & 1:
                    ctx.nnz_l[by, bx] = 0
                    continue
                nc = ctx.nc_luma(by, bx)
                levels, tc = decode_residual(br, nc, 16)
                lv[ridx] = _unzigzag(levels)
                ctx.nnz_l[by, bx] = tc
        else:
            ctx.nnz_l[b0y:b0y + 4, b0x:b0x + 4] = 0
        dq = T.dequant4x4(np, lv, qp)
        r = T.idct4x4(np, dq)
        y[y0:y0 + 16, x0:x0 + 16] = np.clip(
            mc_y + T.from_blocks4(np, r, 16, 16), 0, 255)

        mcu = P.mc_chroma_block(ref_u, PAD, cx0, cy0, 8, 8, mv[0], mv[1])
        mcv = P.mc_chroma_block(ref_v, PAD, cx0, cy0, 8, 8, mv[0], mv[1])
        urec, vrec = self._decode_chroma_residual(br, ctx, mbx, mby,
                                                  cbp_chroma, qpc, mcu, mcv)
        u[cy0:cy0 + 8, cx0:cx0 + 8] = urec
        v[cy0:cy0 + 8, cx0:cx0 + 8] = vrec
        ctx.mvs[(mbx, mby)] = mv
        ctx.refs[(mbx, mby)] = 0

    def _decode_chroma_residual(self, br, ctx, mbx, mby, cbp_chroma, qpc,
                                predu, predv):
        b0y, b0x = mby * 2, mbx * 2
        recs = []
        if cbp_chroma == 0:
            ctx.nnz_cb[b0y:b0y + 2, b0x:b0x + 2] = 0
            ctx.nnz_cr[b0y:b0y + 2, b0x:b0x + 2] = 0
            return (np.clip(predu, 0, 255), np.clip(predv, 0, 255))
        dcs = []
        for _ in range(2):
            lv, _tc = decode_residual(br, -1, 4)
            dcs.append(np.array(lv, np.int32).reshape(2, 2))
        acs = [np.zeros((4, 4, 4), np.int32), np.zeros((4, 4, 4), np.int32)]
        if cbp_chroma == 2:
            for plane, nnzmap in ((0, ctx.nnz_cb), (1, ctx.nnz_cr)):
                for ridx in range(4):
                    by, bx = b0y + ridx // 2, b0x + ridx % 2
                    nc = ctx.nc_chroma(nnzmap, by, bx)
                    levels, tc = decode_residual(br, nc, 15)
                    acs[plane][ridx] = _unzigzag([0] + levels)
                    nnzmap[by, bx] = tc
        else:
            ctx.nnz_cb[b0y:b0y + 2, b0x:b0x + 2] = 0
            ctx.nnz_cr[b0y:b0y + 2, b0x:b0x + 2] = 0
        for plane, pred in ((0, predu), (1, predv)):
            f = T.hadamard2x2(np, dcs[plane][None])[0]
            dcq = T.dequant_chroma_dc(np, f, qpc)
            dq = T.dequant4x4(np, acs[plane], qpc)
            dq[:, 0, 0] = dcq.reshape(4)
            r = T.idct4x4(np, dq)
            recs.append(np.clip(pred + T.from_blocks4(np, r, 8, 8), 0, 255))
        return recs[0], recs[1]
