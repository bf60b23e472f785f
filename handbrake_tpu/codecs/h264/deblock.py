"""H.264 in-loop deblocking filter (spec 8.7) — host/NumPy implementation.

Used by both the encoder (host backend: the filtered frame becomes the
prediction reference) and the decoder, so reconstruction stays bit-exact on
both sides (the reference relies on x264/libavcodec agreeing the same way;
encx264.c signals deblock via b_deblocking_filter).

Processing order is normative: macroblocks in raster order; within each MB
the four vertical edges left→right, then the four horizontal edges
top→bottom (the cross-MB read/write overlaps make this strictly sequential
— a slope-2 wavefront is the parallel schedule, planned for the device
path).

ALPHA/BETA/TC0 are spec Tables 8-16/8-17 (verified against libavcodec's
.rodata, which this build's FFmpeg-conformance tests exercise end-to-end).
"""
from __future__ import annotations

import numpy as np

ALPHA = np.array(
    [0] * 16
    + [4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28, 32, 36,
       40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182, 203,
       226, 255, 255], np.int32)

BETA = np.array(
    [0] * 16
    + [2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11,
       11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16, 17, 17, 18, 18], np.int32)

# TC0[indexA] = (tc0 for bS=1, bS=2, bS=3); first nonzero row at indexA=17
TC0 = np.array(
    [(0, 0, 0)] * 17
    + [(0, 0, 1), (0, 0, 1), (0, 0, 1), (0, 0, 1), (0, 1, 1), (0, 1, 1),
       (1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 2), (1, 1, 2),
       (1, 1, 2), (1, 1, 2), (1, 2, 3), (1, 2, 3), (2, 2, 3), (2, 2, 4),
       (2, 3, 4), (2, 3, 4), (3, 3, 5), (3, 4, 6), (3, 4, 6), (4, 5, 7),
       (4, 5, 8), (4, 6, 9), (5, 7, 10), (6, 8, 11), (6, 8, 13),
       (7, 10, 14), (8, 11, 16), (9, 12, 18), (10, 13, 20), (11, 15, 23),
       (13, 17, 25)], np.int32)


def _clip1(x):
    return np.clip(x, 0, 255)


def _filter_luma_edge(win, bs4, qp):
    """Filter one luma edge. win: (16, 8) int32 — columns p3..p0,q0..q3
    perpendicular to the edge; bs4: (4,) bS per 4-sample group.
    Returns the filtered window (copy)."""
    idx = min(max(qp, 0), 51)
    alpha = int(ALPHA[idx])
    beta = int(BETA[idx])
    if alpha == 0:
        return win
    bs = np.repeat(bs4, 4)                                   # (16,)
    p3, p2, p1, p0 = win[:, 0], win[:, 1], win[:, 2], win[:, 3]
    q0, q1, q2, q3 = win[:, 4], win[:, 5], win[:, 6], win[:, 7]
    filt = ((bs > 0) & (np.abs(p0 - q0) < alpha)
            & (np.abs(p1 - p0) < beta) & (np.abs(q1 - q0) < beta))
    out = win.copy()
    if not filt.any():
        return out
    ap = np.abs(p2 - p0)
    aq = np.abs(q2 - q0)

    # --- bS < 4 (normal) ---
    tc0 = TC0[idx][np.clip(bs, 1, 3) - 1]
    tc = tc0 + (ap < beta) + (aq < beta)
    delta = np.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = _clip1(p0 + delta)
    nq0 = _clip1(q0 - delta)
    np1 = p1 + np.clip((p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1,
                       -tc0, tc0)
    nq1 = q1 + np.clip((q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1,
                       -tc0, tc0)
    normal = filt & (bs < 4)
    out[:, 3] = np.where(normal, np0, out[:, 3])
    out[:, 4] = np.where(normal, nq0, out[:, 4])
    out[:, 2] = np.where(normal & (ap < beta), np1, out[:, 2])
    out[:, 5] = np.where(normal & (aq < beta), nq1, out[:, 5])

    # --- bS == 4 (strong) ---
    strong = filt & (bs == 4)
    if strong.any():
        small = np.abs(p0 - q0) < ((alpha >> 2) + 2)
        sp = strong & small & (ap < beta)
        sq = strong & small & (aq < beta)
        out[:, 3] = np.where(
            sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
            np.where(strong, (2 * p1 + p0 + q1 + 2) >> 2, out[:, 3]))
        out[:, 2] = np.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, out[:, 2])
        out[:, 1] = np.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3,
                             out[:, 1])
        out[:, 4] = np.where(
            sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
            np.where(strong, (2 * q1 + q0 + p1 + 2) >> 2, out[:, 4]))
        out[:, 5] = np.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, out[:, 5])
        out[:, 6] = np.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3,
                             out[:, 6])
    return out


def _filter_chroma_edge(win, bs_rep, qpc):
    """Filter one chroma edge. win: (n, 4) — p1,p0,q0,q1; bs_rep: (n,) bS."""
    idx = min(max(qpc, 0), 51)
    alpha = int(ALPHA[idx])
    beta = int(BETA[idx])
    if alpha == 0:
        return win
    p1, p0, q0, q1 = win[:, 0], win[:, 1], win[:, 2], win[:, 3]
    filt = ((bs_rep > 0) & (np.abs(p0 - q0) < alpha)
            & (np.abs(p1 - p0) < beta) & (np.abs(q1 - q0) < beta))
    out = win.copy()
    if not filt.any():
        return out
    # normal (bS<4): tc = tc0 + 1, p0/q0 only
    tc = TC0[idx][np.clip(bs_rep, 1, 3) - 1] + 1
    delta = np.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    normal = filt & (bs_rep < 4)
    out[:, 1] = np.where(normal, _clip1(p0 + delta), out[:, 1])
    out[:, 2] = np.where(normal, _clip1(q0 - delta), out[:, 2])
    strong = filt & (bs_rep == 4)
    # mirror swaps the whole p/q tuple: q0' uses p1 (not p0)
    out[:, 1] = np.where(strong, (2 * p1 + p0 + q1 + 2) >> 2, out[:, 1])
    out[:, 2] = np.where(strong, (2 * q1 + q0 + p1 + 2) >> 2, out[:, 2])
    return out


def _edge_bs(intra_cur, intra_nb, mb_edge, nnz_a, nnz_b, mv_a, mv_b):
    """bS for one 4-sample group of an edge (spec 8.7.2.1, progressive,
    single ref picture). nnz/mv are the blocks on either side (a=left/top
    'p' side, b='q' side)."""
    if intra_cur or intra_nb:
        return 4 if mb_edge else 3
    if nnz_a or nnz_b:
        return 2
    if (abs(mv_a[0] - mv_b[0]) >= 4 or abs(mv_a[1] - mv_b[1]) >= 4):
        return 1
    return 0


def deblock_frame(y, u, v, qp, qpc, mb_intra, mvs, nnz_l,
                  mb_t8x8=None):
    """In-place deblock of one frame.

    y/u/v: int32 planes (MB-aligned). qp/qpc: slice QPs. mb_intra:
    (mb_h, mb_w) bool. mvs: (mb_h, mb_w, 2) int32 (quarter-pel, valid where
    not intra). nnz_l: (mb_h*4, mb_w*4) per-4x4 luma coeff counts.
    """
    mb_h, mb_w = mb_intra.shape
    nnz = nnz_l
    if mb_t8x8 is not None and mb_t8x8.any():
        # 8x8-transform MBs: a 4x4 cell counts as coded if ANY cell of the
        # covering 8x8 block is (spec 8.7.2.1 via hbdec264.cpp block_bs);
        # fold that into an effective nnz grid so _edge_bs stays uniform
        nnz = nnz_l.copy()
        for mby in range(mb_h):
            for mbx in range(mb_w):
                if not mb_t8x8[mby, mbx]:
                    continue
                for qy in (0, 2):
                    for qx in (0, 2):
                        blk = nnz_l[mby * 4 + qy:mby * 4 + qy + 2,
                                    mbx * 4 + qx:mbx * 4 + qx + 2]
                        nnz[mby * 4 + qy:mby * 4 + qy + 2,
                            mbx * 4 + qx:mbx * 4 + qx + 2] =                             1 if blk.any() else 0
    for mby in range(mb_h):
        for mbx in range(mb_w):
            x0, y0 = mbx * 16, mby * 16
            cur_i = bool(mb_intra[mby, mbx])
            mv_c = mvs[mby, mbx]

            # ---- vertical edges (filter across columns) ----
            cur_t8 = bool(mb_t8x8[mby, mbx]) if mb_t8x8 is not None \
                else False
            for e in range(4):
                ex = x0 + 4 * e
                if ex == 0:
                    continue
                if (e & 1) and cur_t8:
                    continue          # no 4x4 luma edge inside 8x8 blocks
                mb_edge = (e == 0)
                if mb_edge:
                    nb_i = bool(mb_intra[mby, mbx - 1])
                    mv_n = mvs[mby, mbx - 1]
                else:
                    nb_i = cur_i
                    mv_n = mv_c
                bs4 = np.array([
                    _edge_bs(cur_i, nb_i, mb_edge,
                             nnz[mby * 4 + k, (ex // 4) - 1],
                             nnz[mby * 4 + k, ex // 4],
                             mv_n, mv_c)
                    for k in range(4)], np.int32)
                if bs4.any():
                    win = y[y0:y0 + 16, ex - 4:ex + 4]
                    y[y0:y0 + 16, ex - 4:ex + 4] = _filter_luma_edge(
                        win, bs4, qp)
                if e in (0, 2):  # chroma edges at x0, x0+8 → cx0, cx0+4
                    cx = ex // 2
                    bs_rep = np.repeat(bs4, 2)
                    cwin = u[mby * 8:mby * 8 + 8, cx - 2:cx + 2]
                    u[mby * 8:mby * 8 + 8, cx - 2:cx + 2] = \
                        _filter_chroma_edge(cwin, bs_rep, qpc)
                    cwin = v[mby * 8:mby * 8 + 8, cx - 2:cx + 2]
                    v[mby * 8:mby * 8 + 8, cx - 2:cx + 2] = \
                        _filter_chroma_edge(cwin, bs_rep, qpc)

            # ---- horizontal edges (filter across rows) ----
            for e in range(4):
                ey = y0 + 4 * e
                if ey == 0:
                    continue
                if (e & 1) and cur_t8:
                    continue
                mb_edge = (e == 0)
                if mb_edge:
                    nb_i = bool(mb_intra[mby - 1, mbx])
                    mv_n = mvs[mby - 1, mbx]
                else:
                    nb_i = cur_i
                    mv_n = mv_c
                bs4 = np.array([
                    _edge_bs(cur_i, nb_i, mb_edge,
                             nnz[(ey // 4) - 1, mbx * 4 + k],
                             nnz[ey // 4, mbx * 4 + k],
                             mv_n, mv_c)
                    for k in range(4)], np.int32)
                if bs4.any():
                    win = y[ey - 4:ey + 4, x0:x0 + 16].T
                    y[ey - 4:ey + 4, x0:x0 + 16] = _filter_luma_edge(
                        np.ascontiguousarray(win), bs4, qp).T
                if e in (0, 2):
                    cy = ey // 2
                    bs_rep = np.repeat(bs4, 2)
                    cwin = u[cy - 2:cy + 2, mbx * 8:mbx * 8 + 8].T
                    u[cy - 2:cy + 2, mbx * 8:mbx * 8 + 8] = \
                        _filter_chroma_edge(np.ascontiguousarray(cwin),
                                            bs_rep, qpc).T
                    cwin = v[cy - 2:cy + 2, mbx * 8:mbx * 8 + 8].T
                    v[cy - 2:cy + 2, mbx * 8:mbx * 8 + 8] = \
                        _filter_chroma_edge(np.ascontiguousarray(cwin),
                                            bs_rep, qpc).T
