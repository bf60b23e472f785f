"""H.264 in-loop deblock on device (spec 8.7) — slope-2 wavefront scan.

The normative order (raster MBs; per MB vertical edges then horizontal)
has pixel-level dependencies on MB (x-1, y) and (x+1, y-1) — a slope-2
wavefront.  Mapping the MB grid into a *skewed* array A[y, x + 2y] makes
every anti-diagonal a static column slice, so one `lax.scan` step filters
a whole diagonal with three dynamic slices (columns t, t-1, t-2), fully
batched edge filters over the diagonal members, and three slice updates —
no gathers (XLA gather is ~12 ns/element on TPU; see encoder_tpu.py).

Boundary strengths are precomputed vectorised from the analyzer's
per-MB mv / per-4x4 nnz (all-inter frames: the device path's P frames;
intra-fallback frames take the host/native deblock path instead), then
skewed alongside the pixels.  Padding diagonal slots carry bS = 0, so
invalid members filter nothing and write back their own reads.

Bit-exact vs deblock.py's deblock_frame (tests/test_h264_primitives.py);
the role of the reference's in-encoder loop filter (x264's frame filter,
driven by encx264.c via b_deblocking_filter).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .deblock import ALPHA, BETA, TC0


def _luma_edge(win, bs, alpha, beta, tc0_3, axis, with_strong=True):
    """win: slab with 8 samples p3..p0,q0..q3 along `axis` (a contiguous
    slice of the working window — contiguous slab slices + same-axis
    restack are the only layouts Mosaic keeps relayout-free; both a
    swapaxes-based variant and a per-component list variant of this scan
    body ran 20-400x slower).  bs: bS broadcastable to one component;
    alpha/beta scalars; tc0_3: (3,) TC0 row.  Returns the filtered slab."""
    ix = ((lambda j: win[:, :, j]) if axis == 2
          else (lambda j: win[:, j, :]))
    p3, p2, p1, p0, q0, q1, q2, q3 = (ix(j) for j in range(8))
    filt = ((bs > 0) & (jnp.abs(p0 - q0) < alpha)
            & (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta))
    ap = jnp.abs(p2 - p0)
    aq = jnp.abs(q2 - q0)

    # bS<4 (normal): tc0 by select (no gather)
    tc0 = jnp.where(bs <= 1, tc0_3[0],
                    jnp.where(bs == 2, tc0_3[1], tc0_3[2]))
    tc = tc0 + (ap < beta) + (aq < beta)
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = jnp.clip(p0 + delta, 0, 255)
    nq0 = jnp.clip(q0 - delta, 0, 255)
    np1 = p1 + jnp.clip((p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1,
                        -tc0, tc0)
    nq1 = q1 + jnp.clip((q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1,
                        -tc0, tc0)
    if not with_strong:
        # all-inter frames (the analyzer chain): bS ≤ 2, skip the bS≥3
        # machinery — the scan body is kernel-launch-bound, ops are
        # wall-clock
        o0 = jnp.where(filt, np0, p0)
        o4 = jnp.where(filt, nq0, q0)
        o1 = jnp.where(filt & (ap < beta), np1, p1)
        o5 = jnp.where(filt & (aq < beta), nq1, q1)
        return jnp.stack([p3, p2, o1, o0, o4, o5, q2, q3], axis=axis)
    normal = filt & (bs < 4)
    o0 = jnp.where(normal, np0, p0)
    o4 = jnp.where(normal, nq0, q0)
    o1 = jnp.where(normal & (ap < beta), np1, p1)
    o5 = jnp.where(normal & (aq < beta), nq1, q1)

    # bS==4 (strong)
    strong = filt & (bs == 4)
    small = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp = strong & small & (ap < beta)
    sq = strong & small & (aq < beta)
    o0 = jnp.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                   jnp.where(strong, (2 * p1 + p0 + q1 + 2) >> 2, o0))
    o1 = jnp.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, o1)
    o2 = jnp.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    o4 = jnp.where(sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                   jnp.where(strong, (2 * q1 + q0 + p1 + 2) >> 2, o4))
    o5 = jnp.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, o5)
    o6 = jnp.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
    return jnp.stack([p3, o2, o1, o0, o4, o5, o6, q3], axis=axis)


def _chroma_edge(win, bs, alpha, beta, tc0_3, axis, with_strong=True):
    """win: slab with (p1, p0, q0, q1) along `axis`; bs broadcastable."""
    ix = ((lambda j: win[:, :, j]) if axis == 2
          else (lambda j: win[:, j, :]))
    p1, p0, q0, q1 = (ix(j) for j in range(4))
    filt = ((bs > 0) & (jnp.abs(p0 - q0) < alpha)
            & (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta))
    tc = jnp.where(bs <= 1, tc0_3[0],
                   jnp.where(bs == 2, tc0_3[1], tc0_3[2])) + 1
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    if not with_strong:
        o0 = jnp.where(filt, jnp.clip(p0 + delta, 0, 255), p0)
        o1 = jnp.where(filt, jnp.clip(q0 - delta, 0, 255), q0)
        return jnp.stack([p1, o0, o1, q1], axis=axis)
    normal = filt & (bs < 4)
    o0 = jnp.where(normal, jnp.clip(p0 + delta, 0, 255), p0)
    o1 = jnp.where(normal, jnp.clip(q0 - delta, 0, 255), q0)
    strong = filt & (bs == 4)
    o0 = jnp.where(strong, (2 * p1 + p0 + q1 + 2) >> 2, o0)
    o1 = jnp.where(strong, (2 * q1 + q0 + p1 + 2) >> 2, o1)
    return jnp.stack([p1, o0, o1, q1], axis=axis)


def compute_bs(mb_w, mb_h, mv, nnz, mb_intra, t8):
    """Vectorised boundary strengths (spec 8.7.2.1, single ref).

    mv: (n_mb, 2) int32 qpel (one 16x16 partition per MB); nnz: (n_mb, 16)
    per-4x4 coeff counts (raster blocks; uncoded quads already zeroed);
    mb_intra: (n_mb,) bool; t8: (n_mb,) bool (8x8 transform MBs).
    Returns (bs_v, bs_h) each (mb_h, mb_w, 4 edges, 4 groups) int32.
    """
    nnzg = (nnz.reshape(mb_h, mb_w, 4, 4) != 0)
    if t8 is not None:
        # 8x8-transform MBs: a 4x4 cell counts as coded if any cell of
        # the covering 8x8 block is (hbdec264.cpp block_bs nzl)
        t8m = t8.reshape(mb_h, mb_w, 1, 1)
        q = nnzg.reshape(mb_h, mb_w, 2, 2, 2, 2).any(axis=(3, 5))
        fold = jnp.repeat(jnp.repeat(q, 2, axis=2), 2, axis=3)
        nnzg = jnp.where(t8m, fold, nnzg)
    G = nnzg.transpose(0, 2, 1, 3).reshape(mb_h * 4, mb_w * 4)
    intra = mb_intra.reshape(mb_h, mb_w)
    mvx = mv[:, 0].reshape(mb_h, mb_w).astype(jnp.int32)
    mvy = mv[:, 1].reshape(mb_h, mb_w).astype(jnp.int32)
    t8g = (t8.reshape(mb_h, mb_w) if t8 is not None
           else jnp.zeros((mb_h, mb_w), bool))

    def mb_edge_bs(i_cur, i_nb, nz_p, nz_q, dmx, dmy):
        b_intra = (i_cur | i_nb)
        b_nnz = nz_p | nz_q
        b_mv = (jnp.abs(dmx) >= 4) | (jnp.abs(dmy) >= 4)
        return jnp.where(b_intra, 4,
                         jnp.where(b_nnz, 2, jnp.where(b_mv, 1, 0)))

    # --- vertical edges: bs_v[y, x, e, k], k = row group ---
    zc = jnp.zeros((mb_h, 1), bool)
    zi = jnp.zeros((mb_h, 1), jnp.int32)
    i_left = jnp.concatenate([zc, intra[:, :-1]], axis=1)
    dmx = mvx - jnp.concatenate([zi, mvx[:, :-1]], axis=1)
    dmy = mvy - jnp.concatenate([zi, mvy[:, :-1]], axis=1)
    Gk = G.reshape(mb_h, 4, mb_w, 4)            # [y, k, x, c]
    e_list = []
    for e in range(4):
        if e == 0:
            nz_p = jnp.concatenate(
                [jnp.zeros((mb_h, 4, 1), bool), Gk[:, :, :-1, 3]],
                axis=2)                         # [y, k, x]
        else:
            nz_p = Gk[:, :, :, e - 1]           # [y, k, x]
        nz_q = Gk[:, :, :, e]                   # [y, k, x]
        if e == 0:
            bs = mb_edge_bs(intra[:, None, :], i_left[:, None, :],
                            nz_p, nz_q, dmx[:, None, :], dmy[:, None, :])
            bs = bs * (jnp.arange(mb_w)[None, None, :] > 0)
        else:
            bs = jnp.where(intra[:, None, :], 3,
                           jnp.where(nz_p | nz_q, 2, 0))
            if e & 1:
                bs = bs * (~t8g)[:, None, :]
        e_list.append(bs.transpose(0, 2, 1))    # (mb_h, mb_w, 4 groups)
    bs_v = jnp.stack(e_list, axis=2)            # (mb_h, mb_w, 4e, 4k)

    # --- horizontal edges: bs_h[y, x, e, k], k = column group ---
    zr = jnp.zeros((1, mb_w), bool)
    zri = jnp.zeros((1, mb_w), jnp.int32)
    i_top = jnp.concatenate([zr, intra[:-1, :]], axis=0)
    dmx = mvx - jnp.concatenate([zri, mvx[:-1, :]], axis=0)
    dmy = mvy - jnp.concatenate([zri, mvy[:-1, :]], axis=0)
    Gr = G.reshape(mb_h, 4, mb_w, 4)            # [y, r, x, k]
    e_list = []
    for e in range(4):
        if e == 0:
            nz_p = jnp.concatenate(
                [jnp.zeros((1, mb_w, 4), bool), Gr[:-1, 3, :, :]],
                axis=0)                         # [y, x, k]
        else:
            nz_p = Gr[:, e - 1, :, :]
        nz_q = Gr[:, e, :, :]
        if e == 0:
            bs = mb_edge_bs(intra[:, :, None], i_top[:, :, None],
                            nz_p, nz_q, dmx[:, :, None], dmy[:, :, None])
            bs = bs * (jnp.arange(mb_h)[:, None, None] > 0)
        else:
            bs = jnp.where(intra[:, :, None], 3,
                           jnp.where(nz_p | nz_q, 2, 0))
            if e & 1:
                bs = bs * (~t8g)[:, :, None]
        e_list.append(bs)
    bs_h = jnp.stack(e_list, axis=2)
    return bs_v.astype(jnp.int32), bs_h.astype(jnp.int32)


def _skew(blocks, mb_w, mb_h, sk):
    """(mb_h, mb_w, ...) → (mb_h, sk, ...) with [y, x+2y] = [y, x]."""
    rows = []
    for y in range(mb_h):
        pad = [(2 * y, sk - mb_w - 2 * y)] + [(0, 0)] * (blocks.ndim - 2)
        rows.append(jnp.pad(blocks[y], pad))
    return jnp.stack(rows)


def _deskew(sk_arr, mb_w, mb_h):
    rows = [sk_arr[y, 2 * y:2 * y + mb_w] for y in range(mb_h)]
    return jnp.stack(rows)


def build_deblock_fn(mb_w: int, mb_h: int, with_strong: bool = True):
    """Returns deblock(ry, ru, rv, mv, nnz, mb_intra, t8, qp, qpc) →
    (ry, ru, rv) filtered uint8 planes.  All-frame exact filter; qp/qpc
    traced (rate control never recompiles).

    with_strong=False builds the bS≤2 fast variant (all-inter frames —
    the analyzer chain; intra frames must use the host/native filter).

    Scan structure: step t reads skewed diagonal column t from the scan
    *inputs* (xs), carries only the two in-flight columns (t-1, t-2) and
    emits the finalized column t-2 through the scan's stacked outputs.
    The earlier formulation carried the full skewed planes and rewrote
    them with dynamic_update_slice every step — ~250 full-frame copies
    per frame, ~100 ms on a v5e; this form moves ~0.5 MB per step and
    runs the same math bit-exactly."""
    sk = mb_w + 2 * (mb_h - 1)
    n_steps = sk + 2                   # 2 pad steps flush cols sk-2, sk-1
    alpha_t = jnp.asarray(ALPHA)
    beta_t = jnp.asarray(BETA)
    tc0_t = jnp.asarray(TC0)

    def deblock(ry, ru, rv, mv, nnz, mb_intra, t8, qp, qpc):
        idx = jnp.clip(qp, 0, 51)
        idxc = jnp.clip(qpc, 0, 51)
        al, bl, t0l = alpha_t[idx], beta_t[idx], tc0_t[idx]
        ac, bc, t0c = alpha_t[idxc], beta_t[idxc], tc0_t[idxc]

        bs_v, bs_h = compute_bs(mb_w, mb_h, mv.astype(jnp.int32),
                                nnz, mb_intra, t8)
        # pre-expand bS to sample granularity OUTSIDE the scan; skew axis
        # moves to the front so the scan slices per-step inputs for free
        def xsify(a):
            sw = jnp.swapaxes(a, 0, 1)           # (sk, mb_h, ...)
            return jnp.concatenate(
                [sw, jnp.zeros((2,) + sw.shape[1:], sw.dtype)], axis=0)

        sb_v = xsify(_skew(jnp.repeat(bs_v, 4, axis=3), mb_w, mb_h, sk))
        sb_h = xsify(_skew(jnp.repeat(bs_h, 4, axis=3), mb_w, mb_h, sk))
        cv8 = _skew(jnp.repeat(bs_v[:, :, (0, 2), :], 2, axis=3),
                    mb_w, mb_h, sk)              # (mb_h, sk, 2, 8)
        ch8 = _skew(jnp.repeat(bs_h[:, :, (0, 2), :], 2, axis=3),
                    mb_w, mb_h, sk)
        sb_cv2 = xsify(jnp.concatenate([cv8, cv8], axis=0))  # u|v
        sb_ch2 = xsify(jnp.concatenate([ch8, ch8], axis=0))

        def mbify(p, bs):
            return (p.astype(jnp.int32)
                    .reshape(mb_h, bs, mb_w, bs).transpose(0, 2, 1, 3))

        Xy = xsify(_skew(mbify(ry, 16), mb_w, mb_h, sk))
        Xu = xsify(_skew(mbify(ru, 8), mb_w, mb_h, sk))
        Xv = xsify(_skew(mbify(rv, 8), mb_w, mb_h, sk))

        def step(carry, xs_t):
            # carry: column t-1 (L*) and t-2 (T*) working states; xs_t:
            # this diagonal's pixels + expanded bS.  Slab scheme: edge
            # filters slice contiguous 8-sample slabs and restack along
            # the same axis — the only Mosaic-relayout-free pattern (see
            # _luma_edge docstring).
            Ly, Ty, Lu, Tu, Lv, Tv = carry
            C, Cu, Cv, bv, bh, b2v, b2h = xs_t

            # ---- luma V phase: columns [left-halo 4 | own 16] ----
            L, T = Ly, Ty
            W = jnp.concatenate([L[:, :, 12:16], C], axis=2)  # (mb_h,16,20)
            for e in range(4):
                W = W.at[:, :, 4 * e:4 * e + 8].set(
                    _luma_edge(W[:, :, 4 * e:4 * e + 8], bv[:, e],
                               al, bl, t0l, 2, with_strong))
            L2 = jnp.concatenate([L[:, :, :13], W[:, :, 1:4]], axis=2)

            # ---- luma H phase: rows [top-halo 4 | own 16] ----
            Tm = jnp.concatenate([jnp.zeros_like(T[:1]), T[:-1]], axis=0)
            Wh = jnp.concatenate([Tm[:, 12:16, :], W[:, :, 4:20]], axis=1)
            for e in range(4):
                Wh = Wh.at[:, 4 * e:4 * e + 8, :].set(
                    _luma_edge(Wh[:, 4 * e:4 * e + 8, :], bh[:, e],
                               al, bl, t0l, 1, with_strong))
            T2 = jnp.concatenate(
                [T[:, :13, :],
                 jnp.concatenate([Wh[1:mb_h, 1:4, :],
                                  T[mb_h - 1:, 13:16, :]], axis=0)],
                axis=1)
            C2 = Wh[:, 4:20, :]

            # ---- chroma (u and v batched on axis 0) ----
            Cc = jnp.concatenate([Cu, Cv], axis=0)
            Lc = jnp.concatenate([Lu, Lv], axis=0)
            Tc = jnp.concatenate([Tu, Tv], axis=0)
            # columns [p1 p0 (left 6,7) | own 8] — both edges are
            # contiguous 4-col slabs at offsets 0 and 4
            Wc = jnp.concatenate([Lc[:, :, 6:8], Cc], axis=2)  # (n,8,10)
            for j, off in enumerate((0, 4)):
                Wc = Wc.at[:, :, off:off + 4].set(
                    _chroma_edge(Wc[:, :, off:off + 4], b2v[:, j],
                                 ac, bc, t0c, 2, with_strong))
            Lc2 = jnp.concatenate([Lc[:, :, :7], Wc[:, :, 1:2]], axis=2)
            Tcm = jnp.concatenate([
                jnp.zeros_like(Tc[:1]), Tc[:mb_h - 1],
                jnp.zeros_like(Tc[:1]), Tc[mb_h:-1]], axis=0)
            Wch = jnp.concatenate([Tcm[:, 6:8, :], Wc[:, :, 2:10]],
                                  axis=1)                      # (n,10,8)
            for j, off in enumerate((0, 4)):
                Wch = Wch.at[:, off:off + 4, :].set(
                    _chroma_edge(Wch[:, off:off + 4, :], b2h[:, j],
                                 ac, bc, t0c, 1, with_strong))
            hrow = Wch[:, 1:2, :]               # modified top-halo row 7
            Tu2 = jnp.concatenate(
                [Tc[:mb_h, :7, :],
                 jnp.concatenate([hrow[1:mb_h], Tc[mb_h - 1:mb_h, 7:8, :]],
                                 axis=0)], axis=1)
            Tv2 = jnp.concatenate(
                [Tc[mb_h:, :7, :],
                 jnp.concatenate([hrow[mb_h + 1:], Tc[-1:, 7:8, :]],
                                 axis=0)], axis=1)
            Cc2 = Wch[:, 2:10, :]
            new_carry = (C2, L2, Cc2[:mb_h], Lc2[:mb_h],
                         Cc2[mb_h:], Lc2[mb_h:])
            return new_carry, (T2, Tu2, Tv2)

        z = jnp.zeros((mb_h, 16, 16), jnp.int32)
        zc = jnp.zeros((mb_h, 8, 8), jnp.int32)
        carry0 = (z, z, zc, zc, zc, zc)
        _, (Oy, Ou, Ov) = jax.lax.scan(
            step, carry0, (Xy, Xu, Xv, sb_v, sb_h, sb_cv2, sb_ch2))

        def unmbify(o, bs):
            # o: (sk+2, mb_h, bs, bs); finalized col t-2 was emitted at
            # step t, so skew column s lives at o[s+2]
            blocks = jnp.stack(
                [o[2 * y + 2:2 * y + 2 + mb_w, y] for y in range(mb_h)])
            return (blocks.transpose(0, 2, 1, 3)
                    .reshape(mb_h * bs, mb_w * bs).astype(jnp.uint8))

        return unmbify(Oy, 16), unmbify(Ou, 8), unmbify(Ov, 8)

    return deblock
