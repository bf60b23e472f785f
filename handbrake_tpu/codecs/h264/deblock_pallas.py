"""H.264 in-loop deblock as a Pallas TPU kernel (spec 8.7).

Same slope-2 wavefront schedule as deblock_tpu.py (the normative MB
order's dependency cone), but executed as ONE kernel with the diagonal
as the (sequential) Pallas grid axis:

  * the wavefront-member axis (skew row y) lives on VPU *lanes* — every
    edge filter is a handful of (samples, members) vector ops on
    perfectly-tiled (16, 128k) tiles, instead of XLA's per-op dispatch
    on (members, 16, 16) arrays with 16-wide lanes;
  * carried state (the two in-flight diagonal columns) persists in VMEM
    scratch across grid steps — zero HBM traffic beyond streaming each
    diagonal in and the finalized diagonal out (pallas_call pipelines
    both DMAs automatically);
  * per-step inputs arrive pre-skewed and pre-transposed to
    column-major member-lane layout by cheap XLA ops outside the kernel.

Performance note: this removes the XLA scan's ~250 per-step dispatch/
update overhead and is the right shape for a directly-attached TPU; on
the axon dev tunnel the post-first-D2H execution mode imposes a large
per-kernel penalty that makes it measure ~equal to the XLA scan there
(see bench.py's platform notes).

Bit-exact vs deblock.py / deblock_tpu.py (asserted in
tests/test_h264_primitives.py); this is the production device filter
(x264 frame-filter role, encx264.c b_deblocking_filter).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .deblock import ALPHA, BETA, TC0
from .deblock_tpu import _skew, compute_bs


def _round_up(x, m):
    return (x + m - 1) // m * m


def deblock_scal(qp: int, qpc: int) -> np.ndarray:
    """Host-side alpha/beta/tc0 lookup for concrete qp — the SMEM
    parameter the kernel wants (see kernel docstring for why)."""
    a, b, t = np.asarray(ALPHA), np.asarray(BETA), np.asarray(TC0)
    i, ic = min(max(int(qp), 0), 51), min(max(int(qpc), 0), 51)
    return np.concatenate([
        [a[i], b[i]], t[i], [a[ic], b[ic]], t[ic]]).astype(np.int32)


def _luma_edge_cols(w, e, bs, al, bl, t0, with_strong):
    """Filter one vertical/horizontal luma edge in per-sample tiles.

    w: list of (S, M) int32 tiles (samples x members); the edge's
    p3..q3 live at w[4e..4e+7].  bs: (S, M).  Mutates w in place."""
    p3, p2, p1, p0, q0, q1, q2, q3 = (w[4 * e + k] for k in range(8))
    filt = ((bs > 0) & (jnp.abs(p0 - q0) < al)
            & (jnp.abs(p1 - p0) < bl) & (jnp.abs(q1 - q0) < bl))
    ap = jnp.abs(p2 - p0)
    aq = jnp.abs(q2 - q0)
    tc0 = jnp.where(bs <= 1, t0[0], jnp.where(bs == 2, t0[1], t0[2]))
    tc = tc0 + (ap < bl) + (aq < bl)
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = jnp.clip(p0 + delta, 0, 255)
    nq0 = jnp.clip(q0 - delta, 0, 255)
    np1 = p1 + jnp.clip((p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1,
                        -tc0, tc0)
    nq1 = q1 + jnp.clip((q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1,
                        -tc0, tc0)
    if not with_strong:
        w[4 * e + 3] = jnp.where(filt, np0, p0)
        w[4 * e + 4] = jnp.where(filt, nq0, q0)
        w[4 * e + 2] = jnp.where(filt & (ap < bl), np1, p1)
        w[4 * e + 5] = jnp.where(filt & (aq < bl), nq1, q1)
        return
    normal = filt & (bs < 4)
    o0 = jnp.where(normal, np0, p0)
    o4 = jnp.where(normal, nq0, q0)
    o1 = jnp.where(normal & (ap < bl), np1, p1)
    o5 = jnp.where(normal & (aq < bl), nq1, q1)
    strong = filt & (bs == 4)
    small = jnp.abs(p0 - q0) < ((al >> 2) + 2)
    sp = strong & small & (ap < bl)
    sq = strong & small & (aq < bl)
    o0 = jnp.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                   jnp.where(strong, (2 * p1 + p0 + q1 + 2) >> 2, o0))
    o1 = jnp.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, o1)
    o2 = jnp.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    o4 = jnp.where(sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                   jnp.where(strong, (2 * q1 + q0 + p1 + 2) >> 2, o4))
    o5 = jnp.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, o5)
    o6 = jnp.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
    w[4 * e + 1] = o2
    w[4 * e + 2] = o1
    w[4 * e + 3] = o0
    w[4 * e + 4] = o4
    w[4 * e + 5] = o5
    w[4 * e + 6] = o6


def _chroma_edge_cols(w, off, bs, ac, bc, t0, with_strong):
    """w[off..off+3] = p1 p0 q0 q1 tiles (S, M)."""
    p1, p0, q0, q1 = (w[off + k] for k in range(4))
    filt = ((bs > 0) & (jnp.abs(p0 - q0) < ac)
            & (jnp.abs(p1 - p0) < bc) & (jnp.abs(q1 - q0) < bc))
    tc = jnp.where(bs <= 1, t0[0], jnp.where(bs == 2, t0[1], t0[2])) + 1
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    o0 = jnp.clip(p0 + delta, 0, 255)
    o1 = jnp.clip(q0 - delta, 0, 255)
    if with_strong:
        strong = filt & (bs == 4)
        normal = filt & (bs < 4)
        o0 = jnp.where(strong, (2 * p1 + p0 + q1 + 2) >> 2,
                       jnp.where(normal, o0, p0))
        o1 = jnp.where(strong, (2 * q1 + q0 + p1 + 2) >> 2,
                       jnp.where(normal, o1, q0))
        w[off + 1] = o0
        w[off + 2] = o1
    else:
        w[off + 1] = jnp.where(filt, o0, p0)
        w[off + 2] = jnp.where(filt, o1, q0)


def _rows_from_cols(cols, nrows):
    """cols: list of (R, M) tiles → list over r of (len(cols), M).

    One stack + one (outer, sublane) transpose instead of R*C
    single-row extract/concat ops — Mosaic compiles the former to a
    handful of vreg shuffles, the latter to hundreds."""
    xt = jnp.transpose(jnp.stack(cols, axis=0), (1, 0, 2))
    return [xt[r] for r in range(nrows)]


def _cols_from_rows(rows, ncols):
    """rows: list of (C, M) tiles → list over c of (len(rows), M)."""
    xt = jnp.transpose(jnp.stack(rows, axis=0), (1, 0, 2))
    return [xt[c] for c in range(ncols)]


def _shift_member_down(x):
    """member y ← y-1 (top-neighbour fetch); member 0 gets zeros."""
    return jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)


def _shift_member_up(x):
    """member y ← y+1 (halo write-back); last member gets zeros."""
    return jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)


def _plane_step(C, bv, bh, Lref, Tref, out_ref, sc, ne, last_m,
                al, bl, t0l, with_strong):
    """One diagonal step for one plane held in column-major tiles.

    C: (bs, bs, M) value (this diagonal's pixels, [col][row][member]);
    bv/bh: (ne, bs, M) expanded bS; Lref/Tref: VMEM scratch refs of the
    two in-flight columns; out_ref: output block ref (bs, bs, M) —
    receives the finalized column t-2.  sc = block size (16 luma / 8
    chroma), ne = edges (4 / 2), last_m: (1, M) bool mask of the last
    valid member row."""
    edge = _luma_edge_cols if sc == 16 else \
        functools.partial(_chroma_edge_cols)
    colsC = [C[c] for c in range(sc)]
    colsL = [Lref[c] for c in range(sc)]
    colsT = [Tref[c] for c in range(sc)]
    halo = 4 if sc == 16 else 2

    # ---- V phase: [left-halo | own] column tiles ----
    w = [colsL[sc - halo + k] for k in range(halo)] + colsC
    for e in range(ne):
        if sc == 16:
            _luma_edge_cols(w, e, bv[e], al, bl, t0l, with_strong)
        else:
            _chroma_edge_cols(w, 4 * e, bv[e], al, bl, t0l, with_strong)
    # L2: left column keeps cols < sc-halo+1; halo-written tail comes
    # from w[1..halo-1] (w[0] = p3 never modified)
    colsL2 = colsL[:sc - halo + 1] + [w[k] for k in range(1, halo)]

    # ---- H phase: row tiles [top-halo | own] ----
    own_cols = w[halo:]
    own_rows = _rows_from_cols(own_cols, sc)        # r ∈ [0, sc)
    t_rows = _rows_from_cols(colsT, sc)
    halo_rows = [_shift_member_down(t_rows[r])
                 for r in range(sc - halo, sc)]
    wh = halo_rows + own_rows
    for e in range(ne):
        if sc == 16:
            _luma_edge_cols(wh, e, bh[e], al, bl, t0l, with_strong)
        else:
            _chroma_edge_cols(wh, 4 * e, bh[e], al, bl, t0l, with_strong)

    # T2: finalized col t-2 — bottom halo rows rewritten from wh[1..halo)
    # shifted back up a member; the LAST member keeps its original rows
    for k in range(1, halo):
        back = _shift_member_up(wh[k])
        t_rows[sc - halo + k] = jnp.where(last_m, t_rows[sc - halo + k],
                                          back)
    t2_cols = _cols_from_rows(t_rows, sc)
    for c in range(sc):
        out_ref[c] = t2_cols[c]

    # carry: new T = L2; new L = C2 (own tiles post V+H)
    c2_cols = _cols_from_rows(wh[halo:], sc)
    for c in range(sc):
        Tref[c] = colsL2[c]
        Lref[c] = c2_cols[c]


def build_deblock_pallas(mb_w: int, mb_h: int, with_strong: bool = True,
                         interpret: bool = False, block_diags: int = 4):
    """Pallas-backed deblock with the same signature/semantics as
    deblock_tpu.build_deblock_fn.

    block_diags: diagonals processed per grid step — amortizes the
    per-step DMA/sequencing overhead over D sequential inner columns
    (the dependency chain is unchanged; the loop just moves inside the
    kernel where column state stays register/VMEM-resident)."""
    D = max(1, block_diags)
    sk = mb_w + 2 * (mb_h - 1)
    T = _round_up(sk + 2, D)
    M = _round_up(mb_h, 128)
    alpha_t = jnp.asarray(ALPHA)
    beta_t = jnp.asarray(BETA)
    tc0_t = jnp.asarray(TC0)

    def kernel(scal, Y, U, V, bvy, bhy, bvc, bhc,
               Oy, Ou, Ov, Ly, Ty, Lu, Tu, Lv, Tv):
        t = pl.program_id(0)
        # scal is an SMEM *parameter*: measured on the axon v5e, a
        # device-computed SMEM operand syncs through the host at the
        # custom-call boundary (~20 ms/frame), and VMEM (1,1)-broadcast
        # scalars are pathologically slow in-kernel — host-computed
        # SMEM scalars are the only fast configuration.
        al, bl = scal[0], scal[1]
        t0l = (scal[2], scal[3], scal[4])
        ac, bc = scal[5], scal[6]
        t0c = (scal[7], scal[8], scal[9])
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
        last_m = lanes == (mb_h - 1)

        @pl.when(t == 0)
        def _init():
            for r in (Ly, Ty):
                r[...] = jnp.zeros_like(r)
            for r in (Lu, Tu, Lv, Tv):
                r[...] = jnp.zeros_like(r)

        for d in range(D):
            _plane_step(Y[d], bvy[d], bhy[d], Ly, Ty, Oy.at[d], 16, 4,
                        last_m, al, bl, t0l, with_strong)
            _plane_step(U[d], bvc[d], bhc[d], Lu, Tu, Ou.at[d], 8, 2,
                        last_m, ac, bc, t0c, with_strong)
            _plane_step(V[d], bvc[d], bhc[d], Lv, Tv, Ov.at[d], 8, 2,
                        last_m, ac, bc, t0c, with_strong)

    def colmajor(a, bs):
        """(mb_h, sk, bs_r, bs_c) skew → (T, bs_c, bs_r, M)."""
        x = jnp.transpose(a, (1, 3, 2, 0))           # (sk, c, r, mb_h)
        return jnp.pad(x, ((0, T - sk), (0, 0), (0, 0), (0, M - mb_h)))

    def bs_lanes(b):
        """(mb_h, sk, ne, S) → (T, ne, S, M)."""
        x = jnp.transpose(b, (1, 2, 3, 0))
        return jnp.pad(x, ((0, T - sk), (0, 0), (0, 0), (0, M - mb_h)))

    in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),               # scal
            pl.BlockSpec((D, 16, 16, M), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 8, 8, M), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 8, 8, M), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 4, 16, M), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 4, 16, M), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 2, 8, M), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 2, 8, M), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
    ]
    out_specs = [
            pl.BlockSpec((D, 16, 16, M), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 8, 8, M), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 8, 8, M), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
    ]

    call = pl.pallas_call(
        kernel,
        grid=(T // D,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((T, 16, 16, M), jnp.int32),
            jax.ShapeDtypeStruct((T, 8, 8, M), jnp.int32),
            jax.ShapeDtypeStruct((T, 8, 8, M), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((16, 16, M), jnp.int32),
            pltpu.VMEM((16, 16, M), jnp.int32),
            pltpu.VMEM((8, 8, M), jnp.int32),
            pltpu.VMEM((8, 8, M), jnp.int32),
            pltpu.VMEM((8, 8, M), jnp.int32),
            pltpu.VMEM((8, 8, M), jnp.int32),
        ],
        interpret=interpret,
    )

    def deblock(ry, ru, rv, mv, nnz, mb_intra, t8, qp, qpc, scal=None):
        if scal is None:
            # traced-qp fallback (portable, but on the axon tunnel a
            # device-computed SMEM operand costs a host sync — callers
            # on TPU should pass scal=deblock_scal(qp, qpc))
            idx = jnp.clip(qp, 0, 51)
            idxc = jnp.clip(qpc, 0, 51)
            scal = jnp.concatenate([
                jnp.stack([alpha_t[idx], beta_t[idx]]), tc0_t[idx],
                jnp.stack([alpha_t[idxc], beta_t[idxc]]), tc0_t[idxc],
            ]).astype(jnp.int32)

        bs_v, bs_h = compute_bs(mb_w, mb_h, mv.astype(jnp.int32),
                                nnz, mb_intra, t8)
        bvy = bs_lanes(_skew(jnp.repeat(bs_v, 4, axis=3), mb_w, mb_h, sk))
        bhy = bs_lanes(_skew(jnp.repeat(bs_h, 4, axis=3), mb_w, mb_h, sk))
        bvc = bs_lanes(_skew(jnp.repeat(bs_v[:, :, (0, 2), :], 2, axis=3),
                             mb_w, mb_h, sk))
        bhc = bs_lanes(_skew(jnp.repeat(bs_h[:, :, (0, 2), :], 2, axis=3),
                             mb_w, mb_h, sk))

        def mbify(p, bs):
            return (p.astype(jnp.int32)
                    .reshape(mb_h, bs, mb_w, bs).transpose(0, 2, 1, 3))

        Y = colmajor(_skew(mbify(ry, 16), mb_w, mb_h, sk), 16)
        U = colmajor(_skew(mbify(ru, 8), mb_w, mb_h, sk), 8)
        V = colmajor(_skew(mbify(rv, 8), mb_w, mb_h, sk), 8)

        Oy, Ou, Ov = call(scal, Y, U, V, bvy, bhy, bvc, bhc)

        def unmbify(o, bs):
            # o[t, c, r, m]: finalized skew column s lives at o[s+2]
            blocks = jnp.stack(
                [o[2 * y + 2:2 * y + 2 + mb_w, :, :, y]
                 for y in range(mb_h)])                  # (mb_h, mb_w, c, r)
            return (blocks.transpose(0, 3, 1, 2)
                    .reshape(mb_h * bs, mb_w * bs).astype(jnp.uint8))

        return unmbify(Oy, 16), unmbify(Ou, 8), unmbify(Ov, 8)

    return deblock
