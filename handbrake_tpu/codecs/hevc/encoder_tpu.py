"""TPU device path for HEVC P-frame CTU motion analysis.

Same architecture as the H.264 analyzer (codecs/h264/encoder_tpu.py),
scaled to CTU 32 and the HEVC 8-tap interpolation (8.5.4.2.2.1):

  * coarse ME on 4x-decimated planes with static shifts (no gathers —
    XLA gather is ~12 ns/element on TPU),
  * per-CTU reference windows extracted by one-hot selection matmuls on
    the MXU (bf16 one-hots are exact for 0..255 pixels),
  * full-pel refine +-3 and quarter-pel refine over 25 candidates with
    the exact separable 8-tap arithmetic of predict.mc_luma (so device
    SADs equal host SADs and the chosen mv reconstructs identically).

The host CABAC walker (encoder.py) consumes {"mv", "sad"} and recomputes
prediction/transform per CTU — entropy coding is sequential by design
(SURVEY.md §7 "Hard parts #1"); this kernel removes the dominant cost
(motion search) from the host loop.

Replaces the x265 motion-estimation stage of the reference's encx265.c
work object (SURVEY.md §2.5 — x265 replaced wholesale).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .tables import LUMA_FILTER

PAD_A = 32        # analyzer ref padding per side
LOWRES_R = 5      # coarse radius on 4x-decimated planes (= +-20 px)
REFINE_R = 3      # full-pel refine radius
WIN = 48          # CTU window: 32 + 2*8 margin (refine 3 + 8-tap 4 <= 8)
AWIN = 40         # aligned subpel window: 32 + 2*4
MV_CLAMP = 21     # coarse full-pel clamp; 21 + 3 refine <= 24 window reach

_LF = LUMA_FILTER.astype(np.int32)


def _lanes(n, m=128):
    return ((n + m - 1) // m) * m


def _onehot_select(sub, roff, coff, out_h, out_w, precise=False):
    """sub: (b, n, H, W); roff/coff: (b, n) dynamic origins. Returns
    (b, n, out_h, out_w) = sub[roff:roff+out_h, coff:coff+out_w] per
    (b, n) via R @ sub @ C on the MXU.  precise=True keeps the pixel
    operand in f32 (bf16 is exact only for 8-bit samples; Main 10 pixels
    need the wider mantissa)."""
    b, n, Hs, Ws = sub.shape
    pdt = jnp.float32 if precise else jnp.bfloat16
    R = (roff[..., None, None] + jnp.arange(out_h)[:, None]
         == jnp.arange(Hs)[None, None, None, :]).astype(pdt)
    C = (coff[..., None, None] + jnp.arange(out_w)[None, :]
         == jnp.arange(Ws)[None, None, :, None]).astype(pdt)
    t = jnp.einsum("bnrh,bnhw->bnrw", R, sub.astype(pdt),
                   preferred_element_type=jnp.float32)
    out = jnp.einsum("bnrw,bnwc->bnrc", t.astype(pdt), C,
                     preferred_element_type=jnp.float32)
    return out.astype(jnp.int32)


def _subpel_grids(A, maxval=255):
    """A: (n, 40, 40) int32, A[:, 4, 4] = block origin at best full-pel.

    Returns dict (fx, fy) -> (n, 33, 33) grids where element [r, c] is the
    interpolated sample at block-relative position (c-1 + fx/4, r-1 + fy/4),
    exact mc_luma arithmetic (raw h-filter at scale 64; v-filter + 2048
    >> 12 when fy > 0, else + 32 >> 6)."""
    tmp = {}
    for fx in range(4):
        if fx == 0:
            tmp[0] = A[:, :, 3:36] << 6
        else:
            f = _LF[fx]
            tmp[fx] = sum(int(f[k]) * A[:, :, k:k + 33] for k in range(8))
    grids = {}
    for fx in range(4):
        for fy in range(4):
            if fy == 0:
                g = (tmp[fx][:, 3:36, :] + 32) >> 6
            else:
                f = _LF[fy]
                acc = sum(int(f[k]) * tmp[fx][:, k:k + 33, :]
                          for k in range(8))
                g = (acc + (1 << 11)) >> 12
            grids[(fx, fy)] = jnp.clip(g, 0, maxval)
    return grids


def build_ctu_analyzer_fn(cw: int, ch: int, qp: int, maxval: int = 255):
    """Un-jitted analyze(src_y, src_u, src_v, ref_y, ref_u, ref_v) ->
    {"mv": (n_ctu, 2) quarter-pel int32, "sad": (n_ctu,)}.  qp reserved
    for a future device transform/quant stage (H.264 parity).
    maxval > 255 (Main 10) widens the one-hot fetch to f32."""
    del qp
    precise = maxval > 255
    H, W = ch * 32, cw * 32
    n = cw * ch
    r = REFINE_R
    side = 2 * r + 1

    def analyze(src_y, src_u, src_v, ref_y, ref_u, ref_v):
        del src_u, src_v, ref_u, ref_v   # chroma MC recomputed on host
        src_y = src_y.astype(jnp.int32)
        src_ctu = (src_y.reshape(ch, 32, cw, 32)
                   .transpose(0, 2, 1, 3).reshape(n, 32, 32))

        # --- coarse ME on 4x-decimated planes ---
        s4 = src_y.reshape(H // 4, 4, W // 4, 4).sum((1, 3)) >> 4
        r4 = ref_y.astype(jnp.int32).reshape(H // 4, 4, W // 4, 4
                                             ).sum((1, 3)) >> 4
        r4p = jnp.pad(r4, LOWRES_R, mode="edge")
        costs = []
        for dy in range(-LOWRES_R, LOWRES_R + 1):
            for dx in range(-LOWRES_R, LOWRES_R + 1):
                sh = r4p[LOWRES_R + dy:LOWRES_R + dy + H // 4,
                         LOWRES_R + dx:LOWRES_R + dx + W // 4]
                blk = jnp.abs(s4 - sh).reshape(ch, 8, cw, 8).sum((1, 3))
                costs.append(blk + 2 * (abs(dx) + abs(dy)))
        best = jnp.argmin(jnp.stack(costs), axis=0).reshape(-1)
        nsd = 2 * LOWRES_R + 1
        mv_cy = jnp.clip((best // nsd - LOWRES_R) * 4,
                         -MV_CLAMP, MV_CLAMP).astype(jnp.int32)
        mv_cx = jnp.clip((best % nsd - LOWRES_R) * 4,
                         -MV_CLAMP, MV_CLAMP).astype(jnp.int32)

        # --- per-CTU window fetch (one-hot select) ---
        Wl = _lanes(W + 2 * PAD_A)
        refp = jnp.pad(ref_y.astype(jnp.int32), PAD_A, mode="edge")
        refp = jnp.pad(refp, ((0, 0), (0, Wl - refp.shape[1])))
        strips = jnp.stack([refp[32 * i:32 * i + 96] for i in range(ch)])
        sub = jnp.stack([strips[:, :, 32 * j:32 * j + 96]
                         for j in range(cw)], axis=1)        # (ch,cw,96,96)
        my = mv_cy.reshape(ch, cw)
        mx = mv_cx.reshape(ch, cw)
        wy = _onehot_select(sub, my + (PAD_A - 8), mx + (PAD_A - 8),
                            WIN, WIN, precise).reshape(n, WIN, WIN)

        # --- full-pel refine +-r (static slices) ---
        cc = []
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                blk = wy[:, 8 + dy:40 + dy, 8 + dx:40 + dx]
                sad = jnp.abs(blk - src_ctu).sum((1, 2))
                cc.append(sad + 3 * (abs(dx) + abs(dy)))
        cc = jnp.stack(cc, 1)
        fbi = jnp.argmin(cc, axis=1)
        fdy = (fbi // side - r).astype(jnp.int32)
        fdx = (fbi % side - r).astype(jnp.int32)

        # aligned 40x40 window at the best full-pel position
        A = jnp.zeros((n, AWIN, AWIN), jnp.int32)
        for k in range(side * side):
            dy, dx = k // side - r, k % side - r
            sl = wy[:, 4 + dy:44 + dy, 4 + dx:44 + dx]
            A = A + jnp.where((fbi == k)[:, None, None], sl, 0)

        # --- quarter-pel refine: 25 candidates on exact 8-tap grids ---
        grids = _subpel_grids(A, maxval)
        qcands = [(dqx, dqy) for dqy in range(-2, 3) for dqx in range(-2, 3)]
        qsads = []
        for dqx, dqy in qcands:
            g = grids[(dqx & 3, dqy & 3)]
            oy, ox = 1 + (dqy >> 2), 1 + (dqx >> 2)
            pred = g[:, oy:oy + 32, ox:ox + 32]
            qsads.append(jnp.abs(pred - src_ctu).sum((1, 2)))
        qsads = jnp.stack(qsads, 1)
        qbi = jnp.argmin(qsads, axis=1)
        dq = np.array(qcands, np.int32)
        mvx = (mv_cx + fdx) * 4 + jnp.asarray(dq[:, 0])[qbi]
        mvy = (mv_cy + fdy) * 4 + jnp.asarray(dq[:, 1])[qbi]
        return {"mv": jnp.stack([mvx, mvy], 1),
                "sad": jnp.min(qsads, axis=1).astype(jnp.float32)}

    return analyze


def build_ctu_analyzer(cw: int, ch: int, qp: int, maxval: int = 255):
    """Jitted analyzer; signature matches encoder.py's call site."""
    return jax.jit(build_ctu_analyzer_fn(cw, ch, qp, maxval))
