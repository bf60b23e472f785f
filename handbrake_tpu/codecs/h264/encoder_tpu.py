"""TPU device path for H.264 P-frame analysis.

Architecture (chosen after profiling on TPU v5e):
  * XLA's generic gather is ~12 ns/element on TPU — unusable for per-MB
    motion windows (28 gathers ≈ 700 ms/frame at 1080p). Instead, per-MB
    search windows are extracted gather-free: overlapping strips come from
    shifted *block views* (reshape + concat — pure address arithmetic for
    XLA), and the per-MB dynamic origin inside each 80x80 subwindow is
    resolved by one-hot selector matmuls on the MXU (bf16 one-hots are
    exact for 0..255 pixel data).
  * Everything downstream operates on the batched (nMB, …) window arrays
    with *static* slices, one-hot selects, and einsum transforms — all
    VPU/MXU-friendly, no gathers, no data-dependent shapes. The graph is
    O(100) HLO ops, so 1080p compiles in seconds (the round-1 version
    stacked mb_h+mb_w Python slices and took minutes).
  * Sub-pel interpolation (6-tap 8.4.2.2) is recomputed per-window on the
    VPU instead of materialising 16 phase planes — arithmetic is identical
    to predict.mc_luma_block (asserted in tests).
  * qp is traced: rate control never triggers recompiles.

Host entropy coding consumes the resulting arrays (encoder.py
_encode_slice_device / native/hb264.cpp).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .tables import MF4x4, V4x4, QBITS_BASE

PAD = 32          # luma ref padding (matches encoder.PAD)
LOWRES_R = 4      # coarse search radius on 4x-decimated planes (= ±16 px)
REFINE_R = 3      # full-pel refine radius
WIN = 32          # luma window size (16 + 2*8 margin)
CWIN = 16         # chroma window size (8 + 1 bilinear + 5 offset range + pad)
MV_CLAMP = 22     # |full-pel mv| bound; keeps every access inside the pads
INTRA_THRESH = 20 * 256   # base inter-SAD intra trigger (per-MB, qp≈28)


def intra_thresh_for_qp(qp) -> "int | jnp.ndarray":
    """qp-scaled intra-fallback threshold.

    The SAD of a well-predicted block grows with the quantizer step (the
    reconstruction it predicts from is coarser), so a fixed threshold
    floods coarse-qp P frames with expensive intra MBs (the RD.json qp-40
    rate blow-up). Scale with qstep = 0.625 * 2^(qp/6), anchored so
    qp≈28 keeps the original 20/px trigger."""
    if isinstance(qp, (int, float)):
        import math
        qstep = 0.625 * (2.0 ** (qp / 6.0))
        return int(256 * max(20.0, 1.25 * qstep))
    qstep = 0.625 * jnp.exp2(qp.astype(jnp.float32) / 6.0)
    return (256.0 * jnp.maximum(20.0, 1.25 * qstep)).astype(jnp.int32)
PAYLOAD_CHUNKS = 8        # compact-payload buckets fetched on demand


def _payload_cap(n_mb: int) -> int:
    """Compact-payload capacity: half the MBs (rounded to whole chunks),
    but never below min(n_mb, 64) so tiny test frames don't always fall
    back to the full int16 fetch."""
    want = max(n_mb // 2, min(n_mb, 64))
    per = (want + PAYLOAD_CHUNKS - 1) // PAYLOAD_CHUNKS
    return per * PAYLOAD_CHUNKS


# ---------------------------------------------------------------------------
# traced-qp quantization (same integer arithmetic as transform.py)
# ---------------------------------------------------------------------------
# numpy at module scope (no backend init at import); jnp consumes them
# as constants when traced.
_MF = MF4x4.astype(np.int32)
_V = V4x4.astype(np.int32)


def _quant4x4_t(w, qp, intra: bool):
    qbits = QBITS_BASE + qp // 6
    mf = jnp.asarray(_MF)[qp % 6]
    f = jnp.where(intra, (1 << qbits) // 3, (1 << qbits) // 6)
    aw = jnp.abs(w)
    lv = jnp.right_shift(aw * mf + f, qbits)
    return jnp.where(w < 0, -lv, lv).astype(jnp.int32)


def _quant_dc_t(w, qp, intra: bool):
    qbits = QBITS_BASE + qp // 6
    mf00 = jnp.asarray(_MF)[qp % 6, 0, 0]
    f = jnp.where(intra, (1 << qbits) // 3, (1 << qbits) // 6)
    aw = jnp.abs(w)
    lv = jnp.right_shift(aw * mf00 + 2 * f, qbits + 1)
    return jnp.where(w < 0, -lv, lv).astype(jnp.int32)


def _dequant4x4_t(lv, qp):
    return jnp.left_shift(lv * jnp.asarray(_V)[qp % 6], qp // 6)


def _dequant_chroma_dc_t(f, qp):
    ls = 16 * jnp.asarray(_V)[qp % 6, 0, 0]
    return jnp.right_shift(jnp.left_shift(f * ls, qp // 6), 5)


_CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2],
                [1, -1, -1, 1], [1, -2, 2, -1]], np.int32)
_H2 = np.array([[1, 1], [1, -1]], np.int32)


# ---------------------------------------------------------------------------
# 8x8 transform (High profile) — traced-qp variants of transform.py's
# fquant8x8 / dequant8x8 / idct8x8.  Forward quant runs in f32 (any level
# choice is conformant); recon is the spec integer inverse (bit-exact).
# ---------------------------------------------------------------------------
def _t8_consts():
    from .transform import _G8_INV, V8x8, ZIG8
    perm = np.zeros((64, 64), np.float32)
    for s, c in enumerate(ZIG8):
        perm[c, s] = 1.0                       # scan = flat @ perm
    return (_G8_INV.astype(np.float32), V8x8.astype(np.int32),
            perm)


_G8F, _V8, _P8SCAN = _t8_consts()


def _fquant8x8_t(res, qp):
    """res: (n, 4, 8, 8) int32 → levels (n, 4, 8, 8) int32 (inter)."""
    r = res.astype(jnp.float32)
    w = 64.0 * jnp.einsum("ij,...jk,lk->...il", _G8F, r, _G8F)
    step = (16.0 * jnp.asarray(_V8, jnp.float32)[qp % 6]
            * jnp.exp2(jnp.asarray(qp // 6 - 6, jnp.float32)))
    q = jnp.floor(jnp.abs(w) / step + (1.0 / 6.0))
    return (jnp.sign(w) * q).astype(jnp.int32)


def _dequant8x8_t(lv, qp):
    # int32 like the C decoder (products stay < 2^24 for valid levels)
    lv = lv.astype(jnp.int32)
    ls = jnp.asarray(_V8, jnp.int32)[qp % 6] * 16
    qp6 = qp // 6
    hi = jnp.left_shift(lv * ls, jnp.maximum(qp6 - 6, 0))
    lo = jnp.right_shift(lv * ls + jnp.left_shift(
        jnp.int32(1), jnp.clip(5 - qp6, 0, 5)), jnp.clip(6 - qp6, 0, 6))
    return jnp.where(qp6 >= 6, hi, lo).astype(jnp.int32)


def _idct8_1d_t(a):
    a0, a1, a2, a3 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    a4, a5, a6, a7 = a[..., 4], a[..., 5], a[..., 6], a[..., 7]
    e0 = a0 + a4
    e1 = -a3 + a5 - a7 - (a7 >> 1)
    e2 = a0 - a4
    e3 = a1 + a7 - a3 - (a3 >> 1)
    e4 = (a2 >> 1) - a6
    e5 = -a1 + a7 + a5 + (a5 >> 1)
    e6 = a2 + (a6 >> 1)
    e7 = a3 + a5 + a1 + (a1 >> 1)
    f0 = e0 + e6
    f1 = e1 + (e7 >> 2)
    f2 = e2 + e4
    f3 = e3 + (e5 >> 2)
    f4 = e2 - e4
    f5 = (e3 >> 2) - e5
    f6 = e0 - e6
    f7 = e7 - (e1 >> 2)
    return jnp.stack([f0 + f7, f2 + f5, f4 + f3, f6 + f1,
                      f6 - f1, f4 - f3, f2 - f5, f0 - f7], axis=-1)


def _idct8x8_t(d):
    d = d.astype(jnp.int32)
    t = _idct8_1d_t(d)
    g = jnp.swapaxes(_idct8_1d_t(jnp.swapaxes(t, -1, -2)), -1, -2)
    return (g + 32) >> 6


def _fdct(d):
    return jnp.einsum("ij,...jk,lk->...il", _CF, d, _CF)


def _had2(d):
    return jnp.einsum("ij,...jk,lk->...il", _H2, d, _H2)


def _idct(d):
    d0, d1, d2, d3 = d[..., :, 0], d[..., :, 1], d[..., :, 2], d[..., :, 3]
    e0, e1 = d0 + d2, d0 - d2
    e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
    f = jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-1)
    g0, g1 = f[..., 0, :] + f[..., 2, :], f[..., 0, :] - f[..., 2, :]
    g2 = (f[..., 1, :] >> 1) - f[..., 3, :]
    g3 = f[..., 1, :] + (f[..., 3, :] >> 1)
    h = jnp.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=-2)
    return (h + 32) >> 6


def _to_blocks4(p):
    H, W = p.shape[-2], p.shape[-1]
    b = p.reshape(*p.shape[:-2], H // 4, 4, W // 4, 4)
    b = jnp.swapaxes(b, -3, -2)
    return b.reshape(*p.shape[:-2], (H // 4) * (W // 4), 4, 4)


def _from_blocks4(b, H, W):
    lead = b.shape[:-3]
    x = b.reshape(*lead, H // 4, W // 4, 4, 4)
    x = jnp.swapaxes(x, -3, -2)
    return x.reshape(*lead, H, W)


# ---------------------------------------------------------------------------
# Window fetch via one-hot selection matmuls (the TPU gather workaround:
# XLA's gather is ~12 ns/element on TPU, but an MXU matmul with a one-hot
# selector extracts per-MB windows at full throughput; bf16 one-hots are
# exact for 0..255 pixel values).
# ---------------------------------------------------------------------------
def _onehot_select(sub, roff, coff, out_h, out_w):
    """sub: (b, n, H, W) source subwindows; roff/coff: (b, n) dynamic
    origins. Returns (b, n, out_h, out_w) = sub[:, :, roff:roff+out_h,
    coff:coff+out_w] per (b, n), via R @ sub @ C on the MXU."""
    b, n, Hs, Ws = sub.shape
    ar_h = jnp.arange(Hs)
    ar_w = jnp.arange(Ws)
    R = (roff[..., None, None] + jnp.arange(out_h)[:, None]
         == ar_h[None, None, None, :]).astype(jnp.bfloat16)   # (b,n,oh,Hs)
    C = (coff[..., None, None] + jnp.arange(out_w)[None, :]
         == ar_w[None, None, :, None]).astype(jnp.bfloat16)   # (b,n,Ws,ow)
    subf = sub.astype(jnp.bfloat16)
    t = jnp.einsum("bnrh,bnhw->bnrw", R, subf,
                   preferred_element_type=jnp.float32)
    out = jnp.einsum("bnrw,bnwc->bnrc", t.astype(jnp.bfloat16), C,
                     preferred_element_type=jnp.float32)
    return out.astype(jnp.int32)


def _overlap_subwindows(plane, bs, mb_h, mb_w, span):
    """Extract overlapping (span*bs)×(span*bs) subwindows at stride bs.

    plane: (>= bs*(mb_h+span-1), >= bs*(mb_w+span-1)). Returns
    (mb_h, mb_w, span*bs, span*bs) with [i,j] = plane[bs*i : bs*i+span*bs,
    bs*j : bs*j+span*bs] — built from `span` shifted block *views* per axis
    (reshape + concat = address arithmetic only; no gather, O(span) HLO ops,
    the taskset-slice analog of comb_detect.c's segment windows).
    """
    side = span * bs
    v = plane[:bs * (mb_h + span - 1) + bs].reshape(-1, bs, plane.shape[1])
    strips = jnp.concatenate([v[k:k + mb_h] for k in range(span)], axis=1)
    c = strips[:, :, :bs * (mb_w + span - 1)].reshape(mb_h, side, -1, bs)
    sub = jnp.concatenate([c[:, :, k:k + mb_w] for k in range(span)], axis=3)
    return sub.transpose(0, 2, 1, 3)        # (mb_h, mb_w, side, side)


def _fetch_windows(refp, rup, rvp, mv_cy, mv_cx, mb_w, mb_h):
    """refp: (H+2*PAD+16, *) luma padded; rup/rvp: (H/2+48, *) chroma padded.
    mv_*: (nMB,) clamped full-pel coarse mvs.
    Returns wy (nMB,32,32), wu/wv (nMB,16,16) int32 with origins
    luma (y0+mv+PAD-8, x0+mv+PAD-8), chroma (cy0+((4mv-16)>>3)+16, …)."""
    my = mv_cy.reshape(mb_h, mb_w)
    mx = mv_cx.reshape(mb_h, mb_w)
    # luma: 80x80 subwindows at stride 16; per-MB dynamic origin
    # (my+24, mx+24) ∈ [2, 46] resolved by the one-hot matmul
    sub = _overlap_subwindows(refp, 16, mb_h, mb_w, 5)        # (b,n,80,80)
    wy = _onehot_select(sub, my + (PAD - 8), mx + (PAD - 8), WIN, WIN)
    # chroma: 48x48 subwindows at stride 8; origin local
    # ((4*mv-16)>>3) + 16 ∈ [4, 23]
    croff = ((4 * my - 16) >> 3) + 16
    ccoff = ((4 * mx - 16) >> 3) + 16
    subu = _overlap_subwindows(rup, 8, mb_h, mb_w, 6)         # (b,n,48,48)
    subv = _overlap_subwindows(rvp, 8, mb_h, mb_w, 6)
    wu = _onehot_select(subu, croff, ccoff, CWIN, CWIN)
    wv = _onehot_select(subv, croff, ccoff, CWIN, CWIN)
    n_mb = mb_w * mb_h
    # zero-centred second candidate windows — STATIC slices (no one-hot):
    # the 4x-decimated coarse stage is noise-deceivable on small motion,
    # so the full-pel refine always also searches around mv = 0 (the
    # zero-mv candidate every production encoder keeps).  Built from the
    # padded planes directly (slicing the big subwindow tensors trips an
    # XLA-TPU fusion-remover CHECK — tpu_trivial_fusion_remover bug).
    wy0 = _overlap_subwindows(refp[PAD - 8:, PAD - 8:], 16, mb_h, mb_w, 2)
    c0 = ((0 - 16) >> 3) + 16          # = 14: chroma origin for mv_c = 0
    wu0 = _overlap_subwindows(rup[c0:, c0:], 8, mb_h, mb_w, 2)
    wv0 = _overlap_subwindows(rvp[c0:, c0:], 8, mb_h, mb_w, 2)
    return (wy.reshape(n_mb, WIN, WIN), wu.reshape(n_mb, CWIN, CWIN),
            wv.reshape(n_mb, CWIN, CWIN),
            wy0.reshape(n_mb, WIN, WIN), wu0.reshape(n_mb, CWIN, CWIN),
            wv0.reshape(n_mb, CWIN, CWIN))


# ---------------------------------------------------------------------------
# sub-pel interpolation on batched windows (8.4.2.2 arithmetic)
# ---------------------------------------------------------------------------
def _tap6_h_w(a):
    """(…, H, W) → (…, H, W-5) raw horizontal 6-tap; out[..,c] is the
    half-sample between source cols c+2 and c+3."""
    return (a[..., 0:-5] - 5 * a[..., 1:-4] + 20 * a[..., 2:-3]
            + 20 * a[..., 3:-2] - 5 * a[..., 4:-1] + a[..., 5:])


def _tap6_v_w(a):
    return (a[..., 0:-5, :] - 5 * a[..., 1:-4, :] + 20 * a[..., 2:-3, :]
            + 20 * a[..., 3:-2, :] - 5 * a[..., 4:-1, :] + a[..., 5:, :])


def _subpel_preds(A):
    """A: (nMB, 24, 24) windows, A[:,4,4] = best-full-pel block origin.

    Returns dict phase (xf,yf) → (nMB,18,18) arrays, where element [r,c] is
    the sample at quarter position (c-1 + xf/4, r-1 + yf/4) relative to the
    block origin (so candidate (dqx,dqy)∈[-2,2] picks a 16x16 slice at
    offset (1 + (dqy>>2) + …)). Only the 16 spec phases, exact arithmetic.
    """
    A = A.astype(jnp.int32)
    # raw intermediates
    b1 = _tap6_h_w(A)                 # (n,24,19): b1[r,c] ~ (c+2)+0.5, row r
    h1 = _tap6_v_w(A)                 # (n,19,24)
    j1 = _tap6_v_w(b1)                # (n,19,19) both-half raw (scale 1024)
    b = jnp.clip((b1 + 16) >> 5, 0, 255)
    h = jnp.clip((h1 + 16) >> 5, 0, 255)
    j = jnp.clip((j1 + 512) >> 10, 0, 255)

    # 18x18 base grids, element [r,c] ↔ integer sample (row 3+r-… )
    # G grid: sample at (col c+3, row r+3) relative to window → block coords
    # (c-1, r-1).  b grid: half sample right of G[r, c] → b1 col (c+3)-2 = c+1.
    G = A[:, 3:21, 3:21]
    B = b[:, 3:21, 1:19]              # b at (c-1+0.5, r-1)
    Hh = h[:, 1:19, 3:21]             # h at (c-1, r-1+0.5)
    J = j[:, 1:19, 1:19]              # j at (c-1+0.5, r-1+0.5)

    def sx(p):
        return jnp.pad(p[:, :, 1:], ((0, 0), (0, 0), (0, 1)))

    def sy(p):
        return jnp.pad(p[:, 1:, :], ((0, 0), (0, 1), (0, 0)))

    def avg(p, q):
        return (p + q + 1) >> 1

    ph = {}
    ph[(0, 0)] = G
    ph[(1, 0)] = avg(G, B)
    ph[(2, 0)] = B
    ph[(3, 0)] = avg(B, sx(G))
    ph[(0, 1)] = avg(G, Hh)
    ph[(1, 1)] = avg(B, Hh)
    ph[(2, 1)] = avg(B, J)
    ph[(3, 1)] = avg(B, sx(Hh))
    ph[(0, 2)] = Hh
    ph[(1, 2)] = avg(Hh, J)
    ph[(2, 2)] = J
    ph[(3, 2)] = avg(J, sx(Hh))
    ph[(0, 3)] = avg(Hh, sy(G))
    ph[(1, 3)] = avg(Hh, sy(B))
    ph[(2, 3)] = avg(J, sy(B))
    ph[(3, 3)] = avg(sx(Hh), sy(B))
    return ph


# ---------------------------------------------------------------------------
# the analyzer
# ---------------------------------------------------------------------------
def build_p_analyzer(mb_w: int, mb_h: int, interpret: bool | None = None,
                     deblock: bool = False, transform8x8: bool = False):
    """Returns jitted analyze(src_packed, ref_y,u,v, qp, qpc) → dict.

    src_packed is the three source planes concatenated into one flat uint8
    buffer (y | u | v): the host→device link pays per-transfer overhead, so
    the encoder ships one array per frame instead of three."""
    fn = build_p_analyzer_fn(mb_w, mb_h, interpret, deblock=deblock,
                             transform8x8=transform8x8)
    H, W = mb_h * 16, mb_w * 16
    ny, nc = H * W, (H // 2) * (W // 2)

    def analyze_packed(src, ref_y, ref_u, ref_v, qp, qpc, dbscal=None):
        y = src[:ny].reshape(H, W)
        u = src[ny:ny + nc].reshape(H // 2, W // 2)
        v = src[ny + nc:ny + 2 * nc].reshape(H // 2, W // 2)
        return fn(y, u, v, ref_y, ref_u, ref_v, qp, qpc, dbscal)

    return jax.jit(analyze_packed)


def build_p_analyzer_batch(mb_w: int, mb_h: int, n_frames: int,
                           deblock: bool = False,
                           transform8x8: bool = False):
    """N-frame batched analyzer: ONE device dispatch runs a lax.scan of
    the per-frame analyzer, chaining the recon references on device.

    Motivation (measured on the axon v5e tunnel): after the first
    device→host transfer the runtime drops into a synchronous dispatch
    mode costing ~32 ms per call regardless of compute (~0.2 ms/frame);
    batching amortizes that fixed cost over n_frames.  qp is shared by
    the batch (rate control quantizes per batch — the lookahead-group
    granularity x264's VBV also uses between filler checks).

    Returns jitted fn(srcs, ref_y, ref_u, ref_v, qp, qpc, dbscal) where
    srcs is (N, ny+2nc) uint8; output dict fields are stacked (N, ...);
    final recon planes ride in "carry_y/u/v"."""
    fn = build_p_analyzer_fn(mb_w, mb_h, deblock=deblock,
                             transform8x8=transform8x8)
    H, W = mb_h * 16, mb_w * 16
    ny, nc = H * W, (H // 2) * (W // 2)

    def analyze_batch(srcs, ref_y, ref_u, ref_v, qp, qpc, dbscal=None):
        def step(carry, src):
            ry, ru, rv = carry
            y = src[:ny].reshape(H, W)
            u = src[ny:ny + nc].reshape(H // 2, W // 2)
            v = src[ny + nc:].reshape(H // 2, W // 2)
            d = fn(y, u, v, ry, ru, rv, qp, qpc, dbscal)
            out = {k: d[k] for k in d
                   if k not in ("payload", "payload_nib")}
            out["payload"] = jnp.stack(d["payload"])
            out["payload_nib"] = jnp.stack(d["payload_nib"])
            return (d["recon_y"], d["urec"], d["vrec"]), out
        carry, outs = jax.lax.scan(step, (ref_y, ref_u, ref_v), srcs)
        outs["carry_y"], outs["carry_u"], outs["carry_v"] = carry
        return outs

    return jax.jit(analyze_batch)


def build_p_analyzer_fn(mb_w: int, mb_h: int, interpret: bool | None = None,
                        deblock: bool = False, transform8x8: bool = False):
    """Un-jitted analyze fn — vmap/shard_map-composable (see parallel/mesh).

    interpret: run the Pallas fetch in interpreter mode (auto: on non-TPU
    backends).
    deblock: chain the in-loop deblocking wavefront (deblock_tpu) onto the
    recon so the reference planes handed to the next frame's ME are the
    spec 8.7 filtered picture.  The unfiltered recon stays available as
    recon_y_nf/urec_nf/vrec_nf for the host intra-fallback patch path
    (intra prediction reads pre-filter samples; frames with fallbacks are
    re-deblocked host-side with the true intra mask).
    """
    del interpret  # pure-XLA path runs identically on all backends
    H, W = mb_h * 16, mb_w * 16
    n_mb = mb_w * mb_h
    r = REFINE_R
    side = 2 * r + 1
    deblock_fn = None
    pallas_deblock = False
    if deblock:
        # all-inter frames only (bS ≤ 2): the fast no-strong variant.
        # On a TPU backend the Pallas wavefront kernel runs the whole
        # scan as ONE kernel (no 250-step XLA scan overhead; on the
        # axon tunnel's penalized execution mode it measures ~equal to
        # the XLA scan — the design targets directly-attached TPUs).
        # Other backends use the portable XLA formulation.
        if jax.default_backend() == "tpu":
            from .deblock_pallas import build_deblock_pallas
            deblock_fn = build_deblock_pallas(mb_w, mb_h,
                                              with_strong=False)
            pallas_deblock = True
        else:
            from .deblock_tpu import build_deblock_fn
            deblock_fn = build_deblock_fn(mb_w, mb_h, with_strong=False)

    def analyze(src_y, src_u, src_v, ref_y, ref_u, ref_v, qp, qpc,
                dbscal=None):
        src_y = src_y.astype(jnp.int32)
        src_mb = (src_y.reshape(mb_h, 16, mb_w, 16)
                  .transpose(0, 2, 1, 3).reshape(n_mb, 16, 16))

        # --- coarse ME on 4x-decimated planes (static shifts, no gathers)
        s4 = src_y.reshape(H // 4, 4, W // 4, 4).sum((1, 3)) >> 4
        r4 = ref_y.astype(jnp.int32).reshape(H // 4, 4, W // 4, 4
                                             ).sum((1, 3)) >> 4
        r4p = jnp.pad(r4, LOWRES_R, mode="edge")
        costs = []
        for dy in range(-LOWRES_R, LOWRES_R + 1):
            for dx in range(-LOWRES_R, LOWRES_R + 1):
                sh = r4p[LOWRES_R + dy:LOWRES_R + dy + H // 4,
                         LOWRES_R + dx:LOWRES_R + dx + W // 4]
                blk = jnp.abs(s4 - sh).reshape(mb_h, 4, mb_w, 4).sum((1, 3))
                costs.append(blk + 2 * (abs(dx) + abs(dy)))
        best = jnp.argmin(jnp.stack(costs), axis=0).reshape(-1)
        mv_cy = jnp.clip((best // (2 * LOWRES_R + 1) - LOWRES_R) * 4,
                         -(MV_CLAMP - r), MV_CLAMP - r).astype(jnp.int32)
        mv_cx = jnp.clip((best % (2 * LOWRES_R + 1) - LOWRES_R) * 4,
                         -(MV_CLAMP - r), MV_CLAMP - r).astype(jnp.int32)

        # --- gather-free window fetch (block views + one-hot matmuls) ---
        # chroma right-pad is 24 (not 16): the 48-wide block views read 8
        # cols past the window range; values there are never selected.
        refp = jnp.pad(ref_y.astype(jnp.int32),
                       ((PAD, PAD + 16), (PAD, PAD)), mode="edge")
        rup = jnp.pad(ref_u.astype(jnp.int32), ((16, 32), (16, 24)),
                      mode="edge")
        rvp = jnp.pad(ref_v.astype(jnp.int32), ((16, 32), (16, 24)),
                      mode="edge")
        wy, wu, wv, wy0, wu0, wv0 = _fetch_windows(refp, rup, rvp,
                                                   mv_cy, mv_cx,
                                                   mb_w, mb_h)

        # --- full-pel refine ±r over TWO centres: the coarse winner and
        # the zero-mv candidate (static slices of both windows) ---
        cc = []
        for w_ in (wy, wy0):
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    blk = w_[:, 8 + dy:24 + dy, 8 + dx:24 + dx]
                    sad = jnp.abs(blk - src_mb).sum((1, 2))
                    cc.append(sad + 3 * (abs(dx) + abs(dy)))
        cc = jnp.stack(cc, 1)                       # (nMB, 98)
        fbi98 = jnp.argmin(cc, axis=1)
        use0 = fbi98 >= side * side
        fbi = fbi98 % (side * side)
        fdy = (fbi // side - r).astype(jnp.int32)
        fdx = (fbi % side - r).astype(jnp.int32)
        mv_cy = jnp.where(use0, 0, mv_cy)
        mv_cx = jnp.where(use0, 0, mv_cx)
        wu = jnp.where(use0[:, None, None], wu0, wu)
        wv = jnp.where(use0[:, None, None], wv0, wv)

        # aligned 24x24 window around the best full-pel position
        # (one-hot select over the 2x49 static slices)
        A = jnp.zeros((n_mb, 24, 24), jnp.int32)
        for ci, w_ in enumerate((wy, wy0)):
            for k in range(side * side):
                dy, dx = k // side - r, k % side - r
                sl = w_[:, 4 + dy:28 + dy, 4 + dx:28 + dx]
                A = A + jnp.where((fbi98 == ci * side * side + k)
                                  [:, None, None], sl, 0)

        # --- quarter-pel refine: 25 candidates on recomputed sub-pel grids
        phg = _subpel_preds(A)
        qcands = [(dqx, dqy) for dqy in range(-2, 3) for dqx in range(-2, 3)]
        qsads = []
        preds = []
        for dqx, dqy in qcands:
            p = phg[(dqx & 3, dqy & 3)]
            oy, ox = 1 + (dqy >> 2), 1 + (dqx >> 2)
            pred = p[:, oy:oy + 16, ox:ox + 16]
            preds.append(pred)
            qsads.append(jnp.abs(pred - src_mb).sum((1, 2)))
        qsads = jnp.stack(qsads, 1)                 # (nMB, 25)
        qbi = jnp.argmin(qsads, axis=1)
        dq = np.array(qcands, np.int32)
        mvx = (mv_cx + fdx) * 4 + jnp.asarray(dq[:, 0])[qbi]
        mvy = (mv_cy + fdy) * 4 + jnp.asarray(dq[:, 1])[qbi]
        sad_best = jnp.min(qsads, axis=1)
        pred_y = jnp.zeros((n_mb, 16, 16), jnp.int32)
        for k in range(25):
            pred_y = pred_y + jnp.where((qbi == k)[:, None, None],
                                        preds[k], 0)

        # --- luma residual transform/quant/recon ---
        res = src_mb - pred_y
        w = _fdct(_to_blocks4(res))
        lv = _quant4x4_t(w, qp, intra=False)
        nnz = (lv.reshape(-1, 16, 16) != 0).sum(-1)
        bidx = np.arange(16)
        quad = jnp.asarray((bidx // 8) * 2 + (bidx % 4) // 2)
        qmask = jnp.stack([(nnz * (quad == q)).sum(-1) > 0 for q in range(4)],
                          1)
        cbp_luma = (qmask.astype(jnp.int32)
                    << jnp.arange(4, dtype=jnp.int32)).sum(-1)
        keep = qmask[:, quad]
        lv = jnp.where(keep[..., None, None], lv, 0)
        nnz = jnp.where(keep, nnz, 0)
        rec = _idct(_dequant4x4_t(lv, qp))
        recon_y = jnp.clip(pred_y + _from_blocks4(rec, 16, 16), 0, 255)

        t8_flags = jnp.zeros((n_mb,), bool)
        if transform8x8:
            # --- 8x8 transform hypothesis (High profile) + per-MB RDO ---
            quads8 = (res.reshape(n_mb, 2, 8, 2, 8)
                      .transpose(0, 1, 3, 2, 4).reshape(n_mb, 4, 8, 8))
            lv8 = _fquant8x8_t(quads8, qp)
            q8c = jnp.any(lv8 != 0, axis=(2, 3))          # (n, 4)
            cbp8 = (q8c.astype(jnp.int32)
                    << jnp.arange(4, dtype=jnp.int32)).sum(-1)
            lv8 = jnp.where(q8c[:, :, None, None], lv8, 0)
            r8 = _idct8x8_t(_dequant8x8_t(lv8, qp))
            r8f = (r8.reshape(n_mb, 2, 2, 8, 8)
                   .transpose(0, 1, 3, 2, 4).reshape(n_mb, 16, 16))
            recon8 = jnp.clip(pred_y + r8f, 0, 255)
            # true-recon RDO, same cost model as the host walker
            # (encoder.py: SSD + lam2 * 6 * nnz)
            lam2 = 0.85 * jnp.exp2(
                (jnp.asarray(qp).astype(jnp.float32) - 12.0) / 3.0)
            nnz8_tot = (lv8 != 0).sum((1, 2, 3))
            ssd4 = ((src_mb - recon_y) ** 2).sum((1, 2)).astype(jnp.float32)
            ssd8 = ((src_mb - recon8) ** 2).sum((1, 2)).astype(jnp.float32)
            j4 = ssd4 + lam2 * 6.0 * nnz.sum(-1).astype(jnp.float32)
            j8 = ssd8 + lam2 * 6.0 * nnz8_tot.astype(jnp.float32)
            t8_flags = (j8 < j4) & (cbp8 != 0)
            # select recon / cbp; levels re-packed below
            recon_y = jnp.where(t8_flags[:, None, None], recon8, recon_y)
            cbp_luma = jnp.where(t8_flags, cbp8, cbp_luma)
            # 8x8 CAVLC sub-streams: zig-scan via one-hot matmul (f32 is
            # exact for level magnitudes), then phase de-interleave —
            # sub-stream k = (quad k>>2, phase k&3), 16 coeffs each
            scan8 = jnp.einsum("nqc,cs->nqs",
                               lv8.reshape(n_mb, 4, 64).astype(jnp.float32),
                               _P8SCAN).astype(jnp.int32)
            subs = (scan8.reshape(n_mb, 4, 16, 4)
                    .transpose(0, 1, 3, 2).reshape(n_mb, 16, 16))
            lv = jnp.where(t8_flags[:, None, None, None],
                           subs.reshape(n_mb, 16, 4, 4), lv)
            # per-4x4-cell coded-ness for the loop filter (each cell of a
            # coded quad counts as coded — hbdec264 block_bs nzl)
            cells8 = (jnp.repeat(jnp.repeat(
                q8c.reshape(n_mb, 2, 2), 2, axis=1), 2, axis=2)
                .reshape(n_mb, 16).astype(jnp.int32) * 16)
            nnz = jnp.where(t8_flags[:, None], cells8, nnz)

        # --- chroma: select 9x9 window by final-mv offset, bilinear MC ---
        def chroma(srcp, wc):
            base4 = jnp.stack([mv_cx * 4 - 16, mv_cy * 4 - 16])
            offx = (mvx >> 3) - (base4[0] >> 3)     # ∈ [0, 4]
            offy = (mvy >> 3) - (base4[1] >> 3)
            w9 = jnp.zeros((n_mb, 9, 9), jnp.int32)
            for oy in range(5):
                for ox in range(5):
                    m = (offy == oy) & (offx == ox)
                    w9 = w9 + jnp.where(m[:, None, None],
                                        wc[:, oy:oy + 9, ox:ox + 9], 0)
            xf = (mvx & 7)[:, None, None]
            yf = (mvy & 7)[:, None, None]
            Aq = w9[:, 0:8, 0:8]
            Bq = w9[:, 0:8, 1:9]
            Cq = w9[:, 1:9, 0:8]
            Dq = w9[:, 1:9, 1:9]
            pred = ((8 - xf) * (8 - yf) * Aq + xf * (8 - yf) * Bq
                    + (8 - xf) * yf * Cq + xf * yf * Dq + 32) >> 6
            smb = (srcp.astype(jnp.int32)
                   .reshape(mb_h, 8, mb_w, 8).transpose(0, 2, 1, 3)
                   .reshape(n_mb, 8, 8))
            cw = _fdct(_to_blocks4(smb - pred))
            dc = cw[:, :, 0, 0].reshape(-1, 2, 2)
            dclv = _quant_dc_t(_had2(dc), qpc, intra=False)
            ac = cw.at[:, :, 0, 0].set(0)
            aclv = _quant4x4_t(ac, qpc, intra=False)
            dcq = _dequant_chroma_dc_t(_had2(dclv), qpc)
            dqc = _dequant4x4_t(aclv, qpc)
            dqc = dqc.at[:, :, 0, 0].set(dcq.reshape(-1, 4))
            rc = _idct(dqc)
            reconc = jnp.clip(pred + _from_blocks4(rc, 8, 8), 0, 255)
            cnnz = (aclv.reshape(-1, 4, 16) != 0).sum(-1)
            return dclv.reshape(-1, 4), aclv, reconc, cnnz

        udc, uac, urec, unnz = chroma(src_u, wu)
        vdc, vac, vrec, vnnz = chroma(src_v, wv)

        # --- compact entropy payload -------------------------------------
        # The host↔device link is the pipeline bottleneck (the reference's
        # hwaccel upload/download, hwaccel.c:15). Levels are shipped as int8
        # for *coded MBs only*, bucketed into PAYLOAD_CHUNKS so the host
        # fetches just ceil(n_coded/chunk) buckets; full int16 arrays remain
        # available as a fallback (level overflow or > cap coded MBs).
        coded = ((cbp_luma > 0) | (udc != 0).any(-1) | (unnz > 0).any(-1)
                 | (vdc != 0).any(-1) | (vnnz > 0).any(-1))
        n_coded = coded.sum().astype(jnp.int32)
        payload16 = jnp.concatenate([
            lv.reshape(n_mb, 256), udc, uac.reshape(n_mb, 64),
            vdc, vac.reshape(n_mb, 64)], axis=1)          # (nMB, 392)
        overflow = (jnp.abs(payload16).max() > 127).astype(jnp.int32)
        cap = _payload_cap(n_mb)
        coded_idx = jnp.nonzero(coded, size=cap, fill_value=0)[0]
        payload8 = jnp.take(
            jnp.clip(payload16, -128, 127).astype(jnp.int8),
            coded_idx, axis=0).reshape(PAYLOAD_CHUNKS, cap // PAYLOAD_CHUNKS,
                                       392)
        # nibble-packed variant: at working QPs nearly every level fits
        # 4-bit two's complement, halving the dominant device→host
        # payload; MBs with any |level| > 7 are flagged (nib_ok=0) and
        # the host fetches their int8 rows individually
        nib_ok = ((payload16 >= -8) & (payload16 <= 7)).all(axis=1)
        p4 = (payload16 & 15).astype(jnp.int32)
        taken4 = jnp.take(p4, coded_idx, axis=0)          # (cap, 392)
        payload_nib = (taken4[:, 0::2] | (taken4[:, 1::2] << 4)) \
            .astype(jnp.uint8).reshape(PAYLOAD_CHUNKS,
                                       cap // PAYLOAD_CHUNKS, 196)

        # Assemble recon planes on device and compact dtypes: host↔device
        # transfer is the pipeline's bandwidth bottleneck (the reference's
        # hwaccel upload/download analog, hwaccel.c:15), so levels travel
        # as int16, counts as int8, recon as uint8 planes.
        def plane(blocks, bs):
            return (blocks.reshape(mb_h, mb_w, bs, bs)
                    .transpose(0, 2, 1, 3)
                    .reshape(mb_h * bs, mb_w * bs).astype(jnp.uint8))

        # single-transfer header+per-MB metadata buffer: each device_get
        # round trip costs ~20 ms over the axon tunnel, so everything the
        # entropy walker needs travels as ONE byte array (layout parsed by
        # encoder._parse_packed; sizes are static per build)
        n_intra = (sad_best > intra_thresh_for_qp(qp)).sum().astype(jnp.int32)
        mv16 = jnp.stack([mvx, mvy], 1).astype(jnp.int16)

        def _bytes(x):
            return jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(-1)

        packed_small = jnp.concatenate([
            _bytes(jnp.stack([n_intra, n_coded, overflow]).astype(jnp.int32)),
            _bytes(mv16),
            _bytes(sad_best.astype(jnp.int32)),
            _bytes(cbp_luma.astype(jnp.int8)),
            _bytes(t8_flags.astype(jnp.int8)),
            _bytes(unnz.astype(jnp.int8)),
            _bytes(vnnz.astype(jnp.int8)),
            _bytes(coded_idx.astype(
                jnp.int16 if n_mb <= 32767 else jnp.int32)),
            _bytes(nib_ok.astype(jnp.int8)),
        ])

        rec_y_p = plane(recon_y, 16)
        rec_u_p = plane(urec, 8)
        rec_v_p = plane(vrec, 8)
        extra = {}
        if deblock_fn is not None:
            kw = {"scal": dbscal} if pallas_deblock else {}
            dby, dbu, dbv = deblock_fn(
                rec_y_p, rec_u_p, rec_v_p, mv16,
                nnz.astype(jnp.int32),
                jnp.zeros((n_mb,), bool),        # all-inter assumption
                t8_flags, qp, qpc, **kw)
            extra = {"recon_y_nf": rec_y_p, "urec_nf": rec_u_p,
                     "vrec_nf": rec_v_p}
            rec_y_p, rec_u_p, rec_v_p = dby, dbu, dbv

        return {
            **extra,
            "packed_small": packed_small,
            "mv": mv16,
            "sad": sad_best.astype(jnp.int32),
            # device-side count of candidate intra-fallback MBs: when 0 (the
            # common case) the host never downloads the recon planes at all
            "n_intra": n_intra,
            "n_coded": n_coded,
            "overflow": overflow,
            "coded_idx": coded_idx.astype(jnp.int32),
            # list of chunk arrays: the host fetches only the buckets that
            # actually hold coded MBs (each is a separate jit output)
            "payload": [payload8[c] for c in range(PAYLOAD_CHUNKS)],
            "payload_nib": [payload_nib[c] for c in range(PAYLOAD_CHUNKS)],
            "luma_lv": lv.astype(jnp.int16),
            "luma_nnz": nnz.astype(jnp.int8),
            "cbp_luma": cbp_luma.astype(jnp.int8),
            "t8": t8_flags.astype(jnp.int8),
            "recon_y": rec_y_p,
            "udc": udc.astype(jnp.int16), "uac": uac.astype(jnp.int16),
            "urec": rec_u_p, "unnz": unnz.astype(jnp.int8),
            "vdc": vdc.astype(jnp.int16), "vac": vac.astype(jnp.int16),
            "vrec": rec_v_p, "vnnz": vnnz.astype(jnp.int8),
        }

    return analyze
