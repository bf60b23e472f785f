"""Tests for H.264 codec primitives: bits, transforms, CAVLC, syntax, predict.

Strategy per SURVEY.md §4: spec arithmetic is validated by encoder/decoder
round-trips and structural checks (prefix-free VLC tables), since the
reference ships no test suite of its own.
"""
import numpy as np
import pytest

from handbrake_tpu.codecs.h264 import tables
from handbrake_tpu.codecs.h264 import transform as T
from handbrake_tpu.codecs.h264.bits import (
    BitReader, BitWriter, ebsp_to_rbsp, rbsp_to_ebsp, split_annexb, nal_unit)
from handbrake_tpu.codecs.h264.cavlc import decode_residual, encode_residual
from handbrake_tpu.codecs.h264.syntax import PPS, SPS, SliceHeader, NAL_IDR


# ---------------------------------------------------------------------------
# bits
# ---------------------------------------------------------------------------
def test_expgolomb_roundtrip():
    bw = BitWriter()
    vals_ue = [0, 1, 2, 3, 7, 8, 255, 1023, 65535]
    vals_se = [0, 1, -1, 2, -2, 17, -30, 2047, -2048]
    for v in vals_ue:
        bw.ue(v)
    for v in vals_se:
        bw.se(v)
    bw.rbsp_trailing()
    br = BitReader(bw.get_rbsp())
    assert [br.ue() for _ in vals_ue] == vals_ue
    assert [br.se() for _ in vals_se] == vals_se


def test_emulation_prevention_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(50):
        raw = bytes(rng.integers(0, 4, rng.integers(1, 64)).astype(np.uint8))
        assert ebsp_to_rbsp(rbsp_to_ebsp(raw)) == raw
    # canonical cases
    assert rbsp_to_ebsp(b"\x00\x00\x00") == b"\x00\x00\x03\x00"
    assert rbsp_to_ebsp(b"\x00\x00\x01") == b"\x00\x00\x03\x01"
    assert rbsp_to_ebsp(b"\x00\x00\x04") == b"\x00\x00\x04"


def test_annexb_split():
    n1 = nal_unit(3, 7, b"\x42\x00\x1e")
    n2 = nal_unit(3, 8, b"\xab")
    nals = list(split_annexb(n1 + n2))
    assert len(nals) == 2
    assert nals[0][0] & 0x1F == 7
    assert nals[1][0] & 0x1F == 8


# ---------------------------------------------------------------------------
# transform/quant
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("qp", [0, 4, 10, 20, 26, 35, 44, 51])
def test_transform_quant_roundtrip_small_error(qp):
    """fdct→quant→dequant→idct must reconstruct within quant error bounds."""
    rng = np.random.default_rng(qp)
    d = rng.integers(-255, 256, (64, 4, 4)).astype(np.int32)
    W = T.fdct4x4(np, d)
    lv = T.quant4x4(np, W, qp, intra=True)
    dq = T.dequant4x4(np, lv, qp)
    r = T.idct4x4(np, dq)
    # quantization step for qp grows ~2^(qp/6); reconstruction error bounded
    step = 2 ** (qp / 6)
    assert np.abs(r - d).max() <= max(2, step * 1.2)


def test_transform_qp0_near_lossless():
    rng = np.random.default_rng(7)
    d = rng.integers(-200, 201, (32, 4, 4)).astype(np.int32)
    W = T.fdct4x4(np, d)
    lv = T.quant4x4(np, W, 0, intra=True)
    r = T.idct4x4(np, T.dequant4x4(np, lv, 0))
    assert np.abs(r - d).max() <= 1


def test_hadamard_involution():
    rng = np.random.default_rng(3)
    dc = rng.integers(-512, 512, (8, 4, 4)).astype(np.int32)
    out = T.ihadamard4x4(np, T.hadamard4x4(np, dc))
    assert np.array_equal(out, dc * 16)
    c = rng.integers(-512, 512, (8, 2, 2)).astype(np.int32)
    assert np.array_equal(T.hadamard2x2(np, T.hadamard2x2(np, c)), c * 4)


def test_blocks_roundtrip_and_mb_order():
    rng = np.random.default_rng(5)
    p = rng.integers(0, 256, (32, 48)).astype(np.int32)
    b = T.to_blocks4(np, p)
    assert np.array_equal(T.from_blocks4(np, b, 32, 48), p)
    order, inv = T.mb_block_order(3, 2)
    assert np.array_equal(order[inv], np.arange(len(order)))
    # First MB's coded order: quadrant 0 holds blocks (0,0),(1,0),(0,1),(1,1)
    W4 = 12
    assert list(order[:4]) == [0, 1, W4, W4 + 1]
    assert list(order[4:8]) == [2, 3, W4 + 2, W4 + 3]


def test_jax_transform_matches_numpy():
    import jax.numpy as jnp
    rng = np.random.default_rng(11)
    d = rng.integers(-255, 256, (16, 4, 4)).astype(np.int32)
    W_np = T.fdct4x4(np, d)
    W_j = np.asarray(T.fdct4x4(jnp, jnp.asarray(d)))
    assert np.array_equal(W_np, W_j)
    lv_np = T.quant4x4(np, W_np, 26, intra=False)
    lv_j = np.asarray(T.quant4x4(jnp, jnp.asarray(W_j), 26, intra=False))
    assert np.array_equal(lv_np, lv_j)
    r_np = T.idct4x4(np, T.dequant4x4(np, lv_np, 26))
    r_j = np.asarray(T.idct4x4(jnp, T.dequant4x4(jnp, jnp.asarray(lv_j), 26)))
    assert np.array_equal(r_np, r_j)


# ---------------------------------------------------------------------------
# CAVLC tables: structural prefix-free checks
# ---------------------------------------------------------------------------
def _assert_prefix_free(codes):
    seen = [(l, b) for l, b in codes]
    for i, (l1, b1) in enumerate(seen):
        for j, (l2, b2) in enumerate(seen):
            if i == j:
                continue
            if l1 <= l2 and (b2 >> (l2 - l1)) == b1:
                raise AssertionError(f"prefix violation {(l1, b1)} {(l2, b2)}")


def test_coeff_token_tables_prefix_free():
    for tbl in (tables.CT_NC0, tables.CT_NC2, tables.CT_NC4,
                tables.CT_CHROMA_DC):
        _assert_prefix_free(tbl.values())


def test_total_zeros_tables_prefix_free():
    for tc, codes in tables.TOTAL_ZEROS_4x4.items():
        assert len(codes) == 17 - tc  # total_zeros in 0..16-tc
        _assert_prefix_free(codes)
    for tc, codes in tables.TOTAL_ZEROS_CHROMA_DC.items():
        assert len(codes) == 5 - tc  # maxNumCoeff 4: 0..4-tc
        _assert_prefix_free(codes)


def test_run_before_tables_prefix_free():
    for zl, codes in tables.RUN_BEFORE.items():
        _assert_prefix_free(codes)


# ---------------------------------------------------------------------------
# CAVLC round-trip fuzz
# ---------------------------------------------------------------------------
def _roundtrip_block(coeffs, nc, max_coeff):
    bw = BitWriter()
    tc = encode_residual(bw, coeffs, nc, max_coeff)
    bw.rbsp_trailing()
    br = BitReader(bw.get_rbsp())
    out, tc2 = decode_residual(br, nc, max_coeff)
    assert tc == tc2
    assert out == list(coeffs), (coeffs, out, nc)


def test_cavlc_roundtrip_fuzz():
    rng = np.random.default_rng(42)
    for trial in range(400):
        max_coeff = [16, 15, 4][trial % 3]
        nc = -1 if max_coeff == 4 else int(rng.integers(0, 10))
        n_nz = int(rng.integers(0, max_coeff + 1))
        coeffs = [0] * max_coeff
        pos = rng.permutation(max_coeff)[:n_nz]
        for p in pos:
            v = int(rng.integers(1, 40)) * (1 if rng.random() < 0.5 else -1)
            coeffs[p] = v
        _roundtrip_block(coeffs, nc, max_coeff)


def test_cavlc_roundtrip_edge_cases():
    # all zeros
    _roundtrip_block([0] * 16, 0, 16)
    # single DC
    _roundtrip_block([5] + [0] * 15, 0, 16)
    # dense +/-1s (trailing ones logic)
    _roundtrip_block([1, -1, 1, -1] + [0] * 12, 0, 16)
    # full block
    _roundtrip_block(list(range(1, 17)), 8, 16)
    # large levels (suffix escalation)
    _roundtrip_block([900, -500, 200, 100] + [0] * 12, 0, 16)
    # chroma DC all four
    _roundtrip_block([3, -1, 1, 2], -1, 4)


# ---------------------------------------------------------------------------
# syntax round-trip
# ---------------------------------------------------------------------------
def test_sps_pps_roundtrip():
    sps = SPS(width_mbs=120, height_mbs=68, crop_bottom=8,
              vui_timing=(1, 60), level_idc=40)
    got = SPS.parse(sps.write())
    assert got.width_mbs == 120 and got.height_mbs == 68
    assert got.crop_bottom == 8
    assert got.width == 1920 and got.height == 1080
    pps = PPS(pic_init_qp=30, chroma_qp_index_offset=-2)
    got = PPS.parse(pps.write())
    assert got.pic_init_qp == 30
    assert got.chroma_qp_index_offset == -2


def test_slice_header_roundtrip():
    sps = SPS(width_mbs=8, height_mbs=6)
    pps = PPS(pic_init_qp=26)
    for st, idr, qp in [(2, True, 20), (0, False, 35), (2, False, 51)]:
        h = SliceHeader(slice_type=st, idr=idr, frame_num=3, qp=qp,
                        disable_deblocking=1)
        bw = h.write(sps, pps)
        bw.rbsp_trailing()
        got = SliceHeader.parse(BitReader(bw.get_rbsp()), sps, pps,
                                NAL_IDR if idr else 1)
        assert got.slice_type == st
        assert got.qp == qp
        assert got.frame_num == 3


# ---------------------------------------------------------------------------
# prediction sanity
# ---------------------------------------------------------------------------
def test_intra16_modes():
    from handbrake_tpu.codecs.h264 import predict as P
    top = np.arange(100, 116, dtype=np.int32)
    left = np.arange(50, 66, dtype=np.int32)
    v = P.intra16_pred(P.I16_V, top, left, 99)
    assert np.array_equal(v[0], top) and np.array_equal(v[15], top)
    h = P.intra16_pred(P.I16_H, top, left, 99)
    assert np.array_equal(h[:, 0], left)
    dc = P.intra16_pred(P.I16_DC, top, left, 99)
    assert dc[0, 0] == (top.sum() + left.sum() + 16) >> 5
    dc_none = P.intra16_pred(P.I16_DC, None, None, None)
    assert dc_none[0, 0] == 128
    pl = P.intra16_pred(P.I16_PLANE, top, left, 99)
    assert pl.shape == (16, 16)
    assert pl.min() >= 0 and pl.max() <= 255


def test_mc_integer_and_half():
    from handbrake_tpu.codecs.h264 import predict as P
    rng = np.random.default_rng(9)
    ref = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    pad = 32
    rp = P.pad_plane(ref, pad)
    # integer mv = plain copy
    out = P.mc_luma_block(rp, pad, 16, 16, 16, 16, 8, -12)
    assert np.array_equal(out, ref[13:29, 18:34])
    # half-pel positions stay in [0,255]
    for mv in [(2, 0), (0, 2), (2, 2), (1, 1), (3, 3), (1, 2), (2, 3)]:
        out = P.mc_luma_block(rp, pad, 16, 16, 16, 16, *mv)
        assert out.min() >= 0 and out.max() <= 255
    # chroma integer mv
    outc = P.mc_chroma_block(rp, pad, 8, 8, 8, 8, 16, 8)
    assert np.array_equal(outc, ref[9:17, 10:18])


def test_mc_halfpel_constant_plane():
    from handbrake_tpu.codecs.h264 import predict as P
    ref = np.full((32, 32), 77, dtype=np.uint8)
    rp = P.pad_plane(ref, 32)
    for mvx in range(4):
        for mvy in range(4):
            out = P.mc_luma_block(rp, 32, 8, 8, 8, 8, mvx, mvy)
            assert np.all(out == 77), (mvx, mvy)


def test_transform8x8_roundtrip():
    """8x8 forward/quant must be consistent with the spec integer inverse:
    re-quantizing the reconstruction reproduces the levels (scale match),
    and reconstruction error stays within ~qstep/2."""
    from handbrake_tpu.codecs.h264 import transform as T
    rng = np.random.default_rng(7)
    for qp in (20, 28, 36, 44):
        res = rng.integers(-96, 96, (40, 8, 8)).astype(np.int32)
        lv = T.fquant8x8(np, res, qp, intra=False)
        rec = T.idct8x8(np, T.dequant8x8(np, lv, qp))
        assert np.array_equal(T.fquant8x8(np, rec, qp, intra=False), lv)
        qstep = 0.625 * 2 ** (qp / 6.0)
        assert float(np.abs(rec - res).mean()) < 0.45 * qstep
    # scan is a permutation; DC class table matches Table 8-15 col 0
    assert sorted(T.ZIG8.tolist()) == list(range(64))
    assert T.V8x8[0, 0, 0] == 20 and T.V8x8[5, 0, 0] == 36


# ---------------------------------------------------------------------------
# In-loop deblocking: device wavefront + native C++ vs the Python reference
# ---------------------------------------------------------------------------
def _deblock_case(seed, mb_w, mb_h, qp, p_intra):
    rng = np.random.default_rng(seed)
    H, W = mb_h * 16, mb_w * 16
    n_mb = mb_w * mb_h
    y = rng.integers(0, 256, (H, W)).astype(np.uint8)
    u = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    # smooth half the frame so the |p0-q0|<alpha conditions trigger
    y[:H // 2] = (y[:H // 2] // 8) + 100
    u //= 2
    v //= 2
    mv = rng.integers(-20, 20, (n_mb, 2)).astype(np.int32)
    nnz = rng.integers(0, 3, (n_mb, 16)).astype(np.int32)
    nnz[rng.random((n_mb, 16)) < 0.6] = 0
    t8 = rng.random(n_mb) < 0.3
    intra = rng.random(n_mb) < p_intra
    nnz = np.where(intra[:, None], 0, nnz)
    t8 = t8 & ~intra
    return y, u, v, mv, nnz, intra, t8


def _deblock_python(y, u, v, mv, nnz, intra, t8, qp, qpc, mb_w, mb_h):
    from handbrake_tpu.codecs.h264.deblock import deblock_frame
    ry = y.astype(np.int32).copy()
    ru = u.astype(np.int32).copy()
    rv = v.astype(np.int32).copy()
    deblock_frame(ry, ru, rv, qp, qpc, intra.reshape(mb_h, mb_w),
                  mv.reshape(mb_h, mb_w, 2).copy(),
                  nnz.reshape(mb_h, mb_w, 4, 4).transpose(0, 2, 1, 3)
                  .reshape(mb_h * 4, mb_w * 4),
                  t8.reshape(mb_h, mb_w))
    return ry.astype(np.uint8), ru.astype(np.uint8), rv.astype(np.uint8)


@pytest.mark.parametrize("mb_w,mb_h,qp,p_intra",
                         [(6, 4, 30, 0.0), (5, 3, 40, 0.0),
                          (8, 2, 24, 0.0), (3, 7, 36, 0.2), (1, 1, 30, 0.3)])
def test_deblock_device_wavefront_bitexact(mb_w, mb_h, qp, p_intra):
    """deblock_tpu's slope-2 wavefront scan == the spec-order Python
    reference, bit-exact (incl. 8x8-transform nnz folding and intra bS)."""
    import jax
    import jax.numpy as jnp
    from handbrake_tpu.codecs.h264.deblock_tpu import build_deblock_fn
    qpc = max(0, qp - 3)
    y, u, v, mv, nnz, intra, t8 = _deblock_case(qp * 7 + mb_w, mb_w, mb_h,
                                                qp, p_intra)
    ry, ru, rv = _deblock_python(y, u, v, mv, nnz, intra, t8, qp, qpc,
                                 mb_w, mb_h)
    fn = jax.jit(build_deblock_fn(mb_w, mb_h))
    dy, du, dv = fn(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                    jnp.asarray(mv), jnp.asarray(nnz), jnp.asarray(intra),
                    jnp.asarray(t8), qp, qpc)
    assert np.array_equal(np.asarray(dy), ry)
    assert np.array_equal(np.asarray(du), ru)
    assert np.array_equal(np.asarray(dv), rv)


@pytest.mark.parametrize("mb_w,mb_h,qp,p_intra",
                         [(6, 4, 30, 0.0), (4, 3, 38, 0.25),
                          (7, 5, 26, 0.5)])
def test_deblock_native_bitexact(mb_w, mb_h, qp, p_intra):
    """native hb264_deblock == the Python reference (the host re-filter
    path for intra-fallback frames and the host walker's loop filter)."""
    import ctypes
    from handbrake_tpu.native import get_lib
    lib = get_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    qpc = max(0, qp - 2)
    y, u, v, mv, nnz, intra, t8 = _deblock_case(qp + mb_h, mb_w, mb_h,
                                                qp, p_intra)
    ry, ru, rv = _deblock_python(y, u, v, mv, nnz, intra, t8, qp, qpc,
                                 mb_w, mb_h)
    ny, nu, nv = (np.ascontiguousarray(p) for p in (y, u, v))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i8p = ctypes.POINTER(ctypes.c_int8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    grid = (nnz.reshape(mb_h, mb_w, 4, 4).transpose(0, 2, 1, 3)
            .reshape(-1) != 0).astype(np.int8)
    im = intra.astype(np.int8)
    t8a = t8.astype(np.int8)
    mv32 = np.ascontiguousarray(mv.ravel(), np.int32)
    lib.hb264_deblock(ny.ctypes.data_as(u8p), nu.ctypes.data_as(u8p),
                      nv.ctypes.data_as(u8p), mb_w, mb_h, qp, qpc,
                      im.ctypes.data_as(i8p), mv32.ctypes.data_as(i32p),
                      grid.ctypes.data_as(i8p), t8a.ctypes.data_as(i8p))
    assert np.array_equal(ny, ry)
    assert np.array_equal(nu, ru)
    assert np.array_equal(nv, rv)
