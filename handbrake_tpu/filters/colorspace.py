"""Colorspace conversion + HDR tonemap (reference: colorspace.c → zscale).

Pipeline per frame (the zimg model): YUV → RGB (source matrix/range) →
linearize (source transfer) → primaries 3x3 → [tonemap for HDR→SDR] →
encode transfer → RGB → YUV (target matrix/range). All float32 on device;
the 3x3s and transfer curves are jnp expressions XLA fuses into one pass.

Settings: primaries, transfer, matrix, range (targets), tonemap
(hable|reinhard|mobius|linear|clip), npl (nominal peak luminance), desat.
The npl/desat derivation from mastering metadata follows colorspace.c:36-185.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..core.buffer import Buffer
from .base import Filter, FilterInit, register
from .kernels import maxval_of, resample_matrix
from ..job import schema as S


# Rec. matrices: Kr/Kb per standard
_KRKB = {
    "bt601": (0.299, 0.114),
    "smpte170m": (0.299, 0.114),
    "bt709": (0.2126, 0.0722),
    "bt2020": (0.2627, 0.0593),
    "bt2020nc": (0.2627, 0.0593),
}

# CIE xy primaries + white point per standard
_PRIMARIES = {
    "bt709": ((0.640, 0.330), (0.300, 0.600), (0.150, 0.060)),
    "bt601": ((0.630, 0.340), (0.310, 0.595), (0.155, 0.070)),
    "smpte170m": ((0.630, 0.340), (0.310, 0.595), (0.155, 0.070)),
    "bt2020": ((0.708, 0.292), (0.170, 0.797), (0.131, 0.046)),
    "p3": ((0.680, 0.320), (0.265, 0.690), (0.150, 0.060)),
}
_D65 = (0.3127, 0.3290)


def rgb_to_yuv_matrix(matrix: str) -> np.ndarray:
    kr, kb = _KRKB[matrix]
    kg = 1.0 - kr - kb
    return np.array([
        [kr, kg, kb],
        [-0.5 * kr / (1 - kb), -0.5 * kg / (1 - kb), 0.5],
        [0.5, -0.5 * kg / (1 - kr), -0.5 * kb / (1 - kr)],
    ], np.float64)


def _rgb_to_xyz(prim) -> np.ndarray:
    (rx, ry), (gx, gy), (bx, by) = prim
    wx, wy = _D65
    m = np.array([[rx / ry, gx / gy, bx / by],
                  [1, 1, 1],
                  [(1 - rx - ry) / ry, (1 - gx - gy) / gy,
                   (1 - bx - by) / by]], np.float64)
    w = np.array([wx / wy, 1.0, (1 - wx - wy) / wy])
    s = np.linalg.solve(m, w)
    return m * s


def primaries_matrix(src: str, dst: str) -> np.ndarray:
    """RGB(src primaries) → RGB(dst primaries), via XYZ (D65 both)."""
    a = _rgb_to_xyz(_PRIMARIES[src])
    b = _rgb_to_xyz(_PRIMARIES[dst])
    return np.linalg.solve(b, a)


# --- transfer curves (normalized 0..1 signal; linear scaled so SDR peak=1) --
def _srgb_ish_gamma(x, inv):  # bt709/601 OETF ≈ gamma 1/0.45 w/ linear toe
    a = 1.09929682680944
    b = 0.018053968510807
    if inv:  # EOTF: signal → linear
        return jnp.where(x < 4.5 * b, x / 4.5,
                         jnp.power((x + (a - 1)) / a, 1 / 0.45))
    return jnp.where(x < b, 4.5 * x,
                     a * jnp.power(x, 0.45) - (a - 1))


_PQ_M1, _PQ_M2 = 2610 / 16384, 2523 / 4096 * 128
_PQ_C1, _PQ_C2, _PQ_C3 = 3424 / 4096, 2413 / 4096 * 32, 2392 / 4096 * 32


def _pq(x, inv, ref_white=203.0):
    if inv:  # signal → linear (1.0 = ref_white nits)
        xp = jnp.power(jnp.maximum(x, 0.0), 1 / _PQ_M2)
        num = jnp.maximum(xp - _PQ_C1, 0.0)
        lin = jnp.power(num / (_PQ_C2 - _PQ_C3 * xp), 1 / _PQ_M1)
        return lin * (10000.0 / ref_white)
    y = jnp.maximum(x, 0.0) * (ref_white / 10000.0)
    yp = jnp.power(y, _PQ_M1)
    return jnp.power((_PQ_C1 + _PQ_C2 * yp) / (1 + _PQ_C3 * yp), _PQ_M2)


def _hlg(x, inv):
    a, b, c = 0.17883277, 0.28466892, 0.55991073
    if inv:
        lin = jnp.where(x <= 0.5, (x * x) / 3.0,
                        (jnp.exp((x - c) / a) + b) / 12.0)
        return lin * 12.0  # scene-linear, peak 12x SDR white
    y = x / 12.0
    return jnp.where(y <= 1 / 12, jnp.sqrt(3 * y),
                     a * jnp.log(12 * y - b) + c)


def transfer(x, name: str, inv: bool):
    if name in ("bt709", "bt601", "smpte170m"):
        return _srgb_ish_gamma(x, inv)
    if name in ("smpte2084", "pq"):
        return _pq(x, inv)
    if name in ("arib-std-b67", "hlg"):
        return _hlg(x, inv)
    if name == "linear":
        return x
    raise ValueError(f"unknown transfer {name!r}")


# --- tonemap operators (zscale's set, on max-RGB) ---------------------------
def tonemap(lin, method: str, peak: float, desat: float):
    """lin: linear RGB (..., 3) with 1.0 = SDR white; peak in same units."""
    if method in ("none", "clip") or peak <= 1.0:
        return jnp.clip(lin, 0.0, 1.0)
    sig = jnp.maximum(jnp.max(lin, axis=-1, keepdims=True), 1e-6)
    if method == "reinhard":
        offset = (1.0 - 0.5) / 0.5
        mapped = sig / (sig + offset) * (peak + offset) / peak
    elif method == "mobius":
        j = 0.3
        a = -j * j * (peak - 1.0) / (j * j - 2.0 * j + peak)
        b = (j * j - 2.0 * j * peak + peak) / jnp.maximum(
            peak - 1.0, 1e-6)
        mapped = jnp.where(sig <= j, sig,
                           (b * b + 2.0 * b * j + j * j)
                           / (b * b + 2.0 * b * peak + peak)
                           * (sig + a) / (sig + b))
        mapped = mapped / sig * jnp.where(sig <= j, sig, 1.0)
        mapped = jnp.where(sig <= j, sig, mapped * sig) / sig
    else:  # hable (filmic) — zscale default for HDR→SDR
        def h(v):
            A, B, C, D, E, F = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
            return ((v * (A * v + C * B) + D * E)
                    / (v * (A * v + B) + D * F)) - E / F
        mapped = h(sig) / h(jnp.asarray(peak))
    ratio = mapped / sig
    out = lin * ratio
    if desat > 0:
        luma = jnp.max(out, axis=-1, keepdims=True)
        coeff = jnp.clip((sig - 1.0) / jnp.maximum(sig, 1e-6), 0.0, 1.0) \
            * desat
        out = out * (1 - coeff) + luma * coeff
    return jnp.clip(out, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=(
    "src_matrix", "dst_matrix", "src_transfer", "dst_transfer",
    "src_prim", "dst_prim", "src_full", "dst_full", "src_depth",
    "dst_depth", "tm_method", "peak", "desat"))
def convert_frame(y, u, v, *, src_matrix, dst_matrix, src_transfer,
                  dst_transfer, src_prim, dst_prim, src_full, dst_full,
                  src_depth, dst_depth, tm_method, peak, desat):
    """Full-res (H, W) planes in/out (chroma must be upsampled by caller)."""
    smax = (1 << src_depth) - 1
    yf = y.astype(jnp.float32)
    uf = u.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if src_full:
        yn = yf / smax
        cn_u = uf / smax - 0.5
        cn_v = vf / smax - 0.5
    else:
        d = 1 << (src_depth - 8)
        yn = (yf - 16 * d) / (219 * d)
        cn_u = (uf - 128 * d) / (224 * d)
        cn_v = (vf - 128 * d) / (224 * d)
    yuv = jnp.stack([yn, cn_u, cn_v], -1)
    m_in = jnp.asarray(np.linalg.inv(rgb_to_yuv_matrix(src_matrix))
                       .astype(np.float32))
    rgb = jnp.einsum("hwc,rc->hwr", yuv, m_in)
    rgb = jnp.clip(rgb, 0.0, 1.0)
    lin = transfer(rgb, src_transfer, inv=True)
    if src_prim != dst_prim:
        pm = jnp.asarray(primaries_matrix(src_prim, dst_prim)
                         .astype(np.float32))
        lin = jnp.einsum("hwr,sr->hws", lin, pm)
    lin = tonemap(lin, tm_method, peak, desat)
    rgb2 = transfer(jnp.clip(lin, 0.0, 1.0), dst_transfer, inv=False)
    m_out = jnp.asarray(rgb_to_yuv_matrix(dst_matrix).astype(np.float32))
    yuv2 = jnp.einsum("hwr,cr->hwc", rgb2, m_out)
    dmax = (1 << dst_depth) - 1
    if dst_full:
        yo = yuv2[..., 0] * dmax
        uo = (yuv2[..., 1] + 0.5) * dmax
        vo = (yuv2[..., 2] + 0.5) * dmax
    else:
        d = 1 << (dst_depth - 8)
        yo = yuv2[..., 0] * (219 * d) + 16 * d
        uo = yuv2[..., 1] * (224 * d) + 128 * d
        vo = yuv2[..., 2] * (224 * d) + 128 * d
    dt = jnp.uint8 if dst_depth <= 8 else jnp.uint16
    out = [jnp.clip(jnp.round(p), 0, dmax).astype(dt) for p in (yo, uo, vo)]
    return out[0], out[1], out[2]


@register
class ColorspaceFilter(Filter):
    id = S.FILTER_COLORSPACE
    name = "colorspace"

    def init(self, fi: FilterInit) -> FilterInit:
        s = self.settings
        self.dst_prim = s.get("primaries", fi.color_prim)
        self.dst_transfer = s.get("transfer", fi.color_transfer)
        self.dst_matrix = s.get("matrix", fi.color_matrix)
        self.dst_range = s.get("range", fi.color_range)
        self.tm = s.get("tonemap", "hable")
        # colorspace.c:36-185: npl from mastering metadata else 10k/1k nits
        self.npl = float(s.get("npl", 0)) or None
        self.desat = float(s.get("desat", 0.5))
        self.src = fi.copy()
        self.fi = fi.copy()
        self.fi.color_prim = self.dst_prim
        self.fi.color_transfer = self.dst_transfer
        self.fi.color_matrix = self.dst_matrix
        self.fi.color_range = self.dst_range
        return self.fi

    def work(self, buf: Buffer) -> list:
        if buf.is_eof() or buf.planes is None:
            return [buf]
        fmt = buf.pix_fmt
        src = self.src
        if (src.color_prim == self.dst_prim
                and src.color_transfer == self.dst_transfer
                and src.color_matrix == self.dst_matrix
                and src.color_range == self.dst_range):
            return [buf]
        h, w = buf.planes[0].shape
        sw, sh = fmt.subsampling
        mx = maxval_of(fmt)
        # chroma to 4:4:4 (bilinear, siting-aware)
        csh = -0.25 if sw == 2 else 0.0
        ups = []
        for p in buf.planes[1:]:
            avh = jnp.asarray(resample_matrix(p.shape[0], h, "bilinear"))
            awh = jnp.asarray(resample_matrix(p.shape[1], w, "bilinear",
                                              shift_in=csh))
            x = jnp.einsum("oh,hw->ow", avh, jnp.asarray(p, jnp.float32))
            ups.append(jnp.einsum("ow,cw->oc", x, awh))
        npl = self.npl
        if npl is None:
            md = buf.side_data.get("mastering")
            npl = float(md.get("max_luminance", 1000.0)) if md else (
                1000.0 if src.color_transfer in ("smpte2084", "pq",
                                                 "arib-std-b67", "hlg")
                else 100.0)
        peak = max(npl / 203.0, 1.0)
        yo, uo, vo = convert_frame(
            jnp.asarray(buf.planes[0]), ups[0], ups[1],
            src_matrix=src.color_matrix, dst_matrix=self.dst_matrix,
            src_transfer=src.color_transfer, dst_transfer=self.dst_transfer,
            src_prim=src.color_prim, dst_prim=self.dst_prim,
            src_full=(src.color_range == "full"),
            dst_full=(self.dst_range == "full"),
            src_depth=fmt.bit_depth, dst_depth=fmt.bit_depth,
            tm_method=self.tm, peak=float(peak), desat=self.desat)
        # back to subsampled chroma
        planes = [yo]
        ch, cw = (h + sh - 1) // sh, (w + sw - 1) // sw
        for p in (uo, vo):
            avd = jnp.asarray(resample_matrix(h, ch, "bilinear"))
            awd = jnp.asarray(resample_matrix(w, cw, "bilinear",
                                              shift_out=csh))
            x = jnp.einsum("oh,hw->ow", avd, p.astype(jnp.float32))
            x = jnp.einsum("ow,cw->oc", x, awd)
            planes.append(jnp.clip(jnp.round(x), 0, mx).astype(yo.dtype))
        out = Buffer(planes=planes, pix_fmt=fmt).copy_props(buf)
        return [out]
