"""HQDN3D denoise (reference: denoise.c, avfilter alias of FFmpeg hqdn3d).

Classic 3-pass IIR denoiser: horizontal low-pass, vertical low-pass,
temporal low-pass against the stored filtered previous frame. The low-pass
is the published hqdn3d curve out = cur + simil^gamma * (prev - cur) with
gamma = ln(0.25)/ln(1 - strength/255*0.98) — computed in float32 on the VPU
instead of the reference's int16 LUT (differences < 1 LSB).

The spatial recurrences are true IIRs → jax.lax.scan over the scanned axis
with a whole row/column as the carried state (vectorized across the other
axis, so each scan step is a (H,)- or (W,)-wide VPU op).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..core.buffer import Buffer
from .base import Filter, FilterInit, register
from ..job import schema as S


def _gamma(strength: float) -> float:
    if strength <= 0:
        return 0.0
    s = min(strength, 252.0)
    return math.log(0.25) / math.log(1.0 - s / 255.0 * 0.98 - 1e-5)


def _lowpass(prev, cur, gamma):
    d = prev - cur
    simil = jnp.maximum(0.0, 1.0 - jnp.abs(d) / 255.0)
    return cur + jnp.power(simil, gamma) * d


@functools.partial(jax.jit, static_argnames=("g_sp", "g_tmp", "maxval"))
def hqdn3d_plane(cur, frame_ant, g_sp: float, g_tmp: float,
                 maxval: int = 255):
    """cur: (H, W) uint; frame_ant: (H, W) float32 filtered previous (or cur
    on the first frame). Returns (out_plane, new_frame_ant)."""
    x = cur.astype(jnp.float32) * (255.0 / maxval)
    if g_sp > 0.0:
        def hstep(carry, col):
            f = _lowpass(carry, col, g_sp)
            return f, f
        _, cols = jax.lax.scan(hstep, x[:, 0], x.T[1:])
        x = jnp.concatenate([x[:, :1], cols.T], axis=1)
        def vstep(carry, row):
            f = _lowpass(carry, row, g_sp)
            return f, f
        _, rows = jax.lax.scan(vstep, x[0], x[1:])
        x = jnp.concatenate([x[:1], rows], axis=0)
    if g_tmp > 0.0:
        x = _lowpass(frame_ant, x, g_tmp)
    out = jnp.clip(jnp.round(x * (maxval / 255.0)), 0, maxval)
    return out.astype(cur.dtype), x


@register
class DenoiseFilter(Filter):
    id = S.FILTER_DENOISE
    name = "hqdn3d"

    def init(self, fi: FilterInit) -> FilterInit:
        s = self.settings
        ys = float(s.get("y_spatial", 4.0))
        cs = float(s.get("cb_spatial", 0.75 * ys))
        crs = float(s.get("cr_spatial", cs))
        yt = float(s.get("y_temporal", 6.0 * ys / 4.0))
        ct = float(s.get("cb_temporal", yt * cs / max(ys, 1e-9)))
        crt = float(s.get("cr_temporal", ct))
        self.g_sp = [_gamma(v) for v in (ys, cs, crs)]
        self.g_tmp = [_gamma(v) for v in (yt, ct, crt)]
        self.ant = [None, None, None]
        self.maxval = (1 << fi.pix_fmt.bit_depth) - 1
        self.fi = fi.copy()
        return self.fi

    def work(self, buf: Buffer) -> list:
        if buf.is_eof() or buf.planes is None:
            return [buf]
        planes = []
        for i, p in enumerate(buf.planes):
            pj = jnp.asarray(p)
            ant = self.ant[i]
            if ant is None:
                ant = pj.astype(jnp.float32) * (255.0 / self.maxval)
            out, self.ant[i] = hqdn3d_plane(
                pj, ant, g_sp=self.g_sp[i], g_tmp=self.g_tmp[i],
                maxval=self.maxval)
            planes.append(out)
        return [Buffer(planes=planes, pix_fmt=buf.pix_fmt).copy_props(buf)]
