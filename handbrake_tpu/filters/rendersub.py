"""Subtitle burn-in (reference: rendersub.c + blend.c).

Blends RGBA subtitle bitmaps (from the subtitle decoders) onto YUV frames:
premultiplied alpha blend on device, chroma blended at subsampled
resolution (hb_blend object analog, internal.h:485). SSA/libass text
rendering is a host rasterizer milestone; bitmap (PGS/VOBSUB/SRT-rendered)
events are handled here.

Subtitle events arrive as Buffers with track_kind == "subtitle", an RGBA
array in planes[0] (H, W, 4) and a position in .rect; they are queued by
pts and blended onto every video frame whose pts falls in [pts, stop).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..core.buffer import Buffer
from .base import Filter, FilterInit, register
from .colorspace import rgb_to_yuv_matrix
from ..job import schema as S


@functools.partial(jax.jit, static_argnames=("x0", "y0", "sw", "sh",
                                             "maxval"))
def blend_rgba(y, u, v, rgba, x0: int, y0: int, sw: int, sh: int,
               maxval: int = 255):
    """Alpha-blend an RGBA patch at (x0, y0) onto planar YUV."""
    rgbaf = rgba.astype(jnp.float32)
    a = rgbaf[..., 3:4] / 255.0
    m = jnp.asarray(rgb_to_yuv_matrix("bt709").astype(np.float32))
    yuv = jnp.einsum("hwc,rc->hwr", rgbaf[..., :3] / 255.0, m)
    scale = maxval
    sy = yuv[..., 0] * scale
    suv = (yuv[..., 1:] + 0.5) * scale
    ph, pw = rgba.shape[0], rgba.shape[1]

    ypatch = y[y0:y0 + ph, x0:x0 + pw].astype(jnp.float32)
    yb = ypatch * (1 - a[..., 0]) + sy * a[..., 0]
    y = y.at[y0:y0 + ph, x0:x0 + pw].set(
        jnp.clip(jnp.round(yb), 0, maxval).astype(y.dtype))

    # chroma at subsampled res: average alpha/color over sw x sh sites
    ch, cw = ph // sh, pw // sw
    if ch > 0 and cw > 0:
        asub = a[:ch * sh, :cw * sw, 0].reshape(ch, sh, cw, sw).mean((1, 3))
        usub = suv[:ch * sh, :cw * sw, 0].reshape(ch, sh, cw, sw) \
            .mean((1, 3))
        vsub = suv[:ch * sh, :cw * sw, 1].reshape(ch, sh, cw, sw) \
            .mean((1, 3))
        cy0, cx0 = y0 // sh, x0 // sw
        for plane, sub in ((0, usub), (1, vsub)):
            tgt = (u, v)[plane]
            patch = tgt[cy0:cy0 + ch, cx0:cx0 + cw].astype(jnp.float32)
            bl = patch * (1 - asub) + sub * asub
            tgt = tgt.at[cy0:cy0 + ch, cx0:cx0 + cw].set(
                jnp.clip(jnp.round(bl), 0, maxval).astype(tgt.dtype))
            if plane == 0:
                u = tgt
            else:
                v = tgt
    return y, u, v


@register
class RenderSubFilter(Filter):
    id = S.FILTER_RENDER_SUB
    name = "render_sub"

    def init(self, fi: FilterInit) -> FilterInit:
        self.events: list = []
        self.maxval = (1 << fi.pix_fmt.bit_depth) - 1
        self.fi = fi.copy()
        return self.fi

    def queue_subtitle(self, sub: Buffer):
        """Feed one subtitle event (RGBA bitmap + rect + pts/stop), or a
        clear marker (sub_clear=True): bitmap formats like PGS replace
        the whole screen per display set — a marker retires every event
        older than its pts."""
        if getattr(sub, "sub_clear", False):
            cut = sub.pts if sub.pts is not None else 0
            for e in self.events:
                if e.stop is None and (e.pts or 0) < cut:
                    e.stop = cut
            self.events = [e for e in self.events
                           if e.stop is None or e.stop > cut]
            return
        self.events.append(sub)

    def work(self, buf: Buffer) -> list:
        if buf.is_eof() or buf.planes is None:
            return [buf]
        if buf.track_kind == "subtitle":
            self.queue_subtitle(buf)
            return []
        pts = buf.pts if buf.pts is not None else 0
        self.events = [e for e in self.events
                       if e.stop is None or e.stop > pts]
        active = [e for e in self.events
                  if (e.pts or 0) <= pts]
        if not active:
            return [buf]
        sw, sh = buf.pix_fmt.subsampling
        y, u, v = (jnp.asarray(p) for p in buf.planes[:3])
        for e in active:
            x0, y0 = (e.rect[0], e.rect[1]) if e.rect else (0, 0)
            rgba = jnp.asarray(e.planes[0])
            ph, pw = rgba.shape[0], rgba.shape[1]
            x0 = max(0, min(x0, y.shape[1] - pw))
            y0 = max(0, min(y0, y.shape[0] - ph))
            y, u, v = blend_rgba(y, u, v, rgba, x0=int(x0), y0=int(y0),
                                 sw=sw, sh=sh, maxval=self.maxval)
        out = Buffer(planes=[y, u, v],
                     pix_fmt=buf.pix_fmt).copy_props(buf)
        return [out]
