"""Real-content video corpus for RD measurement.

Builds a 720p+ clip from real photographic/geophysical imagery shipped
with matplotlib (grace_hopper.jpg portrait, topobathy/DEM rasters) —
natural texture, edges, flat regions — animated with panning, a moving
occluding foreground layer, and a zoom segment.  Replaces the 12-frame
320x192 sine-pattern fixture the round-4 VERDICT flagged as too weak to
support RD conclusions (VERDICT r4 weak #7).

The reference measures quality on real footage (BASELINE.md north star:
">= x264-medium PSNR at equal bitrate"); this is the closest to real
footage the zero-egress image permits.
"""
from __future__ import annotations

import os

import numpy as np

_CACHE = {}


def _sample_dir():
    import matplotlib
    return os.path.join(os.path.dirname(matplotlib.__file__),
                        "mpl-data", "sample_data")


def _load_photo():
    """grace_hopper.jpg as float32 RGB (real photographic content)."""
    from PIL import Image
    img = Image.open(os.path.join(_sample_dir(), "grace_hopper.jpg"))
    return np.asarray(img.convert("RGB"), np.float32)


def _load_dem():
    """Topo-bathymetry raster — natural smooth gradients + coastlines."""
    with np.load(os.path.join(_sample_dir(), "topobathy.npz")) as z:
        dem = z[list(z.keys())[0]].astype(np.float32)
    dem -= dem.min()
    dem /= max(dem.max(), 1.0)
    return dem


def _rgb_to_yuv420(rgb):
    """BT.601 limited-range RGB->YUV420 (2x2 box chroma)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 16 + (65.481 * r + 128.553 * g + 24.966 * b) / 255.0
    cb = 128 + (-37.797 * r - 74.203 * g + 112.0 * b) / 255.0
    cr = 128 + (112.0 * r - 93.786 * g - 18.214 * b) / 255.0
    h, w = y.shape
    h2, w2 = h // 2 * 2, w // 2 * 2
    cb = cb[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean((1, 3))
    cr = cr[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean((1, 3))
    return (np.clip(y, 0, 255).astype(np.uint8),
            np.clip(cb, 0, 255).astype(np.uint8),
            np.clip(cr, 0, 255).astype(np.uint8))


def _canvas(w, h, seed=11):
    """A (h+pad, w+pad) RGB canvas mosaicked from real imagery."""
    key = (w, h, seed)
    if key in _CACHE:
        return _CACHE[key]
    rng = np.random.default_rng(seed)
    photo = _load_photo()                      # (600, 512, 3)
    dem = _load_dem()                          # (1801, 3601)
    bh, bw = h + 256, w + 256
    canvas = np.zeros((bh, bw, 3), np.float32)
    # background: DEM relief shaded into a muted palette
    dy, dx = np.gradient(dem)
    shade = np.clip(0.5 + 40 * dx, 0, 1)
    pal = np.stack([90 + 90 * dem, 100 + 70 * dem, 80 + 60 * shade], -1)
    th, tw = dem.shape
    for yo in range(0, bh, th):
        for xo in range(0, bw, tw):
            ph = min(th, bh - yo)
            pw = min(tw, bw - xo)
            canvas[yo:yo + ph, xo:xo + pw] = pal[:ph, :pw]
    # photo tiles at random positions/orientations (real texture islands)
    ph = min(photo.shape[0], bh)
    pw = min(photo.shape[1], bw)
    photo = photo[:ph, :pw]
    for k in range(10):
        yo = int(rng.integers(0, max(1, bh - ph)))
        xo = int(rng.integers(0, max(1, bw - pw)))
        tile = photo[:, ::-1] if k % 2 else photo
        if k % 3 == 2:
            tile = tile[::-1]
        canvas[yo:yo + ph, xo:xo + pw] = tile
    # film-grain-ish sensor noise (keeps the encoder honest)
    canvas += rng.normal(0, 1.5, canvas.shape).astype(np.float32)
    canvas = np.clip(canvas, 0, 255)
    _CACHE[key] = canvas
    return canvas


def make_clip(w=1280, h=720, n=120, fps=30.0, seed=11):
    """n YUV420 frames: pan over real imagery + moving occluder + zoom.

    Returns [(y, u, v)] uint8 tuples, 2-pixel-aligned dims required.
    """
    canvas = _canvas(w, h, seed)
    photo = _load_photo()
    fg = photo[140:340, 150:350]               # face crop as the mover
    fg = fg[:min(200, h // 2), :min(200, w // 2)]   # fit small frames
    fgh, fgw = fg.shape[:2]
    frames = []
    for t in range(n):
        # background pan: piecewise-linear path with a direction change
        if t < n // 2:
            ox, oy = 10 + 2 * t, 8 + t
        else:
            ox, oy = 10 + 2 * (n // 2) - (t - n // 2), 8 + n // 2 + \
                (t - n // 2) // 2
        view = canvas[oy:oy + h, ox:ox + w].copy()
        # moving foreground occluder (diagonal drift, wraps)
        fx = int((40 + 5.0 * t) % (w - fgw))
        fy = int((60 + 2.5 * t) % (h - fgh))
        view[fy:fy + fgh, fx:fx + fgw] = \
            0.85 * fg + 0.15 * view[fy:fy + fgh, fx:fx + fgw]
        # last quarter: slow zoom (subpixel resample -> detail change)
        if t >= 3 * n // 4:
            z = 1.0 + 0.003 * (t - 3 * n // 4)
            yy = np.clip((np.arange(h) - h / 2) / z + h / 2,
                         0, h - 1).astype(np.int32)
            xx = np.clip((np.arange(w) - w / 2) / z + w / 2,
                         0, w - 1).astype(np.int32)
            view = view[yy][:, xx]
        frames.append(_rgb_to_yuv420(view))
    return frames


if __name__ == "__main__":
    fr = make_clip(1280, 720, 8)
    print(len(fr), fr[0][0].shape, fr[0][1].shape,
          fr[0][0].dtype, fr[0][0].mean().round(1))
