"""Filter suite tests: negotiation, shapes, and behavioral invariants."""
import numpy as np
import pytest
from fractions import Fraction

from handbrake_tpu.core.buffer import (Buffer, BufFlags, Geometry, YUV420P,
                                       YUV420P10, CLOCK)
from handbrake_tpu.filters import FilterGraph, FilterInit, create_filter
from handbrake_tpu.job import schema as S


def make_frame(w, h, rng, pts=0, dur=3003, fmt=YUV420P):
    mx = (1 << fmt.bit_depth) - 1
    planes = [rng.integers(0, mx + 1, (h, w)).astype(fmt.dtype),
              rng.integers(0, mx + 1, (h // 2, w // 2)).astype(fmt.dtype),
              rng.integers(0, mx + 1, (h // 2, w // 2)).astype(fmt.dtype)]
    return Buffer(planes=planes, pix_fmt=fmt, pts=pts, duration=dur,
                  stop=pts + dur)


def fi_for(w, h, fmt=YUV420P):
    return FilterInit(geometry=Geometry(w, h), pix_fmt=fmt)


def run_filter(fid, settings, frames):
    f = create_filter(fid, settings)
    f.init(fi_for(frames[0].width, frames[0].height, frames[0].pix_fmt))
    out = []
    for fr in frames:
        out.extend(f.work(fr))
    out.extend(f.flush())
    return f, out


# -- crop/scale ---------------------------------------------------------------
def test_cropscale_geometry(rng):
    f = create_filter(S.FILTER_CROP_SCALE,
                      {"width": 640, "height": 360, "crop-top": 8,
                       "crop-bottom": 8, "crop-left": 16, "crop-right": 16})
    fo = f.init(fi_for(1280, 720))
    assert (fo.geometry.width, fo.geometry.height) == (640, 360)
    out = f.work(make_frame(1280, 720, rng))
    assert len(out) == 1
    assert np.asarray(out[0].planes[0]).shape == (360, 640)
    assert np.asarray(out[0].planes[1]).shape == (180, 320)


def test_scale_constant_plane_preserved(rng):
    # a constant image must stay constant through any resampler
    buf = make_frame(320, 240, rng)
    buf.planes = [np.full_like(np.asarray(p), 100) for p in buf.planes]
    _, out = run_filter(S.FILTER_CROP_SCALE, {"width": 200, "height": 150},
                        [buf])
    for p in out[0].planes:
        assert np.all(np.abs(np.asarray(p).astype(int) - 100) <= 1)


def test_scale_identity_is_exact(rng):
    buf = make_frame(320, 240, rng)
    src = [np.asarray(p).copy() for p in buf.planes]
    _, out = run_filter(S.FILTER_CROP_SCALE, {"width": 320, "height": 240},
                        [buf])
    for a, b in zip(out[0].planes, src):
        np.testing.assert_array_equal(np.asarray(a), b)


# -- colorspace ---------------------------------------------------------------
def test_colorspace_noop_passthrough(rng):
    buf = make_frame(64, 64, rng)
    _, out = run_filter(S.FILTER_COLORSPACE, {"matrix": "bt709"}, [buf])
    np.testing.assert_array_equal(np.asarray(out[0].planes[0]),
                                  np.asarray(buf.planes[0]))


def test_colorspace_601_to_709_roundtrip_close(rng):
    # smooth in-gamut content (RGB gradients → bt601 YUV on the host)
    h, w = 64, 64
    from handbrake_tpu.filters.colorspace import rgb_to_yuv_matrix
    r = np.add.outer(np.linspace(0.2, 0.8, h), np.zeros(w))
    g = np.add.outer(np.zeros(h), np.linspace(0.3, 0.7, w))
    b = np.full((h, w), 0.5)
    m = rgb_to_yuv_matrix("bt601")
    yuv = np.einsum("hwc,rc->hwr", np.stack([r, g, b], -1), m)
    y = np.clip(np.round(yuv[..., 0] * 219 + 16), 0, 255).astype(np.uint8)
    u = np.clip(np.round((yuv[..., 1] + 0.5) * 224 + 16 - 112 + 128 - 128),
                0, 255)
    u = np.clip(np.round(yuv[..., 1] * 224 + 128), 0, 255).astype(np.uint8)
    v = np.clip(np.round(yuv[..., 2] * 224 + 128), 0, 255).astype(np.uint8)
    buf = Buffer(planes=[y, u[::2, ::2].copy(), v[::2, ::2].copy()],
                 pix_fmt=YUV420P)
    f1 = create_filter(S.FILTER_COLORSPACE, {"matrix": "bt709"})
    fi = fi_for(64, 64)
    fi.color_matrix = "bt601"
    f1.init(fi)
    mid = f1.work(buf)[0]
    f2 = create_filter(S.FILTER_COLORSPACE, {"matrix": "bt601"})
    fi2 = fi_for(64, 64)
    fi2.color_matrix = "bt709"
    f2.init(fi2)
    back = f2.work(mid)[0]
    dy = np.abs(np.asarray(back.planes[0]).astype(int)
                - np.asarray(buf.planes[0]).astype(int))
    assert np.median(dy) <= 2


def test_colorspace_gray_matrix_only(rng):
    # neutral gray (chroma=128) must stay neutral through matrix conversion
    buf = make_frame(32, 32, rng)
    buf.planes[0][:] = 120
    buf.planes[1][:] = 128
    buf.planes[2][:] = 128
    f = create_filter(S.FILTER_COLORSPACE, {"matrix": "bt2020"})
    fi = fi_for(32, 32)
    fi.color_matrix = "bt709"
    f.init(fi)
    out = f.work(buf)[0]
    assert abs(int(np.asarray(out.planes[0])[16, 16]) - 120) <= 1
    assert abs(int(np.asarray(out.planes[1])[8, 8]) - 128) <= 1


# -- deinterlace --------------------------------------------------------------
def _interlaced_pair(w, h, rng):
    """Two fields from a moving gradient → visible combing when woven."""
    base = (np.add.outer(np.arange(h), np.arange(w)) % 200).astype(np.uint8)
    woven = base.copy()
    woven[1::2] = np.roll(base, 8, axis=1)[1::2]  # bottom field displaced
    return woven


def test_yadif_reduces_combing(rng):
    frames = []
    for i in range(3):
        y = _interlaced_pair(64, 64, rng)
        b = Buffer(planes=[y, np.full((32, 32), 128, np.uint8),
                           np.full((32, 32), 128, np.uint8)],
                   pix_fmt=YUV420P, pts=i * 3003, duration=3003)
        b.flags |= BufFlags.INTERLACED | BufFlags.TOP_FIRST
        frames.append(b)
    _, out = run_filter(S.FILTER_YADIF, {"mode": 3}, frames)
    assert len(out) == 3

    def comb(yp):
        a = yp.astype(int)
        return np.abs(a[:-2] - 2 * a[1:-1] + a[2:]).mean()
    assert comb(np.asarray(out[1].planes[0])) < comb(frames[0].planes[0]) / 2


def test_yadif_bob_doubles_rate(rng):
    frames = [make_frame(64, 64, rng, pts=i * 3000, dur=3000)
              for i in range(4)]
    f = create_filter(S.FILTER_YADIF, {"mode": 3 | 4})
    fo = f.init(fi_for(64, 64))
    assert fo.vrate == FilterInit().vrate * 2
    out = []
    for fr in frames:
        out.extend(f.work(fr))
    out.extend(f.flush())
    assert len(out) == 8
    # bob timestamps interleave at half duration
    assert out[1].pts - out[0].pts == 1500


def test_bwdif_runs(rng):
    frames = [make_frame(64, 64, rng, pts=i * 3000) for i in range(3)]
    _, out = run_filter(S.FILTER_BWDIF, {"mode": 3}, frames)
    assert len(out) == 3
    assert np.asarray(out[0].planes[0]).shape == (64, 64)


# -- denoise ------------------------------------------------------------------
def test_hqdn3d_reduces_noise(rng):
    clean = np.full((64, 64), 100, np.uint8)
    frames = []
    for i in range(4):
        noisy = np.clip(clean.astype(int)
                        + rng.integers(-10, 10, clean.shape), 0,
                        255).astype(np.uint8)
        frames.append(Buffer(
            planes=[noisy, np.full((32, 32), 128, np.uint8),
                    np.full((32, 32), 128, np.uint8)],
            pix_fmt=YUV420P, pts=i * 3003))
    # strong-preset strengths: hqdn3d's default 4/6 barely touches ±10
    # noise (simil^gamma ≈ 1 for small strengths — matches FFmpeg)
    _, out = run_filter(S.FILTER_DENOISE, {"y_spatial": 8.0,
                                           "y_temporal": 12.0}, frames)
    v_in = np.var(frames[-1].planes[0].astype(float))
    v_out = np.var(np.asarray(out[-1].planes[0]).astype(float))
    assert v_out < v_in * 0.5


def test_nlmeans_reduces_noise(rng):
    base = (np.add.outer(np.arange(64), np.arange(64)) // 2).astype(np.uint8)
    frames = []
    for i in range(2):
        noisy = np.clip(base.astype(int) + rng.integers(-8, 8, base.shape),
                        0, 255).astype(np.uint8)
        frames.append(Buffer(
            planes=[noisy, np.full((32, 32), 128, np.uint8),
                    np.full((32, 32), 128, np.uint8)],
            pix_fmt=YUV420P, pts=i * 3003))
    _, out = run_filter(S.FILTER_NLMEANS,
                        {"y_strength": 6.0, "y_range": 2,
                         "frame_count": 2}, frames)
    err_in = np.abs(frames[-1].planes[0].astype(int) - base).mean()
    err_out = np.abs(np.asarray(out[-1].planes[0]).astype(int)
                     - base).mean()
    assert err_out < err_in * 0.8


def test_bm3d_reduces_noise(rng):
    base = np.zeros((64, 64), np.uint8)
    base[:, 32:] = 180
    noisy = np.clip(base.astype(int) + rng.normal(0, 6, base.shape), 0,
                    255).astype(np.uint8)
    buf = Buffer(planes=[noisy, np.full((32, 32), 128, np.uint8),
                         np.full((32, 32), 128, np.uint8)],
                 pix_fmt=YUV420P, pts=0)
    _, out = run_filter(S.FILTER_BM3D, {"sigma": 6.0}, [buf])
    err_in = np.abs(noisy.astype(int) - base).mean()
    err_out = np.abs(np.asarray(out[0].planes[0]).astype(int)
                     - base).mean()
    assert err_out < err_in


# -- sharpen / smooth ---------------------------------------------------------
def test_unsharp_increases_contrast(rng):
    y = np.zeros((64, 64), np.uint8)
    y[:, 32:] = 200
    buf = Buffer(planes=[y, np.full((32, 32), 128, np.uint8),
                         np.full((32, 32), 128, np.uint8)],
                 pix_fmt=YUV420P)
    _, out = run_filter(S.FILTER_UNSHARP, {"y_strength": 0.8, "y_size": 7},
                        [buf])
    oy = np.asarray(out[0].planes[0]).astype(int)
    # overshoot at the edge
    assert oy[:, 29:32].min() < y[:, 29:32].min() \
        or oy[:, 32:35].max() > 200


def test_chroma_smooth_only_touches_chroma(rng):
    buf = make_frame(64, 64, rng)
    ysrc = np.asarray(buf.planes[0]).copy()
    _, out = run_filter(S.FILTER_CHROMA_SMOOTH, {"cb_strength": 1.0}, [buf])
    np.testing.assert_array_equal(np.asarray(out[0].planes[0]), ysrc)
    assert np.var(np.asarray(out[0].planes[1]).astype(float)) < \
        np.var(np.asarray(buf.planes[1]).astype(float))


def test_lapsharp_runs(rng):
    buf = make_frame(64, 64, rng)
    _, out = run_filter(S.FILTER_LAPSHARP, {"y_strength": 0.3}, [buf])
    assert np.asarray(out[0].planes[0]).shape == (64, 64)


# -- geometry -----------------------------------------------------------------
def test_rotate_90(rng):
    buf = make_frame(64, 32, rng)
    f = create_filter(S.FILTER_ROTATE, {"angle": 90})
    fo = f.init(fi_for(64, 32))
    assert (fo.geometry.width, fo.geometry.height) == (32, 64)
    out = f.work(buf)
    assert np.asarray(out[0].planes[0]).shape == (64, 32)
    # top-left of output = bottom-left of input (clockwise)
    assert np.asarray(out[0].planes[0])[0, 0] == buf.planes[0][-1, 0]


def test_rotate_180_involution(rng):
    buf = make_frame(32, 32, rng)
    src = buf.planes[0].copy()
    f = create_filter(S.FILTER_ROTATE, {"angle": 180})
    f.init(fi_for(32, 32))
    once = f.work(buf)[0]
    twice = f.work(once)[0]
    np.testing.assert_array_equal(np.asarray(twice.planes[0]), src)


def test_pad(rng):
    buf = make_frame(64, 48, rng)
    f = create_filter(S.FILTER_PAD, {"width": 96, "height": 64,
                                     "color": "black"})
    fo = f.init(fi_for(64, 48))
    assert (fo.geometry.width, fo.geometry.height) == (96, 64)
    out = f.work(buf)[0]
    y = np.asarray(out.planes[0])
    assert y.shape == (64, 96)
    assert y[0, 0] == 16  # limited-range black
    assert np.asarray(out.planes[1])[0, 0] == 128


def test_grayscale(rng):
    buf = make_frame(32, 32, rng)
    _, out = run_filter(S.FILTER_GRAYSCALE, {}, [buf])
    assert np.all(np.asarray(out[0].planes[1]) == 128)
    np.testing.assert_array_equal(np.asarray(out[0].planes[0]),
                                  np.asarray(buf.planes[0]))


def test_format_8_to_10bit(rng):
    buf = make_frame(32, 32, rng)
    f = create_filter(S.FILTER_FORMAT, {"format": "yuv420p10"})
    fo = f.init(fi_for(32, 32))
    assert fo.pix_fmt.bit_depth == 10
    out = f.work(buf)[0]
    assert out.pix_fmt.name == "yuv420p10"
    np.testing.assert_array_equal(
        np.asarray(out.planes[0]).astype(int),
        np.asarray(buf.planes[0]).astype(int) << 2)


# -- deband / deblock ---------------------------------------------------------
def test_deband_flattens_gradient(rng):
    y = np.repeat(np.arange(16, 80, 1, dtype=np.uint8), 1)[None, :] \
        * np.ones((64, 1), np.uint8)
    y = np.repeat(np.arange(64, dtype=np.uint8)[None, :] // 8 * 2 + 60,
                  64, 0)
    buf = Buffer(planes=[y, np.full((32, 32), 128, np.uint8),
                         np.full((32, 32), 128, np.uint8)],
                 pix_fmt=YUV420P)
    _, out = run_filter(S.FILTER_DEBAND, {"range": 8, "thresh": 12}, [buf])
    # banding steps get softened: fewer unique-step transitions
    dy_in = np.abs(np.diff(y.astype(int), axis=1)).sum()
    dy_out = np.abs(np.diff(np.asarray(out[0].planes[0]).astype(int),
                            axis=1)).sum()
    assert dy_out <= dy_in


def test_deblock_smooths_block_edges(rng):
    y = np.zeros((64, 64), np.uint8)
    y[:, :32] = 100
    y[:, 32:] = 110  # small step at a block boundary (blocking artifact)
    buf = Buffer(planes=[y, np.full((32, 32), 128, np.uint8),
                         np.full((32, 32), 128, np.uint8)],
                 pix_fmt=YUV420P)
    _, out = run_filter(S.FILTER_DEBLOCK, {"thresh": 20, "blocksize": 8},
                        [buf])
    oy = np.asarray(out[0].planes[0]).astype(int)
    assert abs(oy[10, 32] - oy[10, 31]) < 10


# -- comb detect / decomb / detelecine ---------------------------------------
def test_comb_detect_flags_interlaced(rng):
    y = _interlaced_pair(64, 64, rng)
    prev = Buffer(planes=[np.roll(y, 1, 1),
                          np.full((32, 32), 128, np.uint8),
                          np.full((32, 32), 128, np.uint8)],
                  pix_fmt=YUV420P, pts=0)
    buf = Buffer(planes=[y, np.full((32, 32), 128, np.uint8),
                         np.full((32, 32), 128, np.uint8)],
                 pix_fmt=YUV420P, pts=3003)
    f, out = run_filter(S.FILTER_COMB_DETECT, {}, [prev, buf])
    assert out[1].combed > 0


def test_comb_detect_progressive_clean(rng):
    y = np.repeat(np.arange(64, dtype=np.uint8)[:, None], 64, 1)
    bufs = [Buffer(planes=[y, np.full((32, 32), 128, np.uint8),
                           np.full((32, 32), 128, np.uint8)],
                   pix_fmt=YUV420P, pts=i * 3003) for i in range(2)]
    _, out = run_filter(S.FILTER_COMB_DETECT, {}, bufs)
    assert out[-1].combed == 0


def test_decomb_selective(rng):
    y = _interlaced_pair(64, 64, rng)
    frames = []
    for i in range(3):
        b = Buffer(planes=[y.copy(), np.full((32, 32), 128, np.uint8),
                           np.full((32, 32), 128, np.uint8)],
                   pix_fmt=YUV420P, pts=i * 3003)
        b.combed = 2
        frames.append(b)
    _, out = run_filter(S.FILTER_DECOMB, {"mode": 7}, frames)
    assert len(out) == 3

    def comb(yp):
        a = yp.astype(int)
        return np.abs(a[:-2] - 2 * a[1:-1] + a[2:]).mean()
    assert comb(np.asarray(out[1].planes[0])) < comb(y)


def test_detelecine_drops_duplicates(rng):
    # telecined 3:2: frames with repeated fields; a dup every 5
    base = [(np.add.outer(np.arange(64), np.arange(64)) * (i + 1) % 256)
            .astype(np.uint8) for i in range(4)]
    # simulate 3:2 pulldown from 4 film frames → 5 video frames
    fields = []
    pattern = [(0, 0), (1, 0), (1, 1), (2, 2), (3, 3)]  # (top, bottom) idx
    frames = []
    for i, (t, b) in enumerate(pattern):
        y = base[t].copy()
        y[1::2] = base[b][1::2]
        frames.append(Buffer(
            planes=[y, np.full((32, 32), 128, np.uint8),
                    np.full((32, 32), 128, np.uint8)],
            pix_fmt=YUV420P, pts=i * 3003, duration=3003))
    _, out = run_filter(S.FILTER_DETELECINE, {}, frames)
    assert len(out) <= len(frames)
    # every surviving frame should be roughly progressive
    def comb(yp):
        a = np.asarray(yp).astype(int)
        return np.abs(a[:-2] - 2 * a[1:-1] + a[2:]).mean()
    for o in out:
        assert comb(o.planes[0]) <= comb(frames[1].planes[0]) + 1


# -- vfr ----------------------------------------------------------------------
def test_vfr_cfr_retimes(rng):
    # 5 frames at 25fps (3600 ticks) → CFR 30000/1001 output grid
    frames = [make_frame(32, 32, rng, pts=i * 3600, dur=3600)
              for i in range(5)]
    f = create_filter(S.FILTER_VFR, {"mode": 1, "rate": "30000/1001"})
    fo = f.init(fi_for(32, 32))
    assert fo.vrate == Fraction(30000, 1001)
    out = []
    for fr in frames:
        out.extend(f.work(fr))
    out.extend(f.flush())
    # 5 frames * 3600 = 18000 ticks ≈ 6 grid frames of 3003
    assert len(out) >= 5
    pts = [o.pts for o in out]
    diffs = np.diff(pts)
    assert np.all(np.abs(diffs - 3003) <= 1)


def test_vfr_cfr_drops_on_high_rate_input(rng):
    # 60fps input (1500 ticks) → 30fps CFR must drop about half
    frames = [make_frame(32, 32, rng, pts=i * 1500, dur=1500)
              for i in range(10)]
    f = create_filter(S.FILTER_VFR, {"mode": 1, "rate": "30/1"})
    f.init(fi_for(32, 32))
    out = []
    for fr in frames:
        out.extend(f.work(fr))
    out.extend(f.flush())
    assert 4 <= len(out) <= 6
    assert f.drops > 0


def test_vfr_pfr_caps(rng):
    frames = [make_frame(32, 32, rng, pts=i * 1500, dur=1500)
              for i in range(10)]
    f = create_filter(S.FILTER_VFR, {"mode": 2, "rate": "30/1"})
    f.init(fi_for(32, 32))
    out = []
    for fr in frames:
        out.extend(f.work(fr))
    assert len(out) <= 6
    # PFR preserves original timestamps of kept frames
    assert all(o.pts % 1500 == 0 for o in out)


# -- render_sub ---------------------------------------------------------------
def test_rendersub_blends(rng):
    buf = make_frame(64, 64, rng, pts=1000)
    buf.planes[0][:] = 50
    sub = Buffer(track_kind="subtitle", pts=0, stop=99999,
                 rect=(8, 8, 16, 16))
    rgba = np.zeros((16, 16, 4), np.uint8)
    rgba[..., 0] = 255  # red
    rgba[..., 3] = 255  # opaque
    sub.planes = [rgba]
    f = create_filter(S.FILTER_RENDER_SUB, {})
    f.init(fi_for(64, 64))
    assert f.work(sub) == []
    out = f.work(buf)[0]
    y = np.asarray(out.planes[0])
    assert y[10, 10] != 50         # inside patch changed
    assert y[40, 40] == 50         # outside untouched


# -- graph --------------------------------------------------------------------
def test_graph_orders_and_negotiates(rng):
    fl = [
        {"ID": S.FILTER_CROP_SCALE, "Settings": {"width": 32, "height": 32}},
        {"ID": S.FILTER_DENOISE, "Settings": {"y_spatial": 2.0}},
    ]
    g = FilterGraph(fl, fi_for(64, 64))
    # denoise (quality) must run before crop_scale (geometry)
    assert g.filters[0].name == "hqdn3d"
    assert g.fi_out.geometry.width == 32
    out = g.work(make_frame(64, 64, rng))
    assert np.asarray(out[0].planes[0]).shape == (32, 32)


def test_graph_disables_bad_filter(rng):
    fl = [{"ID": S.FILTER_ROTATE, "Settings": {"angle": 45}},  # invalid
          {"ID": S.FILTER_GRAYSCALE, "Settings": {}}]
    g = FilterGraph(fl, fi_for(64, 64))
    assert len(g.filters) == 1  # rotate disabled, not fatal


def test_graph_side_data_rides_through(rng):
    fl = [{"ID": S.FILTER_CROP_SCALE, "Settings": {"width": 32,
                                                   "height": 32}}]
    g = FilterGraph(fl, fi_for(64, 64))
    buf = make_frame(64, 64, rng)
    buf.side_data["dovi_rpu"] = b"\x01\x02"
    out = g.work(buf)
    assert out[0].side_data["dovi_rpu"] == b"\x01\x02"


def test_rpu_active_area_rescale(rng):
    from handbrake_tpu.filters.rpu import RPUFilter
    f = create_filter(S.FILTER_RPU, {"source-width": 128,
                                     "source-height": 128})
    fi = fi_for(64, 64)
    fi.crop = (0, 0, 0, 0)
    f.init(fi)
    buf = make_frame(64, 64, rng)
    buf.side_data["dovi_rpu"] = {"active_area": (16, 16, 8, 8)}
    out = f.work(buf)[0]
    assert out.side_data["dovi_rpu"]["active_area"] == (8, 8, 4, 4)


def test_nlmeans_tile_sharded_bit_identical():
    """Production NLMeans under shard_map with ppermute halos equals the
    unsharded kernel exactly (taskset.c:17 segment overlap analog)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from handbrake_tpu.filters.nlmeans import nlmeans_plane
    from handbrake_tpu.parallel.mesh import make_mesh, tile_shard_nlmeans

    n = min(8, len(jax.devices()))
    mesh = make_mesh(n, tile=n)          # all devices on the tile axis
    rng = np.random.default_rng(0)
    H, W = 160, 48
    cur = rng.integers(0, 256, (H, W), np.uint8)
    prev = rng.integers(0, 256, (H, W), np.uint8)
    refs = np.stack([cur, prev])
    for patch, srange in ((7, 3), (3, 1), (5, 2)):
        ref_out = np.asarray(nlmeans_plane(
            jnp.asarray(cur), jnp.asarray(refs), strength=6.0,
            origin_tune=0.9, patch=patch, rng=srange, maxval=255))
        fn = tile_shard_nlmeans(mesh, strength=6.0, origin_tune=0.9,
                                patch=patch, rng=srange, maxval=255)
        got = np.asarray(fn(jnp.asarray(cur), jnp.asarray(refs)))
        assert np.array_equal(got, ref_out), (patch, srange)


def test_avfilter_escape_graph():
    """FILTER_AVFILTER (avfilter.c user escape role): a graph string of
    native filters chained left-to-right matches applying the same
    filters individually."""
    import numpy as np
    from handbrake_tpu.core.buffer import Buffer
    from handbrake_tpu.filters.base import FilterInit, create_filter
    from handbrake_tpu.job import schema as S
    from handbrake_tpu.core.buffer import PIX_FMTS

    rng = np.random.default_rng(3)
    W, H = 64, 48
    y = rng.integers(0, 255, (H, W), np.uint8)
    u = rng.integers(0, 255, (H // 2, W // 2), np.uint8)
    v = rng.integers(0, 255, (H // 2, W // 2), np.uint8)

    def fresh():
        b = Buffer(planes=[y.copy(), u.copy(), v.copy()],
                   pix_fmt=PIX_FMTS["yuv420p"], pts=0, duration=3003)
        return b

    def mk_fi():
        from handbrake_tpu.filters.base import FilterInit
        from handbrake_tpu.core.buffer import Geometry
        from fractions import Fraction
        return FilterInit(geometry=Geometry(W, H, 1, 1),
                          pix_fmt=PIX_FMTS["yuv420p"],
                          vrate=Fraction(30, 1))

    esc = create_filter(S.FILTER_AVFILTER,
                        {"graph": "hqdn3d,unsharp"})
    esc.init(mk_fi())
    out_esc = esc.work(fresh())

    f1 = create_filter(S.FILTER_DENOISE, {})
    f2 = create_filter(S.FILTER_UNSHARP, {})
    fi = mk_fi()
    fi = f1.init(fi)
    f2.init(fi)
    mid = f1.work(fresh())
    out_ref = []
    for b in mid:
        out_ref.extend(f2.work(b))
    assert len(out_esc) == len(out_ref) == 1
    for pe, pr in zip(out_esc[0].planes, out_ref[0].planes):
        assert (np.asarray(pe) == np.asarray(pr)).all()
