"""PSNR/SSIM metrics + RD harness sanity (north-star quality tracking)."""
import numpy as np
import pytest

from handbrake_tpu.utils.quality import psnr, psnr_yuv, ssim


def test_psnr_basics():
    a = np.full((32, 32), 100, np.uint8)
    assert psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0] = 110  # mse = 100/1024
    expect = 10 * np.log10(255 ** 2 / (100 / 1024))
    assert abs(psnr(a, b) - expect) < 1e-9


def test_ssim_range_and_identity():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-9)
    noisy = np.clip(a.astype(int) + rng.integers(-40, 41, a.shape),
                    0, 255).astype(np.uint8)
    s = ssim(a, noisy)
    assert 0.0 < s < 1.0
    assert ssim(a, 255 - a) < s


def test_psnr_yuv_weighting():
    y = np.full((16, 16), 100, np.uint8)
    c = np.full((8, 8), 100, np.uint8)
    y2 = y.copy()
    y2 += 10
    # degrade only luma: weighted psnr must sit between luma and chroma psnr
    p = psnr_yuv((y, c, c), (y2, c, c))
    assert p > psnr(y, y2)


def test_rd_monotonic_h264():
    """Lower QP ⇒ more bits and higher PSNR (RD curve sanity)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from rd_harness import make_clip, measure
    w, h = 128, 96
    frames = make_clip(w, h, 4)
    rows = measure("h264", frames, w, h, [24, 36])
    assert rows[0]["kbps"] > rows[1]["kbps"]
    assert rows[0]["psnr_y"] > rows[1]["psnr_y"]
    assert rows[0]["ssim_y"] > rows[1]["ssim_y"]
    assert rows[0]["psnr_y"] > 30.0
