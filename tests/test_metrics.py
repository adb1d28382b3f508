"""Golden + oracle tests for utils/metrics.py (PSNR, SSIM).

The reference evaluates with skimage.metrics.structural_similarity
(reference test.py:19-24,106-108): win_size=11, gaussian_weights=False,
data_range=1.0, channel-averaged. skimage is not installed in this
environment, so correctness is pinned three ways:

1. A brute-force per-window oracle (explicit loops, unbiased covariance,
   valid windows only) — an independent implementation of the Wang et al.
   formula with skimage's conventions.
2. A scipy.ndimage.uniform_filter port of skimage's actual code path
   (filter + edge crop), when scipy is available.
3. Hardcoded goldens for fixed seeds, so any future regression in either
   implementation is caught even if both drift together.
"""

import numpy as np
import pytest

from papr_tpu.utils.metrics import psnr_np, ssim_np


def ssim_brute(a, b, win=11, data_range=1.0):
    """Explicit per-window SSIM, skimage conventions (crop, unbiased cov)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    NP = win * win
    cn = NP / (NP - 1)
    H, W, C = a.shape
    vals = []
    for c in range(C):
        x, y = a[..., c], b[..., c]
        ss = []
        for i in range(H - win + 1):
            for j in range(W - win + 1):
                wx = x[i:i + win, j:j + win]
                wy = y[i:i + win, j:j + win]
                ux, uy = wx.mean(), wy.mean()
                vx = cn * (np.mean(wx * wx) - ux * ux)
                vy = cn * (np.mean(wy * wy) - uy * uy)
                vxy = cn * (np.mean(wx * wy) - ux * uy)
                ss.append(((2 * ux * uy + C1) * (2 * vxy + C2))
                          / ((ux * ux + uy * uy + C1) * (vx + vy + C2)))
        vals.append(np.mean(ss))
    return float(np.mean(vals))


def ssim_skimage_port(a, b, win=11, data_range=1.0):
    """Port of skimage.structural_similarity's uniform-filter code path."""
    from scipy.ndimage import uniform_filter
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    NP = win * win
    cov_norm = NP / (NP - 1)
    pad = (win - 1) // 2
    vals = []
    for c in range(a.shape[-1]):
        x, y = a[..., c], b[..., c]
        ux = uniform_filter(x, size=win)
        uy = uniform_filter(y, size=win)
        uxx = uniform_filter(x * x, size=win)
        uyy = uniform_filter(y * y, size=win)
        uxy = uniform_filter(x * y, size=win)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        S = (((2 * ux * uy + C1) * (2 * vxy + C2))
             / ((ux ** 2 + uy ** 2 + C1) * (vx + vy + C2)))
        vals.append(S[pad:-pad, pad:-pad].mean())
    return float(np.mean(vals))


def _cases():
    rng = np.random.default_rng(42)
    a1 = rng.random((24, 26, 3))
    b1 = np.clip(a1 + 0.08 * rng.standard_normal(a1.shape), 0, 1)
    xx, yy = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 28))
    a2 = np.stack([xx, yy, 0.5 * (xx + yy)], -1)
    b2 = np.clip(a2 * 0.9 + 0.05, 0, 1)
    a3 = rng.random((20, 20))
    b3 = np.clip(a3 + 0.2 * rng.standard_normal(a3.shape), 0, 1)
    a4 = rng.random((16, 18, 3))
    return {"c1": (a1, b1), "c2": (a2, b2), "c3": (a3, b3), "c4": (a4, a4.copy())}


# Goldens generated once from the brute-force oracle (agrees with the fast
# implementation to <3e-15 and with the scipy skimage-port to <1e-12).
GOLD_SSIM = {
    "c1": 0.966391290676,
    "c2": 0.993231460960,
    "c3": 0.819295619643,
    "c4": 1.0,
}
GOLD_PSNR = {
    "c1": 22.391244449860014,
    "c2": 31.29264914772598,
    "c3": 14.909528577511427,
}


@pytest.mark.parametrize("name", list(GOLD_SSIM))
def test_ssim_golden(name):
    a, b = _cases()[name]
    assert ssim_np(a, b) == pytest.approx(GOLD_SSIM[name], abs=1e-6)


@pytest.mark.parametrize("name", list(GOLD_PSNR))
def test_psnr_golden(name):
    a, b = _cases()[name]
    assert psnr_np(a, b) == pytest.approx(GOLD_PSNR[name], abs=1e-9)


@pytest.mark.parametrize("name", ["c1", "c2", "c3", "c4"])
def test_ssim_matches_bruteforce_oracle(name):
    a, b = _cases()[name]
    assert ssim_np(a, b) == pytest.approx(ssim_brute(a, b), abs=1e-10)


@pytest.mark.parametrize("name", ["c1", "c3"])
def test_ssim_matches_skimage_port(name):
    pytest.importorskip("scipy")
    a, b = _cases()[name]
    assert ssim_np(a, b) == pytest.approx(ssim_skimage_port(a, b), abs=1e-10)


def test_ssim_identical_images_is_one():
    a, _ = _cases()["c4"]
    assert ssim_np(a, a) == pytest.approx(1.0, abs=1e-12)


def test_psnr_basic_properties():
    a, b = _cases()["c1"]
    # PSNR = -10 log10(MSE)
    mse = float(np.mean((a - b) ** 2))
    assert psnr_np(a, b) == pytest.approx(-10 * np.log10(mse), abs=1e-12)
    # identical images -> +inf
    assert psnr_np(a, a) == np.inf
