"""Metric suite tests: identities, known values, and (when the reference is
mounted) golden parity of the MATLAB-style SSIM against the reference's
cv2 implementation."""

import numpy as np
import pytest

from fastdiffsr_tpu import metrics as M
from tests.conftest import requires_reference, REFERENCE_ROOT


def _rand_img(seed, shape=(64, 64, 3)):
    return np.random.default_rng(seed).integers(
        0, 256, shape, dtype=np.uint8).astype(np.uint8)


def test_tensor2img_roundtrip():
    x = np.linspace(-1, 1, 48, dtype=np.float32).reshape(4, 4, 3)
    img = M.tensor2img(x)
    assert img.dtype == np.uint8
    assert img.min() == 0 and img.max() == 255
    # batch of 1 squeezes
    assert M.tensor2img(x[None]).shape == (4, 4, 3)
    # batch of 2 tiles horizontally (width doubles)
    assert M.tensor2img(np.stack([x, x])).shape == (4, 8, 3)


def test_psnr_identity_and_known():
    a = _rand_img(0)
    assert M.calculate_psnr(a, a) == float("inf")
    b = a.astype(np.int32).copy()
    b = np.clip(b + 10, 0, 255).astype(np.uint8)
    # uniform +10 shift (where unclipped) -> mse<=100 -> psnr >= 28.13
    assert M.calculate_psnr(a, b) >= 20 * np.log10(255 / 10) - 0.5


def test_mse_matches_numpy():
    a, b = _rand_img(1), _rand_img(2)
    assert M.calculate_mse(a, b) == pytest.approx(
        np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))


def test_ssim_self_is_one():
    a = _rand_img(3)
    assert M.calculate_ssim(a, a) == pytest.approx(1.0, abs=1e-9)
    assert M.ssim_skimage(a, a) == pytest.approx(1.0, abs=1e-9)


def test_ssim_decreases_with_noise():
    a = _rand_img(4).astype(np.float64)
    rng = np.random.default_rng(5)
    small = np.clip(a + rng.normal(0, 5, a.shape), 0, 255).astype(np.uint8)
    big = np.clip(a + rng.normal(0, 60, a.shape), 0, 255).astype(np.uint8)
    a = a.astype(np.uint8)
    assert M.calculate_ssim(a, small) > M.calculate_ssim(a, big)


@requires_reference
def test_ssim_matches_reference_cv2_impl():
    import importlib.util
    path = REFERENCE_ROOT / "core" / "metrics.py"
    src = path.read_text()
    # execute only the ssim functions (reference file imports lpips etc.)
    lines = src.split("\n")
    wanted = []
    grab = False
    for i, ln in enumerate(lines):
        if ln.startswith("def ssim") or ln.startswith("def calculate_ssim"):
            grab = True
        elif grab and ln.startswith(("def ", "class ")) and not \
                ln.startswith(("def ssim", "def calculate_ssim")):
            grab = False
        if grab:
            wanted.append(ln)
    ns = {"np": np}
    import cv2
    ns["cv2"] = cv2
    exec("\n".join(wanted), ns)

    a, b = _rand_img(6), _rand_img(7)
    ours = M.calculate_ssim(a, b)
    theirs = ns["calculate_ssim"](a, b)
    assert ours == pytest.approx(theirs, abs=1e-10)


def test_ergas_zero_for_identical_and_scales():
    a = _rand_img(8)
    assert M.calculate_ergas(a, a) == pytest.approx(0.0)
    b = _rand_img(9)
    e4 = M.calculate_ergas(b, a, scale=4)
    e8 = M.calculate_ergas(b, a, scale=8)
    assert e4 == pytest.approx(2 * e8)


def test_frechet_distance_identities():
    from fastdiffsr_tpu.cli.fid import frechet_distance
    mu = np.zeros(4)
    sigma = np.eye(4)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0, abs=1e-8)
    mu2 = np.ones(4)
    assert frechet_distance(mu, sigma, mu2, sigma) == pytest.approx(4.0,
                                                                    abs=1e-6)
