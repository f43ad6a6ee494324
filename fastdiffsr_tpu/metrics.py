"""Image metric suite: MSE / PSNR / SSIM / ERGAS (+ LPIPS gate) and image
IO/plot helpers.

Parity target: core/metrics.py of the reference —
- tensor2img ([-1,1] -> uint8 HWC; core/metrics.py:16-43); here the input is
  an NHWC float array in [-1, 1]
- calculate_mse/psnr on uint8 arrays (:90-102)
- calculate_ssim: MATLAB-style 11x11 Gaussian window SSIM via cv2 (:104-145)
- calculate_ergas: 100/scale * sqrt(mean_c(MSE_c / mu_ref_c^2)) (:147-152)
- calculate_lpips (:154-164): the reference instantiates lpips.LPIPS per
  call (a known hotspot); here LPIPS is a JAX AlexNet port loaded ONCE
  (see lpips_jax.py); unavailable weights -> None with a warning.

skimage's compare_ssim (used by sr_mfe.py:167 with multichannel=True,
gaussian off) is also reproduced as ``ssim_skimage`` since the train-loop
logs used it.
"""

from __future__ import annotations

import math
import os
import warnings

import numpy as np


# --------------------------------------------------------------------- #
# conversions
# --------------------------------------------------------------------- #

def tensor2img(arr: np.ndarray, min_max=(-1, 1)) -> np.ndarray:
    """float array (H,W,C) or (B,H,W,C) in min_max -> uint8 HWC image.
    A batch dim of size >1 is tiled into a grid row (reference uses
    make_grid; a single row is what its callers produce)."""
    arr = np.asarray(arr, dtype=np.float32)
    arr = (arr - min_max[0]) / (min_max[1] - min_max[0])
    arr = np.clip(arr, 0.0, 1.0)
    if arr.ndim == 4:
        if arr.shape[0] == 1:
            arr = arr[0]
        else:
            arr = np.concatenate(list(arr), axis=1)  # horizontal grid row
    img = (arr * 255.0).round().astype(np.uint8)
    return img


def save_img(img: np.ndarray, img_path: str):
    import cv2
    os.makedirs(os.path.dirname(img_path) or ".", exist_ok=True)
    if img.ndim == 3 and img.shape[2] == 3:
        img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
    cv2.imwrite(img_path, img)


# --------------------------------------------------------------------- #
# scalar metrics (uint8 inputs, reference semantics)
# --------------------------------------------------------------------- #

def calculate_mse(img1: np.ndarray, img2: np.ndarray) -> float:
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    return float(np.mean((img1 - img2) ** 2))


def calculate_psnr(img1: np.ndarray, img2: np.ndarray) -> float:
    mse = calculate_mse(img1, img2)
    if mse == 0:
        return float("inf")
    return 20 * math.log10(255.0 / math.sqrt(mse))


def _ssim_single(img1: np.ndarray, img2: np.ndarray) -> float:
    """MATLAB-style SSIM on one channel (reference core/metrics.py:104-125):
    11x11 Gaussian window sigma 1.5, C1=(0.01*255)^2, C2=(0.03*255)^2,
    valid-region convolution."""
    import cv2
    C1 = (0.01 * 255) ** 2
    C2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())
    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = cv2.filter2D(img1 ** 2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2 ** 2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2
    ssim_map = (((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) /
                ((mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)))
    return float(ssim_map.mean())


def calculate_ssim(img1: np.ndarray, img2: np.ndarray) -> float:
    """Multi-channel mean of per-channel MATLAB SSIM
    (reference core/metrics.py:127-145)."""
    if img1.shape != img2.shape:
        raise ValueError("Input images must have the same dimensions.")
    if img1.ndim == 2:
        return _ssim_single(img1, img2)
    if img1.ndim == 3:
        if img1.shape[2] == 3:
            return float(np.mean([_ssim_single(img1[..., i], img2[..., i])
                                  for i in range(3)]))
        if img1.shape[2] == 1:
            return _ssim_single(img1[..., 0], img2[..., 0])
    raise ValueError("Wrong input image dimensions.")


def ssim_skimage(img1: np.ndarray, img2: np.ndarray) -> float:
    """skimage.measure.compare_ssim(multichannel=True) equivalent:
    7x7 uniform filter, per-channel, averaged — used by the reference's
    train-loop validation (sr_mfe.py:167)."""
    from scipy.ndimage import uniform_filter  # scipy ships with jax stack

    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    if img1.ndim == 2:
        img1, img2 = img1[..., None], img2[..., None]
    win = 7
    pad = win // 2
    data_range = 255.0
    K1, K2 = 0.01, 0.03
    C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
    NP = win ** 2
    cov_norm = NP / (NP - 1)
    vals = []
    for c in range(img1.shape[2]):
        x, y = img1[..., c], img2[..., c]
        ux = uniform_filter(x, win)
        uy = uniform_filter(y, win)
        uxx = uniform_filter(x * x, win)
        uyy = uniform_filter(y * y, win)
        uxy = uniform_filter(x * y, win)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
        B1, B2 = ux ** 2 + uy ** 2 + C1, vx + vy + C2
        S = (A1 * A2) / (B1 * B2)
        vals.append(S[pad:-pad, pad:-pad].mean())
    return float(np.mean(vals))


def calculate_ergas(img_fake: np.ndarray, img_real: np.ndarray,
                    scale: int = 4) -> float:
    """ERGAS = 100/scale * sqrt(mean_c(MSE_c / mean_ref_c^2))
    (reference core/metrics.py:147-152)."""
    img_fake = img_fake.astype(np.float64)
    img_real = img_real.astype(np.float64)
    if img_fake.ndim == 2:
        img_fake, img_real = img_fake[..., None], img_real[..., None]
    nb = img_fake.shape[2]
    means_real = img_real.reshape(-1, nb).mean(axis=0)
    mses = ((img_fake - img_real) ** 2).reshape(-1, nb).mean(axis=0)
    return float(100 / scale * np.sqrt((mses / (means_real ** 2 + 1e-12))
                                       .mean()))


_LPIPS_SINGLETON = None
_LPIPS_WARNED = False


def calculate_lpips(img1_u8: np.ndarray, img2_u8: np.ndarray):
    """LPIPS-alex distance of two uint8 HWC images, or None when the
    AlexNet/LPIPS weights are unavailable in this environment.
    Unlike the reference (core/metrics.py:154-164, new LPIPS model per
    call), the model is constructed once."""
    global _LPIPS_SINGLETON, _LPIPS_WARNED
    if _LPIPS_SINGLETON is None:
        try:
            from .lpips_jax import LPIPSJax
            _LPIPS_SINGLETON = LPIPSJax.load_default()
        except Exception as e:  # pragma: no cover - environment dependent
            if not _LPIPS_WARNED:
                warnings.warn(f"LPIPS unavailable: {e}")
                _LPIPS_WARNED = True
            _LPIPS_SINGLETON = False
    if _LPIPS_SINGLETON is False:
        return None
    return _LPIPS_SINGLETON.distance(img1_u8, img2_u8)


# --------------------------------------------------------------------- #
# plotting (reference core/metrics.py:51-88)
# --------------------------------------------------------------------- #

def plot_img(path: str, bicubic, sr, hr, psnr, ssim, ergas, lpips,
             psnr2=None, ssim2=None, ergas2=None, lpips2=None):
    """4-panel comparison figure: HR | Bicubic | SR annotated with metrics."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(12, 4.5))
    for ax, (img, title) in zip(axes, [
            (hr, "HR"),
            (bicubic, "Bicubic\nPSNR {:.2f} SSIM {:.4f}\nERGAS {:.3f}{}".format(
                psnr2 or 0, ssim2 or 0, ergas2 or 0,
                f" LPIPS {lpips2:.4f}" if lpips2 is not None else "")),
            (sr, "SR\nPSNR {:.2f} SSIM {:.4f}\nERGAS {:.3f}{}".format(
                psnr, ssim, ergas,
                f" LPIPS {lpips:.4f}" if lpips is not None else ""))]):
        ax.imshow(img)
        ax.set_title(title, fontsize=9)
        ax.axis("off")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
