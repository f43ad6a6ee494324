"""Differentiable SSIM (jax) matching the eval metric's formula.

Mirror of ``fastdiffsr_tpu.metrics._ssim_single`` (MATLAB-style, reference
core/metrics.py:104-125): 11x11 Gaussian window sigma 1.5 per channel,
C1=(0.01*255)^2, C2=(0.03*255)^2, valid-region statistics (the numpy
implementation crops filter2D's bordered output to [5:-5], which equals a
VALID convolution). Channels are averaged like ``calculate_ssim`` does.

Used as an optional image-space auxiliary TRAINING loss
(``model.diffusion.aux_ssim_weight``) — the x8 demo's SSIM deficit is the
metric this term optimizes directly (BASELINE.md r4 x8 closure: every
in-family corpus/schedule lever saturated below bicubic SSIM; this is the
out-of-family attempt VERDICT r4 #6 asked for).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """cv2.getGaussianKernel(11, 1.5) equivalent (normalized)."""
    half = (size - 1) / 2.0
    x = np.arange(size, dtype=np.float64) - half
    k = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def _depthwise_sep_filter(x: jax.Array, k1d: jax.Array) -> jax.Array:
    """Separable VALID depthwise filter along H then W, any channel count."""
    c = x.shape[-1]
    kh = jnp.tile(k1d.reshape(-1, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k1d.reshape(1, -1, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), padding="VALID",
                                     feature_group_count=c,
                                     dimension_numbers=dn)
    return jax.lax.conv_general_dilated(x, kw, (1, 1), padding="VALID",
                                        feature_group_count=c,
                                        dimension_numbers=dn)


def ssim(img1: jax.Array, img2: jax.Array,
         per_image: bool = False) -> jax.Array:
    """Mean SSIM over the batch (or per-image (B,) means with
    ``per_image=True``); inputs (B,H,W,C) float on the 0..255 scale (the
    eval metric's dynamic range — map [-1,1] activations with
    ``(x + 1) * 127.5`` first). Differentiable."""
    C1 = (0.01 * 255) ** 2
    C2 = (0.03 * 255) ** 2
    k = jnp.asarray(_gaussian_window())
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)

    mu1 = _depthwise_sep_filter(img1, k)
    mu2 = _depthwise_sep_filter(img2, k)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = _depthwise_sep_filter(img1 ** 2, k) - mu1_sq
    sigma2_sq = _depthwise_sep_filter(img2 ** 2, k) - mu2_sq
    sigma12 = _depthwise_sep_filter(img1 * img2, k) - mu1_mu2
    ssim_map = (((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) /
                ((mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)))
    if per_image:
        return jnp.mean(ssim_map, axis=(1, 2, 3))
    return jnp.mean(ssim_map)
