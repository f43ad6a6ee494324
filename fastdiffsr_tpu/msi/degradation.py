"""SRMD-style degradation pipeline + noise injectors for the MSI baselines.

Parity targets:
- Gaussian blur-kernel generation ``cal_sigma`` / ``isotropic_gaussian_
  kernel`` / ``anisotropic_gaussian_kernel`` / ``random_batch_kernel`` /
  ``stable_batch_kernel`` (MSI_SR_model/model/util.py:237-304)
- ``PCA`` / ``PCAEncoder`` kernel-code projection (model/util.py:230,368)
- ``BatchBlur`` reflect-pad per-image depthwise blur (model/util.py:383)
- ``random_batch_noise`` / ``b_GaussianNoising`` (model/util.py:334,342)
- ``SRMDPreprocessing`` blur -> bicubic-down -> noise -> kernel code
  (model/util.py:408-463)
- dataset-level noise injectors ``AddSaltPepperNoise`` /
  ``AddGaussianNoise`` (MSI_SR_model/data/dataset.py:15,33)

TPU-native split: kernel generation + PCA basis are tiny host-side numpy
(fresh per batch, like the reference); the hot path — blur conv, bicubic
downsample, noising — is one jittable JAX function on NHWC batches. The
reference downsamples via a per-channel PIL round-trip
(b_CPUVar_Bicubic, model/util.py:320-332); here ``jax.image.resize``
bicubic+antialias runs the whole batch on device (golden-tested close,
not bit-equal — both are Keys a=-0.5 cubic resamplers).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- kernels

def cal_sigma(sig_x: float, sig_y: float, radians: float) -> np.ndarray:
    """2x2 covariance from axis sigmas + rotation (model/util.py:237)."""
    d = np.array([[sig_x ** 2, 0.0], [0.0, sig_y ** 2]])
    u = np.array([[np.cos(radians), -np.sin(radians)],
                  [np.sin(radians), np.cos(radians)]])
    return u @ d @ u.T


def isotropic_gaussian_kernel(l: int, sigma: float) -> np.ndarray:
    """(l,l) normalized kernel (model/util.py:253-258)."""
    ax = np.arange(-l // 2 + 1.0, l // 2 + 1.0)
    xx, yy = np.meshgrid(ax, ax)
    k = np.exp(-(xx ** 2 + yy ** 2) / (2.0 * sigma ** 2))
    return k / np.sum(k)


def anisotropic_gaussian_kernel(l: int,
                                sigma_matrix: np.ndarray) -> np.ndarray:
    """(l,l) normalized kernel from a covariance (model/util.py:244-250)."""
    ax = np.arange(-l // 2 + 1.0, l // 2 + 1.0)
    xx, yy = np.meshgrid(ax, ax)
    xy = np.stack([xx, yy], axis=-1)  # (l, l, 2)
    inv = np.linalg.inv(sigma_matrix)
    k = np.exp(-0.5 * np.sum((xy @ inv) * xy, axis=2))
    return k / np.sum(k)


def random_batch_kernel(rng: np.random.Generator, batch: int, l: int = 21,
                        sig_min: float = 0.2, sig_max: float = 4.0,
                        rate_iso: float = 1.0,
                        scaling: float = 3.0) -> np.ndarray:
    """(B,l,l) random kernels: isotropic with prob rate_iso, else rotated
    anisotropic with y in [sig_min, sig_max] clipped scaling*x
    (model/util.py:260-297). Uses an explicit Generator instead of the
    reference's global np.random state."""
    out = np.zeros((batch, l, l))
    for i in range(batch):
        if rng.random() < rate_iso:
            sig = rng.random() * (sig_max - sig_min) + sig_min
            out[i] = isotropic_gaussian_kernel(l, sig)
        else:
            theta = rng.random() * math.pi * 2 - math.pi
            x = rng.random() * (sig_max - sig_min) + sig_min
            y = np.clip(rng.random() * scaling * x, sig_min, sig_max)
            out[i] = anisotropic_gaussian_kernel(l, cal_sigma(x, y, theta))
    return out.astype(np.float32)


def stable_batch_kernel(batch: int, l: int = 21,
                        sig: float = 2.6) -> np.ndarray:
    """(B,l,l) fixed isotropic kernels (model/util.py:299-304)."""
    return np.broadcast_to(isotropic_gaussian_kernel(l, sig),
                           (batch, l, l)).astype(np.float32)


# -------------------------------------------------------------------- PCA

def pca_matrix(kernels: np.ndarray, k: int = 2) -> np.ndarray:
    """PCA basis (l*l, k) over flattened kernels (model/util.py:230-235:
    mean-center, SVD of X^T, first k left singular vectors)."""
    x = kernels.reshape(kernels.shape[0], -1).astype(np.float64)
    x = x - x.mean(axis=0, keepdims=True)
    u, _, _ = np.linalg.svd(x.T, full_matrices=False)
    return u[:, :k].astype(np.float32)


def pca_encode(batch_kernel: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """(B,l,l) x (l*l,k) -> (B,k) kernel codes (PCAEncoder,
    model/util.py:368-381)."""
    b = batch_kernel.shape[0]
    return batch_kernel.reshape(b, -1) @ weight


# ------------------------------------------------------------------- blur

def batch_blur(x: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """Per-image depthwise blur with reflect padding (BatchBlur,
    model/util.py:383-406). x: (B,H,W,C) NHWC; kernels: (B,l,l)."""
    b, h, w, c = x.shape
    l = kernels.shape[-1]
    if l % 2 == 1:
        pads = (l // 2, l // 2)
        pad_spec = ((0, 0), pads, pads, (0, 0))
    else:
        pad_spec = ((0, 0), (l // 2, l // 2 - 1), (l // 2, l // 2 - 1),
                    (0, 0))
    xp = jnp.pad(x, pad_spec, mode="reflect")
    # group features as b*C + c so each image sees its own kernel
    xg = jnp.transpose(xp, (1, 2, 0, 3)).reshape(
        1, xp.shape[1], xp.shape[2], b * c)
    rhs = jnp.repeat(kernels[:, None, :, :], c, axis=1)  # (B, C, l, l)
    rhs = rhs.reshape(b * c, l, l)  # group g = b*C + c -> kernel b
    rhs = jnp.transpose(rhs, (1, 2, 0))[:, :, None, :]  # (l, l, 1, B*C)
    out = jax.lax.conv_general_dilated(
        xg, rhs.astype(x.dtype), (1, 1), "VALID",
        feature_group_count=b * c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.transpose(out.reshape(h, w, b, c), (2, 0, 1, 3))


# ------------------------------------------------------------------ noise

def random_batch_noise(rng: np.random.Generator, batch: int, high: float,
                       rate_cln: float = 1.0) -> np.ndarray:
    """(B,1) noise sigmas: uniform*high, zeroed with prob rate_cln
    (model/util.py:334-339)."""
    level = rng.uniform(size=(batch, 1)) * high
    mask = (rng.uniform(size=(batch, 1)) >= rate_cln).astype(np.float64)
    return (level * mask).astype(np.float32)


def gaussian_noising(x: jnp.ndarray, sigma: jnp.ndarray,
                     noise: jnp.ndarray,
                     clip: Tuple[float, float] = (0.0, 1.0)) -> jnp.ndarray:
    """x + sigma*noise, clamped (b_GaussianNoising, model/util.py:342-348).
    ``noise`` is standard normal of x's shape (passed in so the op is pure
    and testable); sigma broadcast from (B,1) over NHWC."""
    s = sigma.reshape(sigma.shape[0], 1, 1, 1)
    return jnp.clip(x + s * noise, clip[0], clip[1])


# --------------------------------------------------------- SRMD pipeline

class SRMDPreprocessing:
    """Blur -> bicubic-downsample -> noise -> (lr, degradation code)
    (model/util.py:408-463).

    Host side draws the per-batch kernels + noise levels (numpy Generator);
    the image pipeline is one jitted NHWC program. The degradation code is
    ``concat([PCA(kernel), noise_level*10])`` like the reference.
    """

    def __init__(self, scale: int, random: bool,
                 pca_weight: Optional[np.ndarray] = None, kernel: int = 21,
                 noise: bool = True, sig: float = 2.6, sig_min: float = 0.2,
                 sig_max: float = 4.0, rate_iso: float = 1.0,
                 scaling: float = 3.0, rate_cln: float = 0.2,
                 noise_high: float = 0.08, pca_dim: int = 15,
                 seed: int = 0):
        self.scale = int(scale)
        self.random = bool(random)
        self.l = int(kernel)
        self.noise = bool(noise)
        self.sig, self.sig_min, self.sig_max = sig, sig_min, sig_max
        self.rate_iso, self.scaling = rate_iso, scaling
        self.rate_cln, self.noise_high = rate_cln, noise_high
        self._rng = np.random.default_rng(seed)
        if pca_weight is None:
            # self-computed basis over a sample of random kernels (the
            # reference loads a precomputed pca_matrix.pth; none ships)
            sample = random_batch_kernel(
                np.random.default_rng(seed + 1), 1024, l=self.l,
                sig_min=sig_min, sig_max=sig_max, rate_iso=rate_iso,
                scaling=scaling)
            pca_weight = pca_matrix(sample, k=pca_dim)
        self.pca_weight = jnp.asarray(pca_weight)

        do_noise = self.noise

        @jax.jit
        def _device(hr, kernels, noise_level, noise_eps):
            blurred = batch_blur(hr, kernels)
            b, h, w, c = blurred.shape
            lr = jax.image.resize(
                blurred, (b, h // self.scale, w // self.scale, c),
                method="bicubic", antialias=True)
            if do_noise:  # the reference skips noising AND clamping when
                # noise is off (model/util.py:437-441)
                lr = gaussian_noising(lr, noise_level, noise_eps)
            code = pca_encode(kernels, self.pca_weight)
            if do_noise:  # noise-free code is the bare kernel code
                # (model/util.py:452-456)
                code = jnp.concatenate([code, noise_level * 10.0], axis=1)
            return lr, code

        self._device = _device

    def draw(self, batch: int):
        """Host-side randomness for one batch: (kernels, noise levels)."""
        if self.random:
            kernels = random_batch_kernel(
                self._rng, batch, l=self.l, sig_min=self.sig_min,
                sig_max=self.sig_max, rate_iso=self.rate_iso,
                scaling=self.scaling)
        else:
            kernels = stable_batch_kernel(batch, l=self.l, sig=self.sig)
        if self.noise:
            level = random_batch_noise(self._rng, batch, self.noise_high,
                                       self.rate_cln)
        else:
            level = np.zeros((batch, 1), np.float32)
        return kernels, level

    def __call__(self, hr: jnp.ndarray, rng_key=None,
                 return_kernel: bool = False):
        """hr: (B,H,W,C) in [0,1]. Returns (lr, code[, kernels])."""
        b = hr.shape[0]
        kernels, level = self.draw(b)
        if rng_key is None:
            rng_key = jax.random.PRNGKey(int(self._rng.integers(2 ** 31)))
        eps = jax.random.normal(
            rng_key, (b, hr.shape[1] // self.scale,
                      hr.shape[2] // self.scale, hr.shape[3]), hr.dtype)
        lr, code = self._device(hr, jnp.asarray(kernels),
                                jnp.asarray(level), eps)
        return (lr, code, kernels) if return_kernel else (lr, code)


def create_downsampling_dataset(datapath: str, dstpath: str, scale: int,
                                seed: int = 0, kernel: int = 21,
                                sig_min: float = 0.2,
                                sig_max: float = 4.0) -> int:
    """Offline blur-degraded LR dataset builder (model/util.py:958-995):
    walk class subfolders, random-gaussian-blur + bicubic-downsample each
    image, save ``<name>_downsample.png``. Returns the image count."""
    import os

    from PIL import Image

    from ..data.dataset import get_paths_from_images

    pre = SRMDPreprocessing(scale=scale, random=True, kernel=kernel,
                            noise=False, sig_min=sig_min, sig_max=sig_max,
                            seed=seed)
    n = 0
    for path in get_paths_from_images(datapath):
        rel = os.path.relpath(os.path.dirname(path), datapath)
        out_dir = os.path.join(dstpath, rel) if rel != "." else dstpath
        os.makedirs(out_dir, exist_ok=True)
        with Image.open(path) as im:
            arr = np.asarray(im.convert("RGB"), np.float32) / 255.0
        h, w = arr.shape[:2]
        arr = arr[:h - h % scale, :w - w % scale]
        lr, _ = pre(jnp.asarray(arr[None]))
        lr8 = np.clip(np.asarray(lr[0]) * 255.0, 0, 255).round().astype(
            np.uint8)
        base = os.path.splitext(os.path.basename(path))[0]
        Image.fromarray(lr8).save(
            os.path.join(out_dir, base + "_downsample.png"))
        n += 1
    return n


# ------------------------------------------------- dataset noise injectors

def add_salt_pepper_noise(img_u8: np.ndarray, density: float,
                          rng: Optional[np.random.Generator] = None
                          ) -> np.ndarray:
    """Pepper 0 / salt 255 with total density, one mask shared across
    channels (AddSaltPepperNoise, data/dataset.py:15-31)."""
    rng = rng or np.random.default_rng()
    h, w, c = img_u8.shape
    nd = density
    mask = rng.choice(np.array([0, 1, 2]), size=(h, w, 1),
                      p=[nd / 2.0, nd / 2.0, 1 - nd])
    mask = np.repeat(mask, c, axis=2)
    out = img_u8.copy()
    out[mask == 0] = 0
    out[mask == 1] = 255
    return out


def add_gaussian_noise(img_u8: np.ndarray, mean: float = 0.0,
                       variance: float = 1.0, amplitude: float = 1.0,
                       rng: Optional[np.random.Generator] = None
                       ) -> np.ndarray:
    """Additive per-pixel (channel-shared) gaussian noise, clipped high
    side only then uint8-cast, matching the reference's overflow handling
    (AddGaussianNoise, data/dataset.py:33-48)."""
    rng = rng or np.random.default_rng()
    h, w, c = img_u8.shape
    n = amplitude * rng.normal(loc=mean, scale=variance, size=(h, w, 1))
    n = np.repeat(n, c, axis=2)
    out = n + img_u8.astype(np.float64)
    out[out > 255] = 255
    return out.astype(np.uint8)
