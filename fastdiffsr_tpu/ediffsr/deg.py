"""EDiffSR degradation utilities (reference EDiffSR/codes/utils/deg_utils.py).

- ``upscale`` (:38) — bicubic conditioning upsample (F.interpolate ->
  jax.image.resize), the per-iter hot path shared by train/val/test.
- ``add_noise`` (:13) — denoising-task degradation: x + N(0,1)*sigma with
  the sigma>1 => sigma/255 convention.
- ``mask_to`` (:19) — inpainting-task degradation: keep-mask applied to
  the image, holes filled with 1.0; masks come from a folder of pngs
  (nearest-resized to the image), index random per batch element or fixed.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


def upscale(x: jnp.ndarray, scale: int = 4,
            mode: str = "bicubic") -> jnp.ndarray:
    """(B,H,W,C) -> (B,H*s,W*s,C) (deg_utils.py:38-40)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * scale, w * scale, c), method=mode)


def add_noise(x: jnp.ndarray, sigma: float, key: jax.Array) -> jnp.ndarray:
    """x + N(0,1)*sigma; sigma given in [0,255] units is rescaled
    (deg_utils.py:13-15)."""
    sigma = sigma / 255.0 if sigma > 1 else sigma
    return x + jax.random.normal(key, x.shape, x.dtype) * sigma


def _load_mask(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0


def mask_to(x: jnp.ndarray, mask_root: str, mask_id: int = -1,
            n: int = 100,
            rng: Optional[np.random.Generator] = None) -> jnp.ndarray:
    """Apply keep-masks from ``mask_root/{id:06d}.png``: masked regions
    (mask==0) become 1.0 (deg_utils.py:19-34). mask_id < 0 draws one
    random mask per batch element."""
    b, h, w, c = x.shape
    if mask_id < 0:
        rng = rng or np.random.default_rng()
        ids = rng.integers(0, n, b)
        masks = np.stack([
            _load_mask(os.path.join(mask_root, f"{int(i):06d}.png"))
            for i in ids])
    else:
        masks = _load_mask(
            os.path.join(mask_root, f"{mask_id:06d}.png"))[None]
        masks = np.broadcast_to(masks, (b,) + masks.shape[1:])
    m = jax.image.resize(jnp.asarray(masks), (b, h, w, masks.shape[-1]),
                         method="nearest")
    if m.shape[-1] != c:
        m = m[..., :1].repeat(c, axis=-1)
    return m * x + (1.0 - m)
