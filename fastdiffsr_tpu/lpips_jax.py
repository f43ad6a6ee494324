"""LPIPS (AlexNet backbone) in JAX.

Reference: the vendored PerceptualSimilarity package
(MSI_SR_model/utils/PerceptualSimilarity/) used by core/metrics.py:154-164.
The linear-calibration heads ship with the reference (tiny .pth files), but
the AlexNet *backbone* weights come from torchvision's model zoo, which
this offline environment cannot download — so LPIPS is optional here:

- If a converted weight pack exists (``FASTDIFFSR_TPU_LPIPS`` env var or
  ``fastdiffsr_tpu/assets/lpips_alex.npz``), it is loaded ONCE (the
  reference constructs a fresh LPIPS model per metric call) and distances
  run jitted on device.
- Otherwise ``LPIPSJax.load_default()`` raises and metrics.calculate_lpips
  returns None with a single warning.

To produce the pack on a machine with torchvision:
    python -m fastdiffsr_tpu.lpips_jax --export lpips_alex.npz
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

# AlexNet feature slices used by LPIPS (conv indices in torchvision order)
_ALEX_CFG = [  # (out_channels, kernel, stride, padding)
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _alex_features(params, x):
    """x: (B,H,W,3) in [-1,1] (LPIPS scaling applied by caller)."""
    feats = []
    h = x
    for i, (co, k, s, p) in enumerate(_ALEX_CFG):
        w = params[f"conv{i}_w"]
        b = params[f"conv{i}_b"]
        h = jax.lax.conv_general_dilated(
            h, w, (s, s), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = h + b
        h = jax.nn.relu(h)
        feats.append(h)
        if i in (0, 1):  # maxpool after conv1/conv2 (and after conv5,
            # but LPIPS taps before it)
            h = -jax.lax.reduce_window(-h, jnp.inf, jax.lax.min,
                                       (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
    return feats


def _normalize(feat, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(feat ** 2, axis=-1, keepdims=True))
    return feat / (norm + eps)


class LPIPSJax:
    def __init__(self, params: dict, lin_weights: Sequence[np.ndarray]):
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self.lins = [jnp.asarray(w) for w in lin_weights]

        def dist(p, lins, a, b):
            fa = _alex_features(p, a)
            fb = _alex_features(p, b)
            total = 0.0
            for f1, f2, lin in zip(fa, fb, lins):
                d = (_normalize(f1) - _normalize(f2)) ** 2
                d = jnp.sum(d * lin[None, None, None, :], axis=-1)
                total = total + jnp.mean(d, axis=(1, 2))
            return total

        self._dist = jax.jit(dist)

    @classmethod
    def load_default(cls) -> "LPIPSJax":
        path = os.environ.get(
            "FASTDIFFSR_TPU_LPIPS",
            os.path.join(os.path.dirname(__file__), "assets",
                         "lpips_alex.npz"))
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"LPIPS weight pack not found at {path}; export one with "
                "python -m fastdiffsr_tpu.lpips_jax --export (requires "
                "torchvision)")
        data = np.load(path)
        params = {k: data[k] for k in data.files if k.startswith("conv")}
        lins = [data[f"lin{i}"] for i in range(5)]
        return cls(params, lins)

    def distance(self, img1_u8: np.ndarray, img2_u8: np.ndarray) -> float:
        def prep(img):
            x = img.astype(np.float32) / 255.0 * 2.0 - 1.0
            x = (x - _SHIFT) / _SCALE
            return jnp.asarray(x[None])

        return float(self._dist(self.params, self.lins,
                                prep(img1_u8), prep(img2_u8))[0])


REFERENCE_ALEX_HEADS = ("/root/reference/FastDiffSR/MSI_SR_model/utils/"
                        "PerceptualSimilarity/weights/v0.1/alex.pth")


def load_reference_linear_heads(path: str = REFERENCE_ALEX_HEADS):
    """Convert the reference's vendored LPIPS v0.1 alex linear heads
    (MSI_SR_model/utils/PerceptualSimilarity/weights/v0.1/alex.pth —
    five 1x1 convs ``lin{i}.model.1.weight`` of shape (1,C,1,1)) to the
    (C,) per-channel weights our graph consumes. These ship WITH the
    reference; only the torchvision AlexNet backbone stays env-gated."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return [sd[f"lin{i}.model.1.weight"].numpy()[0, :, 0, 0]
            for i in range(5)]


def backbone_params_from_torch_features(features) -> dict:
    """Convert a torchvision-layout ``alexnet().features`` Sequential to
    our conv param dict (OIHW -> HWIO)."""
    import torch

    convs = [m for m in features if isinstance(m, torch.nn.Conv2d)]
    params = {}
    for i, m in enumerate(convs):
        params[f"conv{i}_w"] = m.weight.detach().numpy().transpose(
            2, 3, 1, 0)
        params[f"conv{i}_b"] = m.bias.detach().numpy()
    return params


def export_pack(out_path: str):  # pragma: no cover - needs torchvision
    """Convert torchvision alexnet + the vendored linear heads to the npz
    pack."""
    from torchvision.models import alexnet

    params = backbone_params_from_torch_features(
        alexnet(pretrained=True).features)
    try:
        lins = load_reference_linear_heads()
    except Exception:
        import lpips
        ln = lpips.LPIPS(net="alex")
        lins = [lin.model[1].weight.detach().numpy()[0, :, 0, 0]
                for lin in ln.lins]
    for i, lin in enumerate(lins):
        params[f"lin{i}"] = lin
    np.savez(out_path, **params)


if __name__ == "__main__":  # pragma: no cover
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--export", type=str, required=True)
    export_pack(p.parse_args().export)
