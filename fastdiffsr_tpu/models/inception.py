"""InceptionV3 (FID variant) feature extractor in JAX.

Parity target: the reference scores FID by shelling out to ``pytorch_fid``
(reference FID.py:5-21), whose network is torchvision's Inception3 with
the FID-specific pooling tweaks (FIDInceptionA/C/E: avg-pool branches use
count_include_pad=False; the second InceptionE uses max-pool) and the
TF-ported weights. Neither torchvision nor the weight download exist in
this environment, so — like LPIPS (lpips_jax.py) — the GRAPH + converter
live here, golden-tested against a torch replica with synthetic weights
(tests/test_inception.py); the weight pack is env-gated
(``FASTDIFFSR_TPU_INCEPTION`` or fastdiffsr_tpu/assets/inception_fid.npz).

Input contract (pytorch_fid defaults): NHWC float in [0,1], bilinearly
resized to 299x299 (align_corners=False), scaled to [-1,1]; output is the
(B, 2048) pool3 feature used for FID statistics.

Params: a flat dict of torchvision state_dict names -> numpy arrays with
conv kernels already in HWIO (see ``torch_inception_to_params``).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

BN_EPS = 1e-3  # torchvision BasicConv2d BatchNorm2d(eps=0.001)


def _conv_bn(params: Dict, prefix: str, x, stride=(1, 1),
             padding=((0, 0), (0, 0))):
    """BasicConv2d: conv(bias-free) + BN + relu."""
    w = params[f"{prefix}.conv.weight"]
    x = jax.lax.conv_general_dilated(
        x, w, stride, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = ((x - params[f"{prefix}.bn.running_mean"])
         * jax.lax.rsqrt(params[f"{prefix}.bn.running_var"] + BN_EPS)
         * params[f"{prefix}.bn.weight"] + params[f"{prefix}.bn.bias"])
    return jax.nn.relu(x)


def _max_pool(x, k, s, pad=0):
    return -jax.lax.reduce_window(
        -x, jnp.inf, jax.lax.min, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)))


def _avg_pool_3x3_nocountpad(x):
    """3x3 stride-1 pad-1 average pool with count_include_pad=False (the
    FIDInception tweak): divide by the number of VALID taps per position."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), pad)
    n = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), pad)
    return s / n


def _inception_a(p, pre, x):
    b1 = _conv_bn(p, f"{pre}.branch1x1", x)
    b5 = _conv_bn(p, f"{pre}.branch5x5_1", x)
    b5 = _conv_bn(p, f"{pre}.branch5x5_2", b5, padding=((2, 2), (2, 2)))
    b3 = _conv_bn(p, f"{pre}.branch3x3dbl_1", x)
    b3 = _conv_bn(p, f"{pre}.branch3x3dbl_2", b3, padding=((1, 1), (1, 1)))
    b3 = _conv_bn(p, f"{pre}.branch3x3dbl_3", b3, padding=((1, 1), (1, 1)))
    bp = _conv_bn(p, f"{pre}.branch_pool", _avg_pool_3x3_nocountpad(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, pre, x):
    b3 = _conv_bn(p, f"{pre}.branch3x3", x, stride=(2, 2))
    bd = _conv_bn(p, f"{pre}.branch3x3dbl_1", x)
    bd = _conv_bn(p, f"{pre}.branch3x3dbl_2", bd, padding=((1, 1), (1, 1)))
    bd = _conv_bn(p, f"{pre}.branch3x3dbl_3", bd, stride=(2, 2))
    return jnp.concatenate([b3, bd, _max_pool(x, 3, 2)], axis=-1)


def _inception_c(p, pre, x):
    p0 = ((0, 0), (0, 0))
    p13 = ((0, 0), (3, 3))
    p31 = ((3, 3), (0, 0))
    b1 = _conv_bn(p, f"{pre}.branch1x1", x)
    b7 = _conv_bn(p, f"{pre}.branch7x7_1", x)
    b7 = _conv_bn(p, f"{pre}.branch7x7_2", b7, padding=p13)
    b7 = _conv_bn(p, f"{pre}.branch7x7_3", b7, padding=p31)
    bd = _conv_bn(p, f"{pre}.branch7x7dbl_1", x)
    bd = _conv_bn(p, f"{pre}.branch7x7dbl_2", bd, padding=p31)
    bd = _conv_bn(p, f"{pre}.branch7x7dbl_3", bd, padding=p13)
    bd = _conv_bn(p, f"{pre}.branch7x7dbl_4", bd, padding=p31)
    bd = _conv_bn(p, f"{pre}.branch7x7dbl_5", bd, padding=p13)
    bp = _conv_bn(p, f"{pre}.branch_pool", _avg_pool_3x3_nocountpad(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, pre, x):
    b3 = _conv_bn(p, f"{pre}.branch3x3_1", x)
    b3 = _conv_bn(p, f"{pre}.branch3x3_2", b3, stride=(2, 2))
    b7 = _conv_bn(p, f"{pre}.branch7x7x3_1", x)
    b7 = _conv_bn(p, f"{pre}.branch7x7x3_2", b7,
                  padding=((0, 0), (3, 3)))
    b7 = _conv_bn(p, f"{pre}.branch7x7x3_3", b7,
                  padding=((3, 3), (0, 0)))
    b7 = _conv_bn(p, f"{pre}.branch7x7x3_4", b7, stride=(2, 2))
    return jnp.concatenate([b3, b7, _max_pool(x, 3, 2)], axis=-1)


def _inception_e(p, pre, x, pool: str):
    b1 = _conv_bn(p, f"{pre}.branch1x1", x)
    b3 = _conv_bn(p, f"{pre}.branch3x3_1", x)
    b3 = jnp.concatenate([
        _conv_bn(p, f"{pre}.branch3x3_2a", b3, padding=((0, 0), (1, 1))),
        _conv_bn(p, f"{pre}.branch3x3_2b", b3, padding=((1, 1), (0, 0))),
    ], axis=-1)
    bd = _conv_bn(p, f"{pre}.branch3x3dbl_1", x)
    bd = _conv_bn(p, f"{pre}.branch3x3dbl_2", bd, padding=((1, 1), (1, 1)))
    bd = jnp.concatenate([
        _conv_bn(p, f"{pre}.branch3x3dbl_3a", bd,
                 padding=((0, 0), (1, 1))),
        _conv_bn(p, f"{pre}.branch3x3dbl_3b", bd,
                 padding=((1, 1), (0, 0))),
    ], axis=-1)
    if pool == "max":  # FIDInceptionE_2 (pytorch_fid)
        bp = _max_pool(x, 3, 1, pad=1)
    else:  # FIDInceptionE_1: avg, count_include_pad=False
        bp = _avg_pool_3x3_nocountpad(x)
    bp = _conv_bn(p, f"{pre}.branch_pool", bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_pool3(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """(B, 299, 299, 3) in [-1, 1] -> (B, 2048) pool3 features."""
    p1 = ((1, 1), (1, 1))
    x = _conv_bn(params, "Conv2d_1a_3x3", x, stride=(2, 2))
    x = _conv_bn(params, "Conv2d_2a_3x3", x)
    x = _conv_bn(params, "Conv2d_2b_3x3", x, padding=p1)
    x = _max_pool(x, 3, 2)
    x = _conv_bn(params, "Conv2d_3b_1x1", x)
    x = _conv_bn(params, "Conv2d_4a_3x3", x)
    x = _max_pool(x, 3, 2)
    x = _inception_a(params, "Mixed_5b", x)
    x = _inception_a(params, "Mixed_5c", x)
    x = _inception_a(params, "Mixed_5d", x)
    x = _inception_b(params, "Mixed_6a", x)
    x = _inception_c(params, "Mixed_6b", x)
    x = _inception_c(params, "Mixed_6c", x)
    x = _inception_c(params, "Mixed_6d", x)
    x = _inception_c(params, "Mixed_6e", x)
    x = _inception_d(params, "Mixed_7a", x)
    x = _inception_e(params, "Mixed_7b", x, pool="avg")
    x = _inception_e(params, "Mixed_7c", x, pool="max")
    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1


class InceptionFID:
    """pytorch_fid-compatible feature extractor: resize 299 bilinear,
    scale to [-1,1], pool3 features."""

    def __init__(self, params: Dict[str, np.ndarray]):
        self.params = {k: jnp.asarray(v) for k, v in params.items()}

        def run(params, x01):
            b, h, w, c = x01.shape
            # antialias=False: pytorch_fid resizes with F.interpolate
            # (bilinear, no antialias) — jax.image.resize's default
            # antialias would diverge on downscaled (>299px) inputs
            x = jax.image.resize(x01, (b, 299, 299, c), method="bilinear",
                                 antialias=False)
            return inception_pool3(params, x * 2.0 - 1.0)

        self._run = jax.jit(run)

    def __call__(self, x01: jnp.ndarray) -> np.ndarray:
        """x01: (B,H,W,C) float in [0,1] -> (B, 2048) numpy."""
        return np.asarray(self._run(self.params, x01))


def torch_inception_to_params(state_dict) -> Dict[str, np.ndarray]:
    """torchvision/pytorch_fid Inception3 state_dict -> flat params
    (conv OIHW -> HWIO; BN tensors passthrough; fc/AuxLogits dropped)."""
    out: Dict[str, np.ndarray] = {}
    for k, v in state_dict.items():
        if k.startswith(("fc.", "AuxLogits.")) or \
                k.endswith("num_batches_tracked"):
            continue
        arr = v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
        if k.endswith(".conv.weight"):
            arr = arr.transpose(2, 3, 1, 0)
        out[k] = arr
    return out


def load_default() -> InceptionFID:
    path = os.environ.get(
        "FASTDIFFSR_TPU_INCEPTION",
        os.path.join(os.path.dirname(__file__), "..", "assets",
                     "inception_fid.npz"))
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Inception FID weight pack not found at {path}; export with "
            "python -m fastdiffsr_tpu.models.inception --export "
            "(requires pytorch_fid or torchvision)")
    data = np.load(path)
    return InceptionFID({k: data[k] for k in data.files})


def export_pack(out_path: str):  # pragma: no cover - needs downloads
    try:
        from pytorch_fid.inception import InceptionV3

        net = InceptionV3([3]).blocks  # loads the FID weights
        import torch

        sd = {}
        for blk in net:
            for name, mod in blk.named_modules():
                for pk, pv in mod.state_dict(keep_vars=False).items():
                    sd[f"{name}.{pk}" if name else pk] = pv
        params = torch_inception_to_params(sd)
    except Exception as e:
        import warnings

        warnings.warn(
            "pytorch_fid unavailable (%r); falling back to torchvision's "
            "STANDARD inception_v3 weights. These are NOT pytorch_fid's "
            "TF-ported FID weights — FID scores from this pack are not "
            "comparable to reference-reported numbers." % (e,))
        from torchvision.models import inception_v3

        net = inception_v3(pretrained=True, aux_logits=True)
        params = torch_inception_to_params(net.state_dict())
    np.savez(out_path, **params)


if __name__ == "__main__":  # pragma: no cover
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--export", type=str, required=True)
    export_pack(p.parse_args().export)
