"""VGG19 feature extractor for perceptual/content losses (JAX).

Parity targets:
- EDiffSR ``define_F`` (EDiffSR/codes/config/sisr/models/networks.py:27-39):
  "PyTorch pretrained VGG19-54, before ReLU" — feature_layer 34 (49 with
  BN), input-normalized. NOTE the referenced ``M.VGGFeatureExtractor``
  class is never defined in the reference tree (latent dead import, like
  core.PerceptualSimilarity); the semantics follow the BasicSR original
  it vendors from: output of ``features[feature_layer]`` INCLUSIVE, input
  in [0,1] normalized with ImageNet mean/std.
- MSI ``FeatureExtractor`` (MSI_SR_model/model/swinir.py:60-70):
  ``vgg19.features[:12]`` (through relu3_1), NO input norm, used for the
  Charbonnier content loss (swinir.py:948-953).

The torchvision VGG19 backbone weights are not downloadable offline, so
this is weights-gated like LPIPS: the graph + converter are golden-tested
with synthetic weights (tests/test_vgg_feat.py); a converted pack can be
supplied via ``FASTDIFFSR_TPU_VGG`` or fastdiffsr_tpu/assets/vgg19.npz.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# torchvision VGG19 cfg 'E'
_CFG: Tuple = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
               512, 512, 512, 512, "M", 512, 512, 512, 512, "M")

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def layer_table(use_bn: bool = False) -> List[Tuple[str, Optional[int]]]:
    """torchvision ``features`` index table: list of (kind, out_ch) where
    kind in {conv, bn, relu, pool} — index i = features[i]."""
    table: List[Tuple[str, Optional[int]]] = []
    for v in _CFG:
        if v == "M":
            table.append(("pool", None))
        else:
            table.append(("conv", v))
            if use_bn:
                table.append(("bn", v))
            table.append(("relu", None))
    return table


class VGGFeatureExtractor:
    """Feature maps of VGG19 ``features[: feature_layer + 1]``.

    params: dict with ``conv{i}_w`` (HWIO) / ``conv{i}_b`` per torchvision
    features index i (and ``bn{i}_{scale,bias,mean,var}`` when use_bn).
    Input NHWC in [0, 1]; ``use_input_norm`` applies the ImageNet
    normalization (BasicSR convention used by define_F).
    """

    def __init__(self, params: Dict[str, np.ndarray],
                 feature_layer: int = 34, use_bn: bool = False,
                 use_input_norm: bool = True):
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self.feature_layer = int(feature_layer)
        self.use_bn = use_bn
        self.use_input_norm = use_input_norm
        self._table = layer_table(use_bn)[: self.feature_layer + 1]

        def forward(params, x):
            if self.use_input_norm:
                x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
            for i, (kind, _c) in enumerate(self._table):
                if kind == "conv":
                    w = params[f"conv{i}_w"]
                    b = params[f"conv{i}_b"]
                    x = jax.lax.conv_general_dilated(
                        x, w, (1, 1), ((1, 1), (1, 1)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
                elif kind == "bn":
                    x = ((x - params[f"bn{i}_mean"])
                         * jax.lax.rsqrt(params[f"bn{i}_var"] + 1e-5)
                         * params[f"bn{i}_scale"] + params[f"bn{i}_bias"])
                elif kind == "relu":
                    x = jax.nn.relu(x)
                else:  # pool: 2x2 stride-2 max
                    x = -jax.lax.reduce_window(
                        -x, jnp.inf, jax.lax.min, (1, 2, 2, 1),
                        (1, 2, 2, 1), "VALID")
            return x

        self._forward = jax.jit(forward)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._forward(self.params, x)


def msi_feature_extractor(params: Dict[str, np.ndarray]
                          ) -> VGGFeatureExtractor:
    """The MSI content-loss extractor: vgg19.features[:12] == through
    index 11 (relu3_1), no input norm (swinir.py:60-70)."""
    return VGGFeatureExtractor(params, feature_layer=11,
                               use_input_norm=False)


def torch_vgg_features_to_params(features) -> Dict[str, np.ndarray]:
    """Convert a torchvision-layout ``vgg19().features`` Sequential
    (torch module) to the params dict (OIHW -> HWIO)."""
    import torch

    params: Dict[str, np.ndarray] = {}
    for i, m in enumerate(features):
        if isinstance(m, torch.nn.Conv2d):
            params[f"conv{i}_w"] = m.weight.detach().numpy().transpose(
                2, 3, 1, 0)
            params[f"conv{i}_b"] = m.bias.detach().numpy()
        elif isinstance(m, torch.nn.BatchNorm2d):
            params[f"bn{i}_scale"] = m.weight.detach().numpy()
            params[f"bn{i}_bias"] = m.bias.detach().numpy()
            params[f"bn{i}_mean"] = m.running_mean.detach().numpy()
            params[f"bn{i}_var"] = m.running_var.detach().numpy()
    return params


def load_default(feature_layer: int = 34,
                 use_input_norm: bool = True) -> VGGFeatureExtractor:
    """Load from the converted weight pack (env-gated like LPIPS)."""
    path = os.environ.get(
        "FASTDIFFSR_TPU_VGG",
        os.path.join(os.path.dirname(__file__), "..", "assets",
                     "vgg19.npz"))
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"VGG19 weight pack not found at {path}; export one with "
            "python -m fastdiffsr_tpu.models.vgg_feat --export "
            "(requires torchvision)")
    data = np.load(path)
    return VGGFeatureExtractor({k: data[k] for k in data.files},
                               feature_layer=feature_layer,
                               use_input_norm=use_input_norm)


def export_pack(out_path: str):  # pragma: no cover - needs torchvision
    from torchvision.models import vgg19

    params = torch_vgg_features_to_params(vgg19(pretrained=True).features)
    np.savez(out_path, **params)


if __name__ == "__main__":  # pragma: no cover
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--export", type=str, required=True)
    export_pack(p.parse_args().export)
