"""VGG19 feature extractor: golden parity vs a torch VGG19 features stack
with synthetic seeded weights injected into both (the torchvision backbone
weights are env-gated, the graph is not)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fastdiffsr_tpu.models.vgg_feat import (VGGFeatureExtractor,
                                            layer_table,
                                            msi_feature_extractor,
                                            torch_vgg_features_to_params)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


def _torch_vgg19_features(use_bn=False, seed=0):
    """torchvision vgg19().features layout with seeded random weights."""
    torch.manual_seed(seed)
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers, in_c = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_c, v, 3, padding=1))
            if use_bn:
                bn = nn.BatchNorm2d(v)
                with torch.no_grad():
                    bn.running_mean.normal_(0, 0.1)
                    bn.running_var.uniform_(0.5, 1.5)
                layers.append(bn)
            layers.append(nn.ReLU(inplace=True))
            in_c = v
    return nn.Sequential(*layers)


@pytest.mark.parametrize("feature_layer,use_bn", [(34, False), (11, False),
                                                  (49, True)])
def test_vgg_feature_golden(feature_layer, use_bn):
    feats = _torch_vgg19_features(use_bn).eval()
    params = torch_vgg_features_to_params(feats)
    ours = VGGFeatureExtractor(params, feature_layer=feature_layer,
                               use_bn=use_bn, use_input_norm=True)

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)

    out_j = np.asarray(ours(jnp.asarray(x)))

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        out_t = feats[: feature_layer + 1]((xt - mean) / std)
    out_t = out_t.numpy().transpose(0, 2, 3, 1)
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=3e-4, rtol=1e-4)


def test_msi_extractor_shape():
    """MSI content-loss extractor = features[:12] (through relu3_1),
    256 channels at 1/4 resolution, no input norm (swinir.py:60-70)."""
    feats = _torch_vgg19_features()
    params = torch_vgg_features_to_params(feats)
    ours = msi_feature_extractor(params)
    x = jnp.zeros((1, 32, 32, 3))
    out = ours(x)
    assert out.shape == (1, 8, 8, 256)

    with torch.no_grad():
        out_t = feats[:12](torch.zeros(1, 3, 32, 32))
    assert tuple(out_t.shape) == (1, 256, 8, 8)


def test_layer_table_indices():
    """Table indices match torchvision's features indexing: conv5_4 at 34
    (no BN), 49 with BN."""
    t = layer_table(False)
    assert len(t) == 37
    assert t[34][0] == "conv" and t[0][0] == "conv" and t[4][0] == "pool"
    tb = layer_table(True)
    assert len(tb) == 53 and tb[49][0] == "conv"