"""LPIPS golden parity vs the reference's vendored PerceptualSimilarity.

The torchvision AlexNet backbone weights are not downloadable offline, so
the backbone is SYNTHETIC (seeded random) and injected into BOTH
implementations — that validates the whole LPIPS graph (scaling layer,
feature taps, channel-normalize, squared diff, linear heads, spatial
average) bit-for-bit; only the backbone weight VALUES stay env-gated.
The linear heads are the REAL reference weights
(MSI_SR_model/utils/PerceptualSimilarity/weights/v0.1/alex.pth).

Importing the vendored package needs two shims: a ``torchvision`` stub
whose ``models.alexnet().features`` is the standard torchvision layout
with seeded weights, and ``skimage.measure.compare_ssim`` (removed in
modern skimage; only imported, not used here).
"""

import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, requires_reference

PS_DIR = (REFERENCE_ROOT / "MSI_SR_model" / "utils"
          / "PerceptualSimilarity")

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


def _torchvision_alexnet_features(seed=0):
    """The torchvision alexnet().features layout (indices match the
    vendored slicing, pretrained_networks.py:60-76), seeded random."""
    torch.manual_seed(seed)
    return nn.Sequential(
        nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(inplace=True),
        nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(inplace=True),
        nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(inplace=True),
        nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(inplace=True),
        nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(inplace=True),
        nn.MaxPool2d(3, 2),
    )


@pytest.fixture()
def vendored_pnetlin(monkeypatch):
    """Import the vendored networks_basic.PNetLin behind the two shims."""
    feats = _torchvision_alexnet_features()

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")

    class _FakeAlexNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = feats

    tv_models.alexnet = lambda pretrained=True: _FakeAlexNet()
    tv.models = tv_models
    monkeypatch.setitem(sys.modules, "torchvision", tv)
    monkeypatch.setitem(sys.modules, "torchvision.models", tv_models)

    # skimage is absent in this env; networks_basic only imports
    # skimage.color (never called on the LPIPS path) — stub the package
    try:
        import skimage.measure
        if not hasattr(skimage.measure, "compare_ssim"):
            monkeypatch.setattr(skimage.measure, "compare_ssim",
                                lambda *a, **k: None, raising=False)
    except ImportError:
        sk = types.ModuleType("skimage")
        sk_color = types.ModuleType("skimage.color")
        sk_measure = types.ModuleType("skimage.measure")
        sk_measure.compare_ssim = lambda *a, **k: None
        sk_transform = types.ModuleType("skimage.transform")
        sk.color, sk.measure, sk.transform = (sk_color, sk_measure,
                                              sk_transform)
        monkeypatch.setitem(sys.modules, "skimage", sk)
        monkeypatch.setitem(sys.modules, "skimage.color", sk_color)
        monkeypatch.setitem(sys.modules, "skimage.measure", sk_measure)
        monkeypatch.setitem(sys.modules, "skimage.transform", sk_transform)

    monkeypatch.syspath_prepend(str(PS_DIR.parent.parent))  # MSI_SR_model
    for mod in [m for m in sys.modules
                if m.startswith("utils") or m == "PerceptualSimilarity"]:
        monkeypatch.delitem(sys.modules, mod, raising=False)
    from utils.PerceptualSimilarity import networks_basic  # noqa

    net = networks_basic.PNetLin(pnet_type="alex", pnet_rand=True,
                                 use_dropout=True, spatial=False,
                                 version="0.1", lpips=True, use_gpu=False)
    sd = torch.load(str(PS_DIR / "weights" / "v0.1" / "alex.pth"),
                    map_location="cpu")
    net.load_state_dict(sd, strict=False)
    net.eval()
    return net, feats


@requires_reference
def test_lpips_golden_vs_vendored(vendored_pnetlin):
    from fastdiffsr_tpu.lpips_jax import (LPIPSJax,
                                          backbone_params_from_torch_features,
                                          load_reference_linear_heads)

    net, feats = vendored_pnetlin
    params = backbone_params_from_torch_features(feats)
    lins = load_reference_linear_heads(
        str(PS_DIR / "weights" / "v0.1" / "alex.pth"))
    ours = LPIPSJax(params, lins)

    rng = np.random.default_rng(7)
    for trial in range(3):
        a = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        b = np.clip(a.astype(np.int32)
                    + rng.integers(-40, 40, a.shape), 0, 255).astype(
            np.uint8)

        d_jax = ours.distance(a, b)

        def to_t(img):
            x = img.astype(np.float32) / 255.0 * 2.0 - 1.0
            return torch.from_numpy(x.transpose(2, 0, 1))[None]

        with torch.no_grad():
            d_ref = float(net(to_t(a), to_t(b)).flatten()[0])
        np.testing.assert_allclose(d_jax, d_ref, rtol=1e-4, atol=1e-6)


@requires_reference
def test_lpips_identical_images_zero(vendored_pnetlin):
    from fastdiffsr_tpu.lpips_jax import (LPIPSJax,
                                          backbone_params_from_torch_features,
                                          load_reference_linear_heads)
    net, feats = vendored_pnetlin
    ours = LPIPSJax(backbone_params_from_torch_features(feats),
                    load_reference_linear_heads(
                        str(PS_DIR / "weights" / "v0.1" / "alex.pth")))
    img = np.random.default_rng(0).integers(0, 256, (32, 32, 3),
                                            dtype=np.uint8)
    assert ours.distance(img, img) == pytest.approx(0.0, abs=1e-7)


@requires_reference
def test_reference_linear_heads_convert():
    from fastdiffsr_tpu.lpips_jax import load_reference_linear_heads
    lins = load_reference_linear_heads(
        str(PS_DIR / "weights" / "v0.1" / "alex.pth"))
    assert [lin.shape[0] for lin in lins] == [64, 192, 384, 256, 256]
    # LPIPS heads are ReLU-rectified at train time -> non-negative
    assert all((lin >= 0).all() for lin in lins)
