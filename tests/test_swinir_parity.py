"""Golden parity: Flax SwinIR vs the reference GeneratorResNet (small
config) with converted weights — pins window attention, relative position
bias, shift masking, RSTB residuals and the pixelshuffle upsampler."""

import numpy as np
import pytest

import jax.numpy as jnp

from fastdiffsr_tpu.msi.swinir import SwinIR
from fastdiffsr_tpu.models.convert import torch_swinir_to_flax
from tests.conftest import requires_reference, REFERENCE_ROOT


def _load_ref_generator():
    import torch  # noqa: F401
    path = REFERENCE_ROOT / "MSI_SR_model" / "model" / "swinir.py"
    src = path.read_text()
    lines = src.split("\n")
    # keep everything up to (excluding) the trainer class `class SwinIR(object)`
    for i, ln in enumerate(lines):
        if ln.startswith("class SwinIR(object)"):
            lines = lines[:i]
            break
    # strip unavailable imports (torchvision/skimage/timm/local utils/data)
    bad_prefixes = ("from torchvision", "import torchvision",
                    "from skimage", "from utils", "from data",
                    "from timm", "import timm", "from loss")
    lines = [ln for ln in lines
             if not ln.strip().startswith(bad_prefixes)]
    src = "\n".join(lines)

    # stubs for the timm pieces the generator uses
    import torch
    import torch.nn as t_nn

    class DropPath(t_nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x  # eval-mode identity (drop_path_rate=0 in tests)

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    def trunc_normal_(tensor, std=1.0, **kw):
        with torch.no_grad():
            tensor.normal_(0, std).clamp_(-2 * std, 2 * std)
        return tensor

    ns = {"__name__": "ref_swinir", "DropPath": DropPath,
          "to_2tuple": to_2tuple, "trunc_normal_": trunc_normal_}
    exec(compile(src, str(path), "exec"), ns)
    return ns["GeneratorResNet"]


@requires_reference
@pytest.mark.parametrize("size,upscale", [
    (8, 2),    # window-divisible
    (10, 4),   # triggers the reflect-pad + runtime mask path
])
def test_swinir_matches_torch(size, upscale):
    import torch

    torch.manual_seed(0)
    Gen = _load_ref_generator()
    # img_size only seeds the precomputed masks; the reference recomputes
    # masks at runtime for other sizes (and cannot be *built* with a
    # non-divisible img_size), so always build with 8.
    tnet = Gen(upscale=upscale, in_chans=3, img_size=8, window_size=4,
               img_range=1.0, depths=[2, 2], embed_dim=24,
               num_heads=[3, 3], mlp_ratio=2,
               upsampler="pixelshuffle", drop_path_rate=0.0).eval()
    fnet = SwinIR(upscale=upscale, in_chans=3, embed_dim=24,
                  depths=(2, 2), num_heads=(3, 3), window_size=4,
                  mlp_ratio=2.0, drop_path_rate=0.0)

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = torch_swinir_to_flax(sd)

    rng = np.random.default_rng(1)
    # size 10 with window 4 exercises the reflect-pad path
    x = rng.uniform(0, 1, (1, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_t = out_t.numpy().transpose(0, 2, 3, 1)

    out_f = np.asarray(fnet.apply({"params": params}, jnp.asarray(x),
                                  deterministic=True))
    assert out_f.shape == out_t.shape
    np.testing.assert_allclose(out_f, out_t, atol=3e-4, rtol=1e-3)
