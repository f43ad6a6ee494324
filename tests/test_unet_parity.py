"""Golden parity: Flax FastDiffSRUNet vs the PyTorch reference UNet with
identical (converted) weights and inputs. This pins topology, layer order,
skip-concat order, GroupNorm semantics, and the converter itself."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdiffsr_tpu.models import FastDiffSRUNet
from fastdiffsr_tpu.models.convert import torch_unet_to_flax
from tests.conftest import requires_reference, REFERENCE_ROOT


def _load_reference_unet_class():
    import torch  # noqa: F401
    path = REFERENCE_ROOT / "model" / "fastdiffsr_modules" / "unet.py"
    src = path.read_text()
    # torchvision/einops are imported at the top of the reference file but
    # unused by the UNet; torchvision isn't installed here — strip them.
    src = src.replace("from torchvision.models import vgg19", "")
    src = src.replace("from einops import rearrange", "")
    namespace = {}
    exec(compile(src, str(path), "exec"), namespace)
    return namespace["UNet"]


@requires_reference
@pytest.mark.parametrize("res_blocks,inner,mults,size", [
    (2, 64, (1, 2, 4, 4), 32),   # paper config at reduced spatial size
    (1, 32, (1, 2), 16),         # tiny config
])
def test_unet_matches_torch(res_blocks, inner, mults, size):
    import torch

    torch.manual_seed(0)
    UNetT = _load_reference_unet_class()
    tnet = UNetT(in_channel=6, out_channel=3, inner_channel=inner,
                 norm_groups=min(32, inner // 2), channel_mults=mults,
                 attn_res=(16,), res_blocks=res_blocks, dropout=0.0,
                 image_size=size).eval()

    fnet = FastDiffSRUNet(in_channel=6, out_channel=3, inner_channel=inner,
                          norm_groups=min(32, inner // 2),
                          channel_mults=mults, res_blocks=res_blocks,
                          dropout=0.0)

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = torch_unet_to_flax(sd)

    rng = np.random.default_rng(1)
    B = 2
    x = rng.standard_normal((B, size, size, 6)).astype(np.float32)
    level = rng.uniform(0.1, 1.0, (B,)).astype(np.float32)

    with torch.no_grad():
        out_t = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                     torch.from_numpy(level[:, None]))
    out_t = np.transpose(out_t.numpy(), (0, 2, 3, 1))

    out_f = fnet.apply({"params": params}, jnp.asarray(x),
                       jnp.asarray(level), deterministic=True)
    out_f = np.asarray(out_f)

    assert out_f.shape == out_t.shape
    np.testing.assert_allclose(out_f, out_t, atol=2e-4, rtol=1e-3)


@requires_reference
def test_converter_covers_all_live_params():
    """Every live torch parameter must land somewhere in the flax tree
    (dead ResnetBlocWithAttn.conv params excluded)."""
    import torch

    UNetT = _load_reference_unet_class()
    tnet = UNetT(in_channel=6, out_channel=3, inner_channel=32,
                 norm_groups=16, channel_mults=(1, 2), attn_res=(16,),
                 res_blocks=1, dropout=0.0, image_size=16)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = torch_unet_to_flax(sd)

    n_flax = len(jax.tree_util.tree_leaves(params))
    dead = [k for k in sd
            if k.split(".")[-2] == "conv" and ".res_block." not in k
            and any(k2.startswith(k.rsplit("conv.", 1)[0] + "res_block.")
                    for k2 in sd)]
    assert n_flax == len(sd) - len(dead)

    # shapes sane: init our net and compare tree structure
    fnet = FastDiffSRUNet(in_channel=6, out_channel=3, inner_channel=32,
                          norm_groups=16, channel_mults=(1, 2), res_blocks=1,
                          dropout=0.0)
    ref = fnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)),
                    jnp.ones((1,)))["params"]
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert jax.tree_util.tree_structure(ref_shapes) == \
        jax.tree_util.tree_structure(got_shapes)
    assert ref_shapes == got_shapes
