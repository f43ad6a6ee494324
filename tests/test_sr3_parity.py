"""Golden parity: SR3UNet (ddpm/tesr denoiser) vs the PyTorch reference
ddpm UNet with converted weights — pins self-attention semantics and the
attn_res placement logic."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdiffsr_tpu.models.unet_sr3 import SR3UNet
from fastdiffsr_tpu.models.convert import torch_unet_to_flax
from tests.conftest import requires_reference, REFERENCE_ROOT


def _load_ref_unet():
    import torch  # noqa: F401
    path = REFERENCE_ROOT / "model" / "ddpm_modules" / "unet.py"
    ns = {}
    exec(compile(path.read_text(), str(path), "exec"), ns)
    return ns["UNet"]


@requires_reference
def test_sr3_unet_matches_torch():
    import torch

    torch.manual_seed(0)
    UNetT = _load_ref_unet()
    size = 16
    # attn_res=(8,) fires at the 8x8 level for image_size 16
    tnet = UNetT(in_channel=6, out_channel=3, inner_channel=32,
                 norm_groups=16, channel_mults=(1, 2), attn_res=(8,),
                 res_blocks=1, dropout=0.0, image_size=size).eval()
    fnet = SR3UNet(in_channel=6, out_channel=3, inner_channel=32,
                   norm_groups=16, channel_mults=(1, 2), attn_res=(8,),
                   res_blocks=1, dropout=0.0, image_size=size)

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()
          if k != "time_mlp.0.inv_freq"}
    params = torch_unet_to_flax(sd)

    rng = np.random.default_rng(1)
    B = 2
    x = rng.standard_normal((B, size, size, 6)).astype(np.float32)
    # ddpm passes discrete timesteps (B,)
    t = np.array([3.0, 17.0], dtype=np.float32)

    with torch.no_grad():
        out_t = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                     torch.from_numpy(t))
    out_t = np.transpose(out_t.numpy(), (0, 2, 3, 1))

    out_f = np.asarray(fnet.apply({"params": params}, jnp.asarray(x),
                                  jnp.asarray(t), deterministic=True))
    assert out_f.shape == out_t.shape
    np.testing.assert_allclose(out_f, out_t, atol=2e-4, rtol=1e-3)

    # sanity: attention params exist where expected (8x8 level + mid)
    flat = jax.tree_util.tree_leaves_with_path(params)
    attn_paths = {jax.tree_util.keystr(p) for p, _ in flat if "attn" in
                  jax.tree_util.keystr(p)}
    assert any("mid_0" in p for p in attn_paths)
    assert any("downs" in p for p in attn_paths)
