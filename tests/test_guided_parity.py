"""Golden parity: GuidedUNet (gdp denoiser) vs the reference guided-diffusion
UNet with converted weights — pins scale-shift norm, resblock up/down,
legacy QKV attention, and zero-init out convs."""

import numpy as np
import pytest

import jax.numpy as jnp

from fastdiffsr_tpu.models.unet_guided import GuidedUNet
from fastdiffsr_tpu.models.convert import torch_guided_unet_to_flax
from tests.conftest import requires_reference, REFERENCE_ROOT


def _load_ref_unet():
    import torch  # noqa: F401
    path = REFERENCE_ROOT / "model" / "gdp_modules" / "unet.py"
    ns = {}
    exec(compile(path.read_text(), str(path), "exec"), ns)
    return ns["UNet"]


@requires_reference
def test_guided_unet_matches_torch():
    import torch

    torch.manual_seed(0)
    UNetT = _load_ref_unet()
    size = 16
    mc = 32
    tnet = UNetT(image_size=size, in_channel=6, model_channels=mc,
                 out_channel=3, res_blocks=1, attention_resolutions=(2,),
                 dropout=0.0, channel_mults=(1, 2), num_heads=4,
                 num_head_channels=16, use_scale_shift_norm=True,
                 resblock_updown=True).eval()
    fnet = GuidedUNet(image_size=size, in_channel=6, model_channels=mc,
                      out_channel=3, res_blocks=1,
                      attention_resolutions=(2,), dropout=0.0,
                      channel_mults=(1, 2), num_head_channels=16)

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = torch_guided_unet_to_flax(sd)

    rng = np.random.default_rng(1)
    B = 2
    x = rng.standard_normal((B, size, size, 6)).astype(np.float32)
    t = np.array([3.0, 700.0], dtype=np.float32)

    with torch.no_grad():
        out_t = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                     torch.from_numpy(t))
    out_t = np.transpose(out_t.numpy(), (0, 2, 3, 1))

    out_f = np.asarray(fnet.apply({"params": params}, jnp.asarray(x),
                                  jnp.asarray(t), deterministic=True))
    assert out_f.shape == out_t.shape
    np.testing.assert_allclose(out_f, out_t, atol=2e-4, rtol=1e-3)


@requires_reference
def test_guided_converter_structure_matches_init():
    import jax
    import torch

    torch.manual_seed(1)
    UNetT = _load_ref_unet()
    tnet = UNetT(image_size=16, in_channel=6, model_channels=32,
                 out_channel=3, res_blocks=1, attention_resolutions=(2,),
                 dropout=0.0, channel_mults=(1, 2), num_head_channels=16)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = torch_guided_unet_to_flax(sd)

    fnet = GuidedUNet(image_size=16, in_channel=6, model_channels=32,
                      out_channel=3, res_blocks=1,
                      attention_resolutions=(2,), channel_mults=(1, 2),
                      num_head_channels=16)
    ref = fnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)),
                    jnp.ones((1,)))["params"]
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes


def test_guided_unet_upsample_mode_parity():
    """upsample_mode='tconv' (exact stride-2 transposed conv replacing
    conv3(nearest_up2(h)) in the up-resblocks) must match the literal
    graph with shared params, and create the identical parameter tree."""
    import jax

    kw = dict(image_size=32, in_channel=6, model_channels=32,
              out_channel=3, res_blocks=1, attention_resolutions=(8,),
              channel_mults=(1, 2), num_head_channels=16)
    rng = jax.random.PRNGKey(11)
    x = jax.random.normal(rng, (2, 16, 16, 6))
    t = jnp.array([3.0, 70.0])
    dense = GuidedUNet(**kw)
    params = dense.init(rng, x, t)
    want = dense.apply(params, x, t)
    tconv = GuidedUNet(**kw, upsample_mode="tconv")
    got = tconv.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    p2 = tconv.init(rng, x, t)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))
