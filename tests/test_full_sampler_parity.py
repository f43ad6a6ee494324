"""Integration golden test: the COMPLETE FastDiffSR eval path (converted
UNet + T=20 lax.scan sampler + residual fold-back) against the torch
reference GaussianDiffusion.super_resolution with identical noise draws."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdiffsr_tpu.diffusion import DiffusionSpec, DiffusionEngine, ScheduleBuffers
from fastdiffsr_tpu.models import FastDiffSRUNet
from fastdiffsr_tpu.models.convert import torch_unet_to_flax
from tests.conftest import requires_reference, REFERENCE_ROOT

SCHED = {"schedule": "linear_cosine", "n_timestep": 20,
         "linear_start": 1e-6, "linear_end": 1e-2}


def _load_ref(namespace_needed):
    import torch  # noqa: F401
    ns = {}
    upath = REFERENCE_ROOT / "model" / "fastdiffsr_modules" / "unet.py"
    src = upath.read_text()
    src = src.replace("from torchvision.models import vgg19", "")
    src = src.replace("from einops import rearrange", "")
    exec(compile(src, str(upath), "exec"), ns)
    dpath = REFERENCE_ROOT / "model" / "fastdiffsr_modules" / "diffusion.py"
    dsrc = dpath.read_text().replace("from .unet import *", "")
    exec(compile(dsrc, str(dpath), "exec"), ns)
    return ns


@requires_reference
def test_full_superresolution_matches_torch():
    import torch

    ns = _load_ref(True)
    torch.manual_seed(0)
    size = 16
    tnet = ns["UNet"](in_channel=6, out_channel=3, inner_channel=16,
                      norm_groups=8, channel_mults=(1, 2), attn_res=(8,),
                      res_blocks=1, dropout=0.0, image_size=size).eval()
    gd = ns["GaussianDiffusion"](tnet, image_size=size, channels=3,
                                 loss_type="l1", conditional=True)
    gd.set_new_noise_schedule(SCHED, torch.device("cpu"))

    B = 1
    rng = np.random.default_rng(3)
    cond = rng.uniform(-1, 1, (B, size, size, 3)).astype(np.float32)
    T = 20
    init_noise = rng.standard_normal((B, size, size, 3)).astype(np.float32)
    noise_seq = rng.standard_normal((T, B, size, size, 3)).astype(
        np.float32)

    # drive the torch loop with OUR pre-drawn noise (NCHW)
    draws = [init_noise] + [noise_seq[i] for i in range(T - 1, 0, -1)]
    state = {"i": 0}

    def fake_randn(*shape, device=None):
        arr = draws[state["i"]]
        state["i"] += 1
        return torch.from_numpy(arr.transpose(0, 3, 1, 2))

    def fake_randn_like(t):
        return fake_randn()

    import types
    real_randn, real_randn_like = torch.randn, torch.randn_like
    torch.randn = fake_randn
    torch.randn_like = fake_randn_like
    try:
        with torch.no_grad():
            sr_t = gd.super_resolution(
                torch.from_numpy(cond.transpose(0, 3, 1, 2)),
                continous=False)
    finally:
        torch.randn, torch.randn_like = real_randn, real_randn_like
    assert state["i"] == T  # init + 19 noisy steps (t=0 uses zeros)
    sr_t = sr_t.numpy().transpose(0, 2, 3, 1)

    # ours
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = torch_unet_to_flax(sd)
    fnet = FastDiffSRUNet(in_channel=6, out_channel=3, inner_channel=16,
                          norm_groups=8, channel_mults=(1, 2), res_blocks=1,
                          dropout=0.0)
    engine = DiffusionEngine(DiffusionSpec.for_variant("fastdiffsr"),
                             ScheduleBuffers.create(SCHED))

    def denoise(x_in, level):
        return fnet.apply({"params": params}, x_in, level,
                          deterministic=True)

    sr_f = engine.sample(denoise, jnp.asarray(cond), jax.random.PRNGKey(0),
                         init_noise=jnp.asarray(init_noise),
                         noise_seq=jnp.asarray(noise_seq))
    sr_f = np.asarray(sr_f)

    assert sr_f.shape == sr_t.shape
    # 20 denoiser evals compound f32 noise; stay tight but realistic
    np.testing.assert_allclose(sr_f, sr_t, atol=5e-4, rtol=1e-3)
