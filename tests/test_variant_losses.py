"""Each diffusion variant's training loss decreases on a fixed batch with
its own denoiser family — end-to-end gradient sanity per engine config."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdiffsr_tpu.diffusion import DiffusionSpec, DiffusionEngine, ScheduleBuffers
from fastdiffsr_tpu.train import create_train_state, make_train_step
from fastdiffsr_tpu.train.state import make_optimizer

SCHED = {"schedule": "linear", "n_timestep": 8,
         "linear_start": 1e-6, "linear_end": 1e-2}


def _net(variant):
    if variant in ("fastdiffsr",):
        from fastdiffsr_tpu.models import FastDiffSRUNet
        return FastDiffSRUNet(inner_channel=8, norm_groups=4,
                              channel_mults=(1, 2), res_blocks=1,
                              dropout=0.0)
    if variant in ("ddpm", "tesr"):
        from fastdiffsr_tpu.models.unet_sr3 import SR3UNet
        return SR3UNet(inner_channel=8, norm_groups=4, channel_mults=(1, 2),
                       attn_res=(8,), res_blocks=1, dropout=0.0,
                       image_size=16)
    from fastdiffsr_tpu.models.unet_guided import GuidedUNet
    return GuidedUNet(image_size=16, model_channels=32,
                      channel_mults=(1, 2), res_blocks=1,
                      attention_resolutions=(2,), num_head_channels=16)


@pytest.mark.parametrize("variant", ["fastdiffsr", "ddpm", "tesr", "gdp"])
def test_variant_loss_decreases(variant):
    engine = DiffusionEngine(DiffusionSpec.for_variant(variant),
                             ScheduleBuffers.create(SCHED))
    net = _net(variant)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)),
                      jnp.ones((1,)))["params"]

    def apply_fn(p, x_in, level, rng):
        return net.apply({"params": p}, x_in, level, deterministic=True)

    tx = make_optimizer({"lr": 2e-3})
    state = create_train_state(params, tx)
    step = make_train_step(engine, apply_fn, tx, ema_start=10_000)

    rng = np.random.default_rng(0)
    batch = {"HR": jnp.asarray(rng.uniform(-1, 1, (4, 16, 16, 3)),
                               jnp.float32),
             "SR": jnp.asarray(rng.uniform(-1, 1, (4, 16, 16, 3)),
                               jnp.float32)}
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(20):
        state, m = step(state, batch, jax.random.fold_in(key, i % 3))
        losses.append(float(m["l_pix"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses
