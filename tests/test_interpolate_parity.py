"""Golden test: engine.interpolate (diffuse two images to step t, mix,
denoise back) against the torch reference GaussianDiffusion.interpolate
(ddpm_modules/diffusion.py:244-258) with identical noise draws and an
identical parameter-free denoiser injected into both."""

import numpy as np

import jax
import jax.numpy as jnp

from fastdiffsr_tpu.diffusion import (DiffusionSpec, DiffusionEngine,
                                      ScheduleBuffers)
from tests.conftest import requires_reference, REFERENCE_ROOT

SCHED = {"schedule": "linear", "n_timestep": 8,
         "linear_start": 1e-4, "linear_end": 5e-2}


def _load_ref():
    import torch  # noqa: F401
    ns = {}
    dpath = REFERENCE_ROOT / "model" / "ddpm_modules" / "diffusion.py"
    dsrc = dpath.read_text().replace("from .unet import *", "")
    exec(compile(dsrc, str(dpath), "exec"), ns)
    return ns


@requires_reference
def test_interpolate_matches_torch():
    import torch

    ns = _load_ref()
    T = SCHED["n_timestep"]
    B, size = 2, 8
    lam = 0.3

    # identical parameter-free denoiser on both sides; mild t-dependence
    # exercises the discrete-t conditioning feed (torch passes the long
    # step tensor, the engine a float level — equal numerics)
    class TinyDenoiser(torch.nn.Module):
        def forward(self, x, t):
            tb = t.float().reshape(-1, 1, 1, 1)
            return 0.05 * torch.tanh(x) * (1 + tb / 80.0)

    gd = ns["GaussianDiffusion"](TinyDenoiser(), image_size=size,
                                 channels=3, loss_type="l1",
                                 conditional=False)
    gd.set_new_noise_schedule(SCHED, torch.device("cpu"))

    rng = jax.random.PRNGKey(11)
    x1 = np.asarray(jax.random.uniform(jax.random.fold_in(rng, 1),
                                       (B, size, size, 3), jnp.float32,
                                       -1, 1))
    x2 = np.asarray(jax.random.uniform(jax.random.fold_in(rng, 2),
                                       (B, size, size, 3), jnp.float32,
                                       -1, 1))

    # reproduce the engine's internal draw order (engine.py interpolate):
    # split(rng,3) -> noise1, noise2; per-step normal(fold_in(rng_steps,
    # t_idx)) for t_idx = T-2 .. 0. Feed the same draws to torch, whose
    # order is q_sample(x1), q_sample(x2), then noise_like per step.
    rng1, rng2, rng_steps = jax.random.split(rng, 3)
    shape = (B, size, size, 3)
    draws = [np.asarray(jax.random.normal(rng1, shape, jnp.float32)),
             np.asarray(jax.random.normal(rng2, shape, jnp.float32))]
    for t_idx in range(T - 2, -1, -1):
        draws.append(np.asarray(jax.random.normal(
            jax.random.fold_in(rng_steps, t_idx), shape, jnp.float32)))
    state = {"i": 0}

    def fake_randn(*a, device=None):
        d = draws[state["i"]]
        state["i"] += 1
        return torch.from_numpy(d.transpose(0, 3, 1, 2))

    real_randn, real_randn_like = torch.randn, torch.randn_like
    torch.randn = fake_randn
    torch.randn_like = lambda t: fake_randn()
    try:
        with torch.no_grad():
            out_t = gd.interpolate(
                torch.from_numpy(x1.transpose(0, 3, 1, 2)),
                torch.from_numpy(x2.transpose(0, 3, 1, 2)),
                lam=lam)
    finally:
        torch.randn, torch.randn_like = real_randn, real_randn_like
    assert state["i"] == len(draws), (state["i"], len(draws))
    out_t = out_t.numpy().transpose(0, 2, 3, 1)

    engine = DiffusionEngine(DiffusionSpec.for_variant("ddpm"),
                             ScheduleBuffers.create(SCHED))

    def denoise_fn(x, level):
        return 0.05 * jnp.tanh(x) * (1 + level[:, None, None, None] / 80.0)

    out_j = np.asarray(engine.interpolate(denoise_fn, jnp.asarray(x1),
                                          jnp.asarray(x2), rng, lam=lam))
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=5e-5)
