"""Differentiable SSIM: golden vs the eval metric, and the aux training
loss decomposition (VERDICT r4 #6 — the x8 out-of-family lever)."""

import numpy as np

import jax
import jax.numpy as jnp


def test_dssim_matches_eval_metric():
    from fastdiffsr_tpu import metrics as M
    from fastdiffsr_tpu.ops.dssim import ssim

    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
    # correlated second image so SSIM is in a meaningful range
    b = np.clip(a.astype(np.int32)
                + rng.integers(-25, 25, a.shape), 0, 255).astype(np.uint8)

    want = M.calculate_ssim(a, b)        # cv2 MATLAB-style, channel-mean
    got = float(ssim(jnp.asarray(a, jnp.float32)[None],
                     jnp.asarray(b, jnp.float32)[None]))
    np.testing.assert_allclose(got, want, atol=2e-4)

    # identical images -> 1
    one = float(ssim(jnp.asarray(a, jnp.float32)[None],
                     jnp.asarray(a, jnp.float32)[None]))
    np.testing.assert_allclose(one, 1.0, atol=1e-5)

    # differentiable and finite
    g = jax.grad(lambda x: ssim(x, jnp.asarray(b, jnp.float32)[None]))(
        jnp.asarray(a, jnp.float32)[None])
    assert np.isfinite(np.asarray(g)).all()


def test_training_loss_aux_ssim_decomposition():
    """loss(aux_w) == loss(0) + w * (1 - ssim(decode(x0_hat), HR)) on the
    same draw, and gdp/ddpm specs reject the knob."""
    import pytest

    from fastdiffsr_tpu.diffusion import (DiffusionEngine, DiffusionSpec,
                                          ScheduleBuffers)

    sched = {"schedule": "linear_cosine", "n_timestep": 20,
             "linear_start": 1e-6, "linear_end": 1e-2}
    spec = DiffusionSpec.for_variant("fastdiffsr")
    buf = ScheduleBuffers.create(sched)
    e0 = DiffusionEngine(spec, buf)
    w = 0.37
    e1 = DiffusionEngine(spec, buf, aux_ssim_weight=w)

    rng = jax.random.PRNGKey(3)
    B, H = 2, 24
    batch = {
        "HR": jax.random.uniform(rng, (B, H, H, 3), jnp.float32, -1, 1),
        "SR": jax.random.uniform(jax.random.fold_in(rng, 1),
                                 (B, H, H, 3), jnp.float32, -1, 1),
    }

    def denoise(x_in, level):
        return 0.1 * x_in[..., 3:]      # deterministic pseudo-denoiser

    key = jax.random.PRNGKey(9)
    l0 = float(e0.training_loss(denoise, batch, key))
    l1 = float(e1.training_loss(denoise, batch, key))
    assert l1 > l0            # aux term is positive for a bad denoiser
    # recompute the aux term independently
    from fastdiffsr_tpu.diffusion.engine import img2res, res2img
    from fastdiffsr_tpu.ops.dssim import ssim

    x_start = img2res(batch["HR"], batch["SR"])
    rng_level, rng_noise = jax.random.split(key)
    noise = jax.random.normal(rng_noise, x_start.shape, x_start.dtype)
    gamma, _ = e0.sample_gammas(rng_level, B)
    x_noisy = e0.q_sample(x_start, gamma, noise)
    pred = denoise(jnp.concatenate([batch["SR"], x_noisy], -1), gamma)
    g = gamma.reshape(-1, 1, 1, 1)
    x0_hat = jnp.clip((x_noisy - jnp.sqrt(1 - g ** 2) * pred) / g, -1, 1)
    sr_hat = res2img(x0_hat, batch["SR"], clip=False)
    aux = 1.0 - float(ssim((sr_hat + 1) * 127.5,
                           (batch["HR"] + 1) * 127.5))
    np.testing.assert_allclose(l1 - l0, w * aux, rtol=1e-4, atol=1e-6)

    # gamma^p weighting (the r5 s8hg arm): per-image 1-SSIM terms
    # weighted by the drawn gamma^p instead of uniformly
    p = 2.0
    e2 = DiffusionEngine(spec, buf, aux_ssim_weight=w,
                         aux_ssim_gamma_pow=p)
    l2 = float(e2.training_loss(denoise, batch, key))
    s_i = ssim((sr_hat + 1) * 127.5, (batch["HR"] + 1) * 127.5,
               per_image=True)
    aux_g = float(jnp.mean(jnp.asarray(gamma, jnp.float32) ** p
                           * (1.0 - s_i)))
    np.testing.assert_allclose(l2 - l0, w * aux_g, rtol=1e-4, atol=1e-6)

    with pytest.raises(NotImplementedError):
        DiffusionEngine(DiffusionSpec.for_variant("gdp"), buf,
                        aux_ssim_weight=0.1)
