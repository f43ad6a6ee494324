"""DiffusionEngine math: q_sample / posterior / residual transforms /
training loss shape+finiteness, and a full sampling parity test against the
PyTorch reference posterior recursion using a mock denoiser."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdiffsr_tpu.diffusion import DiffusionSpec, DiffusionEngine, ScheduleBuffers
from fastdiffsr_tpu.diffusion.engine import img2res, res2img

SCHED = {"schedule": "linear_cosine", "n_timestep": 20,
         "linear_start": 1e-6, "linear_end": 1e-2}


@pytest.fixture(scope="module")
def engine():
    return DiffusionEngine(DiffusionSpec.for_variant("fastdiffsr"),
                           ScheduleBuffers.create(SCHED))


def test_img2res_roundtrip():
    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 3)), jnp.float32)
    up = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 3)), jnp.float32)
    res = img2res(hr, up)
    assert res.shape == hr.shape
    assert float(jnp.max(jnp.abs(res))) <= 1.0
    # where the residual isn't clipped the roundtrip is exact
    unclipped = jnp.abs((hr - up) * 2.0) < 1.0
    back = res2img(res, up)
    np.testing.assert_allclose(np.where(unclipped, np.asarray(back), 0),
                               np.where(unclipped, np.asarray(hr), 0),
                               atol=1e-6)


def test_q_sample_endpoints(engine):
    x0 = jnp.ones((2, 4, 4, 3)) * 0.5
    eps = jnp.ones_like(x0) * 2.0
    # gamma=1 -> x0 exactly; gamma=0 -> pure noise
    np.testing.assert_allclose(
        np.asarray(engine.q_sample(x0, jnp.array([1.0, 1.0]), eps)),
        np.asarray(x0), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(engine.q_sample(x0, jnp.array([0.0, 0.0]), eps)),
        np.asarray(eps), atol=1e-6)


def test_sample_gammas_in_bucket(engine):
    rng = jax.random.PRNGKey(0)
    prev = np.asarray(engine.buffers.sqrt_alphas_cumprod_prev)
    for i in range(20):
        g, t = engine.sample_gammas(jax.random.fold_in(rng, i), 16)
        t = int(t)
        assert 1 <= t <= engine.buffers.num_timesteps
        g = np.asarray(g)
        # sqrt_alphas_cumprod_prev is decreasing: prev[t] <= g <= prev[t-1]
        assert np.all(g >= prev[t] - 1e-6)
        assert np.all(g <= prev[t - 1] + 1e-6)


def test_training_loss_finite_and_scalar(engine):
    rng = jax.random.PRNGKey(1)
    batch = {
        "HR": jax.random.uniform(rng, (2, 16, 16, 3), minval=-1, maxval=1),
        "SR": jax.random.uniform(jax.random.fold_in(rng, 1), (2, 16, 16, 3),
                                 minval=-1, maxval=1),
    }

    def zero_denoiser(x_in, level):
        return jnp.zeros(x_in.shape[:-1] + (3,), x_in.dtype)

    loss = jax.jit(
        lambda r: engine.training_loss(zero_denoiser, batch, r))(rng)
    assert loss.shape == ()
    assert np.isfinite(float(loss))
    # with a zero prediction the L1 loss is E|eps| ~ sqrt(2/pi) ~ 0.798
    assert 0.5 < float(loss) < 1.1


def _numpy_reference_sampler(buf, cond, init_noise, noise_seq, denoise):
    """Literal numpy port of the reference p_sample_loop recursion
    (fastdiffsr_modules/diffusion.py:157-221), for parity checking."""
    x = init_noise.copy()
    T = buf.num_timesteps
    prev = np.asarray(buf.sqrt_alphas_cumprod_prev, np.float64)
    sra = np.asarray(buf.sqrt_recip_alphas_cumprod, np.float64)
    srm1 = np.asarray(buf.sqrt_recipm1_alphas_cumprod, np.float64)
    c1 = np.asarray(buf.posterior_mean_coef1, np.float64)
    c2 = np.asarray(buf.posterior_mean_coef2, np.float64)
    logv = np.asarray(buf.posterior_log_variance_clipped, np.float64)
    for i in reversed(range(T)):
        level = np.full((x.shape[0],), prev[i + 1], np.float32)
        eps = denoise(np.concatenate([cond, x], axis=-1), level)
        x0 = sra[i] * x - srm1[i] * eps
        x0 = np.clip(x0, -1, 1)
        mean = c1[i] * x0 + c2[i] * x
        noise = noise_seq[i] if i > 0 else 0.0
        x = mean + noise * np.exp(0.5 * logv[i])
    return np.clip(x, -1, 1) / 2.0 + cond


def test_sampler_matches_numpy_recursion(engine):
    """The lax.scan sampler must reproduce the reference recursion exactly
    when fed identical noise and a deterministic mock denoiser."""
    rng = np.random.default_rng(42)
    B, H, W, C = 2, 8, 8, 3
    T = engine.buffers.num_timesteps
    cond = rng.uniform(-1, 1, (B, H, W, C)).astype(np.float32)
    init = rng.standard_normal((B, H, W, C)).astype(np.float32)
    noise_seq = rng.standard_normal((T, B, H, W, C)).astype(np.float32)

    def mock_denoise_np(x_in, level):
        # deterministic pseudo-denoiser mixing input channels and level
        x = x_in[..., C:]
        c = x_in[..., :C]
        return np.tanh(x * 0.3 + c * 0.1 + level[:, None, None, None] * 0.05)

    def mock_denoise_jax(x_in, level):
        x = x_in[..., C:]
        c = x_in[..., :C]
        return jnp.tanh(x * 0.3 + c * 0.1 + level[:, None, None, None] * 0.05)

    expected = _numpy_reference_sampler(
        engine.buffers, cond, init, noise_seq, mock_denoise_np)

    got = jax.jit(lambda: engine.sample(
        mock_denoise_jax, jnp.asarray(cond), jax.random.PRNGKey(0),
        init_noise=jnp.asarray(init), noise_seq=jnp.asarray(noise_seq)))()
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-4)


def test_sampler_trajectory_shape(engine):
    B, H, W, C = 1, 8, 8, 3

    def mock(x_in, level):
        return jnp.zeros(x_in.shape[:-1] + (C,), x_in.dtype)

    cond = jnp.zeros((B, H, W, C))
    final, traj = engine.sample(mock, cond, jax.random.PRNGKey(0),
                                return_trajectory=True)
    assert final.shape == (B, H, W, C)
    assert traj.shape == (engine.buffers.num_timesteps, B, H, W, C)
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(final),
                               atol=1e-6)


def test_unconditional_sample_shape():
    eng = DiffusionEngine(
        DiffusionSpec(conditional=False, target_space="hr"),
        ScheduleBuffers.create(SCHED))

    def mock(x_in, level):
        return jnp.zeros_like(x_in)

    out = eng.sample(mock, None, jax.random.PRNGKey(0), shape=(1, 8, 8, 3))
    assert out.shape == (1, 8, 8, 3)


def test_x0_prediction_variant():
    eng = DiffusionEngine(DiffusionSpec.for_variant("gdp"),
                          ScheduleBuffers.create(SCHED))

    def mock(x_in, level):
        # in gdp packing order x comes first
        return x_in[..., :3] * 0.0

    cond = jnp.zeros((1, 8, 8, 3))
    out = eng.sample(mock, cond, jax.random.PRNGKey(0))
    assert out.shape == (1, 8, 8, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ddim_oracle_recovers_x0_exactly():
    """With an oracle denoiser that returns the exact eps implied by a fixed
    x0*, DDIM (eta=0) must land on x0* for any step count, including
    subsampled (steps < T). Pins the update algebra."""
    import jax
    import jax.numpy as jnp
    from fastdiffsr_tpu.diffusion import (DiffusionSpec, DiffusionEngine,
                                          ScheduleBuffers)
    from fastdiffsr_tpu.diffusion.engine import res2img

    engine = DiffusionEngine(
        DiffusionSpec.for_variant("fastdiffsr"),
        ScheduleBuffers.create({"schedule": "linear_cosine",
                                "n_timestep": 20,
                                "linear_start": 1e-6, "linear_end": 1e-2}))
    rng = np.random.default_rng(0)
    B, H = 2, 8
    cond = jnp.asarray(rng.uniform(-0.5, 0.5, (B, H, H, 3)), jnp.float32)
    x0_star = jnp.asarray(rng.uniform(-0.9, 0.9, (B, H, H, 3)), jnp.float32)

    def oracle(x_in, level):
        x = x_in[..., 3:]                       # cond_first packing
        lv = level.reshape(-1, 1, 1, 1)
        return (x - lv * x0_star) / jnp.sqrt(
            jnp.maximum(1.0 - lv ** 2, 1e-12))

    for steps in (20, 7, 3):
        out = engine.sample_ddim(oracle, cond, jax.random.PRNGKey(1),
                                 steps=steps, eta=0.0)
        want = np.asarray(res2img(x0_star, cond))
        np.testing.assert_allclose(np.asarray(out), want, atol=2e-5,
                                   err_msg=f"steps={steps}")


def test_ddim_deterministic_and_variants():
    import jax
    import jax.numpy as jnp
    from fastdiffsr_tpu.diffusion import (DiffusionSpec, DiffusionEngine,
                                          ScheduleBuffers)

    rng = np.random.default_rng(1)
    cond = jnp.asarray(rng.uniform(-1, 1, (1, 8, 8, 3)), jnp.float32)

    def fake_net(x_in, level):
        return jnp.tanh(x_in[..., :3]) * 0.1

    for variant, T in [("fastdiffsr", 20), ("gdp", 10)]:
        engine = DiffusionEngine(
            DiffusionSpec.for_variant(variant),
            ScheduleBuffers.create({"schedule": "linear", "n_timestep": T,
                                    "linear_start": 1e-4,
                                    "linear_end": 2e-2}))
        noise = jnp.zeros((1, 8, 8, 3), jnp.float32)
        o1 = engine.sample_ddim(fake_net, cond, jax.random.PRNGKey(2),
                                steps=5, eta=0.0, init_noise=noise)
        o2 = engine.sample_ddim(fake_net, cond, jax.random.PRNGKey(9),
                                steps=5, eta=0.0, init_noise=noise)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   atol=0, err_msg=variant)
        assert np.isfinite(np.asarray(o1)).all()


def test_batched_rng_detection():
    from fastdiffsr_tpu.diffusion.engine import rng_is_batched

    raw = jax.random.PRNGKey(0)                      # (2,) uint32
    raw_batch = jax.vmap(lambda i: jax.random.fold_in(raw, i))(
        jnp.arange(3))                               # (3, 2)
    assert not rng_is_batched(raw)
    assert rng_is_batched(raw_batch)

    typed = jax.random.key(0)                        # () typed key
    typed_batch = jax.random.split(typed, 3)         # (3,) typed keys
    assert not rng_is_batched(typed)
    assert rng_is_batched(typed_batch)


@pytest.mark.parametrize("method", ["sample", "ddim"])
def test_sampling_batch_invariance(engine, method):
    """Per-image keys: each image's output depends only on its own key,
    not on how the set is grouped into batches (the batched-val
    contract)."""
    rng = np.random.default_rng(5)
    cond = jnp.asarray(rng.uniform(-1, 1, (3, 8, 8, 3)), jnp.float32)
    base = jax.random.PRNGKey(7)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(3))

    def denoise(x_in, level):
        return 0.1 * x_in[..., 3:]  # deterministic mock

    def run(c, k):
        if method == "ddim":
            return np.asarray(engine.sample_ddim(denoise, c, k,
                                                 steps=5, eta=0.5))
        return np.asarray(engine.sample(denoise, c, k))

    together = run(cond, keys)
    for j in range(3):
        alone = run(cond[j:j + 1], keys[j:j + 1])
        np.testing.assert_allclose(alone[0], together[j],
                                   rtol=1e-5, atol=1e-5)
