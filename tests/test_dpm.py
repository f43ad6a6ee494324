"""DPM-Solver++(2M) sampler (engine.sample_dpm — capability beyond the
reference, like DDIM): parity against an independent numpy implementation
of Lu et al. 2022 Algorithm 2 (data prediction, multistep, lower-order
final), batched-per-image-key invariance, and make_sample_fn wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdiffsr_tpu.diffusion import (DiffusionSpec, DiffusionEngine,
                                      ScheduleBuffers)
from fastdiffsr_tpu.diffusion.engine import res2img
from fastdiffsr_tpu.train.steps import make_sample_fn

SCHED = {"schedule": "linear_cosine", "n_timestep": 20,
         "linear_start": 1e-6, "linear_end": 1e-2}
SHAPE = (2, 8, 8, 3)


def mock_denoise(x_in, level):
    """Deterministic stand-in denoiser: mixes the packed channels and the
    conditioning scalar nonlinearly so solver-order errors are visible."""
    x, c = x_in[..., 3:], x_in[..., :3]  # cond_first packing (fastdiffsr)
    lvl = level.reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.tanh(0.7 * x + 0.3 * jnp.roll(c, 1, axis=-1)) * (0.5 + lvl)


def mock_denoise_np(x, cond, level):
    lvl = level.reshape((-1,) + (1,) * (x.ndim - 1))
    return np.tanh(0.7 * x + 0.3 * np.roll(cond, 1, axis=-1)) * (0.5 + lvl)


def dpmpp_2m_numpy(engine, cond, x, steps, prediction="noise",
                   clip_denoised=True):
    """Independent loop-based DPM-Solver++(2M), written from the paper's
    Algorithm 2 (not from the engine code): exact lambda/h arithmetic in
    float64, explicit exp(-h) form, python loop with history list."""
    ac = np.asarray(engine.buffers.alphas_cumprod, np.float64)
    T = len(ac)
    ts = np.unique(np.linspace(0, T - 1, steps).round()
                   .astype(np.int64))[::-1]
    alpha = lambda t: np.sqrt(ac[t]) if t >= 0 else 1.0
    sigma = lambda t: np.sqrt(1.0 - ac[t]) if t >= 0 else 0.0
    lam = lambda t: (np.log(alpha(t)) - np.log(sigma(t))
                     if t >= 0 else np.inf)

    x = np.asarray(x, np.float64)
    cond = np.asarray(cond, np.float64)
    x0_hist = []
    seq = list(ts) + [-1]
    for i in range(len(ts)):
        t_c, t_n = seq[i], seq[i + 1]
        level = np.full((x.shape[0],),
                        alpha(t_c) if prediction != "discrete" else t_c,
                        np.float64)
        out = mock_denoise_np(x, cond, level)
        if prediction == "x0":
            x0 = out
        else:
            x0 = (x - sigma(t_c) * out) / alpha(t_c)
        if clip_denoised:
            x0 = np.clip(x0, -1.0, 1.0)
        h = lam(t_n) - lam(t_c)
        if i == 0 or not np.isfinite(h):
            D = x0  # first-order: first step and the final (h=inf) step
        else:
            h_last = lam(seq[i]) - lam(seq[i - 1])
            r = h_last / h
            D = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_hist[-1]
        if np.isfinite(h):
            x = (sigma(t_n) / sigma(t_c)) * x \
                - alpha(t_n) * (np.exp(-h) - 1.0) * D
        else:  # sigma(t_n)=0: the update collapses to the clean estimate
            x = D
        x0_hist.append(x0)
    return x


@pytest.fixture(scope="module")
def engine():
    return DiffusionEngine(DiffusionSpec.for_variant("fastdiffsr"),
                           ScheduleBuffers.create(SCHED))


@pytest.mark.parametrize("steps", [5, 10, 20])
def test_dpm_matches_numpy_reference(engine, steps):
    rng = np.random.default_rng(steps)
    cond = jnp.asarray(rng.uniform(-1, 1, SHAPE), jnp.float32)
    noise = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)

    got = engine.sample_dpm(mock_denoise, cond, jax.random.PRNGKey(0),
                            steps=steps, init_noise=noise)
    want_res = dpmpp_2m_numpy(engine, np.asarray(cond), np.asarray(noise),
                              steps)
    want = np.asarray(res2img(jnp.asarray(want_res, jnp.float32), cond))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_dpm_x0_prediction_spec(engine):
    spec = DiffusionSpec.for_variant("gdp")
    eng = DiffusionEngine(spec, engine.buffers)
    rng = np.random.default_rng(7)
    cond = jnp.asarray(rng.uniform(-1, 1, SHAPE), jnp.float32)
    noise = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)

    def denoise_x_first(x_in, level):
        # gdp packs x first (cond_order='x_first')
        x, c = x_in[..., :3], x_in[..., 3:]
        lvl = level.reshape((-1, 1, 1, 1))
        return jnp.tanh(0.7 * x + 0.3 * jnp.roll(c, 1, axis=-1)) \
            * (0.5 + 0.01 * lvl)

    got = eng.sample_dpm(denoise_x_first, cond, jax.random.PRNGKey(0),
                         steps=8, init_noise=noise)
    # independent loop, x0-prediction + discrete-t conditioning
    ac = np.asarray(eng.buffers.alphas_cumprod, np.float64)
    T = len(ac)
    ts = np.unique(np.linspace(0, T - 1, 8).round().astype(np.int64))[::-1]
    seq = list(ts) + [-1]
    alpha = lambda t: np.sqrt(ac[t]) if t >= 0 else 1.0
    sigma = lambda t: np.sqrt(1.0 - ac[t]) if t >= 0 else 0.0
    lam = lambda t: (np.log(alpha(t)) - np.log(sigma(t)))\
        if t >= 0 else np.inf
    x = np.asarray(noise, np.float64)
    c_np = np.asarray(cond, np.float64)
    hist = []
    for i in range(len(ts)):
        t_c, t_n = seq[i], seq[i + 1]
        lvl = np.full((x.shape[0],), float(t_c), np.float64)
        x0 = np.tanh(0.7 * x + 0.3 * np.roll(c_np, 1, axis=-1)) \
            * (0.5 + 0.01 * lvl.reshape(-1, 1, 1, 1))
        x0 = np.clip(x0, -1, 1)
        h = lam(t_n) - lam(t_c)
        if i == 0 or not np.isfinite(h):
            D = x0
        else:
            r = (lam(seq[i]) - lam(seq[i - 1])) / h
            D = (1 + 1 / (2 * r)) * x0 - (1 / (2 * r)) * hist[-1]
        x = ((sigma(t_n) / sigma(t_c)) * x
             - alpha(t_n) * (np.exp(-h) - 1.0) * D) if np.isfinite(h) else D
        hist.append(x0)
    # gdp target_space is 'hr' — no res2img
    np.testing.assert_allclose(np.asarray(got), x, atol=2e-5)


def test_dpm_batched_keys_batch_invariant(engine):
    """Per-image keys: the same image yields the same output regardless of
    which batch it rides in (pad_batch_with_keys contract)."""
    rng = np.random.default_rng(3)
    cond = jnp.asarray(rng.uniform(-1, 1, (4, 8, 8, 3)), jnp.float32)
    base = jax.random.PRNGKey(11)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(4))

    full = engine.sample_dpm(mock_denoise, cond, keys, steps=10)
    halves = [engine.sample_dpm(mock_denoise, cond[i:i + 2],
                                keys[i:i + 2], steps=10)
              for i in (0, 2)]
    np.testing.assert_allclose(np.asarray(full),
                               np.concatenate([np.asarray(h) for h in halves]),
                               atol=1e-6)


def test_make_sample_fn_dpm_wiring(engine):
    def apply_fn(params, x_in, level, _):
        return mock_denoise(x_in, level) * params["g"]

    fn = make_sample_fn(engine, apply_fn, sampler="dpm", ddim_steps=6)
    rng = np.random.default_rng(5)
    cond = jnp.asarray(rng.uniform(-1, 1, SHAPE), jnp.float32)
    out = fn({"g": jnp.float32(1.0)}, cond, jax.random.PRNGKey(0))
    assert out.shape == SHAPE
    assert np.all(np.isfinite(np.asarray(out)))
    # deterministic: same inputs -> identical output
    out2 = fn({"g": jnp.float32(1.0)}, cond, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    with pytest.raises(ValueError):
        make_sample_fn(engine, apply_fn, sampler="unknown")
