"""Schedule math vs the PyTorch reference (golden parity) and closed form."""

import importlib.util
import sys

import numpy as np
import pytest

from fastdiffsr_tpu.diffusion.schedules import make_beta_schedule, ScheduleBuffers
from tests.conftest import requires_reference, REFERENCE_ROOT

ALL_MODES = ["quad", "linear", "warmup10", "warmup50", "const", "jsd",
             "cosine", "linear_cosine"]


def _load_reference_diffusion():
    """Import the reference make_beta_schedule without importing its unet
    (which needs torchvision models)."""
    import torch  # noqa: F401  (reference module needs torch)
    path = REFERENCE_ROOT / "model" / "fastdiffsr_modules" / "diffusion.py"
    src = path.read_text()
    # strip the unet import; we only need the schedule function
    src = src.replace("from .unet import *", "")
    namespace = {}
    exec(compile(src, str(path), "exec"), namespace)
    return namespace["make_beta_schedule"]


@requires_reference
@pytest.mark.parametrize("mode", ALL_MODES)
@pytest.mark.parametrize("T", [20, 100])
def test_beta_schedule_matches_reference(mode, T):
    ref_fn = _load_reference_diffusion()
    ours = make_beta_schedule(mode, T, linear_start=1e-6, linear_end=1e-2)
    theirs = ref_fn(mode, T, linear_start=1e-6, linear_end=1e-2)
    theirs = np.asarray(theirs, dtype=np.float64)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-15)


def test_linear_cosine_t20_values():
    """The headline FastDiffSR schedule: T=20, start 1e-6, end 1e-2
    (config/sr_fastdiffsr_train_64_256.json)."""
    betas = make_beta_schedule("linear_cosine", 20,
                               linear_start=1e-6, linear_end=1e-2)
    assert betas.shape == (20,)
    assert betas.dtype == np.float64
    assert np.all(betas > 0) and np.all(betas <= 0.999)
    assert np.all(np.diff(betas) >= 0)  # non-decreasing (clips at 0.999)
    # last beta is dominated by the cosine term near the end of the chain
    assert betas[-1] > 0.1


def test_buffers_identities():
    buf = ScheduleBuffers.create({
        "schedule": "linear_cosine", "n_timestep": 20,
        "linear_start": 1e-6, "linear_end": 1e-2,
    })
    T = buf.num_timesteps
    assert T == 20
    ac = np.asarray(buf.alphas_cumprod, dtype=np.float64)
    betas = np.asarray(buf.betas, dtype=np.float64)

    np.testing.assert_allclose(np.asarray(buf.sqrt_alphas_cumprod) ** 2, ac,
                               rtol=1e-5)
    assert buf.sqrt_alphas_cumprod_prev.shape == (T + 1,)
    np.testing.assert_allclose(
        np.asarray(buf.sqrt_alphas_cumprod_prev[1:]),
        np.asarray(buf.sqrt_alphas_cumprod), rtol=1e-6)
    assert float(buf.sqrt_alphas_cumprod_prev[0]) == 1.0

    # posterior identities: coef1 + coef2 -> 1 as beta -> 0... check exact:
    # mean coefs reconstruct x_{t-1} for x0 == x_t == const 1
    c1 = np.asarray(buf.posterior_mean_coef1, dtype=np.float64)
    c2 = np.asarray(buf.posterior_mean_coef2, dtype=np.float64)
    acp = np.asarray(buf.alphas_cumprod_prev, dtype=np.float64)
    expected_c1 = betas * np.sqrt(acp) / (1 - ac)
    np.testing.assert_allclose(c1, expected_c1, rtol=1e-4)
    # variance is nonnegative & first-step log var clipped to log(1e-20)
    assert np.all(np.asarray(buf.posterior_variance) >= 0)
    assert np.isclose(float(buf.posterior_log_variance_clipped[0]),
                      np.log(np.maximum(float(buf.posterior_variance[0]),
                                        1e-20)), rtol=1e-3)
    _ = c2  # c2 checked implicitly via engine parity tests


def test_unknown_schedule_raises():
    with pytest.raises(NotImplementedError):
        make_beta_schedule("nope", 10)
