"""bench.py CLI contract tests (no TPU needed).

The driver runs ``python bench.py`` at the end of every round and records
the one JSON line; these tests pin the cheap host-side contracts — flag
validation fails fast (before any XLA compile), and the chained-rep
harness runs the requested sampler — without paying a full 256² UNet
compile (the real-throughput path is exercised on the TPU directly).
"""

import pathlib
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_bad_sampler_flag_fails_fast():
    # must exit with the validation message in seconds — i.e. before the
    # flagship net init/compile, which takes minutes on CPU
    proc = subprocess.run(
        [sys.executable, "bench.py", "--sampler", "bogus"],
        cwd=REPO_ROOT, capture_output=True, text=True, timeout=60,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "HOME": "/root"})
    assert proc.returncode != 0
    assert "expected ancestral|ddim|dpm" in proc.stderr + proc.stdout


@pytest.mark.parametrize("sampler", ["ancestral", "ddim", "dpm"])
def test_chained_sample_fn_runs_selected_sampler(sampler):
    """make_chained_sample_fn(sample_fn=...) must execute the override:
    n chained reps of each sampler run on a tiny engine/denoiser."""
    sys.path.insert(0, str(REPO_ROOT))
    from bench import make_chained_sample_fn
    from fastdiffsr_tpu.diffusion import (DiffusionEngine, DiffusionSpec,
                                          ScheduleBuffers)

    engine = DiffusionEngine(
        DiffusionSpec.for_variant("fastdiffsr"),
        ScheduleBuffers.create({"schedule": "linear_cosine",
                                "n_timestep": 4,
                                "linear_start": 1e-6, "linear_end": 1e-2}))

    calls = {"n": 0}

    def apply_fn(params, x_in, level, _rng):
        calls["n"] += 1  # trace-time counter: once per jit trace
        return params * x_in[..., 3:]

    sample_fn = None
    if sampler == "ddim":
        sample_fn = lambda d, c, k: engine.sample_ddim(d, c, k, steps=2)
    elif sampler == "dpm":
        sample_fn = lambda d, c, k: engine.sample_dpm(d, c, k, steps=2)

    chained = make_chained_sample_fn(engine, apply_fn, sample_fn=sample_fn)
    cond = jnp.zeros((2, 8, 8, 3))
    out = np.asarray(chained(jnp.float32(0.1), cond,
                             jax.random.PRNGKey(0), 3))
    assert out.shape == cond.shape
    assert np.all(np.isfinite(out))
    assert calls["n"] >= 1
