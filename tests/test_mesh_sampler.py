"""Multi-chip sampling: the DP-mesh-sharded sampler must equal the
single-device sampler image for image.

This is the north-star benchmark path (BASELINE.md: throughput scales with
mesh size): batch + per-image RNG keys sharded over the ``data`` axis,
params replicated, the whole T-step reverse scan one mesh-jitted program.
Per-image keys (pad_batch_with_keys) make each image's noise stream a
function of its own key only, so the result is invariant to device count
and batch grouping — which is what makes this exact-equality test possible.

Runs on the 8-device virtual CPU mesh from conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastdiffsr_tpu.diffusion import (DiffusionEngine, DiffusionSpec,
                                      ScheduleBuffers)
from fastdiffsr_tpu.models import FastDiffSRUNet
from fastdiffsr_tpu.parallel import auto_mesh, make_mesh
from fastdiffsr_tpu.train import make_sample_fn, pad_batch_with_keys

B, H, W = 8, 16, 16


@pytest.fixture(scope="module")
def setup():
    engine = DiffusionEngine(
        DiffusionSpec.for_variant("fastdiffsr"),
        ScheduleBuffers.create({"schedule": "linear_cosine",
                                "n_timestep": 6,
                                "linear_start": 1e-6, "linear_end": 1e-2}))
    net = FastDiffSRUNet(inner_channel=16, norm_groups=8,
                         channel_mults=(1, 2), res_blocks=1, dropout=0.0)
    rng = jax.random.PRNGKey(0)
    params = net.init(rng, jnp.zeros((1, H, W, 6)), jnp.ones((1,)))["params"]

    def apply_fn(p, x_in, level, drng):
        return net.apply({"params": p}, x_in, level, deterministic=True)

    cond = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3),
                              jnp.float32, -1, 1)
    _, keys = pad_batch_with_keys(cond, B, jax.random.PRNGKey(2), 0)
    return engine, apply_fn, params, cond, keys


def test_mesh_sampler_matches_single_device(setup):
    engine, apply_fn, params, cond, keys = setup
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    mesh = make_mesh(8)

    single = make_sample_fn(engine, apply_fn)
    sharded = make_sample_fn(engine, apply_fn, mesh=mesh)

    out_1 = np.asarray(single(params, cond, keys))
    out_8 = np.asarray(sharded(params, cond, keys))
    assert out_8.shape == (B, H, W, 3)
    np.testing.assert_allclose(out_8, out_1, atol=5e-4, rtol=0)


def test_mesh_sampler_ddim_matches_single_device(setup):
    engine, apply_fn, params, cond, keys = setup
    mesh = make_mesh(4)
    single = make_sample_fn(engine, apply_fn, sampler="ddim", ddim_steps=3)
    sharded = make_sample_fn(engine, apply_fn, mesh=mesh, sampler="ddim",
                             ddim_steps=3)
    out_1 = np.asarray(single(params, cond, keys))
    out_4 = np.asarray(sharded(params, cond, keys))
    np.testing.assert_allclose(out_4, out_1, atol=5e-4, rtol=0)


def test_mesh_sampler_dpm_matches_single_device(setup):
    engine, apply_fn, params, cond, keys = setup
    mesh = make_mesh(4)
    single = make_sample_fn(engine, apply_fn, sampler="dpm", ddim_steps=4)
    sharded = make_sample_fn(engine, apply_fn, mesh=mesh, sampler="dpm",
                             ddim_steps=4)
    out_1 = np.asarray(single(params, cond, keys))
    out_4 = np.asarray(sharded(params, cond, keys))
    np.testing.assert_allclose(out_4, out_1, atol=5e-4, rtol=0)


def test_mesh_sampler_batch_grouping_invariance(setup):
    """Mesh output for a batch == concat of two half-batch mesh runs with
    global-index keys (the val/infer loop's contract)."""
    engine, apply_fn, params, cond, _ = setup
    mesh = make_mesh(4)
    sharded = make_sample_fn(engine, apply_fn, mesh=mesh)
    rng = jax.random.PRNGKey(2)

    _, keys_full = pad_batch_with_keys(cond, B, rng, 0)
    full = np.asarray(sharded(params, cond, keys_full))

    halves = []
    for start in (0, B // 2):
        part = cond[start:start + B // 2]
        part, keys = pad_batch_with_keys(part, B // 2, rng, start)
        halves.append(np.asarray(sharded(params, part, keys)))
    np.testing.assert_allclose(np.concatenate(halves), full, atol=5e-4,
                               rtol=0)


def test_auto_mesh_rule():
    """Largest divisor of batch_size that fits the 8 virtual devices
    (gcd was wrong: it idled valid meshes, e.g. batch 12 -> 4 not 6)."""
    assert auto_mesh(1) is None
    m = auto_mesh(8)
    assert m is not None and m.devices.size == 8
    m = auto_mesh(12)  # divisors of 12 under 8: 6 beats gcd's 4
    assert m is not None and m.devices.size == 6
    m = auto_mesh(6)
    assert m is not None and m.devices.size == 6
    m = auto_mesh(3)  # gcd(3, 8) = 1 would have returned None
    assert m is not None and m.devices.size == 3
    m = auto_mesh(7)
    assert m is not None and m.devices.size == 7
