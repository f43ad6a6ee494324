"""Multi-chip throughput dress rehearsal for the official bench harness
(VERDICT r4 next #7): the per-chip accounting path of bench.py has to be
provably correct BEFORE a pod ever runs it, and this host cannot prove it
with wall-clock (1 CPU core serves all 8 virtual devices, so meshed
wall-time is ~n_dev x the single-device time by construction).

Strategy: really build, shard, compile and execute the chained T=20
sampler on the conftest's virtual 8-device mesh through the exact
functions main() uses (mesh_and_total_batch -> make_chained_sample_fn ->
per_chip_throughput), but drive diff_time with a deterministic fake
clock that charges a fixed per-dispatch overhead plus a fixed cost per
chained rep. Then every quantity the harness reports has a closed-form
expected value:

- dt must equal n_rep * COST exactly (the R/2R min-differencing cancels
  the per-dispatch overhead EXACTLY, not approximately),
- images/sec/chip must equal B_per_chip / COST on the mesh AND
  single-device — the per-chip divisor is what makes them equal; a
  wrong divisor (e.g. forgetting /n_dev, or double-scaling B) breaks
  the equality by exactly n_dev x.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bench
from fastdiffsr_tpu.diffusion import (DiffusionEngine, DiffusionSpec,
                                      ScheduleBuffers)
from fastdiffsr_tpu.models import FastDiffSRUNet


B_PER_CHIP, H, W = 2, 16, 16
N_REP, N_BLOCKS = 2, 2
COST_PER_REP = 0.125          # fake seconds per chained sampler rep
OVERHEAD = 0.731              # fake per-dispatch overhead (cancelled)


class _FakeClock:
    """Stands in for bench.time: time() reads a counter that dispatch
    wrappers advance deterministically."""

    def __init__(self):
        self.now = 100.0

    def time(self):
        return self.now


def _tiny_sampler():
    engine = DiffusionEngine(
        DiffusionSpec.for_variant("fastdiffsr"),
        ScheduleBuffers.create({"schedule": "linear_cosine",
                                "n_timestep": 20,
                                "linear_start": 1e-6, "linear_end": 1e-2}))
    net = FastDiffSRUNet(inner_channel=16, norm_groups=8,
                         channel_mults=(1, 2), res_blocks=1, dropout=0.0)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 6)),
                      jnp.ones((1,)))["params"]

    def apply_fn(p, x_in, level, _rng):
        return net.apply({"params": p}, x_in, level, deterministic=True)

    return engine, apply_fn, params


def _measure(mesh, b_total, n_dev, monkeypatch):
    """Run the official pipeline on a real (tiny) sharded sampler with the
    fake clock; returns (images/sec/chip, dt, executions_seen)."""
    engine, apply_fn, params = _tiny_sampler()
    chained = bench.make_chained_sample_fn(engine, apply_fn, mesh=mesh)
    rng = jax.random.PRNGKey(1)
    cond = jax.random.uniform(rng, (b_total, H, W, 3), jnp.float32, -1, 1)

    def keys_for(i):
        if mesh is None:
            return jax.random.fold_in(rng, i)
        from fastdiffsr_tpu.train import pad_batch_with_keys
        return pad_batch_with_keys(cond, b_total,
                                   jax.random.fold_in(rng, i), 0)[1]

    # warmup/compile outside the timed region, exactly like main()
    np.asarray(chained(params, cond, keys_for(-1 % 2**31), 1))

    clock = _FakeClock()
    monkeypatch.setattr(bench, "time", clock)
    calls = []

    def dispatch(n, i):
        out = np.asarray(chained(params, cond, keys_for(i), n))
        assert out.shape == (b_total, H, W, 3)
        calls.append(n)
        clock.now += OVERHEAD + n * COST_PER_REP

    value, dt = bench.per_chip_throughput(dispatch, N_REP, N_BLOCKS,
                                          b_total, n_dev)
    return value, dt, calls


def test_mesh_and_total_batch_scaling():
    """B scales with the device count; the mesh covers every device."""
    mesh, b_total, n_dev = bench.mesh_and_total_batch(B_PER_CHIP)
    assert n_dev == jax.device_count() == 8
    assert b_total == B_PER_CHIP * n_dev
    assert mesh is not None and mesh.devices.size == n_dev


def test_per_chip_accounting_mesh_equals_single_device(monkeypatch):
    mesh, b_total, n_dev = bench.mesh_and_total_batch(B_PER_CHIP)
    v_mesh, dt_mesh, calls = _measure(mesh, b_total, n_dev, monkeypatch)
    # the harness really ran N_BLOCKS interleaved (R, 2R) block pairs
    assert calls == [N_REP, 2 * N_REP] * N_BLOCKS
    # min-differencing cancels the per-dispatch overhead EXACTLY
    assert dt_mesh == pytest.approx(N_REP * COST_PER_REP, rel=1e-12)

    v_one, dt_one, _ = _measure(None, B_PER_CHIP, 1, monkeypatch)
    assert dt_one == pytest.approx(N_REP * COST_PER_REP, rel=1e-12)

    # per-chip value is mesh-invariant: 8 devices each doing B_PER_CHIP
    # per rep report the same images/sec/chip as one device doing
    # B_PER_CHIP — a wrong divisor is off by exactly n_dev x
    expect = B_PER_CHIP / COST_PER_REP
    assert v_mesh == pytest.approx(expect, rel=1e-12)
    assert v_one == pytest.approx(expect, rel=1e-12)

    # and the aggregate identity the pod log would be checked against:
    # value * n_dev * dt == n_rep * B_total
    assert v_mesh * n_dev * dt_mesh == pytest.approx(N_REP * b_total,
                                                     rel=1e-12)


def test_real_clock_smoke():
    """Without the fake clock the same meshed pipeline yields a finite
    positive rate (no speed assertion — one host core serves all 8
    virtual devices)."""
    mesh, b_total, n_dev = bench.mesh_and_total_batch(B_PER_CHIP)
    engine, apply_fn, params = _tiny_sampler()
    chained = bench.make_chained_sample_fn(engine, apply_fn, mesh=mesh)
    rng = jax.random.PRNGKey(2)
    cond = jax.random.uniform(rng, (b_total, H, W, 3), jnp.float32, -1, 1)
    from fastdiffsr_tpu.train import pad_batch_with_keys
    keys = pad_batch_with_keys(cond, b_total, rng, 0)[1]
    np.asarray(chained(params, cond, keys, 1))
    value, dt = bench.per_chip_throughput(
        lambda n, i: np.asarray(chained(params, cond, keys, n)),
        1, 1, b_total, n_dev)
    assert np.isfinite(value) and value > 0
