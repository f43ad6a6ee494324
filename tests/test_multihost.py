"""Multi-host (multi-process) SPMD: the DP train step and the mesh-sharded
sampler produce the same math on a 2-process x 4-device CPU cluster (gloo
collectives, global mesh spanning processes) as on this process's own
8-device mesh — the TPU-pod execution model validated without a pod
(SURVEY.md §2.6: EDiffSR's DDP/NCCL -> jax.distributed + SPMD).
"""

import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdiffsr_tpu.diffusion import (DiffusionSpec, DiffusionEngine,
                                      ScheduleBuffers)
from fastdiffsr_tpu.models import FastDiffSRUNet
from fastdiffsr_tpu.parallel import make_mesh, shard_batch
from fastdiffsr_tpu.train import create_train_state, make_train_step
from fastdiffsr_tpu.train.state import make_optimizer
from fastdiffsr_tpu.train.steps import make_sample_fn, pad_batch_with_keys

WORKER = pathlib.Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _reference_run():
    """Same computation as the workers, on this process's 8 local devices."""
    engine = DiffusionEngine(
        DiffusionSpec.for_variant("fastdiffsr"),
        ScheduleBuffers.create({"schedule": "linear_cosine", "n_timestep": 20,
                                "linear_start": 1e-6, "linear_end": 1e-2}))
    net = FastDiffSRUNet(in_channel=6, out_channel=3, inner_channel=8,
                         norm_groups=4, channel_mults=(1, 2), res_blocks=1,
                         dropout=0.0)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)),
                      jnp.ones((1,)))["params"]

    def apply_fn(p, x_in, level, rng):
        return net.apply({"params": p}, x_in, level, deterministic=True)

    mesh = make_mesh(8)
    tx = make_optimizer({"lr": 2e-3})
    state = create_train_state(params, tx)
    step_fn = make_train_step(engine, apply_fn, tx, ema_start=10_000,
                              mesh=mesh)

    rng_np = np.random.default_rng(0)
    B, size = 8, 16
    gbatch = {k: rng_np.uniform(-1, 1, (B, size, size, 3)).astype(np.float32)
              for k in ("HR", "SR")}
    batch = shard_batch(gbatch, mesh)
    loss = None
    for i in range(3):
        state, metrics = step_fn(state, batch,
                                 jax.random.fold_in(jax.random.PRNGKey(42), i))
        loss = float(metrics["l_pix"])

    sample_fn = make_sample_fn(engine, apply_fn, mesh=mesh)
    cond_np = rng_np.uniform(-1, 1, (B, size, size, 3)).astype(np.float32)
    cond, keys = pad_batch_with_keys(cond_np, B, jax.random.PRNGKey(7), 0)
    out = sample_fn(state.params, shard_batch(jnp.asarray(cond), mesh),
                    shard_batch(keys, mesh))
    return loss, float(jnp.sum(out.astype(jnp.float32)))


@pytest.mark.skipif(sys.platform != "linux", reason="gloo TCP cluster")
def test_two_process_cluster_matches_single_process():
    port = _free_port()
    env = os.environ.copy()
    procs = [
        subprocess.Popen([sys.executable, str(WORKER), str(pid), "2",
                          str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=env, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{stderr[-3000:]}"
        line = [ln for ln in stdout.splitlines() if ln.startswith("{")][-1]
        outs.append(json.loads(line))

    # both processes observe the same replicated loss and sampler checksum
    assert outs[0]["loss"] == pytest.approx(outs[1]["loss"], rel=1e-6)
    assert outs[0]["check"] == pytest.approx(outs[1]["check"], rel=1e-6)

    ref_loss, ref_check = _reference_run()
    # gloo all-reduce ordering may differ from single-process XLA, so the
    # comparison is tolerance-based, not bitwise
    assert outs[0]["loss"] == pytest.approx(ref_loss, rel=2e-4)
    assert outs[0]["check"] == pytest.approx(ref_check, rel=2e-3, abs=2.0)
