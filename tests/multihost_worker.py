"""One process of the N-process CPU cluster driven by tests/test_multihost.py.

Runs the REAL multi-host path (parallel/multihost.py): joins the cluster,
builds the global DP mesh spanning both processes' devices, assembles the
global batch from this process's local slice, runs 3 jitted DP train steps
(XLA/gloo gradient all-reduce across processes), then the mesh-sharded
T=20 sampler — the TPU-pod execution model of SURVEY.md §2.6, exercised
without a pod. Prints one JSON line with the final loss and a sampler
checksum for the parent to compare against its single-process 8-device
reference run.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import json
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    # The parent (pytest) env forces 8 host-platform devices per process
    # (tests/conftest.py); here each process must contribute 4 devices to
    # an 8-device GLOBAL mesh instead.
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = " ".join(
        t for t in flags.split()
        if "xla_force_host_platform_device_count" not in t)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax
    from fastdiffsr_tpu.parallel import multihost

    multihost.initialize(f"127.0.0.1:{port}", nproc, pid,
                         local_device_count=8 // nproc, platform="cpu")
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    import numpy as np
    import jax.numpy as jnp

    from fastdiffsr_tpu.diffusion import (DiffusionSpec, DiffusionEngine,
                                          ScheduleBuffers)
    from fastdiffsr_tpu.models import FastDiffSRUNet
    from fastdiffsr_tpu.train import create_train_state, make_train_step
    from fastdiffsr_tpu.train.state import make_optimizer
    from fastdiffsr_tpu.train.steps import make_sample_fn, pad_batch_with_keys

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

    mesh = multihost.global_mesh()
    tx = make_optimizer({"lr": 2e-3})
    state = multihost.replicate(create_train_state(params, tx), mesh)
    step_fn = make_train_step(engine, apply_fn, tx, ema_start=10_000,
                              mesh=mesh)

    # identical global batch on every process; this process feeds only
    # its local rows (the DataLoader's process_index stride, simulated)
    rng_np = np.random.default_rng(0)
    B, size = 8, 16
    gbatch = {k: rng_np.uniform(-1, 1, (B, size, size, 3)).astype(np.float32)
              for k in ("HR", "SR")}
    local = B // nproc
    lbatch = {k: v[pid * local:(pid + 1) * local] for k, v in gbatch.items()}
    batch = multihost.shard_local_batch(lbatch, mesh)

    loss = None
    for i in range(3):
        rng_i = multihost.replicate(
            jax.random.fold_in(jax.random.PRNGKey(42), i), mesh)
        state, metrics = step_fn(state, batch, rng_i)
        loss = float(multihost.fetch_replicated(metrics["l_pix"]))

    # mesh-sharded sampler on the trained params, per-image keys
    sample_fn = make_sample_fn(engine, apply_fn, mesh=mesh)
    cond_np = rng_np.uniform(-1, 1, (B, size, size, 3)).astype(np.float32)
    _, keys = pad_batch_with_keys(cond_np, B, jax.random.PRNGKey(7), 0)
    keys = np.asarray(keys)
    cond = multihost.shard_local_batch(
        cond_np[pid * local:(pid + 1) * local], mesh)
    gkeys = multihost.shard_local_batch(
        keys[pid * local:(pid + 1) * local], mesh)
    out = sample_fn(state.params, cond, gkeys)

    from jax.sharding import NamedSharding, PartitionSpec as P
    checksum = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)),
                       out_shardings=NamedSharding(mesh, P()))(out)
    check = float(multihost.fetch_replicated(checksum))

    print(json.dumps({"pid": pid, "loss": loss, "check": check}), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
