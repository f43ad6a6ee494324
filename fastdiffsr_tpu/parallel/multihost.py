"""Multi-host (multi-process) SPMD support.

TPU-native replacement for the reference's multi-process story (EDiffSR
DDP over NCCL with env-RANK init, EDiffSR/codes/config/sisr/train.py:28-40,
and its per-rank batch split, data/__init__.py:10-19): one JAX SPMD program
whose global mesh spans every process's devices. Each process feeds only
its local slice of the global batch (the DataLoader already strides the
dataset by ``process_index`` — data/dataset.py); the helpers here assemble
those local slices into global ``jax.Array``s that the mesh-sharded
train/sample steps (train/steps.py) consume unchanged.

On a real TPU pod ``jax.distributed.initialize()`` auto-detects the
cluster from the TPU environment. For CI and single-machine testing the
same code path runs as N CPU processes with gloo collectives
(tests/test_multihost.py drives a 2-process x 4-device cluster through a
full DP train step + sampler).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import DATA_AXIS, batch_sharding, replicated_sharding


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_count: Optional[int] = None,
               platform: Optional[str] = None) -> None:
    """Join (or form) the multi-process cluster.

    With no arguments this defers to ``jax.distributed.initialize()``'s
    auto-detection (TPU pods, or the standard JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars). ``platform='cpu'`` forces
    the CPU backend through the config API — the env var alone loses to an
    installed TPU plugin (see tests/conftest.py) — and
    ``local_device_count`` then sets per-process CPU device count, which
    is how the multi-host path is exercised without a pod.
    """
    if platform is not None:
        jax.config.update("jax_platforms", platform)
    if local_device_count is not None:
        jax.config.update("jax_num_cpu_devices", local_device_count)
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def initialize_from_env() -> None:
    """CLI hook (-dist): join the cluster using FASTDIFFSR_TPU_* env vars
    when present, else jax.distributed auto-detection (TPU pods need no
    configuration; a CPU test cluster sets all five).

    FASTDIFFSR_TPU_COORD          coordinator host:port
    FASTDIFFSR_TPU_NPROCS         number of processes
    FASTDIFFSR_TPU_PROC_ID        this process's id
    FASTDIFFSR_TPU_LOCAL_DEVICES  per-process device count (CPU testing)
    FASTDIFFSR_TPU_DIST_PLATFORM  'cpu' to force the CPU backend
    """
    import os

    def _int(name):
        v = os.environ.get(name)
        return int(v) if v else None

    initialize(
        coordinator_address=os.environ.get("FASTDIFFSR_TPU_COORD"),
        num_processes=_int("FASTDIFFSR_TPU_NPROCS"),
        process_id=_int("FASTDIFFSR_TPU_PROC_ID"),
        local_device_count=_int("FASTDIFFSR_TPU_LOCAL_DEVICES"),
        platform=os.environ.get("FASTDIFFSR_TPU_DIST_PLATFORM"))


def global_mesh() -> Mesh:
    """1-D DP mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (DATA_AXIS,))


def shard_local_batch(batch: dict, mesh: Mesh):
    """Per-process local batch dict -> global batch-sharded jax.Arrays.

    Each process passes the (local_batch, ...) arrays its own loader
    produced; the returned arrays have global leading dim
    local_batch * process_count, matching the reference's per-rank batch
    split semantics (global batch = per-rank batch x world size).
    """
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)


def replicate(tree, mesh: Mesh):
    """Replicate a host pytree onto every device of a (possibly
    multi-host) mesh. Every process must hold the SAME host values (same
    init seed / same checkpoint) — this is the multi-host analogue of
    ``jax.device_put(tree, replicated_sharding(mesh))``, which only
    addresses local devices."""
    sh = replicated_sharding(mesh)

    def put(x):
        import jax.numpy as jnp

        # typed PRNG keys (e.g. the train CLI's rbg dropout keys) cannot
        # round-trip through numpy: replicate the underlying uint32 key
        # data and rewrap with the same impl
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                  jax.dtypes.prng_key):
            impl = jax.random.key_impl(x)
            data = np.asarray(jax.random.key_data(x))
            arr = jax.make_array_from_callback(data.shape, sh,
                                               lambda idx: data[idx])
            return jax.random.wrap_key_data(arr, impl=impl)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    return jax.tree_util.tree_map(put, tree)


def fetch_replicated(x):
    """Host value of a replicated global array (addressable shard 0)."""
    return np.asarray(x.addressable_data(0))
