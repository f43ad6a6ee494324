"""Device mesh + sharding rules.

TPU-native replacement for the reference's two parallelism mechanisms
(nn.DataParallel, model/networks.py:116-118; and EDiffSR's NCCL DDP,
EDiffSR/codes/config/sisr/train.py:28-40): one SPMD program over a
``jax.sharding.Mesh``. Batches are sharded over the ``data`` axis; params
are replicated; XLA emits the gradient all-reduce over ICI automatically.

The image models here have no tensor/pipeline-parallel need (SURVEY.md
§2.6) — DP is the whole story, so the mesh is 1-D. A ``space`` axis is
reserved for future spatial sharding of very large tiles (halo exchange
under shard_map), unused by default.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def auto_mesh(batch_size: int, devices=None) -> Optional[Mesh]:
    """Largest DP mesh that evenly divides ``batch_size``: the default
    mesh-selection rule shared by the train/val/infer CLIs (the reference's
    analogue is the gpu_ids list, model/networks.py:116-118). Returns None
    when only one device would participate.

    Considers only THIS process's devices (identical to jax.devices() in
    single-process mode): auto_mesh is the local DP rule; multi-host paths
    build the cross-process mesh explicitly (multihost.global_mesh),
    because a mesh silently spanning remote devices would turn every
    jitted call into a collective all processes must join."""
    if devices is None:
        devices = jax.local_devices()
    b = int(batch_size)
    # largest divisor of batch_size that fits the device count (gcd was
    # wrong: batch 6 on 4 devices -> gcd 2, leaving a valid 3-chip mesh
    # idle; batch 3 on 8 devices -> gcd 1, no mesh at all)
    n = next((d for d in range(min(b, len(devices)), 1, -1)
              if b % d == 0), 1)
    return make_mesh(n, devices=devices) if n > 1 else None


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def mesh_is_multiprocess(mesh: Mesh) -> bool:
    """True when the mesh spans devices of more than one process (a
    multi-host SPMD mesh): plain jax.device_put cannot address the remote
    devices, so batch placement must assemble global arrays from each
    process's local rows instead."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict onto the mesh, sharded on the leading axis.

    Single-process mesh: ``batch`` is the full batch; device_put splits it.
    Multi-process mesh: ``batch`` is THIS process's local rows (the
    process-sharded loader's output) and the returned global arrays have
    leading dim local_rows * process_count — i.e. the call transparently
    degrades to :func:`multihost.shard_local_batch` (the reference's
    per-rank batch split semantics)."""
    if mesh_is_multiprocess(mesh):
        from .multihost import shard_local_batch
        return shard_local_batch(batch, mesh)
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
