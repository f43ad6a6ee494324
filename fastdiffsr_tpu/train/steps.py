"""Jitted train / sample steps with SPMD data-parallel sharding.

``make_train_step`` compiles one XLA program per mesh: batch sharded over
the ``data`` axis, params/opt-state replicated; gradient all-reduce is
emitted by XLA (replaces nn.DataParallel / DDP of the reference).

``make_sample_fn`` compiles the full T-step reverse diffusion (a lax.scan
inside the program — see diffusion/engine.py) into one program; with a mesh
it runs batched across chips, which is the benchmark path
(SR images/sec/chip, SURVEY.md §6).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..diffusion.engine import DiffusionEngine
from ..parallel.mesh import batch_sharding, replicated_sharding
from .state import TrainState


def _train_step_body(engine: DiffusionEngine,
                     apply_fn: Callable,
                     tx: optax.GradientTransformation,
                     ema_decay: float,
                     ema_start: int):
    """Shared (state, batch, rng) -> (state, metrics) update body."""

    def loss_fn(params, batch, rng):
        rng_diff, rng_drop = jax.random.split(rng)

        def denoise(x_in, level):
            return apply_fn(params, x_in, level, rng_drop)

        return engine.training_loss(denoise, batch, rng_diff)

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # EMA: plain copy until ema_start, then exponential average
        # (reference config ema_scheduler block; implemented for real here)
        decay = jnp.where(state.step >= ema_start, ema_decay, 0.0)
        ema_params = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p,
            state.ema_params, params)

        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, ema_params=ema_params)
        metrics = {"l_pix": loss,
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return train_step


def make_train_step(engine: DiffusionEngine,
                    apply_fn: Callable,
                    tx: optax.GradientTransformation,
                    ema_decay: float = 0.9999,
                    ema_start: int = 5000,
                    mesh=None):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    apply_fn(params, x_in, noise_level, rng) -> model output; dropout rng is
    threaded through. Loss normalization matches the reference
    (sum/(b*c*h*w) == mean; model/model.py:47-57).
    """
    train_step = _train_step_body(engine, apply_fn, tx, ema_decay, ema_start)

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_cached_train_step(engine: DiffusionEngine,
                           apply_fn: Callable,
                           tx: optax.GradientTransformation,
                           batch_size: int,
                           ema_decay: float = 0.9999,
                           ema_start: int = 5000,
                           hflip: bool = True,
                           mesh=None,
                           n_sub: int = 1):
    """Device-resident-dataset train step: the whole (uint8) dataset lives
    in HBM and batch assembly — random index draw, [-1,1] normalization,
    paired random hflip — happens INSIDE the jitted program.

    Returns train_step(state, data, rng) -> (state, metrics), where
    ``data`` is a dict of committed device arrays
    {'HR': (N,r,r,3) u8, 'SR': (N,r,r,3) u8} passed unchanged every call.

    Why this exists (beyond being the natural TPU-native shape): the
    steady-state loop performs ZERO host->device traffic, which (a) removes
    the host data path entirely and (b) sidesteps a measured axon-tunnel
    client leak of ~the batch size per H2D transfer (see BASELINE.md).
    Batches are drawn with replacement (the loader's epoch-permutation
    semantics are not reproduced); normalization and paired-hflip match
    the loader exactly (data/dataset.py to_minus1_1/_maybe_flip).

    With a ``mesh`` the uint8 dataset is REPLICATED across devices (UCM/
    Potsdam-scale tile corpora fit one chip's HBM; replication keeps the
    per-step gather local) and the assembled batch is sharding-constrained
    onto the ``data`` axis, so the UNet fwd/bwd runs DP with XLA-inserted
    grad psums — the fastest training mode and DP compose
    (tests/test_train.py::test_cached_train_step_mesh).

    ``n_sub > 1`` chains that many optimizer steps inside ONE dispatch via
    ``lax.scan`` — the same per-dispatch-overhead amortization the bench
    harness uses (BASELINE.md: the axon tunnel charges 2-150 ms per
    dispatch depending on phase; at 150 ms a single-step loop is 5x
    slower than the compute). The call signature changes: ``rng`` is the
    BASE key, and each sub-step derives ``fold_in(rng, state.step)`` from
    the carried step counter — the same step/key sequence as ``n_sub``
    sequential single-step calls with host-side folding, numerically
    identical (verified to 1e-6; XLA may fuse/reassociate the scanned
    body differently from the unrolled program, so bitwise equality is
    not guaranteed —
    tests/test_train.py::test_cached_train_step_chained). ``metrics``
    values come back stacked with leading dim ``n_sub``.
    """
    body = _train_step_body(engine, apply_fn, tx, ema_decay, ema_start)

    def assemble(data, rng):
        n = data["HR"].shape[0]
        rng_idx, rng_flip, rng_body = jax.random.split(rng, 3)
        idx = jax.random.randint(rng_idx, (batch_size,), 0, n)
        batch = {k: v[idx].astype(jnp.float32) / 127.5 - 1.0
                 for k, v in data.items()}
        if hflip:
            flip = jax.random.bernoulli(rng_flip, 0.5, (batch_size,))
            sel = flip[:, None, None, None]
            batch = {k: jnp.where(sel, v[:, :, ::-1, :], v)
                     for k, v in batch.items()}
        return batch, rng_body

    def one_step(state: TrainState, data: dict, rng: jax.Array):
        batch, rng_body = assemble(data, rng)
        if mesh is not None:
            batch = jax.lax.with_sharding_constraint(
                batch, batch_sharding(mesh))
        return body(state, batch, rng_body)

    if n_sub == 1:
        train_step = one_step
    else:
        def train_step(state: TrainState, data: dict, rng: jax.Array):
            def sub(s, _):
                return one_step(s, data, jax.random.fold_in(rng, s.step))
            return jax.lax.scan(sub, state, None, length=n_sub)

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    repl = replicated_sharding(mesh)
    return jax.jit(train_step, in_shardings=(repl, repl, repl),
                   out_shardings=(repl, repl), donate_argnums=(0,))


def pad_batch_with_keys(cond, full_b: int, rng, start_index: int):
    """Shared val/infer batching contract: pad a tail batch to ``full_b``
    (so the jitted sampler program is reused) and derive one RNG key per
    image from its GLOBAL index — output is invariant to how the image set
    is grouped into batches. Returns (cond_padded, keys); entries past the
    original batch size are padding whose outputs the caller discards."""
    import numpy as np

    cond = np.asarray(cond)
    if cond.shape[0] < full_b:
        cond = np.concatenate(
            [cond, np.repeat(cond[:1], full_b - cond.shape[0], axis=0)],
            axis=0)
    keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
        jnp.arange(start_index, start_index + cond.shape[0]))
    return cond, keys


def make_sample_fn(engine: DiffusionEngine,
                   apply_fn: Callable,
                   mesh=None,
                   return_trajectory: bool = False,
                   sampler: str = "ancestral",
                   ddim_steps: Optional[int] = None,
                   ddim_eta: float = 0.0):
    """Returns sample(params, cond, rng) -> SR batch (B,H,W,C).

    The whole T-step reverse loop compiles to one XLA program. ``cond`` is
    the bicubic-upsampled LR batch in [-1, 1]. ``sampler='ddim'`` switches
    to DDIM with ``ddim_steps`` UNet evals (<= T; deterministic when
    ``ddim_eta=0``); ``sampler='dpm'`` to DPM-Solver++(2M) with the same
    ``ddim_steps`` count (always deterministic) — speed knobs the
    reference does not have.

    With a ``mesh`` the batch (and the per-image key array — mesh mode
    requires the batched-keys contract of :func:`pad_batch_with_keys`)
    is sharded over the ``data`` axis, params are replicated, and the
    reverse scan runs DP across chips — the north-star benchmark path
    (SR images/sec scaling linearly with mesh size, BASELINE.md). The
    per-image RNG keys make the output identical to the single-device
    sampler image-for-image (tests/test_mesh_sampler.py).
    """
    if sampler not in ("ancestral", "ddim", "dpm"):
        raise ValueError(
            f"sampler={sampler!r} (want 'ancestral', 'ddim' or 'dpm')")
    if sampler != "ancestral" and return_trajectory:
        raise ValueError("trajectory output is ancestral-only")

    def denoiser(params):
        def fn(x_in, level):
            return apply_fn(params, x_in, level, None)
        return fn

    def sample(params, cond, rng):
        if sampler == "dpm":
            return engine.sample_dpm(denoiser(params), cond, rng,
                                     steps=ddim_steps)
        if sampler == "ddim":
            return engine.sample_ddim(denoiser(params), cond, rng,
                                      steps=ddim_steps, eta=ddim_eta)
        return engine.sample(denoiser(params), cond, rng,
                             return_trajectory=return_trajectory)

    if mesh is None:
        return jax.jit(sample)

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    if return_trajectory:
        from jax.sharding import NamedSharding, PartitionSpec as P
        traj_sh = NamedSharding(mesh, P(None, "data"))  # (T, B, ...) — shard B
        out = (data, traj_sh)
    else:
        out = data
    # rng is the (B,)/(B,2) per-image key array — sharded with its images
    # so each chip draws only its own images' noise streams
    return jax.jit(sample, in_shardings=(repl, data, data),
                   out_shardings=out)
