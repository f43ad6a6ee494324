"""Checkpoint save/resume with reference-compatible naming.

Reference semantics (model/model.py:126-166): per save point two files
``I{iter}_E{epoch}_gen.pth`` (params) + ``I{iter}_E{epoch}_opt.pth``
(optimizer + counters); config resume points at the path *prefix*.

Here one checkpoint directory ``I{iter}_E{epoch}`` holds
{params, ema_params, opt_state, step, epoch}; ``load_state`` accepts the
same prefix convention. A converter from reference ``_gen.pth`` files lives
in models/convert.py.

Two storage backends, selected by ``backend=`` or the env var
``FASTDIFFSR_TPU_CKPT`` (load autodetects from what's on disk):

- ``pickle`` (default): one atomic ``state.pkl`` — dependency-free, fine
  single-host.
- ``orbax``: Orbax ``StandardCheckpointer`` under ``<dir>/orbax`` — the
  idiomatic JAX path (per-leaf Tensorstore storage, atomic finalization,
  multi-host-safe saves on a real pod).
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import jax
import numpy as np

from .state import TrainState


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _payload_of(state: TrainState, epoch: int) -> dict:
    return {
        "step": np.asarray(int(state.step), np.int32),
        "epoch": np.asarray(int(epoch), np.int32),
        "params": _to_numpy_tree(state.params),
        "ema_params": _to_numpy_tree(state.ema_params),
        "opt_state": _to_numpy_tree(state.opt_state),
    }


def resolve_backend(backend: Optional[str] = None) -> str:
    """Resolve + validate the checkpoint backend. Called by the CLIs at
    startup so a typo'd FASTDIFFSR_TPU_CKPT fails before hours of training,
    not at the first save."""
    backend = backend or os.environ.get("FASTDIFFSR_TPU_CKPT", "pickle")
    if backend not in ("pickle", "orbax"):
        raise ValueError(f"unknown checkpoint backend: {backend!r} "
                         "(want 'pickle' or 'orbax')")
    return backend


def save_state(state: TrainState, ckpt_dir: str, *, it: Optional[int] = None,
               epoch: Optional[int] = None,
               backend: Optional[str] = None) -> str:
    backend = resolve_backend(backend)
    it = int(state.step) if it is None else it
    epoch = int(state.epoch) if epoch is None else epoch
    path = os.path.join(ckpt_dir, f"I{it}_E{epoch}")
    os.makedirs(path, exist_ok=True)
    payload = _payload_of(state, epoch)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(os.path.join(path, "orbax")),
                       payload, force=True)
        return path
    tmp = os.path.join(path, "state.pkl.tmp")
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, os.path.join(path, "state.pkl"))
    return path


def load_state(prefix: str, template: TrainState) -> TrainState:
    """Load from a checkpoint dir or reference-style prefix
    ('.../I896896_E196'). Backend is autodetected from the files present
    (``state.pkl`` vs an ``orbax/`` subdirectory)."""
    path = prefix
    state_file = os.path.join(path, "state.pkl")
    if os.path.exists(state_file):
        with open(state_file, "rb") as f:
            payload = pickle.load(f)
    elif os.path.isdir(os.path.join(path, "orbax")):
        import orbax.checkpoint as ocp

        # restore template = exactly the save payload's structure
        tmpl = _payload_of(template, 0)
        with ocp.StandardCheckpointer() as ckptr:
            payload = ckptr.restore(
                os.path.abspath(os.path.join(path, "orbax")), tmpl)
    else:
        raise FileNotFoundError(
            f"no checkpoint found under {path!r} "
            "(neither state.pkl nor orbax/)")

    def restore(tmpl, loaded):
        return jax.tree_util.tree_map(
            lambda t, l: jax.numpy.asarray(l, getattr(t, "dtype", None)),
            tmpl, loaded)

    import jax.numpy as jnp
    return template.replace(
        step=jnp.asarray(payload["step"], jnp.int32),
        epoch=jnp.asarray(payload["epoch"], jnp.int32),
        params=restore(template.params, payload["params"]),
        ema_params=restore(template.ema_params, payload["ema_params"]),
        opt_state=restore(template.opt_state, payload["opt_state"]),
    )


def load_params_only(prefix: str, use_ema: bool = False) -> dict:
    """Restore only the (EMA) params tree for eval/infer.

    ``use_ema=True`` selects the EMA shadow params (``--use_ema`` eval
    path; default off for reference parity — the reference always
    evaluates raw params, model/model.py:59-68). The orbax branch
    restores from saved metadata without a target tree; the roundtrip is
    covered by tests/test_train.py::test_load_params_only_orbax.
    """
    key = "ema_params" if use_ema else "params"
    state_file = os.path.join(prefix, "state.pkl")
    if os.path.exists(state_file):
        with open(state_file, "rb") as f:
            payload = pickle.load(f)
        return payload[key]
    if not os.path.isdir(os.path.join(prefix, "orbax")):
        raise FileNotFoundError(
            f"no checkpoint found under {prefix!r} "
            "(neither state.pkl nor orbax/)")
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        payload = ckptr.restore(
            os.path.abspath(os.path.join(prefix, "orbax")))
    return payload[key]


def load_reference_gen_pth(path: str) -> dict:
    """Convert a reference ``*_gen.pth`` (GaussianDiffusion state_dict) into
    Flax UNet params (requires torch)."""
    import torch

    from ..models.convert import strip_diffusion_prefix, torch_unet_to_flax
    sd = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    return torch_unet_to_flax(strip_diffusion_prefix(sd))
