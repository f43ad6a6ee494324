"""Train state: params + Adam state + EMA params + counters.

The reference promises EMA in its config (ema_scheduler block,
config/sr_fastdiffsr_train_64_256.json:87-91) but leaves it dormant; here it
is implemented properly (decay 0.9999, start step 5000 by default) while
evaluation can still use raw params for reference parity.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array                    # ()
    epoch: jax.Array                   # () — tracked for checkpoint naming
    params: Any
    opt_state: Any
    ema_params: Any

    def ema_or_params(self, use_ema: bool = True):
        return self.ema_params if use_ema else self.params


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
    )


def make_optimizer(opt_cfg: Optional[dict] = None) -> optax.GradientTransformation:
    """Adam lr 2e-4 default (reference model/model.py:36-38)."""
    opt_cfg = opt_cfg or {}
    lr = float(opt_cfg.get("lr", 2e-4))
    kind = str(opt_cfg.get("type", "adam")).lower()
    if kind == "adam":
        return optax.adam(lr)
    if kind == "adamw":
        return optax.adamw(lr)
    if kind == "lion":
        return optax.lion(lr)
    raise ValueError(f"unknown optimizer type: {kind}")
