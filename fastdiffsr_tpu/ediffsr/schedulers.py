"""EDiffSR learning-rate schedules as optax-compatible closed forms.

Parity targets (EDiffSR/codes/config/sisr/):
- ``MultiStepLR_Restart`` (models/lr_scheduler.py:8-45) — step decays at
  milestones, full resets to ``initial_lr * weight`` at restart iters.
  NOTE the reference multiplies by the hard-coded ``self.gamma_ = 0.5``
  at milestones, ignoring the ``gamma`` constructor arg — quirk preserved
  (pass ``gamma`` to override it here; default 0.5 matches the reference
  behavior). ``clear_state`` (zeroing Adam moments at restarts) is not
  replicated: it mutates optimizer state out-of-band, and no shipped
  config enables restarts.
- ``CosineAnnealingLR_Restart`` (models/lr_scheduler.py:47-104) — cosine
  over per-period lengths ``T_period``, resets to ``initial_lr * weight``
  at restarts. The reference's recursive per-step form telescopes to the
  standard closed form eta_min + (lr0*w - eta_min)*(1+cos(pi*t'/T))/2.
- warmup (models/base_model.py:52-64) — for ``cur_iter < warmup_iter`` the
  lr is OVERRIDDEN with ``initial_lr * cur_iter / warmup_iter`` (linear
  ramp from 0), regardless of the scheduler's value.

All return ``f(step) -> lr`` usable as an optax schedule (jnp-traceable,
static breakpoint arrays).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np


def multistep_restart_schedule(init_lr: float,
                               milestones: Sequence[int],
                               restarts: Optional[Sequence[int]] = None,
                               weights: Optional[Sequence[float]] = None,
                               gamma: float = 0.5):
    """lr(t) = init_lr * weight[last restart <= t] * gamma^(#milestones in
    (last_restart, t])."""
    restarts = list(restarts) if restarts else []
    weights = list(weights) if weights else []
    assert len(restarts) == len(weights), \
        "restarts and their weights do not match."
    r = np.asarray([0] + restarts, np.int64)
    w = np.asarray([1.0] + weights, np.float64)
    order = np.argsort(r)
    r, w = jnp.asarray(r[order]), jnp.asarray(w[order])
    m = jnp.asarray(np.sort(np.asarray(list(milestones), np.int64)))

    def schedule(step):
        t = jnp.asarray(step, jnp.int64)
        i = jnp.searchsorted(r, t, side="right") - 1
        last_r = r[i]
        n_miles = (jnp.searchsorted(m, t, side="right")
                   - jnp.searchsorted(m, last_r, side="right"))
        return init_lr * w[i] * gamma ** n_miles.astype(jnp.float32)

    return schedule


def cosine_annealing_restart_schedule(init_lr: float,
                                      T_period: Sequence[int],
                                      restarts: Optional[Sequence[int]] = None,
                                      weights: Optional[Sequence[float]] = None,
                                      eta_min: float = 0.0):
    """Cosine within each restart period; period i runs from restart i-1
    (or 0) with length T_period[i] and peak init_lr * weight[i]."""
    restarts = list(restarts) if restarts else []
    weights = list(weights) if weights else []
    assert len(restarts) == len(weights), \
        "restarts and their weights do not match."
    assert len(T_period) == len(restarts) + 1, \
        "T_period needs one entry per restart segment."
    r = jnp.asarray([0] + sorted(restarts), jnp.int64)
    w = jnp.asarray([1.0] + weights, jnp.float32)
    T = jnp.asarray(list(T_period), jnp.float32)

    def schedule(step):
        t = jnp.asarray(step, jnp.int64)
        i = jnp.searchsorted(r, t, side="right") - 1
        frac = (t - r[i]).astype(jnp.float32) / T[i]
        return (eta_min + (init_lr * w[i] - eta_min)
                * (1 + jnp.cos(jnp.pi * frac)) / 2).astype(jnp.float32)

    return schedule


def with_warmup(schedule, init_lr: float, warmup_iter: int):
    """Reference warmup (base_model.py:52-64): linear 0 -> init_lr for
    t < warmup_iter, overriding the base schedule; the base schedule's own
    value takes over from t == warmup_iter."""
    if not warmup_iter or warmup_iter <= 0:
        return schedule if callable(schedule) else (lambda t: schedule)
    base = schedule if callable(schedule) else (lambda t: schedule)

    def warmed(step):
        t = jnp.asarray(step)
        # the reference's cur_iter is 1-based (train.py:235-252: the
        # counter increments before optimize), so the first update runs
        # at init_lr/warmup_iter, not 0
        cur = t.astype(jnp.float32) + 1.0
        return jnp.where(cur < warmup_iter,
                         init_lr * cur / warmup_iter,
                         base(t))

    return warmed
