"""Reference-compatible DDPM wrapper API: feed_data/optimize/test/sample/
schedule hot-swap/checkpoint round trip."""

import numpy as np
import pytest

from fastdiffsr_tpu.config import dict_to_nonedict


def _opt(tmp_path):
    return dict_to_nonedict({
        "phase": "train",
        "path": {"checkpoint": str(tmp_path / "ckpt"),
                 "resume_state": None},
        "model": {
            "which_model_G": "fastdiffsr",
            "unet": {"in_channel": 6, "out_channel": 3,
                     "inner_channel": 8, "norm_groups": 4,
                     "channel_multiplier": [1, 2], "attn_res": [8],
                     "res_blocks": 1, "dropout": 0.0},
            "beta_schedule": {
                "train": {"schedule": "linear_cosine", "n_timestep": 6,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "linear_cosine", "n_timestep": 4,
                        "linear_start": 1e-6, "linear_end": 1e-2}},
            "diffusion": {"image_size": 16, "channels": 3,
                          "conditional": True},
        },
        "train": {"optimizer": {"type": "adam", "lr": 1e-3},
                  "ema_scheduler": {"step_start_ema": 100,
                                    "ema_decay": 0.99}},
    })


def test_wrapper_roundtrip(tmp_path):
    from fastdiffsr_tpu.model_api import create_model

    m = create_model(_opt(tmp_path))
    assert m.count_parameters() > 0

    rng = np.random.default_rng(0)
    batch = {"HR": rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32),
             "SR": rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)}
    m.feed_data(batch)
    m.optimize_parameters()
    m.optimize_parameters()
    assert np.isfinite(m.get_current_log()["l_pix"])
    assert int(m.state.step) == 2

    # schedule hot-swap to val (T=4) then sample
    m.set_new_noise_schedule(schedule_phase="val")
    assert m.engine.buffers.num_timesteps == 4
    sr = m.test(continous=False)
    assert sr.shape == (2, 16, 16, 3)
    vis = m.get_current_visuals()
    assert set(vis) >= {"SR", "INF", "HR"}

    final, traj = m.test(continous=True), m.SR
    assert m.SR.shape[0] == 4  # trajectory stack (T, B, H, W, C) -> T first

    # NOTE: unconditional .sample() requires an in_channel=3 unconditional
    # config (as in the reference, model/model.py:70-77 would feed a
    # 3-channel input to a 6-channel stem and fail the same way).
    # It is covered by test_unconditional_sample below.

    # checkpoint round trip
    path = m.save_network(epoch=1, iter_step=2)
    opt2 = _opt(tmp_path)
    opt2["path"]["resume_state"] = path
    from fastdiffsr_tpu.model_api import create_model as cm2
    m2 = cm2(opt2)
    assert m2.begin_step == 2 and m2.begin_epoch == 1
    a = np.asarray(
        next(iter(np.asarray(x) for x in
                  __import__("jax").tree_util.tree_leaves(m.state.params))))
    b = np.asarray(
        next(iter(np.asarray(x) for x in
                  __import__("jax").tree_util.tree_leaves(m2.state.params))))
    np.testing.assert_allclose(a, b)


def test_unconditional_sample(tmp_path):
    """model.py:70-77 unconditional sample(): the reference's
    unconditional branch never applies res2img
    (fastdiffsr_modules/diffusion.py:196-203), so a residual-space spec
    with cond=None must return the raw sampled tensor, not crash."""
    from fastdiffsr_tpu.model_api import create_model

    opt = _opt(tmp_path)
    opt["model"]["unet"]["in_channel"] = 3
    opt["model"]["diffusion"]["conditional"] = False
    m = create_model(opt)
    m.set_new_noise_schedule(schedule_phase="val")
    out = m.sample(batch_size=2)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
