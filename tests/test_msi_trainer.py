"""MSI shared trainer smoke: tiny SwinIR trains a few steps, validates,
per-class breakdown, single-image test."""

import logging
import os
import types

import numpy as np
import pytest


@pytest.fixture(scope="module")
def msi_env(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("msi")
    rng = np.random.default_rng(0)
    for cls in ("forest", "river"):
        d = root / "data" / cls
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                         dtype=np.uint8)).save(
                d / f"{cls}{i}.png")
    return root


def _args(root):
    return types.SimpleNamespace(
        scale_factor=2, crop_size=16, test_crop_size=16, lr=1e-3,
        b1=0.9, b2=0.999, num_epochs=1, batch_size=2, log_freq=2,
        save_dir=str(root / "Result"))


def test_trainer_train_validate(msi_env):
    from fastdiffsr_tpu.msi.swinir import SwinIR
    from fastdiffsr_tpu.msi.trainer import SupervisedSRTrainer

    model = SwinIR(upscale=2, embed_dim=12, depths=(1,), num_heads=(2,),
                   window_size=4, mlp_ratio=2.0, drop_path_rate=0.0,
                   num_feat=12)
    tr = SupervisedSRTrainer(model, _args(msi_env))
    tr.train([str(msi_env / "data")], num_epochs=1, batch_size=2,
             max_steps=3)
    assert int(tr.state.step) == 3

    res = tr.validate([str(msi_env / "data")], max_images=2,
                      save_images=True)
    assert "psnr" in res and np.isfinite(res["psnr"])
    assert os.path.isdir(os.path.join(tr.save_dir, "validate"))

    report = tr.validate_by_class([str(msi_env / "data")],
                                  save_plots=True)
    assert set(report) == {"forest", "river", "__overall__"}
    assert np.isfinite(report["__overall__"]["psnr"])
    # plot suite outputs (mfe_plot_test_result2 / by-class variants)
    tp = os.path.join(tr.save_dir, "testplot")
    assert os.path.isfile(os.path.join(tp, "by_class_psnr.png"))
    assert any(f.startswith("Test_result_")
               for f in os.listdir(os.path.join(tp, "forest")))
    # loss curve from train() (utils.plot_loss)
    assert any(f.startswith("Loss_values_epoch_")
               for f in os.listdir(tr.save_dir))

    res = tr.validate([str(msi_env / "data")], max_images=1,
                      save_images=False, save_plots=True)
    assert any(f.startswith("Test_result_")
               for f in os.listdir(tp))

    # reference Logger parity: loss_log.txt row every log_freq steps,
    # val_log.txt row per validation (utils/logger.py:113-143)
    logs = os.path.join(tr.save_dir, "logs")
    loss_log = open(os.path.join(logs, "loss_log.txt")).read()
    assert "Training Losses" in loss_log
    assert "loss_G:" in loss_log and "iter:" in loss_log
    val_log = open(os.path.join(logs, "val_log.txt")).read()
    assert "Validation Results" in val_log
    assert "psnr:" in val_log and "dataset: SwinIR" in val_log


def test_trainer_single_image(msi_env):
    from fastdiffsr_tpu.msi.swinir import SwinIR
    from fastdiffsr_tpu.msi.trainer import SupervisedSRTrainer

    model = SwinIR(upscale=2, embed_dim=12, depths=(1,), num_heads=(2,),
                   window_size=4, mlp_ratio=2.0, drop_path_rate=0.0,
                   num_feat=12)
    tr = SupervisedSRTrainer(model, _args(msi_env))
    src = str(msi_env / "data" / "forest" / "forest0.png")
    out = str(msi_env / "single_sr.png")
    tr.test_single(src, out)
    from PIL import Image
    with Image.open(out) as im:
        assert im.size == (64, 64)  # 32 * scale 2
