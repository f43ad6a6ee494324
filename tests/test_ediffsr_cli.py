"""EDiffSR CLI smoke: tiny LQGT data -> few train iters (matching loss
decreases path runs) -> test path restores with reverse SDE."""

import json
import logging

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def ediffsr_env(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("ediffsr")
    rng = np.random.default_rng(0)
    for sub, size in [("hr_16", 16), ("lr_8", 8)]:
        d = root / "data" / sub
        d.mkdir(parents=True)
        for i in range(4):
            Image.fromarray(rng.integers(0, 255, (size, size, 3),
                                         dtype=np.uint8)).save(
                d / f"{i}.png")

    opt = {
        "name": "ediffsr_unit", "use_tb_logger": False,
        "model": "denoising", "distortion": "sr", "gpu_ids": [0],
        "sde": {"max_sigma": 50, "T": 4, "schedule": "cosine",
                "eps": 0.005},
        "degradation": {"sigma": 25, "noise_type": "G", "scale": 2},
        "datasets": {
            "train": {"name": "T", "mode": "LQGT",
                      "dataroot_GT": str(root / "data" / "hr_16"),
                      "dataroot_LQ": str(root / "data" / "lr_8"),
                      "use_shuffle": True, "batch_size": 2,
                      "GT_size": 16, "LR_size": 8},
            "val": {"name": "V", "mode": "LQGT",
                    "dataroot_GT": str(root / "data" / "hr_16"),
                    "dataroot_LQ": str(root / "data" / "lr_8"),
                    "data_len": 2},
        },
        "network_G": {"which_model_G": "ConditionalNAFNet",
                      "setting": {"width": 16, "enc_blk_nums": [1, 1],
                                  "middle_blk_num": 1,
                                  "dec_blk_nums": [1, 1]}},
        "path": {"pretrain_model_G": None, "strict_load": True,
                 "resume_state": None},
        "train": {"optimizer": "AdamW", "lr_G": 1e-3,
                  "lr_scheme": "TrueCosineAnnealingLR", "beta1": 0.9,
                  "beta2": 0.99, "niter": 4, "eta_min": 1e-7,
                  "loss_type": "l1", "weight": 1.0, "manual_seed": 0,
                  "val_freq": 2, "warmup_iter": 2},
        "logger": {"print_freq": 2, "save_checkpoint_freq": 4},
    }
    cfg = root / "opt.yml"
    cfg.write_text(yaml.safe_dump(opt, sort_keys=False))
    return root, cfg


def _clear_logger(name):
    lg = logging.getLogger(name)
    for h in list(lg.handlers):
        lg.removeHandler(h)


def test_ediffsr_train_smoke(ediffsr_env, monkeypatch):
    root, cfg = ediffsr_env
    monkeypatch.chdir(root)
    _clear_logger("ediffsr")

    from fastdiffsr_tpu.ediffsr.train import main
    main(["-opt", str(cfg), "--max_iters", "4", "--val_images", "1"])

    exp = root / "experiments" / "ediffsr_unit"
    models = list((exp / "models").iterdir())
    assert any(p.name.startswith("I4_") for p in models), models
    log = (exp / "train.log").read_text()
    assert "loss" in log
    # in-train validation + best-PSNR tracking (reference train.py:270-316)
    assert "# Validation # PSNR:" in log and "Best PSNR:" in log
    assert (exp / "models" / "best.txt").exists()
    assert (exp / "val.log").read_text().count("psnr") >= 2
    # val images are saved per validation pass
    assert (exp / "val_images" / "2" / "000.png").exists()


def test_ediffsr_fresh_train_archives_existing_dir(ediffsr_env,
                                                   monkeypatch,
                                                   tmp_path):
    """Fresh (non-resume) training renames a pre-existing experiments
    dir to *_archived_<ts> instead of mixing runs (reference
    train.py:96-100 / file_utils.mkdir_and_rename:56-63); resume keeps
    the dir in place."""
    root, cfg = ediffsr_env
    monkeypatch.chdir(tmp_path)
    from fastdiffsr_tpu.ediffsr.options import parse_options

    exp = tmp_path / "experiments" / "ediffsr_unit"
    parse_options(str(cfg), is_train=True, root=str(tmp_path))
    (exp / "train.log").write_text("old run")
    parse_options(str(cfg), is_train=True, root=str(tmp_path))
    archived = [p for p in exp.parent.iterdir()
                if p.name.startswith("ediffsr_unit_archived_")]
    assert archived and (archived[0] / "train.log").exists()
    assert not (exp / "train.log").exists()

    # resume_state set -> no archiving
    opt = yaml.safe_load(cfg.read_text())
    opt["path"]["resume_state"] = "whatever"
    cfg_resume = tmp_path / "opt_resume.yml"
    cfg_resume.write_text(yaml.safe_dump(opt, sort_keys=False))
    (exp / "train.log").write_text("run to keep")
    parse_options(str(cfg_resume), is_train=True, root=str(tmp_path))
    assert (exp / "train.log").read_text() == "run to keep"


def test_ediffsr_test_smoke(ediffsr_env, monkeypatch):
    root, cfg = ediffsr_env
    monkeypatch.chdir(root)
    _clear_logger("ediffsr")

    # point the test config at the trained checkpoint
    opt = yaml.safe_load(cfg.read_text())
    models = list((root / "experiments" / "ediffsr_unit" /
                   "models").iterdir())
    opt["path"]["pretrain_model_G"] = str(
        [p for p in models if p.name.startswith("I4_")][0])
    opt["datasets"] = {"test": dict(opt["datasets"]["val"],
                                    name="Test", data_len=2)}
    cfg_test = root / "opt_test.yml"
    cfg_test.write_text(yaml.safe_dump(opt, sort_keys=False))

    from fastdiffsr_tpu.ediffsr.train import main
    main(["-opt", str(cfg_test), "--test"])
    log = (root / "results" / "ediffsr_unit" / "test.log").read_text()
    assert "mean psnr" in log
