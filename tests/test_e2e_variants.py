"""Tiny end-to-end train smoke for the ddpm (SR3 UNet) and gdp (guided
UNet) variants through the same CLI — catches wiring bugs between config,
engine spec, and denoiser families."""

import json
import logging

import numpy as np
import pytest


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    from PIL import Image
    from fastdiffsr_tpu.data.prepare import prepare

    root = tmp_path_factory.mktemp("variants")
    src = root / "src"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                     dtype=np.uint8)).save(src / f"{i}.png")
    data = root / "Train_8_16"
    prepare(str(src), str(data), n_worker=1, sizes=(8, 16), verbose=False)
    return root, data


def _cfg(variant, data, unet):
    return {
        "name": f"e2e_{variant}", "phase": "train", "gpu_ids": [0],
        "path": {"log": "logs", "tb_logger": "tb", "results": "results",
                 "checkpoint": "checkpoint", "resume_state": None},
        "datasets": {
            "train": {"name": "Train", "mode": "LRHR",
                      "dataroot": str(data), "datatype": "img",
                      "l_resolution": 8, "r_resolution": 16,
                      "batch_size": 2, "num_workers": 0,
                      "use_shuffle": True, "data_len": -1,
                      "img_mask": "no"},
            "val": {"name": "Val", "mode": "LRHR", "dataroot": str(data),
                    "datatype": "img", "l_resolution": 8,
                    "r_resolution": 16, "data_len": 1, "img_mask": "no"},
        },
        "model": {
            "which_model_G": variant, "finetune_norm": False,
            "unet": unet,
            "beta_schedule": {
                "train": {"schedule": "linear", "n_timestep": 8,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "linear", "n_timestep": 8,
                        "linear_start": 1e-6, "linear_end": 1e-2}},
            "diffusion": {"image_size": 16, "channels": 3,
                          "conditional": True},
        },
        "train": {"n_iter": 2, "val_freq": 1000, "print_freq": 1,
                  "save_checkpoint_freq": 2,
                  "optimizer": {"type": "adam", "lr": 1e-3}},
    }


def _clear_loggers():
    for name in ("base", "val"):
        lg = logging.getLogger(name)
        for h in list(lg.handlers):
            lg.removeHandler(h)


@pytest.mark.parametrize("variant,unet", [
    ("ddpm", {"in_channel": 6, "out_channel": 3, "inner_channel": 8,
              "norm_groups": 4, "channel_multiplier": [1, 2],
              "attn_res": [8], "res_blocks": 1, "dropout": 0.0}),
    # guided UNet hardcodes 32-group GroupNorm (reference gdp unet.py:117)
    # so width must be >= 32
    ("gdp", {"in_channel": 6, "out_channel": 3, "model_channels": 32,
             "channel_multiplier": [1, 2], "res_blocks": 1,
             "dropout": 0.0, "inner_channel": 8, "norm_groups": 4,
             "attn_res": [8]}),
])
def test_variant_trains(data_root, monkeypatch, variant, unet):
    root, data = data_root
    monkeypatch.chdir(root)
    cfg_path = root / f"cfg_{variant}.json"
    cfg_path.write_text(json.dumps(_cfg(variant, data, unet)))

    from fastdiffsr_tpu.cli.sr_mfe import main
    _clear_loggers()
    main(["-p", "train", "-c", str(cfg_path)])
    exps = sorted((root / "experiments").iterdir())
    latest = [e for e in exps if variant in e.name][-1]
    assert any(p.name.startswith("I2_E")
               for p in (latest / "checkpoint").iterdir())
