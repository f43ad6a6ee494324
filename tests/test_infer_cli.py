"""End-to-end test of the infer CLI (reference infer.py:17-119 equivalent):
tiny synthesized UCM-style val tree -> SR pngs + mean-latency log line.
Runs at a reduced resolution — the UNet is fully convolutional, which is
exactly the property the reference's 128->512 inference relies on."""

import json
import re

import numpy as np
import pytest


@pytest.fixture()
def infer_env(tmp_path):
    from PIL import Image

    from tests.conftest import REPO_ROOT
    cfg_path = (REPO_ROOT / "fastdiffsr_tpu" / "configs"
                / "sr_fastdiffsr_infer_x4.json")
    base = json.loads("".join(
        ln for ln in open(cfg_path)
        if not ln.strip().startswith("//")))

    # UCM-style tree at 8->32 (x4): lr_{l}, hr_{r}, sr_{l}_{r}
    droot = tmp_path / "ucm"
    rng = np.random.default_rng(0)
    for sub, size in [("lr_8", 8), ("hr_32", 32), ("sr_8_32", 32)]:
        d = droot / sub
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (size, size, 3),
                                         dtype=np.uint8)).save(
                d / f"{i:04d}.png")

    base["name"] = "infer_unit"
    for ph in ("train", "val"):
        base["datasets"][ph]["dataroot"] = str(droot)
        base["datasets"][ph]["l_resolution"] = 8
        base["datasets"][ph]["r_resolution"] = 32
    base["datasets"]["val"]["data_len"] = 3
    base["model"]["unet"].update({"inner_channel": 8, "norm_groups": 4,
                                  "channel_multiplier": [1, 2],
                                  "res_blocks": 1, "dropout": 0.0})
    base["model"]["beta_schedule"]["val"]["n_timestep"] = 4
    base["path"] = {k: str(tmp_path / "exp" / k)
                    for k in ("log", "tb_logger", "results", "checkpoint")}
    base["path"]["resume_state"] = None
    cfg = tmp_path / "infer.json"
    cfg.write_text(json.dumps(base))
    return tmp_path, cfg


def test_infer_cli_end_to_end(infer_env):
    tmp_path, cfg = infer_env
    from fastdiffsr_tpu.cli.infer import main

    main(["-c", str(cfg)])

    results = sorted((tmp_path / "exp" / "results").glob("*_sr.png"))
    assert len(results) == 3
    from PIL import Image
    img = np.asarray(Image.open(results[0]))
    assert img.shape == (32, 32, 3)

    log = (tmp_path / "exp" / "log" / "infer.log").read_text()
    assert re.search(r"mean latency: [\d.]+s over 2 images", log)


def test_infer_cli_dpm_sampler_override(infer_env):
    """model.diffusion.sampler: 'dpm' flows through the infer CLI too."""
    import json as _json

    tmp_path, cfg = infer_env
    base = _json.loads(cfg.read_text())
    base["model"]["diffusion"]["sampler"] = "dpm"
    base["model"]["diffusion"]["ddim_steps"] = 3
    base["path"]["results"] = str(tmp_path / "exp" / "results_dpm")
    cfg2 = tmp_path / "infer_dpm.json"
    cfg2.write_text(_json.dumps(base))

    from fastdiffsr_tpu.cli.infer import main
    main(["-c", str(cfg2)])
    results = sorted((tmp_path / "exp" / "results_dpm").glob("*_sr.png"))
    assert len(results) == 3
