"""Smoke the unified MSI baselines CLI (reference main_<model>.py
equivalents): train a few steps then single-image inference, per model."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def msi_data(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("msi_cli")
    rng = np.random.default_rng(0)
    train = root / "train"
    train.mkdir()
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                     dtype=np.uint8)).save(
            train / f"img_{i}.png")
    single = root / "single.png"
    Image.fromarray(rng.integers(0, 255, (16, 16, 3),
                                 dtype=np.uint8)).save(single)
    return root, train, single


@pytest.mark.parametrize("model", ["NDSRGAN", "HSENet", "SwinIR"])
def test_msi_main_cli_train_and_single(msi_data, model, tmp_path):
    from fastdiffsr_tpu.msi.main import main

    root, train, single = msi_data
    save = tmp_path / "out"
    main(["--model_name", model, "--tiny", "--mode", "train",
          "--data_dir", str(train), "--test_data_dir", str(root / "none"),
          "--crop_size", "16", "--scale_factor", "2",
          "--num_epochs", "1", "--batch_size", "2", "--max_steps", "2",
          "--save_dir", str(save)])

    out_png = tmp_path / "sr.png"
    import glob
    ckpts = glob.glob(str(save / model / "*"))
    assert ckpts, "trainer saved nothing"
    main(["--model_name", model, "--tiny", "--mode", "test_single",
          "--input", str(single), "--output", str(out_png),
          "--scale_factor", "2", "--save_dir", str(save),
          "--crop_size", "16"])
    from PIL import Image
    img = np.asarray(Image.open(out_png))
    assert img.shape == (32, 32, 3)
