"""YAML options for the EDiffSR subsystem (reference
EDiffSR/codes/config/sisr/options.py:19-145): scale injection into the
network setting, experiments/results dir layout, NoneDict wrapping."""

from __future__ import annotations

import os

from ..config import NoneDict, dict_to_nonedict


def parse_options(path: str, is_train: bool = True,
                  root: str = ".") -> NoneDict:
    import yaml

    with open(path, "r") as f:
        opt = yaml.safe_load(f)

    opt["is_train"] = is_train
    scale = (opt.get("degradation") or {}).get("scale", 4)

    for phase, dataset in (opt.get("datasets") or {}).items():
        phase = phase.split("_")[0]
        dataset["phase"] = phase
        dataset["scale"] = scale
        # lmdb autodetect on the dataroot suffix (reference
        # options.py:44-55); read through lmdb_lite, no lmdb package
        is_lmdb = any(str(dataset.get(k) or "").endswith("lmdb")
                      for k in ("dataroot_GT", "dataroot_LQ"))
        dataset["data_type"] = "lmdb" if is_lmdb else "img"

    if opt.get("network_G") is not None:
        opt["network_G"].setdefault("setting", {})
        opt["network_G"]["setting"]["upscale"] = scale

    name = opt.get("name", "ediffsr")
    if is_train:
        experiments_root = os.path.join(root, "experiments", name)
        opt.setdefault("path", {})
        # fresh (non-resume) training archives a pre-existing experiment
        # dir instead of mixing runs (reference train.py:96-100 →
        # file_utils.mkdir_and_rename:56-63)
        if (not opt["path"].get("resume_state")
                and os.path.isdir(experiments_root)
                and os.listdir(experiments_root)):
            import time
            new_name = (experiments_root + "_archived_"
                        + time.strftime("%y%m%d-%H%M%S"))
            print(f"Path already exists. Rename it to [{new_name}]")
            os.rename(experiments_root, new_name)
        opt["path"]["experiments_root"] = experiments_root
        opt["path"]["models"] = os.path.join(experiments_root, "models")
        opt["path"]["training_state"] = os.path.join(experiments_root,
                                                     "training_state")
        opt["path"]["log"] = experiments_root
        opt["path"]["val_images"] = os.path.join(experiments_root,
                                                 "val_images")
        for k in ("experiments_root", "models", "training_state", "log",
                  "val_images"):
            os.makedirs(opt["path"][k], exist_ok=True)
    else:
        results_root = os.path.join(root, "results", name)
        opt.setdefault("path", {})
        opt["path"]["results_root"] = results_root
        opt["path"]["log"] = results_root
        os.makedirs(results_root, exist_ok=True)

    return dict_to_nonedict(opt)


def check_resume(opt) -> None:
    """Resume-path consistency (reference options.py:125-145): when
    ``path.resume_state`` is set, any explicit ``pretrain_model_G`` is
    ignored with a warning (our checkpoints bundle params+opt_state in one
    ``I{iter}_E{epoch}`` dir, so no path rewiring is needed — resume loads
    everything from resume_state)."""
    import logging

    if opt["path"]["resume_state"] and opt["path"].get("pretrain_model_G"):
        logging.getLogger("ediffsr").warning(
            "pretrain_model path will be ignored when resuming training.")
        opt["path"]["pretrain_model_G"] = None
