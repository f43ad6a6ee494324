"""Real-world batch inference CLI — the ``infer.py`` equivalent
(reference infer.py:17-119): val-only driver over e.g. UCM 128->512 tiles;
saves SR pngs and prints mean latency. The UNet is fully convolutional, so
any l->r pair works (reference §3.3 note: image_size is never enforced at
sample time).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("-p", "--phase", type=str, choices=["val"],
                        default="val")
    parser.add_argument("-debug", action="store_true")
    parser.add_argument("-enable_wandb", action="store_true")
    parser.add_argument("-log_infer", action="store_true")
    args = parser.parse_args(argv)

    from ..config import parse, infer_scale
    from ..utils.logging import setup_logger

    opt = parse(args.config, "val", debug=args.debug)
    logger = setup_logger("base", opt["path"]["log"], "infer", screen=True)

    import jax

    from ..data import create_dataset, create_dataloader
    from ..train import make_sample_fn
    from ..train.checkpoint import load_params_only
    from .. import metrics as M
    from .sr_mfe import build_all

    _, eng_val, net, apply_fn, params = build_all(opt, "val")
    if opt["path"]["resume_state"]:
        params = load_params_only(opt["path"]["resume_state"])
        logger.info(f"loaded params from {opt['path']['resume_state']}")

    val_set = create_dataset(opt["datasets"]["val"], "val")
    val_loader = create_dataloader(val_set, opt["datasets"]["val"], "val")
    sample_fn = make_sample_fn(eng_val, apply_fn)

    result_path = opt["path"]["results"]
    os.makedirs(result_path, exist_ok=True)
    rng = jax.random.PRNGKey(0)
    times = []
    for idx, batch in enumerate(val_loader):
        t0 = time.time()
        sr = sample_fn(params, batch["SR"], jax.random.fold_in(rng, idx))
        sr = np.asarray(jax.block_until_ready(sr))
        dt = time.time() - t0
        if idx > 0:  # skip compile in latency stats (reference warms too)
            times.append(dt)
        M.save_img(M.tensor2img(sr[0]),
                   os.path.join(result_path, f"{idx}_sr.png"))
        logger.info(f"image {idx}: {dt:.3f}s")
    if times:
        logger.info(f"mean latency: {np.mean(times):.4f}s over "
                    f"{len(times)} images")


if __name__ == "__main__":
    main()
