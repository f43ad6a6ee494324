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
    parser.add_argument("-use_ema", action="store_true",
                        help="restore EMA shadow params instead of raw "
                             "params (default off for reference parity)")
    args = parser.parse_args(argv)

    from ..config import parse
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
        params = load_params_only(opt["path"]["resume_state"],
                                  use_ema=args.use_ema)
        logger.info(f"loaded {'EMA ' if args.use_ema else ''}params from "
                    f"{opt['path']['resume_state']}")

    val_set = create_dataset(opt["datasets"]["val"], "val")
    val_loader = create_dataloader(val_set, opt["datasets"]["val"], "val")
    # DP-shard the sampler over all devices dividing the batch (the
    # north-star multi-chip path); per-image keys keep outputs identical
    # to the single-device sampler
    from ..parallel import auto_mesh
    mesh = auto_mesh(getattr(val_loader, "batch_size", 1))
    if mesh is not None:
        logger.info(f"infer sampler: DP mesh over {mesh.devices.size} "
                    f"devices")
    # same optional sampler override as the val CLI: model.diffusion
    # {sampler: ancestral|ddim|dpm, ddim_steps, ddim_eta}
    diff_opt = (opt.get("model") or {}).get("diffusion") or {}
    sample_fn = make_sample_fn(
        eng_val, apply_fn, mesh=mesh,
        sampler=diff_opt.get("sampler") or "ancestral",
        ddim_steps=diff_opt.get("ddim_steps"),
        ddim_eta=float(diff_opt.get("ddim_eta") or 0.0))

    result_path = opt["path"]["results"]
    os.makedirs(result_path, exist_ok=True)
    rng = jax.random.PRNGKey(0)
    times = []
    n = 0
    full_b = getattr(val_loader, "batch_size", 1)
    first_batch = True
    from ..train import pad_batch_with_keys
    for batch in val_loader:
        b = np.asarray(batch["SR"]).shape[0]
        cond, keys = pad_batch_with_keys(batch["SR"], full_b, rng, n)
        t0 = time.time()
        sr = sample_fn(params, cond, keys)
        sr = np.asarray(jax.block_until_ready(sr))
        dt = time.time() - t0
        # steady-state per-image time: padded tail lanes still compute,
        # so divide by the lane count, not the true image count
        dt_img = dt / full_b
        # first batch includes JIT compile — excluded from stats, labeled
        # in the per-image log so it isn't read as steady-state
        dt_note = " incl. compile" if first_batch else ""
        if not first_batch:  # skip compile in latency stats
            times.extend([dt_img] * b)
        first_batch = False
        for j in range(b):
            M.save_img(M.tensor2img(sr[j]),
                       os.path.join(result_path, f"{n}_sr.png"))
            logger.info(f"image {n}: {dt_img:.3f}s{dt_note}")
            n += 1
    if times:
        logger.info(f"mean latency: {np.mean(times):.4f}s over "
                    f"{len(times)} images")


if __name__ == "__main__":
    main()
