"""MSI baselines CLI — the ``main_<model>.py`` equivalent (reference
main_swinir.py:7-106 and identical siblings): one entry point for all five
baselines.

Usage:
    python -m fastdiffsr_tpu.msi.main --model_name SwinIR \
        --data_dir dataset/Train --test_data_dir dataset/Test \
        --scale_factor 4 --crop_size 256 --num_epochs 50
"""

from __future__ import annotations

import argparse
import os


def build_model(name: str, args):
    name = name.lower()
    tiny = getattr(args, "tiny", False)
    if name == "swinir":
        from .swinir import SwinIR
        if tiny:
            return SwinIR(upscale=args.scale_factor, in_chans=3,
                          embed_dim=24, depths=(2, 2), num_heads=(3, 3),
                          window_size=4, mlp_ratio=2.0)
        return SwinIR(upscale=args.scale_factor, in_chans=3,
                      embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
                      window_size=8, mlp_ratio=2.0)
    if name == "ndsrgan":
        from .ndsrgan import DRRDBNet
        if tiny:
            return DRRDBNet(scale=args.scale_factor, nf=8, nc=4, n_blocks=2)
        return DRRDBNet(scale=args.scale_factor)
    if name == "hsenet":
        from .hsenet import HSENet
        if tiny:
            return HSENet(scale=args.scale_factor, n_feats=8,
                          n_basic_modules=1)
        return HSENet(scale=args.scale_factor)
    if name == "transenet":
        from .transenet import TransENet
        if tiny:
            return TransENet(scale=args.scale_factor, n_feats=8,
                             en_depth=1, de_depth=1)
        return TransENet(scale=args.scale_factor)
    if name == "hat":
        from .hat import HAT
        if tiny:
            return HAT(upscale=args.scale_factor, embed_dim=24,
                       depths=(2, 2), num_heads=(2, 2), window_size=4,
                       squeeze_factor=4, mlp_ratio=2.0)
        return HAT(upscale=args.scale_factor)
    raise ValueError(f"unknown model {name}")


def parse_args(argv=None):
    p = argparse.ArgumentParser("TPU SR baseline collection")
    p.add_argument("--model_name", type=str, default="SwinIR",
                   choices=["SwinIR", "HSENet", "TransENet", "NDSRGAN",
                            "HAT"])
    p.add_argument("--data_dir", type=str, default="dataset/Train")
    p.add_argument("--test_data_dir", type=str, default="dataset/Test")
    p.add_argument("--crop_size", type=int, default=256)
    p.add_argument("--test_crop_size", type=int, default=256)
    p.add_argument("--scale_factor", type=int, default=4)
    p.add_argument("--num_epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--b1", type=float, default=0.9)
    p.add_argument("--b2", type=float, default=0.999)
    p.add_argument("--save_dir", type=str, default="Result")
    p.add_argument("--log_freq", type=int, default=200,
                   help="steps between TB/loss_log.txt rows "
                        "(reference swinir.py:802)")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--eval_batch_size", type=int, default=8,
                   help="validate/validateByClass inference batch; the "
                        "jitted forward is DP-meshed over devices "
                        "dividing it (the reference evaluates per-image "
                        "at batch 1, swinir.py:1288+; outputs are "
                        "grouping-invariant)")
    p.add_argument("--tiny", action="store_true",
                   help="small model variants for smoke/debug runs "
                        "(the reference's -debug analogue)")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "validate", "validateByClass",
                            "test_single"])
    p.add_argument("--input", type=str, default=None,
                   help="image path for test_single")
    p.add_argument("--output", type=str, default="sr_out.png")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    args.save_dir = os.path.join(args.save_dir, args.model_name)

    from ..utils.logging import setup_logger
    logger = setup_logger("msi", args.save_dir, args.mode, screen=True)

    from .trainer import SupervisedSRTrainer
    model = build_model(args.model_name, args)
    trainer = SupervisedSRTrainer(model, args, logger)

    if args.resume:
        trainer.load(args.resume)

    if args.mode == "train":
        trainer.train([args.data_dir], val_dirs=[args.test_data_dir]
                      if os.path.isdir(args.test_data_dir) else None,
                      num_epochs=args.num_epochs,
                      batch_size=args.batch_size,
                      max_steps=args.max_steps)
    elif args.mode == "validate":
        trainer.validate([args.test_data_dir])
    elif args.mode == "validateByClass":
        trainer.validate_by_class([args.test_data_dir])
    elif args.mode == "test_single":
        assert args.input, "--input required"
        trainer.test_single(args.input, args.output)


if __name__ == "__main__":
    main()
