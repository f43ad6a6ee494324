"""Avg-8 (posterior-mean) val of the x8 lever checkpoints (VERDICT r3 #5).

Runs the real val CLI with ``model.diffusion.n_samples: 8`` (the r3
estimator that first crossed bicubic PSNR) on each lever run's final
checkpoint, one process, and prints the PSNR/SSIM table plus the bicubic
baseline on the same 4 held-out tiles.

Usage: python tools/x8_avg8_val.py s8h midh [s8]
"""

import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def main():
    import numpy as np
    from PIL import Image

    from fastdiffsr_tpu import metrics as M

    tags = sys.argv[1:] or ["s8h", "midh"]

    # bicubic baseline on the holdout quadrants (identical across lever
    # corpora: val is always the 4 clean quadrants) — from the first tag
    # whose prepared val dir exists, so one missing corpus doesn't abort
    # the whole table
    b_psnr = b_ssim = n = 0.0
    for tag in tags:
        val_dir = f"dataset/ucm_native_{tag}/val_prep_8_64"
        for hr_path in sorted(glob.glob(
                os.path.join(val_dir, "hr_64", "*.png"))):
            name = os.path.basename(hr_path)
            sr_path = os.path.join(val_dir, "sr_8_64", name)
            hr = np.asarray(Image.open(hr_path))
            bic = np.asarray(Image.open(sr_path))
            b_psnr += M.calculate_psnr(bic, hr)
            b_ssim += M.calculate_ssim(bic, hr)
            n += 1
        if n:
            break
        print(f"# no prepared val dir for {tag} "
              f"({val_dir}), trying next tag", flush=True)
    if n:
        print(f"bicubic x8 baseline ({int(n)} tiles): "
              f"psnr {b_psnr / n:.3f} ssim {b_ssim / n:.4f}", flush=True)
    else:
        print("# no prepared val dir for any tag — bicubic baseline "
              "skipped", flush=True)

    from fastdiffsr_tpu.cli.sr_mfe import main as cli_main

    rows = []
    for tag in tags:
        cfgp = f"fastdiffsr_tpu/configs/demo_ucm_native_8_64_{tag}.json"
        # the CLI's own line-wise comment stripper: a blanket //-regex
        # would truncate string values containing '//' (URLs etc.)
        from fastdiffsr_tpu.config import load_json_config
        base = json.loads(json.dumps(load_json_config(cfgp)))
        ckpts = sorted(glob.glob(
            f"experiments/demo_ucm_native_8_64_{tag}_*/checkpoint/I*_E*"),
            key=lambda p: int(os.path.basename(p).split("_")[0][1:]))
        if not ckpts:
            print(f"# no checkpoint for {tag}, skipping", flush=True)
            continue
        ckpt = ckpts[-1].rsplit(".", 1)[0] if "." in os.path.basename(
            ckpts[-1]) else ckpts[-1]
        base["phase"] = "val"
        base["name"] = f"x8avg8_{tag}"
        base["path"]["resume_state"] = ckpt
        base["model"]["diffusion"]["n_samples"] = 8
        with tempfile.NamedTemporaryFile("w", suffix=".json",
                                         delete=False) as f:
            json.dump(base, f)
            path = f.name
        print(f"=== {tag} avg-8 ({ckpt}) ===", flush=True)
        res = cli_main(["-p", "val", "-c", path])
        os.unlink(path)
        rows.append((tag, res))

    print("\n| corpus | PSNR (avg-8) | SSIM (avg-8) |")
    print("|---|---|---|")
    for tag, r in rows:
        print(f"| {tag} | {r['psnr']:.3f} | {r['ssim']:.4f} |")


if __name__ == "__main__":
    main()
