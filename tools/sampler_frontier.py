"""Sampler speed/quality frontier on a trained checkpoint (VERDICT r3 #2).

Runs the REAL val CLI path (cli/sr_mfe.py run_validation via cli_main)
once per (sampler, steps) cell — ancestral T=20, DDIM/DPM-Solver++(2M) at
20/10/5 steps — against one trained checkpoint, all cells sequentially in
ONE process so the numbers share a tunnel session. Prints a markdown
table of PSNR/SSIM per cell for BASELINE.md.

Usage:
  python tools/sampler_frontier.py --config fastdiffsr_tpu/configs/\
demo_ucm_native_16_64.json --ckpt experiments/<run>/checkpoint/I40000_E40000
"""

import argparse
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, "/root/repo")

CELLS = [
    ("ancestral", None),
    ("ddim", 20), ("ddim", 10), ("ddim", 5),
    ("dpm", 20), ("dpm", 10), ("dpm", 5),
]


def strip_comments(text: str) -> str:
    return re.sub(r"//.*", "", text)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True,
                    help="base demo/train config (val dataset block used)")
    ap.add_argument("--ckpt", required=True,
                    help="checkpoint prefix (…/I{iter}_E{epoch})")
    ap.add_argument("--cells", default="",
                    help="comma list like ancestral,ddim-10 (default all)")
    ap.add_argument("--n_samples", type=int, default=1)
    args = ap.parse_args()

    cells = CELLS
    if args.cells:
        cells = []
        for tok in args.cells.split(","):
            if "-" in tok:
                s, n = tok.split("-")
                cells.append((s, int(n)))
            else:
                cells.append((tok, None))

    base = json.loads(strip_comments(open(args.config).read()))
    base["phase"] = "val"
    base["path"]["resume_state"] = args.ckpt
    base["datasets"]["val"].setdefault("batch_size", 4)

    from fastdiffsr_tpu.cli.sr_mfe import main as cli_main

    rows = []
    for sampler, steps in cells:
        cfg = json.loads(json.dumps(base))
        cfg["name"] = f"frontier_{sampler}{steps or ''}"
        d = cfg["model"]["diffusion"]
        d["sampler"] = sampler
        if steps is not None:
            d["ddim_steps"] = steps
        if args.n_samples > 1:
            d["n_samples"] = args.n_samples
        with tempfile.NamedTemporaryFile(
                "w", suffix=".json", delete=False) as f:
            json.dump(cfg, f)
            path = f.name
        print(f"=== {sampler} steps={steps or 20} ===", flush=True)
        res = cli_main(["-p", "val", "-c", path])
        os.unlink(path)
        rows.append((sampler, steps or 20, res))

    print("\n| sampler | steps | PSNR | SSIM | s/img (steady) |")
    print("|---|---|---|---|---|")
    for sampler, steps, r in rows:
        t = r.get("avg_time") or r.get("avg_time_incl_compile")
        print(f"| {sampler} | {steps} | {r['psnr']:.3f} | {r['ssim']:.4f} "
              f"| {t if t is None else round(t, 3)} |")


if __name__ == "__main__":
    main()
