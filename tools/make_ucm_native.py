"""Build the native-resolution UCM demo corpus (reproducible).

The reference fixture's hr_512 tiles are themselves bicubic upscales, so
no SR model can beat bicubic on them (BASELINE.md). This script instead
treats the NATIVE 128x128 UCM tiles
(/root/reference/FastDiffSR/dataset/UCM_128_512/lr_128, real
high-frequency content) as HR: each 128-tile is quadrant-cut into four
64x64 HR tiles; LQ is a PIL-bicubic 4x downscale (16x16). Split: all
four quadrants of the held-out scene (default tenniscourt15) are val,
the other six scenes (24 tiles) are train — matching the FastDiffSR
quality demo recorded in BASELINE.md.

Output layout (EDiffSR LQGT mode and data/prepare.py compatible):
    <out>/train/hr_64/*.png   <out>/train/lr_16/*.png
    <out>/val/hr_64/*.png     <out>/val/lr_16/*.png

Usage: python tools/make_ucm_native.py [--src DIR] [--out dataset/ucm_native]
"""

import argparse
import os


def main():
    from PIL import Image

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/reference/FastDiffSR/dataset/"
                    "UCM_128_512/lr_128")
    ap.add_argument("--out", default="dataset/ucm_native")
    ap.add_argument("--holdout", default="tenniscourt15")
    ap.add_argument("--scale", type=int, default=4)
    args = ap.parse_args()

    names = sorted(f for f in os.listdir(args.src)
                   if f.lower().endswith((".tif", ".png", ".jpg")))
    assert names, f"no images under {args.src}"
    n_train = n_val = 0
    for name in names:
        stem = os.path.splitext(name)[0]
        split = "val" if stem == args.holdout else "train"
        img = Image.open(os.path.join(args.src, name)).convert("RGB")
        w, h = img.size
        qw, qh = w // 2, h // 2
        for qi, (x, y) in enumerate([(0, 0), (qw, 0), (0, qh), (qw, qh)]):
            hr = img.crop((x, y, x + qw, y + qh))
            lr = hr.resize((qw // args.scale, qh // args.scale),
                           Image.BICUBIC)
            for sub, im in [(f"hr_{qh}", hr), (f"lr_{qh // args.scale}", lr)]:
                d = os.path.join(args.out, split, sub)
                os.makedirs(d, exist_ok=True)
                im.save(os.path.join(d, f"{stem}_q{qi}.png"))
            if split == "val":
                n_val += 1
            else:
                n_train += 1
    print(f"wrote {n_train} train / {n_val} val tiles under {args.out}")


if __name__ == "__main__":
    main()
