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

Corpus multiplication (VERDICT r2 #5): ``--stride S`` cuts overlapping
tile-size crops at stride S instead of the 4 disjoint quadrants, and
``--aug`` additionally writes all 8 dihedral (flip/rot) variants of each
TRAIN crop — the augmentations the reference applies at load time
(data/util.py:27-42 ``augment``) applied once at prepare time so the
device-resident cache sees the multiplied corpus. The VAL split is always
the 4 clean quadrants of the holdout scene, never strided or augmented,
so val PSNR stays comparable across corpus sizes.

Usage: python tools/make_ucm_native.py [--src DIR] [--out dataset/ucm_native]
                                       [--stride S] [--aug]
"""

import argparse
import os

# PIL Image.transpose codes for the 8-element dihedral group (identity last
# seven): values mirror PIL.Image.Transpose but are inlined so the module
# imports without PIL.
_DIHEDRAL = [None, 0, 1, 2, 3, 4, 5, 6]  # None=identity; PIL transpose ids


def main():
    from PIL import Image

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/reference/FastDiffSR/dataset/"
                    "UCM_128_512/lr_128")
    ap.add_argument("--out", default="dataset/ucm_native")
    ap.add_argument("--holdout", default="tenniscourt15")
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--stride", type=int, default=0,
                    help="train-crop stride in px (0 = disjoint quadrants)")
    ap.add_argument("--aug", action="store_true",
                    help="write all 8 dihedral variants of each train crop")
    ap.add_argument("--hflip", action="store_true",
                    help="write only the horizontal mirror alongside each "
                         "train crop (the reference's actual load-time "
                         "augment; orientation-preserving — r3 falsified "
                         "the FULL dihedral group, not this)")
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
        if split == "train" and args.stride:
            crops = [(x, y) for y in range(0, h - qh + 1, args.stride)
                     for x in range(0, w - qw + 1, args.stride)]
        else:
            crops = [(0, 0), (qw, 0), (0, qh), (qw, qh)]
        if split != "train":
            variants = [None]
        elif args.aug:
            variants = _DIHEDRAL
        elif args.hflip:
            variants = [None, 0]   # identity + FLIP_LEFT_RIGHT
        else:
            variants = [None]
        for qi, (x, y) in enumerate(crops):
            base = img.crop((x, y, x + qw, y + qh))
            for vi, t in enumerate(variants):
                hr = base if t is None else base.transpose(t)
                lr = hr.resize((qw // args.scale, qh // args.scale),
                               Image.BICUBIC)
                tag = f"{stem}_q{qi}" + (f"_a{vi}" if len(variants) > 1
                                         else "")
                for sub, im in [(f"hr_{qh}", hr),
                                (f"lr_{qh // args.scale}", lr)]:
                    d = os.path.join(args.out, split, sub)
                    os.makedirs(d, exist_ok=True)
                    im.save(os.path.join(d, f"{tag}.png"))
                if split == "val":
                    n_val += 1
                else:
                    n_train += 1
    print(f"wrote {n_train} train / {n_val} val tiles under {args.out}")


if __name__ == "__main__":
    main()
