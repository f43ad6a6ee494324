"""Offline FID scorer — the ``FID.py`` equivalent (reference FID.py:5-21).

The reference shells out to pytorch_fid (InceptionV3 features). Neither
pytorch_fid nor torchvision weights are available in this environment, so
this computes FID from Inception-free features only when a feature extractor
is importable; otherwise it exits with a clear message. The statistical part
(Frechet distance between Gaussians) is implemented here and unit-tested.
"""

from __future__ import annotations

import argparse

import numpy as np


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """FID = |mu1-mu2|^2 + Tr(S1 + S2 - 2 (S1 S2)^{1/2})."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1 @ sigma2)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def activation_statistics(feats: np.ndarray):
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def calc_fid(dir_fake: str, dir_real: str) -> float:
    try:
        from ..lpips_jax import alexnet_features  # reuse conv features
    except Exception as e:
        raise SystemExit(
            f"FID feature extractor unavailable in this environment: {e}")
    import glob
    import os

    from PIL import Image

    def feats_of(d):
        fs = sorted(glob.glob(os.path.join(d, "*")))
        out = []
        for f in fs:
            with Image.open(f) as im:
                arr = np.asarray(im.convert("RGB"), np.float32) / 255.0
            out.append(alexnet_features(arr))
        return np.stack(out)

    mu1, s1 = activation_statistics(feats_of(dir_fake))
    mu2, s2 = activation_statistics(feats_of(dir_real))
    return frechet_distance(mu1, s1, mu2, s2)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("fake_dir")
    p.add_argument("real_dir")
    args = p.parse_args(argv)
    print("FID:", calc_fid(args.fake_dir, args.real_dir))


if __name__ == "__main__":
    main()
