"""Offline FID scorer — the ``FID.py`` equivalent (reference FID.py:5-21).

The reference shells out to pytorch_fid (InceptionV3 pool3 features). The
feature network lives at models/inception.py (golden-tested graph +
converter; the TF-ported weights are env-gated like LPIPS — export the
pack on a machine with pytorch_fid/torchvision). The statistical part
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


def directory_features(d: str, extractor, batch_size: int = 8
                       ) -> np.ndarray:
    """Stack extractor features over every image in a directory."""
    import glob
    import os

    import jax.numpy as jnp
    from PIL import Image

    fs = sorted(p for p in glob.glob(os.path.join(d, "*"))
                if os.path.isfile(p))
    if not fs:
        raise SystemExit(f"no images under {d}")
    out = []
    for start in range(0, len(fs), batch_size):
        chunk = fs[start:start + batch_size]
        imgs = []
        for f in chunk:
            with Image.open(f) as im:
                imgs.append(np.asarray(im.convert("RGB"),
                                       np.float32) / 255.0)
        if len({im.shape for im in imgs}) != 1:
            # mixed sizes: pre-resize each image to 299 with the SAME
            # bilinear-no-antialias op the extractor applies in-graph
            # (so numerics match the uniform path), then batch once —
            # a per-image extractor call would recompile the whole
            # Inception graph per distinct input shape
            import jax

            imgs = [np.asarray(jax.image.resize(
                im, (299, 299, im.shape[2]), method="bilinear",
                antialias=False)) for im in imgs]
        out.append(extractor(jnp.asarray(np.stack(imgs))))
    return np.concatenate(out)


def calc_fid(dir_fake: str, dir_real: str) -> float:
    try:
        from ..models.inception import load_default
        extractor = load_default()
    except FileNotFoundError as e:
        raise SystemExit(
            f"FID feature extractor unavailable in this environment: {e}")

    mu1, s1 = activation_statistics(directory_features(dir_fake, extractor))
    mu2, s2 = activation_statistics(directory_features(dir_real, extractor))
    return frechet_distance(mu1, s1, mu2, s2)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("fake_dir")
    p.add_argument("real_dir")
    args = p.parse_args(argv)
    print("FID:", calc_fid(args.fake_dir, args.real_dir))


if __name__ == "__main__":
    main()
