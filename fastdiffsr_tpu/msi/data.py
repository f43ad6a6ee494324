"""MSI_SR_model data pipeline (torch-free, [0,1] range).

Parity target: MSI_SR_model/data/dataset.py —
- RGB_TrainDatasetFromFolder (:586-679): folder(s) of HR images; hr =
  to_tensor(img); lr = PIL-bicubic downsample by scale; bc = PIL-bicubic
  re-upsample of lr; returns (lr, hr, bicubic, path)
- test datasets center/valid-crop to test_crop_size then the same triple
- per-class evaluation walks class subfolders (model/swinir.py:1430+).
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np

from ..data.dataset import DataLoader, is_image_file


def _load_pil(path: str):
    from PIL import Image
    img = Image.open(path).convert("RGB")
    return img


def _triple_from_pil(img, scale: int, crop_size: int | None = None,
                     noise=None, noise_rng=None):
    """(lr, hr, bicubic) float32 [0,1] NHWC arrays from one PIL image.

    ``noise=(type, value)`` injects Gaussian ('Gaussain', the reference's
    spelling) or salt&pepper ('Poisson', ditto) noise into the LR image
    BEFORE the bicubic re-upsample, matching the reference test datasets
    (data/dataset.py:186-207: input and input_resize both come from the
    noisy LR)."""
    from PIL import Image
    if crop_size:
        w, h = img.size
        crop = min(crop_size, w, h)
        crop -= crop % scale
        left, top = (w - crop) // 2, (h - crop) // 2
        img = img.crop((left, top, left + crop, top + crop))
    w, h = img.size
    w -= w % scale
    h -= h % scale
    if (w, h) != img.size:
        img = img.crop((0, 0, w, h))
    lr = img.resize((w // scale, h // scale), Image.BICUBIC)
    if noise is not None:
        from .degradation import add_gaussian_noise, add_salt_pepper_noise
        noise_type, noise_value = noise
        lr_u8 = np.asarray(lr, np.uint8)
        if noise_type == "Gaussain":  # reference spelling
            lr_u8 = add_gaussian_noise(lr_u8, amplitude=noise_value,
                                       rng=noise_rng)
        elif noise_type == "Poisson":  # reference maps this to salt&pepper
            lr_u8 = add_salt_pepper_noise(lr_u8, density=noise_value,
                                          rng=noise_rng)
        else:
            raise ValueError(f"unknown noise type {noise_type!r}")
        lr = Image.fromarray(lr_u8)
    bc = lr.resize((w, h), Image.BICUBIC)
    to_f = lambda im: np.asarray(im, np.float32) / 255.0
    return to_f(lr), to_f(img), to_f(bc)


def list_images(dirs: Sequence[str]) -> List[str]:
    files = []
    for d in dirs:
        for name in sorted(os.listdir(d)):
            p = os.path.join(d, name)
            if os.path.isfile(p) and is_image_file(name):
                files.append(p)
            elif os.path.isdir(p):
                files.extend(os.path.join(p, f)
                             for f in sorted(os.listdir(p))
                             if is_image_file(f))
    return files


class RGBSRDataset:
    """(LR, HR, Bicubic, path) tuples; split='train' center-crops to
    crop_size like the reference's pre-tiled training data."""

    def __init__(self, image_dirs: Sequence[str], crop_size: int | None,
                 scale_factor: int, split: str = "train",
                 data_len: int = -1, noise=None, seed: int = 0):
        if isinstance(image_dirs, str):
            image_dirs = [image_dirs]
        self.files = list_images(image_dirs)
        assert self.files, f"no images under {image_dirs}"
        self.crop_size = crop_size
        self.scale = scale_factor
        self.split = split
        self.noise = noise  # (type, value) degradation, see _triple_from_pil
        self._noise_rng = np.random.default_rng(seed)
        self.data_len = (len(self.files) if data_len <= 0
                         else min(data_len, len(self.files)))

    def __len__(self):
        return self.data_len

    def __getitem__(self, index: int) -> dict:
        path = self.files[index]
        img = _load_pil(path)
        lr, hr, bc = _triple_from_pil(img, self.scale, self.crop_size,
                                      noise=self.noise,
                                      noise_rng=self._noise_rng)
        cls = os.path.basename(os.path.dirname(path))
        return {"LR": lr, "HR": hr, "Bicubic": bc,
                "Index": np.int32(index), "path": path, "class": cls}


class MSIDataLoader(DataLoader):
    """Keeps string fields (path/class) out of the numpy stacking."""

    def __iter__(self):
        idx = self._indices()
        batches = [idx[s:s + self.batch_size]
                   for s in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        self.epoch += 1
        rng = np.random.default_rng(self.seed + self.epoch)
        for chunk in batches:
            samples = [self.dataset[int(i)] for i in chunk]
            if self.dataset.split == "train" and rng.random() < 0.5:
                for s in samples:
                    for k in ("LR", "HR", "Bicubic"):
                        s[k] = np.ascontiguousarray(s[k][:, ::-1, :])
            batch = {}
            for k in samples[0]:
                vals = [s[k] for s in samples]
                batch[k] = (np.stack(vals)
                            if isinstance(vals[0], np.ndarray) or
                            np.isscalar(vals[0]) else vals)
            yield batch
