"""Weights & Biases logger (reference core/wandb_logger.py:3-117).

wandb is not installed in this environment; every method degrades to a
no-op with a single warning so the CLI flags (-enable_wandb,
-log_wandb_ckpt, -log_eval) keep working.
"""

from __future__ import annotations

import warnings


class WandbLogger:
    def __init__(self, opt):
        self._wandb = None
        try:
            import wandb
            self._wandb = wandb
            if wandb.run is None:
                wandb.init(project=(opt.get("wandb") or {}).get(
                    "project", "fastdiffsr_tpu"), config=dict(opt))
        except Exception as e:  # pragma: no cover
            warnings.warn(f"wandb unavailable, logging disabled: {e}")
        self._eval_table = None
        self._infer_table = None

    @property
    def enabled(self):
        return self._wandb is not None

    def log_metrics(self, metrics: dict, commit=True):
        if self.enabled:
            self._wandb.log(metrics, commit=commit)

    def log_image(self, key, image):
        if self.enabled:
            self._wandb.log({key: self._wandb.Image(image)})

    def log_images(self, key, images):
        if self.enabled:
            self._wandb.log({key: [self._wandb.Image(i) for i in images]})

    def log_checkpoint(self, current_epoch, current_step, ckpt_path=None):
        """Attach the checkpoint files to the artifact (the reference adds
        the _gen/_opt .pth pair, core/wandb_logger.py:70-95; here the
        checkpoint is the I{it}_E{epoch} directory)."""
        if not self.enabled:
            return
        import os

        art = self._wandb.Artifact(
            f"model-{self._wandb.run.id}", type="model",
            metadata={"epoch": current_epoch, "iter": current_step})
        if ckpt_path and os.path.isdir(ckpt_path):
            art.add_dir(ckpt_path)
        elif ckpt_path and os.path.isfile(ckpt_path):
            art.add_file(ckpt_path)
        self._wandb.log_artifact(art, aliases=["latest",
                                               f"it{current_step}"])

    def log_eval_data(self, fake_img, psnr, ssim, real_img=None):
        if not self.enabled:
            return
        if self._eval_table is None:
            cols = (["fake", "real", "psnr", "ssim"] if real_img is not None
                    else ["fake", "psnr", "ssim"])
            self._eval_table = self._wandb.Table(columns=cols)
        row = [self._wandb.Image(fake_img)]
        if real_img is not None:
            row.append(self._wandb.Image(real_img))
        self._eval_table.add_data(*row, psnr, ssim)

    def log_eval_table(self, commit=False):
        if self.enabled and self._eval_table is not None:
            self._wandb.log({"eval_data": self._eval_table}, commit=commit)
