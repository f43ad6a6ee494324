import sys, types, os
sys.path.insert(0, "/root/repo")
import numpy as np
from fastdiffsr_tpu import metrics as M
from fastdiffsr_tpu.msi.data import RGBSRDataset
from fastdiffsr_tpu.msi.trainer import SupervisedSRTrainer
from fastdiffsr_tpu.msi.main import build_model
from fastdiffsr_tpu.msi.ndsrgan import DRRDBNet

TRAIN = "dataset/ucm_native_s8h/train/hr_64"
# bicubic on the first 16 train tiles via the same data path
ds = RGBSRDataset([TRAIN], 64, 4, split="val", data_len=16)
ps = [M.calculate_psnr((np.clip(ds[i]["Bicubic"],0,1)*255).round().astype(np.uint8),
                       (np.clip(ds[i]["HR"],0,1)*255).round().astype(np.uint8))
      for i in range(len(ds))]
print(f"bicubic on 16 TRAIN tiles: psnr {np.mean(ps):.3f}", flush=True)

def ev(name, model, ckpt):
    targs = types.SimpleNamespace(scale_factor=4, crop_size=64, test_crop_size=64,
        lr=1e-4, b1=0.9, b2=0.999, num_epochs=1, batch_size=8, log_freq=10**9,
        eval_batch_size=8, model_name=name, save_dir="/tmp/msi_trainfit", tiny=False)
    tr = SupervisedSRTrainer(model(targs) if callable(model) and not hasattr(model,"apply") else model, targs)
    tr.load(ckpt)
    res = tr.validate([TRAIN], max_images=16, save_images=False)
    print(f"{name} on 16 TRAIN tiles: psnr {res['psnr']:.3f} ssim {res['ssim']:.4f}", flush=True)

ev("NDSRGAN", DRRDBNet(scale=4, nf=64, nc=32, n_blocks=23),
   "experiments/msi_brief_s8h_stage2/ndsrgan_polish/ckpt/I500_E500" if os.path.isdir("experiments/msi_brief_s8h_stage2/ndsrgan_polish/ckpt/I500_E500") else
   sorted(__import__("glob").glob("experiments/msi_brief_s8h_stage2/ndsrgan_polish/ckpt/I*"))[-1])
targs = types.SimpleNamespace(scale_factor=4, tiny=False)
ev("SwinIR", build_model("swinir", targs),
   "experiments/msi_brief_s8h/swinir/ckpt/I3000_E3000")
print("DONE")
