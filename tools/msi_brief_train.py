"""Brief-train MSI baselines on the native UCM corpus and put quality
next to their recorded throughputs (VERDICT r4 next #3).

Models: SwinIR (pure supervised, the full paper config) and NDSRGAN (the
GANTrainer adversarial loop, full DRRDBNet G + matrix discriminator) on
the SAME 24-tile / 4-holdout 16->64 x4 corpus as the diffusion demos
(dataset/ucm_native, tools/make_ucm_native.py). Feed-forward SR regresses
to the posterior mean by construction, so it should clear the bicubic
baseline where diffusion barely does; this driver produces that table.

Reference: MSI_SR_model/model/swinir.py:822 (train loop), :1288
(mfeNew_validate), model/ndsrgan.py:310 (adversarial train).

Training is driven through the trainers' own step functions in chunks
(the product train() saves+validates every epoch — with 3 steps/epoch on
24 tiles that is checkpoint spam, not a product-path difference);
validation between chunks IS the product validate() path.

Usage: python tools/msi_brief_train.py [--models swinir,ndsrgan]
       [--steps 4000] [--chunk 500] [--batch 8]   (TPU, one process)
"""

import argparse
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, "/root/repo")

TRAIN_DIR = "dataset/ucm_native/train/hr_64"   # --train_dir overrides
VAL_DIR = "dataset/ucm_native/val/hr_64"


def bicubic_baseline(scale, crop):
    """Bicubic PSNR/SSIM on the holdout through the SAME MSI data path
    the model evals use (data.py _triple_from_pil)."""
    from fastdiffsr_tpu import metrics as M
    from fastdiffsr_tpu.msi.data import RGBSRDataset

    ds = RGBSRDataset([VAL_DIR], crop, scale, split="val")
    ps, ss = [], []
    for i in range(len(ds)):
        s = ds[i]
        hr8 = (np.clip(s["HR"], 0, 1) * 255).round().astype(np.uint8)
        bc8 = (np.clip(s["Bicubic"], 0, 1) * 255).round().astype(np.uint8)
        ps.append(M.calculate_psnr(bc8, hr8))
        ss.append(M.calculate_ssim(bc8, hr8))
    return float(np.mean(ps)), float(np.mean(ss)), len(ds)


def run_swinir(args):
    import jax
    import jax.numpy as jnp

    from fastdiffsr_tpu.msi.data import MSIDataLoader, RGBSRDataset
    from fastdiffsr_tpu.msi.main import build_model
    from fastdiffsr_tpu.msi.trainer import SupervisedSRTrainer

    targs = types.SimpleNamespace(
        scale_factor=4, crop_size=64, test_crop_size=64, lr=args.lr,
        b1=0.9, b2=0.999, num_epochs=1, batch_size=args.batch,
        log_freq=10**9, eval_batch_size=8, model_name="SwinIR",
        save_dir=os.path.join(args.save_root, "swinir"), tiny=False)
    model = build_model("swinir", targs)
    tr = SupervisedSRTrainer(model, targs)
    tr._enable_dp(args.batch)
    if args.resume:
        tr.load(args.resume)
        print(f"# swinir resumed from {args.resume} "
              f"(step {int(tr.state.step)})", flush=True)

    ds = RGBSRDataset([TRAIN_DIR], 64, 4, split="train")
    loader = MSIDataLoader(ds, batch_size=args.batch, shuffle=True)
    rng = jax.random.PRNGKey(1)

    best = (-1.0, None)
    step = int(tr.state.step)
    t_hist = []
    while step < args.steps:
        t0 = time.time()
        chunk_end = min(step + args.chunk, args.steps)
        losses = []
        while step < chunk_end:
            for batch in loader:
                tr.state, loss = tr._train_step(
                    tr.state, jnp.asarray(batch["LR"]),
                    jnp.asarray(batch["HR"]),
                    jax.random.fold_in(rng, step))
                losses.append(float(loss))
                step += 1
                if step >= chunk_end:
                    break
        dt = time.time() - t0
        t_hist.append(dt)
        res = tr.validate([VAL_DIR], save_images=False)
        print(f"swinir step {step}: loss {np.mean(losses):.4f} "
              f"val psnr {res['psnr']:.3f} ssim {res['ssim']:.4f} "
              f"({dt:.0f}s chunk, {args.chunk * args.batch / dt:.1f} "
              "img/s train)", flush=True)
        if res["psnr"] > best[0]:
            best = (res["psnr"], res["ssim"])
            tr.save(epoch=step, tag="best")
    tr.save(epoch=step)
    res = tr.validate([VAL_DIR], save_images=True)
    print(f"swinir FINAL step {step}: psnr {res['psnr']:.3f} "
          f"ssim {res['ssim']:.4f} ergas {res.get('ergas', 0):.3f}; "
          f"best psnr {best[0]:.3f} ssim {best[1]:.4f}", flush=True)
    return {"final": res, "best": best}


def run_ndsrgan(args):
    import jax
    import jax.numpy as jnp

    from fastdiffsr_tpu.msi.data import MSIDataLoader, RGBSRDataset
    from fastdiffsr_tpu.msi.ndsrgan import DRRDBNet, GANTrainer
    from fastdiffsr_tpu.msi.trainer import SupervisedSRTrainer

    targs = types.SimpleNamespace(
        scale_factor=4, crop_size=64, test_crop_size=64, lr=args.lr,
        b1=0.9, b2=0.999, num_epochs=1, batch_size=args.batch,
        log_freq=10**9, eval_batch_size=8, model_name="NDSRGAN",
        save_dir=os.path.join(args.save_root, "ndsrgan"))
    gan = GANTrainer(targs)
    gan._enable_dp(args.batch)

    # product eval path: a SupervisedSRTrainer around the same G arch;
    # the GAN-trained generator params are dropped into its state
    ev = SupervisedSRTrainer(
        DRRDBNet(scale=4, nf=int(getattr(targs, "g_nf", 64)),
                 nc=int(getattr(targs, "g_nc", 32)),
                 n_blocks=int(getattr(targs, "g_blocks", 23))), targs)

    ds = RGBSRDataset([TRAIN_DIR], 64, 4, split="train")
    loader = MSIDataLoader(ds, batch_size=args.batch, shuffle=True)

    best = (-1.0, None)
    step = 0
    while step < args.steps:
        t0 = time.time()
        chunk_end = min(step + args.chunk, args.steps)
        ms = {}
        while step < chunk_end:
            for batch in loader:
                gan.g_state, gan.d_state, ms = gan._steps(
                    gan.g_state, gan.d_state,
                    jnp.asarray(batch["LR"]), jnp.asarray(batch["HR"]))
                step += 1
                if step >= chunk_end:
                    break
        dt = time.time() - t0
        ev.state = ev.state.replace(params=gan.g_state.params)
        res = ev.validate([VAL_DIR], save_images=False)
        print(f"ndsrgan step {step}: "
              + " ".join(f"{k} {float(v):.4f}" for k, v in ms.items())
              + f" val psnr {res['psnr']:.3f} ssim {res['ssim']:.4f} "
              f"({dt:.0f}s chunk, {args.chunk * args.batch / dt:.1f} "
              "img/s train)", flush=True)
        if res["psnr"] > best[0]:
            best = (res["psnr"], res["ssim"])
            ev.save(epoch=step, tag="best")
    ev.state = ev.state.replace(params=gan.g_state.params)
    ev.save(epoch=step)
    res = ev.validate([VAL_DIR], save_images=True)
    print(f"ndsrgan FINAL step {step}: psnr {res['psnr']:.3f} "
          f"ssim {res['ssim']:.4f}; best psnr {best[0]:.3f} "
          f"ssim {best[1]:.4f}", flush=True)
    return {"final": res, "best": best}


def run_ndsrgan_polish(args):
    """Supervised low-lr polish of a GAN-trained DRRDB generator (resume
    via --resume pointing at a checkpoint the GAN driver's eval trainer
    saved). The adversarial phase is demonstrated by run_ndsrgan; this
    stage is the reference-style end-of-training consolidation (the
    reference's GAN weight is 1e-3 — its objective is ~99.9% pixel
    loss anyway, ndsrgan.py:310+)."""
    import jax
    import jax.numpy as jnp

    from fastdiffsr_tpu.msi.data import MSIDataLoader, RGBSRDataset
    from fastdiffsr_tpu.msi.ndsrgan import DRRDBNet
    from fastdiffsr_tpu.msi.trainer import SupervisedSRTrainer

    targs = types.SimpleNamespace(
        scale_factor=4, crop_size=64, test_crop_size=64, lr=args.lr,
        b1=0.9, b2=0.999, num_epochs=1, batch_size=args.batch,
        log_freq=10**9, eval_batch_size=8, model_name="NDSRGAN",
        save_dir=os.path.join(args.save_root, "ndsrgan_polish"))
    tr = SupervisedSRTrainer(DRRDBNet(scale=4, nf=64, nc=32,
                                      n_blocks=23), targs)
    tr._enable_dp(args.batch)
    assert args.resume, "--resume required for ndsrgan_polish"
    tr.load(args.resume)
    print(f"# ndsrgan_polish resumed from {args.resume}", flush=True)

    ds = RGBSRDataset([TRAIN_DIR], 64, 4, split="train")
    loader = MSIDataLoader(ds, batch_size=args.batch, shuffle=True)
    rng = jax.random.PRNGKey(3)

    best = (-1.0, None)
    step = int(tr.state.step)
    target = step + args.steps
    while step < target:
        t0 = time.time()
        chunk_end = min(step + args.chunk, target)
        losses = []
        while step < chunk_end:
            for batch in loader:
                tr.state, loss = tr._train_step(
                    tr.state, jnp.asarray(batch["LR"]),
                    jnp.asarray(batch["HR"]),
                    jax.random.fold_in(rng, step))
                losses.append(float(loss))
                step += 1
                if step >= chunk_end:
                    break
        dt = time.time() - t0
        res = tr.validate([VAL_DIR], save_images=False)
        print(f"ndsrgan_polish step {step}: loss {np.mean(losses):.4f} "
              f"val psnr {res['psnr']:.3f} ssim {res['ssim']:.4f} "
              f"({dt:.0f}s chunk)", flush=True)
        if res["psnr"] > best[0]:
            best = (res["psnr"], res["ssim"])
            tr.save(epoch=step, tag="best")
    tr.save(epoch=step)
    res = tr.validate([VAL_DIR], save_images=True)
    print(f"ndsrgan_polish FINAL step {step}: psnr {res['psnr']:.3f} "
          f"ssim {res['ssim']:.4f}; best psnr {best[0]:.3f} "
          f"ssim {best[1]:.4f}", flush=True)
    return {"final": res, "best": best}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="swinir,ndsrgan")
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--chunk", type=int, default=500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--resume", default=None,
                    help="checkpoint prefix to resume (swinir only)")
    ap.add_argument("--train_dir", default=None,
                    help="override the HR train dir (e.g. the 972-tile\n                    stride-8 corpus dataset/ucm_native_s8h/train/hr_64)")
    ap.add_argument("--save_root", default="experiments/msi_brief")
    args = ap.parse_args()
    if args.train_dir:
        global TRAIN_DIR
        TRAIN_DIR = args.train_dir

    bp, bs, n = bicubic_baseline(4, 64)
    print(f"bicubic x4 baseline ({n} tiles, MSI data path): "
          f"psnr {bp:.3f} ssim {bs:.4f}", flush=True)

    results = {}
    for m in args.models.split(","):
        t0 = time.time()
        results[m] = {"swinir": run_swinir,
                      "ndsrgan": run_ndsrgan,
                      "ndsrgan_polish": run_ndsrgan_polish}[m](args)
        print(f"# {m} total {time.time() - t0:.0f}s", flush=True)

    print("\n| model | val PSNR | val SSIM | vs bicubic PSNR |")
    print("|---|---|---|---|")
    print(f"| bicubic | {bp:.3f} | {bs:.4f} | — |")
    for m, r in results.items():
        print(f"| {m} (final) | {r['final']['psnr']:.3f} | "
              f"{r['final']['ssim']:.4f} | "
              f"{r['final']['psnr'] - bp:+.2f} dB |")


if __name__ == "__main__":
    main()
