"""Measure the PyTorch REFERENCE's throughput on this host's CPU.

VERDICT r3 missing #3 / next #7: every recorded ``vs_baseline`` ratio
divided by an *estimated* reference GPU throughput (2.0 img/s for the
flagship, bench.py). No reference GPU exists in this environment, but
torch (CPU) and the reference source are mounted — so the denominator can
be anchored by a measurement: "reference, this host CPU: X img/s",
recorded in BASELINE.md next to the GPU-era estimate, plus the same
anchor for the five MSI baselines and the EDiffSR NAFNet restore whose
``vs_baseline`` was previously null.

What runs (always the reference's own modules, imported from
/root/reference — nothing is copied):
  --flagship  model/fastdiffsr_modules/{unet,diffusion}.py with the paper
              config (inner 64, mults [1,2,4,4], res 2, T=20
              linear_cosine), ``super_resolution`` on a 256x256 bicubic
              condition at batch 1 — the reference eval path
              (sr_mfe.py:258-386) minus metrics.
  --msi       the five MSI generators at the trainers' full configs
              (swinir.py:828, hsenet.py:651, transenet.py:597,
              ndsrgan.py:320, hat.py:952), forward 64->256 at batch 1.
  --ediffsr   ConditionalNAFNet w64 enc [14,1,1,1]
              (DenoisingNAFNet_arch.py) single forward at 256², scaled to
              the T=100 reverse-SDE restore (100 sequential calls/image,
              test.py:84-131) — the per-call x100 extrapolation is exact
              for the dominant cost and labeled as such.

Each line prints images/sec; fp32 eval mode under torch.no_grad, matching
the reference's eval dtype.
"""

import argparse
import sys
import time

REF = "/root/reference/FastDiffSR"

BAD_PREFIXES = ("from torchvision", "import torchvision", "from skimage",
                "from utils", "from data", "import data", "from timm",
                "import timm", "from loss", "from model.transformer",
                "from model.base_networks", "import argparse")


def _exec_msi(fname, cut_class):
    """Load one reference MSI model file up to its trainer class, with
    the unavailable imports stripped (same loader as the golden converter
    tests, tests/test_msi_converters.py)."""
    import pathlib

    import torch
    import torch.nn as t_nn

    path = pathlib.Path(REF) / "MSI_SR_model" / "model" / fname
    lines = path.read_text().split("\n")
    for i, ln in enumerate(lines):
        if ln.startswith(cut_class):
            lines = lines[:i]
            break
    lines = [ln for ln in lines if not ln.strip().startswith(BAD_PREFIXES)]

    class DropPath(t_nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    def trunc_normal_(tensor, std=1.0, **kw):
        with torch.no_grad():
            tensor.normal_(0, std).clamp_(-2 * std, 2 * std)
        return tensor

    ns = {"__name__": f"ref_{fname[:-3]}", "DropPath": DropPath,
          "to_2tuple": to_2tuple, "trunc_normal_": trunc_normal_}
    exec(compile("\n".join(lines), str(path), "exec"), ns)
    return ns


def _time_calls(fn, reps, warmup=1):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def _stub_modules():
    """The reference imports torchvision/einops at module scope but this
    config never calls them — stub so the mounted source imports."""
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm.vgg19 = lambda *a, **k: None
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    if "einops" not in sys.modules:
        eo = types.ModuleType("einops")
        eo.rearrange = None
        sys.modules["einops"] = eo


def bench_flagship(reps):
    import torch

    sys.path.insert(0, REF)
    _stub_modules()
    from model.fastdiffsr_modules.diffusion import GaussianDiffusion
    from model.fastdiffsr_modules.unet import UNet

    net = UNet(in_channel=6, out_channel=3, inner_channel=64,
               norm_groups=32, channel_mults=(1, 2, 4, 4), attn_res=(16,),
               res_blocks=2, dropout=0.2, image_size=256)
    diff = GaussianDiffusion(net, image_size=256, channels=3,
                             loss_type="l1", conditional=True, scale=4)
    diff.set_loss("cpu")
    diff.set_new_noise_schedule(
        {"schedule": "linear_cosine", "n_timestep": 20,
         "linear_start": 1e-6, "linear_end": 1e-2}, "cpu")
    diff.eval()
    x = torch.rand(1, 3, 256, 256) * 2 - 1

    with torch.no_grad():
        dt = _time_calls(lambda: diff.super_resolution(x, continous=False),
                         reps)
    print(f"flagship T=20 sampler, batch 1, 256²: {dt:.2f} s/image "
          f"= {1 / dt:.4f} img/s (reference, this host CPU, fp32)")


def bench_msi(reps, only=()):
    import torch

    models = {
        "swinir": lambda ns: ns["GeneratorResNet"](
            upscale=4, in_chans=3, img_size=64, window_size=8, img_range=1.,
            depths=[6] * 6, embed_dim=180, num_heads=[6] * 6, mlp_ratio=2,
            upsampler="pixelshuffle", resi_connection="1conv"),
        "hsenet": lambda ns: ns["HSENET"](n_feats=64, scale=4,
                                          n_basic_modules=10, n_colors=3),
        "transenet": lambda ns: ns["TransENet"](
            n_feats=64, scale=4, n_basic_modules=10, n_colors=3,
            hr_patch_size=256, back_projection_iters=10, en_depth=8,
            de_depth=1),
        "ndsrgan": lambda ns: ns["GeneratorResNet"](
            in_channels=3, out_channels=3, nf=64, nc=32, upscale_factor=4),
        "hat": lambda ns: ns["GeneratorResNet"](upscale=4, in_chans=3,
                                                img_size=64),
    }
    cuts = {"swinir": "class SwinIR(object)",
            "hsenet": "class HSENet(object)",
            "transenet": "class TransENetModel(object)",
            "ndsrgan": "class NDSRGAN(object)",
            "hat": "class HAT(object)"}
    import pathlib

    x = torch.rand(1, 3, 64, 64)
    for name, build in models.items():
        if only and name not in only:
            continue
        ns = _exec_msi(f"{name}.py", cuts[name])
        if name == "transenet":
            # its encoder/decoder live in model/transformer.py (einops is
            # available here, so it execs directly)
            tpath = pathlib.Path(REF) / "MSI_SR_model" / "model" / \
                "transformer.py"
            tns = {"__name__": "ref_transformer"}
            exec(compile(tpath.read_text(), str(tpath), "exec"), tns)
            ns.update({k: v for k, v in tns.items()
                       if not k.startswith("__")})
        net = build(ns).eval()
        with torch.no_grad():
            dt = _time_calls(lambda: net(x), reps)
        print(f"msi {name} forward, batch 1, 64->256: {dt:.3f} s/image "
              f"= {1 / dt:.4f} img/s (reference, this host CPU, fp32)")
        del net, ns


def bench_ediffsr(reps):
    import pathlib

    import torch

    # ConditionalNAFNet imports module_util relatively; load it the same
    # stripped way
    base = pathlib.Path(REF) / "EDiffSR" / "codes" / "config" / "sisr" / \
        "models" / "modules"
    # exec module_util into the SAME namespace, then the arch file with
    # its relative import stripped — names resolve directly (the same
    # loader as tests/test_ediffsr.py::_load_ref_nafnet)
    ns = {"__name__": "ref_nafnet"}
    mu_path = base / "module_util.py"
    exec(compile(mu_path.read_text(), str(mu_path), "exec"), ns)
    src = (base / "DenoisingNAFNet_arch.py").read_text().replace(
        "from .module_util import SinusoidalPosEmb, LayerNorm, exists", "")
    exec(compile(src, str(base / "DenoisingNAFNet_arch.py"), "exec"), ns)

    net = ns["ConditionalNAFNet"](img_channel=3, width=64,
                                  enc_blk_nums=[14, 1, 1, 1],
                                  middle_blk_num=1,
                                  dec_blk_nums=[1, 1, 1, 1]).eval()
    x = torch.rand(1, 3, 256, 256)
    mu = torch.rand(1, 3, 256, 256)
    t = torch.full((1,), 50)
    with torch.no_grad():
        dt = _time_calls(lambda: net(x, mu, t), reps)
    print(f"ediffsr NAFNet w64 forward, batch 1, 256²: {dt:.3f} s/call; "
          f"T=100 restore = {100 * dt:.1f} s/image = {1 / (100 * dt):.5f} "
          f"img/s (reference, this host CPU, fp32; per-call x100)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flagship", action="store_true")
    ap.add_argument("--msi", action="store_true")
    ap.add_argument("--ediffsr", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--models", default="",
                    help="comma filter for --msi (e.g. transenet,hat)")
    args = ap.parse_args()
    if not (args.flagship or args.msi or args.ediffsr):
        args.flagship = args.msi = args.ediffsr = True

    import torch
    torch.manual_seed(0)
    print(f"torch {torch.__version__}, "
          f"{torch.get_num_threads()} CPU threads")
    if args.flagship:
        bench_flagship(max(1, args.reps // 3))
    if args.msi:
        bench_msi(args.reps, [m for m in args.models.split(",") if m])
    if args.ediffsr:
        bench_ediffsr(args.reps)


if __name__ == "__main__":
    main()
