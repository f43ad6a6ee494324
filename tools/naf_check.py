"""Interleaved A/B of the EDiffSR restore-graph levers (VERDICT r3 #6).

Arms (same parameter tree, exact reformulations — tests/test_ediffsr.py):
  baseline   literal ConditionalNAFNet forward, lax.scan T=100
  dw_shift   3x3 depthwise conv as nine shifted FMAs (VPU chains)
  up_tconv   decoder (1x1 conv + PixelShuffle) folded into one stride-2
             transposed conv
  both       dw_shift + up_tconv
  unroll4    baseline net, reverse-SDE scan unroll=4
  fold_enc   fold2 batch-pair channel packing of the 14-block 256² enc
             stage (lane-occupancy lever, VERDICT r4 missing #3)
  fold_all   fold2 of the enc stage AND the level-0 dec block
  (fold arms run with up_tconv, the shipped default, so they measure the
  lever against the best known graph)

All executables compile once, then are timed alternately so tunnel drift
hits every arm equally (tools/vmem_check.py pattern). Numerical check:
every arm's restore output is compared against baseline.

Usage: python tools/naf_check.py [--reps 3] [--batch 8]
       (TPU; one process at a time)
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--arms", default="baseline,dw_shift,up_tconv,both,"
                    "unroll4")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fastdiffsr_tpu.diffusion.sde import IRSDE, IRSDEBuffers
    from fastdiffsr_tpu.models.nafnet import nafnet_from_config

    B, lq_size, scale = args.batch, 64, 4
    size = lq_size * scale
    sde = IRSDE(IRSDEBuffers.create(max_sigma=50, T=100, schedule="cosine",
                                    eps=0.005))
    setting = {"width": 64, "enc_blk_nums": [14, 1, 1, 1],
               "middle_blk_num": 1, "dec_blk_nums": [1, 1, 1, 1]}

    def make_net(dw="", up="", fold=""):
        import os
        env = {"FASTDIFFSR_TPU_NAF_DW": dw, "FASTDIFFSR_TPU_NAF_UP": up,
               "FASTDIFFSR_TPU_NAF_FOLD": fold}
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            return nafnet_from_config(setting, dtype=jnp.bfloat16)
        finally:
            for k, v in old.items():
                os.environ.pop(k) if v is None else os.environ.__setitem__(
                    k, v)

    ARMS = {
        "baseline": (make_net(), 1),
        "dw_shift": (make_net(dw="shift"), 1),
        "up_tconv": (make_net(up="tconv"), 1),
        "both": (make_net(dw="shift", up="tconv"), 1),
        "unroll4": (make_net(), 4),
        "fold_enc": (make_net(up="tconv", fold="enc"), 1),
        "fold_all": (make_net(up="tconv", fold="all"), 1),
    }
    arms = {k: ARMS[k] for k in args.arms.split(",")}

    rng = jax.random.PRNGKey(0)
    params = arms[next(iter(arms))][0].init(
        rng, jnp.zeros((1, size, size, 3)), jnp.zeros((1, size, size, 3)),
        jnp.ones((1,)))["params"]
    lq = jax.random.uniform(rng, (B, lq_size, lq_size, 3), jnp.float32, 0, 1)

    execs, outs = {}, {}
    for k, (net, unroll) in arms.items():
        def restore(lq_in, key, net=net, unroll=unroll):
            mu = jax.image.resize(lq_in, (B, size, size, 3),
                                  method="bicubic")
            xt = sde.noise_state(mu, key)
            return sde.reverse_sde(
                lambda x, m, t: net.apply({"params": params}, x, m, t,
                                          deterministic=True),
                xt, mu, key, unroll=unroll)
        t0 = time.perf_counter()
        execs[k] = jax.jit(restore).lower(lq, rng).compile()
        outs[k] = np.asarray(execs[k](lq, rng))
        print(f"# compiled {k:9s} in {time.perf_counter() - t0:6.1f}s",
              flush=True)
    base = outs.get("baseline", outs[next(iter(outs))])
    for k, o in outs.items():
        print(f"# max |{k} - baseline| = {np.max(np.abs(o - base)):.3e}",
              flush=True)

    times = {k: [] for k in execs}
    for i in range(args.reps):
        for k, ex in execs.items():
            t0 = time.perf_counter()
            np.asarray(ex(lq, jax.random.fold_in(rng, i)))
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        ts = np.array(ts)
        print(f"{k:9s} median {B / np.median(ts):6.3f} img/s "
              f"(all: {[f'{B / t:.3f}' for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
