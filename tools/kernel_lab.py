"""Micro-bench the fused GN+Swish+Conv3x3 kernel variants per call shape.

The T=20 sampler's fused path spends its time in ~50 fused_gn_swish_conv3x3
calls; BASELINE.md r2 puts the top-level call at 1.63 ms vs ~0.6-0.7 ms of
perfectly-overlapped arithmetic. This harness times each `split` decomposition
("none" = one K=9C dot, "dy" = 3 accumulating K=3C dots, "dydx" = 9 K=C dots
on shifted views) at the sampler's real call shapes so kernel scheduling
experiments iterate in seconds instead of full-sampler minutes.

Usage: python tools/kernel_lab.py [--batch 16] [--reps 20]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def bench_call(fn, args, reps):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--splits", type=str, default="none,dy,dydx")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from fastdiffsr_tpu.ops.fused_conv import fused_gn_swish_conv3x3

    B = args.batch
    # (H, sources, Co): the sampler's fused call shapes at 256² base
    # (mults [1,2,4,4] -> channels 64,128,256,256 at 256,128,64,32 px)
    shapes = [
        (256, (64,), 64),
        (128, (128,), 128),
        (64, (256,), 256),
        (32, (256,), 256),
        (256, (64, 64), 64),     # up-block skip-concat
        (128, (128, 128), 128),
    ]
    rng = jax.random.PRNGKey(0)
    rows = []
    for H, cs, co in shapes:
        xs = tuple(
            jax.random.normal(jax.random.fold_in(rng, i), (B, H, H, c),
                              jnp.bfloat16) for i, c in enumerate(cs))
        stats = tuple(
            jnp.stack([jnp.sum(x.astype(jnp.float32), axis=(1, 2)),
                       jnp.sum(x.astype(jnp.float32) ** 2, axis=(1, 2))],
                      axis=1) for x in xs)
        C = sum(cs)
        w = jax.random.normal(rng, (3, 3, C, co), jnp.float32) * 0.05
        b = jnp.zeros((co,), jnp.float32)
        gs = jnp.ones((C,), jnp.float32)
        gb = jnp.zeros((C,), jnp.float32)
        x_in = xs if len(xs) > 1 else xs[0]
        st_in = stats if len(stats) > 1 else stats[0]
        for split in args.splits.split(","):
            fn = partial(fused_gn_swish_conv3x3, groups=32,
                         want_stats=True, split=split)
            ms = bench_call(fn, (x_in, gs, gb, st_in, w, b), args.reps)
            label = f"{H}x{H} C={'+'.join(map(str, cs))}->{co}"
            rows.append((label, split, ms))
            print(f"{label:28s} split={split:5s} {ms:8.3f} ms", flush=True)

    # per-variant total over one UNet eval (approx: counts of each shape in
    # the fused forward: 256²x4 single + 2 dual, 128²x4 + 3 dual, 64²x7,
    # 32²x8 — rough weights for comparing totals only)
    weights = {"256x256 C=64->64": 4, "128x128 C=128->128": 4,
               "64x64 C=256->256": 7, "32x32 C=256->256": 8,
               "256x256 C=64+64->64": 2, "128x128 C=128+128->128": 3}
    for split in args.splits.split(","):
        tot = sum(ms * weights.get(lbl, 0) for lbl, s, ms in rows
                  if s == split)
        print(f"TOTAL(weighted) split={split:5s} {tot:8.2f} ms/eval")


if __name__ == "__main__":
    main()
