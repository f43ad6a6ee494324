"""Interleaved A/B of conv_split='ups_12' on the T=20 sampler.

The ups_12 slow-emitter anomaly (BASELINE.md): block1's conv at 256²
picks EmitOutputBatchInSublanes at ~4.0 ms/step vs ~1.9 ms for its
Cin=128 siblings. Its contraction is Cin=192 (concat 128+64), lane-padded
to 256. The r2 skip_concat='split' A/B could not probe this block — its
GN-split precondition fails exactly there (group size 6 ∤ 128) — so
conv_split splits ONLY the conv (exact by linearity, GN untouched),
giving each part a lane-clean contraction.

Both executables are compiled once and timed alternately in one process
(tunnel drift hits both arms equally, tools/vmem_check.py pattern).

Usage: python tools/csplit_check.py [--reps 7]  (TPU; one process at a time)
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fastdiffsr_tpu.diffusion import (DiffusionSpec, DiffusionEngine,
                                          ScheduleBuffers)
    from fastdiffsr_tpu.models import FastDiffSRUNet
    from fastdiffsr_tpu.models.unet_fastdiffsr import default_upsample_mode
    from fastdiffsr_tpu.ops.groupnorm import default_fused_norm
    from fastdiffsr_tpu.train import make_sample_fn

    B, H, W = args.batch, 256, 256
    engine = DiffusionEngine(
        DiffusionSpec.for_variant("fastdiffsr"),
        ScheduleBuffers.create({"schedule": "linear_cosine",
                                "n_timestep": 20,
                                "linear_start": 1e-6, "linear_end": 1e-2}))
    kw = dict(dtype=jnp.bfloat16, fused_norm=default_fused_norm(),
              upsample_mode=default_upsample_mode())
    nets = {
        "baseline": FastDiffSRUNet(**kw),
        "csplit12": FastDiffSRUNet(**kw, conv_split="ups_12"),
    }
    rng = jax.random.PRNGKey(0)
    params = nets["baseline"].init(
        rng, jnp.zeros((1, H, W, 6)), jnp.ones((1,)))["params"]
    cond = jax.random.uniform(rng, (B, H, W, 3), jnp.float32, -1, 1)

    import bench

    chains, outs = {}, {}
    for k, net in nets.items():
        def apply_fn(p, x_in, level, _r, net=net):
            return net.apply({"params": p}, x_in, level, deterministic=True)
        chains[k] = bench.make_chained_sample_fn(engine, apply_fn)
        outs[k] = np.asarray(chains[k](params, cond, rng, 1))  # warm + keep
    # same params, same keys -> the two graphs must agree numerically
    # (bf16 through 20 chaotic sampler steps amplifies rounding — compare
    # magnitudes, not bitness)
    d = np.max(np.abs(outs["baseline"] - outs["csplit12"]))
    print(f"max |baseline - csplit12| after T=20 bf16: {d:.3e}", flush=True)

    # per-arm min-differenced chained blocks (the bench.py robustness
    # recipe), arms alternating inside each block so phase drift hits
    # both equally
    R, nb = args.reps, 3
    t1 = {k: [] for k in chains}
    t2 = {k: [] for k in chains}
    for b in range(nb):
        order = list(chains) if b % 2 == 0 else list(chains)[::-1]
        for k in order:
            t0 = time.perf_counter()
            np.asarray(chains[k](params, cond,
                                 jax.random.fold_in(rng, 2 * b), R))
            t1[k].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(chains[k](params, cond,
                                 jax.random.fold_in(rng, 2 * b + 1), 2 * R))
            t2[k].append(time.perf_counter() - t0)
    for k in chains:
        dt = min(t2[k]) - min(t1[k])
        print(f"{k:9s} {R * B / dt:6.2f} img/s "
              f"(min-diff over {nb} blocks; R={R})", flush=True)


if __name__ == "__main__":
    main()
