"""Sampler-frontier THROUGHPUT cells in one process (VERDICT r3 #2).

Per-cell ``python bench.py --sampler X --steps N`` pays the ~5-10 min
axon-tunnel process prephase seven times; this driver builds the same
graphs through bench.py's own harness (make_chained_sample_fn +
min-differenced interleaved blocks) and times every cell in ONE process.
Numbers are directly comparable to the official bench.py metric — same
chained program shape, same differencing.

Usage: python tools/frontier_speed.py [--reps 5] [--blocks 3]
       (TPU; one process at a time)
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from fastdiffsr_tpu.diffusion import (DiffusionSpec, DiffusionEngine,
                                          ScheduleBuffers)

    B, H, W = args.batch, 256, 256
    engine = DiffusionEngine(
        DiffusionSpec.for_variant("fastdiffsr"),
        ScheduleBuffers.create({"schedule": "linear_cosine",
                                "n_timestep": 20,
                                "linear_start": 1e-6, "linear_end": 1e-2}))
    net = bench.build_flagship_net()
    rng = jax.random.PRNGKey(0)
    params = net.init(rng, jnp.zeros((2, H, W, 6)),
                      jnp.ones((2,)))["params"]

    def apply_fn(p, x_in, level, _rng):
        return net.apply({"params": p}, x_in, level, deterministic=True)

    cond = jax.random.uniform(rng, (B, H, W, 3), jnp.float32, -1.0, 1.0)

    CELLS = [("ancestral", 20), ("ddim", 20), ("ddim", 10), ("ddim", 5),
             ("dpm", 20), ("dpm", 10), ("dpm", 5)]
    rows = []
    for sampler, steps in CELLS:
        if sampler == "ddim":
            sf = lambda d, c, k, s=steps: engine.sample_ddim(d, c, k,
                                                             steps=s)
        elif sampler == "dpm":
            sf = lambda d, c, k, s=steps: engine.sample_dpm(d, c, k,
                                                            steps=s)
        else:
            sf = None
        chained = bench.make_chained_sample_fn(engine, apply_fn,
                                               sample_fn=sf)
        np.asarray(chained(params, cond,
                           jax.random.fold_in(rng, -1 % 2**31), 1))
        dt = bench.diff_time(
            lambda n, i: np.asarray(
                chained(params, cond, jax.random.fold_in(rng, i), n)),
            args.reps, args.blocks, label=f"{sampler}-{steps} ")
        v = args.reps * B / dt
        rows.append((sampler, steps, v))
        print(f"| {sampler} | {steps} | {v:.2f} img/s/chip |", flush=True)

    print("\n| sampler | steps | img/s/chip |")
    print("|---|---|---|")
    for sampler, steps, v in rows:
        print(f"| {sampler} | {steps} | {v:.2f} |")


if __name__ == "__main__":
    main()
