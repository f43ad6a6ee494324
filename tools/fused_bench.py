"""Bench the fused-Pallas UNet sampler vs the plain XLA path.

Same harness shape as bench.py (batch 16, 256², T=20, hard host sync);
--profile wraps the timed region in a jax.profiler trace for xplane
attribution of the Pallas-vs-glue split (BASELINE.md r2: the kernels are
schedule-bound, not bandwidth-bound — locating the ~25 ms/eval of glue is
the next single-chip lever).

Usage: python tools/fused_bench.py [--profile DIR] [--batch N]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", type=str, default=None)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fastdiffsr_tpu.diffusion import (DiffusionSpec, DiffusionEngine,
                                          ScheduleBuffers)
    from fastdiffsr_tpu.models import FastDiffSRUNet
    from fastdiffsr_tpu.models.unet_fastdiffsr_fused import fused_apply

    B, H, W = args.batch, 256, 256
    engine = DiffusionEngine(
        DiffusionSpec.for_variant("fastdiffsr"),
        ScheduleBuffers.create({"schedule": "linear_cosine",
                                "n_timestep": 20,
                                "linear_start": 1e-6, "linear_end": 1e-2}))
    net = FastDiffSRUNet(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = net.init(rng, jnp.zeros((1, H, W, 6)), jnp.ones((1,)))["params"]
    cond = jax.random.uniform(rng, (B, H, W, 3), jnp.float32, -1.0, 1.0)

    def plain_apply(p, x_in, level):
        return net.apply({"params": p}, x_in, level, deterministic=True)

    def fused(p, x_in, level):
        return fused_apply(p, x_in, level)

    results = []
    for name, fn in [("plain_xla", plain_apply), ("fused_pallas", fused)]:
        sample = jax.jit(lambda p, c, k, f=fn: engine.sample(
            lambda x_in, lvl: f(p, x_in, lvl), c, k))
        np.asarray(sample(params, cond, rng))  # compile+warm
        if args.profile:
            jax.profiler.start_trace(f"{args.profile}/{name}")
        t0 = time.time()
        out = None
        for i in range(args.reps):
            out = sample(params, cond, jax.random.fold_in(rng, i))
        np.asarray(out)
        dt = time.time() - t0
        if args.profile:
            jax.profiler.stop_trace()
        results.append({"path": name,
                        "img_per_sec": round(args.reps * B / dt, 2)})
        print(results[-1], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
