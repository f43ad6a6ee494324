"""A/B the reverse-scan unroll factor on the T=20 sampler.

The one loop-structure knob never tried in r1/r2: lax.scan(unroll=N)
replicates the step body N times per loop iteration, letting XLA fuse the
inter-step posterior/glue math (28 ms/step, ~3% of the profile) across
step boundaries. Compiles every arm once, then times them interleaved
(tunnel drift hits all arms equally — vmem_check.py methodology).

Usage: python tools/unroll_check.py [--reps 5]   (TPU; one process at a time)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--unrolls", type=str, default="1,2,4")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fastdiffsr_tpu.diffusion import (DiffusionSpec, DiffusionEngine,
                                          ScheduleBuffers)
    from fastdiffsr_tpu.train import make_sample_fn

    sys.path.insert(0, "/root/repo")
    import bench

    B, H, W = 16, 256, 256
    engine = DiffusionEngine(
        DiffusionSpec.for_variant("fastdiffsr"),
        ScheduleBuffers.create({"schedule": "linear_cosine",
                                "n_timestep": 20,
                                "linear_start": 1e-6, "linear_end": 1e-2}))
    net = bench.build_flagship_net()
    rng = jax.random.PRNGKey(0)
    params = net.init(rng, jnp.zeros((1, H, W, 6)), jnp.ones((1,)))["params"]

    def apply_fn(p, x_in, level, _r):
        return net.apply({"params": p}, x_in, level, deterministic=True)

    cond = jax.random.uniform(rng, (B, H, W, 3), jnp.float32, -1, 1)

    # the unroll knob is read at trace time -> set the env, trace, compile
    execs = {}
    for n in [int(x) for x in args.unrolls.split(",")]:
        os.environ["FASTDIFFSR_TPU_SCAN_UNROLL"] = str(n)
        t0 = time.perf_counter()
        execs[f"unroll{n}"] = make_sample_fn(engine, apply_fn).lower(
            params, cond, rng).compile()
        print(f"unroll{n}: compiled in {time.perf_counter() - t0:.1f}s",
              flush=True)
    os.environ.pop("FASTDIFFSR_TPU_SCAN_UNROLL", None)

    times = {k: [] for k in execs}
    ref = None
    for k, ex in execs.items():                       # warm + parity check
        out = np.asarray(ex(params, cond, rng))
        ref = out if ref is None else ref
        err = float(np.abs(out - ref).max())
        # exact identity is proven at f32 on CPU (tests/test_ops.py);
        # at bf16 a 1-ulp refusion difference compounds through the 20-step
        # trajectory, so this is only a sanity bound
        print(f"{k}: max |out - unroll1| = {err:.2e}", flush=True)
        assert err < 0.5, f"{k} diverges from unroll1 by {err}"
    for i in range(args.reps):                        # interleaved timing
        for k, ex in execs.items():
            t0 = time.perf_counter()
            np.asarray(ex(params, cond, jax.random.fold_in(rng, i)))
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        ts = np.array(ts)
        print(f"{k:9s} median {B / np.median(ts):6.2f} img/s "
              f"(all: {[f'{B / t:.2f}' for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
