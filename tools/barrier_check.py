"""A/B a per-block stats_barrier on the T=20 sampler (ups_12 probe).

BASELINE.md: the first 256-squared up-block conv (ups_12/block1) picks the
slow EmitOutputBatchInSublanes emitter (~4.0 ms/step) while its
identical-shape siblings get EmitAllBatchInSublanes (~1.9 ms/step). r1
falsified a GLOBAL barrier (13.9 img/s) and a C>128-wide barrier (14.9) —
both cut fusions on blocks where the fused schedule wins. This probes the
surgical version: barrier ONLY the anomalous block(s), leaving every other
conv+GN-stats kOutput fusion intact.

Compiles each arm once, times interleaved (vmem_check.py methodology).

Usage: python tools/barrier_check.py [--reps 5] [--blocks ups_12]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--blocks", type=str, default="ups_12",
                    help="comma-separated block names; semicolons separate "
                         "extra arms, e.g. 'ups_12;ups_12,ups_13'")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_flagship_net
    from fastdiffsr_tpu.diffusion import (DiffusionSpec, DiffusionEngine,
                                          ScheduleBuffers)
    from fastdiffsr_tpu.train import make_sample_fn

    B, H, W = 16, 256, 256
    engine = DiffusionEngine(
        DiffusionSpec.for_variant("fastdiffsr"),
        ScheduleBuffers.create({"schedule": "linear_cosine",
                                "n_timestep": 20,
                                "linear_start": 1e-6, "linear_end": 1e-2}))

    # the shared flagship builder so this A/B measures the exact graph
    # bench.py reports (incl. FASTDIFFSR_TPU_QUANT — ADVICE r2)
    build = build_flagship_net

    rng = jax.random.PRNGKey(0)
    base = build("")
    params = base.init(rng, jnp.zeros((1, H, W, 6)),
                       jnp.ones((1,)))["params"]
    cond = jax.random.uniform(rng, (B, H, W, 3), jnp.float32, -1, 1)

    execs = {}
    arms = [""] + [a for a in args.blocks.split(";") if a]
    for barrier in arms:
        net = build(barrier)

        def apply_fn(p, x_in, level, _r, _net=net):
            return _net.apply({"params": p}, x_in, level,
                              deterministic=True)

        name = barrier or "baseline"
        t0 = time.perf_counter()
        execs[name] = make_sample_fn(engine, apply_fn).lower(
            params, cond, rng).compile()
        print(f"{name}: compiled in {time.perf_counter() - t0:.1f}s",
              flush=True)

    times = {k: [] for k in execs}
    ref = None
    for k, ex in execs.items():                       # warm + parity check
        out = np.asarray(ex(params, cond, rng))
        ref = out if ref is None else ref
        err = float(np.abs(out - ref).max())
        # exact identity is proven at f32 on CPU (tests/test_ops.py);
        # at bf16 a 1-ulp refusion difference compounds through the 20-step
        # trajectory, so this is only a sanity bound
        print(f"{k}: max |out - baseline| = {err:.2e}", flush=True)
        assert err < 0.5, f"{k} diverges from baseline by {err}"
    for i in range(args.reps):                        # interleaved timing
        for k, ex in execs.items():
            t0 = time.perf_counter()
            np.asarray(ex(params, cond, jax.random.fold_in(rng, i)))
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        ts = np.array(ts)
        print(f"{k:24s} median {B / np.median(ts):6.2f} img/s "
              f"(all: {[f'{B / t:.2f}' for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
