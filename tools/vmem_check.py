"""A/B-verify the scoped-VMEM compiler option on the T=20 sampler.

flag_sweep.py showed xla_tpu_scoped_vmem_limit_kib=65536 at +3.3% on the
tconv graph (17.06 vs 16.52) — a delta inside historical tunnel noise.
This compiles BOTH executables once and times them alternately (N timed
reps each, interleaved) so drift hits both arms equally.

Usage: python tools/vmem_check.py [--reps 5]   (TPU; one process at a time)
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fastdiffsr_tpu.diffusion import (DiffusionSpec, DiffusionEngine,
                                          ScheduleBuffers)
    from fastdiffsr_tpu.models import FastDiffSRUNet
    from fastdiffsr_tpu.models.unet_fastdiffsr import (default_skip_concat,
                                                       default_upsample_mode)
    from fastdiffsr_tpu.ops.groupnorm import default_fused_norm
    from fastdiffsr_tpu.train import make_sample_fn

    B, H, W = 16, 256, 256
    engine = DiffusionEngine(
        DiffusionSpec.for_variant("fastdiffsr"),
        ScheduleBuffers.create({"schedule": "linear_cosine",
                                "n_timestep": 20,
                                "linear_start": 1e-6, "linear_end": 1e-2}))
    net = FastDiffSRUNet(dtype=jnp.bfloat16,
                         fused_norm=default_fused_norm(),
                         upsample_mode=default_upsample_mode(),
                         skip_concat=default_skip_concat())
    rng = jax.random.PRNGKey(0)
    params = net.init(rng, jnp.zeros((1, H, W, 6)), jnp.ones((1,)))["params"]

    def apply_fn(p, x_in, level, _r):
        return net.apply({"params": p}, x_in, level, deterministic=True)

    sample = make_sample_fn(engine, apply_fn)
    cond = jax.random.uniform(rng, (B, H, W, 3), jnp.float32, -1, 1)
    lowered = sample.lower(params, cond, rng)
    execs = {
        "baseline": lowered.compile(),
        "vmem64m": lowered.compile(
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    }
    times = {k: [] for k in execs}
    for k, ex in execs.items():                       # warm both
        np.asarray(ex(params, cond, rng))
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
