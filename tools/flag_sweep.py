"""Sweep PJRT compiler_options on the T=20 sampler (single chip).

XLA_FLAGS is rejected by the axon client's flag parser, but per-compile
PJRT compiler_options forward through the tunnel — this sweeps candidates
relevant to the profile's two bottlenecks (stats-epilogue conv schedules,
scoped-VMEM-limited fusion scheduling) and times each compiled executable
on the same inputs.

Usage: python tools/flag_sweep.py  (TPU; one process at a time)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

OPTIONS = [
    ("baseline", {}),
    ("scoped_vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("scoped_vmem_100m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    ("licm", {"xla_tpu_enable_while_loop_double_buffering": "true"}),
]


def main():
    import jax
    import jax.numpy as jnp

    from fastdiffsr_tpu.diffusion import (DiffusionSpec, DiffusionEngine,
                                          ScheduleBuffers)
    from fastdiffsr_tpu.models import FastDiffSRUNet
    from fastdiffsr_tpu.ops.groupnorm import default_fused_norm

    B, H, W = 16, 256, 256
    engine = DiffusionEngine(
        DiffusionSpec.for_variant("fastdiffsr"),
        ScheduleBuffers.create({"schedule": "linear_cosine",
                                "n_timestep": 20,
                                "linear_start": 1e-6, "linear_end": 1e-2}))
    from fastdiffsr_tpu.models.unet_fastdiffsr import (default_skip_concat,
                                                       default_upsample_mode)
    net = FastDiffSRUNet(dtype=jnp.bfloat16,
                         fused_norm=default_fused_norm(),
                         upsample_mode=default_upsample_mode(),
                         skip_concat=default_skip_concat())
    rng = jax.random.PRNGKey(0)
    params = net.init(rng, jnp.zeros((1, H, W, 6)), jnp.ones((1,)))["params"]

    def apply_fn(p, x_in, level, _r):
        return net.apply({"params": p}, x_in, level, deterministic=True)

    def sample(params, cond, key):
        return engine.sample(
            lambda x_in, level: apply_fn(params, x_in, level, None),
            cond, key)

    cond = jax.random.uniform(rng, (B, H, W, 3), jnp.float32, -1.0, 1.0)
    lowered = jax.jit(sample).lower(params, cond, rng)

    results = []
    for name, opts in OPTIONS:
        try:
            t0 = time.time()
            compiled = lowered.compile(compiler_options=opts or None)
            t_compile = time.time() - t0
            np.asarray(compiled(params, cond, rng))  # warm
            n_rep = 4
            t0 = time.time()
            out = None
            for i in range(n_rep):
                out = compiled(params, cond,
                               jax.random.fold_in(rng, i))
            np.asarray(out)
            dt = time.time() - t0
            ips = n_rep * B / dt
            results.append({"name": name, "img_per_sec": round(ips, 2),
                            "compile_s": round(t_compile, 1)})
        except Exception as e:
            results.append({"name": name, "error": repr(e)[:200]})
        print(results[-1], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
