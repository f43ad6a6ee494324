import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from fastdiffsr_tpu.diffusion import DiffusionSpec, DiffusionEngine, ScheduleBuffers
from fastdiffsr_tpu.models import FastDiffSRUNet
from fastdiffsr_tpu.train import make_sample_fn

engine = DiffusionEngine(DiffusionSpec.for_variant("fastdiffsr"),
    ScheduleBuffers.create({"schedule": "linear_cosine", "n_timestep": 20,
                            "linear_start": 1e-6, "linear_end": 1e-2}))
rng = jax.random.PRNGKey(0)
B = 16

def measure(tag, params, apply_fn):
    sample_fn = make_sample_fn(engine, apply_fn)
    cond = jax.random.uniform(rng, (B, 256, 256, 3), jnp.float32, -1., 1.)
    out = np.asarray(sample_fn(params, cond, rng))
    t0 = time.time()
    n = 5
    for i in range(n):
        out = sample_fn(params, cond, jax.random.fold_in(rng, i))
    out = np.asarray(out)
    dt = time.time() - t0
    print(f"{tag}: {n*B/dt:.2f} img/s", flush=True)

# variant 1: current (reshape-nearest up, f32 params, f32 GN)
net = FastDiffSRUNet(dtype=jnp.bfloat16)
params = net.init(rng, jnp.zeros((1, 256, 256, 6)), jnp.ones((1,)))["params"]
measure("v1 reshape-up f32gn", params,
        lambda p, x, l, _: net.apply({"params": p}, x, l, deterministic=True))

# variant 2: params cast to bf16 (GN stats in bf16 too)
params_bf = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
measure("v2 +bf16 params/gn", params_bf,
        lambda p, x, l, _: net.apply({"params": p}, x, l, deterministic=True))
EOF_MARKER = None
