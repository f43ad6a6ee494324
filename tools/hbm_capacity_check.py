"""Validate the device-resident-corpus capacity claim on the real chip.

BASELINE.md states the full Potsdam+Toronto corpus (~22.8k tiles 256²)
would occupy ~9.3 GB as uint8 and fit v5e HBM alongside the training
state. This script MEASURES it: allocate a synthetic corpus of that
size in HBM (uint8 HR + SR), build the paper-config train state, and
run cached train steps (in-jit batch assembly over the full corpus).

Usage: python tools/hbm_capacity_check.py [--tiles 22800] [--steps 30]
       [--batch 8]   (TPU; one process at a time)
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=22800)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from bench import build_flagship_net
    from fastdiffsr_tpu.diffusion import (DiffusionSpec, DiffusionEngine,
                                          ScheduleBuffers)
    from fastdiffsr_tpu.train import (create_train_state,
                                      make_cached_train_step)

    N, H = args.tiles, 256
    gb = 2 * N * H * H * 3 / 2**30
    print(f"corpus: {N} tiles 256² uint8 x2 (HR+SR) = {gb:.2f} GB",
          flush=True)

    engine = DiffusionEngine(
        DiffusionSpec.for_variant("fastdiffsr"),
        ScheduleBuffers.create({"schedule": "linear_cosine",
                                "n_timestep": 20,
                                "linear_start": 1e-6, "linear_end": 1e-2}))
    net = build_flagship_net()
    rng = jax.random.PRNGKey(0)
    params = net.init(rng, jnp.zeros((1, H, H, 6)), jnp.ones((1,)))["params"]

    def apply_fn(p, x_in, level, drng):
        kwargs = ({"rngs": {"dropout": drng}, "deterministic": False}
                  if drng is not None else {})
        return net.apply({"params": p}, x_in, level, **kwargs)

    tx = optax.adam(2e-4)
    state = create_train_state(params, tx)

    # device-side synthetic corpus: build in chunks to bound host memory
    # (host->device of 9 GB in one shot would also hit the tunnel leak)
    g = np.random.default_rng(0)

    def upload(tag):
        chunks = []
        step_n = max(1, N // 16)
        done = 0
        while done < N:
            n = min(step_n, N - done)
            chunks.append(jax.device_put(
                g.integers(0, 255, (n, H, H, 3), dtype=np.uint8)))
            done += n
        out = jnp.concatenate(chunks, axis=0)
        jax.block_until_ready(out)
        print(f"  {tag}: {done} tiles resident", flush=True)
        return out

    # two distinct buffers (HR + SR) so the full 9.3 GB is truly resident
    data = {"HR": upload("HR"), "SR": upload("SR")}

    step_fn = make_cached_train_step(engine, apply_fn, tx,
                                     batch_size=args.batch, ema_start=0)
    state, m = step_fn(state, data, rng)
    print(f"compiled; first l_pix {float(m['l_pix']):.4f}", flush=True)
    t0 = time.time()
    for i in range(args.steps):
        state, m = step_fn(state, data, jax.random.fold_in(rng, i))
    _ = float(np.asarray(m["l_pix"]))
    dt = (time.time() - t0) / args.steps
    print(f"{args.steps} cached steps over the {gb:.1f} GB corpus: "
          f"{dt * 1e3:.1f} ms/step ({args.batch / dt:.1f} img/s), "
          f"l_pix {float(m['l_pix']):.4f}", flush=True)


if __name__ == "__main__":
    main()
