"""Train-step lab: the flagship treatment for TRAINING (VERDICT r4 #1).

The jitted fwd+bwd+Adam+EMA step at the 256² paper config runs at ~26%
MXU (BASELINE r2: 487-502 ms/step at batch 32 ≈ 51 TF/s) vs the
sampler's ~50% — this lab attributes the gap and measures the levers:

  b16 / b32 / b64   batch sweep under the chained robust harness
  b32_nodrop        dropout disabled (isolates threefry mask gen + mask
                    bwd multiplies at 256²x64 — the sampler never pays
                    these, training pays them 13+ blocks per step)
  b32_rbg           rbg PRNG keys (cheaper mask generation than threefry)
  b32_remat         whole-apply jax.checkpoint (recompute fwd in bwd:
                    trades FLOPs for activation memory/schedules)
  b32_remat_dots    jax.checkpoint(policy=checkpoint_dots)
  b32_bf16state     params/opt-state/EMA stored bf16 (halves the Adam/EMA
                    elementwise traffic and the per-use param casts;
                    perf-only arm — quality impact not evaluated here)
  b64_remat         remat-enabled larger batch

Method (the r2+ house rules): every arm is the cached-dataset train step
(device-resident uint8 tiles, in-jit batch assembly — the product's fast
path) with n_sub=K optimizer steps chained per dispatch via lax.scan; all
arms compile once in ONE process and are timed alternately in interleaved
blocks at 1 and 2 calls, reporting min(t_2) - min(t_1) = K steps of pure
compute with per-dispatch overhead cancelled exactly.

Usage: python tools/train_lab.py [--arms a,b,...] [--k 20] [--blocks 3]
       [--profile]    (TPU; one process at a time)
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="b16,b32,b32_nodrop,b32_rbg,"
                    "b32_remat,b32_bf16state,b64_remat")
    ap.add_argument("--k", type=int, default=20, help="chained steps/call")
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--profile", action="store_true",
                    help="xplane-trace a few b32 calls after timing")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, ".")
    from bench import build_flagship_net
    from fastdiffsr_tpu.diffusion import (DiffusionEngine, DiffusionSpec,
                                          ScheduleBuffers)
    from fastdiffsr_tpu.train import create_train_state
    from fastdiffsr_tpu.train.steps import make_cached_train_step

    engine = DiffusionEngine(
        DiffusionSpec.for_variant("fastdiffsr"),
        ScheduleBuffers.create({"schedule": "linear_cosine",
                                "n_timestep": 20,
                                "linear_start": 1e-6, "linear_end": 1e-2}))
    net = build_flagship_net()
    rng = jax.random.PRNGKey(0)
    H = W = 256
    K = args.k

    params0 = net.init(rng, jnp.zeros((2, H, W, 6)),
                       jnp.ones((2,)))["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params0))
    print(f"# paper UNet: {n_params / 1e6:.2f} M params", flush=True)

    # device-resident synthetic corpus (64 tiles is plenty: the gather
    # cost is index-count-bound, not corpus-size-bound)
    g = np.random.default_rng(0)
    data = {k: jnp.asarray(g.integers(0, 255, (64, H, W, 3), dtype=np.uint8))
            for k in ("HR", "SR")}

    def apply_train(p, x_in, level, drop_rng):
        return net.apply({"params": p}, x_in, level, deterministic=False,
                         rngs={"dropout": drop_rng})

    def apply_nodrop(p, x_in, level, drop_rng):
        return net.apply({"params": p}, x_in, level, deterministic=True)

    def apply_remat(policy=None):
        fn = jax.checkpoint(apply_train, policy=policy)
        return fn

    def build(batch, apply_fn, dtype=jnp.float32, key_impl=None):
        tx = optax.adam(2e-4)
        p = jax.tree_util.tree_map(lambda x: x.astype(dtype), params0)
        state = create_train_state(p, tx)
        step = make_cached_train_step(engine, apply_fn, tx,
                                      batch_size=batch, ema_start=5000,
                                      n_sub=K)
        key = (jax.random.PRNGKey(1) if key_impl is None
               else jax.random.key(1, impl=key_impl))
        return state, step, key

    ARMS = {
        "b16": lambda: build(16, apply_train),
        "b32": lambda: build(32, apply_train),
        "b64": lambda: build(64, apply_train),
        "b32_nodrop": lambda: build(32, apply_nodrop),
        "b32_rbg": lambda: build(32, apply_train, key_impl="rbg"),
        "b32_remat": lambda: build(32, apply_remat()),
        "b32_remat_dots": lambda: build(
            32, apply_remat(jax.checkpoint_policies.checkpoint_dots)),
        "b32_bf16state": lambda: build(32, apply_train,
                                       dtype=jnp.bfloat16),
        "b64_remat": lambda: build(64, apply_remat()),
    }
    batches = {"b16": 16, "b32": 32, "b64": 64, "b32_nodrop": 32,
               "b32_rbg": 32, "b32_remat": 32, "b32_remat_dots": 32,
               "b32_bf16state": 32, "b64_remat": 64}

    arms = {}
    for name in args.arms.split(","):
        t0 = time.perf_counter()
        try:
            state, step, key = ARMS[name]()
            # ONE AOT compile per arm: the compiled executable serves the
            # warm-up, the cost/memory accounting AND the timed calls
            comp = step.lower(state, data, key).compile()
            state, m = comp(state, data, key)
            np.asarray(m["l_pix"])
        except Exception as e:  # noqa: BLE001 — report and keep going
            print(f"# {name}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:200]})", flush=True)
            continue
        arms[name] = {"state": state, "step": comp, "key": key,
                      "l_pix": float(np.asarray(m["l_pix"])[-1])}
        try:
            ca = comp.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            flops = float(ca.get("flops", 0.0))
            mem = comp.memory_analysis()
            arms[name]["flops"] = flops
            extra = (f"flops/call {flops / 1e12:6.2f} TF, peak "
                     f"{getattr(mem, 'temp_size_in_bytes', 0) / 2**30:5.2f}"
                     " GiB tmp")
        except Exception as e:  # noqa: BLE001
            arms[name]["flops"] = 0.0
            extra = f"cost analysis n/a ({e})"
        print(f"# compiled+warm {name:15s} in "
              f"{time.perf_counter() - t0:6.1f}s "
              f"(l_pix {arms[name]['l_pix']:.3f}; {extra})", flush=True)

    # interleaved 1-call / 2-call blocks; min-differencing per arm
    t_lo = {k: [] for k in arms}
    t_hi = {k: [] for k in arms}
    for blk in range(args.blocks):
        for name, a in arms.items():
            for n, acc in ((1, t_lo[name]), (2, t_hi[name])):
                t0 = time.perf_counter()
                for j in range(n):
                    a["state"], m = a["step"](a["state"], data,
                                              jax.random.fold_in(
                                                  a["key"],
                                                  blk * 97 + j + 1))
                np.asarray(m["l_pix"])
                acc.append(time.perf_counter() - t0)
        print(f"# block {blk} done", flush=True)

    print(f"\n== train step, 256², K={K} chained steps/call, "
          f"{args.blocks} interleaved block pairs ==")
    for name in arms:
        dt = max(min(t_hi[name]) - min(t_lo[name]), 1e-9)
        ms = dt / K * 1e3
        b = batches[name]
        tfs = arms[name]["flops"] / dt / 1e12 if arms[name]["flops"] else 0
        print(f"{name:15s} {ms:7.1f} ms/step  {b / (dt / K):7.2f} img/s  "
              f"{tfs:6.1f} TF/s ({tfs / 197 * 100:4.1f}% of v5e bf16 peak)"
              f"  [lo {[f'{t:.2f}' for t in t_lo[name]]} "
              f"hi {[f'{t:.2f}' for t in t_hi[name]]}]", flush=True)

    if args.profile and "b32" in arms:
        a = arms["b32"]
        with jax.profiler.trace("/tmp/train_trace"):
            for j in range(3):
                a["state"], m = a["step"](a["state"], data,
                                          jax.random.fold_in(a["key"],
                                                             1000 + j))
            np.asarray(m["l_pix"])
        print("# trace written to /tmp/train_trace", flush=True)


if __name__ == "__main__":
    main()
