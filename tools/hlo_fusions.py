"""Map xplane fusion names to their HLO: compile the bench sampler for the
TPU target and print, for each requested fusion, its instruction line
(output shapes) plus the interesting lines (convolution / reduce / concat /
dot) of its called computation. Pairs with tools/xplane_ops.py:

    python tools/hlo_fusions.py convert_reduce_fusion.135 fusion.1589 ...
    python tools/hlo_fusions.py --all            # dump every fusion
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_compiled():
    import jax
    import jax.numpy as jnp

    from bench import build_flagship_net
    from fastdiffsr_tpu.diffusion import (DiffusionSpec, DiffusionEngine,
                                          ScheduleBuffers)
    from fastdiffsr_tpu.train import make_sample_fn

    B, H, W = 16, 256, 256
    engine = DiffusionEngine(
        DiffusionSpec.for_variant("fastdiffsr"),
        ScheduleBuffers.create({"schedule": "linear_cosine", "n_timestep": 20,
                                "linear_start": 1e-6, "linear_end": 1e-2}))
    net = build_flagship_net()
    rng = jax.random.PRNGKey(0)
    cond = jnp.zeros((B, H, W, 3), jnp.float32)
    params = net.init(rng, jnp.zeros((1, H, W, 6), jnp.float32),
                      jnp.ones((1,), jnp.float32))["params"]

    def apply_fn(p, x_in, level, _rng):
        return net.apply({"params": p}, x_in, level, deterministic=True)

    sample = make_sample_fn(engine, apply_fn)
    return sample.lower(params, cond, rng).compile()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true",
                    help="dump every fusion (file order) instead of "
                    "only the named ones")
    args = ap.parse_args()

    compiled = build_compiled()
    text = compiled.as_text()
    lines = text.splitlines()

    # index: computation name -> [line span]
    comp_start = {}
    for i, ln in enumerate(lines):
        m = re.match(r"\s*%?([\w.\-]+)\s+\([^)]*\)\s*->", ln)
        if m and ("fused_computation" in m.group(1) or
                  ln.lstrip().startswith("%fused_")):
            comp_start[m.group(1)] = i

    def comp_body(name):
        i = comp_start.get(name)
        if i is None:
            return []
        out = []
        for ln in lines[i:i + 400]:
            out.append(ln)
            if ln.strip() == "}":
                break
        return out

    want = set(args.names)
    for ln in lines:
        m = re.search(r"%([\w.\-]*?fusion[\w.]*) = ", ln)
        if not m:
            continue
        name = m.group(1)
        if want and name not in want:
            continue
        if not want and not args.all:
            continue
        print("=" * 100)
        print(ln.strip()[:4000])
        mc = re.search(r"calls=%?([\w.\-]+)", ln)
        if mc:
            for bl in comp_body(mc.group(1)):
                if re.search(r"convolution|reduce\(|reduce-window|dot\(|"
                             r"concatenate|ROOT|transpose\(|copy\(", bl):
                    print("   |", bl.strip()[:400])


if __name__ == "__main__":
    main()
