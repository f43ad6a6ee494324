"""Scout int8 conv throughput at the sampler's shapes (round-3 lever?).

v5e's MXU peaks at ~2x the bf16 rate for int8 operands. The T=20
sampler is conv-dominated with Cout=64 lane-capping already limiting
MXU use — this lab measures whether int8 convs actually run faster than
bf16 at the real shapes before any quantization work is attempted.

Timing: chained in-graph reps with a full-reduce data dependence + hard
D2H sync (see tools/ups_lab.py for why scalar links are invalid).

Usage: python tools/int8_lab.py [--chain 30] [--reps 5] [--batch 16]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=30)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    N = args.chain

    import jax
    import jax.numpy as jnp

    def timeit(f, *xs):
        float(np.asarray(f(*xs)))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            float(np.asarray(f(*xs)))
        return (time.perf_counter() - t0) / args.reps

    rng = jax.random.PRNGKey(0)

    @jax.jit
    def trivial(x):
        return jnp.sum(x[:, 0, 0, :].astype(jnp.float32))

    rtt = timeit(trivial, jax.random.normal(rng, (8, 32, 32, 128),
                                            jnp.bfloat16))
    print(f"RTT+D2H floor: {rtt * 1e3:.2f} ms", flush=True)

    dn = ("NHWC", "HWIO", "NHWC")
    for (H, C) in [(256, 64), (128, 128), (64, 256)]:
        shape = (args.batch, H, H, C)
        xb = jax.random.normal(rng, shape, jnp.bfloat16)
        wb = (jax.random.normal(jax.random.fold_in(rng, C),
                                (3, 3, C, C)) * 0.05).astype(jnp.bfloat16)
        xi = jax.random.randint(rng, shape, -127, 127, jnp.int8)
        wi = jax.random.randint(jax.random.fold_in(rng, C),
                                (3, 3, C, C), -127, 127, jnp.int8)

        def chain_bf16(x, w):
            s = jnp.float32(0)
            for _ in range(N):
                y = jax.lax.conv_general_dilated(
                    x * (1 + s * 1e-12).astype(x.dtype), w, (1, 1), "SAME",
                    dimension_numbers=dn)
                s = s + jnp.sum(y.astype(jnp.float32)) * 1e-9
            return s

        def chain_int8(x, w):
            # int8 x int8 -> int32 accumulate (preferred_element_type);
            # data link via a cheap int reinjection
            s = jnp.int32(0)
            for _ in range(N):
                y = jax.lax.conv_general_dilated(
                    jnp.bitwise_xor(x, (s & 1).astype(jnp.int8)), w,
                    (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                s = s + (jnp.sum(y) & 0x7fffffff)
            return s.astype(jnp.float32)

        for nm, f, a, b in [("bf16", chain_bf16, xb, wb),
                            ("int8", chain_int8, xi, wi)]:
            try:
                ms = (timeit(jax.jit(f), a, b) - rtt) / N * 1e3
                tf = (2 * args.batch * H * H * C * C * 9) / (ms * 1e-3) / 1e12
                print(f"B{args.batch} {H:4d}² C{C:<4d} {nm:5s} "
                      f"{ms:8.3f} ms/call  {tf:6.1f} TOP/s", flush=True)
            except Exception as e:
                print(f"B{args.batch} {H:4d}² C{C:<4d} {nm:5s} "
                      f"ERROR {type(e).__name__}: {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()
