"""Chained-timing lab for the sampler's conv+GroupNorm block variants.

Question under test (BASELINE.md r2): the sampler's convs at C=64 pad the
MXU's 128 output lanes 2x, and the conv+GN-stats kOutput fusion runs a
~2.5x slower schedule. Candidate fix: fold 2 batch images into channels
(B16,HW,64) -> (B8,HW,128) and run every conv as a grouped conv
(feature_group_count=2, weights tiled) — mathematically identical, but
both contraction and output lanes are full. GroupNorm folds too (32
groups/image -> 64 groups over the folded pair; stats never cross
images).

Timing: N chained calls inside one jitted program + hard D2H sync
(see tools/kernel_lab.py for why single-dispatch timing is junk over
the axon tunnel).

Usage: python tools/conv_lab.py [--chain 20] [--reps 5]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
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
        return jnp.sum(x[:, 0, 0, :])

    rtt = timeit(trivial, jax.random.normal(rng, (8, 32, 32, 128),
                                            jnp.bfloat16))
    print(f"RTT+D2H floor: {rtt * 1e3:.2f} ms", flush=True)

    def conv(x, w, fgc=1):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=fgc)

    def gn_swish(x, groups):
        b, h, w_, c = x.shape
        xf = x.astype(jnp.float32).reshape(b, h * w_, groups, c // groups)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(b, h, w_, c)
        return (y * jax.nn.sigmoid(y)).astype(x.dtype)

    # sampler shapes: (B, H, C, flops-equivalent label)
    shapes = [(16, 256, 64), (16, 128, 128)]
    for B, H, C in shapes:
        w1 = (jax.random.normal(rng, (3, 3, C, C), jnp.float32)
              * (0.5 / np.sqrt(9 * C)))
        w2 = jnp.concatenate([w1, w1], axis=-1)  # grouped: weights tiled
        x1 = jax.random.normal(rng, (B, H, H, C), jnp.bfloat16)
        x2 = x1.reshape(B // 2, 2, H, H, C).transpose(0, 2, 3, 1, 4) \
               .reshape(B // 2, H, H, 2 * C)

        gflop = 2 * 9 * C * C * H * H * B / 1e9

        def chain(f, x0):
            @jax.jit
            def run(x):
                y = x
                for _ in range(N):
                    y = f(y)
                return jnp.sum(y.astype(jnp.float32))
            return (timeit(run, x0) - rtt) / N * 1e3

        rows = [
            ("bare conv            B%d C%d" % (B, C),
             lambda y: conv(y, w1), x1),
            ("conv+GN+swish        B%d C%d" % (B, C),
             lambda y: gn_swish(conv(y, w1), 32), x1),
            ("folded grouped conv  B%d C%d" % (B // 2, 2 * C),
             lambda y: conv(y, w2, fgc=2), x2),
            ("folded conv+GN+swish B%d C%d" % (B // 2, 2 * C),
             lambda y: gn_swish(conv(y, w2, fgc=2), 64), x2),
            ("dense conv (2x flop) B%d C%d" % (B // 2, 2 * C),
             lambda y: conv(y, jnp.concatenate([w2, w2], axis=2)[
                 :, :, : 2 * C, :], fgc=1), x2),
        ]
        for label, f, x0 in rows:
            ms = chain(f, x0)
            eff = gflop / ms  # TF/s (dense row does 2x this)
            print(f"{H}x{H} {label:34s} {ms:7.3f} ms  ~{eff:6.1f} TF/s",
                  flush=True)

    # numerics: folded grouped == plain (exactness check)
    B, H, C = 8, 64, 64
    w1 = jax.random.normal(rng, (3, 3, C, C), jnp.float32) * 0.05
    w2 = jnp.concatenate([w1, w1], axis=-1)
    x1 = jax.random.normal(rng, (B, H, H, C), jnp.bfloat16)
    x2 = x1.reshape(B // 2, 2, H, H, C).transpose(0, 2, 3, 1, 4) \
           .reshape(B // 2, H, H, 2 * C)
    y1 = gn_swish(conv(x1, w1), 32)
    y2 = gn_swish(conv(x2, w2, fgc=2), 64)
    y2u = y2.reshape(B // 2, H, H, 2, C).transpose(0, 3, 1, 2, 4) \
            .reshape(B, H, H, C)
    err = float(jnp.max(jnp.abs(y1.astype(jnp.float32)
                                - y2u.astype(jnp.float32))))
    print(f"folded-vs-plain max abs err: {err:.2e}")


if __name__ == "__main__":
    main()
