"""Round 2 of the conv lab: block-diagonal batch-folding at every
sampler scale.

conv_lab.py showed XLA's conv emitter is ~2.6x more FLOP-efficient at
C>=128 than at C=64 (dense B8 C128 conv: 0.82 ms for 2x the FLOPs of
the 1.06 ms B16 C64 conv), and that fgc-grouped convs only lower well
with >=128-channel groups. So: fold 2 batch images into channels and
use DENSE block-diagonal weights (off-blocks zero) — mathematically
exact, 2x the FLOPs, but full 128 output lanes on the fast emitter.

Usage: python tools/conv_lab2.py [--chain 20] [--reps 5]
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

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def gn_swish(x, groups):
        b, h, w_, c = x.shape
        xf = x.astype(jnp.float32).reshape(b, h * w_, groups, c // groups)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(b, h, w_, c)
        return (y * jax.nn.sigmoid(y)).astype(x.dtype)

    def blockdiag(w):
        """(3,3,Ci,Co) -> (3,3,2Ci,2Co) with zero off-blocks."""
        kh, kw, ci, co = w.shape
        z = jnp.zeros_like(w)
        top = jnp.concatenate([w, z], axis=-1)
        bot = jnp.concatenate([z, w], axis=-1)
        return jnp.concatenate([top, bot], axis=2)

    def fold2(x):
        b, h, w_, c = x.shape
        return x.reshape(b // 2, 2, h, w_, c).transpose(0, 2, 3, 1, 4) \
                .reshape(b // 2, h, w_, 2 * c)

    def chain(f, x0):
        @jax.jit
        def run(x):
            y = x
            for _ in range(N):
                y = f(y)
            return jnp.sum(y.astype(jnp.float32))
        return (timeit(run, x0) - rtt) / N * 1e3

    # (B, H, Cin, Cout): sampler conv shapes (square blocks chainable)
    shapes = [(16, 256, 64, 64), (16, 128, 128, 128),
              (16, 64, 256, 256), (16, 32, 256, 256)]
    for B, H, Ci, Co in shapes:
        w1 = (jax.random.normal(rng, (3, 3, Ci, Co), jnp.float32)
              * (0.5 / np.sqrt(9 * Ci)))
        wb = blockdiag(w1)
        x1 = jax.random.normal(rng, (B, H, H, Ci), jnp.bfloat16)
        x2 = fold2(x1)
        gflop = 2 * 9 * Ci * Co * H * H * B / 1e9

        for label, f, x0 in [
            ("plain  conv+GN+swish", lambda y: gn_swish(conv(y, w1), 32),
             x1),
            ("fold2  conv+GN+swish", lambda y: gn_swish(conv(y, wb), 64),
             x2),
            ("plain  bare conv    ", lambda y: conv(y, w1), x1),
            ("fold2  bare conv    ", lambda y: conv(y, wb), x2),
        ]:
            ms = chain(f, x0)
            eff = gflop / ms
            print(f"{H:3d}x{H:<3d} C{Ci:<3d} {label} {ms:7.3f} ms "
                  f"~{eff:6.1f} TF/s(useful)", flush=True)

    # exactness at one shape
    B, H, C = 8, 64, 64
    w1 = jax.random.normal(rng, (3, 3, C, C), jnp.float32) * 0.05
    x1 = jax.random.normal(rng, (B, H, H, C), jnp.bfloat16)
    y1 = gn_swish(conv(x1, w1), 32)
    y2 = gn_swish(conv(fold2(x1), blockdiag(w1)), 64)
    y2u = y2.reshape(B // 2, H, H, 2, C).transpose(0, 3, 1, 2, 4) \
            .reshape(B, H, H, C)
    err = float(jnp.max(jnp.abs(y1.astype(jnp.float32)
                                - y2u.astype(jnp.float32))))
    print(f"fold2-blockdiag-vs-plain max abs err: {err:.2e}")


if __name__ == "__main__":
    main()
