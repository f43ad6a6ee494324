"""Upsample-block lab: exact alternatives to nearest-x2 + 3x3 conv.

The sampler's three Upsample blocks (paper config, batch 16) run at
32² C256, 64² C256, 128² C128. Variants (all mathematically identical,
see unet_fastdiffsr.Upsample):

  dense  nearest_up2 then dense 3x3 SAME conv (the literal form)
  d2s2   2x2-phase VALID conv on the padded low-res input (4*C out
         channels) + shifted-slice interleave (2.25x fewer MACs)
  tconv  stride-2 transposed conv: lhs_dilation=(2,2), 4x4 kernel built
         from the 3x3 by the phase row/col sums [w0, w0+w1, w1+w2, w2]
         (XLA-native, no interleave epilogue; now the shipped default)

Parity coverage: tests/test_ops.py::test_upsample_mode_parity.

Timing: N chained calls inside one jitted program (scalar data
dependence links the 2x-size output back to the fixed input), hard
D2H sync, RTT-subtracted — per tools/kernel_lab.py (host
block_until_ready is not a sync over the axon tunnel).

Usage: python tools/ups_lab.py [--chain 10] [--reps 5] [--batch 16]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    N = args.chain

    import jax
    import jax.numpy as jnp

    from fastdiffsr_tpu.models.unet_fastdiffsr import (
        _upsample_phase_kernel, _upsample_tconv_kernel, nearest_up2)

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

    tconv_kernel = _upsample_tconv_kernel  # time the SHIPPED builder

    def dense(x, w):
        return jax.lax.conv_general_dilated(
            nearest_up2(x), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def d2s2(x, w):
        co = w.shape[-1]
        k2 = _upsample_phase_kernel(w)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        z = jax.lax.conv_general_dilated(
            xp, k2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b_, h1, w1, _ = z.shape
        h, wd = h1 - 1, w1 - 1
        y = jnp.stack([z[:, :-1, :-1, :co], z[:, :-1, 1:, co:2 * co],
                       z[:, 1:, :-1, 2 * co:3 * co], z[:, 1:, 1:, 3 * co:]],
                      axis=-2)
        y = y.reshape(b_, h, wd, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b_, 2 * h, 2 * wd, co)

    def tconv(x, w):
        return jax.lax.conv_general_dilated(
            x, tconv_kernel(w), (1, 1), ((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    for (H, C) in [(32, 256), (64, 256), (128, 128)]:
        x0 = jax.random.normal(jax.random.fold_in(rng, H),
                               (args.batch, H, H, C), jnp.bfloat16)
        w = (jax.random.normal(jax.random.fold_in(rng, C), (3, 3, C, C))
             * 0.05).astype(jnp.bfloat16)

        # parity check once per shape (f32 on-host compare, loose for bf16)
        yd = np.asarray(dense(x0, w), np.float32)
        for nm, f in [("d2s2", d2s2), ("tconv", tconv)]:
            ya = np.asarray(f(x0, w), np.float32)
            err = np.max(np.abs(ya - yd))
            assert err < 0.15, (nm, H, C, err)

        # NB a scalar y[0,0,0,0] link is NOT enough: XLA slice-propagates
        # it back through the conv and each call collapses to one dot.
        # jnp.sum consumes every element (uniform ~read-of-y overhead per
        # call across variants); the running sum links iterations.
        for nm, f in [("dense", dense), ("d2s2", d2s2), ("tconv", tconv)]:
            def chain(x, _w=w, _f=f):
                s = jnp.float32(0)
                for _ in range(N):
                    y = _f(x * (1 + s * 1e-12).astype(x.dtype), _w)
                    s = s + jnp.sum(y.astype(jnp.float32)) * 1e-9
                return s
            ms = (timeit(jax.jit(chain), x0) - rtt) / N * 1e3
            print(f"B{args.batch} {H:4d}² C{C:<4d} {nm:6s} "
                  f"{ms:8.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
