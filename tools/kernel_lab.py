"""Micro-bench the fused GN+Swish+Conv3x3 kernel variants per call shape.

Timing method: host-side ``block_until_ready`` is NOT a sync over the axon
tunnel (RTT ~23 ms, dispatches complete "instantly"), so each measurement
chains N kernel calls inside ONE jitted program (output feeds the next
input — every sampler call shape here has Co equal to one source's C, so
chaining is exact) and hard-syncs with a D2H ``np.asarray`` of a scalar.
Per-call time = (total - RTT) / N.

Usage: python tools/kernel_lab.py [--batch 16] [--chain 20] [--reps 5]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chain", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--splits", type=str, default="none,dy,dydx")
    ap.add_argument("--phase", type=str, default="all",
                    help="all|build|dot — time the patch build or the "
                         "MXU dot alone (see fused_conv docstring)")
    ap.add_argument("--chunks", type=int, default=4,
                    help="row-chunk count for the rows/padrows pipeline")
    ap.add_argument("--shapes", type=str, default="",
                    help="comma list of indices into the shape table "
                         "(default: all)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fastdiffsr_tpu.ops.fused_conv import fused_gn_swish_conv3x3

    B, N = args.batch, args.chain
    # (H, sources, Co): the sampler's fused call shapes at 256² base
    # (mults [1,2,4,4] -> channels 64,128,256,256 at 256,128,64,32 px)
    shapes = [
        (256, (64,), 64),
        (128, (128,), 128),
        (64, (256,), 256),
        (32, (256,), 256),
        (256, (64, 64), 64),     # up-block skip-concat
        (128, (128, 128), 128),
        (64, (256, 256), 256),
        (32, (256, 256), 256),
    ]
    if args.shapes:
        keep = {int(s) for s in args.shapes.split(",")}
        shapes = [s for i, s in enumerate(shapes) if i in keep]
    rng = jax.random.PRNGKey(0)

    def timeit(f, x):
        float(np.asarray(f(x)))          # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            float(np.asarray(f(x)))
        return (time.perf_counter() - t0) / args.reps

    @jax.jit
    def trivial(x):
        return jnp.sum(x[:, 0, 0, :])

    x_probe = jax.random.normal(rng, (B, 32, 32, 64), jnp.bfloat16)
    rtt = timeit(trivial, x_probe)
    print(f"RTT+D2H floor: {rtt * 1e3:.2f} ms", flush=True)

    results = {}
    for H, cs, co in shapes:
        n_src = len(cs)
        C = sum(cs)
        w = (jax.random.normal(rng, (3, 3, C, co), jnp.float32)
             * (0.5 / np.sqrt(9 * C)))
        b = jnp.zeros((co,), jnp.float32)
        gs = jnp.ones((C,), jnp.float32)
        gb = jnp.zeros((C,), jnp.float32)
        x0 = jax.random.normal(rng, (B, H, H, cs[0]), jnp.bfloat16)

        for split in args.splits.split(","):

            @jax.jit
            def run(x, _split=split, _cs=cs, _w=w, _b=b, _gs=gs, _gb=gb):
                def stats_of(z):
                    zf = z.astype(jnp.float32)
                    return jnp.stack([jnp.sum(zf, axis=(1, 2)),
                                      jnp.sum(zf * zf, axis=(1, 2))], axis=1)
                y, st = x, stats_of(x)   # chained calls then feed the
                for _ in range(N):       # kernel's OWN stats epilogue
                    xi = (y,) * len(_cs) if len(_cs) > 1 else y
                    si = (st,) * len(_cs) if len(_cs) > 1 else st
                    y, st = fused_gn_swish_conv3x3(
                        xi, _gs, _gb, si, _w, _b, groups=32,
                        want_stats=True, split=_split,
                        chunks=args.chunks, phase=args.phase)
                return jnp.sum(y.astype(jnp.float32))

            ms = (timeit(run, x0) - rtt) / N * 1e3
            label = f"{H}x{H} C={'+'.join(map(str, cs))}->{co}"
            results[(label, split)] = ms
            print(f"{label:26s} split={split:5s} {ms:8.3f} ms/call",
                  flush=True)

        # bare XLA conv3x3 on the concat, as the floor reference
        @jax.jit
        def conv_chain(x, _cs=cs, _w=w):
            y = x
            for _ in range(N):
                xin = (jnp.concatenate([y] * len(_cs), axis=-1)
                       if len(_cs) > 1 else y)
                y = jax.lax.conv_general_dilated(
                    xin, _w.astype(xin.dtype), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y.astype(jnp.float32))

        ms = (timeit(conv_chain, x0) - rtt) / N * 1e3
        print(f"{'':26s} xla conv[+cat] {ms:8.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
