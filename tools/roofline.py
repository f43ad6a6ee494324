"""Roofline measurement for the bench chip: achievable HBM bandwidth
(pure streaming kernel) + MXU peak (chained bf16 matmuls).

Purpose (VERDICT r1 weak #6): BASELINE.md's bandwidth-floor analysis rests
on "~190 GB/s observed everywhere" from conv-kernel traces — ~23% of the
v5e HBM spec (~819 GB/s). If a pure streaming kernel sustains much more,
the single-chip sampler hunt reopens; if not, the floor analysis holds for
this (tunneled) chip.

Method: K iterations of an elementwise triad x = x*a + b inside ONE jitted
lax.scan (unrolled=1 so every iteration materializes to HBM: 1 read + 1
write per element per iter). Dispatch overhead is amortized across K and
subtracted via a K=2x run. MXU: carry C = dot(A, C) chained matmuls.

Usage: python experiments/roofline.py  (run on the TPU; one process only)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def stream_gbps(nbytes: int, dtype, iters: int = 32):
    """Sustained streaming rate: read+write nbytes per scan iteration."""
    n = nbytes // np.dtype(dtype).itemsize
    x = jnp.ones((n,), dtype)
    coeffs = jnp.linspace(1.0, 1.0001, iters).astype(dtype)

    def run(x, coeffs):
        def body(carry, a):
            return carry * a + jnp.asarray(0.5, dtype), None
        y, _ = jax.lax.scan(body, x, coeffs, unroll=1)
        return y

    fit = jax.jit(run)
    _sync(fit(x, coeffs))  # compile
    # time at K and 2K to subtract fixed overhead
    t0 = time.time(); _sync(fit(x, coeffs)); t1 = time.time()
    coeffs2 = jnp.concatenate([coeffs, coeffs])
    fit2 = jax.jit(run)
    _sync(fit2(x, coeffs2))
    t2 = time.time(); _sync(fit2(x, coeffs2)); t3 = time.time()
    dt_iter = ((t3 - t2) - (t1 - t0)) / iters  # marginal per-iteration
    traffic = 2 * nbytes  # 1 read + 1 write
    return traffic / dt_iter / 1e9


def mxu_tflops(n: int = 8192, iters: int = 16):
    a = jnp.asarray(np.random.default_rng(0).normal(size=(n, n)) * 0.01,
                    jnp.bfloat16)
    c0 = jnp.eye(n, dtype=jnp.bfloat16)

    def run(c):
        def body(carry, _):
            nxt = jax.lax.dot(a, carry,
                              precision=jax.lax.Precision.DEFAULT)
            # rescale to keep values finite across iterations
            return (nxt * jnp.asarray(0.01, jnp.bfloat16)), None
        out, _ = jax.lax.scan(body, c, None, length=iters, unroll=1)
        return out

    fit = jax.jit(run)
    _sync(fit(c0))
    t0 = time.time(); _sync(fit(c0)); t1 = time.time()
    flops = 2 * (n ** 3) * iters
    return flops / (t1 - t0) / 1e12


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    rows = []
    for mb in (64, 256, 1024):
        for dtype in (jnp.float32, jnp.bfloat16):
            g = stream_gbps(mb * 2 ** 20, dtype)
            rows.append({"kind": "stream", "MB": mb,
                         "dtype": np.dtype(dtype).name,
                         "GBps": round(g, 1)})
            print(rows[-1])
    tf = mxu_tflops()
    rows.append({"kind": "matmul8192_bf16", "TFLOPs": round(tf, 1)})
    print(rows[-1])
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
