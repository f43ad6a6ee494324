"""Fused GroupNorm + Swish for NHWC feature maps.

Every ResnetBlock in the FastDiffSR UNet starts with GroupNorm -> Swish
(reference unet.py:89-101); at T=20 sampling this runs ~2x13 times per UNet
eval and is HBM-bandwidth-bound. The Pallas kernel fuses normalization,
affine and the sigmoid gate into one VMEM pass per (batch row, group
block). The XLA path (used on CPU and as autodiff fallback) computes the
same math; XLA usually fuses it into the surrounding conv already, so the
kernel is opt-in (``use_pallas=True`` / FASTDIFFSR_TPU_PALLAS=1).

Layout note: channels last; groups are contiguous channel slices, matching
torch.nn.GroupNorm semantics so converted checkpoints behave identically.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _gn_swish_reference(x, scale, bias, groups: int, eps: float):
    """Pure-XLA GroupNorm+Swish (f32 statistics)."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(b, h, w, c)
    y = xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _gn_swish_pallas(x, scale, bias, groups: int, eps: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    cg = c // groups

    hw = h * w

    def kernel(x_ref, scale_ref, bias_ref, out_ref):
        # block is (1, H*W, C): one batch element per grid step
        xg = x_ref[:].astype(jnp.float32).reshape(hw, groups, cg)
        mean = jnp.mean(xg, axis=(0, 2), keepdims=True)
        var = jnp.mean((xg - mean) ** 2, axis=(0, 2), keepdims=True)
        xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(1, hw, c)
        y = xn * scale_ref[:].astype(jnp.float32) + \
            bias_ref[:].astype(jnp.float32)
        y = y * jax.nn.sigmoid(y)
        out_ref[:] = y.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), x.dtype),
    )(x.reshape(b, h * w, c), scale, bias).reshape(b, h, w, c)


def _pallas_enabled() -> bool:
    env = os.environ.get("FASTDIFFSR_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    return False


@functools.partial(jax.jit, static_argnames=("groups", "eps", "use_pallas"))
def group_norm_swish(x: jax.Array, scale: jax.Array, bias: jax.Array,
                     groups: int = 32, eps: float = 1e-5,
                     use_pallas: bool | None = None) -> jax.Array:
    """y = swish(group_norm(x) * scale + bias), NHWC."""
    if use_pallas is None:
        use_pallas = _pallas_enabled()
    if use_pallas and jax.default_backend() == "tpu":
        return _gn_swish_pallas(x, scale, bias, groups, eps)
    return _gn_swish_reference(x, scale, bias, groups, eps)
