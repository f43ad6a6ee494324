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

from .fused_conv import group_stats_to_norm


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


def _pick_tile(hw: int, c: int, budget_bytes: int = 2 << 20) -> int:
    """Largest HW tile that divides hw and fits the f32 VMEM budget;
    prefers 8-aligned tiles, falling back to any divisor for spatial
    sizes not divisible by 8 (the old 8-step-only loop underflowed to a
    division by zero on e.g. hw=36 or 250x250 maps)."""
    cap = max(1, min(hw, budget_bytes // (4 * c)))
    for t in range(cap - cap % 8, 7, -8):
        if hw % t == 0:
            return t
    for t in range(cap, 0, -1):
        if hw % t == 0:
            return t
    return hw


def _gn_swish_pallas(x, scale, bias, groups: int, eps: float):
    """Two-pass tiled kernel. Mosaic can't reshape across the lane
    (channel) dim, so group statistics use matmuls against a
    channel->group one-hot matrix (MXU, 128-lane aligned); HW is tiled so
    blocks fit VMEM.

    pass 1: per-(batch, tile) partial sums (x, x^2) projected to groups
    pass 2: normalize + affine + swish per tile with the reduced stats
    (the tiny cross-tile reduction runs as plain XLA between the calls).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    hw = h * w
    tile = _pick_tile(hw, c)
    n_tiles = hw // tile

    xf = x.reshape(b, hw, c)

    def stats_kernel(x_ref, out_ref):
        # exact f32 VPU reductions; the tiny C->G collapse happens in
        # plain XLA outside (MXU bf16 truncation costs ~0.4% otherwise)
        xb = x_ref[0].astype(jnp.float32)                     # (tile, C)
        s1 = jnp.sum(xb, axis=0, keepdims=True)               # (1, C)
        s2 = jnp.sum(xb * xb, axis=0, keepdims=True)
        out_ref[0, 0] = jnp.concatenate([s1, s2], axis=0)     # (2, C)

    partial = pl.pallas_call(
        stats_kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 2, c),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, 2, c), jnp.float32),
    )(xf)

    sums_c = jnp.sum(partial, axis=1)                         # (b, 2, C)
    # shared sums->(mean, inv_std) collapse (includes the variance clamp
    # against f32 cancellation going negative -> NaN via rsqrt)
    mean_c, inv_c = group_stats_to_norm(sums_c, hw, groups, eps)

    # (b, 1, C) so per-batch stat blocks are (1, 1, C): Mosaic needs the
    # last-two block dims divisible by (8, 128) OR equal to the array dims
    mean_c = mean_c[:, None, :]
    inv_c = inv_c[:, None, :]

    def norm_kernel(x_ref, mean_ref, inv_ref, scale_ref, bias_ref,
                    out_ref):
        xb = x_ref[0].astype(jnp.float32)
        y = (xb - mean_ref[0]) * inv_ref[0]
        y = y * scale_ref[:].astype(jnp.float32) + \
            bias_ref[:].astype(jnp.float32)
        y = y * jax.nn.sigmoid(y)
        out_ref[0] = y.astype(out_ref.dtype)

    out = pl.pallas_call(
        norm_kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
    )(xf, mean_c, inv_c, scale, bias)
    return out.reshape(b, h, w, c)


def _pallas_enabled() -> bool:
    env = os.environ.get("FASTDIFFSR_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    return False


def channel_stats_pallas(x: jax.Array) -> jax.Array:
    """Per-channel (sum, sum-of-squares) over H,W of an NHWC map, as a
    tiled Pallas reduction: (B, H, W, C) -> (B, 2, C) f32.

    Exists because XLA's kOutput conv+reduce fusions schedule the conv
    ~2.5x slower (see BASELINE.md); a separate VMEM-tiled pass keeps the
    conv on its fast emitter. Blocks are carved from the 4D array directly
    (no host reshape -> no relayout copy).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    # tile H so a (th, W, C) f32 block stays ~2MB
    th = max(1, min(h, (2 << 20) // (4 * w * c)))
    while h % th:
        th -= 1
    n_tiles = h // th

    def kernel(x_ref, out_ref):
        xb = x_ref[0].astype(jnp.float32)              # (th, W, C)
        s1 = jnp.sum(xb, axis=(0, 1))                  # (C,)
        s2 = jnp.sum(xb * xb, axis=(0, 1))
        out_ref[0, 0] = jnp.stack([s1, s2])            # (2, C)

    partial = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 2, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, 2, c), jnp.float32),
    )(x)
    return jnp.sum(partial, axis=1)


def gn_swish_stats(x, scale, bias, groups: int, eps: float = 1e-5):
    """GroupNorm+Swish with Pallas channel stats and a reshape-free
    normalize (broadcast elementwise only, so XLA fuses it into the
    next conv's prologue instead of materializing f32)."""
    b, h, w, c = x.shape
    stats = channel_stats_pallas(x)                    # (B, 2, C)
    mean_c, inv_c = group_stats_to_norm(stats, h * w, groups, eps)
    mean_c = mean_c[:, None, None, :]
    inv_c = inv_c[:, None, None, :]
    xf = x.astype(jnp.float32)
    y = (xf - mean_c) * (inv_c * scale.astype(jnp.float32)) \
        + bias.astype(jnp.float32)
    y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def gn_swish_dot(x, scale, bias, groups: int, eps: float = 1e-5):
    """GroupNorm+Swish with MXU-contraction statistics ('dot' mode).

    Round-1 falsified every VPU-reduce separation of the conv+GN-stats
    kOutput fusion (BASELINE.md): standalone reduces on the conv's native
    layout run ~10x off the HBM roofline. This variant instead computes
    the stats as dot_generals so they land on the MXU:

    - sum(x) over (H, W): ones-matmul ``bhwc,hwk->bkc`` (k=8 columns so
      XLA emits a real matmul, not a matvec-as-reduce); products x*1 are
      exact, accumulation is f32.
    - sum(x^2): the diagonal of the Gram ``bhwc,bhwd->bcd``. For bf16
      inputs this is *exact* f32 math — bf16 x bf16 products carry <= 16
      mantissa bits, below f32's 24, and the MXU accumulates in f32 — so
      unlike truncating f32 activations to bf16 there is no stats
      precision loss vs a f32 VPU reduce of the same bf16 tensor. The
      off-diagonal FLOPs are wasted on purpose: ~C x the useful work, but
      at C<=256 that is ~8.6 GFLOP/call, ~0.1 ms of MXU time, against a
      multi-ms slow-schedule reduce.

    The normalize/affine/swish epilogue is the same elementwise chain as
    the default path, so XLA fuses it identically.
    """
    b, h, w, c = x.shape
    ones_k = jnp.ones((h, w, 8), x.dtype)
    s1 = jnp.einsum("bhwc,hwk->bkc", x, ones_k,
                    preferred_element_type=jnp.float32)[:, 0]       # (B, C)
    gram = jnp.einsum("bhwc,bhwd->bcd", x, x,
                      preferred_element_type=jnp.float32)
    s2 = jnp.diagonal(gram, axis1=1, axis2=2)                       # (B, C)
    mean_c, inv_c = group_stats_to_norm(
        jnp.stack([s1, s2], axis=1), h * w, groups, eps)
    mean_c = mean_c[:, None, None, :]
    winv_c = inv_c[:, None, None, :] * scale.astype(jnp.float32)
    y = (x.astype(jnp.float32) - mean_c) * winv_c \
        + bias.astype(jnp.float32)
    y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def gn_swish_custom(x, scale, bias, groups: int, eps: float, impl: str):
    """Differentiable wrapper for the Pallas GN+Swish variants: forward
    runs the requested kernel, backward is the VJP of the XLA reference
    formulation (the kernels themselves have no reverse-mode rule, which
    previously crashed training when FASTDIFFSR_TPU_FUSED_NORM was set)."""
    if impl == "pallas":
        return _gn_swish_pallas(x, scale, bias, groups, eps)
    return gn_swish_stats(x, scale, bias, groups, eps)


def _gn_swish_custom_fwd(x, scale, bias, groups, eps, impl):
    return gn_swish_custom(x, scale, bias, groups, eps, impl),         (x, scale, bias)


def _gn_swish_custom_bwd(groups, eps, impl, resids, g):
    x, scale, bias = resids
    _, vjp = jax.vjp(
        lambda xx, ss, bb: _gn_swish_reference(xx, ss, bb, groups, eps),
        x, scale, bias)
    return vjp(g)


gn_swish_custom.defvjp(_gn_swish_custom_fwd, _gn_swish_custom_bwd)


def default_fused_norm() -> str:
    """Model-level fused-norm mode from the environment.

    FASTDIFFSR_TPU_FUSED_NORM: '' (plain nn.GroupNorm, exact parity path),
    'xla' (f32 stats, output cast to compute dtype — one fused elementwise
    chain instead of an f32 materialization), 'pallas' (tiled VMEM kernel),
    'stats' (Pallas channel-stats pass + reshape-free XLA normalize),
    'dot' (MXU dot-contraction stats, exact for bf16 activations).
    """
    mode = os.environ.get("FASTDIFFSR_TPU_FUSED_NORM", "")
    if mode not in ("", "xla", "pallas", "stats", "dot"):
        raise ValueError(f"FASTDIFFSR_TPU_FUSED_NORM={mode!r} "
                         "(want '', 'xla', 'pallas', 'stats' or 'dot')")
    return mode


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
