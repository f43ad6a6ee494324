"""Fused GroupNorm->Swish->3x3-Conv (+stats epilogue) Pallas kernel.

Motivation (BASELINE.md "Where the time goes"): 60% of the T=20 sampler
step is XLA kOutput fusions that attach GroupNorm statistics to a conv and
force a ~2.5x slower conv schedule. This kernel replaces the whole Block
structure (reference unet.py:89-101) for the inference path:

    y = conv3x3(swish(normalize(x))) + bias [+ per-batch shift] [+ residual]
    stats_y = per-channel (sum, sum_sq) of y over H,W   (feeds the NEXT GN)

as ONE VMEM pass per (batch, row-band):
- the 3x3 conv is an im2col matmul with contraction K = 9*C — at C=64 that
  fills the 128-lane MXU (K=576) instead of running at the ~50% lane
  ceiling of a C-contraction;
- normalize+swish happens on the row band in VMEM (no f32 HBM round-trip);
- H-halo rows come from a thin precomputed (B, nH, 2, W, C) side array of
  band-edge rows (standard BlockSpecs cannot overlap; fetching whole
  neighbor bands instead was measured 2.6x heavier on HBM reads).

Normalization statistics are PER-CHANNEL (B, 2, C) sums; the tiny
channel->group collapse + mean/rsqrt happens in XLA between kernel calls
(see group_stats_to_norm). Inference-only: no custom VJP (training keeps
the plain Flax path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def group_stats_to_norm(stats: jax.Array, hw: int, groups: int,
                        eps: float = 1e-5):
    """(B, 2, C) channel sums -> per-channel (mean, inv_std) of GroupNorm.

    ``stats`` may come from the kernel's epilogue or from
    channel_stats_pallas; ``hw`` is the spatial element count the sums
    cover.
    """
    b, _, c = stats.shape
    cg = c // groups
    cnt = float(hw * cg)
    gsum = jnp.sum(stats[:, 0].reshape(b, groups, cg), axis=-1)
    gsq = jnp.sum(stats[:, 1].reshape(b, groups, cg), axis=-1)
    mean_g = gsum / cnt
    var_g = jnp.maximum(gsq / cnt - mean_g ** 2, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, cg, axis=-1)   # (B, C)
    inv_c = jnp.repeat(inv_g, cg, axis=-1)
    return mean_c, inv_c


def _pick_th(h: int, w: int, c: int, co: int,
             budget: int = 6 << 20) -> int:
    """Row-band height such that the im2col patch buffer, its 9 staging
    parts, and the f32 accumulator fit the VMEM budget; th divides h.

    Mosaic pads the lane (last) dim to 128, so small channel counts are
    costed at their PADDED width — without this the 9 stem parts at C=6
    each occupy a full 128-lane tile and blow the scoped-vmem limit.
    """
    cp = -(-c // 128) * 128          # padded lanes of one part
    katp = -(-9 * c // 128) * 128    # padded lanes of the concat
    cop = -(-co // 128) * 128
    per_row = w * (9 * cp * 2 + katp * 2 + cop * 4)
    th = max(1, min(h, budget // max(per_row, 1)))
    while h % th:
        th -= 1
    return max(th, 1)


@functools.partial(
    jax.jit,
    static_argnames=("groups", "eps", "apply_norm", "want_stats"))
def fused_gn_swish_conv3x3(x: jax.Array,
                           gn_scale: Optional[jax.Array],
                           gn_bias: Optional[jax.Array],
                           stats_in: Optional[jax.Array],
                           w: jax.Array,
                           b: jax.Array,
                           shift: Optional[jax.Array] = None,
                           res: Optional[jax.Array] = None,
                           groups: int = 32,
                           eps: float = 1e-5,
                           apply_norm: bool = True,
                           want_stats: bool = True):
    """y [+ stats_y].

    x: (B,H,W,C) feature map. stats_in: (B,2,C) channel sums of x over
    H,W (from the producing kernel) — required when apply_norm. w:
    (3,3,C,Co) HWIO conv kernel, b: (Co,). shift: optional (B,Co) per-batch
    bias (FeatureWiseAffine). res: optional (B,H,W,Co) residual added
    before the stats epilogue. Returns y (B,H,W,Co) in x.dtype and, when
    want_stats, stats_y (B,2,Co) f32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    Co = w.shape[-1]
    th = _pick_th(H, W, C, Co)
    nH = H // th

    if apply_norm:
        mean_c, inv_c = group_stats_to_norm(stats_in, H * W, groups, eps)
        scale_eff = (inv_c * gn_scale[None, :]).astype(jnp.float32)
        bias_eff = (gn_bias[None, :]
                    - mean_c * inv_c * gn_scale[None, :]).astype(jnp.float32)
    else:  # identity prologue: y = conv(x)
        scale_eff = jnp.ones((B, C), jnp.float32)
        bias_eff = jnp.zeros((B, C), jnp.float32)
    scale_eff = scale_eff[:, None, :]   # (B,1,C) so blocks are (1,1,C)
    bias_eff = bias_eff[:, None, :]

    if shift is None:
        shift = jnp.zeros((B, Co), jnp.float32)
    shift = shift.astype(jnp.float32)[:, None, :]  # (B,1,Co)

    wmat = w.astype(x.dtype).reshape(9 * C, Co)   # (dy,dx,c) patch order
    bvec = b.astype(jnp.float32).reshape(1, Co)

    have_res = res is not None
    if not have_res:
        res = jnp.zeros((B, 1, 1, Co), x.dtype)   # dummy, never read

    # band-edge halo rows, zero at the image borders (conv zero-padding):
    # halos[:, j, 0] = x[:, j*th - 1], halos[:, j, 1] = x[:, (j+1)*th].
    # Built from thin strided row slices (2*(nH-1) rows), NOT a padded
    # copy of x — a full-x pad per call was measured to cost more than
    # the fused kernel saves.
    zrow = jnp.zeros((B, 1, W, C), x.dtype)
    inner_top = x[:, th - 1::th][:, :nH - 1] if nH > 1 else         jnp.zeros((B, 0, W, C), x.dtype)
    inner_bot = x[:, th::th][:, :nH - 1] if nH > 1 else         jnp.zeros((B, 0, W, C), x.dtype)
    top_rows = jnp.concatenate([zrow, inner_top], axis=1)   # (B, nH, W, C)
    bot_rows = jnp.concatenate([inner_bot, zrow], axis=1)
    halos = jnp.stack([top_rows, bot_rows], axis=2)  # (B, nH, 2, W, C)

    def kernel(xc_ref, halo_ref, se_ref, be_ref, sh_ref, w_ref,
               b_ref, res_ref, y_ref, st_ref):
        j = pl.program_id(1)
        nj = pl.num_programs(1)

        rows = jnp.concatenate([halo_ref[0, 0, 0][None], xc_ref[0],
                                halo_ref[0, 0, 1][None]],
                               axis=0)               # (th+2, W, C)

        xf = rows.astype(jnp.float32) * se_ref[0, 0] + be_ref[0, 0]
        if apply_norm:
            xf = xf * jax.nn.sigmoid(xf)             # swish
            # the zero halo rows at the image borders must STAY zero after
            # the affine (zero-padding applies to the normalized map)
            row_idx = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
            top_ok = jnp.logical_or(row_idx > 0, j > 0)
            bot_ok = jnp.logical_or(row_idx < th + 1, j < nj - 1)
            xf = jnp.where(jnp.logical_and(top_ok, bot_ok), xf, 0.0)
        xn = xf.astype(xc_ref.dtype)

        zcol = jnp.zeros((th + 2, 1, C), xn.dtype)
        xn = jnp.concatenate([zcol, xn, zcol], axis=1)  # (th+2, W+2, C)

        parts = []
        for dy in range(3):
            for dx in range(3):
                parts.append(
                    xn[dy:dy + th, dx:dx + W].reshape(th * W, C))
        pat = jnp.concatenate(parts, axis=-1)        # (th*W, 9C)
        acc = jax.lax.dot_general(
            pat, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (th*W, Co)
        acc = acc + b_ref[...] + sh_ref[0, 0]
        if have_res:
            acc = acc + res_ref[0].reshape(th * W, Co).astype(jnp.float32)

        y_ref[0] = acc.reshape(th, W, Co).astype(y_ref.dtype)
        if want_stats:
            s1 = jnp.sum(acc, axis=0)
            s2 = jnp.sum(acc * acc, axis=0)
            st_ref[0, 0] = jnp.stack([s1, s2])

    in_specs = [
        pl.BlockSpec((1, th, W, C), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 2, W, C), lambda i, j: (i, j, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Co), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9 * C, Co), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Co), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        (pl.BlockSpec((1, th, W, Co), lambda i, j: (i, j, 0, 0),
                      memory_space=pltpu.VMEM) if have_res else
         pl.BlockSpec((1, 1, 1, Co), lambda i, j: (i, 0, 0, 0),
                      memory_space=pltpu.VMEM)),
    ]
    out_shape = [jax.ShapeDtypeStruct((B, H, W, Co), x.dtype),
                 jax.ShapeDtypeStruct((B, nH, 2, Co), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, th, W, Co), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 2, Co), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    y, partial = pl.pallas_call(
        kernel,
        grid=(B, nH),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, halos, scale_eff, bias_eff, shift, wmat, bvec, res)

    if want_stats:
        return y, jnp.sum(partial, axis=1)
    return y
