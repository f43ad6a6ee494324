"""Fused-kernel inference forward for the FastDiffSR UNet.

Same math and SAME param tree as models/unet_fastdiffsr.py (reference
model/fastdiffsr_modules/unet.py:224-323), but every GroupNorm->Swish->Conv
Block executes as one Pallas kernel (ops/fused_conv.py) that also emits the
per-channel statistics the NEXT GroupNorm needs — so XLA never builds the
slow conv+stats output fusions that dominate the default path (BASELINE.md
"Where the time goes"). Inference-only (deterministic; dropout skipped,
which matches eval semantics).

Statistics flow instead of being recomputed:
- every fused block returns (y, stats_y);
- skip-concat stats are the channel-concat of the operands' stats;
- Downsample (XLA stride-2 conv) and CLAM/SLAM (32x32 maps) outputs get
  XLA-computed stats — cheap at their sizes;
- Upsample runs nearest (XLA) + fused conv (no norm) with a stats epilogue.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.fused_conv import fused_gn_swish_conv3x3
from .unet_fastdiffsr import (nearest_up2 as _nearest_up2,
                              positional_encoding as _positional_encoding)


def default_fused_split() -> str:
    """im2col decomposition for the fused blocks (FASTDIFFSR_TPU_FUSED_SPLIT
    = none|dy|dydx|pad|rows|padrows, see ops/fused_conv.py)."""
    import os
    return os.environ.get("FASTDIFFSR_TPU_FUSED_SPLIT", "none")


def _xla_stats(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    return jnp.stack([jnp.sum(xf, axis=(1, 2)),
                      jnp.sum(xf * xf, axis=(1, 2))], axis=1)


def _dense(p, x):
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _block(p, x, stats, groups, *, shift=None, res=None, want_stats=True):
    """One reference Block (GN->Swish->Conv) as a fused kernel call."""
    dt = (x[0] if isinstance(x, tuple) else x).dtype
    return fused_gn_swish_conv3x3(
        x, p["norm"]["scale"], p["norm"]["bias"], stats,
        p["conv"]["kernel"].astype(dt), p["conv"]["bias"],
        shift=shift, res=res, groups=groups, want_stats=want_stats,
        split=default_fused_split())


def _resblock(p, x, stats, noise_emb, groups):
    """ResnetBlock: block1 -> +shift -> block2 -> +skip; returns
    (out, stats_out). x/stats may be tuples (skip-concat sources consumed
    in-kernel without materializing the concat)."""
    shift = _dense(p["noise_dense"], noise_emb.astype(jnp.float32))
    h, st = _block(p["block1"], x, stats, groups, shift=shift)
    xs = x if isinstance(x, tuple) else (x,)
    if "res_conv" in p:
        xin = jnp.concatenate(xs, axis=-1) if len(xs) > 1 else xs[0]
        skip = xin @ p["res_conv"]["kernel"][0, 0].astype(xin.dtype) \
            + p["res_conv"]["bias"].astype(xin.dtype)
    else:
        skip = xs[0]
    return _block(p["block2"], h, st, groups, res=skip)


def _clam_slam(p_ca, p_sa, x):
    """CLAM channel gate then SLAM spatial gate (XLA; 32x32 maps)."""
    avg = jnp.mean(x, axis=(1, 2))
    mx = jnp.max(x, axis=(1, 2))
    fc1 = p_ca["fc1"]["kernel"].astype(x.dtype)
    fc2 = p_ca["fc2"]["kernel"].astype(x.dtype)
    out = jax.nn.relu(avg @ fc1) @ fc2 + jax.nn.relu(mx @ fc1) @ fc2
    x = jax.nn.sigmoid(out)[:, None, None, :] * x

    s = jnp.concatenate([jnp.mean(x, axis=-1, keepdims=True),
                         jnp.max(x, axis=-1, keepdims=True)], axis=-1)
    s = jax.lax.conv_general_dilated(
        s, p_sa["conv"]["kernel"].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.sigmoid(s) * x


def fused_apply(params: dict,
                x: jax.Array,
                noise_level: jax.Array,
                *,
                inner_channel: int = 64,
                norm_groups: int = 32,
                channel_mults: Sequence[int] = (1, 2, 4, 4),
                res_blocks: int = 2,
                dtype=jnp.bfloat16) -> jax.Array:
    """Drop-in inference replacement for FastDiffSRUNet.apply (same params, same
    output within bf16 tolerance). x: (B,H,W,in_channel) NHWC."""
    if noise_level.ndim == 2:
        noise_level = noise_level[:, 0]
    x = x.astype(dtype)

    t = _positional_encoding(noise_level.astype(jnp.float32), inner_channel)
    t = _dense(params["mlp_dense1"], t)
    t = t * jax.nn.sigmoid(t)
    t = _dense(params["mlp_dense2"], t)

    num_mults = len(channel_mults)
    groups = norm_groups

    idx = 0
    # stem conv: plain conv + stats epilogue
    x, stats = fused_gn_swish_conv3x3(
        x, None, None, None,
        params[f"downs_{idx}"]["kernel"].astype(dtype),
        params[f"downs_{idx}"]["bias"],
        apply_norm=False, want_stats=True, split=default_fused_split())
    idx += 1
    feats = [(x, stats)]
    for ind in range(num_mults):
        is_last = ind == num_mults - 1
        for _ in range(res_blocks):
            p = params[f"downs_{idx}"]["res_block"]
            x, stats = _resblock(p, x, stats, t, groups)
            idx += 1
            feats.append((x, stats))
        if not is_last:
            p = params[f"downs_{idx}"]
            x = jax.lax.conv_general_dilated(
                x, p["conv"]["kernel"].astype(dtype), (2, 2),
                [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) \
                + p["conv"]["bias"].astype(dtype)
            stats = _xla_stats(x)
            idx += 1
            feats.append((x, stats))

    # mid: [attn, no-attn]
    p = params["mid_0"]
    x, stats = _resblock(p["res_block"], x, stats, t, groups)
    x = _clam_slam(p["ca"], p["sa"], x)
    stats = _xla_stats(x)
    x, stats = _resblock(params["mid_1"]["res_block"], x, stats, t, groups)

    idx = 0
    for ind in reversed(range(num_mults)):
        is_last = ind < 1
        for _ in range(res_blocks + 1):
            skip, skip_stats = feats.pop()
            x, stats = _resblock(params[f"ups_{idx}"]["res_block"],
                                 (x, skip), (stats, skip_stats), t, groups)
            idx += 1
        if not is_last:
            p = params[f"ups_{idx}"]
            x, stats = fused_gn_swish_conv3x3(
                _nearest_up2(x), None, None, None,
                p["conv"]["kernel"].astype(dtype), p["conv"]["bias"],
                apply_norm=False, want_stats=True,
                split=default_fused_split())
            idx += 1

    out = _block(params["final_block"], x, stats, groups,
                 want_stats=False)
    return out.astype(jnp.float32)
