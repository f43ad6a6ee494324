"""Correctness of the fused GN->Swish->Conv3x3 Pallas kernel
(ops/fused_conv.py) against the plain XLA composition, in interpreter
mode (the real-TPU path is exercised by bench/fused scripts)."""

import contextlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from fastdiffsr_tpu.ops.fused_conv import (fused_gn_swish_conv3x3,
                                           group_stats_to_norm)
from fastdiffsr_tpu.ops.groupnorm import _gn_swish_reference


def _setup(B=2, H=16, W=16, C=32, Co=32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(C) * 0.1 + 1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, Co)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(Co) * 0.1, jnp.float32)
    stats = jnp.stack([jnp.sum(x, axis=(1, 2)),
                       jnp.sum(x * x, axis=(1, 2))], axis=1)
    return x, scale, bias, w, b, stats


def _ref_conv(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


def test_fused_full_block_matches_xla():
    G = 8
    x, scale, bias, w, b, stats = _setup()
    rng = np.random.default_rng(1)
    B, H, W, Co = x.shape[0], x.shape[1], x.shape[2], w.shape[-1]
    shift = jnp.asarray(rng.standard_normal((B, Co)) * 0.1, jnp.float32)
    res = jnp.asarray(rng.standard_normal((B, H, W, Co)) * 0.1, jnp.float32)

    xn = _gn_swish_reference(x, scale, bias, G, 1e-5)
    want = _ref_conv(xn, w, b) + shift[:, None, None, :] + res
    want_stats = jnp.stack([jnp.sum(want, axis=(1, 2)),
                            jnp.sum(want ** 2, axis=(1, 2))], axis=1)

    with pltpu.force_tpu_interpret_mode():
        y, st = fused_gn_swish_conv3x3(x, scale, bias, stats, w, b,
                                       shift=shift, res=res, groups=G)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-4)
    np.testing.assert_allclose(np.asarray(st), np.asarray(want_stats),
                               atol=3e-3)


def test_fused_plain_conv_path():
    x, _, _, w, b, _ = _setup(C=16, Co=24)
    want = _ref_conv(x, w, b)
    with pltpu.force_tpu_interpret_mode():
        y, st = fused_gn_swish_conv3x3(x, None, None, None, w, b,
                                       apply_norm=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-4)
    want_stats = jnp.stack([jnp.sum(want, axis=(1, 2)),
                            jnp.sum(want ** 2, axis=(1, 2))], axis=1)
    np.testing.assert_allclose(np.asarray(st), np.asarray(want_stats),
                               atol=3e-3)


@pytest.mark.parametrize("split", ["dy", "dydx", "pad", "rows", "padrows"])
@pytest.mark.parametrize("n_src", [1, 2])
def test_fused_split_modes_match_none(split, n_src):
    """Every im2col decomposition (incl. the lane-aligned 'pad' patch and
    the 'rows' software pipeline) is exact vs the baseline layout."""
    G = 8
    # C=64 so the pad modes actually pad (they lane-align only C >= 64
    # with C % 128 != 0)
    x, scale, bias, w, b, stats = _setup(C=64 * n_src, Co=64)
    C1 = 64 * n_src // n_src
    if n_src == 2:
        xs = (x[..., :C1], x[..., C1:])
        sts = (stats[:, :, :C1], stats[:, :, C1:])
    else:
        xs, sts = x, stats
    with pltpu.force_tpu_interpret_mode():
        want, want_st = fused_gn_swish_conv3x3(
            xs, scale, bias, sts, w, b, groups=G, split="none")
        got, got_st = fused_gn_swish_conv3x3(
            xs, scale, bias, sts, w, b, groups=G, split=split, chunks=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_st), np.asarray(want_st),
                               rtol=1e-4, atol=3e-3)


def test_group_stats_to_norm_matches_direct():
    x, *_ = _setup(C=32)
    G = 8
    B, H, W, C = x.shape
    stats = jnp.stack([jnp.sum(x, axis=(1, 2)),
                       jnp.sum(x * x, axis=(1, 2))], axis=1)
    mean_c, inv_c = group_stats_to_norm(stats, H * W, G)
    xg = x.reshape(B, H * W, G, C // G)
    m = jnp.mean(xg, axis=(1, 3))
    v = jnp.mean((xg - m[:, None, :, None]) ** 2, axis=(1, 3))
    np.testing.assert_allclose(np.asarray(mean_c),
                               np.repeat(np.asarray(m), C // G, -1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(inv_c),
                               np.asarray(jax.lax.rsqrt(v + 1e-5)).repeat(
                                   C // G, -1), atol=1e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="whole-UNet fused forward is TPU-only "
                           "(interpret mode too slow)")
def test_fused_unet_forward_matches_flax():
    from fastdiffsr_tpu.models import FastDiffSRUNet
    from fastdiffsr_tpu.models.unet_fastdiffsr_fused import fused_apply

    kw = dict(inner_channel=32, norm_groups=16, channel_mults=(1, 2),
              res_blocks=2, dropout=0.0)
    net = FastDiffSRUNet(**kw)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 6))
    lvl = jnp.asarray([0.7, 0.3], jnp.float32)
    params = net.init(rng, x[:1], lvl[:1])["params"]
    want = net.apply({"params": params}, x, lvl, deterministic=True)
    got = fused_apply(params, x, lvl, dtype=jnp.float32,
                      **{k: v for k, v in kw.items() if k != "dropout"})
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.05)
