"""W8A8 dynamic-quantized conv (ops/quant.py): error bounds + wiring.

Quantization is deliberately lossy, so these are tolerance tests, not
exact-parity tests: per-tensor-activation x per-channel-weight symmetric
int8 should keep the relative RMS error of a single conv at the ~1%
level on unit-scale inputs, and the whole-UNet output within a few
percent of the f32 graph — small against the diffusion sampler's own
stochasticity (quality contract checked end-to-end on a trained model,
BASELINE.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdiffsr_tpu.ops.quant import default_quant, quant_conv3


def _rel_rms(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(b ** 2)) + 1e-12)


def test_quant_conv3_error_bound():
    rng = jax.random.PRNGKey(0)
    h = jax.random.normal(rng, (2, 16, 16, 64), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(rng, 1),
                          (3, 3, 64, 32)) * 0.05
    b = jax.random.normal(jax.random.fold_in(rng, 2), (32,)) * 0.1
    want = jax.lax.conv_general_dilated(
        h, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = quant_conv3(h, k, b, jnp.float32)
    assert got.shape == want.shape
    err = _rel_rms(got, want)
    assert err < 0.02, err
    # per-channel weight scaling: scaling one output channel's weights
    # 100x must not degrade the others
    k2 = k.at[..., 0].mul(100.0)
    want2 = jax.lax.conv_general_dilated(
        h, k2, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got2 = quant_conv3(h, k2, b, jnp.float32)
    assert _rel_rms(got2[..., 1:], want2[..., 1:]) < 0.02


def test_unet_quant_tolerance_and_tree():
    """quant='w8a8' output stays within a few % relative RMS of the f32
    graph with shared params, and creates the identical parameter tree.
    Spatial sizes span the >=128 gate: at 16x16 input nothing quantizes
    (exactness), so test the gate by lowering it via a 128-sized input
    being impractical on CPU — instead check both that small inputs are
    EXACT (gate off) and that the param tree matches."""
    from fastdiffsr_tpu.models.unet_fastdiffsr import FastDiffSRUNet

    rng = jax.random.PRNGKey(3)
    kw = dict(inner_channel=16, norm_groups=8, channel_mults=(1, 2),
              res_blocks=1, dropout=0.0)
    x = jax.random.normal(rng, (2, 16, 16, 6))
    lvl = jnp.array([0.7, 0.3])
    net = FastDiffSRUNet(**kw)
    params = net.init(rng, x, lvl)
    want = net.apply(params, x, lvl)
    qnet = FastDiffSRUNet(**kw, quant="w8a8")
    got = qnet.apply(params, x, lvl)
    # 16x16 < 128 gate -> no conv quantized -> bit-identical graph
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    p2 = qnet.init(rng, x, lvl)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))

    # now a 128-wide input so the first stage actually quantizes
    x128 = jax.random.normal(rng, (1, 128, 128, 6))
    params128 = net.init(rng, x128, lvl[:1])
    want128 = net.apply(params128, x128, lvl[:1])
    got128 = qnet.apply(params128, x128, lvl[:1])
    err = _rel_rms(got128, want128)
    assert 0 < err < 0.05, err  # quantized (nonzero) but close


def test_default_quant_env(monkeypatch):
    monkeypatch.delenv("FASTDIFFSR_TPU_QUANT", raising=False)
    assert default_quant() == ""
    monkeypatch.setenv("FASTDIFFSR_TPU_QUANT", "w8a8")
    assert default_quant() == "w8a8"
    monkeypatch.setenv("FASTDIFFSR_TPU_QUANT", "int4")
    with pytest.raises(ValueError):
        default_quant()
