"""Fused GroupNorm+Swish op: XLA path vs manual math, and the Pallas kernel
in interpreter mode vs the XLA path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdiffsr_tpu.ops.groupnorm import (_gn_swish_reference,
                                          _gn_swish_pallas, group_norm_swish)


def _inputs(seed=0, b=2, h=8, w=8, c=16):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (c,)), jnp.float32)
    bias = jnp.asarray(rng.uniform(-0.3, 0.3, (c,)), jnp.float32)
    return x, scale, bias


def _manual(x, scale, bias, groups, eps=1e-5):
    b, h, w, c = x.shape
    x = np.asarray(x, np.float64)
    cg = c // groups
    xr = x.reshape(b, h * w, groups, cg)
    mean = xr.mean(axis=(1, 3), keepdims=True)
    var = xr.var(axis=(1, 3), keepdims=True)
    xn = ((xr - mean) / np.sqrt(var + eps)).reshape(b, h, w, c)
    y = xn * np.asarray(scale) + np.asarray(bias)
    return y / (1 + np.exp(-y)) * 1.0 if False else y * (1 / (1 + np.exp(-y)))


def test_xla_path_matches_manual():
    x, scale, bias = _inputs()
    got = np.asarray(_gn_swish_reference(x, scale, bias, groups=4, eps=1e-5))
    want = _manual(x, scale, bias, groups=4)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_matches_flax_groupnorm_plus_swish():
    from flax import linen as nn
    x, scale, bias = _inputs(1)
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    params = {"scale": scale, "bias": bias}
    y = gn.apply({"params": params}, x)
    want = np.asarray(y * jax.nn.sigmoid(y))
    got = np.asarray(group_norm_swish(x, scale, bias, groups=4,
                                      use_pallas=False))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_interpret_matches_xla():
    from jax.experimental.pallas import tpu as pltpu
    x, scale, bias = _inputs(2)
    want = np.asarray(_gn_swish_reference(x, scale, bias, 4, 1e-5))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_gn_swish_pallas(x, scale, bias, 4, 1e-5))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_gn_swish_module_param_compat():
    """FusedGNSwish must be a drop-in for nn.GroupNorm+swish: same param
    tree (norm/scale, norm/bias) and same output in f32."""
    import jax
    import jax.numpy as jnp
    from fastdiffsr_tpu.models.unet_fastdiffsr import FastDiffSRUNet

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 16, 6))
    lvl = jnp.ones((2,))
    kw = dict(inner_channel=32, norm_groups=16, channel_mults=(1, 2),
              res_blocks=1, dropout=0.0)
    plain = FastDiffSRUNet(**kw)
    fused = FastDiffSRUNet(**kw, fused_norm="xla")
    params = plain.init(rng, x, lvl)["params"]
    t_plain = jax.tree_util.tree_structure(params)
    t_fused = jax.tree_util.tree_structure(
        fused.init(rng, x, lvl)["params"])
    assert t_plain == t_fused
    y0 = plain.apply({"params": params}, x, lvl, deterministic=True)
    y1 = fused.apply({"params": params}, x, lvl, deterministic=True)
    assert jnp.max(jnp.abs(y0 - y1)) < 1e-4


def test_channel_stats_pallas_interpret():
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from fastdiffsr_tpu.ops.groupnorm import channel_stats_pallas

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 32)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(channel_stats_pallas(x))
    want = np.stack([np.asarray(x).sum(axis=(1, 2)),
                     (np.asarray(x) ** 2).sum(axis=(1, 2))], axis=1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_gn_swish_stats_cpu_interpret():
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from fastdiffsr_tpu.ops.groupnorm import (gn_swish_stats,
                                              _gn_swish_reference)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(32) * 0.1 + 1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(32) * 0.1, jnp.float32)
    want = np.asarray(_gn_swish_reference(x, scale, bias, 8, 1e-5))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(gn_swish_stats(x, scale, bias, 8))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_norm_modes_are_differentiable():
    """Training must work with FASTDIFFSR_TPU_FUSED_NORM set: the Pallas
    forward gets an XLA backward via custom_vjp (previously jax.grad
    raised 'Linearization failed')."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from fastdiffsr_tpu.ops.groupnorm import gn_swish_custom

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    scale = jnp.ones((16,))
    bias = jnp.zeros((16,))

    def loss(x, s, b, impl):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(gn_swish_custom(x, s, b, 4, 1e-5, impl) ** 2)

    for impl in ("pallas", "stats"):
        g = jax.grad(loss, argnums=(0, 1, 2))(x, scale, bias, impl)
        assert all(np.isfinite(np.asarray(t)).all() for t in g), impl
        # backward must match the reference formulation's grad
        from fastdiffsr_tpu.ops.groupnorm import _gn_swish_reference
        g_ref = jax.grad(lambda x, s, b: jnp.sum(
            _gn_swish_reference(x, s, b, 4, 1e-5) ** 2),
            argnums=(0, 1, 2))(x, scale, bias)
        for a, b_ in zip(g, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-4)


def test_gn_swish_dot_matches_reference():
    """'dot' mode (MXU contraction stats) must match the reference
    formulation in f32 and within one bf16 ulp in bf16."""
    from fastdiffsr_tpu.ops.groupnorm import gn_swish_dot
    x, scale, bias = _inputs(c=16)
    want = np.asarray(_gn_swish_reference(x, scale, bias, 4, 1e-5))
    got = np.asarray(gn_swish_dot(x, scale, bias, 4, 1e-5))
    np.testing.assert_allclose(got, want, atol=1e-5)
    xb = x.astype(jnp.bfloat16)
    want16 = np.asarray(
        _gn_swish_reference(xb, scale, bias, 4, 1e-5).astype(jnp.float32))
    got16 = np.asarray(
        gn_swish_dot(xb, scale, bias, 4, 1e-5).astype(jnp.float32))
    np.testing.assert_allclose(got16, want16, atol=4e-3)
    # differentiable without a custom_vjp
    g = jax.grad(lambda xx: jnp.sum(gn_swish_dot(xx, scale, bias, 4,
                                                 1e-5) ** 2))(x)
    g_ref = jax.grad(lambda xx: jnp.sum(_gn_swish_reference(
        xx, scale, bias, 4, 1e-5) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


@pytest.mark.parametrize("mode", ["d2s2", "tconv"])
def test_upsample_mode_parity(mode):
    """Reformulated Upsample ('d2s2' 2x2-phase conv + shifted interleave;
    'tconv' stride-2 transposed conv) must equal the literal nearest-x2 +
    3x3-conv formulation exactly (same params, identical tree), including
    odd sizes/borders."""
    from fastdiffsr_tpu.models.unet_fastdiffsr import Upsample

    rng = jax.random.PRNGKey(7)
    for (h, w, c) in [(8, 8, 16), (5, 7, 8)]:
        x = jax.random.normal(jax.random.fold_in(rng, h), (2, h, w, c))
        dense = Upsample(c)
        params = dense.init(jax.random.fold_in(rng, 1), x)
        want = dense.apply(params, x)
        got = Upsample(c, mode=mode).apply(params, x)
        assert want.shape == got.shape == (2, 2 * h, 2 * w, c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6)
    # and the reformulated init creates the identical parameter tree
    p2 = Upsample(8, mode=mode).init(
        rng, jnp.zeros((1, 4, 4, 8)))
    p1 = Upsample(8).init(rng, jnp.zeros((1, 4, 4, 8)))
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    assert [x.shape for x in jax.tree_util.tree_leaves(p1)] == \
           [x.shape for x in jax.tree_util.tree_leaves(p2)]


def test_unet_skip_concat_split_parity():
    """Whole-UNet forward: skip_concat='split' (GN + block1-conv +
    res_conv computed per concat part, never materializing the up-path
    concat) must match the default graph with shared params — including
    a config whose concat halves are unequal (64+128 with 32 groups:
    group size 6 does NOT divide 64, so that block must fall back to the
    literal concat)."""
    from fastdiffsr_tpu.models.unet_fastdiffsr import FastDiffSRUNet

    rng = jax.random.PRNGKey(5)
    for kw in [dict(inner_channel=16, norm_groups=8, channel_mults=(1, 2),
                    res_blocks=1, dropout=0.0),
               dict(inner_channel=64, norm_groups=32, channel_mults=(1, 2),
                    res_blocks=1, dropout=0.0)]:
        x = jax.random.normal(rng, (2, 16, 16, 6))
        lvl = jnp.array([0.7, 0.3])
        net = FastDiffSRUNet(**kw)
        params = net.init(rng, x, lvl)
        want = net.apply(params, x, lvl)
        split = FastDiffSRUNet(**kw, skip_concat="split")
        got = split.apply(params, x, lvl)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)
        # identical parameter tree from the split-side init
        p2 = split.init(rng, x, lvl)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(p2))


def test_unet_skip_concat_swap_parity():
    """skip_concat='swap' (concat([skip, x]) with params rolled inside
    the graph) must match the default graph with shared params,
    including the unequal-halves config whose 64+128 block must fall
    back (group size 6 does not divide the boundary)."""
    from fastdiffsr_tpu.models.unet_fastdiffsr import FastDiffSRUNet

    rng = jax.random.PRNGKey(9)
    for kw in [dict(inner_channel=16, norm_groups=8, channel_mults=(1, 2),
                    res_blocks=1, dropout=0.0),
               dict(inner_channel=64, norm_groups=32, channel_mults=(1, 2),
                    res_blocks=1, dropout=0.0)]:
        x = jax.random.normal(rng, (2, 16, 16, 6))
        lvl = jnp.array([0.7, 0.3])
        net = FastDiffSRUNet(**kw)
        params = net.init(rng, x, lvl)
        want = net.apply(params, x, lvl)
        swap = FastDiffSRUNet(**kw, skip_concat="swap")
        got = swap.apply(params, x, lvl)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)
        p2 = swap.init(rng, x, lvl)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(p2))


def test_unet_conv_split_parity():
    """conv_split='ups_3' (per-part block1-conv + res_conv summed at the
    skip boundary, GN untouched — exact by LINEARITY, unlike the
    GN-coupled split which is a forced no-op on the unequal 32+16 /
    128+64 concat) must match the default graph with shared params.
    ups_3 here is the small-config analogue of the paper config's
    ups_12 (first top-level up block, unequal concat)."""
    import pytest as _pytest

    from fastdiffsr_tpu.models.unet_fastdiffsr import FastDiffSRUNet

    rng = jax.random.PRNGKey(11)
    for kw in [dict(inner_channel=16, norm_groups=8, channel_mults=(1, 2),
                    res_blocks=1, dropout=0.0),
               dict(inner_channel=64, norm_groups=32, channel_mults=(1, 2),
                    res_blocks=1, dropout=0.0)]:
        x = jax.random.normal(rng, (2, 16, 16, 6))
        lvl = jnp.array([0.7, 0.3])
        net = FastDiffSRUNet(**kw)
        params = net.init(rng, x, lvl)
        want = net.apply(params, x, lvl)
        split = FastDiffSRUNet(**kw, conv_split="ups_3")
        got = split.apply(params, x, lvl)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)
        p2 = split.init(rng, x, lvl)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(p2))
    # typo'd / non-up names fail fast (a silent no-op would time the
    # baseline against itself in an A/B)
    with _pytest.raises(ValueError, match="conv_split"):
        FastDiffSRUNet(**kw, conv_split="downs_1").init(rng, x, lvl)
    with _pytest.raises(ValueError, match="conv_split"):
        FastDiffSRUNet(**kw, conv_split="ups_99").init(rng, x, lvl)


@pytest.mark.parametrize("mode", ["d2s2", "tconv"])
def test_unet_upsample_mode_parity(mode):
    """Whole-UNet forward: reformulated upsample_mode must match the
    default graph up to f32 accumulation order with shared params."""
    from fastdiffsr_tpu.models.unet_fastdiffsr import FastDiffSRUNet

    rng = jax.random.PRNGKey(3)
    kw = dict(inner_channel=16, norm_groups=8, channel_mults=(1, 2),
              res_blocks=1, dropout=0.0)
    x = jax.random.normal(rng, (2, 16, 16, 6))
    lvl = jnp.array([0.7, 0.3])
    net = FastDiffSRUNet(**kw)
    params = net.init(rng, x, lvl)
    want = net.apply(params, x, lvl)
    got = FastDiffSRUNet(**kw, upsample_mode=mode).apply(params, x, lvl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_unet_stats_barrier_identity():
    """stats_barrier='<names>' inserts optimization_barriers (a fusion cut,
    semantically the identity) into the named blocks only — outputs must be
    bit-identical and the parameter tree unchanged."""
    from fastdiffsr_tpu.models.unet_fastdiffsr import FastDiffSRUNet

    rng = jax.random.PRNGKey(11)
    kw = dict(inner_channel=16, norm_groups=8, channel_mults=(1, 2),
              res_blocks=1, dropout=0.0)
    x = jax.random.normal(rng, (2, 16, 16, 6))
    lvl = jnp.array([0.7, 0.3])
    net = FastDiffSRUNet(**kw)
    params = net.init(rng, x, lvl)
    want = net.apply(params, x, lvl)
    barred = FastDiffSRUNet(**kw, stats_barrier="ups_0,mid_0,downs_1")
    got = barred.apply(params, x, lvl)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    p2 = barred.init(rng, x, lvl)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))


def test_sampler_scan_unroll_identity(monkeypatch):
    """FASTDIFFSR_TPU_SCAN_UNROLL replicates the scan body without changing
    semantics: the sampled batch must match the unroll=1 result."""
    from fastdiffsr_tpu.diffusion import (DiffusionEngine, DiffusionSpec,
                                          ScheduleBuffers)

    engine = DiffusionEngine(
        DiffusionSpec.for_variant("fastdiffsr"),
        ScheduleBuffers.create({"schedule": "linear_cosine",
                                "n_timestep": 8,
                                "linear_start": 1e-6, "linear_end": 1e-2}))
    rng = jax.random.PRNGKey(2)
    cond = jax.random.uniform(rng, (2, 8, 8, 3), jnp.float32, -1, 1)

    def denoise(x_in, level):
        return 0.1 * x_in[..., 3:] + level[:, None, None, None] * 0.01

    want = np.asarray(engine.sample(denoise, cond, rng))
    for n in (2, 3):  # incl. a non-divisor of T=8
        monkeypatch.setenv("FASTDIFFSR_TPU_SCAN_UNROLL", str(n))
        got = np.asarray(jax.jit(
            lambda c, r: engine.sample(denoise, c, r))(cond, rng))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_scan_unroll_env_validation(monkeypatch):
    """Bad FASTDIFFSR_TPU_SCAN_UNROLL values fail with an error naming the
    env var instead of an opaque failure inside lax.scan (ADVICE r2)."""
    import pytest

    from fastdiffsr_tpu.diffusion.engine import default_scan_unroll

    for bad in ("0", "-3", "two", "1.5"):
        monkeypatch.setenv("FASTDIFFSR_TPU_SCAN_UNROLL", bad)
        with pytest.raises(ValueError, match="FASTDIFFSR_TPU_SCAN_UNROLL"):
            default_scan_unroll()
    monkeypatch.setenv("FASTDIFFSR_TPU_SCAN_UNROLL", "4")
    assert default_scan_unroll() == 4


def test_unet_stats_barrier_name_validation():
    """A stats_barrier entry that names no ResnetBlockWithAttn (typo, or a
    stem/Downsample/Upsample index) must raise, not silently no-op — a
    barrier A/B would otherwise time the baseline against itself
    (ADVICE r2)."""
    import pytest

    from fastdiffsr_tpu.models.unet_fastdiffsr import FastDiffSRUNet

    rng = jax.random.PRNGKey(0)
    kw = dict(inner_channel=16, norm_groups=8, channel_mults=(1, 2),
              res_blocks=1, dropout=0.0)
    x = jnp.zeros((1, 16, 16, 6))
    lvl = jnp.ones((1,))
    # valid names for this config: downs_1/downs_3 (downs_0 stem,
    # downs_2 Downsample), mid_0/mid_1, ups_0/ups_1/ups_3/ups_4
    # (ups_2 is the Upsample)
    FastDiffSRUNet(**kw, stats_barrier="downs_1,mid_1,ups_0").init(
        rng, x, lvl)
    for bad in ("up_12", "downs_0", "downs_2", "ups_2", "mid_2"):
        with pytest.raises(ValueError, match="stats_barrier"):
            FastDiffSRUNet(**kw, stats_barrier=bad).init(rng, x, lvl)


@pytest.mark.parametrize("mode", ["down", "all"])
def test_unet_fold_parity(mode):
    """Whole-UNet forward: fold='down'/'all' (level-0 stage batch-folded
    to 2x channels with block-diagonal kernels, tiled GN params, doubled
    group counts) must match the default graph with shared params and an
    identical parameter tree. Distinct per-sample noise levels exercise
    the folded FiLM-shift reshape; a mult-2 first level exercises the
    folded res_conv (dim != dim_out)."""
    from fastdiffsr_tpu.models.unet_fastdiffsr import FastDiffSRUNet

    rng = jax.random.PRNGKey(11)
    for kw in [dict(inner_channel=16, norm_groups=8, channel_mults=(1, 2),
                    res_blocks=1, dropout=0.0),
               dict(inner_channel=16, norm_groups=4, channel_mults=(2, 4),
                    res_blocks=2, dropout=0.0)]:
        x = jax.random.normal(rng, (4, 16, 16, 6))
        lvl = jnp.array([0.7, 0.3, 0.9, 0.1])
        net = FastDiffSRUNet(**kw)
        params = net.init(rng, x, lvl)
        want = net.apply(params, x, lvl)
        folded = FastDiffSRUNet(**kw, fold=mode)
        got = folded.apply(params, x, lvl)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)
        p2 = folded.init(rng, x, lvl)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(p2))
        assert ([a.shape for a in jax.tree_util.tree_leaves(params)]
                == [a.shape for a in jax.tree_util.tree_leaves(p2)])


def test_fold2_roundtrip_and_layout():
    from fastdiffsr_tpu.models.unet_fastdiffsr import fold2, unfold2

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 5, 7))
    f = fold2(x)
    assert f.shape == (2, 3, 5, 14)
    # per-image-contiguous: first half of the channels is image 2i
    np.testing.assert_array_equal(np.asarray(f[0, ..., :7]),
                                  np.asarray(x[0]))
    np.testing.assert_array_equal(np.asarray(f[0, ..., 7:]),
                                  np.asarray(x[1]))
    np.testing.assert_array_equal(np.asarray(unfold2(f)), np.asarray(x))


def test_fold_rejects_odd_batch_and_mode_combos():
    from fastdiffsr_tpu.models.unet_fastdiffsr import FastDiffSRUNet

    kw = dict(inner_channel=16, norm_groups=8, channel_mults=(1, 2),
              res_blocks=1, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 16, 16, 6))
    lvl = jnp.array([0.7, 0.3, 0.5])
    with pytest.raises(ValueError, match="even batch"):
        FastDiffSRUNet(**kw, fold="down").init(jax.random.PRNGKey(0), x, lvl)
    x2, lvl2 = x[:2], lvl[:2]
    with pytest.raises(ValueError, match="composes only"):
        FastDiffSRUNet(**kw, fold="down", skip_concat="split").init(
            jax.random.PRNGKey(0), x2, lvl2)
    with pytest.raises(ValueError, match="fold="):
        FastDiffSRUNet(**kw, fold="bogus").init(
            jax.random.PRNGKey(0), x2, lvl2)
