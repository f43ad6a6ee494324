"""FastDiffSR denoiser UNet in Flax (NHWC, f32 params / selectable compute
dtype).

Topology parity target: reference model/fastdiffsr_modules/unet.py:224-323 —
an SR3-style conditional UNet whose attention is the lightweight CLAM/SLAM
channel+spatial gates (unet.py:123-173) applied only in the first mid block
(unet.py:274-279; the per-level ``use_attn`` is hardcoded False at
unet.py:261,284, and the full SelfAttention at unet.py:175 is dead code — we
deliberately do not instantiate it here).

Submodule naming mirrors the torch module tree index-for-index
(downs_0..downs_N, mid_0, mid_1, ups_0..ups_M, final_block) so checkpoint
conversion (models/convert.py) is a mechanical key rewrite. The reference's
``ResnetBlocWithAttn.conv`` 1x1 (unet.py:212) is defined but never called in
its forward — it is dead weight and is not recreated here.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def swish(x):
    return x * jax.nn.sigmoid(x)


class FusedGNSwish(nn.Module):
    """swish(GroupNorm(x)) as one fused op (ops/groupnorm.py).

    Parameter names/shapes ('scale', 'bias' of (C,)) match nn.GroupNorm so
    converted checkpoints load identically; instantiated under the same
    'norm' scope. mode: 'xla' (f32 stats, output in x.dtype) or 'pallas'
    (tiled VMEM kernel on TPU).
    """

    groups: int
    mode: str = "xla"
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        from ..ops.groupnorm import (_gn_swish_reference, gn_swish_custom,
                                     gn_swish_dot)
        on_tpu = jax.default_backend() == "tpu"
        if self.mode in ("pallas", "stats") and on_tpu:
            # custom_vjp: forward = Pallas kernel, backward = XLA formula,
            # so training with FASTDIFFSR_TPU_FUSED_NORM set still works
            return gn_swish_custom(x, scale, bias, self.groups, self.eps,
                                   self.mode)
        if self.mode == "dot" and on_tpu:
            # pure XLA, differentiable as-is (no custom_vjp needed)
            return gn_swish_dot(x, scale, bias, self.groups, self.eps)
        # call the impl unjitted so XLA can fuse it with neighboring convs
        return _gn_swish_reference(x, scale, bias, self.groups, self.eps)


def positional_encoding(noise_level: jax.Array, dim: int) -> jax.Array:
    """WaveGrad sinusoidal encoding of a continuous noise level
    (reference unet.py:22-35). noise_level: (B,) -> (B, dim)."""
    count = dim // 2
    step = jnp.arange(count, dtype=noise_level.dtype) / count
    enc = noise_level[:, None] * jnp.exp(-math.log(1e4) * step)[None, :]
    return jnp.concatenate([jnp.sin(enc), jnp.cos(enc)], axis=-1)


class _GNParams(nn.Module):
    """GroupNorm parameter holder: same tree path/shapes/init as the
    ``nn.GroupNorm`` it replaces ('scale'/'bias' of (C,))."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return scale, bias


class Block(nn.Module):
    """GroupNorm -> Swish -> Dropout -> 3x3 Conv (reference unet.py:89-101).

    ``x`` may be a 2-tuple ``(a, b)`` meaning the channel-concat of the
    parts without materializing it: GroupNorm over a concat is exactly
    separable per part when the group size divides each part's width
    (every group then lies wholly inside one part), and
    conv(concat(a,b), W) = conv(a, W[:, :, :ca]) + conv(b, W[:, :, ca:]).
    Same parameter tree either way. With dropout active the two parts
    draw independent masks (distributionally equivalent to the concat
    formulation, bit-different); parity tests run deterministic."""

    dim_out: int
    groups: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    fused_norm: str = ""
    quant: str = ""  # '' or 'w8a8' (wide stages only; ops/quant.py)
    # >0: the graph input is concat([skip, x]) while params are stored
    # for [x, skip]; roll params by in_perm channels (exact when the GN
    # group size divides the boundary — skip_concat='swap')
    in_perm: int = 0
    # >0: compute ONLY the conv as two per-part convs summed, split at
    # this input-channel index — GroupNorm stays over the full tensor, so
    # this is exact by linearity regardless of group size (unlike the
    # skip_concat='split' form, whose GN-split precondition FAILS on
    # ups_12: g=192/32=6 does not divide the 128-channel part boundary,
    # making r2's global split a no-op on exactly the anomalous block).
    # Probes the slow-emitter anomaly: each part's contraction (128, 64)
    # packs lanes without the 192->256 padding of the monolithic conv.
    csplit: int = 0
    # x arrives fold2-folded ((B/2,H,W,2C) per-image-contiguous); params
    # stay unfolded, applied tiled/block-diagonally — exact (see fold2)
    fold: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.fold:
            from ..ops.groupnorm import _gn_swish_reference
            c = x.shape[-1] // 2
            scale, bias = _GNParams(c, name="norm")()
            kernel, kbias = _Conv3Params(self.dim_out, c, name="conv")()
            # per-image GN: 2x groups over 2C, params tiled — every group
            # lies wholly inside one image's contiguous half
            h = _gn_swish_reference(x, jnp.tile(scale, 2),
                                    jnp.tile(bias, 2),
                                    2 * self.groups, 1e-5)
            if self.dropout > 0:
                h = nn.Dropout(rate=self.dropout,
                               deterministic=deterministic)(h)
            return jax.lax.conv_general_dilated(
                h.astype(self.dtype),
                _blockdiag2(kernel).astype(self.dtype),
                (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + jnp.tile(kbias, 2).astype(self.dtype)
        if self.in_perm:
            from ..ops.groupnorm import _gn_swish_reference
            dim = x.shape[-1]
            scale, bias = _GNParams(dim, name="norm")()
            kernel, kbias = _Conv3Params(self.dim_out, dim, name="conv")()
            h = _gn_swish_reference(x, jnp.roll(scale, self.in_perm),
                                    jnp.roll(bias, self.in_perm),
                                    self.groups, 1e-5)
            if self.dropout > 0:
                h = nn.Dropout(rate=self.dropout,
                               deterministic=deterministic)(h)
            return jax.lax.conv_general_dilated(
                h.astype(self.dtype),
                jnp.roll(kernel, self.in_perm, axis=2).astype(self.dtype),
                (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + kbias.astype(self.dtype)
        if isinstance(x, tuple):
            from ..ops.groupnorm import _gn_swish_reference
            a, b = x
            ca, cb = a.shape[-1], b.shape[-1]
            dim = ca + cb
            g = dim // self.groups
            scale, bias = _GNParams(dim, name="norm")()
            kernel, kbias = _Conv3Params(self.dim_out, dim, name="conv")()
            ha = _gn_swish_reference(a, scale[:ca], bias[:ca], ca // g, 1e-5)
            hb = _gn_swish_reference(b, scale[ca:], bias[ca:], cb // g, 1e-5)
            if self.dropout > 0:
                ha = nn.Dropout(rate=self.dropout,
                                deterministic=deterministic)(ha)
                hb = nn.Dropout(rate=self.dropout,
                                deterministic=deterministic)(hb)
            dn = ("NHWC", "HWIO", "NHWC")
            ya = jax.lax.conv_general_dilated(
                ha.astype(self.dtype), kernel[:, :, :ca].astype(self.dtype),
                (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
            yb = jax.lax.conv_general_dilated(
                hb.astype(self.dtype), kernel[:, :, ca:].astype(self.dtype),
                (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
            return ya + yb + kbias.astype(self.dtype)
        if self.fused_norm:
            h = FusedGNSwish(self.groups, mode=self.fused_norm,
                             name="norm")(x)
        else:
            h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                             name="norm")(x)
            h = swish(h)
        if self.dropout > 0:
            h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        if self.csplit:
            kernel, kbias = _Conv3Params(self.dim_out, h.shape[-1],
                                         name="conv")()
            c, dn = self.csplit, ("NHWC", "HWIO", "NHWC")
            return (jax.lax.conv_general_dilated(
                        h[..., :c].astype(self.dtype),
                        kernel[:, :, :c].astype(self.dtype),
                        (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
                    + jax.lax.conv_general_dilated(
                        h[..., c:].astype(self.dtype),
                        kernel[:, :, c:].astype(self.dtype),
                        (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
                    + kbias.astype(self.dtype))
        # int8 only where the MXU win exists (>=128² spatial; int8_lab)
        if self.quant in ("w8a8", "w8a8s") and h.shape[1] >= 128:
            from ..ops.quant import quant_conv3
            kernel, kbias = _Conv3Params(self.dim_out, h.shape[-1],
                                         name="conv")()
            return quant_conv3(h, kernel, kbias, self.dtype,
                               static_scale=self.quant == "w8a8s")
        h = nn.Conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(h)
        return h


class ResnetBlock(nn.Module):
    """block1 -> +noise-embedding shift -> block2 + 1x1 skip
    (reference unet.py:104-120; FeatureWiseAffine additive mode,
    unet.py:38-54).

    ``stats_barrier``: place a jax.lax.optimization_barrier between
    block1's conv output and block2's GroupNorm, preventing XLA's
    conv+output-stats kOutput fusion for THIS block only (semantically
    the identity). Probes the single-block form of the slow-emitter
    anomaly (BASELINE.md: ups_12/block1 picks EmitOutputBatchInSublanes
    at ~2x its siblings' time; global and C>128-wide barriers were
    falsified in r1, this targets one block)."""

    dim: int
    dim_out: int
    dropout: float = 0.0
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    fused_norm: str = ""
    quant: str = ""
    in_perm: int = 0
    fold: bool = False
    stats_barrier: bool = False
    csplit: int = 0  # conv-only per-part split of block1 + res_conv

    @nn.compact
    def __call__(self, x, noise_emb, *, deterministic: bool = True):
        h = Block(self.dim_out, groups=self.groups, dtype=self.dtype,
                  fused_norm=self.fused_norm, quant=self.quant,
                  in_perm=self.in_perm, fold=self.fold, csplit=self.csplit,
                  name="block1")(x, deterministic=deterministic)
        shift = nn.Dense(self.dim_out, dtype=self.dtype,
                         name="noise_dense")(noise_emb)
        if self.fold:
            # folded layout: image 2i's shift then image 2i+1's
            shift = shift.reshape(shift.shape[0] // 2, 2 * self.dim_out)
        h = h + shift[:, None, None, :]
        if self.stats_barrier:
            h = jax.lax.optimization_barrier(h)
        h = Block(self.dim_out, groups=self.groups, dropout=self.dropout,
                  dtype=self.dtype, fused_norm=self.fused_norm,
                  quant=self.quant, fold=self.fold,
                  name="block2")(h, deterministic=deterministic)
        if self.fold:
            if self.dim != self.dim_out:
                kernel, kbias = _Conv3Params(self.dim_out, self.dim,
                                             ksize=1, name="res_conv")()
                x = jax.lax.conv_general_dilated(
                    x.astype(self.dtype),
                    _blockdiag2(kernel).astype(self.dtype),
                    (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")
                ) + jnp.tile(kbias, 2).astype(self.dtype)
            return h + x
        if self.in_perm:
            kernel, kbias = _Conv3Params(self.dim_out, self.dim,
                                         ksize=1, name="res_conv")()
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                jnp.roll(kernel, self.in_perm, axis=2).astype(self.dtype),
                (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + kbias.astype(self.dtype)
            return h + x
        if isinstance(x, tuple):
            # split-skip form (see Block): the 1x1 residual conv on the
            # unmaterialized concat is the sum of per-part 1x1 convs
            a, b = x
            ca = a.shape[-1]
            if self.dim != self.dim_out:
                kernel, kbias = _Conv3Params(self.dim_out, self.dim,
                                             ksize=1, name="res_conv")()
                dn = ("NHWC", "HWIO", "NHWC")
                x = (jax.lax.conv_general_dilated(
                        a.astype(self.dtype),
                        kernel[:, :, :ca].astype(self.dtype),
                        (1, 1), "VALID", dimension_numbers=dn)
                     + jax.lax.conv_general_dilated(
                        b.astype(self.dtype),
                        kernel[:, :, ca:].astype(self.dtype),
                        (1, 1), "VALID", dimension_numbers=dn)
                     + kbias.astype(self.dtype))
            else:
                x = jnp.concatenate([a, b], axis=-1)
            return h + x
        if self.dim != self.dim_out:
            if self.csplit:
                kernel, kbias = _Conv3Params(self.dim_out, self.dim,
                                             ksize=1, name="res_conv")()
                c, dn = self.csplit, ("NHWC", "HWIO", "NHWC")
                x = (jax.lax.conv_general_dilated(
                         x[..., :c].astype(self.dtype),
                         kernel[:, :, :c].astype(self.dtype),
                         (1, 1), "VALID", dimension_numbers=dn)
                     + jax.lax.conv_general_dilated(
                         x[..., c:].astype(self.dtype),
                         kernel[:, :, c:].astype(self.dtype),
                         (1, 1), "VALID", dimension_numbers=dn)
                     + kbias.astype(self.dtype))
            else:
                x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype,
                            name="res_conv")(x)
        return h + x


class CLAM(nn.Module):
    """Channel attention gate: shared MLP over Avg- and Max-pooled channel
    vectors, sigmoid gate (reference unet.py:123-149, CBAM-style)."""

    channels: int
    ratio: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=(1, 2))          # (B, C)
        mx = jnp.max(x, axis=(1, 2))            # (B, C)
        fc1 = nn.Dense(self.channels // self.ratio, use_bias=False,
                       dtype=self.dtype, name="fc1")
        fc2 = nn.Dense(self.channels, use_bias=False, dtype=self.dtype,
                       name="fc2")
        out = fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx)))
        gate = jax.nn.sigmoid(out)[:, None, None, :]
        return gate * x


class SLAM(nn.Module):
    """Spatial attention gate: 7x7 conv over [chan-mean, chan-max], sigmoid
    gate (reference unet.py:151-173)."""

    kernel_size: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        s = jnp.concatenate([avg, mx], axis=-1)
        k = self.kernel_size
        s = nn.Conv(1, (k, k), padding=k // 2, use_bias=False,
                    dtype=self.dtype, name="conv")(s)
        return jax.nn.sigmoid(s) * x


class ResnetBlockWithAttn(nn.Module):
    """ResnetBlock optionally followed by CLAM then SLAM
    (reference unet.py:206-222)."""

    dim: int
    dim_out: int
    dropout: float = 0.0
    groups: int = 32
    with_attn: bool = False
    dtype: jnp.dtype = jnp.float32
    fused_norm: str = ""
    quant: str = ""
    in_perm: int = 0
    fold: bool = False
    stats_barrier: bool = False
    csplit: int = 0

    @nn.compact
    def __call__(self, x, noise_emb, *, deterministic: bool = True):
        assert not (self.fold and self.with_attn), \
            "fold is only applied at attention-free levels"
        x = ResnetBlock(self.dim, self.dim_out, dropout=self.dropout,
                        groups=self.groups, dtype=self.dtype,
                        fused_norm=self.fused_norm, quant=self.quant,
                        in_perm=self.in_perm, fold=self.fold,
                        stats_barrier=self.stats_barrier,
                        csplit=self.csplit,
                        name="res_block")(x, noise_emb,
                                          deterministic=deterministic)
        if self.with_attn:
            x = CLAM(self.dim_out, dtype=self.dtype, name="ca")(x)
            x = SLAM(dtype=self.dtype, name="sa")(x)
        return x


class Downsample(nn.Module):
    """Stride-2 3x3 conv (reference unet.py:77-83)."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    fold: bool = False

    @nn.compact
    def __call__(self, x):
        if self.fold:
            kernel, kbias = _Conv3Params(self.dim, x.shape[-1] // 2,
                                         name="conv")()
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                _blockdiag2(kernel).astype(self.dtype),
                (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + jnp.tile(kbias, 2).astype(self.dtype)
        return nn.Conv(self.dim, (3, 3), strides=2, padding=1,
                       dtype=self.dtype, name="conv")(x)


def fold2(x: jax.Array) -> jax.Array:
    """Fold batch pairs into channels: (B,H,W,C) -> (B/2,H,W,2C) with a
    per-image-contiguous channel layout (channels [0:C] = image 2i,
    [C:2C] = image 2i+1). With block-diagonal kernels and doubled
    GroupNorm group counts, every folded op computes exactly the
    unfolded math while XLA's conv emitter sees a 2x-wider channel dim,
    where it is measurably more FLOP-efficient (tools/conv_lab.py; the
    VERDICT-r2 batch-folding lever)."""
    b, h, w, c = x.shape
    return x.reshape(b // 2, 2, h, w, c).transpose(0, 2, 3, 1, 4) \
            .reshape(b // 2, h, w, 2 * c)


def unfold2(y: jax.Array) -> jax.Array:
    """Inverse of :func:`fold2`."""
    b2, h, w, c2 = y.shape
    c = c2 // 2
    return y.reshape(b2, h, w, 2, c).transpose(0, 3, 1, 2, 4) \
            .reshape(b2 * 2, h, w, c)


def _blockdiag2(kernel: jax.Array) -> jax.Array:
    """(kh,kw,ci,co) HWIO kernel -> (kh,kw,2ci,2co) block-diagonal: folded
    image A reads only A's channels, B only B's. The zero off-blocks
    double the raw MACs; the bet (conv_lab) is that the wide-channel
    emitter's efficiency more than pays for them."""
    z = jnp.zeros_like(kernel)
    top = jnp.concatenate([kernel, z], axis=3)
    bot = jnp.concatenate([z, kernel], axis=3)
    return jnp.concatenate([top, bot], axis=2)


def nearest_up2(x: jax.Array) -> jax.Array:
    """Exact 2x nearest upsample as broadcast+reshape (no gather ops —
    cheaper for XLA than jax.image.resize on TPU)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class _Conv3Params(nn.Module):
    """Bare KxK-conv parameter holder: same tree path/shapes/init as the
    ``nn.Conv(dim, (K,K))`` it replaces, so converted checkpoints load
    identically whichever mode runs the math."""

    features: int
    in_features: int
    ksize: int = 3

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.ksize, self.ksize,
                             self.in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


def _upsample_phase_kernel(w: jax.Array) -> jax.Array:
    """Collapse a 3x3 kernel ``w`` (HWIO) into the four 2x2 phase kernels
    of the exact nearest-x2+conv3 decomposition, concatenated on the
    output-channel axis in phase order (a,b) = 00,01,10,11.

    Derivation: y[2i+a, 2j+b] = sum_{di,dj} w[di+1,dj+1] *
    x[floor((2i+a+di)/2), floor((2j+b+dj)/2)] — for a=0 the row taps are
    {i-1: w0, i: w1+w2}; for a=1 they are {i: w0+w1, i+1: w2} (same for
    columns), i.e. each phase is a 2x2 conv over the low-res input."""
    r0 = jnp.stack([w[0], w[1] + w[2]], axis=0)          # (2,3,ci,co)
    r1 = jnp.stack([w[0] + w[1], w[2]], axis=0)
    def colc(k, b):
        if b == 0:
            return jnp.stack([k[:, 0], k[:, 1] + k[:, 2]], axis=1)
        return jnp.stack([k[:, 0] + k[:, 1], k[:, 2]], axis=1)
    return jnp.concatenate(
        [colc(r0, 0), colc(r0, 1), colc(r1, 0), colc(r1, 1)],
        axis=-1)                                          # (2,2,ci,4co)


def _upsample_tconv_kernel(w: jax.Array) -> jax.Array:
    """Collapse a 3x3 kernel (HWIO) into the 4x4 stride-2 transposed-conv
    kernel of the exact nearest-x2+conv3 decomposition. Per axis the four
    taps are [w0, w0+w1, w1+w2, w2]: output row 2i+a with lhs_dilation=2,
    padding=2 reads x[(2i+a+s-2)/2] at even (a=0: s∈{0,2}) or odd
    (a=1: s∈{1,3}) taps — matching the phase sums of
    ``_upsample_phase_kernel``."""
    rows = jnp.stack([w[0], w[0] + w[1], w[1] + w[2], w[2]], axis=0)
    return jnp.stack([rows[:, 0], rows[:, 0] + rows[:, 1],
                      rows[:, 1] + rows[:, 2], rows[:, 2]], axis=1)


class Upsample(nn.Module):
    """Nearest x2 then 3x3 conv (reference unet.py:66-74).

    Two exact reformulations that never materialize the 4x-size
    nearest-upsampled tensor (tests/test_ops.py::test_upsample_*_parity):

    mode 'd2s2': one 2x2-kernel VALID conv on the 1px-padded low-res
    input producing 4*dim phase channels, then a shifted interleave
    (2.25x fewer MACs but the interleave epilogue is relayout-heavy).

    mode 'tconv': a stride-2 transposed conv — lhs_dilation=(2,2) with a
    4x4 kernel built from the 3x3 by per-axis phase sums. XLA-native, no
    epilogue; measured 2.7-2.9x faster than the dense formulation in
    isolation (tools/ups_lab.py)."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    mode: str = ""

    @nn.compact
    def __call__(self, x):
        if self.mode == "":
            return nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                           name="conv")(nearest_up2(x))
        kernel, bias = _Conv3Params(self.dim, x.shape[-1], name="conv")()
        return apply_upsample2_conv3(x, kernel, bias, self.mode, self.dtype)


def apply_upsample2_conv3(x, kernel, bias, mode: str, dtype) -> jax.Array:
    """nearest-x2 + 3x3-conv given the raw (3,3,ci,co) HWIO kernel and
    (co,) bias, computed in the chosen exact formulation ('tconv',
    'd2s2', or '' for the literal dense form) — see Upsample."""
    if mode == "":
        y = jax.lax.conv_general_dilated(
            nearest_up2(x).astype(dtype), kernel.astype(dtype), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(dtype)
    if mode == "tconv":
        k4 = _upsample_tconv_kernel(kernel).astype(dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), k4, window_strides=(1, 1),
            padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(dtype)
    assert mode == "d2s2", mode
    co = kernel.shape[-1]
    k2 = _upsample_phase_kernel(kernel).astype(dtype)
    xp = jnp.pad(x.astype(dtype),
                 ((0, 0), (1, 1), (1, 1), (0, 0)))
    z = jax.lax.conv_general_dilated(
        xp, k2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))   # (b,h+1,w+1,4co)
    b_, h1, w1, _ = z.shape
    h, w = h1 - 1, w1 - 1
    # y[2i+a, 2j+b] = z[i+a, j+b, phase(a,b)]
    z00 = z[:, :-1, :-1, :co]
    z01 = z[:, :-1, 1:, co:2 * co]
    z10 = z[:, 1:, :-1, 2 * co:3 * co]
    z11 = z[:, 1:, 1:, 3 * co:]
    y = jnp.stack([z00, z01, z10, z11], axis=-2)      # (b,h,w,4,co)
    y = y.reshape(b_, h, w, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(b_, 2 * h, 2 * w, co)
    return y + bias.astype(dtype)


class FastDiffSRUNet(nn.Module):
    """The FastDiffSR conditional UNet (reference unet.py:224-323).

    Default hyperparameters match config/sr_fastdiffsr_train_64_256.json:42-57
    (inner 64, mults [1,2,4,4], 2 res blocks, dropout 0.2, groups 32).
    Input x: (B,H,W,in_channel) = concat(bicubic-cond, noisy) along channels;
    noise_level: (B,) continuous sqrt-alpha-cumprod scalar per sample.
    """

    in_channel: int = 6
    out_channel: int = 3
    inner_channel: int = 64
    norm_groups: int = 32
    channel_mults: Sequence[int] = (1, 2, 4, 4)
    res_blocks: int = 2
    dropout: float = 0.2
    with_noise_level_emb: bool = True
    dtype: jnp.dtype = jnp.float32
    fused_norm: str = ""
    upsample_mode: str = ""
    skip_concat: str = ""
    quant: str = ""
    # batch-fold the widest-spatial level (level 0) to 2x channels:
    # '' (off), 'down' (stem + level-0 down blocks + first Downsample),
    # 'all' (also level-0 up blocks + final block). Exact (see fold2);
    # requires an even batch and no fused_norm/quant/skip_concat mode.
    fold: str = ""
    # comma-separated ResnetBlockWithAttn names ('ups_12,mid_0', ...) whose
    # block1-conv -> block2-GN-stats fusion is cut with an
    # optimization_barrier (exact identity; see ResnetBlock.stats_barrier)
    stats_barrier: str = ""
    # comma-separated UP-path block names ('ups_12', ...) whose block1
    # conv + res_conv are computed as per-part convs summed at the
    # [x, skip] concat boundary — GN untouched, exact by linearity for
    # ANY group size (see Block.csplit). Targets the ups_12 slow-emitter
    # anomaly, which the GN-coupled skip_concat='split' mode cannot reach.
    conv_split: str = ""

    def _resblock_names(self) -> frozenset:
        """Names of every ResnetBlockWithAttn this config instantiates
        (the only valid ``stats_barrier`` targets). Mirrors the index
        arithmetic of ``__call__``: the down path interleaves the stem conv
        (downs_0) and Downsample modules into the same counter; the up path
        interleaves Upsample modules."""
        names = {"mid_0", "mid_1"}
        num_mults = len(self.channel_mults)
        idx = 1  # downs_0 is the stem conv
        for ind in range(num_mults):
            for _ in range(self.res_blocks):
                names.add(f"downs_{idx}")
                idx += 1
            if ind != num_mults - 1:
                idx += 1  # Downsample
        idx = 0
        for ind in reversed(range(num_mults)):
            for _ in range(self.res_blocks + 1):
                names.add(f"ups_{idx}")
                idx += 1
            if ind >= 1:
                idx += 1  # Upsample
        return frozenset(names)

    @nn.compact
    def __call__(self, x: jax.Array, noise_level: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        if self.skip_concat not in ("", "split", "swap"):
            raise ValueError(
                f"skip_concat={self.skip_concat!r} "
                "(want '', 'split' or 'swap')")
        barrier_set = frozenset(
            s for s in self.stats_barrier.split(",") if s)
        csplit_set = frozenset(
            s for s in self.conv_split.split(",") if s)
        bad = {s for s in csplit_set
               if not s.startswith("ups_") or s not in self._resblock_names()}
        if bad:
            raise ValueError(
                f"conv_split names {sorted(bad)} do not name up-path "
                "ResnetBlockWithAttn instances (only ups_* blocks have a "
                "skip-concat boundary to split at)")
        if csplit_set and (self.quant or self.fold or self.skip_concat):
            raise ValueError(
                "conv_split composes only with the default quant/fold/"
                "skip_concat modes")
        unknown = barrier_set - self._resblock_names()
        if unknown:
            # a typo'd name ('up_12') or a stem/Downsample/Upsample index
            # would otherwise be a silent no-op — a barrier A/B would time
            # the baseline against itself (ADVICE r2)
            raise ValueError(
                f"stats_barrier names {sorted(unknown)} do not name "
                f"ResnetBlockWithAttn instances; valid: "
                f"{sorted(self._resblock_names())}")
        if self.quant not in ("", "w8a8", "w8a8s"):
            raise ValueError(
                f"quant={self.quant!r} (want '', 'w8a8' or 'w8a8s')")
        if self.fold not in ("", "down", "all"):
            raise ValueError(
                f"fold={self.fold!r} (want '', 'down' or 'all')")
        if self.fold and (self.fused_norm or self.quant or self.skip_concat):
            raise ValueError(
                "fold composes only with the default norm/quant/"
                "skip_concat modes")
        if self.fold and x.shape[0] % 2:
            raise ValueError(
                f"fold needs an even batch, got {x.shape[0]}")
        if noise_level.ndim == 2:
            noise_level = noise_level[:, 0]
        x = x.astype(self.dtype)

        if self.with_noise_level_emb:
            t = positional_encoding(
                noise_level.astype(jnp.float32), self.inner_channel)
            t = nn.Dense(self.inner_channel * 4, dtype=self.dtype,
                         name="mlp_dense1")(t)
            t = swish(t)
            t = nn.Dense(self.inner_channel, dtype=self.dtype,
                         name="mlp_dense2")(t)
        else:
            t = None

        inner = self.inner_channel
        num_mults = len(self.channel_mults)

        # --- down path (indices mirror the torch ModuleList) ---
        fold_down = self.fold in ("down", "all")
        feats = []
        idx = 0
        if fold_down:
            x = fold2(x)
            kernel, kbias = _Conv3Params(inner, self.in_channel,
                                         name=f"downs_{idx}")()
            x = jax.lax.conv_general_dilated(
                x, _blockdiag2(kernel).astype(self.dtype),
                (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + jnp.tile(kbias, 2).astype(self.dtype)
        else:
            x = nn.Conv(inner, (3, 3), padding=1, dtype=self.dtype,
                        name=f"downs_{idx}")(x)
        idx += 1
        feats.append(unfold2(x) if fold_down else x)
        pre = inner
        feat_channels = [pre]
        for ind in range(num_mults):
            is_last = ind == num_mults - 1
            fold_here = fold_down and ind == 0
            ch = inner * self.channel_mults[ind]
            for _ in range(self.res_blocks):
                x = ResnetBlockWithAttn(
                    pre, ch, dropout=self.dropout, groups=self.norm_groups,
                    with_attn=False, dtype=self.dtype,
                    fused_norm=self.fused_norm, quant=self.quant,
                    fold=fold_here,
                    stats_barrier=f"downs_{idx}" in barrier_set,
                    name=f"downs_{idx}")(x, t, deterministic=deterministic)
                idx += 1
                feats.append(unfold2(x) if fold_here else x)
                feat_channels.append(ch)
                pre = ch
            if not is_last:
                x = Downsample(pre, dtype=self.dtype, fold=fold_here,
                               name=f"downs_{idx}")(x)
                idx += 1
                if fold_here:
                    # leave the folded stage at the 4x-smaller spatial size
                    x = unfold2(x)
                feats.append(x)
                feat_channels.append(pre)

        # --- mid: [attn, no-attn] (reference unet.py:274-279) ---
        x = ResnetBlockWithAttn(
            pre, pre, dropout=self.dropout, groups=self.norm_groups,
            with_attn=True, dtype=self.dtype, fused_norm=self.fused_norm,
            quant=self.quant, stats_barrier="mid_0" in barrier_set,
            name="mid_0")(x, t, deterministic=deterministic)
        x = ResnetBlockWithAttn(
            pre, pre, dropout=self.dropout, groups=self.norm_groups,
            with_attn=False, dtype=self.dtype, fused_norm=self.fused_norm,
            quant=self.quant, stats_barrier="mid_1" in barrier_set,
            name="mid_1")(x, t, deterministic=deterministic)

        # --- up path with skip-concat ([x, skip] channel order as torch) ---
        fold_up = self.fold == "all"
        idx = 0
        for ind in reversed(range(num_mults)):
            is_last = ind < 1
            fold_here = fold_up and ind == 0
            ch = inner * self.channel_mults[ind]
            for _ in range(self.res_blocks + 1):
                skip = feats.pop()
                skip_ch = feat_channels.pop()
                dim_in = pre + skip_ch
                if fold_here:
                    # fold the materialized concat so each image's
                    # dim_in channels stay contiguous (GN groups must
                    # not straddle images — see fold2)
                    xin = fold2(jnp.concatenate([x, skip], axis=-1))
                    x = unfold2(ResnetBlockWithAttn(
                        dim_in, ch, dropout=self.dropout,
                        groups=self.norm_groups, with_attn=False,
                        dtype=self.dtype, fold=True,
                        stats_barrier=f"ups_{idx}" in barrier_set,
                        name=f"ups_{idx}")(
                            xin, t, deterministic=deterministic))
                    idx += 1
                    pre = ch
                    continue
                # split/swap forms (see Block): exact only when every
                # GN group lies wholly inside one concat part
                mode_ok = (self.skip_concat in ("split", "swap")
                           and not self.fused_norm
                           and dim_in % self.norm_groups == 0
                           and pre % (dim_in // self.norm_groups) == 0)
                split_ok = mode_ok and self.skip_concat == "split"
                swap = skip_ch if (mode_ok
                                   and self.skip_concat == "swap") else 0
                xin = ((x, skip) if split_ok
                       else jnp.concatenate(
                           ([skip, x] if swap else [x, skip]), axis=-1))
                x = ResnetBlockWithAttn(
                    dim_in, ch, dropout=self.dropout,
                    groups=self.norm_groups, with_attn=False,
                    dtype=self.dtype, fused_norm=self.fused_norm,
                    quant=self.quant, in_perm=swap,
                    stats_barrier=f"ups_{idx}" in barrier_set,
                    csplit=pre if f"ups_{idx}" in csplit_set else 0,
                    name=f"ups_{idx}")(
                        xin, t, deterministic=deterministic)
                idx += 1
                pre = ch
            if not is_last:
                x = Upsample(pre, dtype=self.dtype, mode=self.upsample_mode,
                             name=f"ups_{idx}")(x)
                idx += 1

        if fold_up:
            out = unfold2(Block(
                self.out_channel, groups=self.norm_groups,
                dtype=self.dtype, fold=True, name="final_block")(
                    fold2(x), deterministic=deterministic))
        else:
            out = Block(self.out_channel, groups=self.norm_groups,
                        dtype=self.dtype, fused_norm=self.fused_norm,
                        quant=self.quant, name="final_block")(
                            x, deterministic=deterministic)
        return out.astype(jnp.float32)


def unet_from_config(unet_opt: dict, dtype=jnp.float32) -> FastDiffSRUNet:
    """Build from a reference-schema config dict
    (model.unet block of config/sr_fastdiffsr_*.json)."""
    from ..ops.groupnorm import default_fused_norm
    return FastDiffSRUNet(
        in_channel=unet_opt.get("in_channel", 6),
        out_channel=unet_opt.get("out_channel", 3),
        inner_channel=unet_opt.get("inner_channel", 64),
        norm_groups=unet_opt.get("norm_groups") or 32,
        channel_mults=tuple(unet_opt.get("channel_multiplier", (1, 2, 4, 4))),
        res_blocks=unet_opt.get("res_blocks", 2),
        dropout=unet_opt.get("dropout", 0.0),
        dtype=dtype,
        fused_norm=default_fused_norm(),
        upsample_mode=default_upsample_mode(),
        skip_concat=default_skip_concat(),
        quant=_default_quant(),
        fold=default_fold(),
        conv_split=default_conv_split(),
    )


def default_conv_split() -> str:
    """Per-block conv-only split list from the environment.

    FASTDIFFSR_TPU_CONV_SPLIT: comma-separated up-path block names
    ('ups_12') whose block1 conv + res_conv are computed as per-part
    convs summed at the skip-concat boundary (exact by linearity; GN
    untouched — see FastDiffSRUNet.conv_split). Default '' = literal
    monolithic convs.
    """
    import os
    return os.environ.get("FASTDIFFSR_TPU_CONV_SPLIT", "")


def _default_quant() -> str:
    from ..ops.quant import default_quant
    return default_quant()


def default_fold() -> str:
    """Level-0 batch-fold mode from the environment.

    FASTDIFFSR_TPU_FOLD: '' (default — literal per-image channel widths),
    'down' (fold the stem + level-0 down blocks + first Downsample to 2x
    channels at half batch), 'all' (also the level-0 up blocks + final
    block). Exact reformulations with the same parameter tree
    (tests/test_ops.py::test_fold_parity); requires an even batch.
    """
    import os
    mode = os.environ.get("FASTDIFFSR_TPU_FOLD", "")
    if mode not in ("", "down", "all"):
        raise ValueError(
            f"FASTDIFFSR_TPU_FOLD={mode!r} (want '', 'down' or 'all')")
    return mode


def default_skip_concat() -> str:
    """Up-path skip-concat mode from the environment.

    FASTDIFFSR_TPU_SKIP_CONCAT: '' (materialize jnp.concatenate([x, skip])
    — the literal reference formulation), 'split' (never form the
    concat: GroupNorm params/stats split per part, block1/res_conv convs
    as per-part convs summed), or 'swap' (concat([skip, x]) with params
    rolled inside the graph — probes XLA's emitter choice on the
    concat-consuming convs). All exact with the same parameter tree —
    see Block.
    """
    import os
    mode = os.environ.get("FASTDIFFSR_TPU_SKIP_CONCAT", "")
    if mode not in ("", "split", "swap"):
        raise ValueError(
            f"FASTDIFFSR_TPU_SKIP_CONCAT={mode!r} "
            "(want '', 'split' or 'swap')")
    return mode


def default_upsample_mode() -> str:
    """Upsample-block mode from the environment.

    FASTDIFFSR_TPU_UPSAMPLE: 'tconv' (default — exact stride-2 transposed
    conv, +7% end-to-end sampler throughput on v5e, see Upsample
    docstring), 'dense' (nearest x2 + dense 3x3 conv, the literal
    reference formulation), or 'd2s2' (exact 2x2-phase decomposition;
    measured slower end-to-end, kept for other hardware/XLA versions).
    All three are mathematically identical with the same parameter tree
    (tests/test_ops.py::test_upsample_mode_parity).
    """
    import os
    mode = os.environ.get("FASTDIFFSR_TPU_UPSAMPLE", "tconv")
    if mode == "dense":
        return ""
    if mode not in ("", "d2s2", "tconv"):
        raise ValueError(
            f"FASTDIFFSR_TPU_UPSAMPLE={mode!r} "
            "(want 'tconv', 'dense' or 'd2s2')")
    return mode
