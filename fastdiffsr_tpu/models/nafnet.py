"""ConditionalNAFNet — EDiffSR's denoiser (Flax, NHWC).

Parity target: EDiffSR/codes/config/sisr/models/modules/
DenoisingNAFNet_arch.py —
- NAFBlock (:15-86): channel-LayerNorm (no bias, biased var, scale only —
  module_util.py:74-83) -> time scale/shift -> 1x1 expand -> 3x3 depthwise
  -> SimpleGate -> simplified channel attention -> 1x1, residual scaled by
  learnable beta; then the FFN half with gamma;
- time MLP: sinusoidal emb -> Linear(w, 8w) -> SimpleGate -> Linear(4w, 4w)
  (:174-181);
- topology (:165-264): input cat([x - mu, mu]) -> intro conv -> RCAB
  enhance (+residual) -> enc stages (NAFBlocks + 2x2 stride-2 down conv,
  channels double) -> middle -> dec stages (1x1 conv + pixel-shuffle up,
  additive skips) -> ending conv, crop to input size;
- default EDiffSR config: width 64, enc [14,1,1,1], dec [1,1,1,1], middle 1
  (options/train/setting_mfe_Train_x4.yml).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_pos_emb(x: jax.Array, dim: int) -> jax.Array:
    """module_util.py:29-45 (half-1 denominator variant)."""
    half = dim // 2
    scale = math.log(10000) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -scale)
    emb = x[:, None].astype(jnp.float32) * freqs[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


def simple_gate(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return x1 * x2


def channel_layer_norm(x: jax.Array, g: jax.Array,
                       eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the channel axis, scale-only, biased variance."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * g


def pixel_shuffle(x: jax.Array, r: int = 2) -> jax.Array:
    """torch.nn.PixelShuffle semantics on NHWC (channel index c*r^2+i*r+j)."""
    b, h, w, c = x.shape
    c_out = c // (r * r)
    x = x.reshape(b, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c_out)


def default_naf_dw() -> str:
    """NAFBlock depthwise-conv formulation (FASTDIFFSR_TPU_NAF_DW):
    '' = lax grouped conv (literal, default); 'shift' = nine shifted FMAs
    — measured 22% SLOWER end-to-end on v5e (tools/naf_check.py,
    BASELINE.md r4), kept for other hardware/XLA versions."""
    import os
    return os.environ.get("FASTDIFFSR_TPU_NAF_DW", "")


def default_naf_fold() -> str:
    """Batch-pair channel folding (FASTDIFFSR_TPU_NAF_FOLD): '' (default,
    literal) | 'enc' | 'all' — pack 2 batch images into channels for the
    256² width-64 NAFBlock stages so every 128-lane vreg is full (the r4
    floor analysis: 15 of 21 blocks sit at 256²·c64 and the graph runs at
    ~3.7% MXU — the binding term is lane under-occupancy of the
    LayerNorm → 1x1 → gate → SCA chains, not MACs). 'enc' folds the
    14-block enc stage 0; 'all' also folds the level-0 dec block. Exact:
    all channel permutations ride inside the kernel constants
    (block-diagonal shared-weight embeddings), the only runtime relayouts
    are one fold/unfold reshape pair per folded stage. Parameter tree
    identical to the literal path (tests/test_ediffsr.py fold parity)."""
    import os
    return os.environ.get("FASTDIFFSR_TPU_NAF_FOLD", "")


def fold2_batch(x: jax.Array) -> jax.Array:
    """(B,H,W,C) -> (B/2,H,W,2C), channels image-major: [img2m_C, img2m+1_C]."""
    b, h, w, c = x.shape
    return x.reshape(b // 2, 2, h, w, c).transpose(0, 2, 3, 1, 4) \
            .reshape(b // 2, h, w, 2 * c)


def unfold2_batch(x: jax.Array) -> jax.Array:
    """Inverse of fold2_batch."""
    b2, h, w, c2 = x.shape
    return x.reshape(b2, h, w, 2, c2 // 2).transpose(0, 3, 1, 2, 4) \
            .reshape(b2 * 2, h, w, c2 // 2)


def _fold2_kernel(k: jax.Array, out_idx=None) -> jax.Array:
    """Shared-weight block-diagonal embedding of a conv kernel
    (kh,kw,Ci,Co) -> (kh,kw,2Ci,2Co): image-major in/out channel blocks,
    exact zeros off-diagonal (adding exact zeros is order-independent, so
    the folded contraction is bit-equal per image). ``out_idx`` permutes
    the image-major output columns (e.g. into gate-half-major order) —
    the permutation lives in the weight constant, not the activation."""
    z = jnp.zeros_like(k)
    kf = jnp.concatenate([jnp.concatenate([k, z], axis=-1),
                          jnp.concatenate([z, k], axis=-1)], axis=-2)
    if out_idx is not None:
        kf = kf[..., out_idx]
    return kf


def _gate_major_idx(co: int):
    """Output-channel order for a folded conv feeding SimpleGate: the
    per-image gate halves interleave as [A_x1, B_x1, A_x2, B_x2] so a
    plain split(2) gates each image against itself. Indexes the
    image-major columns (i*co + j) of a _fold2_kernel output."""
    import numpy as np
    half = co // 2
    return np.concatenate([np.arange(half), co + np.arange(half),
                           half + np.arange(half),
                           co + half + np.arange(half)])


def _conv1x1(x: jax.Array, k: jax.Array, b, dtype) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), k.astype(dtype), (1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if b is None else y + b.astype(dtype)


def _cln_folded(x: jax.Array, g: jax.Array, eps: float = 1e-5) -> jax.Array:
    """channel_layer_norm on a folded tensor: stats per image half."""
    b, h, w, c2 = x.shape
    xr = x.reshape(b, h, w, 2, c2 // 2)
    mean = jnp.mean(xr, axis=-1, keepdims=True)
    var = jnp.mean((xr - mean) ** 2, axis=-1, keepdims=True)
    xr = (xr - mean) * jax.lax.rsqrt(var + eps)
    return xr.reshape(b, h, w, c2) * jnp.tile(g, 2)


def default_naf_up() -> str:
    """Decoder upsample formulation (FASTDIFFSR_TPU_NAF_UP): 'tconv'
    (default) = the exact stride-2 transposed-conv fold of the
    (1x1 conv + PixelShuffle) pair — same param tree, no shuffle
    relayout; bit-identical output and +4% restore throughput on v5e
    (tools/naf_check.py interleaved A/B, BASELINE.md r4) — the same
    reformulation family as the flagship's Upsample tconv win.
    '' = the literal pair."""
    import os
    return os.environ.get("FASTDIFFSR_TPU_NAF_UP", "tconv")


class _ConvParams(nn.Module):
    """Bare conv parameter holder: identical tree path/shapes/init to the
    ``nn.Conv`` it replaces, so checkpoints load whichever mode runs."""

    features: int
    in_features: int
    ksize: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.ksize, self.ksize,
                             self.in_features, self.features), jnp.float32)
        if not self.use_bias:
            return kernel, None
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class NAFBlock(nn.Module):
    c: int
    time_dim: int
    dw_expand: int = 2
    ffn_expand: int = 2
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    dw_mode: str = ""
    folded: bool = False   # fold2 batch-pair layout, see default_naf_fold

    @nn.compact
    def __call__(self, x, t_emb, *, deterministic: bool = True):
        c = self.c
        dw = c * self.dw_expand

        # time modulation: SimpleGate -> Linear(time_dim/2, 4c) -> 4 chunks
        te = simple_gate(t_emb)
        te = nn.Dense(c * 4, dtype=self.dtype, name="time_dense")(te)

        g1 = self.param("norm1_g", nn.initializers.ones_init(), (c,))
        g2 = self.param("norm2_g", nn.initializers.ones_init(), (c,))
        beta = self.param("beta", nn.initializers.zeros_init(), (c,))
        gamma = self.param("gamma", nn.initializers.zeros_init(), (c,))

        if self.folded:
            return self._folded_body(x, te, g1, g2, beta, gamma,
                                     deterministic)

        shift_att, scale_att, shift_ffn, scale_ffn = jnp.split(
            te[:, None, None, :], 4, axis=-1)

        inp = x
        x = channel_layer_norm(x, g1)
        x = x * (scale_att + 1) + shift_att
        x = nn.Conv(dw, (1, 1), dtype=self.dtype, name="conv1")(x)
        if self.dw_mode == "shift":
            # depthwise 3x3 as nine shifted FMAs — pure VPU elementwise
            # chains XLA can fuse, instead of the grouped-conv lowering
            k, bv = _ConvParams(dw, 1, ksize=3, name="conv2")()
            k = k.astype(x.dtype)
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            hh, ww = x.shape[1], x.shape[2]
            acc = None
            for dy in range(3):
                for dx in range(3):
                    term = xp[:, dy:dy + hh, dx:dx + ww, :] * k[dy, dx, 0]
                    acc = term if acc is None else acc + term
            x = acc + bv.astype(x.dtype)
        else:
            x = nn.Conv(dw, (3, 3), padding=1, feature_group_count=dw,
                        dtype=self.dtype, name="conv2")(x)
        x = simple_gate(x)
        sca = jnp.mean(x, axis=(1, 2), keepdims=True)
        sca = nn.Conv(dw // 2, (1, 1), dtype=self.dtype, name="sca_conv")(sca)
        x = x * sca
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv3")(x)
        if self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        y = inp + x * beta

        x = channel_layer_norm(y, g2)
        x = x * (scale_ffn + 1) + shift_ffn
        x = nn.Conv(c * self.ffn_expand, (1, 1), dtype=self.dtype,
                    name="conv4")(x)
        x = simple_gate(x)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv5")(x)
        if self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        return y + x * gamma

    def _folded_body(self, x, te, g1, g2, beta, gamma, deterministic):
        """fold2 forward: x is (B/2,H,W,2c) image-major; identical
        parameter tree (the _ConvParams holders mirror the literal
        nn.Conv param paths), identical per-image arithmetic — the
        block-diagonal kernels add only exact zeros to each contraction
        (tests/test_ediffsr.py::test_nafnet_fold_parity)."""
        c = self.c
        dw = c * self.dw_expand
        half = dw // 2
        b2 = x.shape[0]

        # (B,c) time chunks -> (B/2,1,1,2c) image-major modulation vectors
        shift_att, scale_att, shift_ffn, scale_ffn = [
            m.reshape(b2, 2 * c)[:, None, None, :]
            for m in jnp.split(te, 4, axis=-1)]

        gate_idx = _gate_major_idx(dw)

        inp = x
        x = _cln_folded(x, g1)
        x = x * (scale_att + 1) + shift_att
        k1, b1 = _ConvParams(dw, c, name="conv1")()
        x = _conv1x1(x, _fold2_kernel(k1, gate_idx),
                     jnp.tile(b1, 2)[gate_idx], self.dtype)
        # depthwise 3x3: per-channel, so folding is a channel tile in the
        # same gate-half-major order — no extra MACs at all
        k2, b2v = _ConvParams(dw, 1, ksize=3, name="conv2")()
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            jnp.tile(k2, (1, 1, 1, 2))[..., gate_idx].astype(self.dtype),
            (1, 1), padding=((1, 1), (1, 1)), feature_group_count=2 * dw,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + jnp.tile(b2v, 2)[gate_idx].astype(x.dtype)
        x = simple_gate(x)          # -> (B/2,H,W,dw) image-major
        sca = jnp.mean(x, axis=(1, 2), keepdims=True)
        ks, bs = _ConvParams(half, half, name="sca_conv")()
        sca = _conv1x1(sca, _fold2_kernel(ks), jnp.tile(bs, 2), self.dtype)
        x = x * sca
        k3, b3 = _ConvParams(c, half, name="conv3")()
        x = _conv1x1(x, _fold2_kernel(k3), jnp.tile(b3, 2), self.dtype)
        if self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        y = inp + x * jnp.tile(beta, 2)

        x = _cln_folded(y, g2)
        x = x * (scale_ffn + 1) + shift_ffn
        ffn = c * self.ffn_expand
        ffn_idx = _gate_major_idx(ffn)
        k4, b4 = _ConvParams(ffn, c, name="conv4")()
        x = _conv1x1(x, _fold2_kernel(k4, ffn_idx),
                     jnp.tile(b4, 2)[ffn_idx], self.dtype)
        x = simple_gate(x)
        k5, b5 = _ConvParams(c, ffn // 2, name="conv5")()
        x = _conv1x1(x, _fold2_kernel(k5), jnp.tile(b5, 2), self.dtype)
        if self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        return y + x * jnp.tile(gamma, 2)


class RCAB(nn.Module):
    """Residual channel attention block (DenoisingNAFNet_arch.py:121-141)."""

    num_feat: int
    squeeze: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        a = jnp.mean(h, axis=(1, 2), keepdims=True)
        a = nn.Conv(self.num_feat // self.squeeze, (1, 1), dtype=self.dtype,
                    name="ca_fc1")(a)
        a = nn.relu(a)
        a = nn.Conv(self.num_feat, (1, 1), dtype=self.dtype,
                    name="ca_fc2")(a)
        h = h * jax.nn.sigmoid(a)
        return h + x


class ConditionalNAFNet(nn.Module):
    img_channel: int = 3
    width: int = 16
    middle_blk_num: int = 1
    enc_blk_nums: Sequence[int] = ()
    dec_blk_nums: Sequence[int] = ()
    upscale: int = 1
    dtype: jnp.dtype = jnp.float32
    dw_mode: str = ""   # see default_naf_dw
    up_mode: str = ""   # see default_naf_up
    fold_mode: str = ""  # see default_naf_fold: '' | 'enc' | 'all'

    @nn.compact
    def __call__(self, inp: jax.Array, cond: jax.Array, time: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        w = self.width
        if time.ndim == 0:
            time = time[None]
        t = sinusoidal_pos_emb(time, w)
        t = nn.Dense(w * 8, dtype=self.dtype, name="time_dense1")(t)
        t = simple_gate(t)
        t = nn.Dense(w * 4, dtype=self.dtype, name="time_dense2")(t)

        x = jnp.concatenate([inp - cond, cond], axis=-1).astype(self.dtype)
        B, H, W, C = x.shape
        pad_sz = 2 ** len(self.enc_blk_nums)
        ph = (pad_sz - H % pad_sz) % pad_sz
        pw = (pad_sz - W % pad_sz) % pad_sz
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))

        x = nn.Conv(w, (3, 3), padding=1, dtype=self.dtype, name="intro")(x)
        x = x + RCAB(w, dtype=self.dtype, name="enhance")(x)

        # fold2: pack batch pairs into channels for the widest-spatial
        # stages (256² c64 at the paper config) — see default_naf_fold
        do_fold = bool(self.fold_mode) and x.shape[0] % 2 == 0

        chan = w
        encs = []
        for i, num in enumerate(self.enc_blk_nums):
            fold_here = do_fold and i == 0 and num > 0
            if fold_here:
                x = fold2_batch(x)
            for j in range(num):
                x = NAFBlock(chan, w * 4, dtype=self.dtype,
                             dw_mode=self.dw_mode, folded=fold_here,
                             name=f"enc_{i}_{j}")(
                                 x, t, deterministic=deterministic)
            if fold_here:
                x = unfold2_batch(x)
            encs.append(x)
            x = nn.Conv(2 * chan, (2, 2), strides=2, dtype=self.dtype,
                        name=f"down_{i}")(x)
            chan *= 2

        for j in range(self.middle_blk_num):
            x = NAFBlock(chan, w * 4, dtype=self.dtype,
                         dw_mode=self.dw_mode,
                         name=f"middle_{j}")(x, t,
                                             deterministic=deterministic)

        for i, num in enumerate(self.dec_blk_nums):
            if self.up_mode == "tconv":
                # exact fold of (1x1 conv -> PixelShuffle(2)) into one
                # stride-2 transposed conv: out[2h+i,2w+j,c] =
                # x[h,w,:] @ W1x1[:, c*4+i*2+j]; the lhs-dilated conv with
                # padding 1 applies the kernel FLIPPED, hence [::-1,::-1]
                w1, _ = _ConvParams(chan * 2, chan, use_bias=False,
                                    name=f"up_{i}")()
                co = chan // 2
                kt = w1[0, 0].reshape(chan, co, 2, 2)[..., ::-1, ::-1]
                kt = kt.transpose(2, 3, 0, 1).astype(self.dtype)
                # x may arrive f32 (residual adds promote); nn.Conv casts
                # implicitly on the literal path — match it here
                x = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), kt, window_strides=(1, 1),
                    padding=((1, 1), (1, 1)), lhs_dilation=(2, 2),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            else:
                x = nn.Conv(chan * 2, (1, 1), use_bias=False,
                            dtype=self.dtype, name=f"up_{i}")(x)
                x = pixel_shuffle(x, 2)
            chan //= 2
            x = x + encs[::-1][i]
            fold_here = (do_fold and self.fold_mode == "all"
                         and i == len(self.dec_blk_nums) - 1 and num > 0)
            if fold_here:
                x = fold2_batch(x)
            for j in range(num):
                x = NAFBlock(chan, w * 4, dtype=self.dtype,
                             dw_mode=self.dw_mode, folded=fold_here,
                             name=f"dec_{i}_{j}")(
                                 x, t, deterministic=deterministic)
            if fold_here:
                x = unfold2_batch(x)

        x = nn.Conv(self.img_channel, (3, 3), padding=1, dtype=self.dtype,
                    name="ending")(x)
        return x[:, :H, :W, :].astype(jnp.float32)


def nafnet_from_config(setting: dict, dtype=jnp.float32) -> ConditionalNAFNet:
    """Build from EDiffSR YAML network settings
    (options/*/setting_mfe_*.yml: width 64, enc [14,1,1,1], dec [1,1,1,1])."""
    return ConditionalNAFNet(
        img_channel=setting.get("img_channel", 3),
        width=setting.get("width", 64),
        middle_blk_num=setting.get("middle_blk_num", 1),
        enc_blk_nums=tuple(setting.get("enc_blk_nums", (14, 1, 1, 1))),
        dec_blk_nums=tuple(setting.get("dec_blk_nums", (1, 1, 1, 1))),
        upscale=setting.get("upscale", 1),
        dtype=dtype,
        dw_mode=default_naf_dw(),
        up_mode=default_naf_up(),
        fold_mode=default_naf_fold(),
    )
