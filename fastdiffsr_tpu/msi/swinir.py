"""SwinIR in Flax (NHWC) — the flagship classical baseline.

Parity target: MSI_SR_model/model/swinir.py:548-753 (GeneratorResNet, the
full SwinIR): shallow conv -> RSTB stack (Swin blocks with window attention
+ relative position bias, shifted windows with masking) -> LN -> conv (+
residual) -> pixelshuffle upsampler. Trainer config (swinir.py:828-836):
embed_dim 180, depths [6]*6, heads [6]*6, window 8, mlp_ratio 2, upscale 4,
upsampler 'pixelshuffle', img_range 1 with DIV2K rgb mean shift.

TPU notes: window partition is reshape/transpose on static shapes; the
(num_windows, w*w, w*w) attention runs batched on the MXU. Shift masks are
computed in numpy at trace time (static image size after window padding).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


def window_partition(x: jax.Array, w: int) -> jax.Array:
    """(B,H,W,C) -> (B*nH*nW, w, w, C)."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w, w, c)


def window_reverse(windows: jax.Array, w: int, h: int, wd: int) -> jax.Array:
    b = windows.shape[0] // (h * wd // w // w)
    x = windows.reshape(b, h // w, wd // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, -1)


def relative_position_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij"))          # (2, w, w)
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]           # (2, ww, ww)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)                                      # (ww, ww)


def shift_attn_mask(h: int, wd: int, w: int, shift: int) -> np.ndarray:
    """(num_windows, ww, ww) additive mask with -100 on cross-region pairs
    (reference swinir.py SwinTransformerBlock.calculate_mask)."""
    img = np.zeros((1, h, wd, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    win = img.reshape(1, h // w, w, wd // w, w, 1)
    win = win.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        b_, n, c = x.shape
        heads = self.num_heads
        hd = c // heads
        w = self.window_size

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * w - 1) ** 2, heads))
        rel_idx = relative_position_index(w).reshape(-1)

        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]                    # (b_,heads,n,hd)
        q = q * (hd ** -0.5)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        bias = bias_table[rel_idx].reshape(n, n, heads)
        attn = attn + bias.transpose(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, heads, n, n) + \
                mask[None, :, None, :, :]
            attn = attn.reshape(-1, heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c).astype(self.dtype)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 2.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_size, *, deterministic: bool = True):
        h, wd = x_size
        b, n, c = x.shape
        w = min(self.window_size, min(h, wd))
        shift = self.shift_size if w == self.window_size else 0
        if min(h, wd) <= self.window_size:
            shift = 0

        def drop_path(inp, res):
            if self.drop_path == 0.0 or deterministic:
                return inp + res
            keep = 1.0 - self.drop_path
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep, (res.shape[0], 1, 1))
            return inp + res * mask / keep

        shortcut = x
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        xn = xn.reshape(b, h, wd, c)
        if shift > 0:
            xn = jnp.roll(xn, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(h, wd, w, shift))
        else:
            mask = None
        windows = window_partition(xn, w).reshape(-1, w * w, c)
        attn = WindowAttention(self.dim, w, self.num_heads,
                               dtype=self.dtype, name="attn")(windows, mask)
        xn = window_reverse(attn.reshape(-1, w, w, c), w, h, wd)
        if shift > 0:
            xn = jnp.roll(xn, (shift, shift), axis=(1, 2))
        x = drop_path(shortcut, xn.reshape(b, n, c))

        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        xn = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                      name="mlp_fc1")(xn)
        xn = nn.gelu(xn, approximate=False)
        xn = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(xn)
        return drop_path(x, xn)


class RSTB(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: int = 8
    mlp_ratio: float = 2.0
    drop_paths: Sequence[float] = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_size, *, deterministic: bool = True):
        res = x
        for i in range(self.depth):
            dp = self.drop_paths[i] if i < len(self.drop_paths) else 0.0
            x = SwinBlock(self.dim, self.num_heads, self.window_size,
                          shift_size=0 if i % 2 == 0 else
                          self.window_size // 2,
                          mlp_ratio=self.mlp_ratio, drop_path=dp,
                          dtype=self.dtype, name=f"block_{i}")(
                              x, x_size, deterministic=deterministic)
        h, wd = x_size
        b, n, c = x.shape
        img = x.reshape(b, h, wd, c)
        img = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                      name="conv")(img)
        return img.reshape(b, n, c) + res


class SwinIR(nn.Module):
    """GeneratorResNet (reference swinir.py:548-753), pixelshuffle variant."""

    upscale: int = 4
    in_chans: int = 3
    embed_dim: int = 180
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    img_range: float = 1.0
    drop_path_rate: float = 0.1
    num_feat: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        rgb_mean = jnp.asarray([0.4488, 0.4371, 0.4040], jnp.float32) \
            if self.in_chans == 3 else jnp.zeros((1,), jnp.float32)
        x = (x - rgb_mean) * self.img_range
        x = x.astype(self.dtype)

        b, h0, w0, _ = x.shape
        ws = self.window_size
        ph = (ws - h0 % ws) % ws
        pw = (ws - w0 % ws) % ws
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        mode="reflect")
        h, wd = x.shape[1], x.shape[2]

        x = nn.Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_first")(x)
        feat = x

        seq = x.reshape(b, h * wd, self.embed_dim)
        seq = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                           name="patch_norm")(seq)

        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total).tolist()
        off = 0
        for i, (depth, heads) in enumerate(zip(self.depths,
                                               self.num_heads)):
            seq = RSTB(self.embed_dim, depth, heads, self.window_size,
                       self.mlp_ratio, drop_paths=dpr[off:off + depth],
                       dtype=self.dtype, name=f"layer_{i}")(
                           seq, (h, wd), deterministic=deterministic)
            off += depth
        seq = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(seq)

        body = seq.reshape(b, h, wd, self.embed_dim)
        body = nn.Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_after_body")(body)
        x = body + feat

        x = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_before_upsample")(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        # pixelshuffle chain: for 4x -> two (conv 4*nf, PS2); 2x/3x single
        from ..models.nafnet import pixel_shuffle
        scale = self.upscale
        idx = 0
        while scale > 1:
            r = 3 if scale % 3 == 0 else 2
            x = nn.Conv(self.num_feat * r * r, (3, 3), padding=1,
                        dtype=self.dtype, name=f"upsample_conv_{idx}")(x)
            x = pixel_shuffle(x, r)
            scale //= r
            idx += 1
        x = nn.Conv(self.in_chans, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_last")(x)

        x = x.astype(jnp.float32) / self.img_range + rgb_mean
        return x[:, :h0 * self.upscale, :w0 * self.upscale, :]
