"""HAT (Hybrid Attention Transformer) in Flax (NHWC).

Parity target: MSI_SR_model/model/hat.py —
- WindowAttention with relative position bias (:109-197);
- HAB (:199-290): window attention + parallel CAB conv branch
  (conv-GELU-conv + channel attention, :104-119) scaled by conv_scale,
  then MLP; shifted windows on odd blocks;
- OCAB (:324-411): overlapping cross attention — q from ws windows, k/v
  from (ws*(1+overlap)) windows extracted with stride ws (torch unfold ->
  here vmapped dynamic_slice over the padded map), its own relative
  position bias of shape ((ws+ows-1)^2, heads);
- RHAG (:487-557): HAB stack + OCAB + conv, residual;
- GeneratorResNet (:615-877): conv_first -> RHAGs -> LN -> conv + skip ->
  pixelshuffle. Defaults (trainer hat.py:952 + class defaults): embed 180,
  depths (6,)*6, heads 6, window 16, compress 3, squeeze 30,
  conv_scale 0.01, overlap 0.5, mlp_ratio 4.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.nafnet import pixel_shuffle
from .swinir import (window_partition, window_reverse,
                     relative_position_index, shift_attn_mask)


def _rpi_oca_reference(ws: int, ows: int) -> np.ndarray:
    """(ws*ws, ows*ows) index into the OCA bias table
    (reference hat.py calculate_rpi_oca)."""
    co = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                              indexing="ij")).reshape(2, -1)
    ce = np.stack(np.meshgrid(np.arange(ows), np.arange(ows),
                              indexing="ij")).reshape(2, -1)
    rel = (ce[:, None, :] - co[:, :, None]).transpose(1, 2, 0)
    rel = rel + (ws - ows + 1)
    rel[:, :, 0] *= ws + ows - 1
    return rel.sum(-1)


class CAB(nn.Module):
    num_feat: int
    compress_ratio: int = 3
    squeeze_factor: int = 30
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.num_feat // self.compress_ratio, (3, 3), padding=1,
                    dtype=self.dtype, name="conv1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        a = jnp.mean(h, axis=(1, 2), keepdims=True)
        a = nn.Conv(self.num_feat // self.squeeze_factor, (1, 1),
                    dtype=self.dtype, name="ca_fc1")(a)
        a = nn.relu(a)
        a = nn.Conv(self.num_feat, (1, 1), dtype=self.dtype,
                    name="ca_fc2")(a)
        return h * jax.nn.sigmoid(a)


class HATWindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        b_, n, c = x.shape
        heads = self.num_heads
        hd = c // heads
        w = self.window_size
        table = self.param("relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02),
                           ((2 * w - 1) ** 2, heads))
        idx = relative_position_index(w).reshape(-1)
        qkv = nn.Dense(c * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (hd ** -0.5), qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        bias = table[idx].reshape(n, n, heads).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, heads, n, n) \
                + mask[None, :, None]
            attn = attn.reshape(-1, heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c).astype(self.dtype)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class HAB(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_size):
        h, wd = x_size
        b, n, c = x.shape
        w = min(self.window_size, min(h, wd))
        shift = self.shift_size if min(h, wd) > self.window_size else 0

        shortcut = x
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        xn = xn.reshape(b, h, wd, c)

        conv_x = CAB(c, self.compress_ratio, self.squeeze_factor,
                     dtype=self.dtype, name="conv_block")(xn)
        conv_x = conv_x.reshape(b, n, c)

        if shift > 0:
            xs = jnp.roll(xn, (-shift, -shift), (1, 2))
            mask = jnp.asarray(shift_attn_mask(h, wd, w, shift))
        else:
            xs, mask = xn, None
        wins = window_partition(xs, w).reshape(-1, w * w, c)
        attn = HATWindowAttention(self.dim, w, self.num_heads,
                                  dtype=self.dtype, name="attn")(wins, mask)
        xs = window_reverse(attn.reshape(-1, w, w, c), w, h, wd)
        if shift > 0:
            xs = jnp.roll(xs, (shift, shift), (1, 2))
        x = shortcut + xs.reshape(b, n, c) + conv_x * self.conv_scale

        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        xn = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                      name="mlp_fc1")(xn)
        xn = nn.gelu(xn, approximate=False)
        xn = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(xn)
        return x + xn


class OCAB(nn.Module):
    dim: int
    window_size: int
    overlap_ratio: float
    num_heads: int
    mlp_ratio: float = 2.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_size):
        h, wd = x_size
        b, n, c = x.shape
        ws = self.window_size
        ows = int(ws * self.overlap_ratio) + ws
        pad = (ows - ws) // 2
        heads = self.num_heads
        hd = c // heads

        shortcut = x
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        xn = xn.reshape(b, h, wd, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(xn)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        q_wins = window_partition(q, ws).reshape(-1, ws * ws, c)

        kv = jnp.concatenate([k, v], axis=-1)
        kv = jnp.pad(kv, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        nh, nw = h // ws, wd // ws

        def get_win(i, j):
            return jax.lax.dynamic_slice(
                kv, (0, i * ws, j * ws, 0), (b, ows, ows, 2 * c))

        ii = jnp.arange(nh)
        jj = jnp.arange(nw)
        wins = jax.vmap(lambda i: jax.vmap(lambda j: get_win(i, j))(jj))(ii)
        # (nh, nw, b, ows, ows, 2c) -> (b*nh*nw, ows*ows, 2c)
        wins = wins.transpose(2, 0, 1, 3, 4, 5).reshape(
            b * nh * nw, ows * ows, 2 * c)
        k_wins, v_wins = wins[..., :c], wins[..., c:]

        table = self.param("relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02),
                           ((ws + ows - 1) ** 2, heads))
        idx = _rpi_oca_reference(ws, ows).reshape(-1)
        bias = table[idx].reshape(ws * ws, ows * ows,
                                  heads).transpose(2, 0, 1)

        b_ = q_wins.shape[0]
        qh = q_wins.reshape(b_, ws * ws, heads, hd).transpose(0, 2, 1, 3)
        kh = k_wins.reshape(b_, ows * ows, heads, hd).transpose(0, 2, 1, 3)
        vh = v_wins.reshape(b_, ows * ows, heads, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhnd,bhmd->bhnm", qh * (hd ** -0.5), kh,
                          preferred_element_type=jnp.float32)
        attn = attn + bias[None]
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b_, ws * ws,
                                                c).astype(self.dtype)
        out = window_reverse(out.reshape(-1, ws, ws, c), ws, h, wd)
        x = nn.Dense(c, dtype=self.dtype, name="proj")(
            out.reshape(b, n, c)) + shortcut

        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        xn = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                      name="mlp_fc1")(xn)
        xn = nn.gelu(xn, approximate=False)
        xn = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(xn)
        return x + xn


class RHAG(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: int
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_size):
        res = x
        for i in range(self.depth):
            x = HAB(self.dim, self.num_heads, self.window_size,
                    shift_size=0 if i % 2 == 0 else self.window_size // 2,
                    compress_ratio=self.compress_ratio,
                    squeeze_factor=self.squeeze_factor,
                    conv_scale=self.conv_scale, mlp_ratio=self.mlp_ratio,
                    dtype=self.dtype, name=f"block_{i}")(x, x_size)
        x = OCAB(self.dim, self.window_size, self.overlap_ratio,
                 self.num_heads, mlp_ratio=self.mlp_ratio,
                 dtype=self.dtype, name="overlap_attn")(x, x_size)
        h, wd = x_size
        b, n, c = x.shape
        img = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                      name="conv")(x.reshape(b, h, wd, c))
        return img.reshape(b, n, c) + res


class HAT(nn.Module):
    upscale: int = 4
    in_chans: int = 3
    embed_dim: int = 180
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6)
    window_size: int = 16
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    mlp_ratio: float = 4.0
    img_range: float = 1.0
    num_feat: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        rgb_mean = jnp.asarray([0.4488, 0.4371, 0.4040], jnp.float32)
        b, h0, w0, _ = x.shape
        ws = self.window_size
        ph = (ws - h0 % ws) % ws
        pw = (ws - w0 % ws) % ws
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        mode="reflect")
        x = ((x - rgb_mean) * self.img_range).astype(self.dtype)
        h, wd = x.shape[1], x.shape[2]

        x = nn.Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_first")(x)
        feat = x
        seq = x.reshape(b, h * wd, self.embed_dim)
        seq = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                           name="patch_norm")(seq)
        for i, (depth, heads) in enumerate(zip(self.depths,
                                               self.num_heads)):
            seq = RHAG(self.embed_dim, depth, heads, self.window_size,
                       self.compress_ratio, self.squeeze_factor,
                       self.conv_scale, self.overlap_ratio, self.mlp_ratio,
                       dtype=self.dtype, name=f"layer_{i}")(seq, (h, wd))
        seq = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(seq)

        body = nn.Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_after_body")(
                           seq.reshape(b, h, wd, self.embed_dim))
        x = body + feat

        x = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_before_upsample")(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        s = self.upscale
        idx = 0
        while s > 1:
            r = 3 if s % 3 == 0 else 2
            x = nn.Conv(self.num_feat * r * r, (3, 3), padding=1,
                        dtype=self.dtype, name=f"upsample_conv_{idx}")(x)
            x = pixel_shuffle(x, r)
            s //= r
            idx += 1
        x = nn.Conv(self.in_chans, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_last")(x)
        x = x.astype(jnp.float32) / self.img_range + rgb_mean
        return x[:, :h0 * self.upscale, :w0 * self.upscale, :]
