"""SR3-style denoiser UNet for the ddpm / tesr variants (Flax, NHWC).

Parity target: model/ddpm_modules/unet.py (tesr's UNet at
model/tesr_modules/unet.py:168-266 is the same topology driven by a
continuous noise level). Differences from the FastDiffSR UNet:

- time embedding: ger-based sinusoid (ddpm unet.py:19-33) — numerically the
  same map as the wavegrad encoding used by fastdiffsr, so
  ``positional_encoding`` is shared;
- ResnetBlock conditions via Swish -> Linear applied to the embedding,
  added per-channel (ddpm unet.py:78-96);
- real SelfAttention (GroupNorm -> 1x1 qkv (no bias) -> softmax(QK^T/sqrt(C))
  -> 1x1 out, residual; ddpm unet.py:99-128) applied where the running
  resolution is in ``attn_res`` and in the first mid block
  (unet.py:182-204).

Attention operates on <=64x64 feature grids — a few thousand tokens — which
XLA maps straight onto the MXU; no flash/ring kernel is needed (SURVEY.md
§5.7).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet_fastdiffsr import (Block, Downsample, Upsample,
                              default_upsample_mode, positional_encoding,
                              swish)


class SR3ResnetBlock(nn.Module):
    """block1 -> + Dense(swish(t_emb)) -> block2 + 1x1 skip
    (ddpm unet.py:78-96)."""

    dim: int
    dim_out: int
    dropout: float = 0.0
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb, *, deterministic: bool = True):
        h = Block(self.dim_out, groups=self.groups, dtype=self.dtype,
                  name="block1")(x, deterministic=deterministic)
        if t_emb is not None:
            shift = nn.Dense(self.dim_out, dtype=self.dtype,
                             name="mlp_dense")(swish(t_emb))
            h = h + shift[:, None, None, :]
        h = Block(self.dim_out, groups=self.groups, dropout=self.dropout,
                  dtype=self.dtype, name="block2")(
                      h, deterministic=deterministic)
        if self.dim != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype,
                        name="res_conv")(x)
        return h + x


class SelfAttention2D(nn.Module):
    """Single-head full self-attention over the H*W grid
    (ddpm unet.py:99-128). Scale is 1/sqrt(C) as in the reference."""

    channels: int
    n_head: int = 1
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n_head = self.n_head
        head_dim = c // n_head

        xn = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                          name="norm")(x)
        qkv = nn.Conv(c * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      name="qkv")(xn)
        qkv = qkv.reshape(b, h * w, n_head, 3, head_dim)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        # (b, heads, tokens, dim)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        attn = jnp.einsum("bntd,bnsd->bnts", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn / jnp.sqrt(jnp.asarray(c, jnp.float32))
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bnts,bnsd->bntd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c).astype(self.dtype)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="out")(out)
        return out + x


class SR3BlockWithAttn(nn.Module):
    dim: int
    dim_out: int
    dropout: float = 0.0
    groups: int = 32
    with_attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb, *, deterministic: bool = True):
        x = SR3ResnetBlock(self.dim, self.dim_out, dropout=self.dropout,
                           groups=self.groups, dtype=self.dtype,
                           name="res_block")(x, t_emb,
                                             deterministic=deterministic)
        if self.with_attn:
            x = SelfAttention2D(self.dim_out, groups=self.groups,
                                dtype=self.dtype, name="attn")(x)
        return x


class SR3UNet(nn.Module):
    """ddpm/tesr UNet (ddpm unet.py:147-243). ``time`` input: discrete t for
    ddpm, continuous gamma for tesr — both embed through the same sinusoid."""

    in_channel: int = 6
    out_channel: int = 3
    inner_channel: int = 32
    norm_groups: int = 32
    channel_mults: Sequence[int] = (1, 2, 4, 8, 8)
    attn_res: Sequence[int] = (8,)
    res_blocks: int = 3
    dropout: float = 0.0
    with_time_emb: bool = True
    image_size: int = 128
    dtype: jnp.dtype = jnp.float32
    upsample_mode: str = ""

    @nn.compact
    def __call__(self, x: jax.Array, time: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        if time.ndim == 2:
            time = time[:, 0]
        x = x.astype(self.dtype)

        if self.with_time_emb:
            t = positional_encoding(time.astype(jnp.float32),
                                    self.inner_channel)
            t = nn.Dense(self.inner_channel * 4, dtype=self.dtype,
                         name="mlp_dense1")(t)
            t = swish(t)
            t = nn.Dense(self.inner_channel, dtype=self.dtype,
                         name="mlp_dense2")(t)
        else:
            t = None

        inner = self.inner_channel
        num_mults = len(self.channel_mults)
        attn_res = tuple(self.attn_res)
        now_res = self.image_size

        feats = []
        idx = 0
        x = nn.Conv(inner, (3, 3), padding=1, dtype=self.dtype,
                    name=f"downs_{idx}")(x)
        idx += 1
        feats.append(x)
        pre = inner
        feat_channels = [pre]
        for ind in range(num_mults):
            is_last = ind == num_mults - 1
            use_attn = now_res in attn_res
            ch = inner * self.channel_mults[ind]
            for _ in range(self.res_blocks):
                x = SR3BlockWithAttn(
                    pre, ch, dropout=self.dropout, groups=self.norm_groups,
                    with_attn=use_attn, dtype=self.dtype,
                    name=f"downs_{idx}")(x, t, deterministic=deterministic)
                idx += 1
                feats.append(x)
                feat_channels.append(ch)
                pre = ch
            if not is_last:
                x = Downsample(pre, dtype=self.dtype, name=f"downs_{idx}")(x)
                idx += 1
                feats.append(x)
                feat_channels.append(pre)
                now_res //= 2

        x = SR3BlockWithAttn(pre, pre, dropout=self.dropout,
                             groups=self.norm_groups, with_attn=True,
                             dtype=self.dtype, name="mid_0")(
                                 x, t, deterministic=deterministic)
        x = SR3BlockWithAttn(pre, pre, dropout=self.dropout,
                             groups=self.norm_groups, with_attn=False,
                             dtype=self.dtype, name="mid_1")(
                                 x, t, deterministic=deterministic)

        idx = 0
        for ind in reversed(range(num_mults)):
            is_last = ind < 1
            use_attn = now_res in attn_res
            ch = inner * self.channel_mults[ind]
            for _ in range(self.res_blocks + 1):
                skip = feats.pop()
                skip_ch = feat_channels.pop()
                x = SR3BlockWithAttn(
                    pre + skip_ch, ch, dropout=self.dropout,
                    groups=self.norm_groups, with_attn=use_attn,
                    dtype=self.dtype, name=f"ups_{idx}")(
                        jnp.concatenate([x, skip], axis=-1), t,
                        deterministic=deterministic)
                idx += 1
                pre = ch
            if not is_last:
                x = Upsample(pre, dtype=self.dtype,
                             mode=self.upsample_mode,
                             name=f"ups_{idx}")(x)
                idx += 1
                now_res *= 2

        out = Block(self.out_channel, groups=self.norm_groups,
                    dtype=self.dtype, name="final_block")(
                        x, deterministic=deterministic)
        return out.astype(jnp.float32)


def sr3_unet_from_config(unet_opt: dict, image_size: int = 128,
                         dtype=jnp.float32) -> SR3UNet:
    return SR3UNet(
        in_channel=unet_opt.get("in_channel", 6),
        out_channel=unet_opt.get("out_channel", 3),
        inner_channel=unet_opt.get("inner_channel", 32),
        norm_groups=unet_opt.get("norm_groups") or 32,
        channel_mults=tuple(unet_opt.get("channel_multiplier",
                                         (1, 2, 4, 8, 8))),
        attn_res=tuple(unet_opt.get("attn_res", (8,))),
        res_blocks=unet_opt.get("res_blocks", 3),
        dropout=unet_opt.get("dropout", 0.0),
        image_size=image_size,
        dtype=dtype,
        upsample_mode=default_upsample_mode(),
    )
