"""OpenAI guided-diffusion UNet for the gdp variant (Flax, NHWC).

Parity target: model/gdp_modules/unet.py —
- ``timestep_embedding`` (unet.py:120-138): half-dim freqs, **cos first**
  (the SR3/fastdiffsr encodings put sin first);
- ``ResBlock`` with scale-shift norm and optional resblock up/down
  (unet.py:276-389): in GN-SiLU-conv3; emb SiLU-Linear(2*out);
  out GN*(1+scale)+shift -> SiLU -> dropout -> zero-init conv3; 1x1 skip;
- ``AttentionBlock`` + ``QKVAttentionLegacy`` (unet.py:392-491):
  GN -> 1x1 qkv -> per-head attention with 1/sqrt(sqrt(ch)) scaling applied
  to q AND k -> zero-init 1x1 out, residual;
- builder (unet.py:530-771): attention where the downsample factor ``ds``
  is in ``attention_resolutions``; resblock_updown=True,
  use_scale_shift_norm=True, num_head_channels=64 defaults.

Reference quirks preserved: ``model_channels`` (default 128) sets the width;
the config's ``inner_channel`` is accepted but ignored (unet.py:565,583 —
SURVEY.md §7). Gradient checkpointing maps to ``nn.remat``
(reference CheckpointFunction, unet.py:141-188 -> jax.checkpoint).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def guided_timestep_embedding(timesteps: jax.Array, dim: int,
                              max_period: float = 10000.0) -> jax.Array:
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def _avg_pool2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def _nearest_up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


zeros_init = nn.initializers.zeros_init()


class GuidedResBlock(nn.Module):
    """Scale-shift-norm residual block, optionally up/down sampling."""

    channels: int
    out_channels: int
    emb_channels: int
    dropout: float = 0.0
    up: bool = False
    down: bool = False
    dtype: jnp.dtype = jnp.float32
    upsample_mode: str = ""  # '' literal / 'tconv' / 'd2s2' (see Upsample)

    @nn.compact
    def __call__(self, x, emb, *, deterministic: bool = True):
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="in_norm")(x)
        h = jax.nn.silu(h)
        if self.up and self.upsample_mode:
            # conv3(nearest_up2(h)) without the 4x intermediate; the
            # identity/1x1 skip path still needs the upsampled x itself
            from .unet_fastdiffsr import (_Conv3Params,
                                          apply_upsample2_conv3)
            k, kb = _Conv3Params(self.out_channels, h.shape[-1],
                                 name="in_conv")()
            h = apply_upsample2_conv3(h, k, kb, self.upsample_mode,
                                      self.dtype)
            x = _nearest_up2(x)
        else:
            if self.up:
                h = _nearest_up2(h)
                x = _nearest_up2(x)
            elif self.down:
                h = _avg_pool2(h)
                x = _avg_pool2(x)
            h = nn.Conv(self.out_channels, (3, 3), padding=1,
                        dtype=self.dtype, name="in_conv")(h)

        e = nn.Dense(2 * self.out_channels, dtype=self.dtype,
                     name="emb_dense")(jax.nn.silu(emb))
        scale, shift = jnp.split(e[:, None, None, :], 2, axis=-1)

        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="out_norm")(h)
        h = h * (1 + scale) + shift
        h = jax.nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(rate=self.dropout,
                           deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=zeros_init, bias_init=zeros_init,
                    name="out_conv")(h)

        if self.out_channels != self.channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="skip")(x)
        return x + h


class GuidedAttention(nn.Module):
    """QKVAttentionLegacy semantics (gdp unet.py:461-491)."""

    channels: int
    num_head_channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = (c // self.num_head_channels
                 if self.num_head_channels > 0 else 1)
        ch = c // heads
        t = h * w

        xn = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="norm")(
            x).reshape(b, t, c)
        # torch qkv is conv1d over channels: Dense on the feature axis.
        # Legacy ordering: heads split BEFORE qkv split, i.e. the weight
        # layout is (heads, 3, ch) along the output axis.
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(xn)
        qkv = qkv.reshape(b, t, heads, 3 * ch)
        q, k, v = jnp.split(qkv, 3, axis=-1)          # each (b, t, heads, ch)
        scale = 1.0 / math.sqrt(math.sqrt(ch))
        logits = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale,
                            preferred_element_type=jnp.float32)
        wts = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        a = jnp.einsum("bhts,bshc->bthc", wts, v,
                       preferred_element_type=jnp.float32)
        a = a.reshape(b, t, c).astype(self.dtype)
        a = nn.Dense(c, dtype=self.dtype, kernel_init=zeros_init,
                     bias_init=zeros_init, name="proj_out")(a)
        return x + a.reshape(b, h, w, c)


class GuidedUNet(nn.Module):
    """gdp denoiser (gdp unet.py:530-801). Input packing is
    ``cat([x_noisy, cond])`` (gdp diffusion.py:184-195,288-291)."""

    image_size: int = 256
    in_channel: int = 6
    model_channels: int = 128
    out_channel: int = 3
    res_blocks: int = 2
    attention_resolutions: Sequence[int] = (32, 16, 8)
    dropout: float = 0.0
    channel_mults: Sequence[int] = (1, 2, 4, 8)
    num_head_channels: int = 64
    use_checkpoint: bool = False
    dtype: jnp.dtype = jnp.float32
    upsample_mode: str = ""  # '' literal / 'tconv' / 'd2s2' (see Upsample)

    @nn.compact
    def __call__(self, x: jax.Array, timesteps: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        if timesteps.ndim == 2:
            timesteps = timesteps[:, 0]
        x = x.astype(self.dtype)
        mc = self.model_channels

        emb = guided_timestep_embedding(timesteps, mc)
        emb = nn.Dense(mc * 4, dtype=self.dtype, name="time_dense1")(emb)
        emb = jax.nn.silu(emb)
        emb = nn.Dense(mc * 4, dtype=self.dtype, name="time_dense2")(emb)

        ResBlockM = (nn.remat(GuidedResBlock, static_argnums=())
                     if self.use_checkpoint else GuidedResBlock)

        def res(idx_name, cin, cout, up=False, down=False):
            return ResBlockM(cin, cout, mc * 4, dropout=self.dropout,
                             up=up, down=down, dtype=self.dtype,
                             upsample_mode=self.upsample_mode,
                             name=idx_name)

        attn_res = tuple(self.attention_resolutions)
        hs = []
        ch = int(self.channel_mults[0] * mc)
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                    name="input_0_0")(x)
        hs.append(h)
        input_chans = [ch]
        ds = 1
        blk = 1
        for level, mult in enumerate(self.channel_mults):
            for _ in range(self.res_blocks):
                out_ch = int(mult * mc)
                h = res(f"input_{blk}_0", ch, out_ch)(
                    h, emb, deterministic=deterministic)
                ch = out_ch
                if ds in attn_res:
                    h = GuidedAttention(
                        ch, self.num_head_channels, dtype=self.dtype,
                        name=f"input_{blk}_1")(h)
                hs.append(h)
                input_chans.append(ch)
                blk += 1
            if level != len(self.channel_mults) - 1:
                h = res(f"input_{blk}_0", ch, ch, down=True)(
                    h, emb, deterministic=deterministic)
                hs.append(h)
                input_chans.append(ch)
                ds *= 2
                blk += 1

        h = res("middle_0", ch, ch)(h, emb, deterministic=deterministic)
        h = GuidedAttention(ch, self.num_head_channels, dtype=self.dtype,
                            name="middle_1")(h)
        h = res("middle_2", ch, ch)(h, emb, deterministic=deterministic)

        blk = 0
        for level, mult in list(enumerate(self.channel_mults))[::-1]:
            for i in range(self.res_blocks + 1):
                ich = input_chans.pop()
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                out_ch = int(mult * mc)
                h = res(f"output_{blk}_0", ch + ich, out_ch)(
                    h, emb, deterministic=deterministic)
                ch = out_ch
                j = 1
                if ds in attn_res:
                    h = GuidedAttention(
                        ch, self.num_head_channels, dtype=self.dtype,
                        name=f"output_{blk}_{j}")(h)
                    j += 1
                if level and i == self.res_blocks:
                    h = res(f"output_{blk}_{j}", ch, ch, up=True)(
                        h, emb, deterministic=deterministic)
                    ds //= 2
                blk += 1

        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="out_norm")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channel, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=zeros_init, bias_init=zeros_init,
                    name="out_conv")(h)
        return h.astype(jnp.float32)


def guided_unet_from_config(unet_opt: dict, image_size: int = 256,
                            dtype=jnp.float32,
                            use_checkpoint: bool = False) -> GuidedUNet:
    """Width comes from model_channels (default 128) — the reference ignores
    inner_channel for this arch (gdp unet.py:565,583)."""
    return GuidedUNet(
        image_size=image_size,
        in_channel=unet_opt.get("in_channel", 6),
        model_channels=unet_opt.get("model_channels", 128),
        out_channel=unet_opt.get("out_channel", 3),
        res_blocks=unet_opt.get("res_blocks", 2),
        channel_mults=tuple(unet_opt.get("channel_multiplier", (1, 2, 4, 8))),
        dropout=unet_opt.get("dropout", 0.0),
        use_checkpoint=use_checkpoint,
        dtype=dtype,
        upsample_mode=_default_upsample_mode(),
    )


def _default_upsample_mode() -> str:
    from .unet_fastdiffsr import default_upsample_mode
    return default_upsample_mode()
