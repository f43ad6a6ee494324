"""ConditionalUNet — EDiffSR's second denoiser arch (Flax, NHWC).

Parity target: EDiffSR/codes/config/sisr/models/modules/
DenoisingUNet_arch.py:19-135 + module_util.py —
- input cat([x - cond, cond]) -> 7x7 conv (no bias);
- depth-4 encoder: per level 2 scale-shift ResBlocks (SiLU, time
  scale/shift from SinusoidalPosEmb -> Linear-GELU-Linear), residual
  PreNorm LinearAttention (softmax-q/softmax-k linear attention,
  module_util.py:154-182), 4x4/s2 down conv (3x3 at the last level);
- mid: ResBlock, LinearAttention, ResBlock;
- decoder with two skip concats per level, nearest-up + 3x3 conv;
- final: concat stem skip -> ResBlock -> 3x3 conv; reflect-pad to 2^depth.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from .nafnet import channel_layer_norm, sinusoidal_pos_emb
from .unet_fastdiffsr import (_Conv3Params, apply_upsample2_conv3,
                              nearest_up2)


class CondResBlock(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb):
        te = nn.Dense(self.dim_out * 2, dtype=self.dtype,
                      name="time_dense")(jax.nn.silu(t_emb))
        scale, shift = jnp.split(te[:, None, None, :], 2, axis=-1)
        h = nn.Conv(self.dim_out, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = h * (scale + 1) + shift
        h = jax.nn.silu(h)
        h = nn.Conv(self.dim_out, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = jax.nn.silu(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), use_bias=False,
                        dtype=self.dtype, name="res_conv")(x)
        return h + x


class LinearAttention(nn.Module):
    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        g = self.param("norm_g", nn.initializers.ones_init(), (c,))
        xn = channel_layer_norm(x, g)
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      name="to_qkv")(xn)
        qkv = qkv.reshape(b, h * w, 3, self.heads, self.dim_head)
        # reference softmaxes q over the channel dim and k over the token
        # dim (module_util.py:172-173); our layout is (b, tokens, heads, d)
        q = jax.nn.softmax(qkv[:, :, 0], axis=3)       # over d
        k = jax.nn.softmax(qkv[:, :, 1], axis=1)       # over tokens
        v = qkv[:, :, 2] / (h * w)
        q = q * (self.dim_head ** -0.5)
        context = jnp.einsum("bnhd,bnhe->bhde", k, v,
                             preferred_element_type=jnp.float32)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, h, w, hidden).astype(self.dtype)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="to_out")(out)
        g2 = self.param("out_norm_g", nn.initializers.ones_init(), (c,))
        return channel_layer_norm(out, g2) + x


class ConditionalUNet(nn.Module):
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    depth: int = 4
    upscale: int = 1  # accepted for config parity; unused (reference too)
    dtype: jnp.dtype = jnp.float32
    upsample_mode: str = ""  # '' literal / 'tconv' / 'd2s2' (see Upsample)

    @nn.compact
    def __call__(self, xt, cond, time, *, deterministic: bool = True):
        if time.ndim == 0:
            time = time[None]
        nf = self.nf
        t = sinusoidal_pos_emb(time, nf)
        t = nn.Dense(nf * 4, dtype=self.dtype, name="time_dense1")(t)
        t = nn.gelu(t, approximate=False)
        t = nn.Dense(nf * 4, dtype=self.dtype, name="time_dense2")(t)

        x = jnp.concatenate([xt - cond, cond], axis=-1).astype(self.dtype)
        B, H, W, _ = x.shape
        s = 2 ** self.depth
        ph, pw = (s - H % s) % s, (s - W % s) % s
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        mode="reflect")

        x = nn.Conv(nf, (7, 7), padding=3, use_bias=False,
                    dtype=self.dtype, name="init_conv")(x)
        stem = x

        skips = []
        for i in range(self.depth):
            dim_in = nf * (2 ** i)
            dim_out = nf * (2 ** (i + 1))
            x = CondResBlock(dim_in, dtype=self.dtype,
                             name=f"down_{i}_b1")(x, t)
            skips.append(x)
            x = CondResBlock(dim_in, dtype=self.dtype,
                             name=f"down_{i}_b2")(x, t)
            x = LinearAttention(dim_in, dtype=self.dtype,
                                name=f"down_{i}_attn")(x)
            skips.append(x)
            if i != self.depth - 1:
                x = nn.Conv(dim_out, (4, 4), strides=2, padding=1,
                            use_bias=True, dtype=self.dtype,
                            name=f"down_{i}_down")(x)
            else:
                x = nn.Conv(dim_out, (3, 3), padding=1, use_bias=False,
                            dtype=self.dtype, name=f"down_{i}_down")(x)

        mid = nf * (2 ** self.depth)
        x = CondResBlock(mid, dtype=self.dtype, name="mid_b1")(x, t)
        x = LinearAttention(mid, dtype=self.dtype, name="mid_attn")(x)
        x = CondResBlock(mid, dtype=self.dtype, name="mid_b2")(x, t)

        for i in reversed(range(self.depth)):
            dim_in = nf * (2 ** i)
            dim_out = nf * (2 ** (i + 1))
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = CondResBlock(dim_out, dtype=self.dtype,
                             name=f"up_{i}_b1")(x, t)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = CondResBlock(dim_out, dtype=self.dtype,
                             name=f"up_{i}_b2")(x, t)
            x = LinearAttention(dim_out, dtype=self.dtype,
                                name=f"up_{i}_attn")(x)
            if i != 0:
                # module_util.Upsample's conv is a plain Conv2d (bias=True)
                if self.upsample_mode:
                    # same param tree as the nn.Conv branch
                    k, kb = _Conv3Params(dim_in, x.shape[-1],
                                         name=f"up_{i}_up")()
                    x = apply_upsample2_conv3(x, k, kb, self.upsample_mode,
                                              self.dtype)
                else:
                    x = nn.Conv(dim_in, (3, 3), padding=1, use_bias=True,
                                dtype=self.dtype,
                                name=f"up_{i}_up")(nearest_up2(x))
            else:
                x = nn.Conv(dim_in, (3, 3), padding=1, use_bias=False,
                            dtype=self.dtype, name=f"up_{i}_up")(x)

        x = jnp.concatenate([x, stem], axis=-1)
        x = CondResBlock(nf, dtype=self.dtype, name="final_res")(x, t)
        x = nn.Conv(self.out_nc, (3, 3), padding=1, dtype=self.dtype,
                    name="final_conv")(x)
        return x[:, :H, :W, :].astype(jnp.float32)
