"""TransENet in Flax (NHWC) — transformer-enhanced SR.

Parity target: MSI_SR_model/model/transenet.py:288-433 +
model/transformer.py —
- head conv -> 3 residual feature stages (5 ResBlocks each,
  transenet.py:252-283) + pixelshuffle upsampler on stage3;
- 1x1 reductions (n_feats/4), 8x8 patchify to 512-d tokens
  (p1 p2 c flattening order), per-stream ViT encoders (depth 8, heads 6,
  dim_head 32, tanh-approx GELU MLP dim 512);
- decoders (depth 1): self-attn -> cross-attn (q from the upsampled
  stream, k/v from the encoder stage, shared PreNorm — transformer.py:
  29-57,156-190) -> MLP;
- unpatchify, 1x1 expand, tail conv; UCMerced mean shift.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.nafnet import pixel_shuffle
from .hsenet import UCM_RGB_MEAN


class ResBlock(nn.Module):
    feats: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.feats, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.feats, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        return x + h


class FeatStage(nn.Module):
    feats: int
    n_blocks: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            x = ResBlock(self.feats, dtype=self.dtype, name=f"rb_{i}")(x)
        return x


def _attend(q, k, v, heads, scale):
    b, n, _ = q.shape
    hd = q.shape[-1] // heads
    to_h = lambda t: t.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    q, k, v = map(to_h, (q, k, v))
    dots = jnp.einsum("bhid,bhjd->bhij", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(dots, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, n, heads * hd)


class SelfAttention(nn.Module):
    dim: int
    heads: int = 6
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = _attend(q, k, v, self.heads, self.dim ** -0.5)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class CrossAttention(nn.Module):
    dim: int
    heads: int = 6
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, m):
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="to_k")(m)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="to_v")(m)
        out = _attend(q, k, v, self.heads, self.dim ** -0.5)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class MLP(nn.Module):
    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=True)  # reference uses tanh-approx GELU
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class Encoder(nn.Module):
    dim: int
    depth: int
    heads: int = 6
    dim_head: int = 32
    mlp_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            xn = nn.LayerNorm(dtype=self.dtype, name=f"ln_attn_{i}")(x)
            x = x + SelfAttention(self.dim, self.heads, self.dim_head,
                                  dtype=self.dtype, name=f"attn_{i}")(xn)
            xn = nn.LayerNorm(dtype=self.dtype, name=f"ln_mlp_{i}")(x)
            x = x + MLP(self.dim, self.mlp_dim, dtype=self.dtype,
                        name=f"mlp_{i}")(xn)
        return x


class Decoder(nn.Module):
    dim: int
    depth: int = 1
    heads: int = 6
    dim_head: int = 32
    mlp_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, m):
        for i in range(self.depth):
            xn = nn.LayerNorm(dtype=self.dtype, name=f"ln_self_{i}")(x)
            x = x + SelfAttention(self.dim, self.heads, self.dim_head,
                                  dtype=self.dtype, name=f"self_{i}")(xn)
            ln = nn.LayerNorm(dtype=self.dtype, name=f"ln_cross_{i}")
            x = x + CrossAttention(self.dim, self.heads, self.dim_head,
                                   dtype=self.dtype, name=f"cross_{i}")(
                                       ln(x), ln(m))
            xn = nn.LayerNorm(dtype=self.dtype, name=f"ln_mlp_{i}")(x)
            x = x + MLP(self.dim, self.mlp_dim, dtype=self.dtype,
                        name=f"mlp_{i}")(xn)
        return x


def patchify(x, p):
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // p) * (w // p), p * p * c)


def unpatchify(x, p, h, w, c):
    b = x.shape[0]
    x = x.reshape(b, h // p, w // p, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


class TransENet(nn.Module):
    scale: int = 4
    n_feats: int = 64
    n_colors: int = 3
    en_depth: int = 8
    de_depth: int = 1
    dim: int = 512
    heads: int = 6
    dim_head: int = 32
    mlp_dim: int = 512
    patch_size: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        mean = jnp.asarray(UCM_RGB_MEAN, jnp.float32)
        x = (x - mean).astype(self.dtype)
        nf = self.n_feats
        red = nf // 4
        p = self.patch_size

        x = nn.Conv(nf, (3, 3), padding=1, dtype=self.dtype, name="head")(x)
        f1 = FeatStage(nf, dtype=self.dtype, name="stage1")(x)
        f2 = FeatStage(nf, dtype=self.dtype, name="stage2")(x)
        f3 = FeatStage(nf, dtype=self.dtype, name="stage3")(x)

        ups = f3
        s = self.scale
        idx = 0
        while s > 1:
            r = 3 if s % 3 == 0 else 2
            ups = nn.Conv(nf * r * r, (3, 3), padding=1, dtype=self.dtype,
                          name=f"up_conv_{idx}")(ups)
            ups = pixel_shuffle(ups, r)
            s //= r
            idx += 1

        f1 = nn.Conv(red, (1, 1), dtype=self.dtype, name="red1")(f1)
        f2 = nn.Conv(red, (1, 1), dtype=self.dtype, name="red2")(f2)
        f3 = nn.Conv(red, (1, 1), dtype=self.dtype, name="red3")(f3)
        ups_r = nn.Conv(red, (1, 1), dtype=self.dtype, name="red_up")(ups)

        hb, wb = ups_r.shape[1], ups_r.shape[2]
        t1 = nn.Dense(self.dim, dtype=self.dtype,
                      name="emb1")(patchify(f1, p))
        t2 = nn.Dense(self.dim, dtype=self.dtype,
                      name="emb2")(patchify(f2, p))
        t3 = nn.Dense(self.dim, dtype=self.dtype,
                      name="emb3")(patchify(f3, p))
        tu = nn.Dense(self.dim, dtype=self.dtype,
                      name="emb_up")(patchify(ups_r, p))

        kw = dict(dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                  mlp_dim=self.mlp_dim, dtype=self.dtype)
        t1 = Encoder(depth=self.en_depth, name="enc1", **kw)(t1)
        t2 = Encoder(depth=self.en_depth, name="enc2", **kw)(t2)
        t3 = Encoder(depth=self.en_depth, name="enc3", **kw)(t3)
        tu = Encoder(depth=self.en_depth, name="enc_up", **kw)(tu)

        tu = Decoder(depth=self.de_depth, name="dec3", **kw)(tu, t3)
        tu = Decoder(depth=self.de_depth, name="dec2", **kw)(tu, t2)
        tu = Decoder(depth=self.de_depth, name="dec1", **kw)(tu, t1)

        tu = nn.Dense(red * p * p, dtype=self.dtype, name="to_patch")(tu)
        out = unpatchify(tu, p, hb, wb, red)
        out = nn.Conv(nf, (1, 1), dtype=self.dtype, name="span")(out)
        out = nn.Conv(self.n_colors, (3, 3), padding=1, dtype=self.dtype,
                      name="tail")(out)
        return out.astype(jnp.float32) + mean
