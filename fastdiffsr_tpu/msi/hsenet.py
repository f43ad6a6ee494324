"""HSENet in Flax (NHWC) — hybrid-scale self-similarity SR network.

Parity target: MSI_SR_model/model/hsenet.py —
- MeanShift with the UCMerced rgb mean (hsenet.py:106-115, 412-414): plain
  subtract/add here (the reference freezes the 1x1 conv anyway);
- BasicBlock conv+ReLU (:116-127);
- NonLocalBlock2D embedded-gaussian self-attention, W zero-init (:184-230);
- AdjustedNonLocalBlock cross-scale non-local (:233-275): theta from the
  downscaled branch, phi/g from the base branch;
- SSEM (:325-365): head -> {main branch 2xBB, attention branch
  NonLocal+1x1+sigmoid} -> gated product -> tail, residual;
- HSEM (:278-322): base SSEM + half-scale SSEM (bilinear down/up) fused by
  the adjusted non-local block, residual;
- BasicModule (:368-398): 2 BB head -> HSEM -> 2 BB tail, residual;
- HSENET (:401-441): head conv -> 10 BasicModules (+global skip) ->
  pixelshuffle upsampler -> tail conv. Config n_feats=64, n_BMs=10
  (hsenet.py:651).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.nafnet import pixel_shuffle

UCM_RGB_MEAN = (0.4916, 0.4991, 0.4565)


class BasicBlock(nn.Module):
    feats: int
    act: bool = True
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        x = nn.Conv(self.feats, (k, k), padding=k // 2, dtype=self.dtype,
                    name="conv")(x)
        return nn.relu(x) if self.act else x


class NonLocalBlock2D(nn.Module):
    channels: int
    inter: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        g = nn.Conv(self.inter, (1, 1), dtype=self.dtype, name="g")(x)
        theta = nn.Conv(self.inter, (1, 1), dtype=self.dtype,
                        name="theta")(x)
        phi = nn.Conv(self.inter, (1, 1), dtype=self.dtype, name="phi")(x)
        n = h * w
        theta = theta.reshape(b, n, self.inter)
        phi = phi.reshape(b, n, self.inter)
        g = g.reshape(b, n, self.inter)
        f = jnp.einsum("bnc,bmc->bnm", theta, phi,
                       preferred_element_type=jnp.float32)
        f = jax.nn.softmax(f, axis=-1).astype(self.dtype)
        y = jnp.einsum("bnm,bmc->bnc", f, g,
                       preferred_element_type=jnp.float32)
        y = y.reshape(b, h, w, self.inter).astype(self.dtype)
        y = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros_init(),
                    bias_init=nn.initializers.zeros_init(), name="W")(y)
        return y + x


class AdjustedNonLocalBlock(nn.Module):
    channels: int
    inter: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x0, x1):
        b, h, w, c = x0.shape
        g = nn.Conv(self.inter, (1, 1), dtype=self.dtype, name="g")(x0)
        theta = nn.Conv(self.inter, (1, 1), dtype=self.dtype,
                        name="theta")(x1)
        phi = nn.Conv(self.inter, (1, 1), dtype=self.dtype, name="phi")(x0)
        n = h * w
        f = jnp.einsum("bnc,bmc->bnm",
                       theta.reshape(b, -1, self.inter),
                       phi.reshape(b, n, self.inter),
                       preferred_element_type=jnp.float32)
        f = jax.nn.softmax(f, axis=-1).astype(self.dtype)
        y = jnp.einsum("bnm,bmc->bnc", f, g.reshape(b, n, self.inter),
                       preferred_element_type=jnp.float32)
        y = y.reshape(b, h, w, self.inter).astype(self.dtype)
        y = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros_init(),
                    bias_init=nn.initializers.zeros_init(), name="W")(y)
        return y + x0


class SSEM(nn.Module):
    feats: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.feats
        head = BasicBlock(f, dtype=self.dtype, name="head")(x)
        mb = BasicBlock(f, dtype=self.dtype, name="mb1")(head)
        mb = BasicBlock(f, dtype=self.dtype, name="mb2")(mb)
        ab = NonLocalBlock2D(f, f // 2, dtype=self.dtype, name="ab_nl")(head)
        ab = nn.Conv(f, (1, 1), dtype=self.dtype, name="ab_conv")(ab)
        gated = mb * jax.nn.sigmoid(ab)
        tail = BasicBlock(f, dtype=self.dtype, name="tail")(gated)
        return x + tail


def _bilinear(x, shape_hw):
    # antialias=False: torch F.interpolate(mode='bilinear') never
    # antialiases (hsenet.py:308-313), jax.image.resize does by default
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, shape_hw[0], shape_hw[1], c),
                            method="bilinear", antialias=False)


class HSEM(nn.Module):
    feats: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x_base = SSEM(self.feats, dtype=self.dtype, name="base_scale")(x)
        x_down = _bilinear(x, (h // 2, w // 2))
        x_down = SSEM(self.feats, dtype=self.dtype, name="down_scale")(
            x_down)
        x_down = _bilinear(x_down, (h, w))
        ms = AdjustedNonLocalBlock(self.feats, self.feats // 2,
                                   dtype=self.dtype, name="nonlocal_base")(
                                       x_base, x_down)
        ms = BasicBlock(self.feats, dtype=self.dtype, name="tail")(ms)
        return x + ms


class BasicModule(nn.Module):
    feats: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = BasicBlock(self.feats, dtype=self.dtype, name="head1")(x)
        h = BasicBlock(self.feats, dtype=self.dtype, name="head2")(h)
        h = HSEM(self.feats, dtype=self.dtype, name="hsem")(h)
        h = BasicBlock(self.feats, dtype=self.dtype, name="tail1")(h)
        h = BasicBlock(self.feats, dtype=self.dtype, name="tail2")(h)
        return x + h


class HSENet(nn.Module):
    scale: int = 4
    n_feats: int = 64
    n_basic_modules: int = 10
    n_colors: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        mean = jnp.asarray(UCM_RGB_MEAN, jnp.float32)
        x = (x - mean).astype(self.dtype)

        x = nn.Conv(self.n_feats, (3, 3), padding=1, dtype=self.dtype,
                    name="head")(x)
        skip = x
        for i in range(self.n_basic_modules):
            x = BasicModule(self.n_feats, dtype=self.dtype,
                            name=f"bm_{i}")(x)
        x = skip + x

        s = self.scale
        idx = 0
        while s > 1:
            r = 3 if s % 3 == 0 else 2
            x = nn.Conv(self.n_feats * r * r, (3, 3), padding=1,
                        dtype=self.dtype, name=f"up_conv_{idx}")(x)
            x = pixel_shuffle(x, r)
            s //= r
            idx += 1
        x = nn.Conv(self.n_colors, (3, 3), padding=1, dtype=self.dtype,
                    name="tail")(x)
        return x.astype(jnp.float32) + mean
