"""NDSRGAN in Flax (NHWC): dense DRRDB generator + patch discriminator.

Parity target: MSI_SR_model/model/ndsrgan.py —
- DenseBlock (:59-75): 4 conv+LReLU growth layers, 3x3 fuse, x + 0.2*res
- DCRDB (:77-91): 3 DenseBlocks with cumulative 0.2 mixing + conv
- DRRDBnet (:94-160): 23 DCRDBs, each fed x + 0.2*sum(previous outputs)
  (the reference writes this out longhand; here it is a loop with a
  running sum — same math)
- GeneratorResNet (:162-211): conv -> DRRDB -> conv + skip -> nearest-up
  conv LReLU per 2x -> conv-LReLU-conv head
- Discriminator (:213-246): 4x4 conv blocks stride 2/2/2/1 with BatchNorm
  (GroupNorm(1) here: running batch stats buy nothing for a patch-GAN
  critic and single-program SPMD training prefers stateless norms), then
  a 4x4 conv to 1 logit map (patch discriminator).

Training (GANTrainer): LSGAN objective (args default penalty_type 'LS',
main_ndsrgan.py), L1 pixel loss + 1e-3 adversarial (weight_gan default);
the VGG content term requires pretrained VGG19 weights that this
environment cannot download — omitted and documented.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn


class DenseBlock(nn.Module):
    nf: int
    nc: int
    cl_num: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out1 = x
        for j in range(self.cl_num):
            y = nn.Conv(self.nc, (3, 3), padding=1, dtype=self.dtype,
                        name=f"cl_{j}")(x)
            y = nn.leaky_relu(y, 0.2)
            x = jnp.concatenate([x, y], axis=-1)
        x = nn.Conv(self.nf, (3, 3), padding=1, dtype=self.dtype,
                    name="fuse")(x)
        return out1 + x * 0.2


class DCRDB(nn.Module):
    nf: int
    nc: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out1 = DenseBlock(self.nf, self.nc, dtype=self.dtype,
                          name="rdb1")(x)
        out2 = DenseBlock(self.nf, self.nc, dtype=self.dtype,
                          name="rdb2")(x + 0.2 * out1)
        out3 = DenseBlock(self.nf, self.nc, dtype=self.dtype,
                          name="rdb3")(x + 0.2 * out1 + 0.2 * out2)
        out4 = nn.Conv(self.nf, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x + 0.2 * out1 + 0.2 * out2
                                    + 0.2 * out3)
        return out4 * 0.2 + x


class DRRDBNet(nn.Module):
    """Full NDSRGAN generator."""

    scale: int = 4
    in_channels: int = 3
    out_channels: int = 3
    nf: int = 64
    nc: int = 32
    n_blocks: int = 23
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = x.astype(self.dtype)
        feat = nn.Conv(self.nf, (3, 3), padding=1, dtype=self.dtype,
                       name="conv1")(x)

        # 23 DCRDBs with cumulative 0.2-scaled skip accumulation
        acc = feat
        for i in range(self.n_blocks):
            m = DCRDB(self.nf, self.nc, dtype=self.dtype,
                      name=f"dcrdb_{i}")(acc)
            acc = acc + 0.2 * m
        trunk = nn.Conv(self.nf, (3, 3), padding=1, dtype=self.dtype,
                        name="conv2")(acc)
        out = feat + trunk

        scale = self.scale
        # the reference only constructs correct upsampling for 2^n / 3^n
        # scales (ndsrgan.py:192-196 — scale 6 silently builds a single 3x
        # stage); reject the divergent cases instead of mis-converting
        if (scale & (scale - 1)) != 0:
            s = scale
            while s % 3 == 0:
                s //= 3
            if s != 1:
                raise ValueError(
                    f"DRRDBNet upscale_factor={scale} unsupported: the "
                    "reference generator only builds 2^n or 3^n stacks")
        idx = 0
        while scale > 1:
            r = 3 if scale % 3 == 0 else 2
            b, h, w, c = out.shape
            out = jax.image.resize(out, (b, h * r, w * r, c),
                                   method="nearest")
            out = nn.Conv(self.nf, (3, 3), padding=1, dtype=self.dtype,
                          name=f"up_conv_{idx}")(out)
            out = nn.leaky_relu(out, 0.2)
            scale //= r
            idx += 1

        out = nn.Conv(self.nf, (3, 3), padding=1, dtype=self.dtype,
                      name="head_conv1")(out)
        out = nn.leaky_relu(out, 0.2)
        out = nn.Conv(self.out_channels, (3, 3), padding=1,
                      dtype=self.dtype, name="head_conv2")(out)
        return out.astype(jnp.float32)


class Discriminator(nn.Module):
    in_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        cfg = [(64, 2, False), (128, 2, True), (256, 2, True),
               (512, 1, True)]
        for i, (nf, stride, norm) in enumerate(cfg):
            x = nn.Conv(nf, (4, 4), strides=stride, padding=1,
                        dtype=self.dtype, name=f"block_{i}_conv")(x)
            if norm:
                x = nn.GroupNorm(num_groups=1, epsilon=1e-5,
                                 name=f"block_{i}_norm")(x)
            x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (4, 4), padding=1, dtype=self.dtype, name="out")(x)
        return x.astype(jnp.float32)


class GANTrainer:
    """NDSRGAN adversarial training on top of the shared data path
    (reference ndsrgan.py train():310+, LS penalty)."""

    def __init__(self, args, logger=None):
        import logging
        import optax

        from ..train.state import create_train_state

        self.args = args
        self.scale = int(getattr(args, "scale_factor", 4))
        self.logger = logger or logging.getLogger("msi")
        self.g = DRRDBNet(scale=self.scale,
                          nf=int(getattr(args, "g_nf", 64)),
                          nc=int(getattr(args, "g_nc", 32)),
                          n_blocks=int(getattr(args, "g_blocks", 23)))
        self.d = Discriminator()
        lr = float(getattr(args, "lr", 2e-4))
        self.tx_g = optax.adam(lr, b1=0.9, b2=0.999)
        self.tx_d = optax.adam(lr, b1=0.9, b2=0.999)

        rng = jax.random.PRNGKey(0)
        crop = int(getattr(args, "crop_size", 64))
        ls = max(crop // self.scale, 8)
        g_params = self.g.init(rng, jnp.zeros((1, ls, ls, 3)))["params"]
        d_params = self.d.init(rng, jnp.zeros((1, crop, crop, 3)))["params"]
        self.g_state = create_train_state(g_params, self.tx_g)
        self.d_state = create_train_state(d_params, self.tx_d)
        self.w_gan = float(getattr(args, "weight_gan", 1e-3))

        import optax as _optax

        def steps(g_state, d_state, lr_b, hr_b):
            fake = self.g.apply({"params": g_state.params}, lr_b)

            def d_loss_fn(d_params):
                real_logit = self.d.apply({"params": d_params}, hr_b)
                fake_logit = self.d.apply({"params": d_params},
                                          jax.lax.stop_gradient(fake))
                # LSGAN: (D(real)-1)^2 + D(fake)^2
                return (jnp.mean((real_logit - 1.0) ** 2)
                        + jnp.mean(fake_logit ** 2))

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_state.params)
            d_updates, d_opt = self.tx_d.update(d_grads, d_state.opt_state,
                                                d_state.params)
            d_params = _optax.apply_updates(d_state.params, d_updates)
            d_state = d_state.replace(step=d_state.step + 1,
                                      params=d_params, opt_state=d_opt)

            def g_loss_fn(g_params):
                fake = self.g.apply({"params": g_params}, lr_b)
                pixel = jnp.mean(jnp.abs(fake - hr_b))
                adv = jnp.mean((self.d.apply({"params": d_state.params},
                                             fake) - 1.0) ** 2)
                return pixel + self.w_gan * adv, (pixel, adv)

            (g_loss, (pixel, adv)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(g_state.params)
            g_updates, g_opt = self.tx_g.update(g_grads, g_state.opt_state,
                                                g_state.params)
            g_params = _optax.apply_updates(g_state.params, g_updates)
            g_state = g_state.replace(step=g_state.step + 1,
                                      params=g_params, opt_state=g_opt)
            return g_state, d_state, {"g": g_loss, "d": d_loss,
                                      "pixel": pixel, "adv": adv}

        self._steps_fn = steps
        self._steps = jax.jit(steps, donate_argnums=(0, 1))
        self.mesh = None

    def _enable_dp(self, batch_size: int):
        """DP both GAN steps over a device mesh (G/D params replicated,
        batch sharded — the SPMD form of the reference's nn.DataParallel
        wrap, model/networks.py:116-118)."""
        from ..parallel import (auto_mesh, batch_sharding,
                                replicated_sharding)
        mesh = auto_mesh(batch_size)
        if mesh is None or self.mesh is not None:
            return
        self.mesh = mesh
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        self._steps = jax.jit(
            self._steps_fn, donate_argnums=(0, 1),
            in_shardings=(repl, repl, data, data),
            out_shardings=(repl, repl, repl))
        self.logger.info(f"DP mesh: {mesh.devices.size} devices")

    def train(self, train_dirs, num_epochs=1, batch_size=2,
              max_steps=None):
        import numpy as np

        from .data import RGBSRDataset, MSIDataLoader
        self._enable_dp(batch_size)
        ds = RGBSRDataset(train_dirs,
                          int(getattr(self.args, "crop_size", 64)),
                          self.scale, split="train")
        # shuffle=True implies drop_last, so every batch fills the mesh
        loader = MSIDataLoader(ds, batch_size=batch_size, shuffle=True)
        step = 0
        for epoch in range(num_epochs):
            for batch in loader:
                self.g_state, self.d_state, m = self._steps(
                    self.g_state, self.d_state,
                    jnp.asarray(batch["LR"]), jnp.asarray(batch["HR"]))
                step += 1
                if max_steps and step >= max_steps:
                    return {k: float(v) for k, v in m.items()}
            self.logger.info(
                f"epoch {epoch + 1}: " +
                " ".join(f"{k} {float(v):.4f}" for k, v in m.items()))
        return {k: float(v) for k, v in m.items()}
