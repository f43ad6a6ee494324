"""Reference-compatible model API layer.

The reference exposes one trainer wrapper class ``DDPM`` with a fixed
method surface (model/model.py:11-166, model/base_model.py, factory
model/__init__.py:5-9 + networks.define_G:82-119). Users porting from the
reference get the same surface here, backed by the jitted TPU train/sample
steps:

    create_model(opt) -> DDPM
      .feed_data(data)           .optimize_parameters()
      .test(continous=False)     .sample(batch_size, continous)
      .set_new_noise_schedule(schedule_opt, phase)
      .get_current_log()         .get_current_visuals(...)
      .save_network(epoch, iter) .load_network()
      .print_network()           .count_parameters()

Differences by design: device placement is implicit (JAX), multi-device
data parallelism replaces nn.DataParallel, and state lives in an immutable
TrainState that the wrapper mutates by replacement.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np

import jax
import jax.numpy as jnp


def define_G(opt, dtype=jnp.float32):
    """Build (engine spec, denoiser module) from a reference-schema opt
    (networks.define_G parity: model.unet + model.beta_schedule blocks)."""
    from .diffusion import DiffusionSpec
    from .models.unet_fastdiffsr import unet_from_config
    from .models.unet_guided import guided_unet_from_config
    from .models.unet_sr3 import sr3_unet_from_config

    model_opt = opt["model"]
    variant = model_opt["which_model_G"]
    image_size = int(model_opt["diffusion"]["image_size"])
    spec = DiffusionSpec.for_variant(variant)
    if variant == "fastdiffsr":
        net = unet_from_config(model_opt["unet"], dtype=dtype)
    elif variant in ("ddpm", "tesr"):
        net = sr3_unet_from_config(model_opt["unet"], image_size=image_size,
                                   dtype=dtype)
    elif variant == "gdp":
        net = guided_unet_from_config(model_opt["unet"],
                                      image_size=image_size, dtype=dtype)
    else:
        raise ValueError(variant)
    return spec, net


def create_model(opt) -> "DDPM":
    """model/__init__.py:5-9 parity."""
    return DDPM(opt)


class DDPM:
    def __init__(self, opt):
        from .diffusion import DiffusionEngine, ScheduleBuffers
        from .train import create_train_state, make_train_step, \
            make_sample_fn
        from .train.state import make_optimizer

        self.opt = opt
        self.spec, self.net = define_G(opt)
        sched = opt["model"]["beta_schedule"]
        self._buffers = {
            phase: ScheduleBuffers.create(sched[phase])
            for phase in ("train", "val") if sched.get(phase)
        }
        self._engine_cls = DiffusionEngine
        self.engine = DiffusionEngine(self.spec,
                                      self._buffers.get("train") or
                                      next(iter(self._buffers.values())))

        r = int(opt["model"]["diffusion"]["image_size"])
        rng = jax.random.PRNGKey(0)
        params = self.net.init(
            rng, jnp.zeros((1, r, r, self.net.in_channel)),
            jnp.ones((1,)))["params"]

        train_opt = opt.get("train") or {}
        self.tx = make_optimizer(train_opt.get("optimizer") or {})
        self.state = create_train_state(params, self.tx)

        def apply_fn(params, x_in, level, drng):
            kwargs = ({"rngs": {"dropout": drng}, "deterministic": False}
                      if drng is not None else {})
            return self.net.apply({"params": params}, x_in, level, **kwargs)

        self._apply_fn = apply_fn
        ema_cfg = train_opt.get("ema_scheduler") or {}
        self._train_step = make_train_step(
            self.engine, apply_fn, self.tx,
            ema_decay=float(ema_cfg.get("ema_decay", 0.9999)),
            ema_start=int(ema_cfg.get("step_start_ema", 5000)))
        self._sample_fns = {}
        self._rng = jax.random.PRNGKey(42)
        self.data = None
        self.SR = None
        self.log_dict = OrderedDict()
        self.begin_step = 0
        self.begin_epoch = 0
        self.load_network()

    # ------------------------------------------------------------------ #

    def feed_data(self, data: dict):
        """dict of numpy/jax NHWC arrays {'HR','SR',('LR','Index')}."""
        self.data = {k: jnp.asarray(v) for k, v in data.items()
                     if not isinstance(v, (str, list))}

    def optimize_parameters(self):
        self._rng, key = jax.random.split(self._rng)
        self.state, metrics = self._train_step(self.state, self.data, key)
        self.log_dict["l_pix"] = float(metrics["l_pix"])

    def set_new_noise_schedule(self, schedule_opt=None,
                               schedule_phase="train"):
        from .diffusion import ScheduleBuffers
        if schedule_opt is not None:
            self._buffers[schedule_phase] = ScheduleBuffers.create(
                schedule_opt)
        self.engine = self._engine_cls(self.spec,
                                       self._buffers[schedule_phase])

    def test(self, continous: bool = False, use_ema: bool = False):
        from .train import make_sample_fn
        key = (self.engine.buffers.num_timesteps, continous)
        if key not in self._sample_fns:
            self._sample_fns[key] = make_sample_fn(
                self.engine, self._apply_fn, return_trajectory=continous)
        params = self.state.ema_or_params(use_ema)
        self._rng, k = jax.random.split(self._rng)
        out = self._sample_fns[key](params, self.data["SR"], k)
        self.SR = out[1] if continous else out
        return self.SR

    def sample(self, batch_size: int = 1, continous: bool = False):
        shape = (batch_size,
                 int(self.opt["model"]["diffusion"]["image_size"]),
                 int(self.opt["model"]["diffusion"]["image_size"]),
                 int(self.opt["model"]["diffusion"]["channels"]))
        self._rng, k = jax.random.split(self._rng)

        def denoise(x_in, level):
            return self._apply_fn(self.state.params, x_in, level, None)

        import dataclasses
        uncond = dataclasses.replace(self.engine.spec, conditional=False)
        eng = self._engine_cls(uncond, self.engine.buffers)
        self.SR = eng.sample(denoise, None, k, shape=shape,
                             return_trajectory=continous)
        return self.SR

    # ------------------------------------------------------------------ #

    def get_current_log(self):
        return self.log_dict

    def get_current_visuals(self, need_LR: bool = True,
                            sample: bool = False):
        out = OrderedDict()
        if sample:
            out["SAM"] = np.asarray(self.SR)
            return out
        out["SR"] = np.asarray(self.SR) if self.SR is not None else None
        if self.data:
            out["INF"] = np.asarray(self.data["SR"])
            out["HR"] = np.asarray(self.data["HR"])
            if need_LR and "LR" in self.data:
                out["LR"] = np.asarray(self.data["LR"])
        return out

    def count_parameters(self) -> int:
        from .utils.profiling import param_count
        return param_count(self.state.params)

    def print_network(self):
        import logging
        logging.getLogger("base").info(
            f"Network G [{type(self.net).__name__}] with "
            f"{self.count_parameters():,} params")

    def save_network(self, epoch: int, iter_step: int) -> str:
        from .train.checkpoint import save_state
        ckpt = self.opt["path"]["checkpoint"]
        self.state = self.state.replace(
            epoch=jnp.asarray(epoch, jnp.int32))
        return save_state(self.state, ckpt, it=iter_step, epoch=epoch)

    def load_network(self):
        from .train.checkpoint import load_state
        path = (self.opt.get("path") or {}).get("resume_state")
        if path:
            self.state = load_state(path, self.state)
            self.begin_step = int(self.state.step)
            self.begin_epoch = int(self.state.epoch)
