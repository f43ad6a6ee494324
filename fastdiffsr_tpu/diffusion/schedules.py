"""Beta schedules and derived diffusion buffers.

All eight schedule modes of the reference are supported
(reference: model/fastdiffsr_modules/diffusion.py:13-64). Schedules are
computed in float64 numpy at setup time (matching the reference's numpy
derivations, diffusion.py:109-155) and stored as float32 device arrays in a
pytree (:class:`ScheduleBuffers`) so the whole table rides into jitted
programs as constants.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def _warmup_beta(linear_start: float, linear_end: float, n_timestep: int,
                 warmup_frac: float) -> np.ndarray:
    betas = linear_end * np.ones(n_timestep, dtype=np.float64)
    warmup_time = int(n_timestep * warmup_frac)
    betas[:warmup_time] = np.linspace(
        linear_start, linear_end, warmup_time, dtype=np.float64)
    return betas


def make_beta_schedule(schedule: str,
                       n_timestep: int,
                       linear_start: float = 1e-4,
                       linear_end: float = 2e-2,
                       cosine_s: float = 8e-3) -> np.ndarray:
    """Return betas as float64 numpy of shape (n_timestep,).

    Modes: quad, linear, warmup10, warmup50, const, jsd, cosine,
    linear_cosine (the FastDiffSR T=20 schedule: beta_linear + 2*beta_cosine,
    clipped to [0, 0.999]; reference diffusion.py:50-61).
    """
    if schedule == "quad":
        betas = np.linspace(linear_start ** 0.5, linear_end ** 0.5,
                            n_timestep, dtype=np.float64) ** 2
    elif schedule == "linear":
        betas = np.linspace(linear_start, linear_end,
                            n_timestep, dtype=np.float64)
    elif schedule == "warmup10":
        betas = _warmup_beta(linear_start, linear_end, n_timestep, 0.1)
    elif schedule == "warmup50":
        betas = _warmup_beta(linear_start, linear_end, n_timestep, 0.5)
    elif schedule == "const":
        betas = linear_end * np.ones(n_timestep, dtype=np.float64)
    elif schedule == "jsd":
        # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(n_timestep, 1, n_timestep, dtype=np.float64)
    elif schedule == "cosine":
        timesteps = (np.arange(n_timestep + 1, dtype=np.float64) / n_timestep
                     + cosine_s)
        alphas = timesteps / (1 + cosine_s) * math.pi / 2
        alphas = np.cos(alphas) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, a_min=None, a_max=0.999)
    elif schedule == "linear_cosine":
        betas1 = np.linspace(linear_start, linear_end, n_timestep,
                             dtype=np.float64)
        steps = n_timestep + 1
        x = np.linspace(0, steps, steps)
        alphas_cumprod = np.cos(
            ((x / steps) + cosine_s) / (1 + cosine_s) * np.pi * 0.5) ** 2
        alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
        betas2 = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
        betas2 = np.clip(betas2, a_min=0, a_max=0.999)
        betas = betas1 + 2.0 * betas2
        betas = np.clip(betas, a_min=0, a_max=0.999)
    else:
        raise NotImplementedError(schedule)
    return betas


@struct.dataclass
class ScheduleBuffers:
    """Derived diffusion constants (all float32, registered as pytree leaves).

    Mirrors the buffer set the reference registers at
    diffusion.py:109-155, with ``sqrt_alphas_cumprod_prev`` of length T+1
    (= sqrt(append(1, alphas_cumprod))).
    """

    betas: jax.Array                        # (T,)
    alphas_cumprod: jax.Array               # (T,)
    alphas_cumprod_prev: jax.Array          # (T,)
    sqrt_alphas_cumprod: jax.Array          # (T,)
    sqrt_alphas_cumprod_prev: jax.Array     # (T+1,)
    sqrt_one_minus_alphas_cumprod: jax.Array  # (T,)
    sqrt_recip_alphas_cumprod: jax.Array    # (T,)
    sqrt_recipm1_alphas_cumprod: jax.Array  # (T,)
    posterior_variance: jax.Array           # (T,)
    posterior_log_variance_clipped: jax.Array  # (T,)
    posterior_mean_coef1: jax.Array         # (T,)
    posterior_mean_coef2: jax.Array         # (T,)
    num_timesteps: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, schedule_opt: dict) -> "ScheduleBuffers":
        """Build from a reference-schema schedule dict
        ({schedule, n_timestep, linear_start, linear_end})."""
        betas = make_beta_schedule(
            schedule=schedule_opt["schedule"],
            n_timestep=schedule_opt["n_timestep"],
            linear_start=schedule_opt["linear_start"],
            linear_end=schedule_opt["linear_end"],
        )
        return cls.from_betas(betas)

    @classmethod
    def from_betas(cls, betas: np.ndarray) -> "ScheduleBuffers":
        betas = np.asarray(betas, dtype=np.float64)
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        posterior_variance = (betas * (1.0 - alphas_cumprod_prev)
                              / (1.0 - alphas_cumprod))

        def f32(a):
            return jnp.asarray(a, dtype=jnp.float32)

        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_alphas_cumprod_prev=f32(
                np.sqrt(np.append(1.0, alphas_cumprod))),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(
                np.sqrt(1.0 / alphas_cumprod - 1.0)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(
                np.log(np.maximum(posterior_variance, 1e-20))),
            posterior_mean_coef1=f32(
                betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
            posterior_mean_coef2=f32(
                (1.0 - alphas_cumprod_prev) * np.sqrt(alphas)
                / (1.0 - alphas_cumprod)),
            num_timesteps=int(betas.shape[0]),
        )
