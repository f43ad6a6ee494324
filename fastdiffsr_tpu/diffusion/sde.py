"""IR-SDE — mean-reverting SDE for EDiffSR (TPU-native port).

Parity target: EDiffSR/codes/utils/sde_utils.py (class IRSDE:80-321) —
a mean-reverting SDE dx = theta_t (mu - x) dt + sigma_t dW whose stationary
mean mu is the (upscaled) LQ image:

- theta schedules cosine / linear / constant over t = 1..T
  (sde_utils.py:89-139; arrays have length T+1, index 0 unused),
- sigma_t = sqrt(2 theta_t) * max_sigma; sigma_bar from the theta cumsum
  (:123-130, 137-141), dt = -log(eps)/Theta_T (:143),
- score from predicted noise: score = -noise/sigma_bar(t) (:184-190),
- training states: t ~ U{1..T}, x_t = mu_bar(x0,t) + sigma_bar(t) eps
  (generate_random_states :305-321),
- closed-form optimal reverse step (:197-205) and the maximum-likelihood
  matching loss against it (models/denoising_model.py:127-148,
  modules/loss.py:9-30),
- ``reverse_sde``: T=100 steps — here ONE ``jax.lax.scan`` program instead
  of the reference's per-step python dispatch (:231-244).

All state is NHWC; the denoiser is a closure noise_fn(x, mu, t)->noise.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# noise_fn(x: (B,H,W,C), mu: (B,H,W,C), t: (B,)) -> predicted noise
NoiseFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]


def make_theta_schedule(schedule: str, T: int) -> np.ndarray:
    """theta_t for t = 0..T (index 0 present but unused), float64."""
    if schedule == "constant":
        return np.ones(T + 1, dtype=np.float64)
    if schedule == "linear":
        n = T + 1
        scale = 1000.0 / n
        return np.linspace(scale * 1e-4, scale * 2e-2, n, dtype=np.float64)
    if schedule == "cosine":
        s = 0.008
        timesteps = T + 2
        steps = timesteps + 1
        x = np.linspace(0, timesteps, steps, dtype=np.float64)
        ac = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
        ac = ac / ac[0]
        betas = 1 - ac[1:-1]
        return betas  # length T+1
    raise NotImplementedError(schedule)


@struct.dataclass
class IRSDEBuffers:
    thetas: jax.Array          # (T+1,)
    sigmas: jax.Array          # (T+1,)
    thetas_cumsum: jax.Array   # (T+1,), starts at 0
    sigma_bars: jax.Array      # (T+1,)
    dt: float = struct.field(pytree_node=False)
    max_sigma: float = struct.field(pytree_node=False)
    T: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, max_sigma: float, T: int = 100,
               schedule: str = "cosine", eps: float = 0.005
               ) -> "IRSDEBuffers":
        max_sigma = max_sigma / 255.0 if max_sigma >= 1 else max_sigma
        thetas = make_theta_schedule(schedule, T)
        sigmas = np.sqrt(max_sigma ** 2 * 2 * thetas)
        thetas_cumsum = np.cumsum(thetas) - thetas[0]
        dt = float(-1.0 / thetas_cumsum[-1] * math.log(eps))
        sigma_bars = np.sqrt(
            max_sigma ** 2 * (1 - np.exp(-2 * thetas_cumsum * dt)))
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        return cls(thetas=f32(thetas), sigmas=f32(sigmas),
                   thetas_cumsum=f32(thetas_cumsum),
                   sigma_bars=f32(sigma_bars), dt=dt,
                   max_sigma=float(max_sigma), T=int(T))


class IRSDE:
    """Pure-functional IR-SDE: mu (the LQ image batch) is passed explicitly
    instead of the reference's ``set_mu`` mutable state."""

    def __init__(self, buffers: IRSDEBuffers):
        self.b = buffers

    # ------------------------------------------------------------------ #
    # forward / marginal quantities (t broadcasting: scalar or (B,1,1,1))
    # ------------------------------------------------------------------ #

    def mu_bar(self, x0, mu, t):
        return mu + (x0 - mu) * jnp.exp(-self.b.thetas_cumsum[t] * self.b.dt)

    def sigma_bar(self, t):
        return self.b.sigma_bars[t]

    def generate_random_states(self, rng, x0, mu):
        """(timesteps (B,1,1,1), noisy_states) — sde_utils.py:305-321."""
        bsz = x0.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (bsz, 1, 1, 1), 1, self.b.T + 1)
        mean = self.mu_bar(x0, mu, t)
        noise = jax.random.normal(rng_n, mean.shape, jnp.float32)
        return t, mean + noise * self.sigma_bar(t)

    def noise_state(self, tensor, rng):
        """x_T ~ LQ + max_sigma * eps (sde_utils.py:323).

        ``rng`` may be one key or a (B,)/(B,2) batch of per-image keys
        (the engine's batched-rng contract, diffusion/engine.py): with
        per-image keys the noise stream is a function of each image's own
        key, so restores are invariant to batch grouping — the basis of
        the DP-meshed EDiffSR eval path. At batch 1 the two forms draw
        identical values (jax.random.normal of (1,h,w,c) and (h,w,c) use
        the same bit stream)."""
        from .engine import rng_is_batched, _normal_per_key
        if rng_is_batched(rng):
            eps = _normal_per_key(rng, tensor.shape)
        else:
            eps = jax.random.normal(rng, tensor.shape, jnp.float32)
        return tensor + eps * self.b.max_sigma

    # ------------------------------------------------------------------ #
    # reverse dynamics
    # ------------------------------------------------------------------ #

    def get_score_from_noise(self, noise, t):
        return -noise / self.sigma_bar(t)

    def sde_reverse_drift(self, x, mu, score, t):
        return (self.b.thetas[t] * (mu - x)
                - self.b.sigmas[t] ** 2 * score) * self.b.dt

    def ode_reverse_drift(self, x, mu, score, t):
        return (self.b.thetas[t] * (mu - x)
                - 0.5 * self.b.sigmas[t] ** 2 * score) * self.b.dt

    def reverse_sde_step_mean(self, x, mu, score, t):
        return x - self.sde_reverse_drift(x, mu, score, t)

    def reverse_sde_step(self, x, mu, score, t, noise):
        return (x - self.sde_reverse_drift(x, mu, score, t)
                - self.b.sigmas[t] * math.sqrt(self.b.dt) * noise)

    def reverse_optimum_step(self, xt, x0, mu, t):
        """Closed-form optimal x_{t-1} (sde_utils.py:197-205)."""
        b = self.b
        A = jnp.exp(-b.thetas[t] * b.dt)
        B = jnp.exp(-b.thetas_cumsum[t] * b.dt)
        C = jnp.exp(-b.thetas_cumsum[t - 1] * b.dt)
        term1 = A * (1 - C ** 2) / (1 - B ** 2)
        term2 = C * (1 - A ** 2) / (1 - B ** 2)
        return term1 * (xt - mu) + term2 * (x0 - mu) + mu

    def weights(self, t):
        return jnp.exp(-self.b.thetas_cumsum[t] * self.b.dt)

    # ------------------------------------------------------------------ #
    # training loss (maximum-likelihood matching)
    # ------------------------------------------------------------------ #

    def matching_loss(self, noise_fn: NoiseFn, x0, mu, rng,
                      loss_type: str = "l1") -> jax.Array:
        t, state = self.generate_random_states(rng, x0, mu)
        noise = noise_fn(state, mu, t[:, 0, 0, 0])
        score = self.get_score_from_noise(noise, t)
        xt_1_expected = self.reverse_sde_step_mean(state, mu, score, t)
        xt_1_optimum = self.reverse_optimum_step(state, x0, mu, t)
        diff = xt_1_expected - xt_1_optimum
        if loss_type == "l1":
            per = jnp.mean(jnp.abs(diff), axis=(1, 2, 3))
        else:
            per = jnp.mean(diff ** 2, axis=(1, 2, 3))
        return jnp.mean(per)

    # ------------------------------------------------------------------ #
    # sampling: one scan over t = T..1
    # ------------------------------------------------------------------ #

    def reverse_sde(self, noise_fn: NoiseFn, xt, mu, rng,
                    ode: bool = False,
                    noise_seq: Optional[jax.Array] = None,
                    unroll: int = 1) -> jax.Array:
        T = self.b.T
        bsz = xt.shape[0]
        ts = jnp.arange(T, 0, -1)
        consts = {"t": ts}
        if noise_seq is not None:
            consts["noise"] = noise_seq[ts - 1]

        from .engine import (rng_is_batched, _normal_per_key,
                             _fold_in_per_key)
        batched_rng = rng is not None and rng_is_batched(rng)

        def step(x, c):
            t = c["t"]
            noise_pred = noise_fn(x, mu, jnp.full((bsz,), t, jnp.float32))
            score = self.get_score_from_noise(noise_pred.astype(jnp.float32),
                                              t)
            if ode:
                x_next = x - self.ode_reverse_drift(x, mu, score, t)
            else:
                if noise_seq is not None:
                    eps = c["noise"]
                elif batched_rng:  # per-image keys (see noise_state)
                    eps = _normal_per_key(_fold_in_per_key(rng, t), x.shape)
                else:
                    eps = jax.random.normal(jax.random.fold_in(rng, t),
                                            x.shape, jnp.float32)
                x_next = self.reverse_sde_step(x, mu, score, t, eps)
            return x_next, None

        x, _ = jax.lax.scan(step, xt, consts, unroll=unroll)
        return x

    def optimal_reverse(self, xt, x0, mu):
        T = self.b.T
        ts = jnp.arange(T, 0, -1)

        def step(x, t):
            return self.reverse_optimum_step(x, x0, mu, t), None

        x, _ = jax.lax.scan(step, xt, ts)
        return x

    # ------------------------------------------------------------------ #
    # black-box ODE sampling (adaptive RK45)
    # ------------------------------------------------------------------ #

    def ode_sampler(self, noise_fn: NoiseFn, xt, mu,
                    rtol: float = 1e-5, atol: float = 1e-5,
                    eps: float = 1e-3, max_steps: int = 10_000):
        """Probability-flow ODE sampling with an adaptive Dormand-Prince
        RK45 integrator (reference ode_sampler, sde_utils.py:264-288, which
        wraps scipy.integrate.solve_ivp over t in (T, eps) step units with
        ``t = int(t)`` inside the drift). This is the same solver expressed
        as one ``lax.while_loop`` XLA program — no host round-trips per
        step. Returns (x, n_accepted_steps)."""
        b = self.b
        bsz = xt.shape[0]

        # Dormand-Prince 5(4) tableau (same pair as scipy's RK45)
        C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
        A = jnp.array([
            [0, 0, 0, 0, 0, 0],
            [1 / 5, 0, 0, 0, 0, 0],
            [3 / 40, 9 / 40, 0, 0, 0, 0],
            [44 / 45, -56 / 15, 32 / 9, 0, 0, 0],
            [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729, 0, 0],
            [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176,
             -5103 / 18656, 0],
        ])
        B5 = jnp.array([35 / 384, 0, 500 / 1113, 125 / 192,
                        -2187 / 6784, 11 / 84, 0.0])
        # error weights b5 - b4 (last entry couples the FSAL stage)
        E = jnp.array([71 / 57600, 0, -71 / 16695, 71 / 1920,
                       -17253 / 339200, 22 / 525, -1 / 40])

        def drift(x, t_cont):
            # the reference drift truncates to an int schedule index
            t_idx = jnp.clip(t_cont.astype(jnp.int32), 1, b.T)
            noise_pred = noise_fn(x, mu, jnp.full((bsz,), t_idx, jnp.float32))
            score = self.get_score_from_noise(
                noise_pred.astype(jnp.float32), t_idx)
            return self.ode_reverse_drift(x, mu, score, t_idx)

        t0 = jnp.float32(b.T)
        h0 = jnp.float32(-(b.T - eps) / 50.0)  # first trial step

        def cond(carry):
            x, t, h, k_last, n_acc, n_trial, done = carry
            return jnp.logical_and(~done, n_trial < max_steps)

        def body(carry):
            x, t, h, k1, n_acc, n_trial, done = carry
            h = jnp.maximum(h, eps - t)  # clamp the final (negative) step
            ks = [k1]
            for i in range(1, 7):
                incr = sum(A[i, j] * ks[j] for j in range(i)) if i < 6 \
                    else sum(B5[j] * ks[j] for j in range(6))
                ks.append(drift(x + h * incr, t + C[i] * h))
            x5 = x + h * sum(B5[j] * ks[j] for j in range(6))
            err = h * sum(E[j] * ks[j] for j in range(7))
            scale = atol + rtol * jnp.maximum(jnp.abs(x), jnp.abs(x5))
            err_norm = jnp.sqrt(jnp.mean((err / scale) ** 2))
            # a NaN stage evaluation must reject-and-shrink, not poison the
            # controller (NaN comparisons are False -> factor would go NaN)
            err_norm = jnp.where(jnp.isnan(err_norm), jnp.inf, err_norm)
            accept = err_norm <= 1.0
            factor = jnp.clip(0.9 * (1.0 / jnp.maximum(err_norm, 1e-10))
                              ** 0.2, 0.2, 10.0)
            h_new = h * factor
            x_n = jnp.where(accept, x5, x)
            t_n = jnp.where(accept, t + h, t)
            k_n = jnp.where(accept, ks[6], k1)  # FSAL: k7 = next k1
            # done on reaching eps, or on solver collapse (|h| underflow
            # after repeated NaN/reject shrinks — scipy aborts here too)
            done_n = jnp.logical_or(
                jnp.logical_and(accept, t_n <= eps + 1e-6),
                jnp.abs(h_new) < 1e-6)
            return (x_n, t_n, h_new, k_n,
                    n_acc + accept.astype(jnp.int32), n_trial + 1, done_n)

        k1 = drift(xt, t0)
        x, t, h, _, n_acc, _, done = jax.lax.while_loop(
            cond, body,
            (xt, t0, h0, k1, jnp.int32(0), jnp.int32(0), jnp.bool_(False)))
        return x, n_acc
