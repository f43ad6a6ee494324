"""Unified Gaussian-diffusion engine.

The reference ships four ~290-line ``diffusion.py`` siblings
(model/{fastdiffsr,ddpm,tesr,gdp}_modules/diffusion.py) that differ in ~30
lines. Here they are configurations of ONE engine:

===========  ==========  ===============  ============  =======  ====
variant      prediction  conditioning     target_space  loss     T
===========  ==========  ===============  ============  =======  ====
fastdiffsr   noise       continuous_gamma residual      l1       20
ddpm         noise       discrete_t       hr            l1       1000
tesr         noise       continuous_gamma hr            charb.   2000
gdp          x0          discrete_t       hr            l2       1000
===========  ==========  ===============  ============  =======  ====

(fastdiffsr: diffusion.py:242-289; ddpm: ddpm_modules/diffusion.py:260-295;
tesr: tesr_modules/diffusion.py:86-93,225; gdp: gdp_modules/diffusion.py:
100-103,184-195,277-297 — gdp additionally feeds ``cat([x, cond])`` instead
of ``cat([cond, x])`` and maps loss_type 'l1' silently to MSE.)

Everything is a pure function of (params-closed denoise_fn, buffers, rng).
The reverse loop is a single ``jax.lax.scan`` so T steps compile to one XLA
program — this is the main throughput lever vs the reference's per-step
python dispatch (diffusion.py:192-221).

Layout is NHWC throughout.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .schedules import ScheduleBuffers

# denoise_fn(x_in: (B,H,W,Cin), level: (B,)) -> (B,H,W,Cout)
DenoiseFn = Callable[[jax.Array, jax.Array], jax.Array]


def rng_is_batched(rng) -> bool:
    """True when ``rng`` is a batch of per-image keys (leading batch dim):
    shape (B,) for typed key arrays, (B, 2) for raw uint32 keys.

    Samplers accept either form. Per-image keys make the noise stream a
    function of the image's own key only, so sampling results are invariant
    to how images are grouped into batches (the batched val/infer paths key
    each image by its global index)."""
    try:
        if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
            return rng.ndim == 1
    except Exception:
        pass
    return rng.ndim == 2


def _normal_per_key(keys, shape) -> jax.Array:
    """(B,) keys -> (B, *shape[1:]) normal draws, one independent stream
    per key."""
    return jax.vmap(
        lambda k: jax.random.normal(k, tuple(shape[1:]), jnp.float32))(keys)


def _split_per_key(rng):
    """Batched analogue of jax.random.split: (B,) keys -> two (B,) keys."""
    pair = jax.vmap(lambda k: jax.random.split(k))(rng)
    return pair[:, 0], pair[:, 1]


def _fold_in_per_key(keys, data):
    return jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, data)


def default_scan_unroll() -> int:
    """FASTDIFFSR_TPU_SCAN_UNROLL: unroll factor for the reverse-loop scans
    (sample / sample_ddim / interpolate; default 1). Unrolling replicates
    the step body N times inside the scan so XLA can fuse the inter-step
    posterior math with the next step's prologue, at the cost of an N-x
    larger program (and compile time). A/B it with tools/unroll_check.py;
    v5e numbers in BASELINE.md.

    Read at TRACE time: changing the env var only takes effect on a fresh
    trace — a sampler already jitted in this process keeps its compiled
    program (the tools build one jit wrapper per arm for this reason)."""
    import os
    raw = os.environ.get("FASTDIFFSR_TPU_SCAN_UNROLL", "1")
    try:
        val = int(raw)
    except ValueError:
        raise ValueError(
            f"FASTDIFFSR_TPU_SCAN_UNROLL={raw!r} is not an integer") from None
    if val < 1:
        raise ValueError(
            f"FASTDIFFSR_TPU_SCAN_UNROLL={raw!r} must be >= 1")
    return val


@dataclasses.dataclass(frozen=True)
class DiffusionSpec:
    """Static configuration selecting a diffusion variant."""

    prediction: str = "noise"             # 'noise' | 'x0'
    conditioning: str = "continuous_gamma"  # 'continuous_gamma' | 'discrete_t'
    target_space: str = "residual"        # 'residual' | 'hr'
    loss: str = "l1"                      # 'l1' | 'l2' | 'charbonnier'
    cond_order: str = "cond_first"        # 'cond_first' | 'x_first' (gdp)
    conditional: bool = True
    clip_denoised: bool = True
    charbonnier_eps: float = 1e-3

    @classmethod
    def for_variant(cls, name: str) -> "DiffusionSpec":
        if name == "fastdiffsr":
            return cls(prediction="noise", conditioning="continuous_gamma",
                       target_space="residual", loss="l1")
        if name == "ddpm":
            # discrete per-sample t, HR space (ddpm_modules/diffusion.py:
            # 260-295); denoiser embeds the integer timestep
            return cls(prediction="noise", conditioning="discrete_t",
                       target_space="hr", loss="l1")
        if name == "tesr":
            # continuous gamma like fastdiffsr but HR space + Charbonnier
            # (tesr_modules/diffusion.py:86-93,225-251)
            return cls(prediction="noise", conditioning="continuous_gamma",
                       target_space="hr", loss="charbonnier")
        if name == "gdp":
            # x0 prediction, discrete t, MSE even for 'l1'
            # (gdp_modules/diffusion.py:100-103,184-195,277-297);
            # packing order cat([x, cond])
            return cls(prediction="x0", conditioning="discrete_t",
                       target_space="hr", loss="l2", cond_order="x_first")
        raise ValueError(f"unknown diffusion variant: {name}")


def img2res(x_hr: jax.Array, img_lr_up: jax.Array,
            clip: bool = True) -> jax.Array:
    """HR image -> residual space: (HR - bicubic)*2, clamped to [-1, 1].
    (reference diffusion.py:283-289)"""
    x = (x_hr - img_lr_up) * 2.0
    if clip:
        x = jnp.clip(x, -1.0, 1.0)
    return x


def res2img(res: jax.Array, img_lr_up: jax.Array,
            clip: bool = True) -> jax.Array:
    """Residual -> HR image: clamp(res)/2 + bicubic.
    (reference diffusion.py:275-281)"""
    if clip:
        res = jnp.clip(res, -1.0, 1.0)
    return res / 2.0 + img_lr_up


class DiffusionEngine:
    """Pure-functional diffusion train/sample math for one (spec, schedule)."""

    def __init__(self, spec: DiffusionSpec, buffers: ScheduleBuffers,
                 aux_ssim_weight: float = 0.0,
                 aux_ssim_gamma_pow: float = 0.0):
        self.spec = spec
        self.buffers = buffers
        # optional image-space auxiliary training loss
        # w * mean_i(gamma_i^p * (1 - SSIM_i(decode(x0_hat), HR))) —
        # capability beyond the reference schema
        # (model.diffusion.aux_ssim_weight / aux_ssim_gamma_pow); only
        # the noise-pred + continuous-gamma parameterizations can decode
        # x0_hat in closed form from the training draw. p > 0
        # concentrates the SSIM signal at low-noise draws where x0_hat
        # actually carries image structure (at gamma->gamma_min the
        # decode is noise-dominated and the SSIM gradient is mostly
        # gradient noise).
        self.aux_ssim_weight = float(aux_ssim_weight)
        self.aux_ssim_gamma_pow = float(aux_ssim_gamma_pow)
        if self.aux_ssim_weight and (spec.prediction != "noise" or
                                     spec.conditioning !=
                                     "continuous_gamma"):
            raise NotImplementedError(
                "aux_ssim_weight needs noise-pred + continuous-gamma "
                f"(got {spec.prediction}/{spec.conditioning})")

    # ------------------------------------------------------------------ #
    # forward process
    # ------------------------------------------------------------------ #

    def q_sample(self, x_start: jax.Array, gamma: jax.Array,
                 noise: jax.Array) -> jax.Array:
        """x_t = gamma * x0 + sqrt(1 - gamma^2) * eps, gamma = sqrt(alpha_bar).
        (reference diffusion.py:233-240)"""
        gamma = gamma.reshape((-1,) + (1,) * (x_start.ndim - 1))
        return gamma * x_start + jnp.sqrt(1.0 - gamma ** 2) * noise

    def sample_gammas(self, rng: jax.Array, batch: int):
        """Training noise levels: one t ~ U{1..T} per step, then per-sample
        gamma ~ U[sqrt_ac_prev[t-1], sqrt_ac_prev[t]]
        (reference diffusion.py:248-257)."""
        b = self.buffers
        rng_t, rng_g = jax.random.split(rng)
        t = jax.random.randint(rng_t, (), 1, b.num_timesteps + 1)
        lo = b.sqrt_alphas_cumprod_prev[t - 1]
        hi = b.sqrt_alphas_cumprod_prev[t]
        gamma = jax.random.uniform(rng_g, (batch,), minval=lo, maxval=hi)
        return gamma, t

    # ------------------------------------------------------------------ #
    # training loss
    # ------------------------------------------------------------------ #

    def training_loss(self, denoise_fn: DenoiseFn, batch: dict,
                      rng: jax.Array) -> jax.Array:
        """L(theta) for one batch {'HR': (B,H,W,C), 'SR': (B,H,W,C)}.

        Matches the reference normalization: sum-reduced loss / (b*c*h*w)
        == mean (model/model.py:47-52 + diffusion.py:269).
        """
        spec = self.spec
        x_hr = batch["HR"]
        img_lr_up = batch["SR"]
        if spec.target_space == "residual":
            x_start = img2res(x_hr, img_lr_up)
        else:
            x_start = x_hr

        bsz = x_start.shape[0]
        rng_level, rng_noise = jax.random.split(rng)
        noise = jax.random.normal(rng_noise, x_start.shape, x_start.dtype)
        if spec.conditioning == "continuous_gamma":
            gamma, _ = self.sample_gammas(rng_level, bsz)
            x_noisy = self.q_sample(x_start, gamma, noise)
            level = gamma
        else:  # discrete_t: per-sample t ~ U{0..T-1}, fixed-gamma q_sample
            b = self.buffers
            t = jax.random.randint(rng_level, (bsz,), 0, b.num_timesteps)
            shape1 = (-1,) + (1,) * (x_start.ndim - 1)
            x_noisy = (b.sqrt_alphas_cumprod[t].reshape(shape1) * x_start
                       + b.sqrt_one_minus_alphas_cumprod[t].reshape(shape1)
                       * noise)
            level = t.astype(jnp.float32)

        x_in = self._pack(x_noisy, img_lr_up)
        pred = denoise_fn(x_in, level)

        target = x_start if spec.prediction == "x0" else noise
        loss = self._loss(target, pred)

        if self.aux_ssim_weight:
            # closed-form x0_hat from the noise prediction at the drawn
            # gamma, decoded to image space and clamped exactly like the
            # sampler's p_mean_variance does; the SSIM term then directly
            # optimizes the eval metric (ops/dssim.py)
            from ..ops.dssim import ssim as ssim_jax
            g = gamma.reshape((-1,) + (1,) * (x_start.ndim - 1)) \
                     .astype(jnp.float32)
            x0_hat = (x_noisy.astype(jnp.float32)
                      - jnp.sqrt(1.0 - g ** 2) * pred.astype(jnp.float32)) \
                / g
            x0_hat = jnp.clip(x0_hat, -1.0, 1.0)
            if spec.target_space == "residual":
                sr_hat = res2img(x0_hat, img_lr_up, clip=False)
            else:
                sr_hat = x0_hat
            s_i = ssim_jax((sr_hat + 1.0) * 127.5,
                           (x_hr.astype(jnp.float32) + 1.0) * 127.5,
                           per_image=True)
            w_i = (gamma.astype(jnp.float32) ** self.aux_ssim_gamma_pow
                   if self.aux_ssim_gamma_pow else
                   jnp.ones_like(s_i))
            aux = jnp.mean(w_i * (1.0 - s_i))
            loss = loss + self.aux_ssim_weight * aux
        return loss

    def _loss(self, target: jax.Array, pred: jax.Array) -> jax.Array:
        diff = target.astype(jnp.float32) - pred.astype(jnp.float32)
        if self.spec.loss == "l1":
            return jnp.mean(jnp.abs(diff))
        if self.spec.loss == "l2":
            return jnp.mean(diff ** 2)
        if self.spec.loss == "charbonnier":
            return jnp.mean(jnp.sqrt(diff ** 2 + self.spec.charbonnier_eps ** 2))
        raise NotImplementedError(self.spec.loss)

    def _pack(self, x: jax.Array, cond: Optional[jax.Array]) -> jax.Array:
        if not self.spec.conditional or cond is None:
            return x
        if self.spec.cond_order == "cond_first":
            return jnp.concatenate([cond, x], axis=-1)
        return jnp.concatenate([x, cond], axis=-1)

    # ------------------------------------------------------------------ #
    # reverse process (sampling) — one lax.scan over T steps
    # ------------------------------------------------------------------ #

    def predict_start_from_noise(self, x_t, t_idx, noise):
        b = self.buffers
        return (b.sqrt_recip_alphas_cumprod[t_idx] * x_t
                - b.sqrt_recipm1_alphas_cumprod[t_idx] * noise)

    def q_posterior(self, x_start, x_t, t_idx):
        b = self.buffers
        mean = (b.posterior_mean_coef1[t_idx] * x_start
                + b.posterior_mean_coef2[t_idx] * x_t)
        log_var = b.posterior_log_variance_clipped[t_idx]
        return mean, log_var

    def sample(self,
               denoise_fn: DenoiseFn,
               cond: Optional[jax.Array],
               rng: jax.Array,
               shape: Optional[tuple] = None,
               return_trajectory: bool = False,
               init_noise: Optional[jax.Array] = None,
               noise_seq: Optional[jax.Array] = None) -> jax.Array:
        """Reverse diffusion. ``cond`` is the bicubic-upsampled LR batch
        (B,H,W,C); for unconditional sampling pass ``cond=None`` and a shape.

        ``init_noise`` / ``noise_seq`` ((T,B,H,W,C), indexed by timestep t)
        override internal RNG — used by parity tests to feed the exact noise
        draws of the PyTorch reference.

        Returns the final image (residual already folded back via
        :func:`res2img` when target_space == 'residual'); with
        ``return_trajectory``, also the (T,B,H,W,C) stack of intermediate
        states in sampling order (t = T-1 ... 0), converted to image space.
        """
        spec = self.spec
        b = self.buffers
        T = b.num_timesteps
        if shape is None:
            assert cond is not None
            shape = cond.shape

        batched_rng = rng_is_batched(rng)
        if batched_rng:
            rng_init, rng_steps = _split_per_key(rng)
            if init_noise is None:
                init_noise = _normal_per_key(rng_init, shape)
        else:
            rng_init, rng_steps = jax.random.split(rng)
            if init_noise is None:
                init_noise = jax.random.normal(rng_init, shape, jnp.float32)
        img = init_noise

        # per-step constants, stacked in scan order t = T-1 ... 0
        ts = jnp.arange(T - 1, -1, -1)
        consts = {
            "t": ts,
            "noise_level": b.sqrt_alphas_cumprod_prev[ts + 1],
            "nonzero": (ts > 0).astype(jnp.float32),
        }
        if noise_seq is not None:
            consts["noise"] = noise_seq[ts]

        bsz = shape[0]

        def step(carry, c):
            x = carry
            t_idx = c["t"]
            if spec.conditioning == "discrete_t":
                level = jnp.full((bsz,), t_idx, jnp.float32)
            else:
                level = jnp.full((bsz,), c["noise_level"], jnp.float32)
            x_in = self._pack(x, cond)
            model_out = denoise_fn(x_in, level).astype(jnp.float32)
            if spec.prediction == "x0":
                x_recon = model_out
            else:
                x_recon = self.predict_start_from_noise(x, t_idx, model_out)
            if spec.clip_denoised:
                x_recon = jnp.clip(x_recon, -1.0, 1.0)
            mean, log_var = self.q_posterior(x_recon, x, t_idx)
            if noise_seq is not None:
                noise = c["noise"]
            elif batched_rng:
                noise = _normal_per_key(_fold_in_per_key(rng_steps, t_idx),
                                        x.shape)
            else:
                step_rng = jax.random.fold_in(rng_steps, t_idx)
                noise = jax.random.normal(step_rng, x.shape, jnp.float32)
            x_next = mean + c["nonzero"] * noise * jnp.exp(0.5 * log_var)
            return x_next, (x_next if return_trajectory else None)

        img, traj = jax.lax.scan(step, img, consts,
                                 unroll=default_scan_unroll())

        def to_img(z):
            # unconditional sampling returns the raw (residual-space)
            # tensor — the reference's unconditional branch never applies
            # res2img (fastdiffsr_modules/diffusion.py:196-203 vs 214-216)
            if spec.target_space == "residual" and cond is not None:
                return res2img(z, cond)
            return z

        if return_trajectory:
            return to_img(img), jax.vmap(to_img)(traj)
        return to_img(img)

    def sample_ddim(self,
                    denoise_fn: DenoiseFn,
                    cond: Optional[jax.Array],
                    rng: jax.Array,
                    steps: Optional[int] = None,
                    eta: float = 0.0,
                    shape: Optional[tuple] = None,
                    init_noise: Optional[jax.Array] = None) -> jax.Array:
        """DDIM sampling (Song et al., ICLR 2021) with timestep
        subsampling — a speed/quality knob beyond the reference: a model
        trained at T steps can sample in ``steps <= T`` UNet evals
        (deterministic when ``eta=0``). Same one-scan structure as
        :meth:`sample`; per-step constants are precomputed host-side.
        """
        import numpy as np

        spec = self.spec
        b = self.buffers
        T = b.num_timesteps
        steps = int(steps or T)
        if shape is None:
            assert cond is not None
            shape = cond.shape
        bsz = shape[0]

        # descending timestep subsequence t_k, with t_prev -> -1 at the end
        ts = np.unique(np.linspace(0, T - 1, steps).round()
                       .astype(np.int64))[::-1]
        t_prev = np.append(ts[1:], -1)
        ac = np.asarray(b.alphas_cumprod, np.float64)
        a_t = ac[ts]
        a_prev = np.where(t_prev >= 0, ac[np.maximum(t_prev, 0)], 1.0)
        sigma = (eta * np.sqrt((1 - a_prev) / (1 - a_t))
                 * np.sqrt(1 - a_t / a_prev))
        consts = {
            "t": jnp.asarray(ts, jnp.int32),
            "noise_level": jnp.asarray(np.sqrt(a_t), jnp.float32),
            "sqrt_a_t": jnp.asarray(np.sqrt(a_t), jnp.float32),
            "sqrt_1m_a_t": jnp.asarray(np.sqrt(1 - a_t), jnp.float32),
            "sqrt_a_prev": jnp.asarray(np.sqrt(a_prev), jnp.float32),
            "dir_coef": jnp.asarray(
                np.sqrt(np.maximum(1 - a_prev - sigma ** 2, 0.0)),
                jnp.float32),
            "sigma": jnp.asarray(sigma, jnp.float32),
        }

        batched_rng = rng_is_batched(rng)
        if batched_rng:
            rng_init, rng_steps = _split_per_key(rng)
            if init_noise is None:
                init_noise = _normal_per_key(rng_init, shape)
        else:
            rng_init, rng_steps = jax.random.split(rng)
            if init_noise is None:
                init_noise = jax.random.normal(rng_init, shape, jnp.float32)

        def step(x, c):
            if spec.conditioning == "discrete_t":
                level = jnp.full((bsz,), c["t"], jnp.float32)
            else:
                level = jnp.full((bsz,), c["noise_level"], jnp.float32)
            model_out = denoise_fn(self._pack(x, cond),
                                   level).astype(jnp.float32)
            if spec.prediction == "x0":
                x0 = model_out
            else:
                x0 = (x - c["sqrt_1m_a_t"] * model_out) / c["sqrt_a_t"]
            if spec.clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
            # re-derive eps from the (possibly clipped) x0 for consistency
            eps = (x - c["sqrt_a_t"] * x0) / jnp.maximum(c["sqrt_1m_a_t"],
                                                         1e-8)
            x_next = c["sqrt_a_prev"] * x0 + c["dir_coef"] * eps
            if eta != 0.0:  # deterministic path skips noise generation
                if batched_rng:
                    noise = _normal_per_key(
                        _fold_in_per_key(rng_steps, c["t"]), x.shape)
                else:
                    noise = jax.random.normal(
                        jax.random.fold_in(rng_steps, c["t"]), x.shape,
                        jnp.float32)
                x_next = x_next + c["sigma"] * noise
            return x_next, None

        img, _ = jax.lax.scan(step, init_noise, consts,
                              unroll=default_scan_unroll())
        # as in sample(): no res2img on the unconditional path
        if spec.target_space == "residual" and cond is not None:
            return res2img(img, cond)
        return img

    def sample_dpm(self,
                   denoise_fn: DenoiseFn,
                   cond: Optional[jax.Array],
                   rng: jax.Array,
                   steps: Optional[int] = None,
                   shape: Optional[tuple] = None,
                   init_noise: Optional[jax.Array] = None) -> jax.Array:
        """DPM-Solver++(2M): deterministic multistep second-order solver
        for the probability-flow ODE in the data-prediction formulation
        (Lu et al. 2022, arXiv:2211.01095, Algorithm 2) — a speed/quality
        knob beyond the reference (capability add, like
        :meth:`sample_ddim`): second-order accuracy in the log-SNR step
        usually beats DDIM at equal low step counts.

        Same one-``lax.scan`` structure and timestep subsequence as
        :meth:`sample_ddim`; all per-step coefficients are precomputed
        host-side in float64. Uses the standard lower-order-final rule:
        the first step (no history) and the final step (t_prev = -1,
        h = inf) run first-order, which is exactly the DDIM eta=0 update.
        ``rng`` draws only the initial noise (plain key or the per-image
        batched-keys contract); the solver itself is deterministic.
        """
        import numpy as np

        spec = self.spec
        b = self.buffers
        T = b.num_timesteps
        steps = int(steps or T)
        if shape is None:
            assert cond is not None
            shape = cond.shape
        bsz = shape[0]

        # descending timestep subsequence (same rule as sample_ddim)
        ts = np.unique(np.linspace(0, T - 1, steps).round()
                       .astype(np.int64))[::-1]
        t_prev = np.append(ts[1:], -1)
        ac = np.asarray(b.alphas_cumprod, np.float64)
        a_cur = ac[ts]
        a_prev = np.where(t_prev >= 0, ac[np.maximum(t_prev, 0)], 1.0)
        al_cur, sg_cur = np.sqrt(a_cur), np.sqrt(1.0 - a_cur)
        al_prev, sg_prev = np.sqrt(a_prev), np.sqrt(1.0 - a_prev)

        # x_{i} = (sigma_i/sigma_{i-1}) x_{i-1} - alpha_i (e^{-h_i}-1) D
        # with e^{-h} = (al_cur sg_prev)/(sg_cur al_prev); algebraically
        #   coef_x = sg_prev/sg_cur,  coef_D = al_prev - al_cur*coef_x
        # which stays finite at the final step (sg_prev=0 -> coef_D=1).
        coef_x = sg_prev / sg_cur
        coef_D = al_prev - al_cur * coef_x

        # log-SNR steps h_i for the 2M history weights; the final h is
        # +inf but that step is forced first-order below.
        with np.errstate(divide="ignore"):
            lam_cur = np.log(al_cur) - np.log(sg_cur)
            lam_prev = np.where(t_prev >= 0,
                                np.log(al_prev) - np.log(np.maximum(sg_prev,
                                                                    1e-300)),
                                np.inf)
        h = lam_prev - lam_cur
        n = len(ts)
        w_cur, w_prev = np.ones(n), np.zeros(n)
        for k in range(1, n):
            if not np.isfinite(h[k]):       # lower-order final step
                continue
            r = h[k - 1] / h[k]
            w_cur[k] = 1.0 + 1.0 / (2.0 * r)
            w_prev[k] = -1.0 / (2.0 * r)

        consts = {
            "t": jnp.asarray(ts, jnp.int32),
            "noise_level": jnp.asarray(al_cur, jnp.float32),
            "sqrt_a_t": jnp.asarray(al_cur, jnp.float32),
            "sqrt_1m_a_t": jnp.asarray(sg_cur, jnp.float32),
            "coef_x": jnp.asarray(coef_x, jnp.float32),
            "coef_D": jnp.asarray(coef_D, jnp.float32),
            "w_cur": jnp.asarray(w_cur, jnp.float32),
            "w_prev": jnp.asarray(w_prev, jnp.float32),
        }

        if rng_is_batched(rng):
            rng_init, _ = _split_per_key(rng)
            if init_noise is None:
                init_noise = _normal_per_key(rng_init, shape)
        elif init_noise is None:
            init_noise = jax.random.normal(jax.random.split(rng)[0], shape,
                                           jnp.float32)

        def step(carry, c):
            x, x0_prev = carry
            if spec.conditioning == "discrete_t":
                level = jnp.full((bsz,), c["t"], jnp.float32)
            else:
                level = jnp.full((bsz,), c["noise_level"], jnp.float32)
            model_out = denoise_fn(self._pack(x, cond),
                                   level).astype(jnp.float32)
            if spec.prediction == "x0":
                x0 = model_out
            else:
                x0 = (x - c["sqrt_1m_a_t"] * model_out) / c["sqrt_a_t"]
            if spec.clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
            D = c["w_cur"] * x0 + c["w_prev"] * x0_prev
            x_next = c["coef_x"] * x + c["coef_D"] * D
            return (x_next, x0), None

        (img, _), _ = jax.lax.scan(step, (init_noise,
                                          jnp.zeros_like(init_noise)),
                                   consts, unroll=default_scan_unroll())
        if spec.target_space == "residual" and cond is not None:
            return res2img(img, cond)
        return img

    def interpolate(self, denoise_fn: DenoiseFn, x1: jax.Array,
                    x2: jax.Array, rng: jax.Array,
                    t: Optional[int] = None, lam: float = 0.5) -> jax.Array:
        """Diffuse two images to step t, mix, and denoise back
        (reference ddpm_modules/diffusion.py:242-258). Unconditional."""
        b = self.buffers
        T = b.num_timesteps
        t = T - 1 if t is None else t
        rng1, rng2, rng_steps = jax.random.split(rng, 3)
        noise1 = jax.random.normal(rng1, x1.shape, jnp.float32)
        noise2 = jax.random.normal(rng2, x2.shape, jnp.float32)
        xt1 = (b.sqrt_alphas_cumprod[t] * x1
               + b.sqrt_one_minus_alphas_cumprod[t] * noise1)
        xt2 = (b.sqrt_alphas_cumprod[t] * x2
               + b.sqrt_one_minus_alphas_cumprod[t] * noise2)
        img = (1 - lam) * xt1 + lam * xt2

        bsz = x1.shape[0]
        ts = jnp.arange(t - 1, -1, -1)

        def step(x, t_idx):
            if self.spec.conditioning == "discrete_t":
                level = jnp.full((bsz,), t_idx, jnp.float32)
            else:
                level = jnp.full((bsz,),
                                 b.sqrt_alphas_cumprod_prev[t_idx + 1])
            model_out = denoise_fn(x, level).astype(jnp.float32)
            if self.spec.prediction == "x0":
                x_recon = model_out
            else:
                x_recon = self.predict_start_from_noise(x, t_idx, model_out)
            if self.spec.clip_denoised:  # honor the flag like sample()
                x_recon = jnp.clip(x_recon, -1.0, 1.0)
            mean, log_var = self.q_posterior(x_recon, x, t_idx)
            noise = jax.random.normal(jax.random.fold_in(rng_steps, t_idx),
                                      x.shape, jnp.float32)
            nonzero = (t_idx > 0).astype(jnp.float32)
            return mean + nonzero * noise * jnp.exp(0.5 * log_var), None

        img, _ = jax.lax.scan(step, img, ts, unroll=default_scan_unroll())
        return img
