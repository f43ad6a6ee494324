"""W8A8 dynamic-quantized 3x3 conv for the wide UNet stages.

Rationale (BASELINE.md r2 int8 scouting, tools/int8_lab.py): the v5e MXU
runs int8 convs 1.5-1.6x faster than bf16 at the sampler's 256²C64 /
128²C128 stages (and at parity at 64²C256, where quantizing would risk
quality for nothing — callers gate on spatial size).

Scheme — symmetric, zero-point-free:
- weights: per-output-channel scale s_w[co] = max|K[..., co]| / 127,
  quantized inside the jitted graph from the f32 params (tiny tensors;
  XLA hoists the requantization out of the sampler's scan loop since
  params are loop-invariant);
- activations: dynamic per-tensor scale s_a = max|h| / 127 (one extra
  reduce over h, fusable with the producing GN/swish epilogue);
- conv int8 x int8 -> int32 (preferred_element_type), dequantized as
  y = y_i32 * (s_a * s_w) + bias in the compute dtype.

Error model: quantization noise is ~uniform(+-s/2) per operand; for the
UNet's unit-scale activations the per-conv relative RMS error is ~1e-2,
measured end-to-end below the diffusion sampler's own stochasticity
(see tests/test_quant.py and the BASELINE.md PSNR check).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weights(kernel: jax.Array):
    """(kh,kw,ci,co) f32 -> (int8 kernel, f32 per-co scale)."""
    s_w = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0
    s_w = jnp.maximum(s_w, 1e-12)
    q = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)
    return q, s_w


# Static activation scale for mode 'w8a8s': post-GN-swish activations are
# approximately in [-0.28, ~8] (swish of a unit-normalized signal times
# the learned affine); 8/127 clips the extreme tail only. Avoids the
# serializing per-conv global abs-max reduce of the dynamic mode.
STATIC_ACT_MAX = 8.0


def quant_conv3(h: jax.Array, kernel: jax.Array, bias: jax.Array,
                dtype, padding="SAME", static_scale: bool = False
                ) -> jax.Array:
    """W8A8 3x3 conv: h (NHWC, float) x kernel (3,3,ci,co) f32.

    static_scale=False: dynamic per-tensor activation scale (exact-max,
    one extra global reduce over h). True: fixed STATIC_ACT_MAX scale
    (no reduce; tail values clip)."""
    q_w, s_w = quantize_weights(kernel)
    hf = h.astype(jnp.float32)
    if static_scale:
        s_a = jnp.float32(STATIC_ACT_MAX / 127.0)
    else:
        s_a = jnp.maximum(jnp.max(jnp.abs(hf)) / 127.0, 1e-12)
    q_h = jnp.clip(jnp.round(hf / s_a), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        q_h, q_w, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    scale = (s_a * s_w).astype(jnp.float32)
    out = y.astype(jnp.float32) * scale + bias.astype(jnp.float32)
    return out.astype(dtype)


def default_quant() -> str:
    """Quantized-conv mode from the environment.

    FASTDIFFSR_TPU_QUANT: '' (bf16/f32 convs, the default), 'w8a8'
    (dynamic int8 convs on the wide UNet stages), or 'w8a8s' (static
    activation scale — no per-conv reduce; see module docstring).
    """
    import os
    mode = os.environ.get("FASTDIFFSR_TPU_QUANT", "")
    if mode not in ("", "w8a8", "w8a8s"):
        raise ValueError(
            f"FASTDIFFSR_TPU_QUANT={mode!r} (want '', 'w8a8' or 'w8a8s')")
    return mode
