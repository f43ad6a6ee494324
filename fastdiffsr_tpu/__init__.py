"""fastdiffsr_tpu — a TPU-native (JAX/Flax/Pallas/pjit) super-resolution
diffusion framework with the capabilities of Meng-333/FastDiffSR.

The reference (mounted read-only at /root/reference) is a single-GPU PyTorch
research codebase. This package is a ground-up redesign for TPU:

- The diffusion process (beta schedules, q_sample, posterior, the T-step
  reverse loop) is a set of pure functions; sampling compiles to ONE XLA
  program via ``jax.lax.scan`` (reference: python loop with 20 dispatches,
  ``model/fastdiffsr_modules/diffusion.py:192-221``).
- Denoiser networks are Flax modules in NHWC layout with bf16 compute /
  f32 params (reference: NCHW torch modules).
- Scale-out is SPMD: ``jax.sharding.Mesh`` + NamedSharding data parallelism,
  XLA-compiled gradient all-reduce over ICI (reference: ``nn.DataParallel``
  and NCCL DDP).
- Four diffusion variants (fastdiffsr / ddpm / tesr / gdp) are configurations
  of one engine instead of four copied modules (see ``diffusion/engine.py``).
"""

__version__ = "0.1.0"
