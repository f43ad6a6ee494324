"""AOT serving export: serialize the whole jitted sampler to one artifact.

Production-serving path with no reference counterpart (the reference
deploys by shipping the PyTorch model code + a ``.pth``,
``infer.py:17-119``): the complete T-step reverse-diffusion program —
UNet, schedule constants, residual fold-back — is staged out with
``jax.export`` into a single serialized StableHLO artifact that a serving
process can load and run **without this package, Flax, or the model
code** (only jax + the serialized bytes). Weights stay call arguments, so
one artifact serves every checkpoint of an architecture.

- batch dimension is exported SYMBOLICALLY by default (one artifact
  serves any batch size; per-image RNG keys shard with the batch), with
  ``--batch N`` forcing a static shape where a serving stack wants one
- cross-platform: ``--platforms cpu,tpu`` builds one artifact lowerable
  on either backend (export from a CPU host, serve on TPU)
- round-trip equality vs the in-process jitted sampler is tested in
  tests/test_serving.py

CLI::

    python -m fastdiffsr_tpu.serving -c <config.json> -o sampler.shlo \
        [--ckpt experiments/.../I4000_E1] [--use_ema] [--batch N] \
        [--sampler ancestral|ddim|dpm] [--steps N] [--eta F] \
        [--platforms cpu,tpu] [--selftest]

Loading in a serving process::

    from fastdiffsr_tpu.serving import load_exported   # or inline:
    exported = jax.export.deserialize(open(p, 'rb').read())
    sr = exported.call(params, cond, keys)
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["build_sample_export", "export_sampler", "load_exported",
           "main"]


def build_sample_export(engine, apply_fn, params_tree,
                        image_size: int, in_channels: int = 3,
                        batch: Optional[int] = None,
                        sampler: str = "ancestral",
                        steps: Optional[int] = None,
                        eta: float = 0.0,
                        platforms: Optional[list] = None):
    """Stage ``sample(params, cond, keys)`` out to a jax.export.Exported.

    ``cond`` is the bicubic-upsampled LR batch (B, image_size, image_size,
    in_channels) in [-1, 1]; ``keys`` the per-image RNG key array of
    :func:`fastdiffsr_tpu.train.pad_batch_with_keys` (batch-invariant
    sampling, same contract as the val/infer CLIs). ``batch=None``
    exports a symbolic batch dimension.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from .train import make_sample_fn

    sample_fn = make_sample_fn(engine, apply_fn, sampler=sampler,
                               ddim_steps=steps, ddim_eta=eta)

    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    cond_spec = jax.ShapeDtypeStruct((b, image_size, image_size,
                                      in_channels), jnp.float32)
    # pad_batch_with_keys produces uint32 (B, 2) raw key data
    keys_spec = jax.ShapeDtypeStruct((b, 2), jnp.uint32)
    params_spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params_tree)

    kwargs = {}
    if platforms:
        kwargs["platforms"] = list(platforms)
    return jexport.export(jax.jit(sample_fn), **kwargs)(
        params_spec, cond_spec, keys_spec)


def export_sampler(opt, out_path: str,
                   ckpt_prefix: Optional[str] = None,
                   use_ema: bool = False,
                   batch: Optional[int] = None,
                   sampler: Optional[str] = None,
                   steps: Optional[int] = None,
                   eta: Optional[float] = None,
                   platforms: Optional[list] = None):
    """Build the flagship sampler from a parsed config (the same
    ``build_all`` the train/val CLIs use), optionally load checkpoint
    params, export, and serialize to ``out_path``.

    Returns ``(exported, params)`` — params are returned so a --selftest
    can call the artifact with real weights.
    """
    from .cli.sr_mfe import build_all
    from .train.checkpoint import load_params_only

    _, eng_val, net, apply_fn, params = build_all(opt, "val")
    if ckpt_prefix:
        params = load_params_only(ckpt_prefix, use_ema=use_ema)

    diff_opt = (opt.get("model") or {}).get("diffusion") or {}
    sampler = sampler or diff_opt.get("sampler") or "ancestral"
    if steps is None and diff_opt.get("ddim_steps"):
        steps = int(diff_opt["ddim_steps"])
    if eta is None:
        eta = float(diff_opt.get("ddim_eta") or 0.0)

    r = int(opt["datasets"]["val"]["r_resolution"])
    exported = build_sample_export(
        eng_val, apply_fn, params, image_size=r,
        batch=batch, sampler=sampler, steps=steps, eta=eta,
        platforms=platforms)

    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(data)
    return exported, params


def load_exported(path: str):
    """Deserialize a sampler artifact; call via ``.call(params, cond,
    keys)`` (jit-compiled on the running backend)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))


def main(argv=None):
    import argparse

    import numpy as np

    from .config import parse

    p = argparse.ArgumentParser(
        description="Export the T-step sampler as a serialized StableHLO "
                    "serving artifact")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-o", "--out", required=True)
    p.add_argument("--ckpt", default=None,
                   help="checkpoint prefix (I{iter}_E{epoch}) whose params "
                        "the --selftest uses; the artifact itself is "
                        "weights-independent")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--batch", type=int, default=None,
                   help="static batch (default: symbolic — any batch)")
    p.add_argument("--sampler", default=None,
                   choices=["ancestral", "ddim", "dpm"])
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--eta", type=float, default=None)
    p.add_argument("--platforms", default=None,
                   help="comma list, e.g. cpu,tpu (default: current)")
    p.add_argument("--selftest", action="store_true",
                   help="reload the artifact and check it against the "
                        "in-process sampler on random inputs")
    args = p.parse_args(argv)

    opt = parse(args.config, phase="val")
    platforms = args.platforms.split(",") if args.platforms else None
    exported, params = export_sampler(
        opt, args.out, ckpt_prefix=args.ckpt, use_ema=args.use_ema,
        batch=args.batch, sampler=args.sampler, steps=args.steps,
        eta=args.eta, platforms=platforms)
    size = os.path.getsize(args.out)
    print(f"exported {exported.fun_name} -> {args.out} ({size/1e6:.2f} MB, "
          f"platforms {list(exported.platforms)}, "
          f"in_avals[-1]={exported.in_avals[-1]})")

    if args.selftest:
        import jax

        from .train import pad_batch_with_keys

        b = args.batch or 2
        r = int(opt["datasets"]["val"]["r_resolution"])
        rng = np.random.default_rng(0)
        cond = rng.uniform(-1, 1, (b, r, r, 3)).astype(np.float32)
        keys = np.asarray(
            pad_batch_with_keys(cond, b, jax.random.PRNGKey(0), 0)[1])
        reloaded = load_exported(args.out)
        out = np.asarray(reloaded.call(params, cond, keys))
        assert out.shape == cond.shape and np.all(np.isfinite(out))
        print(f"selftest ok: batch {b} -> {out.shape}, "
              f"range [{out.min():.3f}, {out.max():.3f}]")


if __name__ == "__main__":
    main()
