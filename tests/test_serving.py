"""Serving export round-trip: serialize the jitted sampler with
jax.export, reload, and check the artifact reproduces the in-process
sampler exactly — including at a batch size never seen at export time
(symbolic batch dim).

Beyond-reference capability (the reference serves by shipping model code
+ .pth; fastdiffsr_tpu/serving.py ships one weights-independent
StableHLO artifact)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastdiffsr_tpu.diffusion import (DiffusionEngine, DiffusionSpec,
                                      ScheduleBuffers)
from fastdiffsr_tpu.models.unet_fastdiffsr import FastDiffSRUNet
from fastdiffsr_tpu.serving import build_sample_export, load_exported
from fastdiffsr_tpu.train import make_sample_fn, pad_batch_with_keys

SIZE = 16


@pytest.fixture(scope="module")
def tiny():
    engine = DiffusionEngine(
        DiffusionSpec.for_variant("fastdiffsr"),
        ScheduleBuffers.create({"schedule": "linear_cosine",
                                "n_timestep": 4,
                                "linear_start": 1e-6, "linear_end": 1e-2}))
    net = FastDiffSRUNet(inner_channel=8, channel_mults=(1, 2),
                         res_blocks=1, norm_groups=4, dropout=0.0)

    def apply_fn(params, x_in, level, rng):
        return net.apply({"params": params}, x_in, level,
                         deterministic=True)

    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, SIZE, SIZE, 6)),
                      jnp.ones((1,)))["params"]
    return engine, apply_fn, params


def _inputs(b, seed=0):
    rng = np.random.default_rng(seed)
    cond = rng.uniform(-1, 1, (b, SIZE, SIZE, 3)).astype(np.float32)
    keys = np.asarray(
        pad_batch_with_keys(cond, b, jax.random.PRNGKey(7), 0)[1])
    return cond, keys


@pytest.mark.parametrize("sampler,steps", [("ancestral", None),
                                           ("dpm", 3)])
def test_roundtrip_matches_inprocess(tmp_path, tiny, sampler, steps):
    engine, apply_fn, params = tiny
    exported = build_sample_export(engine, apply_fn, params,
                                   image_size=SIZE, batch=None,
                                   sampler=sampler, steps=steps)
    path = tmp_path / f"sampler_{sampler}.shlo"
    path.write_bytes(exported.serialize())
    reloaded = load_exported(str(path))

    direct = make_sample_fn(engine, apply_fn, sampler=sampler,
                            ddim_steps=steps)
    # two batch sizes through ONE symbolic-batch artifact, one of them
    # larger than anything traced at export time
    for b in (2, 5):
        cond, keys = _inputs(b)
        got = np.asarray(reloaded.call(params, cond, keys))
        want = np.asarray(direct(params, cond, keys))
        assert got.shape == (b, SIZE, SIZE, 3)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_static_batch_export(tmp_path, tiny):
    engine, apply_fn, params = tiny
    exported = build_sample_export(engine, apply_fn, params,
                                   image_size=SIZE, batch=3)
    path = tmp_path / "sampler_b3.shlo"
    path.write_bytes(exported.serialize())
    reloaded = load_exported(str(path))
    cond, keys = _inputs(3)
    out = np.asarray(reloaded.call(params, cond, keys))
    assert out.shape == (3, SIZE, SIZE, 3)
    assert np.all(np.isfinite(out))
    # wrong batch must be rejected, not silently mis-shaped
    cond4, keys4 = _inputs(4)
    with pytest.raises(Exception):
        reloaded.call(params, cond4, keys4)
