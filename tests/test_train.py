"""Train step: loss decreases on a fixed batch; EMA semantics; 8-device DP
sharding produces identical math to single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdiffsr_tpu.diffusion import DiffusionSpec, DiffusionEngine, ScheduleBuffers
from fastdiffsr_tpu.models import FastDiffSRUNet
from fastdiffsr_tpu.parallel import make_mesh, shard_batch
from fastdiffsr_tpu.train import create_train_state, make_train_step
from fastdiffsr_tpu.train.state import make_optimizer

SCHED = {"schedule": "linear_cosine", "n_timestep": 20,
         "linear_start": 1e-6, "linear_end": 1e-2}


def _tiny_setup(dropout=0.0):
    engine = DiffusionEngine(DiffusionSpec.for_variant("fastdiffsr"),
                             ScheduleBuffers.create(SCHED))
    net = FastDiffSRUNet(in_channel=6, out_channel=3, inner_channel=8,
                         norm_groups=4, channel_mults=(1, 2), res_blocks=1,
                         dropout=dropout)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)),
                      jnp.ones((1,)))["params"]

    def apply_fn(params, x_in, level, rng):
        kwargs = {}
        if rng is not None and dropout > 0:
            kwargs = {"rngs": {"dropout": rng}, "deterministic": False}
        return net.apply({"params": params}, x_in, level, **kwargs)

    return engine, net, params, apply_fn


def _batch(rng_seed=0, b=8, size=16):
    rng = np.random.default_rng(rng_seed)
    return {
        "HR": jnp.asarray(rng.uniform(-1, 1, (b, size, size, 3)),
                          jnp.float32),
        "SR": jnp.asarray(rng.uniform(-1, 1, (b, size, size, 3)),
                          jnp.float32),
    }


def test_loss_decreases():
    engine, net, params, apply_fn = _tiny_setup()
    tx = make_optimizer({"lr": 2e-3})
    state = create_train_state(params, tx)
    step = make_train_step(engine, apply_fn, tx, ema_start=10_000)

    batch = _batch()
    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i % 4))
        losses.append(float(metrics["l_pix"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert int(state.step) == 30


def test_ema_before_start_tracks_params():
    engine, net, params, apply_fn = _tiny_setup()
    tx = make_optimizer({"lr": 1e-3})
    state = create_train_state(params, tx)
    step = make_train_step(engine, apply_fn, tx, ema_start=1000)
    state, _ = step(state, _batch(), jax.random.PRNGKey(0))
    # before ema_start, ema == params exactly
    diffs = jax.tree_util.tree_map(
        lambda e, p: float(jnp.max(jnp.abs(e - p))),
        state.ema_params, state.params)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


def test_ema_after_start_lags_params():
    engine, net, params, apply_fn = _tiny_setup()
    tx = make_optimizer({"lr": 1e-3})
    state = create_train_state(params, tx)
    step = make_train_step(engine, apply_fn, tx, ema_decay=0.9,
                           ema_start=0)
    s1, _ = step(state, _batch(), jax.random.PRNGKey(0))
    # step=0 >= ema_start=0 -> ema = 0.9*old + 0.1*new != new
    leaves_e = jax.tree_util.tree_leaves(s1.ema_params)
    leaves_p = jax.tree_util.tree_leaves(s1.params)
    assert any(float(jnp.max(jnp.abs(e - p))) > 0
               for e, p in zip(leaves_e, leaves_p))


def test_dp_sharded_matches_single_device():
    assert jax.device_count() >= 8, "conftest must force 8 cpu devices"
    engine, net, params, apply_fn = _tiny_setup()
    tx = make_optimizer({"lr": 1e-3})
    batch = _batch(b=8)
    rng = jax.random.PRNGKey(7)

    # deep-copy: train_step donates its state, so each state needs its own
    # buffers
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)
    state_a = create_train_state(copy(params), tx)
    step_a = make_train_step(engine, apply_fn, tx, ema_start=10_000)
    state_a, m_a = step_a(state_a, batch, rng)

    mesh = make_mesh(8)
    state_b = create_train_state(copy(params), tx)
    step_b = make_train_step(engine, apply_fn, tx, ema_start=10_000,
                             mesh=mesh)
    state_b, m_b = step_b(state_b, shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(m_a["l_pix"]), float(m_b["l_pix"]),
                               rtol=1e-5)
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_sample_fn_sharded():
    # mesh mode requires the per-image-keys contract (pad_batch_with_keys):
    # keys are sharded over the data axis alongside their images
    from fastdiffsr_tpu.train import make_sample_fn, pad_batch_with_keys
    engine, net, params, apply_fn = _tiny_setup()
    mesh = make_mesh(8)
    sample = make_sample_fn(engine, apply_fn, mesh=mesh)
    cond = jnp.zeros((8, 16, 16, 3))
    cond, keys = pad_batch_with_keys(cond, 8, jax.random.PRNGKey(0), 0)
    cond = shard_batch({"c": jnp.asarray(cond)}, mesh)["c"]
    out = sample(params, cond, keys)
    assert out.shape == (8, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("backend", ["pickle", "orbax"])
def test_checkpoint_roundtrip(backend, tmp_path):
    if backend == "orbax":
        pytest.importorskip("orbax.checkpoint")
    from fastdiffsr_tpu.train.checkpoint import load_state, save_state

    engine, net, params, apply_fn = _tiny_setup()
    tx = make_optimizer({"lr": 2e-3})
    # the train step donates its input state, which would delete `params`'
    # buffers — keep a host-side copy for the fresh template below
    params_copy = jax.tree_util.tree_map(lambda x: np.array(x), params)
    state = create_train_state(params, tx)
    step_fn = make_train_step(engine, apply_fn, tx)
    state, _ = step_fn(state, _batch(), jax.random.PRNGKey(1))

    path = save_state(state, str(tmp_path), epoch=3, backend=backend)
    assert path.endswith("I1_E3")

    fresh = create_train_state(
        jax.tree_util.tree_map(jnp.asarray, params_copy), tx)
    loaded = load_state(path, fresh)  # backend autodetected from disk
    assert int(loaded.step) == 1 and int(loaded.epoch) == 3
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(loaded.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # opt_state structure (optax NamedTuples) must survive the roundtrip
    assert (jax.tree_util.tree_structure(state.opt_state)
            == jax.tree_util.tree_structure(loaded.opt_state))
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(loaded.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cached_train_step_mesh():
    """Device-resident dataset mode composes with the DP mesh: replicated
    uint8 data, in-jit batch assembly, batch sharding-constrained onto the
    data axis — identical math to the single-device cached step."""
    from fastdiffsr_tpu.parallel import replicated_sharding
    from fastdiffsr_tpu.train import make_cached_train_step

    engine, net, params, apply_fn = _tiny_setup()
    tx = make_optimizer({"lr": 1e-3})
    g = np.random.default_rng(0)
    raw = {k: jnp.asarray(g.integers(0, 255, (10, 16, 16, 3),
                                     dtype=np.uint8))
           for k in ("HR", "SR")}
    rng = jax.random.PRNGKey(5)
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)

    step_a = make_cached_train_step(engine, apply_fn, tx, batch_size=8,
                                    ema_start=0)
    state_a, m_a = step_a(create_train_state(copy(params), tx), raw, rng)

    mesh = make_mesh(8)
    repl = replicated_sharding(mesh)
    data = {k: jax.device_put(v, repl) for k, v in raw.items()}
    step_b = make_cached_train_step(engine, apply_fn, tx, batch_size=8,
                                    ema_start=0, mesh=mesh)
    state_b, m_b = step_b(create_train_state(copy(params), tx), data, rng)

    np.testing.assert_allclose(float(m_a["l_pix"]), float(m_b["l_pix"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_cached_train_step_chained():
    """n_sub=4 (four optimizer steps lax.scan-chained in one dispatch,
    per-sub-step rng = fold_in(base, state.step)) must be bit-identical
    to four sequential n_sub=1 calls with host-side folding — the
    contract that lets the CLI chain dispatches for tunnel-overhead
    amortization without changing training math."""
    from fastdiffsr_tpu.train import make_cached_train_step

    engine, net, params, apply_fn = _tiny_setup()
    tx = make_optimizer({"lr": 1e-3})
    g = np.random.default_rng(1)
    raw = {k: jnp.asarray(g.integers(0, 255, (10, 16, 16, 3),
                                     dtype=np.uint8))
           for k in ("HR", "SR")}
    rng = jax.random.PRNGKey(7)
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)

    step_1 = make_cached_train_step(engine, apply_fn, tx, batch_size=4,
                                    ema_start=2)
    state_a = create_train_state(copy(params), tx)
    losses = []
    for _ in range(4):
        # host-side folding by the CURRENT step, as the unchained CLI loop
        state_a, m = step_1(state_a, raw,
                            jax.random.fold_in(rng, int(state_a.step)))
        losses.append(float(m["l_pix"]))

    step_4 = make_cached_train_step(engine, apply_fn, tx, batch_size=4,
                                    ema_start=2, n_sub=4)
    state_b, m4 = step_4(create_train_state(copy(params), tx), raw, rng)

    assert m4["l_pix"].shape == (4,)
    np.testing.assert_allclose(np.asarray(m4["l_pix"]), losses, rtol=1e-6)
    assert int(state_b.step) == int(state_a.step) == 4
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params)
                    + jax.tree_util.tree_leaves(state_a.ema_params),
                    jax.tree_util.tree_leaves(state_b.params)
                    + jax.tree_util.tree_leaves(state_b.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("backend", ["pickle", "orbax"])
def test_load_params_only_orbax(backend, tmp_path):
    """load_params_only (used by the val/infer CLIs with no full template)
    must roundtrip both the raw and the EMA params tree; the orbax branch
    restores from saved metadata without a target tree."""
    if backend == "orbax":
        pytest.importorskip("orbax.checkpoint")
    from fastdiffsr_tpu.train.checkpoint import load_params_only, save_state

    engine, net, params, apply_fn = _tiny_setup()
    tx = make_optimizer({"lr": 2e-3})
    state = create_train_state(params, tx)
    # ema_start=0 so ema_params and params diverge after one step
    step_fn = make_train_step(engine, apply_fn, tx, ema_decay=0.9,
                              ema_start=0)
    state, _ = step_fn(state, _batch(), jax.random.PRNGKey(1))

    path = save_state(state, str(tmp_path), epoch=1, backend=backend)
    raw = load_params_only(path)
    ema = load_params_only(path, use_ema=True)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(raw)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.ema_params),
                    jax.tree_util.tree_leaves(ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the two trees genuinely differ (the flag selects something real)
    assert any(float(jnp.max(jnp.abs(jnp.asarray(a) - jnp.asarray(b)))) > 0
               for a, b in zip(jax.tree_util.tree_leaves(raw),
                               jax.tree_util.tree_leaves(ema)))


def test_cached_train_step(tmp_path):
    """Device-resident dataset mode: uint8 tiles in (virtual) HBM, batch
    assembly inside the jitted step. Loss must decrease and the on-device
    normalization must match the host loader's [-1,1] mapping exactly."""
    from PIL import Image

    from fastdiffsr_tpu.data.dataset import LRHRDataset
    from fastdiffsr_tpu.train import make_cached_train_step

    # tiny folder dataset
    root = tmp_path / "Train_8_16"
    for sub in ("lr_8", "hr_16", "sr_8_16"):
        (root / sub).mkdir(parents=True)
    g = np.random.default_rng(0)
    for i in range(5):
        for sub, size in (("lr_8", 8), ("hr_16", 16), ("sr_8_16", 16)):
            Image.fromarray(g.integers(0, 255, (size, size, 3),
                                       dtype=np.uint8)).save(
                root / sub / f"{i}.png")

    ds = LRHRDataset(str(root), l_resolution=8, r_resolution=16,
                     split="train")
    raw = ds.raw_uint8()
    assert raw["HR"].shape == (5, 16, 16, 3)
    assert raw["HR"].dtype == np.uint8
    # normalization parity vs the host loader
    np.testing.assert_allclose(
        raw["HR"][0].astype(np.float32) / 127.5 - 1.0, ds[0]["HR"],
        atol=1e-6)

    engine, net, params, apply_fn = _tiny_setup()
    tx = make_optimizer({"lr": 2e-3})
    state = create_train_state(params, tx)
    step_fn = make_cached_train_step(engine, apply_fn, tx, batch_size=4,
                                     ema_start=0)
    data = {k: jnp.asarray(v) for k, v in raw.items()}
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        state, m = step_fn(state, data, jax.random.fold_in(rng, i))
        losses.append(float(m["l_pix"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_train_step_rbg_typed_key():
    """The shipped train-CLI default is a TYPED rbg key
    (FASTDIFFSR_TPU_PRNG=rbg, cli/sr_mfe.py — threefry dropout-mask
    generation was 30% of the 256^2 step, BASELINE.md r5). The jitted
    step must accept typed keys: fold_in per step, dropout rngs, and the
    cached in-graph-folding path all run and train."""
    from fastdiffsr_tpu.train import make_cached_train_step

    engine, net, params, apply_fn = _tiny_setup(dropout=0.2)
    tx = make_optimizer({"lr": 2e-3})
    rng = jax.random.key(42, impl="rbg")
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)

    # plain step, host-side fold_in of the typed key (unchained CLI loop)
    state = create_train_state(copy(params), tx)
    step = make_train_step(engine, apply_fn, tx, ema_start=10_000)
    batch = _batch()
    losses = []
    for i in range(20):
        state, m = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(m["l_pix"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])

    # cached step with in-graph folding of the typed key (chained loop)
    g = np.random.default_rng(3)
    raw = {k: jnp.asarray(g.integers(0, 255, (10, 16, 16, 3),
                                     dtype=np.uint8))
           for k in ("HR", "SR")}
    cstep = make_cached_train_step(engine, apply_fn, tx, batch_size=4,
                                   ema_start=10_000, n_sub=3)
    cstate, cm = cstep(create_train_state(copy(params), tx), raw, rng)
    assert cm["l_pix"].shape == (3,)
    assert np.isfinite(np.asarray(cm["l_pix"])).all()
    assert int(cstate.step) == 3
