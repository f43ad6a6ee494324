"""EDiffSR subsystem: IRSDE buffer/step math vs the torch reference, and
ConditionalNAFNet golden parity with converted weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdiffsr_tpu.diffusion.sde import IRSDE, IRSDEBuffers
from tests.conftest import requires_reference, REFERENCE_ROOT

EDIFF = REFERENCE_ROOT / "EDiffSR" / "codes" / "config" / "sisr"


def _load_ref_sde():
    import torch  # noqa: F401
    path = REFERENCE_ROOT / "EDiffSR" / "codes" / "utils" / "sde_utils.py"
    src = path.read_text()
    src = src.replace("import torchvision.utils as tvutils", "tvutils = None")
    ns = {}
    exec(compile(src, str(path), "exec"), ns)
    return ns["IRSDE"]


@requires_reference
@pytest.mark.parametrize("schedule", ["cosine", "linear", "constant"])
def test_irsde_buffers_match_reference(schedule):
    import torch

    RefIRSDE = _load_ref_sde()
    ref = RefIRSDE(max_sigma=50, T=20, schedule=schedule, eps=0.005,
                   device="cpu")
    ours = IRSDEBuffers.create(max_sigma=50, T=20, schedule=schedule,
                               eps=0.005)
    np.testing.assert_allclose(np.asarray(ours.thetas),
                               ref.thetas.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.sigmas),
                               ref.sigmas.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.thetas_cumsum),
                               ref.thetas_cumsum.numpy(), rtol=1e-5)
    np.testing.assert_allclose(ours.dt, float(ref.dt), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.sigma_bars),
                               ref.sigma_bars.numpy(), rtol=1e-5, atol=1e-8)


@requires_reference
def test_irsde_steps_match_reference():
    import torch

    RefIRSDE = _load_ref_sde()
    ref = RefIRSDE(max_sigma=50, T=10, schedule="cosine", eps=0.005,
                   device="cpu")
    sde = IRSDE(IRSDEBuffers.create(max_sigma=50, T=10, schedule="cosine",
                                    eps=0.005))

    rng = np.random.default_rng(0)
    x0 = rng.uniform(-1, 1, (2, 1, 8, 8)).astype(np.float32)
    mu = rng.uniform(-1, 1, (2, 1, 8, 8)).astype(np.float32)
    xt = rng.uniform(-1, 1, (2, 1, 8, 8)).astype(np.float32)
    t = 5

    ref.set_mu(torch.from_numpy(mu))
    # mu_bar / sigma_bar
    got = sde.mu_bar(jnp.asarray(x0), jnp.asarray(mu), t)
    want = ref.mu_bar(torch.from_numpy(x0), t).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)

    # optimal reverse step
    got = sde.reverse_optimum_step(jnp.asarray(xt), jnp.asarray(x0),
                                   jnp.asarray(mu), t)
    want = ref.reverse_optimum_step(torch.from_numpy(xt),
                                    torch.from_numpy(x0), t).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-6)

    # reverse sde mean step, score from noise
    noise = rng.standard_normal((2, 1, 8, 8)).astype(np.float32)
    score_ours = sde.get_score_from_noise(jnp.asarray(noise), t)
    score_ref = ref.get_score_from_noise(torch.from_numpy(noise), t).numpy()
    np.testing.assert_allclose(np.asarray(score_ours), score_ref, rtol=1e-5)
    got = sde.reverse_sde_step_mean(jnp.asarray(xt), jnp.asarray(mu),
                                    score_ours, t)
    want = ref.reverse_sde_step_mean(torch.from_numpy(xt),
                                     torch.from_numpy(score_ref),
                                     t).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-6)


def test_irsde_matching_loss_zero_for_perfect_model():
    """With the true noise as prediction, expected reverse step equals ...
    not exactly the optimal step, but the loss must be small and finite;
    with garbage predictions it must be larger."""
    sde = IRSDE(IRSDEBuffers.create(max_sigma=50, T=10, schedule="cosine",
                                    eps=0.005))
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(rng, (2, 8, 8, 3), jnp.float32, -1, 1)
    mu = jax.random.uniform(jax.random.fold_in(rng, 1), (2, 8, 8, 3),
                            jnp.float32, -1, 1)

    t_seen = {}

    def perfect_noise_fn(state, mu_, t):
        # invert: state = mu_bar + sigma_bar * eps
        tt = t.astype(jnp.int32)[:, None, None, None]
        return (state - sde.mu_bar(x0, mu_, tt)) / sde.sigma_bar(tt)

    def zero_noise_fn(state, mu_, t):
        return jnp.zeros_like(state)

    l_perfect = float(sde.matching_loss(perfect_noise_fn, x0, mu, rng))
    l_zero = float(sde.matching_loss(zero_noise_fn, x0, mu, rng))
    assert np.isfinite(l_perfect) and np.isfinite(l_zero)
    assert l_perfect < l_zero


def test_irsde_reverse_sde_runs():
    sde = IRSDE(IRSDEBuffers.create(max_sigma=50, T=10, schedule="cosine",
                                    eps=0.005))
    rng = jax.random.PRNGKey(0)
    mu = jax.random.uniform(rng, (1, 8, 8, 3), jnp.float32, -1, 1)
    xt = sde.noise_state(mu, jax.random.fold_in(rng, 1))

    def noise_fn(x, mu_, t):
        return (x - mu_) * 0.1

    out = jax.jit(lambda: sde.reverse_sde(noise_fn, xt, mu, rng))()
    assert out.shape == mu.shape
    assert np.all(np.isfinite(np.asarray(out)))

    out_ode = jax.jit(lambda: sde.reverse_sde(noise_fn, xt, mu, rng,
                                              ode=True))()
    assert np.all(np.isfinite(np.asarray(out_ode)))


def _load_ref_nafnet():
    import torch  # noqa: F401
    mu_path = EDIFF / "models" / "modules" / "module_util.py"
    arch_path = EDIFF / "models" / "modules" / "DenoisingNAFNet_arch.py"
    ns = {}
    exec(compile(mu_path.read_text(), str(mu_path), "exec"), ns)
    src = arch_path.read_text().replace(
        "from .module_util import SinusoidalPosEmb, LayerNorm, exists", "")
    exec(compile(src, str(arch_path), "exec"), ns)
    return ns["ConditionalNAFNet"]


@requires_reference
def test_nafnet_matches_torch():
    import torch

    from fastdiffsr_tpu.models.nafnet import ConditionalNAFNet
    from fastdiffsr_tpu.models.convert import torch_nafnet_to_flax

    torch.manual_seed(0)
    RefNet = _load_ref_nafnet()
    tnet = RefNet(img_channel=3, width=16, middle_blk_num=1,
                  enc_blk_nums=[2, 1], dec_blk_nums=[1, 1]).eval()
    fnet = ConditionalNAFNet(img_channel=3, width=16, middle_blk_num=1,
                             enc_blk_nums=(2, 1), dec_blk_nums=(1, 1))

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = torch_nafnet_to_flax(sd)

    rng = np.random.default_rng(1)
    B, H, W = 2, 12, 12  # non-multiple of 4 exercises the padder
    inp = rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32)
    cond = rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32)
    t = np.array([3.0, 77.0], dtype=np.float32)

    with torch.no_grad():
        out_t = tnet(torch.from_numpy(inp.transpose(0, 3, 1, 2)),
                     torch.from_numpy(cond.transpose(0, 3, 1, 2)),
                     torch.from_numpy(t))
    out_t = out_t.numpy().transpose(0, 2, 3, 1)

    out_f = np.asarray(fnet.apply({"params": params}, jnp.asarray(inp),
                                  jnp.asarray(cond), jnp.asarray(t),
                                  deterministic=True))
    assert out_f.shape == out_t.shape
    np.testing.assert_allclose(out_f, out_t, atol=2e-4, rtol=1e-3)


def test_nafnet_reformulation_modes_match_literal():
    """The opt-in graph reformulations (FASTDIFFSR_TPU_NAF_DW=shift,
    FASTDIFFSR_TPU_NAF_UP=tconv) are exact on the SAME param tree as the
    literal depthwise-conv / pixel-shuffle forward."""
    from fastdiffsr_tpu.models.nafnet import ConditionalNAFNet

    kw = dict(img_channel=3, width=16, middle_blk_num=1,
              enc_blk_nums=(2, 1), dec_blk_nums=(1, 1))
    lit = ConditionalNAFNet(**kw)
    ref = ConditionalNAFNet(dw_mode="shift", up_mode="tconv", **kw)

    rng = np.random.default_rng(5)
    B, H, W = 2, 12, 12
    inp = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), jnp.float32)
    cond = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), jnp.float32)
    t = jnp.asarray([3.0, 77.0], jnp.float32)

    params = lit.init(jax.random.PRNGKey(0), inp, cond, t)["params"]
    # identical param trees: the reformulations hold the same leaves
    p2 = ref.init(jax.random.PRNGKey(0), inp, cond, t)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(p2)

    want = lit.apply({"params": params}, inp, cond, t, deterministic=True)
    got = ref.apply({"params": params}, inp, cond, t, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)

    # bf16 must also run (the tconv fold once assumed its input dtype
    # matched the kernel; residual adds promote to f32 — caught live)
    lit16 = ConditionalNAFNet(dtype=jnp.bfloat16, **kw)
    ref16 = ConditionalNAFNet(dtype=jnp.bfloat16, dw_mode="shift",
                              up_mode="tconv", **kw)
    w16 = lit16.apply({"params": params}, inp, cond, t, deterministic=True)
    g16 = ref16.apply({"params": params}, inp, cond, t, deterministic=True)
    np.testing.assert_allclose(np.asarray(g16), np.asarray(w16),
                               atol=3e-2, rtol=3e-2)


def test_nafnet_fold_parity():
    """fold2 batch-pair channel packing (FASTDIFFSR_TPU_NAF_FOLD=enc|all)
    is exact on the SAME param tree: the block-diagonal shared-weight
    kernels add only exact zeros to each contraction and every channel
    permutation rides inside the kernel constants, so the folded forward
    is bit-equal to the literal one (VERDICT r4 missing #3 — the EDiffSR
    analogue of the flagship's FASTDIFFSR_TPU_FOLD)."""
    from fastdiffsr_tpu.models.nafnet import ConditionalNAFNet

    kw = dict(img_channel=3, width=16, middle_blk_num=1,
              enc_blk_nums=(2, 1), dec_blk_nums=(1, 1))
    lit = ConditionalNAFNet(**kw)

    rng = np.random.default_rng(7)
    B, H, W = 4, 12, 12          # even batch (fold pairs), padder exercised
    inp = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), jnp.float32)
    cond = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), jnp.float32)
    t = jnp.asarray([3.0, 77.0, 10.0, 50.0], jnp.float32)

    params = lit.init(jax.random.PRNGKey(0), inp[:1], cond[:1],
                      t[:1])["params"]
    want = np.asarray(lit.apply({"params": params}, inp, cond, t,
                                deterministic=True))

    for mode in ("enc", "all"):
        fold = ConditionalNAFNet(fold_mode=mode, **kw)
        p2 = fold.init(jax.random.PRNGKey(0), inp[:2], cond[:2],
                       t[:2])["params"]
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(p2)
        got = np.asarray(fold.apply({"params": params}, inp, cond, t,
                                    deterministic=True))
        np.testing.assert_array_equal(got, want)

    # odd batch: folding silently disabled (B is static), output unchanged
    odd = ConditionalNAFNet(fold_mode="all", **kw)
    got_odd = np.asarray(odd.apply({"params": params}, inp[:3], cond[:3],
                                   t[:3], deterministic=True))
    np.testing.assert_array_equal(got_odd, want[:3])

    # bf16 (the benched dtype) must also fold bit-equal
    lit16 = ConditionalNAFNet(dtype=jnp.bfloat16, **kw)
    fold16 = ConditionalNAFNet(dtype=jnp.bfloat16, fold_mode="all", **kw)
    w16 = np.asarray(lit16.apply({"params": params}, inp, cond, t,
                                 deterministic=True))
    g16 = np.asarray(fold16.apply({"params": params}, inp, cond, t,
                                  deterministic=True))
    np.testing.assert_array_equal(g16, w16)


def test_reverse_sde_unroll_invariant():
    """lax.scan unroll is a schedule knob, not a math change."""
    from fastdiffsr_tpu.diffusion.sde import IRSDE, IRSDEBuffers

    sde = IRSDE(IRSDEBuffers.create(max_sigma=10.0, T=8, schedule="cosine",
                                    eps=0.005))
    rng = jax.random.PRNGKey(3)
    mu = jax.random.uniform(rng, (1, 4, 4, 3), jnp.float32, -1, 1)
    xt = sde.noise_state(mu, rng)

    def noise_fn(x, m, t):
        return 0.1 * (x - m)

    a = sde.reverse_sde(noise_fn, xt, mu, rng, unroll=1)
    b = sde.reverse_sde(noise_fn, xt, mu, rng, unroll=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_ode_sampler_matches_scipy_rk45():
    """Pure-JAX adaptive RK45 (IRSDE.ode_sampler) vs scipy solve_ivp RK45 on
    the identical drift (the reference ode_sampler wraps scipy the same way,
    sde_utils.py:264-288)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from scipy import integrate

    from fastdiffsr_tpu.diffusion.sde import IRSDE, IRSDEBuffers

    T = 20
    sde = IRSDE(IRSDEBuffers.create(max_sigma=10.0, T=T, schedule="cosine",
                                    eps=0.005))
    mu = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (1, 4, 4, 3)), jnp.float32)
    rng = jax.random.PRNGKey(1)
    xt = sde.noise_state(mu, rng)

    # deterministic "network": predicted noise = scaled tanh of the state
    def noise_fn(x, m, t):
        return jnp.tanh(x - m) * 0.3

    # tight tolerances: the drift is discontinuous in t (int truncation),
    # so the two adaptive controllers only agree in the tol -> 0 limit
    x_jax, nsteps = sde.ode_sampler(noise_fn, xt, mu,
                                    rtol=1e-7, atol=1e-7, eps=1e-3)
    assert int(nsteps) > 0

    # scipy on the same drift
    b = sde.b
    shape = xt.shape

    def ode_func(t, flat):
        t_idx = int(np.clip(int(t), 1, T))
        x = jnp.asarray(flat.reshape(shape), jnp.float32)
        noise = noise_fn(x, mu, None)
        score = sde.get_score_from_noise(noise, t_idx)
        return np.asarray(
            sde.ode_reverse_drift(x, mu, score, t_idx)).reshape(-1)

    sol = integrate.solve_ivp(ode_func, (T, 1e-3),
                              np.asarray(xt).reshape(-1).astype(np.float64),
                              rtol=1e-7, atol=1e-7, method="RK45")
    x_scipy = sol.y[:, -1].reshape(shape)
    np.testing.assert_allclose(np.asarray(x_jax), x_scipy,
                               atol=2e-2, rtol=2e-2)


def test_ode_sampler_survives_nan_drift():
    """A NaN from the network must terminate the solver (reject+shrink to
    the h floor), not poison the controller into burning max_steps."""
    import jax
    import jax.numpy as jnp
    from fastdiffsr_tpu.diffusion.sde import IRSDE, IRSDEBuffers

    sde = IRSDE(IRSDEBuffers.create(max_sigma=10.0, T=10))
    mu = jnp.zeros((1, 4, 4, 3), jnp.float32)
    xt = sde.noise_state(mu, jax.random.PRNGKey(0))

    def nan_net(x, m, t):
        return x * jnp.nan

    x, n = sde.ode_sampler(nan_net, xt, mu, max_steps=500)
    assert int(n) == 0          # nothing accepted
    # returned state is the untouched xt (no NaN contamination)
    np.testing.assert_allclose(np.asarray(x), np.asarray(xt))


@requires_reference
def test_irsde_full_reverse_loops_match_reference():
    """Whole reverse-SDE and reverse-ODE loops (one lax.scan each) vs the
    torch reference's python loops (sde_utils.py:229-254), with identical
    dispersion noise injected and an identical parameter-free
    t-dependent noise model set on both sides."""
    import torch

    RefIRSDE = _load_ref_sde()
    T, B = 10, 2
    ref = RefIRSDE(max_sigma=50, T=T, schedule="cosine", eps=0.005,
                   device="cpu")
    sde = IRSDE(IRSDEBuffers.create(max_sigma=50, T=T, schedule="cosine",
                                    eps=0.005))

    rng = np.random.default_rng(7)
    shape = (B, 1, 8, 8)  # elementwise math: same layout on both sides
    mu = rng.uniform(-1, 1, shape).astype(np.float32)
    xt = rng.uniform(-1, 1, shape).astype(np.float32)
    noise_seq = rng.standard_normal((T, *shape)).astype(np.float32)

    # output proportional to sigma_bar(t) so score = -noise/sigma_bar
    # stays O(1): the raw-score trajectory diverges (sigma_bar(1) is
    # tiny) and amplifies f32 ordering noise past any tolerance
    class TinyNoiseModel(torch.nn.Module):
        def forward(self, x, mu_, t):
            return (0.5 * torch.tanh(x - mu_) * (1 + float(t) / T)
                    * ref.sigma_bar(t))

    ref.set_mu(torch.from_numpy(mu))
    ref.set_model(TinyNoiseModel())

    # torch loop draws randn_like once per step, t = T .. 1
    draws = [noise_seq[t - 1] for t in range(T, 0, -1)]
    state = {"i": 0}
    real_randn_like = torch.randn_like

    def fake_randn_like(t):
        d = draws[state["i"]]
        state["i"] += 1
        return torch.from_numpy(d)

    torch.randn_like = fake_randn_like
    try:
        with torch.no_grad():
            out_sde = ref.reverse_sde(torch.from_numpy(xt)).numpy()
    finally:
        torch.randn_like = real_randn_like
    assert state["i"] == T
    with torch.no_grad():
        out_ode = ref.reverse_ode(torch.from_numpy(xt)).numpy()

    def noise_fn(x, mu_, tvec):
        t = tvec[0]
        sig = sde.b.sigma_bars[t.astype(jnp.int32)]
        return 0.5 * jnp.tanh(x - mu_) * (1 + t / T) * sig

    ours_sde = np.asarray(sde.reverse_sde(
        noise_fn, jnp.asarray(xt), jnp.asarray(mu), jax.random.PRNGKey(0),
        noise_seq=jnp.asarray(noise_seq)))
    np.testing.assert_allclose(ours_sde, out_sde, atol=2e-5)

    ours_ode = np.asarray(sde.reverse_sde(
        noise_fn, jnp.asarray(xt), jnp.asarray(mu), jax.random.PRNGKey(0),
        ode=True))
    np.testing.assert_allclose(ours_ode, out_ode, atol=2e-5)


def test_restore_batched_mesh_equals_per_image():
    """The batched + DP-meshed restore path (ediffsr/train.py
    make_restore_fn with per-image keys) is invariant to batch grouping
    and to the mesh: batch-4 over a 4-device mesh == batch-2 unmeshed ==
    the batch-1 per-image loop, image-for-image (VERDICT r2 next #3 —
    the EDiffSR analogue of tests/test_mesh_sampler.py)."""
    from fastdiffsr_tpu.ediffsr.train import (make_restore_fn,
                                              restore_batched)
    from fastdiffsr_tpu.parallel import make_mesh

    sde = IRSDE(IRSDEBuffers.create(max_sigma=50, T=8, schedule="cosine",
                                    eps=0.005))

    def apply_fn(params, x, mu, t):
        return params * jnp.tanh(x - mu) * (1 + t[:, None, None, None] / 8)

    rng_np = np.random.default_rng(0)
    n, size, scale = 6, 4, 2
    samples = [{"LQ": rng_np.uniform(0, 1, (1, size, size, 3))
                .astype(np.float32)} for _ in range(n)]
    params = jnp.float32(0.3)
    key = jax.random.PRNGKey(11)

    def run(batch_size, mesh=None):
        restore = make_restore_fn(sde, apply_fn, scale, "sde", mesh=mesh)
        outs = []
        start = 0
        while start < n:
            chunk = samples[start:start + batch_size]
            outs.append(restore_batched(restore, params, chunk,
                                        batch_size, key, start))
            start += batch_size
        return np.concatenate(outs, axis=0)

    ref = run(1)                       # the reference-style per-image loop
    assert ref.shape == (n, size * scale, size * scale, 3)
    np.testing.assert_allclose(run(2), ref, atol=1e-5)
    np.testing.assert_allclose(run(4), ref, atol=1e-5)  # incl. padded tail
    mesh = make_mesh(4)
    np.testing.assert_allclose(run(4, mesh=mesh), ref, atol=1e-5)
