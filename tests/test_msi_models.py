"""HSENet / TransENet / HAT / NDSRGAN model tests: output shapes, finite
grads, and targeted semantic checks of the tricky pieces (overlapping
window extraction vs torch unfold, non-local block vs numpy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import requires_reference


def test_ndsrgan_generator_shapes_and_grad():
    from fastdiffsr_tpu.msi.ndsrgan import DRRDBNet
    net = DRRDBNet(scale=2, nf=8, nc=4, n_blocks=2)
    x = jnp.ones((1, 8, 8, 3)) * 0.5
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    out = net.apply({"params": params}, x)
    assert out.shape == (1, 16, 16, 3)

    def loss(p):
        return jnp.mean(net.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(v).all() for v in jax.tree_util.tree_leaves(g))


def test_ndsrgan_discriminator_patch_output():
    from fastdiffsr_tpu.msi.ndsrgan import Discriminator
    d = Discriminator()
    x = jnp.zeros((2, 32, 32, 3))
    params = d.init(jax.random.PRNGKey(0), x)["params"]
    out = d.apply({"params": params}, x)
    assert out.shape[0] == 2 and out.shape[-1] == 1


def test_hsenet_shapes():
    from fastdiffsr_tpu.msi.hsenet import HSENet
    net = HSENet(scale=2, n_feats=8, n_basic_modules=1)
    x = jnp.ones((1, 8, 8, 3)) * 0.5
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    out = net.apply({"params": params}, x)
    assert out.shape == (1, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_nonlocal_block_matches_numpy():
    from fastdiffsr_tpu.msi.hsenet import NonLocalBlock2D
    net = NonLocalBlock2D(8, 4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 8)), jnp.float32)
    params = net.init(jax.random.PRNGKey(1), x)["params"]
    out = np.asarray(net.apply({"params": params}, x))

    # manual embedded-gaussian non-local with the same params
    def conv1x1(name):
        k = np.asarray(params[name]["kernel"])[0, 0]
        b = np.asarray(params[name].get("bias", np.zeros(k.shape[1])))
        return lambda a: a @ k + b

    xf = np.asarray(x).reshape(16, 8)
    g, th, ph = (conv1x1(n)(xf) for n in ("g", "theta", "phi"))
    f = th @ ph.T
    f = np.exp(f - f.max(-1, keepdims=True))
    f = f / f.sum(-1, keepdims=True)
    y = f @ g
    w_k = np.asarray(params["W"]["kernel"])[0, 0]
    w_b = np.asarray(params["W"]["bias"])
    z = (y @ w_k + w_b) + xf
    np.testing.assert_allclose(out.reshape(16, 8), z, atol=1e-5)


def test_transenet_shapes():
    from fastdiffsr_tpu.msi.transenet import TransENet
    net = TransENet(scale=2, n_feats=8, en_depth=1, de_depth=1, dim=32,
                    heads=2, dim_head=8, mlp_dim=32, patch_size=4)
    # LR 16x16 -> patches 4x4=16 at LR and 8x8=64 at HR
    x = jnp.ones((1, 16, 16, 3)) * 0.5
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    out = net.apply({"params": params}, x)
    assert out.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out)))


@requires_reference
def test_oca_window_extraction_matches_torch_unfold():
    """Our vmapped dynamic_slice must reproduce torch.nn.Unfold with
    kernel=ows, stride=ws, padding=(ows-ws)//2 (reference hat.py:348,378)."""
    import torch

    ws, ratio = 4, 0.5
    ows = int(ws * ratio) + ws
    pad = (ows - ws) // 2
    b, h, w, c = 1, 8, 8, 3
    rng = np.random.default_rng(0)
    kv = rng.standard_normal((b, h, w, c)).astype(np.float32)

    unfold = torch.nn.Unfold(kernel_size=(ows, ows), stride=ws, padding=pad)
    t = unfold(torch.from_numpy(kv.transpose(0, 3, 1, 2)))
    # (b, c*ows*ows, nw) -> (b*nw, ows*ows, c)
    nw = t.shape[-1]
    t = t.reshape(b, c, ows * ows, nw).permute(0, 3, 2, 1)
    want = t.reshape(b * nw, ows * ows, c).numpy()

    kvj = jnp.pad(jnp.asarray(kv), ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    nh = h // ws

    def get_win(i, j):
        return jax.lax.dynamic_slice(kvj, (0, i * ws, j * ws, 0),
                                     (b, ows, ows, c))

    ii = jnp.arange(nh)
    wins = jax.vmap(lambda i: jax.vmap(lambda j: get_win(i, j))(ii))(ii)
    got = np.asarray(wins.transpose(2, 0, 1, 3, 4, 5).reshape(
        b * nh * nh, ows * ows, c))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_hat_shapes():
    from fastdiffsr_tpu.msi.hat import HAT
    net = HAT(upscale=2, embed_dim=12, depths=(2,), num_heads=(2,),
              window_size=4, compress_ratio=3, squeeze_factor=6,
              mlp_ratio=2.0, num_feat=12)
    x = jnp.ones((1, 8, 8, 3)) * 0.5
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    out = net.apply({"params": params}, x)
    assert out.shape == (1, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_gan_trainer_steps(tmp_path):
    import types
    from PIL import Image
    from fastdiffsr_tpu.msi.ndsrgan import GANTrainer

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    # HR crops must be >= 32: the patch discriminator's stacked strides
    # reduce 16x16 inputs to an empty logit map (true of the reference too)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                     dtype=np.uint8)).save(d / f"{i}.png")
    args = types.SimpleNamespace(scale_factor=2, crop_size=32, lr=1e-4,
                                 weight_gan=1e-3, g_nf=8, g_nc=4,
                                 g_blocks=1)
    tr = GANTrainer(args)
    m = tr.train([str(d)], num_epochs=1, batch_size=2, max_steps=2)
    assert np.isfinite(m["g"]) and np.isfinite(m["d"])
    assert tr.mesh is not None and tr.mesh.devices.size == 2


def test_gan_trainer_single_device(tmp_path):
    """batch_size 1 selects no mesh and still trains."""
    import types
    from PIL import Image
    from fastdiffsr_tpu.msi.ndsrgan import GANTrainer

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                     dtype=np.uint8)).save(d / f"{i}.png")
    args = types.SimpleNamespace(scale_factor=2, crop_size=32, lr=1e-4,
                                 weight_gan=1e-3, g_nf=8, g_nc=4,
                                 g_blocks=1)
    tr = GANTrainer(args)
    m = tr.train([str(d)], num_epochs=1, batch_size=1, max_steps=1)
    assert tr.mesh is None
    assert np.isfinite(m["g"]) and np.isfinite(m["d"])
