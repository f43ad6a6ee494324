"""MSI degradation pipeline: golden parity vs the reference
MSI_SR_model/model/util.py (kernel math, BatchBlur, PCAEncoder,
SRMDPreprocessing) and data/dataset.py noise injectors."""

import numpy as np
import pytest

import jax.numpy as jnp

from fastdiffsr_tpu.msi import degradation as deg

from conftest import REFERENCE_ROOT, requires_reference

UTIL = REFERENCE_ROOT / "MSI_SR_model" / "model" / "util.py"


@pytest.fixture(scope="module")
def ref_util():
    """Exec the self-contained head of model/util.py (everything through
    SRMDPreprocessing; the tail has module-level torchvision/scipy.misc
    imports that don't exist here)."""
    torch = pytest.importorskip("torch")
    lines = UTIL.read_text().split("\n")
    for i, ln in enumerate(lines):
        if ln.startswith("# class SRMDPreprocessing"):
            lines = lines[:i]
            break
    ns = {"__name__": "ref_msi_util"}
    exec(compile("\n".join(lines), str(UTIL), "exec"), ns)
    return ns


@requires_reference
def test_kernel_math_golden(ref_util):
    np.testing.assert_allclose(deg.cal_sigma(1.3, 2.7, 0.4),
                               ref_util["cal_sigma"](1.3, 2.7, 0.4),
                               rtol=1e-12)
    for l in (21, 15):
        np.testing.assert_allclose(
            deg.isotropic_gaussian_kernel(l, 2.6),
            ref_util["isotropic_gaussian_kernel"](l, 2.6), rtol=1e-12)
        sig = deg.cal_sigma(0.8, 3.1, -1.1)
        np.testing.assert_allclose(
            deg.anisotropic_gaussian_kernel(l, sig),
            ref_util["anisotropic_gaussian_kernel"](l, sig), rtol=1e-10)


@requires_reference
def test_stable_batch_kernel_golden(ref_util):
    np.testing.assert_allclose(
        deg.stable_batch_kernel(3, l=21, sig=2.6),
        ref_util["stable_batch_kernel"](3, l=21, sig=2.6, tensor=False),
        rtol=1e-6)


@requires_reference
@pytest.mark.parametrize("l", [21, 20])
def test_batch_blur_golden(ref_util, l):
    """Our NHWC grouped-conv blur == reference BatchBlur (odd + even
    kernel sizes exercise both reflect-pad branches)."""
    import torch

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (3, 32, 32, 3)).astype(np.float32)
    kernels = deg.random_batch_kernel(rng, 3, l=l, rate_iso=0.5)

    ours = np.asarray(deg.batch_blur(jnp.asarray(x), jnp.asarray(kernels)))

    blur = ref_util["BatchBlur"](l=l)
    theirs = blur(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))),
                  torch.from_numpy(kernels))
    theirs = theirs.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=2e-6)


@requires_reference
def test_pca_encoder_golden(ref_util):
    import torch

    rng = np.random.default_rng(1)
    kernels = deg.random_batch_kernel(rng, 4, l=15)
    weight = rng.normal(size=(15 * 15, 6)).astype(np.float32)

    ours = np.asarray(deg.pca_encode(jnp.asarray(kernels),
                                     jnp.asarray(weight)))
    enc = ref_util["PCAEncoder"](torch.from_numpy(weight), cuda=False)
    theirs = enc(torch.from_numpy(kernels)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@requires_reference
def test_pca_matrix_golden(ref_util):
    """Same subspace as the reference's torch.svd PCA (columns match up
    to sign)."""
    rng = np.random.default_rng(2)
    kernels = deg.random_batch_kernel(rng, 64, l=9, rate_iso=0.7)
    ours = deg.pca_matrix(kernels, k=4)
    theirs = ref_util["PCA"](
        kernels.reshape(64, -1).astype(np.float32), k=4).numpy()
    for j in range(4):
        dot = float(np.dot(ours[:, j], theirs[:, j]))
        np.testing.assert_allclose(ours[:, j] * np.sign(dot),
                                   theirs[:, j], atol=2e-4)


@requires_reference
def test_srmd_preprocessing_golden_noisefree(ref_util):
    """Deterministic path (stable kernel, no noise): blur + bicubic
    downsample vs the reference pipeline. The downsample differs by
    implementation (PIL per-channel round-trip vs jax.image.resize
    antialiased bicubic) — both Keys cubics, compared loosely; the
    kernel-code half must match exactly."""
    import torch

    # the vendored torchvision-functional copy uses pre-3.10
    # collections.Iterable
    import collections
    import collections.abc
    if not hasattr(collections, "Iterable"):
        collections.Iterable = collections.abc.Iterable

    rng = np.random.default_rng(3)
    hr = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    weight = deg.pca_matrix(deg.random_batch_kernel(rng, 256, l=21), k=15)

    pre = deg.SRMDPreprocessing(scale=4, random=False, pca_weight=weight,
                                kernel=21, noise=False, sig=2.6)
    lr_j, code_j = pre(jnp.asarray(hr))

    ref = ref_util["SRMDPreprocessing"](
        scale=4, random=False, pca_matrix=torch.from_numpy(weight),
        kernel=21, noise=False, cuda=False, sig=2.6)
    lr_t, code_t = ref(torch.from_numpy(np.ascontiguousarray(hr.transpose(0, 3, 1, 2))))
    lr_t = lr_t.numpy().transpose(0, 2, 3, 1)

    assert lr_j.shape == lr_t.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(code_j), code_t.numpy(),
                               atol=1e-4)
    diff = np.abs(np.asarray(lr_j) - lr_t)
    assert diff.mean() < 5e-3 and diff.max() < 5e-2, \
        (diff.mean(), diff.max())


def test_random_batch_noise_semantics():
    rng = np.random.default_rng(0)
    level = deg.random_batch_noise(rng, 1000, high=0.08, rate_cln=0.2)
    assert level.shape == (1000, 1)
    assert level.max() <= 0.08 and level.min() >= 0.0
    frac_clean = float((level == 0).mean())
    assert 0.1 < frac_clean < 0.3  # ~rate_cln zeroed


def test_gaussian_noising_clamps():
    x = jnp.full((1, 4, 4, 3), 0.99)
    eps = jnp.ones((1, 4, 4, 3))
    out = deg.gaussian_noising(x, jnp.asarray([[0.5]]), eps)
    assert float(out.max()) == 1.0


def test_srmd_random_draw_changes():
    pre = deg.SRMDPreprocessing(scale=2, random=True, kernel=11,
                                noise=True, pca_dim=4, seed=0)
    k1, l1 = pre.draw(2)
    k2, l2 = pre.draw(2)
    assert not np.allclose(k1, k2)
    hr = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (2, 16, 16, 3)).astype(np.float32))
    lr, code = pre(hr)
    assert lr.shape == (2, 8, 8, 3)
    assert code.shape == (2, 5)  # pca_dim + 1 noise column


def test_salt_pepper_injector():
    rng = np.random.default_rng(0)
    img = np.full((64, 64, 3), 128, np.uint8)
    out = deg.add_salt_pepper_noise(img, density=0.1, rng=rng)
    frac_pepper = float((out == 0).all(axis=2).mean())
    frac_salt = float((out == 255).all(axis=2).mean())
    assert 0.02 < frac_pepper < 0.08 and 0.02 < frac_salt < 0.08
    # mask is channel-shared: a corrupted pixel is corrupted in all chans
    corrupted = (out != 128)
    assert (corrupted.all(axis=2) | (~corrupted).any(axis=2)).all()


def test_dataset_noise_option(tmp_path):
    """RGBSRDataset(noise=...) degrades LR before the bicubic re-upsample
    (reference data/dataset.py:186-207)."""
    from PIL import Image

    from fastdiffsr_tpu.msi.data import RGBSRDataset

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                     dtype=np.uint8)).save(d / f"{i}.png")

    clean = RGBSRDataset([str(d)], crop_size=None, scale_factor=4,
                         split="val")
    noisy = RGBSRDataset([str(d)], crop_size=None, scale_factor=4,
                         split="val", noise=("Poisson", 0.2))
    c, n = clean[0], noisy[0]
    assert not np.allclose(c["LR"], n["LR"])
    assert not np.allclose(c["Bicubic"], n["Bicubic"])  # bc from noisy LR
    np.testing.assert_array_equal(c["HR"], n["HR"])  # HR untouched
    # salt&pepper leaves exact 0/1 pixels
    assert ((n["LR"] == 0).any() or (n["LR"] == 1).any())


def test_create_downsampling_dataset(tmp_path):
    from PIL import Image

    src = tmp_path / "src" / "classA"
    src.mkdir(parents=True)
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 255, (33, 34, 3),
                                 dtype=np.uint8)).save(src / "a.png")
    dst = tmp_path / "dst"
    n = deg.create_downsampling_dataset(str(tmp_path / "src"), str(dst), 4)
    assert n == 1
    out = np.asarray(Image.open(dst / "classA" / "a_downsample.png"))
    assert out.shape == (8, 8, 3)  # modcropped 32x32 -> /4


def test_gaussian_injector():
    rng = np.random.default_rng(0)
    img = np.full((64, 64, 3), 200, np.uint8)
    out = deg.add_gaussian_noise(img, variance=10.0, amplitude=2.0,
                                 rng=rng)
    assert out.dtype == np.uint8
    assert out.std() > 5  # noise applied
    # channel-shared noise
    assert np.array_equal(out[..., 0], out[..., 1])
