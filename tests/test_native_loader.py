"""Native C++ loader: build, decode parity vs PIL, batch normalize+flip."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("native")
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i in range(3):
        arr = rng.integers(0, 255, (12, 10, 3), dtype=np.uint8)
        p = d / f"{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
        arrays.append(arr)
    return paths, arrays


@pytest.fixture(scope="module")
def lib_available():
    from fastdiffsr_tpu.native import get_lib
    if get_lib() is None:
        pytest.skip("native loader could not be built")
    return True


def test_decode_matches_pil(pngs, lib_available):
    from fastdiffsr_tpu.native import decode_rgb, image_dims
    paths, arrays = pngs
    for p, a in zip(paths, arrays):
        assert image_dims(p) == (10, 12)  # (w, h)
        got = decode_rgb(p)
        np.testing.assert_array_equal(got, a)


def test_batch_normalize_and_flip(pngs, lib_available):
    from fastdiffsr_tpu.native import load_batch_f32
    paths, arrays = pngs
    out = load_batch_f32(paths, width=10, height=12, scale=2.0,
                         offset=-1.0, flips=[0, 1, 0], n_threads=2)
    assert out is not None and out.shape == (3, 12, 10, 3)
    want0 = arrays[0].astype(np.float32) / 255.0 * 2 - 1
    np.testing.assert_allclose(out[0], want0, atol=1e-6)
    want1 = (arrays[1].astype(np.float32) / 255.0 * 2 - 1)[:, ::-1, :]
    np.testing.assert_allclose(out[1], want1, atol=1e-6)


def test_jpeg_decode(tmp_path, lib_available):
    from PIL import Image
    from fastdiffsr_tpu.native import decode_rgb
    # smooth gradient compresses well; random noise would not round-trip
    g = np.linspace(0, 255, 16, dtype=np.uint8)
    arr = np.stack([np.tile(g, (16, 1))] * 3, axis=-1)
    p = tmp_path / "x.jpg"
    Image.fromarray(arr).save(p, quality=95)
    got = decode_rgb(str(p))
    assert got is not None and got.shape == (16, 16, 3)
    assert np.mean(np.abs(got.astype(int) - arr.astype(int))) < 5
