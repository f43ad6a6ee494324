"""lmdb_lite: dependency-free LMDB reader/writer + dataset wiring.

Parity targets: the reference's ``datatype: "lmdb"`` paths
(data/LRHR_dataset.py:18-27,61-96; data/prepare_data_mfe_dm.py:113,82-93)
and EDiffSR's BasicSR-style lmdb source (data/util.py:29-63,
options.py:44-55). The real ``lmdb`` package is absent in this
environment; a cross-check against it runs automatically wherever it IS
importable (final test, skipped here).
"""

import os
import pickle
import random

import numpy as np
import pytest

from fastdiffsr_tpu.data.lmdb_lite import (LmdbError, LmdbReader,
                                           write_lmdb)


def test_roundtrip_small(tmp_path):
    items = {f"k{i:03d}": bytes([i]) * (i * 7 % 50 + 1) for i in range(10)}
    info = write_lmdb(str(tmp_path / "env"), items)
    assert info["entries"] == 10 and info["depth"] == 1
    with LmdbReader(str(tmp_path / "env")) as r:
        assert len(r) == 10
        for k, v in items.items():
            assert r.get(k) == v
        assert r.get(b"missing") is None
        assert [k.decode() for k in r.keys()] == sorted(items)


def test_roundtrip_multilevel_and_overflow(tmp_path):
    rnd = random.Random(0)
    items = {}
    for i in range(20000):
        k = f"key_{rnd.randrange(10**9):09d}_{i}"
        items[k] = rnd.randbytes(
            rnd.choice([5, 40, 300, 2000, 2500, 12000]))
    write_lmdb(str(tmp_path / "env"), items)
    with LmdbReader(str(tmp_path / "env")) as r:
        assert len(r) == len(items)
        assert r.depth >= 3  # forces real branch-page search
        for k in rnd.sample(sorted(items), 500):
            assert r.get(k) == items[k]
        assert dict(r.items()) == {k.encode(): v for k, v in items.items()}


def test_empty_and_inline_overflow_boundary(tmp_path):
    write_lmdb(str(tmp_path / "empty"), {})
    with LmdbReader(str(tmp_path / "empty")) as r:
        assert len(r) == 0
        assert r.get(b"x") is None
        assert list(r.items()) == []
    # straddle the inline->overflow threshold and page-size multiples
    for sz in (2020, 2030, 2031, 4080, 4081, 8176, 8177, 100000):
        p = str(tmp_path / f"b{sz}")
        write_lmdb(p, {f"s{sz}": b"z" * sz, "tiny": b"q"})
        with LmdbReader(p) as r:
            assert r.get(f"s{sz}") == b"z" * sz
            assert r.get("tiny") == b"q"


def test_key_validation(tmp_path):
    with pytest.raises(LmdbError):
        write_lmdb(str(tmp_path / "bad"), {"x" * 600: b"v"})
    with pytest.raises(LmdbError):
        write_lmdb(str(tmp_path / "bad2"), {"": b"v"})


def _write_tiles(root, n=4, size=32, scale=4, seed=0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(f"{root}/{i:05d}.png")


def test_prepare_lmdb_matches_img(tmp_path):
    """prepare --lmdb output read through LRHRDataset(datatype='lmdb')
    equals the folder output read through datatype='img'."""
    from fastdiffsr_tpu.data.dataset import LRHRDataset
    from fastdiffsr_tpu.data.prepare import prepare

    src = str(tmp_path / "src")
    _write_tiles(src, n=4, size=32)
    prepare(src, str(tmp_path / "folder"), n_worker=1, sizes=(8, 32),
            verbose=False)
    prepare(src, str(tmp_path / "env"), n_worker=1, sizes=(8, 32),
            lmdb=True, verbose=False)

    ds_img = LRHRDataset(str(tmp_path / "folder"), datatype="img",
                         l_resolution=8, r_resolution=32, split="val",
                         need_LR=True)
    ds_l = LRHRDataset(str(tmp_path / "env"), datatype="lmdb",
                       l_resolution=8, r_resolution=32, split="val",
                       need_LR=True)
    assert len(ds_l) == len(ds_img) == 4
    for i in range(4):
        a, b = ds_img[i], ds_l[i]
        for k in ("HR", "SR", "LR"):
            np.testing.assert_array_equal(a[k], b[k])
    raw = ds_l.raw_uint8()
    assert raw["HR"].shape == (4, 32, 32, 3)
    assert raw["HR"].dtype == np.uint8
    with pytest.raises(KeyError):
        ds_l[99]


def test_ediffsr_lmdb_source_matches_folder(tmp_path):
    """LQGT dataset with lmdb GT/LQ roots equals the folder version
    (val phase, deterministic)."""
    from PIL import Image

    from fastdiffsr_tpu.ediffsr.data import LQGTDataset

    rng = np.random.default_rng(1)
    roots = {}
    for name, size in (("gt", 32), ("lq", 8)):
        folder = str(tmp_path / name)
        os.makedirs(folder)
        env_items, keys, res = {}, [], []
        for i in range(3):
            arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(f"{folder}/{i:05d}.png")
            # BasicSR lmdb stores cv2-order (BGR) raw bytes
            env_items[f"{i:05d}"] = arr[..., ::-1].tobytes()
            keys.append(f"{i:05d}")
            res.append(f"3_{size}_{size}")
        env = str(tmp_path / f"{name}.lmdb")
        write_lmdb(env, env_items)
        with open(os.path.join(env, "meta_info.pkl"), "wb") as f:
            pickle.dump({"name": name, "keys": keys, "resolution": res}, f)
        roots[name] = (folder, env)

    base = {"phase": "val", "scale": 4, "seed": 0}
    ds_folder = LQGTDataset({**base, "dataroot_GT": roots["gt"][0],
                             "dataroot_LQ": roots["lq"][0]})
    ds_lmdb = LQGTDataset({**base, "dataroot_GT": roots["gt"][1],
                           "dataroot_LQ": roots["lq"][1]})
    assert len(ds_folder) == len(ds_lmdb) == 3
    for i in range(3):
        a, b = ds_folder[i], ds_lmdb[i]
        np.testing.assert_allclose(a["GT"], b["GT"], atol=0)
        np.testing.assert_allclose(a["LQ"], b["LQ"], atol=0)


def test_options_lmdb_autodetect(tmp_path):
    from fastdiffsr_tpu.ediffsr.options import parse_options
    yml = tmp_path / "opt.yml"
    yml.write_text(
        "name: t\ndegradation: {scale: 4}\n"
        "datasets:\n  train:\n    dataroot_GT: /data/gt.lmdb\n"
        "  val:\n    dataroot_GT: /data/gt_imgs\n")
    opt = parse_options(str(yml), is_train=False, root=str(tmp_path))
    assert opt["datasets"]["train"]["data_type"] == "lmdb"
    assert opt["datasets"]["val"]["data_type"] == "img"


def test_against_real_lmdb_package(tmp_path):
    """Interchange proof where the real lmdb package exists: our writer's
    file reads back via liblmdb, and liblmdb's file reads via our reader."""
    lmdb = pytest.importorskip("lmdb")
    items = {f"k{i:04d}".encode(): bytes([i % 256]) * (i * 13 % 5000 + 1)
             for i in range(500)}
    ours = str(tmp_path / "ours")
    write_lmdb(ours, items.items())
    env = lmdb.open(ours, readonly=True, lock=False)
    with env.begin() as txn:
        assert txn.stat()["entries"] == len(items)
        for k, v in items.items():
            assert txn.get(k) == v
    env.close()

    theirs = str(tmp_path / "theirs")
    env = lmdb.open(theirs, map_size=1 << 28)
    with env.begin(write=True) as txn:
        for k, v in items.items():
            txn.put(k, v)
    env.close()
    with LmdbReader(theirs) as r:
        for k, v in items.items():
            assert r.get(k) == v
