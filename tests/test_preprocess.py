"""Preprocessing pipeline tests on synthetic raw-dataset sources."""

import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402
from scipy.io import savemat  # noqa: E402

from clip_ebc_tpu.data.preprocess import calc_size, preprocess  # noqa: E402


def _img(path, h, w, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8).astype("uint8")).save(path)


def _st_mat(path, pts):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    dt = np.dtype([("location", object), ("number", object)])
    arr = np.empty((1, 1), dt)
    arr[0, 0] = (pts, np.array([[len(pts)]]))
    outer = np.empty((1, 1), object)
    outer[0, 0] = arr
    savemat(path, {"image_info": outer})


def test_calc_size_rules():
    assert calc_size(640, 480, 256, 1024) == (640, 480)  # already in range
    w, h = calc_size(100, 80, 256, 2048)  # too small -> scale up
    assert min(w, h) >= 256 and w % 32 == 0 and h % 32 == 0
    w, h = calc_size(5000, 4000, 256, 2048)  # too big -> scale down
    assert max(w, h) <= 2048
    with pytest.raises(ValueError):
        calc_size(100, 100, 250, 1024)  # min_size not multiple of 32


def test_calc_size_extreme_aspect_uncaps(recwarn):
    w, h = calc_size(4000, 100, 256, 512)
    assert min(w, h) >= 256  # fell back to uncapped max
    assert any("uncapping" in str(x.message) for x in recwarn.list)


def test_preprocess_nwpu_layout(tmp_path):
    src = tmp_path / "nwpu_src"
    for split, ids in (("train", [1, 2]), ("val", [3]), ("test", [4, 5])):
        (src / f"{split}.txt").parent.mkdir(parents=True, exist_ok=True)
        (src / f"{split}.txt").write_text("".join(f"{i} 0 0\n" for i in ids))
    for i in range(1, 6):
        _img(str(src / "images_part1" / f"{i}.jpg"), 240, 320, seed=i)
    rng = np.random.default_rng(0)
    os.makedirs(src / "mats", exist_ok=True)
    for i in range(1, 4):
        savemat(str(src / "mats" / f"{i}.mat"), {"annPoints": rng.uniform(0, 200, (4, 2))})

    dst = tmp_path / "nwpu_out"
    preprocess("nwpu", str(src), str(dst), min_size=96, max_size=224)
    assert sorted(os.listdir(dst / "train" / "images")) == ["1.jpg", "2.jpg"]
    assert sorted(os.listdir(dst / "val" / "labels")) == ["1.npy"]
    # test split keeps original ids and has no labels
    assert sorted(os.listdir(dst / "test" / "images")) == ["4.jpg", "5.jpg"]
    img = Image.open(dst / "train" / "images" / "1.jpg")
    assert img.size[0] % 32 == 0 and img.size[1] % 32 == 0
    lab = np.load(dst / "train" / "labels" / "1.npy")
    assert lab.shape[1] == 2


def test_preprocess_qnrf_layout(tmp_path):
    src = tmp_path / "qnrf_src"
    rng = np.random.default_rng(1)
    for sub, n in (("Train", 1201), ("Test", 334)):
        pass  # full-cardinality sources are too slow; validate the error path instead
    os.makedirs(src / "Train", exist_ok=True)
    _img(str(src / "Train" / "img_0001.jpg"), 128, 160)
    savemat(str(src / "Train" / "img_0001_ann.mat"), {"annPoints": rng.uniform(0, 100, (3, 2))})
    with pytest.raises(ValueError, match="expected 1201"):
        preprocess("qnrf", str(src), str(tmp_path / "qnrf_out"), min_size=96, max_size=224)


def test_preprocess_jhu_layout(tmp_path):
    src = tmp_path / "jhu_src"
    rng = np.random.default_rng(2)
    for sub, names in (("train", ["0001"]), ("val", ["0002"]), ("test", ["0003"])):
        os.makedirs(src / sub / "gt", exist_ok=True)
        (src / sub / "image_labels.txt").write_text("".join(f"{n},x,y\n" for n in names))
        for n in names:
            _img(str(src / sub / "images" / f"{n}.jpg"), 128, 160, seed=int(n))
            pts = rng.uniform(0, 100, (5, 2))
            (src / sub / "gt" / f"{n}.txt").write_text(
                "".join(f"{x:.1f} {y:.1f} 1 1 1\n" for x, y in pts)
            )
    dst = tmp_path / "jhu_out"
    preprocess("jhu", str(src), str(dst), min_size=96, max_size=224)
    # train+val merge into train; test becomes val (reference _jhu)
    assert len(os.listdir(dst / "train" / "images")) == 2
    assert len(os.listdir(dst / "val" / "images")) == 1
    lab = np.load(dst / "train" / "labels" / "1.npy")
    assert lab.shape == (5, 2)


def test_preprocess_shanghaitech_npy_option(tmp_path):
    src = tmp_path / "st_src"
    rng = np.random.default_rng(3)
    for sub, n in (("train_data", 2), ("test_data", 1)):
        for i in range(1, n + 1):
            _img(str(src / sub / "images" / f"IMG_{i}.jpg"), 128, 160, seed=i)
            _st_mat(str(src / sub / "ground-truth" / f"GT_IMG_{i}.mat"), rng.uniform(0, 100, (4, 2)))
    dst = tmp_path / "st_out"
    preprocess("shb", str(src), str(dst), min_size=96, max_size=224, generate_npy=True)
    # npy image dumps only for train (uint8 CHW)
    npys = [f for f in os.listdir(dst / "train" / "images") if f.endswith(".npy")]
    assert len(npys) == 2
    arr = np.load(dst / "train" / "images" / npys[0])
    assert arr.dtype == np.uint8 and arr.shape[0] == 3
    assert not any(f.endswith(".npy") for f in os.listdir(dst / "val" / "images"))
