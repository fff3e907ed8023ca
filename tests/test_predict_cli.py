"""Generic predict CLI (cli/predict.py): directory of images -> counts CSV
and optional density maps — the deployment-shaped generalization of the
reference's NWPU-only driver (reference test_nwpu.py)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from clip_ebc_tpu.cli.predict import main as predict_main  # noqa: E402

# torchvision vgg11 conv indices in the `features` Sequential
_VGG11_CONVS = ((0, 3, 64), (3, 64, 128), (6, 128, 256), (8, 256, 256),
                (11, 256, 512), (13, 512, 512), (16, 512, 512), (18, 512, 512))


def _synthetic_vgg11_sd():
    g = torch.Generator().manual_seed(0)
    sd = {}
    for idx, cin, cout in _VGG11_CONVS:
        sd[f"features.{idx}.weight"] = torch.randn(cout, cin, 3, 3, generator=g) * 0.03
        sd[f"features.{idx}.bias"] = torch.zeros(cout)
    return sd


def _make_images(d, n=3):
    from PIL import Image

    os.makedirs(d, exist_ok=True)
    for i in range(n):
        rng = np.random.default_rng(i)
        Image.fromarray(
            rng.integers(0, 255, (64, 96, 3), dtype=np.uint8).astype("uint8")
        ).save(os.path.join(d, f"img_{i}.jpg"))


def test_predict_directory(tmp_path):
    ckpt = tmp_path / "vgg11.pth"
    torch.save(_synthetic_vgg11_sd(), str(ckpt))
    img_dir = tmp_path / "imgs"
    _make_images(str(img_dir))
    out_csv = tmp_path / "counts.csv"
    dens_dir = tmp_path / "density"

    predict_main([
        str(img_dir),
        "--model", "vgg11_ae", "--input_size", "64", "--reduction", "8",
        "--truncation", "4", "--bins_dataset", "shb",
        "--pretrained", str(ckpt),
        "--out", str(out_csv), "--save_density", str(dens_dir),
    ])

    lines = out_csv.read_text().strip().splitlines()
    assert lines[0] == "image,count"
    assert len(lines) == 4
    for line in lines[1:]:
        name, count = line.split(",")
        assert name.startswith("img_") and np.isfinite(float(count))
    # density maps: H/8 x W/8, sum == reported count
    d0 = np.load(dens_dir / "img_0.npy")
    assert d0.shape == (8, 12)
    assert abs(d0.sum() - float(lines[1].split(",")[1])) < 0.02


def test_predict_single_file_and_glob(tmp_path):
    ckpt = tmp_path / "vgg11.pth"
    torch.save(_synthetic_vgg11_sd(), str(ckpt))
    img_dir = tmp_path / "imgs"
    _make_images(str(img_dir), n=2)
    out_csv = tmp_path / "one.csv"
    predict_main([
        str(img_dir / "img_1.jpg"),
        "--model", "vgg11_ae", "--input_size", "64", "--reduction", "8",
        "--truncation", "4", "--bins_dataset", "shb",
        "--pretrained", str(ckpt), "--out", str(out_csv),
    ])
    assert len(out_csv.read_text().strip().splitlines()) == 2


def test_predict_requires_weights(tmp_path):
    img_dir = tmp_path / "imgs"
    _make_images(str(img_dir), n=1)
    with pytest.raises(SystemExit):
        predict_main([
            str(img_dir), "--model", "vgg11_ae", "--input_size", "64",
            "--reduction", "8", "--truncation", "4", "--bins_dataset", "shb",
        ])
