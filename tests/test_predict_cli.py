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


def test_predict_sliding_window_smaller_image(tmp_path):
    """Images smaller than the window must be padded, not crash, and the
    density map is cropped back to the true size."""
    ckpt = tmp_path / "vgg11.pth"
    torch.save(_synthetic_vgg11_sd(), str(ckpt))
    img_dir = tmp_path / "imgs"
    _make_images(str(img_dir), n=2)  # 64x96 < 128 window
    out_csv = tmp_path / "counts.csv"
    dens = tmp_path / "dens"
    predict_main([
        str(img_dir),
        "--model", "vgg11_ae", "--input_size", "64", "--reduction", "8",
        "--truncation", "4", "--bins_dataset", "shb",
        "--pretrained", str(ckpt),
        "--sliding_window", "--window_size", "128", "--stride", "64",
        "--out", str(out_csv), "--save_density", str(dens),
    ])
    assert len(out_csv.read_text().strip().splitlines()) == 3
    assert np.load(dens / "img_0.npy").shape == (8, 12)


def test_quant_rejected_for_cnn_models(tmp_path):
    img_dir = tmp_path / "imgs"
    _make_images(str(img_dir), n=1)
    with pytest.raises(SystemExit, match="clip_"):
        predict_main([
            str(img_dir), "--model", "vgg11_ae", "--input_size", "64",
            "--reduction", "8", "--truncation", "4", "--bins_dataset", "shb",
            "--quant", "int8_static", "--pretrained", "whatever.pt",
        ])


def test_evaluator_forward_fn_is_stable():
    """_forward_fn must return ONE stable callable regardless of the
    variables tree's identity — it is a static jit arg of
    sliding_window_predict, so a fresh callable per image OR per eval
    epoch would recompile the window pipeline. The text features ride in
    the traced ctx and are re-encoded only when the tree changes."""
    import jax
    import jax.numpy as jnp

    from clip_ebc_tpu.config import get_bins_and_anchors
    from clip_ebc_tpu.models import get_model
    from clip_ebc_tpu.training.evaluate import Evaluator

    bins, anchors = get_bins_and_anchors(8, 4, "shb", "fine", "average")
    model = get_model("clip_vit_b_16", 224, 8, bins=bins, anchor_points=anchors,
                      num_vpt=2)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False)
    ev = Evaluator(model, reduction=8)
    f1, ctx1 = ev._forward_fn(v)
    f2, ctx2 = ev._forward_fn(v)
    assert f1 is f2
    assert ctx1[1] is ctx2[1]  # text feats cached per variables identity
    v2 = dict(v)
    f3, ctx3 = ev._forward_fn(v2)
    assert f3 is f1  # SAME callable even for a fresh tree (no recompile)
    assert ctx3[0] is v2
