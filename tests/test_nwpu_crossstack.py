"""Cross-stack NWPU submission-driver parity (VERDICT r3 item 8).

Runs the reference's OWN test_nwpu.py driver (reference test_nwpu.py:38-116
— dataset decode, sliding-window predict, count sum, submission-file
formatting) and our cli/test_nwpu.py over the SAME synthetic images with
the SAME random weights (converted torch -> flax), then diffs the emitted
submission files — extending count-space parity from the model forward to
the full driver.

Environment shims (this image has no torchvision and no egress):
- a minimal torchvision stub provides the two standard transforms the
  NWPU decode path uses (ToTensor: PIL -> CHW float/255; Normalize) with
  their documented math;
- ``load_state_dict_from_url`` is patched to a no-op (strict=False load
  of {}), then the model is randomized and saved, so both stacks load the
  identical state dict from disk;
- the reference's hard-coded ``data/nwpu`` root and 1500-image assert are
  bypassed by a subclass that sets the tmp root but keeps the reference's
  ``__getitem__`` decode path byte-for-byte.
"""

import importlib
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_loader import REF, _ensure_pkg, load_reference, randomize_

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _install_torchvision_stub():
    """Minimal stand-ins for the torchvision symbols the reference NWPU
    path imports. ToTensor/Normalize implement torchvision's documented
    semantics exactly (PIL RGB -> CHW float32 in [0,1]; (x-mean)/std);
    ColorJitter / the functional module are import-time-only here."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvf = types.ModuleType("torchvision.transforms.functional")

    class ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic, dtype=np.uint8).astype(np.float32) / 255.0
            return torch.from_numpy(arr.transpose(2, 0, 1).copy())

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean, dtype=torch.float32)[:, None, None]
            self.std = torch.tensor(std, dtype=torch.float32)[:, None, None]

        def __call__(self, t):
            return (t - self.mean) / self.std

    class ColorJitter:  # imported by datasets/transforms.py, never built here
        def __init__(self, *a, **k):
            raise NotImplementedError("stub")

    class InterpolationMode:
        BICUBIC = "bicubic"
        BILINEAR = "bilinear"

    tvt.ToTensor, tvt.Normalize, tvt.ColorJitter = ToTensor, Normalize, ColorJitter
    tvt.InterpolationMode = InterpolationMode
    tvt.functional = tvf
    tv.transforms = tvt
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt
    sys.modules["torchvision.transforms.functional"] = tvf


def _load_reference_driver(tmp_ref_dir):
    """Exec the reference's test_nwpu.py with its absolute imports aliased
    to the reference_loader's synthetic packages."""
    ns = load_reference()
    _install_torchvision_stub()

    _ensure_pkg("refd", f"{REF}/datasets")
    crowd = importlib.import_module("refd.crowd")
    trs = importlib.import_module("refd.transforms")
    _ensure_pkg("refu", f"{REF}/utils")
    eval_utils = importlib.import_module("refu.eval_utils")
    log_utils = importlib.import_module("refu.log_utils")

    # populate the synthetic encoder_decoder package the way the real
    # __init__ aliases it, with the URL download neutralized (no egress;
    # weights come from the saved random state dict instead)
    vggm = importlib.import_module("refm.encoder_decoder.vgg")
    vggm.load_state_dict_from_url = lambda url, **kw: {}
    ed = sys.modules["refm.encoder_decoder"]
    ed.vgg11_ae = vggm.vgg11

    # real models/__init__ (get_model router), executed under the refm pkg
    clip_pkg = sys.modules["refm.clip"]
    clip_pkg._clip_ebc = ns.clip_model._clip_ebc
    clip_pkg.CLIP_EBC = ns.clip_model.CLIP_EBC
    spec = importlib.util.spec_from_file_location(
        "refm_models_init", f"{REF}/models/__init__.py")
    models_mod = importlib.util.module_from_spec(spec)
    models_mod.__package__ = "refm"
    spec.loader.exec_module(models_mod)

    datasets_alias = types.ModuleType("datasets")
    datasets_alias.NWPUTest = crowd.NWPUTest
    datasets_alias.Resize2Multiple = trs.Resize2Multiple
    utils_alias = types.ModuleType("utils")
    utils_alias.get_config = log_utils.get_config
    utils_alias.sliding_window_predict = eval_utils.sliding_window_predict

    saved = {}
    for name, mod in (("datasets", datasets_alias), ("models", models_mod),
                      ("utils", utils_alias)):
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod
    try:
        dspec = importlib.util.spec_from_file_location(
            "ref_test_nwpu", f"{REF}/test_nwpu.py")
        driver = importlib.util.module_from_spec(dspec)
        dspec.loader.exec_module(driver)
    finally:
        for name, mod in saved.items():
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod

    # the driver writes under current_dir (the read-only reference tree):
    # repoint it at a tmp mirror whose configs/ is the reference's own
    os.makedirs(tmp_ref_dir, exist_ok=True)
    cfg_link = os.path.join(tmp_ref_dir, "configs")
    if not os.path.exists(cfg_link):
        os.symlink(f"{REF}/configs", cfg_link)
    driver.current_dir = tmp_ref_dir
    return driver, crowd


@pytest.mark.slow
def test_nwpu_driver_crossstack_count_parity(tmp_path):
    import jax  # noqa: F401 — conftest re-exec guarantees the CPU mesh env

    data_root = tmp_path / "data"
    img_dir = data_root / "nwpu" / "test" / "images"
    img_dir.mkdir(parents=True)
    from PIL import Image

    rng = np.random.default_rng(42)
    sizes = {3098: (160, 224), 3099: (192, 160), 3100: (224, 224)}
    for iid, (h, w) in sizes.items():
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB"
        ).save(img_dir / f"{iid}.jpg")

    tmp_ref = str(tmp_path / "refrun")
    driver, crowd = _load_reference_driver(tmp_ref)

    # same random weights for both stacks, via the driver's own
    # "best_*" raw-state-dict loading branch (reference test_nwpu.py:67).
    # Bins must match what the driver itself will load from
    # configs/reduction_8.json[4]["nwpu"] (reference test_nwpu.py:45-50).
    import json

    input_size, reduction, truncation = 128, 8, 4
    with open(f"{REF}/configs/reduction_{reduction}.json") as f:
        bcfg = json.load(f)[str(truncation)]["nwpu"]
    bins = [(float(b[0]), float(b[1])) for b in bcfg["bins"]["fine"]]
    anchors = [float(p) for p in bcfg["anchor_points"]["fine"]["average"]]
    ref_model = driver.get_model(
        backbone="vgg11_ae", input_size=input_size, reduction=reduction,
        bins=bins, anchor_points=anchors,
    )
    randomize_(ref_model, seed=5)
    wdir = tmp_path / "weights" / "vgg11_ae"
    wdir.mkdir(parents=True)
    wpath = str(wdir / "best_mae.pth")
    torch.save(ref_model.state_dict(), wpath)

    # reference NWPUTest hard-codes data/nwpu + a 1500-image assert; keep
    # its decode path (__getitem__) and only repoint the listing
    stub_tt = sys.modules["torchvision.transforms"]
    root = str(data_root / "nwpu")

    class _TinyNWPUTest(crowd.NWPUTest):
        def __init__(self, transforms=None, sigma=None, return_filename=False):
            self.root = root
            names = sorted(os.listdir(os.path.join(root, "test", "images")),
                           key=crowd.get_id)
            self.image_type = "jpg"
            self.image_names = tuple(names)
            self.to_tensor = stub_tt.ToTensor()
            self.normalize = stub_tt.Normalize(IMAGENET_MEAN, IMAGENET_STD)
            self.transforms = transforms
            self.sigma = sigma
            self.return_filename = return_filename

    driver.NWPUTest = _TinyNWPUTest

    ref_args = driver.parser.parse_args([
        "--model", "vgg11_ae", "--input_size", str(input_size),
        "--reduction", str(reduction), "--truncation", str(truncation),
        "--weight_path", wpath, "--sliding_window", "--device", "cpu",
    ])
    driver.main(ref_args)
    ref_file = os.path.join(tmp_ref, "nwpu_test_results", "vgg11_ae_best_mae.txt")
    assert os.path.isfile(ref_file)

    # ours: same images, same converted weights, same eval config
    from clip_ebc_tpu.cli import test_nwpu as ours

    our_dir = str(tmp_path / "ours")
    ours.main([
        "--model", "vgg11_ae", "--input_size", str(input_size),
        "--reduction", str(reduction), "--truncation", str(truncation),
        "--pretrained", wpath, "--sliding_window",
        "--data_root", str(data_root), "--result_dir", our_dir,
        "--disable_size_check",
    ])
    our_files = [f for f in os.listdir(our_dir) if f.endswith(".txt")]
    assert len(our_files) == 1
    our_file = os.path.join(our_dir, our_files[0])

    def parse(path):
        with open(path) as f:
            text = f.read()
        assert not text.endswith("\n")  # submission format: no trailing \n
        out = {}
        for line in text.splitlines():
            iid, cnt = line.split(" ", 1)
            out[iid] = float(cnt)
        return out

    ref_counts, our_counts = parse(ref_file), parse(our_file)
    assert sorted(ref_counts) == sorted(our_counts) == [str(i) for i in sizes]
    for iid in ref_counts:
        assert our_counts[iid] == pytest.approx(
            ref_counts[iid], rel=2e-3, abs=5e-3
        ), (iid, ref_counts, our_counts)
