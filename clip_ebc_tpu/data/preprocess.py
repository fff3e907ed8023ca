"""Offline preprocessing: raw datasets -> canonical {split}/{images,labels}.

Reproduces the reference pipeline (reference preprocess.py): aspect-
preserving resize into [min_size, max_size] snapped to multiples of 32
(bicubic), point labels rescaled, sequential renaming, optional uint8
CHW .npy image dumps, and semi-supervised index files for the train
split. Per-dataset source parsers: ShanghaiTech (.mat image_info), NWPU
(.mat annPoints + part'd image dirs), UCF-QNRF (.mat annPoints), JHU
(.txt x y ... lines).
"""

from __future__ import annotations

import glob
import os
import warnings
from typing import Optional, Tuple

import numpy as np

from ..config import standardize_dataset_name


def calc_size(
    img_w: int, img_h: int, min_size: int, max_size: float, base: int = 32
) -> Optional[Tuple[int, int]]:
    """New (w, h) in [min_size, max_size], multiples of ``base``, aspect
    preserved; falls back to uncapped max when the aspect ratio makes the
    range unsatisfiable (reference preprocess.py:14-53)."""
    if min_size % base:
        raise ValueError(f"min_size ({min_size}) must be a multiple of {base}")
    if max_size != float("inf") and max_size % base:
        raise ValueError(f"max_size ({max_size}) must be a multiple of {base}")
    if min_size > max_size:
        raise ValueError(f"min_size ({min_size}) > max_size ({max_size})")

    ratios = (img_w / img_h, img_h / img_w)
    if not (min_size / max_size <= min(ratios) and max(ratios) <= max_size / min_size):
        warnings.warn(
            f"cannot fit {img_w}x{img_h} into [{min_size}, {max_size}] while "
            f"preserving aspect ratio; uncapping max size"
        )
        return calc_size(img_w, img_h, min_size, float("inf"), base)

    if min_size <= min(img_w, img_h) and max(img_w, img_h) <= max_size:
        ratio = 1.0
    elif min(img_w, img_h) < min_size:
        ratio = min_size / min(img_w, img_h)
    else:
        ratio = max_size / max(img_w, img_h)
    new_w = int(round(img_w * ratio / base) * base)
    new_h = int(round(img_h * ratio / base) * base)
    new_w = int(max(min_size, min(max_size, new_w)))
    new_h = int(max(min_size, min(max_size, new_h)))
    return new_w, new_h


def _resize_bgr(image: np.ndarray, size_wh: Tuple[int, int]) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(image, size_wh, interpolation=cv2.INTER_CUBIC)
    except ImportError:
        from PIL import Image

        return np.asarray(
            Image.fromarray(image[..., ::-1]).resize(size_wh, Image.BICUBIC)
        )[..., ::-1]


def _imread_bgr(path: str) -> np.ndarray:
    try:
        import cv2

        img = cv2.imread(path)
        if img is None:
            raise IOError(f"failed to read {path}")
        return img
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))[..., ::-1].copy()


def _imwrite_bgr(path: str, image: np.ndarray) -> None:
    try:
        import cv2

        cv2.imwrite(path, image)
    except ImportError:
        from PIL import Image

        Image.fromarray(image[..., ::-1]).save(path)


def resize_and_save(
    image: np.ndarray,
    name: str,
    image_dst_dir: str,
    generate_npy: bool = False,
    label: Optional[np.ndarray] = None,
    label_dst_dir: Optional[str] = None,
    min_size: Optional[int] = None,
    max_size: Optional[float] = None,
) -> None:
    os.makedirs(image_dst_dir, exist_ok=True)
    if label is not None and label_dst_dir is not None:
        os.makedirs(label_dst_dir, exist_ok=True)

    lab = np.asarray(label, np.float64).reshape(-1, 2) if label is not None and len(label) else np.zeros((0, 2))
    if min_size is not None:
        h, w = image.shape[:2]
        new = calc_size(w, h, min_size, max_size if max_size is not None else float("inf"))
        if new is not None and new != (w, h):
            image = _resize_bgr(image, new)
            if len(lab):
                lab = lab * np.array([[new[0] / w, new[1] / h]])

    _imwrite_bgr(os.path.join(image_dst_dir, f"{name}.jpg"), image)
    if label is not None and label_dst_dir is not None:
        np.save(os.path.join(label_dst_dir, f"{name}.npy"), lab)
    if generate_npy:
        rgb_chw = np.transpose(image[..., ::-1], (2, 0, 1))  # keep uint8 to save space
        np.save(os.path.join(image_dst_dir, f"{name}.npy"), rgb_chw)


def generate_semi_supervised_indices(total: int, out_dir: str, seed: int = 42) -> None:
    """{percent}%.txt index files for semi-supervised training
    (reference preprocess.py:56-71)."""
    rng = np.random.default_rng(seed)
    for percent in (0.01, 0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0):
        chosen = np.sort(rng.choice(total, int(total * percent), replace=False))
        with open(os.path.join(out_dir, f"{int(percent * 100)}%.txt"), "w") as f:
            f.write("".join(f"{i}\n" for i in chosen))


def _load_mat_points(path: str, key: str) -> np.ndarray:
    from scipy.io import loadmat

    mat = loadmat(path)
    if key == "image_info":  # ShanghaiTech nesting
        return np.asarray(mat["image_info"][0][0][0][0][0], np.float64)
    return np.asarray(mat[key], np.float64).reshape(-1, 2)


def _process_pairs(pairs, dst_dir, split, min_size, max_size, generate_npy, loader):
    image_dst = os.path.join(dst_dir, split, "images")
    label_dst = os.path.join(dst_dir, split, "labels")
    width = len(str(len(pairs)))
    for i, (img_path, lab_path) in enumerate(pairs):
        name = f"{i + 1:0{width}d}"
        resize_and_save(
            image=_imread_bgr(img_path),
            label=loader(lab_path),
            name=name,
            image_dst_dir=image_dst,
            label_dst_dir=label_dst,
            generate_npy=generate_npy and split == "train",
            min_size=min_size,
            max_size=max_size,
        )
    if split == "train":
        generate_semi_supervised_indices(len(pairs), os.path.join(dst_dir, split))


def preprocess(
    dataset: str,
    src_dir: str,
    dst_dir: str,
    min_size: int = 256,
    max_size: float = float("inf"),
    generate_npy: bool = False,
) -> None:
    dataset = standardize_dataset_name(dataset)
    if not os.path.isdir(src_dir):
        raise FileNotFoundError(src_dir)
    os.makedirs(dst_dir, exist_ok=True)

    if dataset in ("sha", "shb"):
        for split, sub in (("train", "train_data"), ("val", "test_data")):
            imgs = sorted(
                glob.glob(os.path.join(src_dir, sub, "images", "*.jpg")),
                key=lambda p: int(os.path.basename(p).split(".")[0].split("_")[-1]),
            )
            labs = [
                os.path.join(src_dir, sub, "ground-truth", f"GT_{os.path.basename(p).split('.')[0]}.mat")
                for p in imgs
            ]
            _process_pairs(
                list(zip(imgs, labs)), dst_dir, split, min_size, max_size,
                generate_npy, lambda p: _load_mat_points(p, "image_info"),
            )
    elif dataset == "qnrf":
        for split, sub, count in (("train", "Train", 1201), ("val", "Test", 334)):
            imgs = sorted(
                glob.glob(os.path.join(src_dir, sub, "*.jpg")),
                key=lambda p: int(os.path.basename(p).split(".")[0].split("_")[1]),
            )
            if len(imgs) != count:
                raise ValueError(f"expected {count} {split} images, found {len(imgs)}")
            labs = [p.replace(".jpg", "_ann.mat") for p in imgs]
            _process_pairs(
                list(zip(imgs, labs)), dst_dir, split, min_size, max_size,
                generate_npy, lambda p: _load_mat_points(p, "annPoints"),
            )
    elif dataset == "nwpu":
        def part_path(idx: str) -> str:
            part = min(5, (int(idx) - 1) // 1000 + 1)
            return os.path.join(src_dir, f"images_part{part}", f"{idx}.jpg")

        for split in ("train", "val"):
            with open(os.path.join(src_dir, f"{split}.txt")) as f:
                ids = [line.split(" ")[0] for line in f.read().splitlines() if line]
            pairs = [
                (part_path(i), os.path.join(src_dir, "mats", f"{i}.mat")) for i in ids
            ]
            _process_pairs(
                pairs, dst_dir, split, min_size, max_size, generate_npy,
                lambda p: _load_mat_points(p, "annPoints"),
            )
        # unlabeled test split keeps original ids (reference preprocess.py:286-309)
        with open(os.path.join(src_dir, "test.txt")) as f:
            ids = [line.split(" ")[0] for line in f.read().splitlines() if line]
        image_dst = os.path.join(dst_dir, "test", "images")
        for i in ids:
            resize_and_save(
                image=_imread_bgr(part_path(i)),
                name=i,
                image_dst_dir=image_dst,
                generate_npy=False,
                min_size=min_size,
                max_size=max_size,
            )
    else:  # jhu
        def jhu_names(sub: str):
            with open(os.path.join(src_dir, sub, "image_labels.txt")) as f:
                return [line.split(",")[0] for line in f.read().splitlines() if line]

        def jhu_points(path: str) -> np.ndarray:
            with open(path) as f:
                lines = [l for l in f.read().splitlines() if l]
            return np.asarray(
                [[float(v) for v in l.split(" ")[:2]] for l in lines], np.float64
            ).reshape(-1, 2)

        train_pairs = [
            (os.path.join(src_dir, sub, "images", f"{n}.jpg"),
             os.path.join(src_dir, sub, "gt", f"{n}.txt"))
            for sub in ("train", "val")
            for n in jhu_names(sub)
        ]
        test_pairs = [
            (os.path.join(src_dir, "test", "images", f"{n}.jpg"),
             os.path.join(src_dir, "test", "gt", f"{n}.txt"))
            for n in jhu_names("test")
        ]
        _process_pairs(train_pairs, dst_dir, "train", min_size, max_size, generate_npy, jhu_points)
        _process_pairs(test_pairs, dst_dir, "val", min_size, max_size, generate_npy, jhu_points)
