import numpy as np
import pytest

from clip_ebc_tpu.data import transforms as T


def make_image(h=64, w=96):
    rng = np.random.default_rng(42)
    return rng.uniform(0, 1, (h, w, 3)).astype(np.float32)


def test_crop_shifts_and_filters_points():
    img = make_image()
    pts = np.array([[10.0, 5.0], [50.0, 40.0], [95.0, 63.0]], np.float32)
    out, lab = T.crop(img, pts, top=4, left=8, height=40, width=60)
    assert out.shape == (40, 60, 3)
    # point (10,5) -> (2,1) kept; (50,40) -> (42,36) kept; (95,63) -> out
    np.testing.assert_allclose(lab, [[2.0, 1.0], [42.0, 36.0]])


def test_crop_boundary_points():
    img = make_image(32, 32)
    pts = np.array([[8.0, 8.0], [23.99, 23.99], [24.0, 24.0]], np.float32)
    _, lab = T.crop(img, pts, 8, 8, 16, 16)
    # shifted coords: (0,0) kept; (15.99,15.99) kept; (16,16) excluded (>= w)
    assert len(lab) == 2


def test_resize_scales_points():
    img = make_image(64, 96)
    pts = np.array([[48.0, 32.0]], np.float32)
    out, lab = T.resize(img, pts, 32, 48)
    assert out.shape == (32, 48, 3)
    np.testing.assert_allclose(lab, [[24.0, 16.0]])


def test_resize_clamps_points():
    img = make_image(10, 10)
    pts = np.array([[9.9, 9.9]], np.float32)
    _, lab = T.resize(img, pts, 100, 100)
    assert lab[0, 0] == pytest.approx(99.0)  # clamped to size-1
    assert lab[0, 1] == pytest.approx(99.0)


def test_hflip_mirrors_x():
    img = make_image(8, 16)
    pts = np.array([[0.0, 3.0], [15.0, 2.0], [4.0, 1.0]], np.float32)
    out, lab = T.hflip(img, pts)
    np.testing.assert_allclose(out, img[:, ::-1])
    np.testing.assert_allclose(lab[:, 0], [15.0, 0.0, 11.0])
    np.testing.assert_allclose(lab[:, 1], [3.0, 2.0, 1.0])


def test_random_crop_preserves_count_density(rng):
    img = make_image(64, 64)
    # interior points away from the border stay inside any 48x48 crop? no —
    # just check output invariants
    pts = np.array([[32.0, 32.0]], np.float32)
    t = T.RandomCrop((48, 48))
    out, lab = t(img, pts, rng)
    assert out.shape == (48, 48, 3)
    assert lab.shape[1] == 2


def test_random_resized_crop_output_size(rng):
    t = T.RandomResizedCrop((56, 56), scale=(0.7, 1.3))
    for _ in range(10):
        img = make_image(64, 80)
        pts = np.array([[10.0, 10.0], [70.0, 60.0]], np.float32)
        out, lab = t(img, pts, rng)
        assert out.shape == (56, 56, 3)
        if len(lab):
            assert lab[:, 0].max() <= 55 and lab[:, 1].max() <= 55
            assert lab.min() >= 0


def test_random_resized_crop_upscale_path(rng):
    # scale > 1 on an image equal to output size forces the resize-then-crop branch
    t = T.RandomResizedCrop((64, 64), scale=(1.5, 1.5))
    img = make_image(64, 64)
    out, _ = t(img, np.zeros((0, 2), np.float32), rng)
    assert out.shape == (64, 64, 3)


def test_resize2multiple():
    t = T.Resize2Multiple(224, 224)
    img = make_image(300, 500)
    out, _ = t(img, np.zeros((0, 2), np.float32))
    # H: round((300-224)/224)=0 -> 224; W: round((500-224)/224)=1 -> 448
    assert out.shape[:2] == (224, 448)


def test_zero_pad2multiple():
    t = T.ZeroPad2Multiple(224, 224)
    img = make_image(300, 500)
    pts = np.array([[499.0, 299.0]], np.float32)
    out, lab = t(img, pts)
    # H: ceil((300-224)/224)=1 -> 448; W: ceil((500-224)/224)=2 -> 672
    assert out.shape[:2] == (448, 672)
    np.testing.assert_allclose(out[:300, :500], img)
    assert out[300:].sum() == 0 and out[:, 500:].sum() == 0
    np.testing.assert_allclose(lab, pts)  # padding never moves points


def test_window_stride_validation():
    with pytest.raises(ValueError):
        T.Resize2Multiple(224, 300)
    with pytest.raises(ValueError):
        T.ZeroPad2Multiple((224, 224), (0, 224))


def test_color_jitter_range(rng):
    t = T.ColorJitter(0.4, 0.4, 0.4, 0.2)
    img = make_image()
    out, _ = t(img, np.zeros((0, 2), np.float32), rng)
    assert out.shape == img.shape
    assert out.min() >= 0 and out.max() <= 1
    assert not np.allclose(out, img)


def test_hue_identity_and_shift():
    img = make_image()
    np.testing.assert_allclose(T.adjust_hue(img, 0.0), img)
    # full-turn shift is identity up to float error
    np.testing.assert_allclose(T.adjust_hue(img, 1.0), img, atol=1e-5)
    shifted = T.adjust_hue(img, 0.25)
    assert not np.allclose(shifted, img)


def test_grayscale(rng):
    t = T.RandomGrayscale(p=1.0)
    img = make_image()
    out, _ = t(img, np.zeros((0, 2), np.float32), rng)
    np.testing.assert_allclose(out[..., 0], out[..., 1])
    np.testing.assert_allclose(out[..., 1], out[..., 2])


def test_gaussian_blur_preserves_mean(rng):
    t = T.GaussianBlur(5)
    img = make_image()
    out, _ = t(img, np.zeros((0, 2), np.float32), rng)
    assert out.shape == img.shape
    assert abs(out.mean() - img.mean()) < 0.01
    # blur reduces variance
    assert out.var() < img.var()


def test_pepper_salt(rng):
    t = T.PepperSaltNoise(saltiness=0.5, spiciness=0.4)
    img = np.full((32, 32, 3), 0.5, np.float32)
    out, _ = t(img, np.zeros((0, 2), np.float32), rng)
    frac_salt = (out == 1.0).mean()
    frac_pepper = (out == 0.0).mean()
    assert 0.4 < frac_salt < 0.6
    assert 0.3 < frac_pepper < 0.5


def test_random_apply_probabilities(rng):
    calls = []

    def t1(im, lab, r):
        calls.append(1)
        return im, lab

    def t2(im, lab, r):
        calls.append(2)
        return im, lab

    t = T.RandomApply([t1, t2], p=[1.0, 0.0])
    img = make_image(8, 8)
    for _ in range(5):
        t(img, np.zeros((0, 2), np.float32), rng)
    assert calls == [1] * 5


def test_compose_chains(rng):
    t = T.Compose([T.RandomCrop((32, 32)), T.RandomHorizontalFlip(1.0)])
    img = make_image(64, 64)
    out, lab = t(img, np.array([[33.0, 33.0]], np.float32), rng)
    assert out.shape == (32, 32, 3)


def test_resize_upscale_torch_bicubic_parity(rng):
    """Upscale must match torch F.interpolate bicubic exactly: torchvision's
    antialias=True is a no-op on upscale, so the reference's eval resize
    (reference datasets/transforms.py:34) degenerates to plain torch
    bicubic (a=-0.75) there."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    img = rng.uniform(0, 255, (40, 56, 3)).astype(np.float32)
    ours = T._resize_image(img, 96, 130)
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    ref = F.interpolate(
        t, size=(96, 130), mode="bicubic", align_corners=False
    )[0].permute(1, 2, 0).numpy()
    # 0-255 scale; fp32 accumulation-order noise only (rel ~5e-6)
    assert np.abs(ours - ref).max() < 5e-3


def test_resize_downscale_matches_pil_antialias(rng):
    """Downscale is PIL-style antialiased bicubic (what torchvision's
    antialias=True float path reproduces); per-axis application must agree
    with PIL's own 2D resize."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    img = rng.uniform(0, 255, (97, 123, 3)).astype(np.float32)
    ours = T._resize_image(img, 48, 64)
    chans = [
        np.asarray(
            Image.fromarray(img[:, :, c], mode="F").resize((64, 48), Image.BICUBIC)
        )
        for c in range(3)
    ]
    ref = np.stack(chans, axis=-1)
    assert np.abs(ours - ref).max() < 1e-2


def test_resize_mixed_axes(rng):
    """One axis up, one down: shapes and value range stay sane and the
    result matches composing the two single-axis resizes in either order
    to float tolerance."""
    img = rng.uniform(0, 255, (64, 100, 3)).astype(np.float32)
    out = T._resize_image(img, 128, 50)  # H up, W down
    assert out.shape == (128, 50, 3)
    assert out.min() > -40 and out.max() < 300  # bicubic overshoot bounded
    # reversed order of axis application
    inter = T._resize_image(img, 64, 50)
    other = T._resize_image(inter, 128, 50)
    assert np.abs(out - other).max() < 0.75


def test_random_resized_crop_windowed_upscale_exact():
    """The windowed upscale inside RandomResizedCrop must equal the full
    resize-then-crop composition bit for bit (same taps, sliced)."""
    from clip_ebc_tpu.data.transforms import (
        RandomResizedCrop,
        _resize_image,
        _upscale_window,
        crop,
        resize,
    )

    from clip_ebc_tpu.data import native

    rng = np.random.default_rng(11)
    img = rng.random((96, 128, 3)).astype(np.float32)
    rh, rw, top, left, ch, cw = 160, 208, 17, 33, 112, 112
    want = _resize_image(img, rh, rw)[top : top + ch, left : left + cw]
    got = _upscale_window(img, rh, rw, top, left, ch, cw)
    if native.HAVE_NATIVE:
        # the C++ kernel fuses both axes into one float32 accumulation
        # (closer to torch's one-pass upsample); not bitwise vs two-pass
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        have = native.HAVE_NATIVE
        try:
            native.HAVE_NATIVE = False
            got_np = _upscale_window(img, rh, rw, top, left, ch, cw)
        finally:
            native.HAVE_NATIVE = have
        np.testing.assert_array_equal(got_np, want)
    else:
        np.testing.assert_array_equal(got, want)

    # end-to-end: the transform equals the reference composition with the
    # same rng draw sequence (s, top, left)
    pts = rng.uniform(0, [128, 96], size=(13, 2)).astype(np.float32)
    t = RandomResizedCrop((64, 64), scale=(1.3, 1.9))
    out_img, out_pts = t(img, pts.copy(), np.random.default_rng(5))

    r = np.random.default_rng(5)
    s = float(r.uniform(1.3, 1.9))
    chh, cww = int(64 * s), int(64 * s)
    ratio = max(chh / 96, cww / 128)
    rh2, rw2 = int(96 * ratio) + 1, int(128 * ratio) + 1
    im2, pts2 = resize(img, pts.copy(), rh2, rw2)
    top2 = int(r.integers(0, rh2 - chh + 1))
    left2 = int(r.integers(0, rw2 - cww + 1))
    im2, pts2 = crop(im2, pts2, top2, left2, chh, cww)
    want_img, want_pts = resize(im2, pts2, 64, 64)
    np.testing.assert_allclose(out_img, want_img, atol=1e-6)
    np.testing.assert_allclose(out_pts, want_pts, atol=1e-5)
