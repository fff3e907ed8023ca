"""Native C++ host kernels vs their numpy twins."""

import numpy as np
import pytest

from clip_ebc_tpu.data import native
from clip_ebc_tpu.data.density import block_sum as np_block_sum, rasterize_points
from clip_ebc_tpu.data.loader import pad_points as np_pad_points

built = native.ensure_built()
pytestmark = pytest.mark.skipif(not built, reason="native toolchain unavailable")


def test_normalize_matches_numpy(rng):
    img = rng.uniform(0, 1, (37, 53, 3)).astype(np.float32)
    out = native.normalize_image(img)
    from clip_ebc_tpu.data.crowd import normalize_image as np_norm

    np.testing.assert_allclose(out, np_norm(img), rtol=1e-5, atol=1e-6)


def test_rasterize_blocks_matches_numpy(rng):
    h, w, r = 64, 96, 8
    pts = rng.uniform(-5, max(h, w) + 5, (200, 2)).astype(np.float32)
    out = native.rasterize_blocks(pts, h, w, r)
    ref = np_block_sum(rasterize_points(pts, h, w)[None], r)[0]
    np.testing.assert_allclose(out, ref)


def test_rasterize_blocks_empty():
    out = native.rasterize_blocks(np.zeros((0, 2), np.float32), 16, 16, 8)
    assert out.shape == (2, 2) and out.sum() == 0


def test_rasterize_coincident_pixel_semantics():
    # two points in the same pixel -> 1.0 (reference assignment semantics)
    pts = np.array([[3.2, 3.9], [3.7, 3.1]], np.float32)
    out = native.rasterize_blocks(pts, 8, 8, 8)
    assert out[0, 0] == 1.0
    # two points in different pixels of one block -> 2.0
    pts2 = np.array([[1.0, 1.0], [2.0, 2.0]], np.float32)
    assert native.rasterize_blocks(pts2, 8, 8, 8)[0, 0] == 2.0


def test_block_sum_matches_numpy(rng):
    d = rng.uniform(0, 1, (32, 48)).astype(np.float32)
    np.testing.assert_allclose(
        native.block_sum(d, 8), np_block_sum(d[None], 8)[0], rtol=1e-6
    )


def test_pad_points_matches_numpy(rng):
    lists = [
        rng.uniform(0, 100, (5, 2)).astype(np.float32),
        np.zeros((0, 2), np.float32),
        rng.uniform(0, 100, (12, 2)).astype(np.float32),  # > max_points
    ]
    out, mask = native.pad_points(lists, 8)
    ref_out, ref_mask = np_pad_points(lists, 8)
    np.testing.assert_allclose(out, ref_out)
    np.testing.assert_array_equal(mask, ref_mask)


def test_pepper_salt_matches_numpy(rng):
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    noise = rng.uniform(0, 1, img.shape).astype(np.float32)
    out = native.pepper_salt(img.copy(), noise, 0.1, 0.2)
    ref = np.where(noise < 0.1, 1.0, img)
    ref = np.where(noise > 0.8, 0.0, ref).astype(np.float32)
    np.testing.assert_allclose(out, ref)
