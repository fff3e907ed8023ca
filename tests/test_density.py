import numpy as np
import pytest

from clip_ebc_tpu.data.density import block_sum, rasterize_points


def test_rasterize_simple():
    pts = np.array([[1.0, 2.0], [3.7, 0.2]], np.float32)
    d = rasterize_points(pts, 4, 5)
    assert d.shape == (4, 5)
    assert d[2, 1] == 1.0 and d[0, 3] == 1.0
    assert d.sum() == 2.0


def test_rasterize_clamps_out_of_range():
    pts = np.array([[-3.0, 100.0]], np.float32)
    d = rasterize_points(pts, 8, 8)
    assert d[7, 0] == 1.0
    assert d.sum() == 1.0


def test_rasterize_coincident_points_reference_semantics():
    # Reference assigns 1.0 (no accumulation): two coincident points -> 1.0
    pts = np.array([[2.2, 2.9], [2.5, 2.1]], np.float32)
    d = rasterize_points(pts, 4, 4)
    assert d.sum() == 1.0
    d_acc = rasterize_points(pts, 4, 4, accumulate=True)
    assert d_acc.sum() == 2.0


def test_rasterize_empty():
    d = rasterize_points(np.zeros((0, 2), np.float32), 4, 4)
    assert d.sum() == 0.0


def test_rasterize_gaussian_preserves_mass():
    pts = np.array([[8.0, 8.0]], np.float32)
    d = rasterize_points(pts, 16, 16, sigma=1.5)
    assert d.sum() == pytest.approx(1.0, abs=1e-4)


def test_block_sum_preserves_count():
    rng = np.random.default_rng(1)
    d = (rng.random((2, 64, 64)) < 0.05).astype(np.float32)
    pooled = block_sum(d, 8)
    assert pooled.shape == (2, 8, 8)
    np.testing.assert_allclose(pooled.sum(axis=(1, 2)), d.sum(axis=(1, 2)))


def test_block_sum_values():
    d = np.arange(16, dtype=np.float32).reshape(1, 4, 4)
    pooled = block_sum(d, 2)
    np.testing.assert_allclose(pooled[0], [[0 + 1 + 4 + 5, 2 + 3 + 6 + 7], [8 + 9 + 12 + 13, 10 + 11 + 14 + 15]])


def test_block_sum_requires_divisible():
    with pytest.raises(ValueError):
        block_sum(np.zeros((1, 10, 10), np.float32), 4)
