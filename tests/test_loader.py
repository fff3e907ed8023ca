import os

import numpy as np
import pytest

from clip_ebc_tpu.data.loader import Batch, pad_points


def test_pad_points_shapes_and_mask():
    pts = [
        np.array([[1.0, 2.0], [3.0, 4.0]], np.float32),
        np.zeros((0, 2), np.float32),
        np.array([[5.0, 6.0]], np.float32),
    ]
    padded, mask = pad_points(pts, max_points=4)
    assert padded.shape == (3, 4, 2)
    assert mask.shape == (3, 4)
    assert mask.sum(axis=1).tolist() == [2, 0, 1]
    np.testing.assert_allclose(padded[0, :2], pts[0])
    assert padded[0, 2:].sum() == 0


def test_pad_points_truncates():
    pts = [np.arange(20, dtype=np.float32).reshape(10, 2)]
    padded, mask = pad_points(pts, max_points=4)
    assert mask.sum() == 4
    np.testing.assert_allclose(padded[0], pts[0][:4])


def test_batch_gt_counts():
    pts = [np.ones((3, 2), np.float32), np.ones((1, 2), np.float32)]
    padded, mask = pad_points(pts, 8)
    b = Batch(
        images=np.zeros((2, 4, 4, 3), np.float32),
        points=padded,
        point_mask=mask,
        density=np.zeros((2, 1, 1), np.float32),
    )
    np.testing.assert_allclose(b.gt_counts, [3.0, 1.0])


class _FakeDataset:
    """Synthetic dataset mimicking CrowdDataset's item contract."""

    num_crops = 2

    def __init__(self, n=8, size=32):
        self.n = n
        self.size = size

    def __len__(self):
        return self.n

    def __getitem__(self, idx, rng=None):
        rng = rng or np.random.default_rng(idx)
        k, s = self.num_crops, self.size
        images = rng.normal(size=(k, s, s, 3)).astype(np.float32)
        labels = [
            rng.uniform(0, s, size=(idx % 3, 2)).astype(np.float32) for _ in range(k)
        ]
        densities = np.zeros((k, s, s), np.float32)
        for i, lab in enumerate(labels):
            for x, y in lab:
                densities[i, int(y), int(x)] += 1.0
        return images, labels, densities


def test_train_loader_batches():
    from clip_ebc_tpu.data.loader import TrainLoader

    ds = _FakeDataset(n=8)
    loader = TrainLoader(ds, batch_size=4, reduction=8, max_points=16, seed=0)
    batches = list(loader)
    assert len(batches) == len(loader) == 4  # 8 items * 2 crops / 4
    for b in batches:
        assert b.images.shape == (4, 32, 32, 3)
        assert b.points.shape == (4, 16, 2)
        assert b.density.shape == (4, 4, 4)


def test_train_loader_deterministic_given_seed_epoch():
    from clip_ebc_tpu.data.loader import TrainLoader

    ds = _FakeDataset(n=8)
    l1 = TrainLoader(ds, batch_size=4, reduction=8, max_points=16, seed=3, num_threads=1)
    l2 = TrainLoader(ds, batch_size=4, reduction=8, max_points=16, seed=3, num_threads=4)
    l1.set_epoch(2)
    l2.set_epoch(2)
    b1 = list(l1)
    b2 = list(l2)
    for x, y in zip(b1, b2):
        np.testing.assert_allclose(x.images, y.images)
        np.testing.assert_allclose(x.points, y.points)


def test_train_loader_host_sharding_disjoint():
    from clip_ebc_tpu.data.loader import TrainLoader

    ds = _FakeDataset(n=8)
    l0 = TrainLoader(ds, batch_size=2, reduction=8, max_points=16, seed=0, host_id=0, num_hosts=2)
    l1 = TrainLoader(ds, batch_size=2, reduction=8, max_points=16, seed=0, host_id=1, num_hosts=2)
    i0 = l0._epoch_indices()
    i1 = l1._epoch_indices()
    assert len(i0) == len(i1) == 4
    assert set(i0).isdisjoint(set(i1))


def test_train_loader_batch_size_validation():
    from clip_ebc_tpu.data.loader import TrainLoader

    ds = _FakeDataset()
    with pytest.raises(ValueError):
        TrainLoader(ds, batch_size=3, reduction=8)


def test_train_loader_drop_last_false():
    from clip_ebc_tpu.data.loader import TrainLoader

    # 5 items at 2 items/batch -> 3 batches, the last one short (2 crops)
    ds = _FakeDataset(n=5)
    loader = TrainLoader(ds, batch_size=4, reduction=8, max_points=16, seed=0, drop_last=False)
    assert len(loader) == 3
    batches = list(loader)
    assert [b.images.shape[0] for b in batches] == [4, 4, 2]
    assert all(np.isfinite(b.images).all() for b in batches)


def test_make_eval_transforms_factory():
    from clip_ebc_tpu.config import ExperimentConfig
    from clip_ebc_tpu.data.loader import make_eval_transforms
    from clip_ebc_tpu.data import transforms as T

    base = dict(dataset="shb", truncation=4, input_size=224)
    assert make_eval_transforms(ExperimentConfig(**base).normalize()) is None
    cfg = ExperimentConfig(**base, sliding_window=True, resize_to_multiple=True).normalize()
    assert isinstance(make_eval_transforms(cfg), T.Resize2Multiple)
    cfg = ExperimentConfig(**base, sliding_window=True, zero_pad_to_multiple=True).normalize()
    assert isinstance(make_eval_transforms(cfg), T.ZeroPad2Multiple)
    cfg = ExperimentConfig(**base, sliding_window=True).normalize()
    assert make_eval_transforms(cfg) is None


def test_ot_point_truncation_warns_and_counts(caplog):
    """Silent OT point truncation is surfaced (KNOWN_DIFFERENCES #4 vs the
    reference's uncapped dm_loss.py:48)."""
    import logging

    from clip_ebc_tpu.data.loader import TrainLoader

    class _DS:
        num_crops = 1
        sigma = None

        def __len__(self):
            return 1

    loader = TrainLoader(_DS(), batch_size=1, reduction=8, max_points=4)
    loader.set_epoch(1)
    im = np.zeros((1, 16, 16, 3), np.float32)
    dens = np.zeros((1, 16, 16), np.float32)
    pts_over = np.random.default_rng(0).uniform(0, 16, (7, 2)).astype(np.float32)
    with caplog.at_level(logging.WARNING, logger="clip_ebc_tpu"):
        batch = loader._collate([(im, [pts_over], dens)])
    assert loader.dropped_points == 3
    assert batch.point_mask.sum() == 4
    assert any("truncation" in r.message for r in caplog.records)
    # once per epoch: a second offending batch does not re-log
    with caplog.at_level(logging.WARNING, logger="clip_ebc_tpu"):
        n_before = len([r for r in caplog.records if "truncation" in r.message])
        loader._collate([(im, [pts_over], dens)])
        n_after = len([r for r in caplog.records if "truncation" in r.message])
    assert n_after == n_before
    assert loader.dropped_points == 6


def test_process_pool_matches_thread_mode(tmp_path):
    """num_workers>0 (spawn process pool) must yield bit-identical batches
    to the thread path — seeds are pre-drawn per item, so parallelism mode
    cannot change the data."""
    import numpy as np
    from PIL import Image

    from clip_ebc_tpu.data.crowd import CrowdDataset
    from clip_ebc_tpu.data.loader import TrainLoader

    root = tmp_path / "ds"
    (root / "shb" / "train" / "images").mkdir(parents=True)
    (root / "shb" / "train" / "labels").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(1, 5):
        Image.fromarray(
            rng.integers(0, 255, (96, 128, 3), dtype=np.uint8), "RGB"
        ).save(root / "shb" / "train" / "images" / f"{i}.jpg")
        np.save(
            root / "shb" / "train" / "labels" / f"{i}.npy",
            rng.uniform(0, [128, 96], size=(5, 2)).astype(np.float32),
        )

    ds = CrowdDataset("shb", "train", data_root=str(root), num_crops=1,
                      check_sizes=False)
    lt = TrainLoader(ds, batch_size=2, reduction=8, seed=0, num_threads=2)
    lp = TrainLoader(ds, batch_size=2, reduction=8, seed=0, num_workers=2)
    lt.set_epoch(1)
    lp.set_epoch(1)
    try:
        for bt, bp in zip(lt, lp):
            np.testing.assert_array_equal(bt.images, bp.images)
            np.testing.assert_array_equal(bt.points, bp.points)
            np.testing.assert_array_equal(bt.point_mask, bp.point_mask)
            np.testing.assert_array_equal(bt.density, bp.density)
    finally:
        lp.close()


def test_auto_max_points_no_truncation(tmp_path):
    """Default (max_points=None) sizes the pad from the dataset's max
    annotation count — no point is ever dropped, matching the reference's
    uncapped OT (reference losses/dm_loss.py:48; VERDICT r3 item 4)."""
    import numpy as np
    from PIL import Image

    from clip_ebc_tpu.data.crowd import CrowdDataset
    from clip_ebc_tpu.data.loader import TrainLoader

    root = tmp_path / "ds"
    (root / "shb" / "train" / "images").mkdir(parents=True)
    (root / "shb" / "train" / "labels").mkdir(parents=True)
    rng = np.random.default_rng(7)
    counts = [3, 2600, 17, 900]  # one image beyond the old 2048 cap
    for i, n in enumerate(counts, start=1):
        Image.fromarray(
            rng.integers(0, 255, (96, 128, 3), dtype=np.uint8), "RGB"
        ).save(root / "shb" / "train" / "images" / f"{i}.jpg")
        np.save(
            root / "shb" / "train" / "labels" / f"{i}.npy",
            rng.uniform(0, [128, 96], size=(n, 2)).astype(np.float32),
        )

    ds = CrowdDataset("shb", "train", data_root=str(root), num_crops=1,
                      check_sizes=False)
    assert ds.max_point_count() == 2600  # header-only scan
    loader = TrainLoader(ds, batch_size=1, reduction=8, seed=0, num_threads=1)
    assert loader.max_points == 4096  # next power of two
    total_pts = 0
    for b in loader:
        assert b.points.shape[1] == 4096
        total_pts += int(b.point_mask.sum())
    assert loader.dropped_points == 0
    # no transforms: every annotation flows through to the OT pad
    assert total_pts == sum(counts)


def test_auto_max_points_fallback_without_stats():
    """Datasets without max_point_count() (custom item sources) fall back
    to the 256 floor instead of failing."""
    from clip_ebc_tpu.data.loader import TrainLoader

    ds = _FakeDataset()
    loader = TrainLoader(ds, batch_size=4, reduction=8, seed=0)
    assert loader.max_points == 256


class _JitterDataset:
    """Picklable dataset with per-item variable latency — forces heavy
    out-of-order completion inside the pool's bounded window."""

    num_crops = 1

    def __init__(self, n=10, size=32):
        self.n, self.size = n, size

    def __len__(self):
        return self.n

    def __getitem__(self, idx, rng=None):
        import time

        time.sleep(0.12 if idx % 3 == 0 else 0.01)
        rng = rng or np.random.default_rng(idx)
        s = self.size
        img = rng.normal(size=(1, s, s, 3)).astype(np.float32)
        pts = [rng.uniform(0, s, size=(idx % 4, 2)).astype(np.float32)]
        dens = np.zeros((1, s, s), np.float32)
        for x, y in pts[0]:
            dens[0, int(y), int(x)] += 1.0
        return img, pts, dens


class _CrashingDataset(_JitterDataset):
    """Hard-kills the worker process (os._exit — not a Python exception)
    on item 3 while the flag file exists."""

    def __init__(self, flag_path, n=8, size=32):
        super().__init__(n, size)
        self.flag_path = flag_path

    def __getitem__(self, idx, rng=None):
        import os

        if idx == 3 and os.path.exists(self.flag_path):
            os._exit(1)
        return super().__getitem__(idx, rng)


class _RaisingDataset(_JitterDataset):
    def __getitem__(self, idx, rng=None):
        if idx == 2:
            raise ValueError("bad label file xyz")
        return super().__getitem__(idx, rng)


def test_pool_out_of_order_completion_matches_thread_mode():
    """Items completing wildly out of order (slow/fast workers) must not
    change batch contents or order — ordered delivery under the bounded
    window (VERDICT r3 item 9)."""
    from clip_ebc_tpu.data.loader import TrainLoader

    ds = _JitterDataset()
    lt = TrainLoader(ds, batch_size=2, reduction=8, max_points=8, seed=1,
                     num_threads=1)
    lp = TrainLoader(ds, batch_size=2, reduction=8, max_points=8, seed=1,
                     num_workers=3)
    lt.set_epoch(2)
    lp.set_epoch(2)
    try:
        got = list(zip(lt, lp))
        assert len(got) == 5
        for bt, bp in got:
            np.testing.assert_array_equal(bt.images, bp.images)
            np.testing.assert_array_equal(bt.points, bp.points)
            np.testing.assert_array_equal(bt.density, bp.density)
    finally:
        lp.close()


def test_pool_worker_death_resets_pool_and_recovers(tmp_path):
    """A worker that DIES (os._exit, as an OOM kill would) must surface a
    clear error — not hang — and the next epoch must rebuild the pool and
    succeed (VERDICT r3 item 9)."""
    import pytest as _pytest

    from clip_ebc_tpu.data.loader import TrainLoader

    flag = str(tmp_path / "crash_on")
    open(flag, "w").close()
    ds = _CrashingDataset(flag)
    loader = TrainLoader(ds, batch_size=2, reduction=8, max_points=8, seed=0,
                         num_workers=2)
    try:
        with _pytest.raises(RuntimeError, match="worker process died"):
            list(loader)
        assert loader._pool is None  # broken pool was dropped
        os.remove(flag)  # next epoch: same dataset, no crash
        loader.set_epoch(1)
        batches = list(loader)
        assert len(batches) == 4  # fresh pool rebuilt transparently
    finally:
        loader.close()


def test_pool_worker_exception_propagates_pool_survives():
    """A Python exception in a worker propagates with its original type
    (the pool is NOT broken by it)."""
    import pytest as _pytest

    from clip_ebc_tpu.data.loader import TrainLoader

    ds = _RaisingDataset()
    loader = TrainLoader(ds, batch_size=2, reduction=8, max_points=8, seed=0,
                         num_workers=2)
    try:
        with _pytest.raises(ValueError, match="bad label file"):
            list(loader)
        assert loader._pool is not None  # executor still alive
    finally:
        loader.close()
