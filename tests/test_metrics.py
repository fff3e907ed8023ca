import numpy as np
import pytest

from clip_ebc_tpu.utils.metrics import CountErrorAccumulator, count_errors


def test_count_errors_basic():
    pred = np.array([1.0, 2.0, 3.0])
    gt = np.array([2.0, 2.0, 1.0])
    errs = count_errors(pred, gt)
    assert errs["mae"] == pytest.approx(1.0)
    assert errs["rmse"] == pytest.approx(np.sqrt(5 / 3))


def test_accumulator_matches_batch():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0, 100, 37)
    gt = rng.uniform(0, 100, 37)
    acc = CountErrorAccumulator()
    for p, g in zip(pred, gt):
        acc.update(p, g)
    batch = count_errors(pred, gt)
    stream = acc.result()
    assert stream["mae"] == pytest.approx(batch["mae"])
    assert stream["rmse"] == pytest.approx(batch["rmse"])


def test_accumulator_update_batch():
    pred = np.array([1.0, 5.0])
    gt = np.array([0.0, 2.0])
    acc = CountErrorAccumulator()
    acc.update_batch(pred, gt)
    assert acc.result()["mae"] == pytest.approx(2.0)
