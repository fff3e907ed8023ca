import math

import pytest

from clip_ebc_tpu.config import (
    ExperimentConfig,
    get_bins_and_anchors,
    standardize_dataset_name,
)


def test_standardize_dataset_name():
    assert standardize_dataset_name("ShanghaiTech_A") == "sha"
    assert standardize_dataset_name("ucf-qnrf") == "qnrf"
    assert standardize_dataset_name("NWPU_Crowd") == "nwpu"
    assert standardize_dataset_name("jhu_crowd_v2") == "jhu"
    with pytest.raises(ValueError):
        standardize_dataset_name("imagenet")


def test_bins_reduction8_truncation4():
    bins, anchors = get_bins_and_anchors(8, 4, "shb", "fine", "middle")
    assert bins == [(0, 0), (1, 1), (2, 2), (3, 3), (4, math.inf)]
    assert anchors == [0, 1, 2, 3, 4]
    bins_avg, anchors_avg = get_bins_and_anchors(8, 4, "shb", "fine", "average")
    assert bins_avg == bins
    assert anchors_avg[:4] == [0, 1, 2, 3]
    assert 4 < anchors_avg[4] < 5


def test_bins_all_tables_load():
    for reduction, truncation, ds in [
        (8, 2, "sha"),
        (8, 11, "qnrf"),
        (16, 8, "qnrf"),
        (32, 19, "qnrf"),
    ]:
        bins, anchors = get_bins_and_anchors(reduction, truncation, ds)
        assert len(bins) == len(anchors) > 0
        assert bins[-1][1] == math.inf
        for (lo, hi), a in zip(bins, anchors):
            assert lo <= a <= hi


def test_bins_invalid_keys():
    with pytest.raises(ValueError):
        get_bins_and_anchors(8, 999, "sha")
    with pytest.raises(ValueError):
        get_bins_and_anchors(16, 8, "sha")  # only qnrf at reduction 16


def test_experiment_config_normalize_classification():
    cfg = ExperimentConfig(dataset="shb", truncation=4, reduction=8).normalize()
    assert cfg.bins is not None and cfg.bin_anchors is not None
    assert len(cfg.bins) == 5
    assert cfg.ckpt_dir is not None


def test_experiment_config_normalize_regression():
    cfg = ExperimentConfig(dataset="shb", regression=True).normalize()
    assert cfg.bins is None and cfg.bin_anchors is None and cfg.truncation is None


def test_experiment_config_sliding_window_defaults():
    cfg = ExperimentConfig(
        dataset="qnrf", truncation=4, sliding_window=True, input_size=224
    ).normalize()
    assert cfg.window_size == 224 and cfg.stride == 224
