import json
import math
from collections import Counter

import pytest

from clip_ebc_tpu.cli.derive_bins import bin_structure, derive


def test_fine_structure_matches_reference_tables():
    ref = json.load(open("clip_ebc_tpu/configs/reduction_8.json"))
    assert bin_structure(4, "fine") == ref["4"]["qnrf"]["bins"]["fine"]
    assert bin_structure(11, "fine") == ref["11"]["qnrf"]["bins"]["fine"]


def test_dynamic_structure_matches_reference_tables():
    r16 = json.load(open("clip_ebc_tpu/configs/reduction_16.json"))
    r32 = json.load(open("clip_ebc_tpu/configs/reduction_32.json"))
    assert bin_structure(8, "dynamic") == r16["8"]["qnrf"]["bins"]["dynamic"]
    assert bin_structure(19, "dynamic") == r32["19"]["qnrf"]["bins"]["dynamic"]


def test_coarse_structure_matches_reference_tables():
    r16 = json.load(open("clip_ebc_tpu/configs/reduction_16.json"))
    r32 = json.load(open("clip_ebc_tpu/configs/reduction_32.json"))
    assert bin_structure(8, "coarse") == r16["8"]["qnrf"]["bins"]["coarse"]
    assert bin_structure(19, "coarse") == r32["19"]["qnrf"]["bins"]["coarse"]


def test_average_anchors_from_histogram():
    hist = Counter({0: 100, 1: 50, 2: 10, 3: 5, 4: 2, 7: 1})
    bins, anchors = derive(hist, 4, "fine")
    assert anchors["average"][0] == 0.0 and anchors["average"][1] == 1.0
    # open bin [4, inf]: (4*2 + 7*1) / 3
    assert anchors["average"][-1] == pytest.approx((8 + 7) / 3, abs=1e-4)
    for (lo, hi), a in zip(bins, anchors["average"]):
        hi_v = math.inf if hi == "inf" else hi
        assert lo <= a <= hi_v


def test_middle_anchors():
    _, anchors = derive(Counter({0: 1}), 8, "coarse")
    # [0,0] -> 0; [1,2] -> 1.5; open -> its lower edge
    assert anchors["middle"][0] == 0.0
    assert anchors["middle"][1] == 1.5
    assert anchors["middle"][-1] == 7.0
