"""Submission-format parity with the reference's committed NWPU artifacts."""

import os
import re

import pytest

REF = "/root/reference/nwpu_test_results/clip_vit_b_16_word_224_8_4_fine_1.0_dmcount_best_mae.txt"


@pytest.mark.skipif(not os.path.exists(REF), reason="reference artifacts not mounted")
def test_reference_artifact_structure():
    """Pin down the exact format our writer must reproduce."""
    with open(REF, "rb") as f:
        raw = f.read()
    assert not raw.endswith(b"\n")  # no trailing newline
    lines = raw.decode().split("\n")
    assert len(lines) == 1500
    for line in lines[:5] + lines[-5:]:
        m = re.fullmatch(r"(\d+) (\d+(\.\d+)?([eE][-+]?\d+)?)", line)
        assert m, line
    ids = [int(l.split()[0]) for l in lines]
    assert ids == sorted(ids)
    assert ids[0] == 3610 and ids[-1] == 5109  # NWPU test image id range


def test_our_writer_format(tmp_path):
    """Emulate the writer's join semantics."""
    lines = [f"{3110 + i} {float(i) + 0.5}" for i in range(5)]
    out = tmp_path / "sub.txt"
    out.write_text("\n".join(lines))
    raw = out.read_bytes()
    assert not raw.endswith(b"\n")
    assert raw.decode().split("\n") == lines
