"""Frozen synthetic golden test: the flagship model's constructed triplets on
fixed-seed inputs must match the committed snapshot, so refactors cannot
silently shift outputs (VERDICT round-2 item 7).  Structure (triplet set,
durations) must match exactly; scores to 1e-4 (absorbs cross-version float
drift).  Regenerate intentionally with scripts/regen_golden.py.
"""
import json
import os

import numpy as np
import pytest

from golden_utils import golden_outputs

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden", "flagship_triplets.json")


@pytest.mark.slow
def test_flagship_triplets_match_golden():
    with open(GOLDEN) as f:
        want = json.load(f)
    got = golden_outputs()
    assert sorted(got) == sorted(want)
    for vid in want:
        g, w = got[vid], want[vid]
        assert g["quintuples"] == w["quintuples"], vid
        assert g["dura"] == w["dura"], vid
        np.testing.assert_allclose(np.asarray(g["scores"]),
                                   np.asarray(w["scores"]),
                                   rtol=1e-4, atol=1e-5, err_msg=vid)
