"""Stage-B helpers of tools/eval_vidor.py: vectorized bin expansion must
reproduce the scalar per-(triplet, bin) semantics exactly (reference
tools/eval_vidor.py:246-253), and the Q ladder must never truncate."""
import os
import sys
import types

import numpy as np

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")
sys.path.insert(0, TOOLS)

import eval_vidor  # noqa: E402


def _scalar_replay(video_len, quint, scores3, duras, pooled, bins_probs,
                   bins_mask):
    out_q, out_s, out_d = [], [], []
    m, k1 = bins_mask.shape
    cls_score = scores3.mean(-1)
    for i in range(m):
        for k in range(k1):
            if not bins_mask[i, k]:
                continue
            s, e = pooled[i, k]
            # reference semantics: plain round of the normalized span
            # (reference tools/eval_vidor.py:254); the clip only guards
            # float noise at the window edges and keeps fs <= fe closed
            ds, de = int(duras[i][0]), int(duras[i][1])
            fs = int(np.rint(float(s) * video_len))
            fe = int(np.rint(float(e) * video_len))
            fs = max(ds, min(fs, de))
            fe = max(fs, min(fe, de))
            out_q.append(quint[i])
            out_s.append(cls_score[i] * float(bins_probs[i, k]))
            out_d.append((fs, fe))
    return out_q, out_s, out_d


def test_expand_bins_matches_scalar_replay():
    rng = np.random.default_rng(11)
    m, k1, video_len = 9, 6, 120
    quint = rng.integers(0, 30, size=(m, 5)).astype(np.int32)
    scores3 = rng.uniform(0.1, 1.0, size=(m, 3)).astype(np.float32)
    ds = rng.integers(0, 60, size=m)
    de = ds + rng.integers(5, 50, size=m)
    duras = np.stack([ds, np.minimum(de, video_len - 1)], 1).astype(np.int64)
    # spans straddling all the clamp branches, incl. degenerate ones
    pooled = rng.uniform(-0.1, 1.2, size=(m, k1, 2)).astype(np.float32)
    bins_probs = rng.uniform(size=(m, k1)).astype(np.float32)
    bins_mask = rng.uniform(size=(m, k1)) < 0.6

    prop = types.SimpleNamespace(video_len=video_len)
    out = eval_vidor._expand_bins(prop, quint, scores3, duras, pooled,
                                  bins_probs, bins_mask)
    eq, es, ed = _scalar_replay(video_len, quint, scores3, duras, pooled,
                                bins_probs, bins_mask)
    assert out is not None
    qq, ss, dd = out
    np.testing.assert_array_equal(qq, np.stack(eq))
    np.testing.assert_allclose(ss, np.asarray(es), rtol=1e-6)
    np.testing.assert_array_equal(dd, np.asarray(ed))

    none_mask = np.zeros_like(bins_mask)
    assert eval_vidor._expand_bins(prop, quint, scores3, duras, pooled,
                                   bins_probs, none_mask) is None


def test_q_ladder_never_truncates():
    assert eval_vidor._q_bucket_of(1) == 32
    assert eval_vidor._q_bucket_of(33) == 64
    assert eval_vidor._q_bucket_of(1024) == 1024
    assert eval_vidor._q_bucket_of(1025) == 2048
    assert eval_vidor._q_bucket_of(5000) == 8192
