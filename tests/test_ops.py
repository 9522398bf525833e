import numpy as np
import jax.numpy as jnp
import pytest

from vidsgg_big_tpu.ops import (
    dura_intersection, tiou, generalized_tiou, merge_duration_list,
    viou_matrix, viou_aligned, stretch_index_np, stretch_lookup,
    adaptive_max_pool1d, pack_rows, unique_max, hungarian,
)
from vidsgg_big_tpu.ops.segments import stretch_index


def _rand_duras(rng, n, lo=0, hi=100):
    s = rng.integers(lo, hi - 2, size=n)
    e = s + rng.integers(1, 30, size=n)
    return np.stack([s, np.minimum(e, hi)], axis=1).astype(np.int64)


# --------------------------- temporal algebra -----------------------------

def test_dura_intersection_matches_reference(reference_utils):
    import torch
    rng = np.random.default_rng(0)
    d1, d2 = _rand_duras(rng, 13), _rand_duras(rng, 7)
    ours, mask = dura_intersection(jnp.asarray(d1), jnp.asarray(d2))
    ref, ref_mask = reference_utils.dura_intersection_ts(
        torch.tensor(d1), torch.tensor(d2))
    np.testing.assert_array_equal(np.asarray(mask), ref_mask.numpy())
    np.testing.assert_array_equal(
        np.asarray(ours)[np.asarray(mask)], ref.numpy()[ref_mask.numpy()])


def test_tiou_matches_reference(reference_utils):
    import torch
    rng = np.random.default_rng(1)
    d1 = _rand_duras(rng, 9).astype(np.float32)
    d2 = _rand_duras(rng, 11).astype(np.float32)
    ours = tiou(jnp.asarray(d1), jnp.asarray(d2))
    ref = reference_utils.tIoU(torch.tensor(d1), torch.tensor(d2))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-6)
    g_ours = generalized_tiou(jnp.asarray(d1), jnp.asarray(d2))
    g_ref = reference_utils.generalized_tIoU(torch.tensor(d1), torch.tensor(d2))
    np.testing.assert_allclose(np.asarray(g_ours), g_ref.numpy(), rtol=1e-6)


def test_merge_duration_list_matches_reference(reference_utils):
    durs = [(195, 225), (210, 240), (225, 255), (240, 270),
            (255, 285), (375, 405), (390, 420), (405, 435),
            (645, 675), (660, 690), (675, 705), (690, 720),
            (705, 735), (720, 750), (780, 810), (795, 825),
            (810, 840), (825, 855)]
    assert merge_duration_list(durs) == reference_utils.merge_duration_list(durs)
    assert merge_duration_list(durs) == [(195, 285), (375, 435),
                                         (645, 750), (780, 855)]


# ------------------------------- vIoU -------------------------------------

def test_viou_matrix_matches_reference_pairwise(reference_utils):
    import torch
    rng = np.random.default_rng(2)
    n, m, t1, t2 = 6, 4, 40, 40

    def mk(k, t):
        durs, boxes = [], []
        for _ in range(k):
            s = int(rng.integers(0, 50))
            L = int(rng.integers(3, t))
            durs.append((s, s + L - 1))
            b = np.sort(rng.uniform(0, 300, size=(L, 2, 2)), axis=1)
            boxes.append(b.transpose(0, 2, 1).reshape(L, 4).astype(np.float32))
        return np.asarray(durs, np.int64), boxes

    d1, b1 = mk(n, t1)
    d2, b2 = mk(m, t2)

    def pad(blist, t):
        out = np.zeros((len(blist), t, 4), np.float32)
        for i, b in enumerate(blist):
            out[i, :b.shape[0]] = b
        return out

    ours = np.asarray(viou_matrix(
        jnp.asarray(pad(b1, t1)), jnp.asarray(d1),
        jnp.asarray(pad(b2, t2)), jnp.asarray(d2)))

    # reference: per-pair vIoU_ts over the intersection window
    for i in range(n):
        for j in range(m):
            s = max(d1[i, 0], d2[j, 0])
            e = min(d1[i, 1], d2[j, 1])
            if s > e:
                assert ours[i, j] == 0.0
                continue
            rel1 = torch.tensor([s - d1[i, 0], e - d1[i, 0]])
            rel2 = torch.tensor([s - d2[j, 0], e - d2[j, 0]])
            ref = reference_utils.vIoU_ts(
                torch.tensor(b1[i]), torch.tensor(b2[j]), rel1, rel2)
            np.testing.assert_allclose(ours[i, j], float(ref), rtol=1e-5)


def test_viou_aligned_simple():
    t = np.array([[0, 0, 9, 9]] * 5, np.float32)
    assert float(viou_aligned(jnp.asarray(t), jnp.asarray(t))) == pytest.approx(1.0)


# --------------------------- stretch padding ------------------------------

def test_stretch_matches_reference_repeat(reference_utils):
    import torch
    rng = np.random.default_rng(3)
    lengths = [3, 7, 1, 7, 5]
    t = 7
    tensors = [torch.tensor(rng.normal(size=(L, 4)), dtype=torch.float32)
               for L in lengths]
    ref = reference_utils.stack_with_repeat_2d(tensors, dim=0).numpy()

    raw = np.zeros((len(lengths), t, 4), np.float32)
    for i, x in enumerate(tensors):
        raw[i, :lengths[i]] = x.numpy()
    idx = stretch_index_np(np.asarray(lengths), t)
    ours = np.asarray(stretch_lookup(jnp.asarray(raw), jnp.asarray(idx)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_stretch_index_jax_matches_np():
    lengths = np.array([1, 2, 3, 5, 8, 13, 16, 0])
    for t in (8, 16, 31):
        np.testing.assert_array_equal(
            np.asarray(stretch_index(jnp.asarray(lengths), t)),
            stretch_index_np(lengths, t))


# ------------------------- adaptive max pool ------------------------------

def test_adaptive_max_pool_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(4)
    for L in (4, 7, 10, 33):
        x = rng.normal(size=(2, 5, L)).astype(np.float32)  # (N, C, L)
        ref = F.adaptive_max_pool1d(torch.tensor(x), 4).numpy()
        ours = adaptive_max_pool1d(jnp.asarray(x), 4, axis=-1)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6)


# ------------------------- fixed-shape dedup ------------------------------

def test_unique_max_matches_reference(reference_utils):
    import torch
    rng = np.random.default_rng(5)
    m = 64
    rows = rng.integers(0, 4, size=(m, 3)).astype(np.int64)
    scores = rng.uniform(size=m).astype(np.float32)
    valid = rng.uniform(size=m) > 0.2

    keys = pack_rows(jnp.asarray(rows), [4, 4, 4])
    keep = np.asarray(unique_max(keys, jnp.asarray(scores), jnp.asarray(valid)))

    vrows, vscores = rows[valid], scores[valid]
    uniq, index_map = reference_utils.unique_with_idx_nd(torch.tensor(vrows))
    expect = set()
    for u, im in zip(uniq.tolist(), index_map):
        im = im.numpy()
        best = im[np.argmax(vscores[im])]
        expect.add((tuple(u), float(vscores[best])))
    got = {(tuple(r), float(s))
           for r, s in zip(rows[keep].tolist(), scores[keep])}
    assert got == expect


# ----------------------------- matching -----------------------------------

def test_hungarian_matches_scipy():
    from scipy.optimize import linear_sum_assignment
    rng = np.random.default_rng(6)
    b, q, p = 4, 12, 7
    cost = rng.normal(size=(b, q, p)).astype(np.float32)
    n_gt = np.array([7, 3, 0, 1], np.int32)
    out = np.asarray(hungarian(jnp.asarray(cost), jnp.asarray(n_gt)))
    for i in range(b):
        m = n_gt[i]
        assert (out[i, m:] == -1).all()
        if m == 0:
            continue
        rows, cols = linear_sum_assignment(cost[i, :, :m])
        expect = np.full(p, -1, np.int32)
        expect[cols] = rows
        # continuous random costs -> unique optimum almost surely
        np.testing.assert_array_equal(out[i], expect)


def test_hungarian_more_gts_than_queries():
    from scipy.optimize import linear_sum_assignment
    rng = np.random.default_rng(16)
    q, p = 5, 9
    cost = rng.normal(size=(1, q, p)).astype(np.float32)
    n_gt = np.array([8], np.int32)
    out = np.asarray(hungarian(jnp.asarray(cost), jnp.asarray(n_gt)))[0]
    rows, cols = linear_sum_assignment(cost[0, :, :8])
    expect = np.full(p, -1, np.int32)
    expect[cols] = rows
    np.testing.assert_array_equal(out, expect)
    assert out[8] == -1


@pytest.mark.slow
def test_hungarian_many_random_instances_optimal_cost():
    from scipy.optimize import linear_sum_assignment
    rng = np.random.default_rng(17)
    for trial in range(20):
        q = int(rng.integers(2, 24))
        p = int(rng.integers(1, q + 1))
        cost = rng.normal(size=(1, q, p)).astype(np.float32)
        out = np.asarray(
            hungarian(jnp.asarray(cost), jnp.asarray([p], dtype=np.int32)))[0]
        rows, cols = linear_sum_assignment(cost[0])
        ours = cost[0][out[np.arange(p)], np.arange(p)].sum()
        ref = cost[0][rows, cols].sum()
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_hungarian_padded_gts_exceeding_queries():
    """Regression: bucket P > Q with few valid gts must stay feasible (an
    infeasible formulation used to hang the augmenting loop on TPU)."""
    from scipy.optimize import linear_sum_assignment
    rng = np.random.default_rng(18)
    q, p = 6, 20
    cost = rng.normal(size=(1, q, p)).astype(np.float32)
    for m in (0, 3, 6, 11, 20):
        out = np.asarray(hungarian(jnp.asarray(cost),
                                   jnp.asarray([m], np.int32)))[0]
        assert (out[m:] == -1).all()
        if m == 0:
            continue
        rows, cols = linear_sum_assignment(cost[0, :, :m])
        expect = np.full(p, -1, np.int32)
        expect[cols] = rows
        np.testing.assert_array_equal(out, expect)


def test_pallas_role_attention_parity_interpret():
    """Fused Pallas role-attention kernel vs the XLA formulation (interpret
    mode on CPU; the TPU path is exercised by bench/drive scripts)."""
    import jax
    from vidsgg_big_tpu.ops.pallas_role_attn import (
        role_attention, role_attention_reference)
    rng = np.random.default_rng(20)
    b, q, n, dh, de = 2, 16, 8, 32, 24
    p = jnp.asarray(rng.normal(0, 0.3, (b, 2, q, dh)), jnp.float32)
    e = jnp.asarray(rng.normal(0, 0.3, (b, 2, n, dh)), jnp.float32)
    enco = jnp.asarray(rng.normal(0, 0.5, (b, n, de)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(b, n)) > 0.3)
    att_r, val_r = role_attention_reference(p, e, enco, mask, dim_enti=de)
    att_k, val_k = role_attention(p, e, enco, mask, dim_enti=de,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(att_k), np.asarray(att_r),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(val_k), np.asarray(val_r),
                               rtol=1e-4, atol=1e-5)


def test_viou_matrix_grid_matches_gather_version():
    from vidsgg_big_tpu.ops.boxes import viou_matrix_grid
    rng = np.random.default_rng(21)
    n, m, t1, t2 = 8, 5, 40, 40

    def mk(k, t, hi=200):
        durs, boxes = [], []
        for _ in range(k):
            s = int(rng.integers(0, hi))
            L = int(rng.integers(3, t))
            durs.append((s, s + L - 1))
            b = np.sort(rng.uniform(0, 300, size=(L, 2, 2)), axis=1)
            out = np.zeros((t, 4), np.float32)
            out[:L] = b.transpose(0, 2, 1).reshape(L, 4)
            boxes.append(out)
        return np.asarray(durs, np.int64), np.stack(boxes)

    d1, b1 = mk(n, t1)
    d2, b2 = mk(m, t2)
    v1 = np.ones(n, bool); v1[-1] = False
    v2 = np.ones(m, bool); v2[-1] = False
    ref = np.asarray(viou_matrix(jnp.asarray(b1), jnp.asarray(d1),
                                 jnp.asarray(b2), jnp.asarray(d2),
                                 jnp.asarray(v1), jnp.asarray(v2)))
    got = np.asarray(viou_matrix_grid(jnp.asarray(b1), jnp.asarray(d1),
                                      jnp.asarray(b2), jnp.asarray(d2),
                                      jnp.asarray(v1), jnp.asarray(v2),
                                      t_abs=512))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
