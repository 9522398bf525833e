import numpy as np
import pytest

from vidsgg_big_tpu.data import native
from vidsgg_big_tpu.ops.segments import stretch_index_np


def test_native_library_builds_and_loads():
    assert native.available(), "native packer failed to build/load"


def test_native_stretch_index_matches_numpy():
    lengths = np.array([1, 2, 3, 5, 8, 13, 16, 0, 7], np.int32)
    for t in (8, 16, 31):
        np.testing.assert_array_equal(native.stretch_index(lengths, t),
                                      stretch_index_np(lengths, t))


def test_native_pad_pack_and_stretch_pack():
    rng = np.random.default_rng(0)
    trajs = [rng.normal(size=(L, 6)).astype(np.float32)
             for L in (3, 9, 16, 1)]
    out = native.pad_pack(trajs, n_bucket=6, t_bucket=16)
    assert out.shape == (6, 16, 6)
    for i, x in enumerate(trajs):
        np.testing.assert_array_equal(out[i, :x.shape[0]], x)
        assert (out[i, x.shape[0]:] == 0).all()
    assert (out[4:] == 0).all()

    st = native.pad_pack(trajs, n_bucket=6, t_bucket=16, stretch=True)
    idx = stretch_index_np(np.array([x.shape[0] for x in trajs]), 16)
    for i, x in enumerate(trajs):
        np.testing.assert_array_equal(st[i], x[idx[i]])


def test_native_group_tracklet_rows():
    rng = np.random.default_rng(1)
    rows = []
    for tid in (4, 1, 7):
        for f in rng.permutation(10)[:6]:
            rows.append([float(f), float(tid)] + rng.normal(size=3).tolist())
    rng.shuffle(rows)
    rows = np.asarray(rows, np.float32)
    order, off, tids = native.group_tracklet_rows(rows)
    assert list(tids) == [1, 4, 7]
    for g in range(len(tids)):
        seg = rows[order[off[g]:off[g + 1]]]
        assert (seg[:, 1] == tids[g]).all()
        assert (np.diff(seg[:, 0]) > 0).all()   # frames strictly sorted


@pytest.mark.slow
def test_native_pack_speedup_sanity():
    """Native packing of a realistic video should beat the python loop."""
    import time
    rng = np.random.default_rng(2)
    trajs = [rng.normal(size=(400, 2880)).astype(np.float32)
             for _ in range(50)]

    t0 = time.perf_counter()
    out_native = native.pad_pack(trajs, 50, 512)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    out_py = np.zeros((50, 512, 2880), np.float32)
    for i, x in enumerate(trajs):
        out_py[i, :x.shape[0]] = x
    t_py = time.perf_counter() - t0

    np.testing.assert_array_equal(out_native, out_py)
    # don't assert a ratio (copy-bound); just record both run
    print(f"native {t_native*1e3:.1f}ms vs python {t_py*1e3:.1f}ms")


def test_fast_pku_parser_matches_python_parser():
    from vidsgg_big_tpu.data import parse
    rng = np.random.default_rng(7)
    rows = []
    D = 8
    for tid in (3, 0, 5, 9):
        s = int(rng.integers(0, 10))
        n = int(rng.integers(6, 30))
        cat = int(rng.integers(1, 12))
        f = s
        for k in range(n):
            bad = rng.uniform() < 0.15
            rows.append([f, tid] + rng.uniform(1, 50, 4).round(2).tolist()
                        + ([0.0, -1] if bad else
                           [float(rng.uniform(0.2, 1)), cat])
                        + rng.uniform(1, 50, 4).round(2).tolist()
                        + rng.normal(size=D).round(3).tolist())
            f += 1 + int(rng.uniform() < 0.2)   # occasional gaps
    rng.shuffle(rows)
    arr = np.asarray(rows, np.float64)
    i3d = np.concatenate(
        [np.zeros((arr.shape[0], 12)), rng.normal(size=(arr.shape[0], 4))],
        axis=1)

    # NOTE: the python parser keys groups by raw row order; sort inputs by
    # (tid, fid) first so both parsers see identical per-group row order.
    order = np.lexsort((arr[:, 0], arr[:, 1]))
    arr, i3d = arr[order], i3d[order]

    slow = parse.parse_tracklets_pku(arr, D, 5, i3d_features=i3d, dim_i3d=4)
    fast = parse.parse_tracklets_pku_fast(arr, D, 5, i3d_features=i3d,
                                          dim_i3d=4)
    assert slow[0] == fast[0]
    assert slow[3] == fast[3]
    for a, b in zip(slow[1], fast[1]):
        np.testing.assert_allclose(a, b, rtol=1e-12)
    for a, b in zip(slow[2], fast[2]):
        np.testing.assert_allclose(a, b, rtol=1e-12)


def test_fast_pku_parser_speed():
    import time
    from vidsgg_big_tpu.data import parse
    rng = np.random.default_rng(8)
    D = 1024
    rows = np.zeros((20000, 12 + D), np.float64)
    rows[:, 0] = np.tile(np.arange(500), 40)
    rows[:, 1] = np.repeat(np.arange(40), 500)
    rows[:, 2:6] = rng.uniform(1, 50, (20000, 4))
    rows[:, 6] = rng.uniform(0.2, 1, 20000)
    rows[:, 7] = np.repeat(rng.integers(1, 30, 40), 500)
    rows[:, 8:12] = rng.uniform(1, 50, (20000, 4))
    t0 = time.perf_counter()
    slow = parse.parse_tracklets_pku(rows, D, 5)
    t_slow = time.perf_counter() - t0
    t0 = time.perf_counter()
    fast = parse.parse_tracklets_pku_fast(rows, D, 5)
    t_fast = time.perf_counter() - t0
    assert slow[0] == fast[0]
    np.testing.assert_allclose(slow[1][0], fast[1][0])
    print(f"parse 20k rows: python {t_slow*1e3:.0f}ms fast {t_fast*1e3:.0f}ms "
          f"({t_slow/t_fast:.1f}x)")
    # NOTE: no wall-clock assertion — timing under full-suite load on one CPU
    # core is too noisy for a hard gate; the speedup is documented instead


def _mega_rows(rng, D, n_tids=4, bg_prob=0.25):
    """Mixed len-6 / len-12+D mega-format rows, (tid, fid)-sorted, with
    occasional frame gaps (exercises the float-frame-id interpolation
    path: mega/vidor rows carry float ids, reference
    dataloader_vidvrd.py:251)."""
    rows = []
    for tid in (2, 5, 7, 11)[:n_tids]:
        s = int(rng.integers(0, 8))
        n = int(rng.integers(6, 25))
        cat = int(rng.integers(1, 12))
        f = s
        for k in range(n):
            base = [float(f), float(tid)] + \
                rng.uniform(1, 50, 4).round(2).tolist()
            if rng.uniform() < bg_prob:
                rows.append(base)                       # len-6 background
            else:
                rows.append(base + [float(rng.uniform(0.2, 1)), float(cat)]
                            + rng.uniform(1, 50, 4).round(2).tolist()
                            + rng.normal(size=D).round(3).tolist())
            f += 1 + int(rng.uniform() < 0.2)           # occasional gaps
    return rows


def test_fast_mega_parser_matches_python_parser():
    """parse_tracklets_mega_fast == parse_tracklets_mega on mixed-length
    (object-dtype) mega rows AND on uniform full-row arrays."""
    from vidsgg_big_tpu.data import parse
    rng = np.random.default_rng(17)
    D = 8

    # object-dtype: mixed len-6 / len-12+D rows
    rows = _mega_rows(rng, D)
    arr = np.empty(len(rows), object)
    for i, r in enumerate(rows):
        arr[i] = r
    slow = parse.parse_tracklets_mega(rows, D, 5)
    fast = parse.parse_tracklets_mega_fast(arr, D, 5)
    assert slow[0] == fast[0]
    assert slow[3] == fast[3]
    for a, b in zip(slow[1], fast[1]):
        np.testing.assert_allclose(a, b, rtol=1e-12)
    for a, b in zip(slow[2], fast[2]):
        np.testing.assert_allclose(a, b, rtol=1e-12)

    # uniform: every row full-length
    rows_u = [r for r in _mega_rows(rng, D, bg_prob=0.0)]
    arr_u = np.asarray(rows_u, np.float64)
    slow = parse.parse_tracklets_mega(arr_u, D, 5)
    fast = parse.parse_tracklets_mega_fast(arr_u, D, 5)
    assert slow[0] == fast[0] and slow[3] == fast[3]
    for a, b in zip(slow[1], fast[1]):
        np.testing.assert_allclose(a, b, rtol=1e-12)


def test_fast_vidor_parser_matches_python_parser():
    """parse_tracklets_vidor_fast == parse_tracklets_vidor: len-6 rows
    skipped, classeme concatenated by ORIGINAL row index."""
    from vidsgg_big_tpu.data import parse
    rng = np.random.default_rng(19)
    D = 8
    rows = _mega_rows(rng, D, bg_prob=0.3)
    arr = np.empty(len(rows), object)
    for i, r in enumerate(rows):
        arr[i] = r
    classeme = rng.normal(size=(len(rows), 6)).round(3)

    slow = parse.parse_tracklets_vidor(rows, classeme, D, 5)
    fast = parse.parse_tracklets_vidor_fast(arr, classeme, D, 5)
    assert slow[0] == fast[0]
    assert slow[3] == fast[3]
    for a, b in zip(slow[1], fast[1]):
        np.testing.assert_allclose(a, b, rtol=1e-12)
    for a, b in zip(slow[2], fast[2]):
        np.testing.assert_allclose(a, b, rtol=1e-12)

    # uniform full-row array + no classeme
    rows_u = np.asarray(_mega_rows(rng, D, bg_prob=0.0), np.float64)
    slow = parse.parse_tracklets_vidor(rows_u, None, D, 5)
    fast = parse.parse_tracklets_vidor_fast(rows_u, None, D, 5)
    assert slow[0] == fast[0] and slow[3] == fast[3]
    for a, b in zip(slow[2], fast[2]):
        np.testing.assert_allclose(a, b, rtol=1e-12)


def test_fast_mega_vidor_parser_speed():
    """Full-split cache-build hot loop (SURVEY s3.5): the fast parsers beat
    the python row loops at real-sized videos (documented, not gated)."""
    import time
    from vidsgg_big_tpu.data import parse
    rng = np.random.default_rng(23)
    D = 1024
    R, n_tids = 12000, 30
    rows = np.zeros((R, 12 + D), np.float64)
    rows[:, 0] = np.tile(np.arange(R // n_tids), n_tids)
    rows[:, 1] = np.repeat(np.arange(n_tids), R // n_tids)
    rows[:, 2:6] = rng.uniform(1, 50, (R, 4))
    rows[:, 6] = rng.uniform(0.2, 1, R)
    rows[:, 7] = np.repeat(rng.integers(1, 30, n_tids), R // n_tids)
    rows[:, 8:12] = rng.uniform(1, 50, (R, 4))
    classeme = rng.normal(size=(R, 300))

    parse.parse_tracklets_mega_fast(rows, D, 5)   # warm first-touch pages
    t0 = time.perf_counter()
    slow = parse.parse_tracklets_mega(rows, D, 5)
    t_slow = time.perf_counter() - t0
    t0 = time.perf_counter()
    fast = parse.parse_tracklets_mega_fast(rows, D, 5)
    t_mega = time.perf_counter() - t0
    assert slow[0] == fast[0]
    np.testing.assert_allclose(slow[1][0], fast[1][0])
    print(f"mega 12k rows: python {t_slow*1e3:.0f}ms fast {t_mega*1e3:.0f}ms "
          f"({t_slow/t_mega:.1f}x)")

    parse.parse_tracklets_vidor_fast(rows, classeme, D, 5)   # warm pages
    t0 = time.perf_counter()
    slow = parse.parse_tracklets_vidor(rows, classeme, D, 5)
    t_slow = time.perf_counter() - t0
    t0 = time.perf_counter()
    fast = parse.parse_tracklets_vidor_fast(rows, classeme, D, 5)
    t_vidor = time.perf_counter() - t0
    assert slow[0] == fast[0]
    np.testing.assert_allclose(slow[2][0], fast[2][0])
    print(f"vidor 12k rows: python {t_slow*1e3:.0f}ms fast {t_vidor*1e3:.0f}ms "
          f"({t_slow/t_vidor:.1f}x)")
