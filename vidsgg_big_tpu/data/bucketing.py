"""Shape bucketing: group videos into a small set of compiled shapes.

Every (N_traj, T_frames) bucket maps to one XLA executable; videos are padded
up to their bucket.  This replaces the reference's per-video variable-shape
eager execution (reference models/model_0v10.py:513) — the single biggest
TPU-first design change (SURVEY.md §7.1).
"""
from __future__ import annotations

import dataclasses
from typing import Iterable, Sequence, Tuple

import numpy as np

from .types import (VideoProposalRecord, VideoGTRecord, pack_proposal,
                    pack_gt, stack_batches)

DEFAULT_N_LADDER = (8, 16, 32, 64, 128, 192)
DEFAULT_T_LADDER = (32, 64, 128, 256, 512, 1024, 2048, 4096)


def pick(value: int, ladder: Sequence[int]) -> int:
    for x in ladder:
        if value <= x:
            return x
    return ladder[-1]


# shared grounding-stage shape ladder (clip counts and unique-triplet
# counts); one definition so train and eval buckets can never diverge
GROUNDING_LADDER = (32, 64, 128, 256, 512, 1024)


def pick_unbounded(value: int,
                   ladder: Sequence[int] = GROUNDING_LADDER) -> int:
    """Smallest ladder bucket holding ``value``; doubles past the top so no
    video is ever truncated and no single long video pads the whole run to
    a global max (the reference handles every video at its own length,
    reference tools/eval_vidor.py:226-253)."""
    for x in ladder:
        if value <= x:
            return x
    x = ladder[-1]
    while x < value:
        x *= 2
    return x


@dataclasses.dataclass
class BucketSpec:
    n_ladder: Sequence[int] = DEFAULT_N_LADDER
    t_ladder: Sequence[int] = DEFAULT_T_LADDER
    g_bucket: int = 32            # GT trajectories
    # GT per-frame box storage: one large constant bucket — GT boxes are
    # tiny (G x Tg x 4 f32) and the vIoU grid's compute is governed by
    # t_abs, not Tg, so over-covering is cheap; a constant keeps compiled
    # shapes stable AND avoids fragmenting (N, T) groups by GT length.
    # 4096 covers VidOR's 2700-frame bound; pick_unbounded doubles past it.
    tg_bucket: int = 4096
    p_bucket: int = 128           # GT predicates
    feat_dim: int = 0
    feat_dtype: str = "float32"   # feature storage: float32/bfloat16/int8

    def bucket_of(self, prop: VideoProposalRecord) -> Tuple[int, int]:
        n = pick(max(prop.num_proposals, 1), self.n_ladder)
        t = pick(max(prop.max_frames, 1), self.t_ladder)
        return n, t


def iter_shuffled(dataset, seed: int = 0, map_fn=None):
    """Yield ``dataset[i]`` over a fresh permutation — a streaming shuffle.

    Records are loaded from the per-video cache at yield time, so a shuffled
    epoch never materializes the split (unlike ``rng.shuffle(list(dataset))``,
    which holds every video's features in host RAM at once).
    """
    rng = np.random.default_rng(seed)
    for i in rng.permutation(len(dataset)):
        rec = dataset[int(i)]
        yield map_fn(rec) if map_fn is not None else rec


def stream_buckets(items: Iterable, key_of, batch_size: int,
                   max_pending: int | None = None, drop_last: bool = False):
    """The streaming bucket grouper: yield ``(key, rows, n_real)``.

    ``rows`` holds ``n_real`` real records followed by repeats of the last
    record padding to a ``batch_size`` multiple (callers mask the repeats).
    Full buckets flush as soon as they fill; at most ``max_pending`` records
    (default ``max(8 * batch_size, 64)``) wait in partial buckets — when the
    cap is hit the fullest bucket flushes early, padded, regardless of
    ``drop_last`` (which governs only the end-of-stream remainder;
    discarding mid-epoch would silently skip records).

    Shared by the TrackletBatch path (:func:`bucketed_batches`) and the
    grounding clip-feature epoch stream (tools/train_vidor.py) so the
    flush/padding policy can never diverge between them.
    """
    if max_pending is None:
        max_pending = max(8 * batch_size, 64)

    def padded(rows):
        n_real = len(rows)
        rows = list(rows)
        while len(rows) % batch_size != 0:
            rows.append(rows[-1])
        return rows, n_real

    groups, pending = {}, 0
    for rec in items:
        key = key_of(rec)
        groups.setdefault(key, []).append(rec)
        pending += 1
        if len(groups[key]) == batch_size:
            yield key, groups.pop(key), batch_size
            pending -= batch_size
        elif pending >= max_pending:
            k2 = max(groups, key=lambda k: len(groups[k]))
            rows, n_real = padded(groups.pop(k2))
            pending -= n_real
            yield k2, rows, n_real
    for key, rows in groups.items():
        if drop_last:
            continue
        rows, n_real = padded(rows)
        for i in range(0, len(rows), batch_size):
            yield key, rows[i:i + batch_size], min(batch_size, n_real - i)


def bucketed_batches(items: Iterable, spec: BucketSpec, batch_size: int,
                     with_gt: bool = True, shuffle: bool = False, seed: int = 0,
                     drop_last: bool = False, max_pending: int | None = None):
    """Yield (bucket_key, [records], TrackletBatch, GraphBatch|None).

    items: iterable of (VideoProposalRecord, VideoGTRecord|None).  Videos are
    grouped per bucket; each group is flushed when it reaches ``batch_size``
    (padded batches are never mixed across buckets).

    This is a *streaming* grouper: full batches are yielded as soon as their
    bucket fills, and at most ``max_pending`` records (default
    ``max(8 * batch_size, 64)``) wait in partially-filled buckets — when the
    cap is hit, the fullest bucket is flushed early as a padded batch
    (regardless of ``drop_last``, which only drops the end-of-stream
    remainder).  Peak
    host memory is therefore O(max_pending + batch) regardless of split size
    (the reference's whole-split cache needs ~126 GB for VidOR-train,
    reference README.md:74).  Pass a dataset iterator (e.g.
    :func:`iter_shuffled`) rather than a list to benefit.

    ``shuffle=True`` shuffles *record order* and requires materializing
    ``items``; prefer ``iter_shuffled(dataset, seed)`` + ``shuffle=False``
    for bounded-memory shuffled epochs.
    """
    if shuffle:
        items = list(items)
        rng = np.random.default_rng(seed)
        rng.shuffle(items)
    if max_pending is None:
        max_pending = max(8 * batch_size, 64)

    import ml_dtypes
    dtype = (ml_dtypes.bfloat16 if spec.feat_dtype == "bfloat16"
             else np.dtype(spec.feat_dtype))

    def emit(key, rows, n_real):
        # rows arrive from stream_buckets already padded to a batch_size
        # multiple by repeating the last video (fixed compiled batch size).
        # Repeats are *fully masked out* so they contribute nothing to
        # losses or metrics (each real video enters an epoch exactly once,
        # like the reference).
        assert len(rows) % batch_size == 0, (len(rows), batch_size)
        n, t = key[0], key[1]
        props = stack_batches([
            pack_proposal(r[0], n, t, spec.feat_dim, dtype=dtype)
            for r in rows])
        if n_real < len(rows):
            # numpy mask: emit often runs on the prefetch producer thread,
            # which must never touch the device (axon tunnel stall)
            real = np.arange(len(rows)) < n_real
            props = props.replace(
                traj_mask=props.traj_mask & real[:, None])
        gts = None
        if with_gt and rows[0][1] is not None:
            # GT buckets come from the grouping key (see key_of below), so
            # every batch of a key compiles at one stable shape
            tg, gb = key[2], key[3]
            gts = stack_batches([
                pack_gt(r[1], gb, tg, spec.p_bucket) for r in rows])
            if n_real < len(rows):
                gts = gts.replace(
                    traj_mask=gts.traj_mask & real[:, None],
                    pred_mask=gts.pred_mask & real[:, None])
        return key, rows[:n_real], props, gts

    def key_of(rec):
        k = spec.bucket_of(rec[0])
        if not with_gt:
            return k
        gt = rec[1]
        # GT-derived buckets ride the key so compiled shapes are stable per
        # key (no per-batch max => no shuffle-dependent recompiles):
        #  - tg must COVER every GT trajectory (GT can outlast the
        #    proposals' frame bucket; pack_gt keeps true durations, and
        #    truncated boxes would silently zero the vIoU alignment) — the
        #    large constant spec.tg_bucket keeps it one value in practice
        #  - gb grows past the default on crowded videos instead of
        #    assert-crashing mid-run
        tg = pick_unbounded(max(
            (b.shape[0] for b in gt.traj_boxes), default=1)
            if gt is not None else 1, (spec.tg_bucket,))
        gb = pick_unbounded(
            gt.num_trajs if gt is not None else 1,
            (spec.g_bucket, 2 * spec.g_bucket, 4 * spec.g_bucket))
        return (*k, tg, gb)

    for key, rows, n_real in stream_buckets(
            items, key_of, batch_size,
            max_pending=max_pending, drop_last=drop_last):
        yield emit(key, rows, n_real)
