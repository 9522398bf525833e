"""Data contracts: host-side per-video records and fixed-shape device batches.

The reference passes variable-shape python objects (``TrajProposal`` /
``VideoGraph``, reference dataloaders/dataloader_vidvrd.py:14-143) through the
model one video at a time.  The TPU-native contract instead is:

  * :class:`VideoProposalRecord` / :class:`VideoGTRecord` — plain numpy,
    variable-shape, used on host for data prep and eval-format conversion.
  * :class:`TrackletBatch` / :class:`GraphBatch` — padded, masked pytrees with
    static shapes.  One ``(N_bucket, T_bucket)`` shape = one compiled
    executable; batching stacks videos of the same bucket on a leading axis.

Boxes are stored relative to each trajectory (frame 0 = trajectory start) and
un-stretched; ``stretch_idx`` carries the reference's repeat-padding gather so
the model can reproduce ``stack_with_repeat_2d`` semantics on device.
Durations are closed intervals [start, end] of absolute frame ids.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np
import jax.numpy as jnp
from flax import struct



# ---------------------------------------------------------------------------
# host-side records (numpy, variable shape)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class VideoProposalRecord:
    """Tracklet proposals of one video (after score clipping to MAX_PROPOSAL)."""
    video_name: str
    video_len: int
    video_wh: Tuple[int, int]
    cat_ids: np.ndarray            # (n,) int32
    scores: np.ndarray             # (n,) float32 (mean per-frame conf)
    durations: np.ndarray          # (n, 2) int32, closed [start, end]
    boxes: List[np.ndarray]        # n arrays, (len_i, 4) float32 xyxy
    features: List[np.ndarray]     # n arrays, (len_i, D) float32

    @property
    def num_proposals(self) -> int:
        return len(self.boxes)

    @property
    def max_frames(self) -> int:
        return max((b.shape[0] for b in self.boxes), default=0)

    def without_features(self) -> "VideoProposalRecord":
        """Copy with the feature arrays dropped (features dominate a
        record's footprint ~300:1 over boxes); keeps everything the
        eval-format converters and stage-B grounding need."""
        return dataclasses.replace(self, features=[])


@dataclasses.dataclass
class VideoGTRecord:
    """Ground-truth scene graph of one video."""
    video_name: str
    video_len: int
    video_wh: Tuple[int, int]
    traj_cat_ids: np.ndarray       # (g,) int32
    traj_durations: np.ndarray     # (g, 2) int32 closed
    traj_boxes: List[np.ndarray]   # g arrays, (len_i, 4) float32
    pred_cat_ids: np.ndarray       # (p,) int32
    pred_durations: np.ndarray     # (p, 2) float32 closed
    adj: np.ndarray                # (2, p, g) float32 one-hot (subj, obj)

    @property
    def num_trajs(self) -> int:
        return len(self.traj_boxes)

    @property
    def num_preds(self) -> int:
        return int(self.pred_cat_ids.shape[0])


# ---------------------------------------------------------------------------
# device batches (fixed shape, masked)
# ---------------------------------------------------------------------------

@struct.dataclass
class TrackletBatch:
    """Padded tracklet proposals.  Leading batch axis optional (stack to add)."""
    feats: jnp.ndarray        # (N, T, D), raw (un-stretched), 0-padded;
    #                           float32 / bfloat16, or int8 x feat_scale
    boxes: jnp.ndarray        # (N, T, 4) float32, relative frames, 0-padded
    stretch_idx: jnp.ndarray  # (N, T) int32 repeat-padding gather index
    durations: jnp.ndarray    # (N, 2) int32 closed absolute
    cat_ids: jnp.ndarray      # (N,) int32
    scores: jnp.ndarray       # (N,) float32
    traj_mask: jnp.ndarray    # (N,) bool
    video_len: jnp.ndarray    # () int32
    video_wh: jnp.ndarray     # (2,) float32 (w, h)
    feat_scale: jnp.ndarray = None   # () float32 dequant scale (int8 storage)

    @property
    def n_trajs(self):
        return self.traj_mask.sum(-1)

    @property
    def frame_mask(self):
        length = self.durations[..., 1] - self.durations[..., 0] + 1
        t = self.boxes.shape[-2]
        fm = jnp.arange(t) < length[..., None]
        return fm & self.traj_mask[..., None]


@struct.dataclass
class GraphBatch:
    """Padded ground-truth scene graph."""
    traj_cats: jnp.ndarray       # (G,) int32
    traj_durations: jnp.ndarray  # (G, 2) int32 closed
    traj_boxes: jnp.ndarray      # (G, Tg, 4) float32 relative
    traj_mask: jnp.ndarray       # (G,) bool
    pred_cats: jnp.ndarray       # (P,) int32
    pred_durations: jnp.ndarray  # (P, 2) float32 closed
    pred_mask: jnp.ndarray       # (P,) bool
    adj: jnp.ndarray             # (2, P, G) float32

    @property
    def n_preds(self):
        return self.pred_mask.sum(-1)


def pack_proposal(rec: VideoProposalRecord, n_bucket: int, t_bucket: int,
                  feat_dim: int, dtype=np.float32) -> TrackletBatch:
    """Pad one video's proposals into a fixed (N, T) bucket.

    The ragged->padded copies and the stretch index run through the native
    C++ packer when available (vidsgg_big_tpu/data/native.py)."""
    from . import native

    n = rec.num_proposals
    assert n <= n_bucket, (n, n_bucket)
    durations = np.zeros((n_bucket, 2), dtype=np.int32)
    cat_ids = np.zeros((n_bucket,), dtype=np.int32)
    scores = np.zeros((n_bucket,), dtype=np.float32)
    mask = np.zeros((n_bucket,), dtype=bool)
    lengths = np.zeros((n_bucket,), dtype=np.int32)
    for i in range(n):
        L = min(rec.boxes[i].shape[0], t_bucket)
        lengths[i] = L
        durations[i] = rec.durations[i]
        # clamp duration if the trajectory was truncated by the bucket
        durations[i, 1] = durations[i, 0] + L - 1
    if n == 0:
        # zero-proposal videos (all tracklets background / below
        # min_frames_th) occur in real splits: size the empty arrays from
        # feat_dim explicitly — inferring from the (empty) record would
        # produce (N, T, 0) leaves that crash stack_batches
        feats = np.zeros((n_bucket, t_bucket, feat_dim), np.float32)
    else:
        feats = native.pad_pack(
            [np.asarray(f[:t_bucket], np.float32) for f in rec.features],
            n_bucket, t_bucket)
    assert feats.shape[-1] == feat_dim, (feats.shape, feat_dim)
    feat_scale = np.float32(1.0)
    if np.dtype(dtype) == np.int8:
        # int8 feature storage: 4x less H2D/HBM traffic than f32 and the
        # first encoder matmul runs on the int8 MXU path (1.5x bf16 rate,
        # measured) — per-video symmetric scale, round-to-nearest
        feat_scale = np.float32(max(np.abs(feats).max() / 127.0, 1e-12))
        feats = np.clip(np.rint(feats / feat_scale), -127, 127).astype(np.int8)
    elif np.dtype(dtype) != np.float32:
        # e.g. bfloat16 feature storage: halves H2D and HBM traffic for the
        # low-precision compute path
        feats = feats.astype(dtype)
    if n == 0:
        boxes = np.zeros((n_bucket, t_bucket, 4), np.float32)
    else:
        boxes = native.pad_pack(
            [np.asarray(b[:t_bucket, :4], np.float32) for b in rec.boxes],
            n_bucket, t_bucket)
    cat_ids[:n] = rec.cat_ids
    scores[:n] = rec.scores
    mask[:n] = True
    stretch_idx = native.stretch_index(lengths, t_bucket)
    # NOTE: leaves stay numpy — packing often runs on the prefetch producer
    # thread, and implicit producer-thread H2D transfers stall the axon
    # tunnel (the device_put lesson, data/prefetch.py).  The jit call (or
    # prefetch's own device_put off-axon) transfers on the consumer side.
    return TrackletBatch(
        feats=feats, boxes=boxes,
        stretch_idx=np.asarray(stretch_idx), durations=durations,
        cat_ids=cat_ids, scores=scores,
        traj_mask=mask,
        video_len=np.asarray(rec.video_len, np.int32),
        video_wh=np.asarray(rec.video_wh, np.float32),
        feat_scale=feat_scale)


def pack_gt(rec: VideoGTRecord, g_bucket: int, tg_bucket: int,
            p_bucket: int) -> GraphBatch:
    """Pad one video's GT graph into a fixed (G, Tg, P) bucket.

    ``traj_durations`` always carry the TRUE closed GT extents — clamping
    them to the box bucket would corrupt the grounding stage's temporal
    queries and the vIoU alignment targets for any trajectory longer than
    the bucket (the reference never truncates GT).  Only the stored
    per-frame boxes are capped at ``tg_bucket``: consumers of the boxes
    (the vIoU alignment) must size ``tg_bucket`` to cover GT trajectory
    lengths — ``bucketed_batches`` picks a covering bucket per batch; the
    grounding train loop consumes durations only and may keep it small.
    """
    g, p = rec.num_trajs, rec.num_preds
    assert g <= g_bucket and p <= p_bucket, (g, g_bucket, p, p_bucket)
    traj_boxes = np.zeros((g_bucket, tg_bucket, 4), dtype=np.float32)
    traj_durations = np.zeros((g_bucket, 2), dtype=np.int32)
    traj_cats = np.zeros((g_bucket,), dtype=np.int32)
    traj_mask = np.zeros((g_bucket,), dtype=bool)
    for i in range(g):
        L = min(rec.traj_boxes[i].shape[0], tg_bucket)
        traj_boxes[i, :L] = rec.traj_boxes[i][:L]
        traj_durations[i] = rec.traj_durations[i]
    traj_cats[:g] = rec.traj_cat_ids
    traj_mask[:g] = True

    pred_cats = np.zeros((p_bucket,), dtype=np.int32)
    pred_durations = np.zeros((p_bucket, 2), dtype=np.float32)
    pred_mask = np.zeros((p_bucket,), dtype=bool)
    adj = np.zeros((2, p_bucket, g_bucket), dtype=np.float32)
    pred_cats[:p] = rec.pred_cat_ids
    pred_durations[:p] = rec.pred_durations
    pred_mask[:p] = True
    adj[:, :p, :g] = rec.adj
    # numpy leaves: see the note in pack_proposal
    return GraphBatch(
        traj_cats=traj_cats,
        traj_durations=traj_durations,
        traj_boxes=traj_boxes, traj_mask=traj_mask,
        pred_cats=pred_cats,
        pred_durations=pred_durations,
        pred_mask=pred_mask, adj=adj)


def stack_batches(items):
    """Stack a list of same-shaped pytrees along a new leading batch axis.

    numpy leaves stack in numpy (host-side, producer-thread safe); device
    leaves stack in jnp."""
    import jax

    def _stack(*xs):
        if all(isinstance(x, np.ndarray) or np.isscalar(x) for x in xs):
            return np.stack(xs, axis=0)
        return jnp.stack(xs, axis=0)

    return jax.tree_util.tree_map(_stack, *items)
