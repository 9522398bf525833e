"""Device-resident per-video record cache: epochs after the first never
touch the host→device wire.

Sustained BIG-C training through the axon tunnel is transfer-bound: the
device step is ~21 ms but each batch re-ships ~0.6 GB (bf16) of features
that were already on the device the previous epoch (reference training
re-reads host RAM every epoch too, but its PCIe moves GB/s while the
tunnel here moves ~0.03-0.25 GB/s).  The TPU-native fix is to keep the
*packed per-video records* resident in HBM and rebuild each epoch's
batches on device:

  * **Epoch 0** runs the normal host pipeline (disk → pack → preput
    device_put).  As each shipped batch arrives, :meth:`offer` captures
    per-video records as device-side slices of the already-transferred
    batch — zero extra wire bytes — and remembers each video's bucket key.
  * **Epochs ≥ 1** (once every required video is cached) skip disk,
    packing, and the tunnel: :meth:`epoch_descriptors` regroups the
    epoch's shuffled video names with the *same* streaming bucketer the
    host path uses (data/bucketing.py stream_buckets), and
    :meth:`assemble` stacks the cached records into a batch with one
    jitted concat on the main thread (axon forbids background-thread
    device work).

Batches are **bit-identical** to the host path: same records, same
grouping, same padding-repeat masking — only the stack happens on device
instead of numpy (tests/test_device_cache.py asserts equality and the
soak's resume bit-equality runs through it).

The cache is all-or-nothing per epoch: if the split does not fit
``budget_bytes`` (or a video never surfaced in epoch 0 — e.g. the
reference's resample-on-empty redirect, dataset.py __getitem__), every
epoch stays on the host path.  No reference counterpart exists; the
reference's closest analogue is its whole-split host-RAM pickle cache
(reference dataloaders/dataloader_vidvrd.py:146-186).
"""
from __future__ import annotations

import random
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .bucketing import stream_buckets


def _slice_record(tree, i):
    return jax.tree_util.tree_map(lambda x: x[i], tree)


_slice_record_jit = jax.jit(_slice_record)


@jax.jit
def _assemble(props_list, gts_list, real):
    def stack(*xs):
        return jnp.stack(xs, axis=0)

    props = jax.tree_util.tree_map(stack, *props_list)
    gts = (jax.tree_util.tree_map(stack, *gts_list)
           if gts_list is not None else None)
    # identical to bucketing.emit's padding-repeat masking (applied
    # unconditionally: with real all-True it is the identity)
    props = props.replace(traj_mask=props.traj_mask & real[:, None])
    if gts is not None:
        gts = gts.replace(traj_mask=gts.traj_mask & real[:, None],
                          pred_mask=gts.pred_mask & real[:, None])
    return props, gts


class DeviceRecordCache:
    """See module docstring.

    Args:
      name_list: dataset order of video names (``dataset.video_name_list``)
        — epoch shuffles permute *indices* of this list exactly like
        ``bucketing.iter_shuffled``.
      batch_size: compiled batch size (grouping granularity).
      budget_bytes: HBM budget; once exceeded no further records are
        cached and the cache reports incomplete forever.
      skip_names: names ``__getitem__`` always redirects away from (the
        reference's by-name OOM skip, reference
        dataloaders/dataloader_vidvrd.py:209-211); excluded from the
        completeness requirement and redirected identically (a fresh
        ``random.randint`` draw) when a cached epoch hits one.
    """

    def __init__(self, name_list: Sequence[str], batch_size: int,
                 budget_bytes: float,
                 skip_names: Iterable[str] = ()):
        self.name_list = list(name_list)
        self.batch_size = batch_size
        self.budget = float(budget_bytes)
        self.skip_names = set(skip_names)
        self.required = [n for n in self.name_list
                         if n not in self.skip_names]
        self.records: Dict[str, Tuple[object, object]] = {}
        self.keys: Dict[str, tuple] = {}
        self.bytes = 0
        self.over_budget = False
        self.first_cached_epoch: Optional[int] = None

    # ---- epoch-0 capture ---------------------------------------------------

    def offer(self, key, rows, props_dev, gts_dev) -> None:
        """Capture uncached videos from a shipped device batch.

        ``rows`` are the batch's *real* records (``bucketed_batches`` trims
        the padding repeats), so slice index ``i`` < n_real addresses an
        unmodified row of the device batch.
        """
        if self.over_budget:
            return
        for i, row in enumerate(rows):
            name = row[0].video_name
            if name in self.records:
                continue
            rec_p = _slice_record_jit(props_dev, i)
            rec_g = (_slice_record_jit(gts_dev, i)
                     if gts_dev is not None else None)
            nbytes = sum(l.nbytes for l in jax.tree_util.tree_leaves(rec_p))
            if rec_g is not None:
                nbytes += sum(l.nbytes
                              for l in jax.tree_util.tree_leaves(rec_g))
            if self.bytes + nbytes > self.budget:
                self.over_budget = True
                # drop the half-captured record's buffers immediately
                del rec_p, rec_g
                return
            self.records[name] = (rec_p, rec_g)
            self.keys[name] = key
            self.bytes += nbytes

    @property
    def complete(self) -> bool:
        return (not self.over_budget and
                all(n in self.records for n in self.required))

    # ---- cached epochs -----------------------------------------------------

    def _resolve(self, idx: int) -> str:
        # mirror of dataset.__getitem__'s by-name skip redirect; empty-
        # proposal videos never cache (they never surface), which instead
        # keeps `complete` False and the host path active — correct, just
        # not accelerated.
        name = self.name_list[idx]
        while name in self.skip_names:
            name = self.name_list[random.randint(0, len(self.name_list) - 1)]
        return name

    def epoch_descriptors(self, seed: int):
        """Yield ``(key, names)`` batch descriptors for one shuffled epoch.

        Grouping runs the same ``stream_buckets`` the host path uses over
        the same ``default_rng(seed)`` permutation, so batch composition
        is identical to ``bucketed_batches(iter_shuffled(dataset, seed))``.
        """
        rng = np.random.default_rng(seed)
        names = (self._resolve(int(i))
                 for i in rng.permutation(len(self.name_list)))
        for key, rows, n_real in stream_buckets(
                names, lambda n: self.keys[n], self.batch_size):
            yield key, rows[:n_real]

    def assemble(self, key, names: List[str]):
        """Stack cached records into a device batch (MAIN thread only)."""
        rows = list(names)
        while len(rows) < self.batch_size:
            rows.append(rows[-1])
        real = np.arange(self.batch_size) < len(names)
        props = tuple(self.records[n][0] for n in rows)
        gts = tuple(self.records[n][1] for n in rows)
        if gts[0] is None:
            gts = None
        return _assemble(props, gts, real)


# ---- CLI wiring (shared by tools/train_vidvrd.py + tools/train_vidor.py) --

def make_cache(args, dataset, batch_size, mesh=None, skip_names=()):
    """Build a cache when eligible: single-device run (cached records would
    need per-key shardings under a mesh), ``--device_cache_gb`` > 0, and a
    dataset exposing ``video_name_list``."""
    if mesh is not None:
        return None
    gb = getattr(args, "device_cache_gb", 4.0)
    if not gb or gb <= 0 or not hasattr(dataset, "video_name_list"):
        return None
    return DeviceRecordCache(dataset.video_name_list, batch_size, gb * 1e9,
                             skip_names=skip_names)


def cached_or_host_epoch(cache, epoch, logger, host_gen):
    """Epoch-stream selector: ``(key, names, None, None)`` descriptors once
    the cache is complete, else ``host_gen()`` (a thunk — the host pipeline
    is not even constructed for cached epochs).  Descriptor batches carry
    ``props=None``; the trainer's ``preput`` resolves them via
    :meth:`DeviceRecordCache.assemble` on the main thread."""
    if cache is not None and cache.complete:
        if cache.first_cached_epoch is None:
            cache.first_cached_epoch = epoch
            if logger is not None:
                logger.info(
                    f"device cache complete: {len(cache.records)} videos, "
                    f"{cache.bytes / 1e9:.2f} GB on device; epoch {epoch}+ "
                    "skips the host wire")
        return ((k, names, None, None)
                for k, names in cache.epoch_descriptors(epoch))
    return host_gen()
