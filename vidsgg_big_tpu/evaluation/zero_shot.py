"""Zero-shot relation evaluation (triplets unseen in training).

Capability-parity with reference VidVRD-helper/evaluate.py:22-53 — filter GT
and predictions down to triplets absent from the train split, then run the
standard relation metrics.
"""
from __future__ import annotations

from .metrics import evaluate


def evaluate_zero_shot(groundtruth, prediction, train_triplets,
                       use_old_zeroshot_eval: bool = False,
                       viou_threshold: float = 0.5):
    """groundtruth/prediction: {vid: [relation dicts]}; train_triplets: set
    of (s, p, o) name tuples seen at training time."""
    test_triplets = set()
    for rels in groundtruth.values():
        test_triplets.update(tuple(r["triplet"]) for r in rels)
    zs_triplets = test_triplets.difference(train_triplets)

    zs_gt, zs_pred = {}, {}
    for vid, rels in groundtruth.items():
        zs = [r for r in rels if tuple(r["triplet"]) in zs_triplets]
        if not zs:
            continue
        zs_gt[vid] = zs
        if use_old_zeroshot_eval:
            zs_pred[vid] = prediction.get(vid, [])
        else:
            zs_pred[vid] = [r for r in prediction.get(vid, [])
                            if tuple(r["triplet"]) in zs_triplets]
    return evaluate(zs_gt, zs_pred, viou_threshold=viou_threshold)
