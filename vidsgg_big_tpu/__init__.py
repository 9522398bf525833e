"""vidsgg_big_tpu — a TPU-native framework for video scene-graph generation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
classification-then-grounding VidSGG stack (reference: Dawn-LX/VidSGG-BIG,
CVPR'22).  Everything is fixed-shape, masked, and jit-compiled: per-video
variable-shape Python loops of the reference are replaced by bucketed padded
batches, vmapped geometry, and XLA/Pallas kernels.

Subpackages
-----------
ops         pure-JAX tensor ops: duration algebra, tIoU/vIoU, segment utils,
            bipartite matching.
data        fixed-shape batch pytrees, .npy tracklet parsers, bucketing,
            synthetic data generators.
models      BIG-C predicate-query transformer, Base-C pairwise baseline,
            multi-bin temporal grounding model (flax.linen).
train       losses, optimizer/schedule, jitted+pjit train steps, checkpointing.
parallel    device mesh + sharding helpers.
evaluation  relation-detection mAP/Recall@K/tagging-precision harness
            (challenge-JSON compatible), format converters.
utils       config loading, categories, logging.
"""

__version__ = "0.1.0"
