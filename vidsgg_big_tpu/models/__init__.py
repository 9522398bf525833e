"""Model zoo.

Public aliases preserve the reference's (crossed-over) naming: the i3d-capable
"v10" architecture is ``BIG_C_vidvrd`` and the classeme "v7" architecture is
``BIG_C_vidor`` (reference models/__init__.py:1-4).
"""
from .big_c import BigC, BigCConfig, geometry_features
from .triplets import (
    Triplets, construct_triplets, pairwise_construct_triplets)


def BIG_C_vidvrd(config: dict, **arrays):
    """Reference-compatible constructor (model_0v10 architecture)."""
    cfg = BigCConfig.from_dict(config, variant="v10")
    return BigC(cfg, **arrays)


def BIG_C_vidor(config: dict, **arrays):
    """Reference-compatible constructor (model_0v7 architecture)."""
    cfg = BigCConfig.from_dict(config, variant="v7")
    return BigC(cfg, **arrays)


__all__ = [
    "BigC", "BigCConfig", "geometry_features", "Triplets",
    "construct_triplets", "pairwise_construct_triplets",
    "BIG_C_vidvrd", "BIG_C_vidor",
]
