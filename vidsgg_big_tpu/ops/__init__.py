from .temporal import (
    dura_intersection,
    tiou,
    generalized_tiou,
    merge_duration_list,
    is_overlap,
)
from .boxes import box_areas_xyxy, viou_matrix, viou_aligned
from .segments import (
    stretch_index_np,
    stretch_lookup,
    adaptive_max_pool1d,
    pack_rows,
    unique_max,
)
from .matching import hungarian

__all__ = [
    "dura_intersection", "tiou", "generalized_tiou", "merge_duration_list",
    "is_overlap", "box_areas_xyxy", "viou_matrix", "viou_aligned",
    "stretch_index_np", "stretch_lookup", "adaptive_max_pool1d",
    "pack_rows", "unique_max", "hungarian",
]
