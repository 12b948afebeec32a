from housescan_tpu.utils.bijection import biject, ord_nub
from housescan_tpu.utils.graph import group_connected_components
from housescan_tpu.utils.vector_util import kth_largest_by, kth_smallest_by

__all__ = [
    "biject",
    "ord_nub",
    "group_connected_components",
    "kth_largest_by",
    "kth_smallest_by",
]
