"""Pallas TPU kernels for the hot paths (SURVEY.md §2 #4 and §7 step 5)."""

from .assign import assign_clusters_pallas, pallas_assign
from .scan_topk import pallas_exact_topk, pallas_masked_topk

__all__ = [
    "assign_clusters_pallas",
    "pallas_assign",
    "pallas_exact_topk",
    "pallas_masked_topk",
]
