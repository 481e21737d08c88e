"""Query layer: standalone top-k API and device-resident batched search
(reference layer: /root/reference/src/ivf/search.rs)."""

from .autotune import AutotuneReport, ServingPlan, autotune
from .device import DeviceIvfSearcher
from .search import SearchResult, TopkBuilder, topk, topk_batch
from .selective import read_embeddings_for_rows

__all__ = [
    "AutotuneReport",
    "DeviceIvfSearcher",
    "SearchResult",
    "ServingPlan",
    "TopkBuilder",
    "autotune",
    "read_embeddings_for_rows",
    "topk",
    "topk_batch",
]
