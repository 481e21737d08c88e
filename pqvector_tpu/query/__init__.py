"""Query layer: standalone top-k API and device-resident batched search
(reference layer: /root/reference/src/ivf/search.rs)."""

from .device import DeviceIvfSearcher
from .search import SearchResult, TopkBuilder, topk, topk_batch
from .selective import read_embeddings_for_rows

__all__ = [
    "DeviceIvfSearcher",
    "SearchResult",
    "TopkBuilder",
    "read_embeddings_for_rows",
    "topk",
    "topk_batch",
]
