"""Query layer: standalone top-k API and device-resident batched search
(reference layer: /root/reference/src/ivf/search.rs)."""

from .autotune import (AutotuneReport, ServingPlan, WeatherReport,
                       autotune, probe_weather)
from .device import DeviceIvfSearcher
from .search import SearchResult, TopkBuilder, topk, topk_batch
from .selective import read_embeddings_for_rows

__all__ = [
    "AutotuneReport",
    "DeviceIvfSearcher",
    "SearchResult",
    "ServingPlan",
    "WeatherReport",
    "TopkBuilder",
    "autotune",
    "probe_weather",
    "read_embeddings_for_rows",
    "topk",
    "topk_batch",
]
