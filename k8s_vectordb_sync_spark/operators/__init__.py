from . import (  # noqa: F401
    bloom,
    debounce,
    dedup,
    filters,
    graph,
    multimodal,
    retrieval,
    similarity,
    sketches,
)
