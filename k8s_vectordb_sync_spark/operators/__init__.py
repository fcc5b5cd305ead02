from . import (  # noqa: F401
    debounce,
    dedup,
    filters,
    multimodal,
    retrieval,
    similarity,
    sketches,
)
