from . import debounce, dedup, filters, multimodal, similarity  # noqa: F401
