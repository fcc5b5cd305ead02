from . import pipeline, sink  # noqa: F401
