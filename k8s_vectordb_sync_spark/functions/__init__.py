from . import extract, text, vectors  # noqa: F401
