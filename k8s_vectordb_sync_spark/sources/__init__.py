from . import cdc, tables  # noqa: F401
