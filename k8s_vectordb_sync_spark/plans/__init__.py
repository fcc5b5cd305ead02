from . import resync, sync  # noqa: F401
