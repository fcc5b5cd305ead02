"""Engine configuration, env-var driven.

Mirrors the reference's config surface (internal/config/config.go:44-57):
same variable names, same defaults, same CSV/int parsing semantics
(config.go:59-99: trim + lowercase for CSV lists, fall back to default on
parse failure).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from .schemas import DEFAULT_EXCLUDED_RESOURCE_TYPES


def _env_int(name: str, default: int, env: dict | None = None) -> int:
    src = env if env is not None else os.environ
    raw = src.get(name, "")
    try:
        return int(raw)
    except (TypeError, ValueError):
        return default


def _env_csv(name: str, default: tuple[str, ...], env: dict | None = None) -> tuple[str, ...]:
    """CSV parse with trim + lowercase, dropping empties (config.go:75-99)."""
    src = env if env is not None else os.environ
    raw = src.get(name)
    if raw is None or raw.strip() == "":
        return tuple(default)
    items = [part.strip().lower() for part in raw.split(",")]
    return tuple(item for item in items if item)


@dataclass(frozen=True)
class EngineConfig:
    """All knobs the reference exposes (config.go:44-57) + Spark-side paths."""

    instances_endpoint: str = ""
    capabilities_endpoint: str = ""  # empty = CRD pipeline disabled (cmd/main.go:147-171)
    debounce_window_ms: int = 10_000  # DEBOUNCE_WINDOW_MS (config.go:48)
    batch_flush_interval_ms: int = 5_000  # BATCH_FLUSH_INTERVAL_MS (config.go:49)
    batch_max_size: int = 50  # BATCH_MAX_SIZE (config.go:50)
    resync_interval_min: int = 1_440  # RESYNC_INTERVAL_MIN (config.go:51)
    watch_resource_types: tuple[str, ...] = ()  # allowlist; empty = use blocklist
    exclude_resource_types: tuple[str, ...] = field(
        default_factory=lambda: tuple(DEFAULT_EXCLUDED_RESOURCE_TYPES)
    )
    api_bind_address: str = ":8082"
    log_level: str = "info"
    # Spark-side additions (not in the reference):
    checkpoint_dir: str = "/tmp/k8s-vectordb-sync-spark/checkpoints"
    target_path: str = "/tmp/k8s-vectordb-sync-spark/target"

    @property
    def crd_pipeline_enabled(self) -> bool:
        return bool(self.capabilities_endpoint)

    @classmethod
    def from_env(cls, env: dict | None = None) -> "EngineConfig":
        src = dict(env) if env is not None else dict(os.environ)
        return cls(
            instances_endpoint=src.get("INSTANCES_ENDPOINT", ""),
            capabilities_endpoint=src.get("CAPABILITIES_ENDPOINT", ""),
            debounce_window_ms=_env_int("DEBOUNCE_WINDOW_MS", 10_000, src),
            batch_flush_interval_ms=_env_int("BATCH_FLUSH_INTERVAL_MS", 5_000, src),
            batch_max_size=_env_int("BATCH_MAX_SIZE", 50, src),
            resync_interval_min=_env_int("RESYNC_INTERVAL_MIN", 1_440, src),
            watch_resource_types=_env_csv("WATCH_RESOURCE_TYPES", (), src),
            exclude_resource_types=_env_csv(
                "EXCLUDE_RESOURCE_TYPES", DEFAULT_EXCLUDED_RESOURCE_TYPES, src
            ),
            api_bind_address=src.get("API_BIND_ADDRESS", ":8082"),
            log_level=src.get("LOG_LEVEL", "info"),
            checkpoint_dir=src.get(
                "SPARK_CHECKPOINT_DIR", "/tmp/k8s-vectordb-sync-spark/checkpoints"
            ),
            target_path=src.get("SPARK_TARGET_PATH", "/tmp/k8s-vectordb-sync-spark/target"),
        )
