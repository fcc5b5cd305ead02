"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query result on sf0.001
queries()     -> every implemented operator from SURVEY.md §2 (+ §7 extension)
oracle_sql()  -> DuckDB-equivalent SQL per query (omitted only for genuinely
                 non-SQL-expressible ops, e.g. iterative k-means IVF)

Implementation lives in k8s_vectordb_sync_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# Python workers unpickle package functions (mapInPandas/applyInPandas query
# paths): they need the repo on THEIR sys.path too, even when the driver
# process was launched from another cwd.
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from k8s_vectordb_sync_spark.queries import ORACLES, QUERIES  # noqa: E402


def _configure(spark: SparkSession) -> None:
    """Session settings the engine depends on, applied defensively because
    the driver builds its own SparkSession:
    - nanosAsLong: events.parquet is TIMESTAMP(NANOS), rejected by default
    - UTC session timezone: date_trunc / NTZ casts must agree with the
      (timezone-naive) DuckDB oracle
    - addPyFile of the package: a few query paths (mapInPandas /
      applyInPandas) pickle package functions into Python workers, and a
      driver launched from another cwd has workers that cannot import
      `k8s_vectordb_sync_spark` (worker PYTHONPATH is frozen at JVM start,
      before this module loads). Shipping the package zip fixes the worker
      side at runtime.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _ship_package(spark)


_SHIPPED: set = set()


def _ship_package(spark: SparkSession) -> None:
    import tempfile
    import zipfile

    ctx = spark.sparkContext
    key = id(ctx)
    if key in _SHIPPED:
        return
    zpath = os.path.join(tempfile.gettempdir(), "kvs_spark_pkg.zip")
    pkg = os.path.join(_REPO, "k8s_vectordb_sync_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, _REPO))
    ctx.addPyFile(zpath)
    _SHIPPED.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full instance-sync pipeline (projection -> change
    suppression -> quiet-period debounce -> delete-cancels-upsert) on
    sf0.001."""
    _configure(spark)
    return QUERIES["pipeline_sync_resolved"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def _wrap(fn):
        def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return fn(spark, sf_dir)

        return runner

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
