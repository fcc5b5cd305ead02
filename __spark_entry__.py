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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from k8s_vectordb_sync_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full instance-sync pipeline (projection -> change
    suppression -> quiet-period debounce -> delete-cancels-upsert) on
    sf0.001."""
    # The driver may pass a session built without our nanos config; the events
    # loader needs it to read TIMESTAMP(NANOS) parquet.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return QUERIES["pipeline_sync_resolved"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def _wrap(fn):
        def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return fn(spark, sf_dir)

        return runner

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
