"""Table loading and catalog helpers.

The driver's test tables live at /root/testdata/sf*/ (TESTDATA.md): a
TPC-H-ish star schema + `events` + `documents` + `embeddings`, one parquet
file each. At deployment scale these would be partitioned parquet/iceberg
table roots; the loader only assumes "a directory of named parquet tables".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Plain `spark.read.parquet`: schema comes from the
    footer, filters/pruning push down automatically.

    `events.ts` has shipped as two physical types across testdata
    generations: TIMESTAMP(NANOS) (arrives as a long under
    spark.sql.legacy.parquet.nanosAsLong — floor-divide to micros, the same
    truncation DuckDB's epoch_ms applies) and TIMESTAMP(MICROS) without UTC
    adjustment (arrives as TIMESTAMP_NTZ — cast to the session-TZ timestamp;
    the session is pinned to UTC, so the wall-clock values are reinterpreted
    as the same instants DuckDB's naive-as-UTC epoch_ms sees). Either way
    downstream code only ever handles TimestampType.
    """
    df = spark.read.parquet(table_path(sf_dir, name))
    from pyspark.sql.types import LongType, TimestampNTZType

    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() queries see the same
    names the DuckDB oracle uses."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
