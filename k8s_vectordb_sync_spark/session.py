"""SparkSession construction tuned for this engine.

Local testing runs on local[N]; the configs below are the ones that matter at
cluster scale too (AQE, adaptive skew handling, Arrow for the Pandas-UDF
operators). Everything else is left to Spark defaults so a real cluster's
spark-defaults.conf wins.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_spark(
    app_name: str = "k8s-vectordb-sync-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a SparkSession with scale-oriented defaults.

    - AQE on: runtime coalescing of shuffle partitions, skew-join splitting.
      At 100 TB the static ``spark.sql.shuffle.partitions`` is always wrong;
      AQE re-plans from actual map output sizes.
    - Arrow on: the dedup/similarity/multimodal operators use pandas UDFs;
      Arrow batch transfer is the difference between 10x and 1000x slower
      than JVM expressions.
    - Parquet pushdown left on (default) — the projection/filter operators are
      written so predicates and column pruning reach the scan.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The driver test data stores TIMESTAMP(NANOS) parquet, which Spark
        # rejects by default; read as long and convert in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Split even small files into >= one scan partition per core: a
        # single-file local corpus otherwise arrives as ONE split and every
        # CPU-bound per-row stage (shingle/minhash/simhash hashing) serializes
        # on one core. On a real cluster the input is already many splits and
        # this floor is a no-op; it subsumes ad-hoc repartition() calls, which
        # cost a full shuffle of the payload to fix the same problem.
        .config("spark.sql.files.minPartitionNum", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        # The plan-lint scan-footprint gate parses FileScan column lists out
        # of explain() strings; Spark truncates those at maxToStringFields
        # (default 25) with "... N more fields", which would freeze a
        # truncated footprint. Pin high so the generator and the test
        # session always see full column lists.
        .config("spark.sql.debug.maxToStringFields", "1000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    _configure_rocksdb_state_store(spark)
    return spark


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _configure_rocksdb_state_store(spark: SparkSession) -> None:
    """Prefer the RocksDB state store for the stateful streaming operators
    (stateful_debounce and friends): debounce state is one row per LIVE key —
    at reference scale that is every tracked resource plus tombstones, far
    beyond what the default HDFS-backed provider should hold on-heap
    (it keeps the full map in executor memory; RocksDB spills to local disk
    and ships incremental changelogs to the checkpoint). Probed rather than
    assumed so a stripped build without the provider class falls back to the
    default provider instead of failing at query start."""
    try:
        spark._jvm.java.lang.Class.forName(_ROCKSDB_PROVIDER)  # type: ignore[union-attr]
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB_PROVIDER)
    except Exception:
        pass  # provider class absent: keep Spark's default state store


def get_or_create(spark: SparkSession | None = None) -> SparkSession:
    return spark if spark is not None else build_spark()
