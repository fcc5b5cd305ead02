"""Micro-batch sinks with the reference's REST-client contract.

Re-expresses internal/client/rest.go (SURVEY §2.1) as a foreachBatch writer:
  - skip empty payloads               (rest.go:83-85, debounce.go:22-24)
  - chunk upserts to batch_max_size   (debounce.go:153-161 -> 50/POST)
  - deletes sent alone, before upserts(debounce.go:105-121: delete priority)
  - retry 5xx/network with exponential backoff + jitter, 4xx terminal
                                      (rest.go:92-158)

The payload rows are collected per micro-batch *chunk* only (bounded by the
flush interval x batch cap), never a full-table collect. Exactly-once-ish:
checkpointed offsets + an idempotent upsert target mean a retried batch is
harmless — strictly stronger than the reference's drop-on-full channels.
"""

from __future__ import annotations

import json
import random
import time
import urllib.error
import urllib.request
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SinkClientError(Exception):
    """4xx-equivalent: terminal, no retry (rest.go:126-147)."""


class SinkServerError(Exception):
    """5xx/network-equivalent: retryable (rest.go:126-147)."""


def http_poster(
    endpoint: str, timeout_s: float = 30.0, headers: dict | None = None
) -> Callable[[dict], None]:
    """A concrete stdlib POST callable for CollectingSink / send_with_retry —
    the analog of rest.go:126-147 (doPost): JSON body, Content-Type header,
    30 s timeout, and the reference's exact status classification:
    4xx -> clientError (terminal), 5xx -> serverError (retryable),
    network failure -> retryable (rest.go Send only short-circuits 4xx).
    """

    def post(payload: dict) -> None:
        req = urllib.request.Request(
            endpoint,
            data=json.dumps(payload, default=str).encode("utf-8"),
            headers={"Content-Type": "application/json", **(headers or {})},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout_s):
                pass  # 2xx/3xx: success (rest.go treats <400 as OK)
        except urllib.error.HTTPError as e:
            if 400 <= e.code < 500:
                raise SinkClientError(f"client error: HTTP {e.code}") from e
            raise SinkServerError(f"server error: HTTP {e.code}") from e
        except urllib.error.URLError as e:
            raise SinkServerError(f"sending request: {e.reason}") from e

    return post


@dataclass
class RetryPolicy:
    """rest.go:65-78,150-158: 3 retries, 1s initial, x2, cap 30s, jitter .75-1."""

    max_retries: int = 3
    initial_delay_s: float = 1.0
    max_delay_s: float = 30.0
    jitter: tuple[float, float] = (0.75, 1.0)
    sleep: Callable[[float], None] = time.sleep
    rng: Callable[[], float] = random.random

    def delay(self, attempt: int) -> float:
        base = min(self.initial_delay_s * (2 ** (attempt - 1)), self.max_delay_s)
        lo, hi = self.jitter
        return base * (lo + (hi - lo) * self.rng())


def send_with_retry(post: Callable[[dict], None], payload: dict, policy: RetryPolicy) -> int:
    """POST with the reference's retry loop; returns attempts used.

    Raises SinkClientError immediately (4xx: rest_test.go:166 DoesNotRetryOn4xx)
    and SinkServerError after retries are exhausted.
    """
    attempt = 0
    while True:
        attempt += 1
        try:
            post(payload)
            return attempt
        except SinkClientError:
            raise
        except SinkServerError:
            if attempt > policy.max_retries:
                raise
            policy.sleep(policy.delay(attempt))


@dataclass
class CollectingSink:
    """In-memory payload collector — the analog of the reference's e2e mock
    server (test/e2e/mockserver/main.go:18-92): records every payload for
    assertion; an injectable `post` hook simulates failures (or does real
    HTTP delivery via http_poster).

    ``record`` controls payload retention. Default: record iff there is no
    real poster — a standing sync stream POSTing through this sink must not
    grow driver memory by one dict per synced row forever; tests that want
    both delivery and assertions pass record=True explicitly.
    """

    batch_max_size: int = 50
    policy: RetryPolicy = field(default_factory=RetryPolicy)
    post: Callable[[dict], None] | None = None
    payloads: list[dict] = field(default_factory=list)
    record: bool | None = None

    def _send(self, payload: dict) -> None:
        if self.post is not None:
            send_with_retry(self.post, payload, self.policy)
        if self.record if self.record is not None else self.post is None:
            self.payloads.append(payload)

    def write_batch(self, resolved: DataFrame, batch_id: int) -> None:
        """foreachBatch body: split ops, deletes first (delete priority), then
        upserts chunked to batch_max_size. Empty-payload skip throughout."""
        if resolved.isEmpty():  # typed-nil/empty guard (rest.go:83-85)
            return
        ops = resolved.cache()
        try:
            deletes = [
                r["id"]
                for r in ops.filter(F.col("op") == "delete").select("id").collect()
            ]
            if deletes:
                self._send({"deletes": deletes, "batch_id": batch_id})
            # toLocalIterator streams the sorted result one partition at a
            # time: driver memory is bounded by a partition + one chunk, not
            # the whole micro-batch (an unthrottled resync routed through this
            # sink would otherwise drive an unbounded collect). Ordering and
            # chunk contents are identical to a collect()-then-slice.
            chunk: list = []
            for r in (
                ops.filter(F.col("op") == "upsert")
                .drop("op")
                .orderBy("event_ts", "id")
                .toLocalIterator()
            ):
                chunk.append(r.asDict(recursive=True))
                if len(chunk) == self.batch_max_size:
                    self._send({"upserts": chunk, "batch_id": batch_id})
                    chunk = []
            if chunk:
                self._send({"upserts": chunk, "batch_id": batch_id})
        finally:
            ops.unpersist()

    def to_json_lines(self) -> str:
        return "\n".join(json.dumps(p, default=str) for p in self.payloads)


def parquet_upsert_sink(target_path: str, key_col: str = "id", num_buckets: int = 64):
    """foreachBatch writer that MERGEs each micro-batch into a parquet target
    (idempotent upsert-by-key; delete rows remove keys). The durable-sink
    variant of CollectingSink.

    Scale posture: the target is laid out as ``_bucket=pmod(xxhash64(key), N)``
    directory partitions, and each micro-batch touches ONLY the buckets its
    keys hash into — a batch with 1 key reads 1/N of the target (partition
    pruning on the scan) and rewrites 1 partition directory. Untouched
    buckets are never read, never deleted, never rewritten; per-batch work
    is O(|touched buckets|), not O(|target|).

    Atomicity contract (round 13): the merge commits through
    sources/staging.py's stage-then-rename-swap — the heavy write lands in a
    hidden staging dir with full lineage (a crash there leaves the target
    byte-identical), and the publish is per-bucket renames behind a trash
    journal, so a reader sees each bucket at the OLD generation or the NEW
    one, never a half-written directory. A crash inside the rename window is
    rolled back by staging.recover_staged_swap (old generation restored from
    the journaled trash) and checkpoint replay re-merges the batch
    idempotently. The cross-bucket rename sequence is the one gap a plain
    filesystem cannot close — Delta/Iceberg snapshot commits (`MERGE INTO`)
    are the deployment answer; fault-injection coverage:
    tests/test_sink_faults.py.
    """
    from ..plans.forget import read_layout_meta, write_layout_meta
    from ..plans.resync import merge_deletes, merge_upserts
    from ..sources.staging import recover_staged_swap, staged_partition_rewrite

    bucket_expr = F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_buckets)).cast("int")

    def write_batch(resolved: DataFrame, batch_id: int) -> None:
        if resolved.isEmpty():
            return
        # layout contract: record (key_col, num_buckets) beside the data the
        # first time, refuse to merge into a target laid out differently —
        # a mismatched merge would scatter a key across two buckets and
        # break every pruned reader (forget_keys, future merges).
        layout = read_layout_meta(target_path)
        if layout is None:
            write_layout_meta(target_path, key_col, num_buckets)
        elif (layout["key_col"], layout["num_buckets"]) != (key_col, num_buckets):
            raise ValueError(
                f"parquet_upsert_sink: target {target_path} was written with "
                f"layout {layout}, sink configured with key_col={key_col!r}/"
                f"num_buckets={num_buckets} — refusing a cross-layout merge"
            )
        # self-healing replay: if the previous batch crashed inside the
        # rename-swap window, roll the target back to the old generation
        # BEFORE building the read plan (an absent in-flight bucket would
        # otherwise vanish from the merge input, and the next swap's trash
        # reset would discard the parked old dirs permanently — the loss
        # mode tests/test_sink_faults.py injects). No-op on a clean target.
        recover_staged_swap(target_path)
        spark = resolved.sparkSession
        batch = resolved.withColumn("_bucket", bucket_expr)
        # bucket ids only — bounded by num_buckets, never data rows
        touched = sorted(
            r["_bucket"] for r in batch.select("_bucket").distinct().collect()
        )
        upserts = batch.filter(F.col("op") == "upsert").drop("op")
        deletes = batch.filter(F.col("op") == "delete").select(key_col)
        try:
            target = spark.read.parquet(target_path)
            exists = True
        except Exception:
            exists = False
        legacy = exists and "_bucket" not in target.columns
        if legacy:
            # legacy flat layout (pre-bucketing): adopt it once by computing
            # the bucket column on read and merging ALL buckets; the write
            # below is a one-time full static overwrite that re-lays the
            # target out as _bucket partitions (and clears the flat files),
            # after which every batch prunes normally
            target = target.withColumn("_bucket", bucket_expr)
            touched = sorted(set(touched) | {
                r["_bucket"] for r in target.select("_bucket").distinct().collect()
            })
        if exists:
            sub = target.filter(F.col("_bucket").isin(touched))
            merged = merge_upserts(sub, upserts, key_col)
            merged = merge_deletes(merged, deletes, key_col)
        else:
            merged = upserts
        if legacy:
            # one-shot migration: a full static overwrite re-lays the target
            # out as _bucket partitions and clears the old flat part files.
            # localCheckpoint materializes first (Spark refuses to overwrite
            # a path it is reading in the same plan); the checkpoint-loss
            # window is confined to this single adoption write.
            (
                merged.localCheckpoint()
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "static")
                .partitionBy("_bucket")
                .parquet(target_path)
            )
        else:
            # crash-safe merge commit (round 13): stage the merged touched
            # buckets to a hidden dir with FULL lineage (any failure during
            # the heavy write leaves the table byte-identical — no
            # localCheckpoint durability hole), then per-bucket rename swap
            # with a trash journal. A crash inside the swap window leaves
            # every bucket either old-generation or new-generation (never a
            # half-written dir); recover_staged_swap rolls the table back to
            # the old generation and checkpoint replay re-merges the batch
            # idempotently. Vacated buckets (all keys deleted) swap in as
            # empty schema-bearing dirs. Tested by fault injection in
            # tests/test_sink_faults.py.
            staged_partition_rewrite(merged, target_path, "_bucket", touched)

    return write_batch
