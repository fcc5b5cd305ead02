"""Fault injection for the parquet_upsert_sink merge commit (VERDICT r12
item 3): kill the writer at every stage of the stage-then-rename-swap and
assert the atomicity contract —

  * a crash during the heavy staged write leaves the target byte-identical
    (old generation, full lineage — no localCheckpoint durability hole);
  * a crash inside the per-bucket rename window leaves EVERY bucket at
    exactly the old generation or the new one, never a half-written dir,
    with the trash journal naming the in-flight partitions;
  * recover_staged_swap rolls an interrupted swap back to the old
    generation; replaying the same micro-batch (checkpoint replay) then
    converges to the correct merged state.

The injection is deterministic: the swap's rename loop is interrupted via a
monkeypatched os.rename that raises after N renames — the same state a
SIGKILL between two rename syscalls leaves, without subprocess flakiness.
"""

from __future__ import annotations

import datetime
import os
import shutil
import tempfile

import pytest

from k8s_vectordb_sync_spark.sources import staging
from k8s_vectordb_sync_spark.streaming.sink import parquet_upsert_sink

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _t(ms: int) -> datetime.datetime:
    return T0 + datetime.timedelta(milliseconds=ms)


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="kvs-sinkfault-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


SCHEMA = "op string, event_ts timestamp, id string, value double"


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _state(spark, target: str) -> dict:
    return {r["id"]: r["value"] for r in spark.read.parquet(target).collect()}


def _bucket_rows(spark, target: str) -> dict:
    """{bucket_dir: sorted (id, value) rows} — per-bucket content snapshot."""
    out = {}
    for d in sorted(os.listdir(target)):
        if d.startswith("_bucket="):
            full = os.path.join(target, d)
            if any(f.endswith(".parquet") for f in os.listdir(full)):
                rows = spark.read.parquet(full).collect()
                out[d] = sorted((r["id"], r["value"]) for r in rows)
            else:
                out[d] = []
    return out


def _seed(spark, target: str, write_batch) -> None:
    write_batch(
        _batch(
            spark, [("upsert", _t(0), f"user/{i}", float(i)) for i in range(40)]
        ),
        0,
    )


BATCH2_ROWS = [("upsert", _t(10), f"user/{i}", 100.0 + i) for i in range(0, 40, 3)] + [
    ("delete", _t(10), "user/1", 0.0)
]


def _expected_after_batch2() -> dict:
    state = {f"user/{i}": float(i) for i in range(40)}
    for i in range(0, 40, 3):
        state[f"user/{i}"] = 100.0 + i
    del state["user/1"]
    return state


class _Boom(RuntimeError):
    pass


def test_crash_during_staged_write_leaves_target_intact(
    spark, workdir, monkeypatch
):
    """Kill inside the heavy phase (staging write): target byte-identical."""
    target = f"{workdir}/target"
    write_batch = parquet_upsert_sink(target, num_buckets=8)
    _seed(spark, target, write_batch)
    before = _bucket_rows(spark, target)

    def no_swap(table_path, tmp, dirnames):
        raise _Boom("killed before the first publish rename")

    monkeypatch.setattr(staging, "_swap_partitions", no_swap)
    with pytest.raises(_Boom):
        write_batch(_batch(spark, BATCH2_ROWS), 1)
    monkeypatch.undo()

    # old generation fully visible; hidden staging dir is not data
    assert _bucket_rows(spark, target) == before
    assert _state(spark, target) == {f"user/{i}": float(i) for i in range(40)}

    # checkpoint replay of the SAME batch converges
    write_batch(_batch(spark, BATCH2_ROWS), 1)
    assert _state(spark, target) == _expected_after_batch2()


@pytest.mark.parametrize("kill_after", [1, 3])
def test_crash_mid_swap_every_bucket_old_or_new(
    spark, workdir, monkeypatch, kill_after
):
    """Kill between two bucket renames: each bucket reads as exactly the old
    or the new generation; the journal names the in-flight partitions;
    rollback + replay converges."""
    target = f"{workdir}/target"
    write_batch = parquet_upsert_sink(target, num_buckets=8)
    _seed(spark, target, write_batch)
    old_gen = _bucket_rows(spark, target)

    real_rename = os.rename
    seen = {"n": 0}

    def flaky_rename(src, dst):
        # count only renames that PUBLISH a staged dir into the table root
        # (trash-parking renames ride along with their publish pair)
        if os.sep + staging.STAGE_DIR + os.sep in src:
            if seen["n"] >= kill_after:
                raise _Boom(f"killed after {kill_after} published buckets")
            seen["n"] += 1
        real_rename(src, dst)

    monkeypatch.setattr(os, "rename", flaky_rename)
    with pytest.raises(_Boom):
        write_batch(_batch(spark, BATCH2_ROWS), 1)
    monkeypatch.undo()

    # compute the new generation's per-bucket content on a clean twin target
    twin = f"{workdir}/twin"
    twin_batch = parquet_upsert_sink(twin, num_buckets=8)
    _seed(spark, twin, twin_batch)
    twin_batch(_batch(spark, BATCH2_ROWS), 1)
    new_gen = _bucket_rows(spark, twin)

    # contract: every bucket dir present in the crashed target is EXACTLY
    # its old-generation or new-generation content — never a mix. (A bucket
    # whose old dir was parked but whose staged dir had not renamed in yet
    # is absent — that is the journaled in-flight window rollback repairs.)
    crashed = _bucket_rows(spark, target)
    for d, rows in crashed.items():
        assert rows == old_gen.get(d) or rows == new_gen.get(d), (
            f"{d}: mixed-generation content {rows}"
        )

    # the journal names every in-flight partition
    journal = os.path.join(target, staging.TRASH_DIR, "_journal.json")
    assert os.path.exists(journal)

    # rollback restores the old generation exactly...
    staging.recover_staged_swap(target)
    assert _bucket_rows(spark, target) == old_gen
    assert not os.path.exists(os.path.join(target, staging.TRASH_DIR))
    assert not os.path.exists(os.path.join(target, staging.STAGE_DIR))

    # ...and checkpoint replay converges to the merged state
    write_batch(_batch(spark, BATCH2_ROWS), 1)
    assert _state(spark, target) == _expected_after_batch2()
    assert _bucket_rows(spark, target) == new_gen


def test_replay_without_rollback_also_converges(spark, workdir, monkeypatch):
    """Replaying the batch over a mid-swap crash state with NO operator
    intervention converges, because write_batch self-heals: it rolls back
    the journaled in-flight swap at entry, BEFORE building the read plan.
    (Without that, the in-flight bucket's old rows would be invisible to the
    merge and the next swap's trash reset would discard them permanently —
    the loss mode the first version of this test exposed.)"""
    target = f"{workdir}/target"
    write_batch = parquet_upsert_sink(target, num_buckets=8)
    _seed(spark, target, write_batch)

    real_rename = os.rename
    seen = {"n": 0}

    def flaky_rename(src, dst):
        if os.sep + staging.STAGE_DIR + os.sep in src:
            if seen["n"] >= 2:
                raise _Boom("killed after 2 published buckets")
            seen["n"] += 1
        real_rename(src, dst)

    monkeypatch.setattr(os, "rename", flaky_rename)
    with pytest.raises(_Boom):
        write_batch(_batch(spark, BATCH2_ROWS), 1)
    monkeypatch.undo()

    write_batch(_batch(spark, BATCH2_ROWS), 1)
    assert _state(spark, target) == _expected_after_batch2()


def test_recover_staged_swap_noop_on_clean_table(spark, workdir):
    target = f"{workdir}/target"
    write_batch = parquet_upsert_sink(target, num_buckets=8)
    _seed(spark, target, write_batch)
    before = _bucket_rows(spark, target)
    out = staging.recover_staged_swap(target)
    assert out == {"restored": []}
    assert _bucket_rows(spark, target) == before
