"""Crash-safe partition rewrites: stage, then rename-swap.

The naive way to rewrite a partition of a parquet table in place —
``localCheckpoint()`` the kept rows (the path cannot be overwritten while
it is being read) and dynamic-partition-overwrite — has a durability hole:
the checkpointed blocks are non-replicated executor memory with NO
recomputable lineage, so an executor loss mid-rewrite fails the job after
some partitions have already committed, and the old data is gone
(VERDICT r6 on plans/forget.py; the same pattern lived in the index
delete-propagation ops).

The safe shape shared here: write the kept rows to a HIDDEN staging dir
inside the table (underscore-prefixed and without '=', so Spark's file
index never lists it as data), with full lineage retained — any failure
during the heavy phase leaves the table byte-identical — then swap the
staged partition dirs in with per-partition renames, parking the old dirs
in a trash dir (with a journal) until every rename lands. The swap is
O(partitions) metadata renames; a plain filesystem cannot commit N renames
atomically — that final gap is what Delta/Iceberg snapshot commits close
in a real deployment, and the trash journal makes manual recovery
mechanical if a crash lands inside it.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame

STAGE_DIR = "_stage_tmp"
TRASH_DIR = "_stage_trash"


def _swap_partitions(table_path: str, tmp: str, dirnames: list[str]) -> None:
    """Per-partition rename swap: park old dirs in trash, move staged dirs
    into place, then drop trash + staging."""
    trash = os.path.join(table_path, TRASH_DIR)
    shutil.rmtree(trash, ignore_errors=True)
    os.makedirs(trash)
    with open(os.path.join(trash, "_journal.json"), "w") as fh:
        json.dump({"partitions": dirnames}, fh)
    for d in dirnames:
        final = os.path.join(table_path, d)
        staged = os.path.join(tmp, d)
        if os.path.exists(final):
            os.rename(final, os.path.join(trash, d))
        os.rename(staged, final)
    shutil.rmtree(trash, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)


def staged_partition_rewrite(
    kept: DataFrame,
    table_path: str,
    partition_col: str,
    touched: list,
) -> int:
    """Replace the ``touched`` partitions of ``table_path`` with ``kept``
    (which must carry ``partition_col``), crash-safely. Touched partitions
    absent from ``kept`` are swapped in as EMPTY (but schema-bearing)
    directories, so fully-emptied partitions are cleared and the table
    always keeps at least one parquet footer. Returns the number of rows in
    the rewritten partitions (the post-rewrite count).
    """
    spark = kept.sparkSession
    tmp = os.path.join(table_path, STAGE_DIR)
    shutil.rmtree(tmp, ignore_errors=True)
    kept.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
    staged = {
        d.split("=", 1)[1]
        for d in os.listdir(tmp)
        if d.startswith(f"{partition_col}=")
    }
    after = spark.read.parquet(tmp).count() if staged else 0
    empty = spark.createDataFrame([], kept.drop(partition_col).schema)
    dirnames = []
    for p in touched:
        d = f"{partition_col}={p}"
        dirnames.append(d)
        if str(p) not in staged:
            empty.write.mode("overwrite").parquet(os.path.join(tmp, d))
    _swap_partitions(table_path, tmp, dirnames)
    return int(after)


def recover_staged_swap(table_path: str) -> dict:
    """Roll BACK an interrupted ``_swap_partitions``: restore every old
    partition dir still parked in the trash (the old generation is
    authoritative — a staged dir that already renamed into place is
    displaced back out), then drop the trash and staging dirs, leaving the
    table at the pre-swap generation. The caller replays the interrupted
    batch, whose re-merge recreates the new generation idempotently.

    Journal-driven and idempotent: the swap writes ``_journal.json`` before
    the first rename, so recovery knows exactly which partitions were in
    flight; with no journal present this is a no-op cleanup. If the crash
    landed after the last rename but before trash cleanup, rollback restores
    a fully-swapped table to the OLD generation — still correct, because the
    batch's checkpoint had not committed (write_batch had not returned), so
    the stream replays it. Returns {"restored": [dirnames]}.
    """
    trash = os.path.join(table_path, TRASH_DIR)
    tmp = os.path.join(table_path, STAGE_DIR)
    journal = os.path.join(trash, "_journal.json")
    restored: list[str] = []
    if os.path.exists(journal):
        with open(journal) as fh:
            partitions = json.load(fh)["partitions"]
        for d in partitions:
            parked = os.path.join(trash, d)
            if os.path.exists(parked):
                final = os.path.join(table_path, d)
                if os.path.exists(final):
                    shutil.rmtree(final)
                os.rename(parked, final)
                restored.append(d)
    shutil.rmtree(trash, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    return {"restored": restored}


def staged_table_rewrite(kept: DataFrame, table_path: str) -> int:
    """Whole-table variant (for unpartitioned tables, e.g. the sign-code
    table): stage the full rewrite next to the table, then swap the table
    directory itself. Returns the post-rewrite row count."""
    parent = os.path.dirname(table_path.rstrip("/"))
    name = os.path.basename(table_path.rstrip("/"))
    tmp = os.path.join(parent, f"_stage_{name}")
    trash = os.path.join(parent, f"_trash_{name}")
    shutil.rmtree(tmp, ignore_errors=True)
    kept.write.mode("overwrite").parquet(tmp)
    after = kept.sparkSession.read.parquet(tmp).count()
    shutil.rmtree(trash, ignore_errors=True)
    os.rename(table_path, trash)
    os.rename(tmp, table_path)
    shutil.rmtree(trash, ignore_errors=True)
    return int(after)
