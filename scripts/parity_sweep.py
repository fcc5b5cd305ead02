"""Run every registered query against its DuckDB oracle at an arbitrary
scale factor — the same comparison the driver's CORRECTNESS gate runs
(row count + column names + sorted-column, order-insensitive values).

Usage: python scripts/parity_sweep.py [sf_dir] [query ...]
Defaults to /root/testdata/sf0.01 (driver scale) and all queries.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# worker-side import path for mapInPandas/applyInPandas query functions
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from k8s_vectordb_sync_spark.session import build_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = sys.argv[2:] or sorted(oracles)

    spark = build_spark(app_name="parity-sweep")
    con = duckdb.connect()
    # Co-residence discipline: DuckDB's default memory_limit is 80% of RAM,
    # sized as if it owned the machine — next to the Spark JVM a big oracle
    # (the sf1 semantic CTE chains) dies on malloc instead of spilling,
    # because an in-memory connection has no temp_directory to spill to.
    # Cap the budget and give it a spill dir so oracle size costs time,
    # never a false ERROR in the parity log. The cap scales down on small
    # hosts (40% of physical RAM) so Spark JVM + DuckDB never overcommit;
    # PARITY_DUCKDB_MEM overrides for manual tuning.
    mem_cap = os.environ.get("PARITY_DUCKDB_MEM")
    if not mem_cap:
        try:
            page = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
            mem_cap = f"{max(1, min(24, int(page * 0.4 / 2**30)))}GB"
        except (ValueError, OSError):
            mem_cap = "24GB"
    con.execute(f"SET memory_limit='{mem_cap}'")
    con.execute("SET temp_directory='/tmp/duckdb-parity-spill'")
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):  # Spark-written directory table (bench_data/sf1+)
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    # multimodal_segments parity rests on the corpus being pure ASCII (the
    # oracle slices VARCHAR char-addressed, Spark slices BINARY bytes; this
    # DuckDB has no BLOB substring). Fail loudly if a testdata regeneration
    # breaks that assumption (see test_documents_corpus_is_ascii).
    (n_non_ascii,) = con.execute(
        "SELECT COUNT(*) FROM documents WHERE strlen(text) <> length(text)"
    ).fetchone()
    if n_non_ascii:
        print(
            f"WARNING: {n_non_ascii} non-ASCII documents — multimodal_segments "
            "byte/char slicing diverges; its parity result is not trustworthy",
            flush=True,
        )

    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            problems = []
            if sorted(scols) != sorted(dcols):
                problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
            if len(srows) != len(drows):
                problems.append(f"rows {len(srows)} vs {len(drows)}")
            if not problems:
                sn = _normalize(srows, scols)
                dn = _normalize(drows, dcols)
                bad = [(a, b) for a, b in zip(sn, dn) if a != b]
                if bad:
                    problems.append(f"values {bad[:2]}")
            status = "OK" if not problems else "FAIL " + "; ".join(problems)
        except Exception as exc:  # noqa: BLE001
            status = f"ERROR {type(exc).__name__}: {exc}"[:400]
            problems = [status]
        dt = time.time() - t0
        print(f"{name:40s} {dt:6.1f}s {status}", flush=True)
        if problems:
            failures.append(name)
        # dedup/similarity queries persist() shared frames (caller-owned
        # lifecycle); drop them so a full-registry sweep doesn't accumulate
        # every query's cache for the whole session
        spark.catalog.clearCache()

    print(f"\n{len(names) - len(failures)}/{len(names)} green", flush=True)
    if failures:
        print("failing:", " ".join(failures), flush=True)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
