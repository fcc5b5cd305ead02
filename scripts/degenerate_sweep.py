"""Run every registered query + its DuckDB oracle against the adversarial
degenerate fixtures (tests/degenerate_data.py) and report crashes and parity
mismatches — the iteration loop behind tests/test_degenerate_inputs.py.

Usage: python scripts/degenerate_sweep.py [degenerate|empty|skewed|all] [name-substr]
"""

from __future__ import annotations

import os
import sys
import tempfile
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from degenerate_data import write_degenerate, write_empty, write_skewed  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(rows, cols):
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
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "both":  # pre-r8 spelling: the two original fixtures
        which = "degenerate,empty"
    if which == "all":
        which = "degenerate,empty,skewed"
    substr = sys.argv[2] if len(sys.argv) > 2 else ""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    fixtures = []
    root = tempfile.mkdtemp(prefix="degen-")
    writers = {
        "degenerate": write_degenerate,
        "empty": write_empty,
        "skewed": write_skewed,
    }
    for label in which.split(","):
        d = os.path.join(root, label)
        os.makedirs(d)
        writers[label](d)
        fixtures.append((label, d))

    failures = []
    for label, sf in fixtures:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        for name in sorted(oracles):
            if substr and substr not in name:
                continue
            status = "ok"
            detail = ""
            try:
                sdf = queries[name](spark, sf)
                scols = sdf.columns
                srows = [tuple(r) for r in sdf.collect()]
            except Exception as e:
                status, detail = "SPARK_CRASH", repr(e)[:300]
                failures.append((label, name, status, detail))
                print(f"[{label}] {status:12s} {name}: {detail}")
                continue
            try:
                res = con.execute(oracles[name])
                dcols = [d0[0] for d0 in res.description]
                drows = res.fetchall()
            except Exception as e:
                status, detail = "ORACLE_CRASH", repr(e)[:300]
                failures.append((label, name, status, detail))
                print(f"[{label}] {status:12s} {name}: {detail}")
                continue
            if sorted(scols) != sorted(dcols):
                status, detail = "COLS", f"{sorted(scols)} vs {sorted(dcols)}"
            elif len(srows) != len(drows):
                status, detail = "ROWS", f"{len(srows)} vs {len(drows)}"
            else:
                sn, dn = normalize(srows, scols), normalize(drows, dcols)
                bad = [(a, b) for a, b in zip(sn, dn) if a != b]
                if bad:
                    status, detail = "VALUES", str(bad[:2])[:300]
            if status != "ok":
                failures.append((label, name, status, detail))
                print(f"[{label}] {status:12s} {name}: {detail}")
    print(f"\n{len(failures)} failures")
    for label, name, status, _ in failures:
        print(f"  {label:10s} {status:12s} {name}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
