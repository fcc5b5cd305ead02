"""Mini-t2: run every registered query against its DuckDB oracle at sf0.001,
replicating the driver's comparison (row count + column names + sorted-column,
order-insensitive value comparison). Catches parity bugs before the driver does.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


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


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    res = con.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} (spark) vs {len(drows)} (duckdb)"
    )
    sn = _normalize(srows, scols)
    dn = _normalize(drows, dcols)
    mismatches = [
        (a, b) for a, b in zip(sn, dn) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_all_queries_have_entries():
    # every registered query has a full DuckDB oracle (no rows-only residue)
    rows_only = set(QUERIES) - set(ORACLES)
    assert rows_only == set(), rows_only


def test_documents_corpus_is_ascii(sf_dir):
    """The multimodal_segments oracle slices VARCHAR char-addressed while the
    Spark side slices BINARY byte-addressed; parity holds only while the
    corpus is pure ASCII (this DuckDB build has no BLOB substring to
    byte-address the oracle). Testdata generations have changed shape before
    (events.ts physical type), so a non-ASCII regeneration must fail HERE,
    loudly, instead of silently hash-mismatching that one query."""
    con = duckdb.connect()
    (n_non_ascii,) = con.execute(
        f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet' "
        "WHERE strlen(text) <> length(text)"
    ).fetchone()
    assert n_non_ascii == 0, (
        f"{n_non_ascii} non-ASCII documents: byte- vs char-addressed "
        "slicing diverges — byte-address the multimodal_segments oracle "
        "(BLOB substring) before trusting its parity"
    )


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
