"""Registry-wide degenerate-input gate (VERDICT r6 item 1).

Every registered query AND its DuckDB oracle runs against two adversarial
fixtures (tests/degenerate_data.py):

- ``degenerate``: single-day/single-hour series, zero-variance columns,
  single-row and empty groups, empty/whitespace documents, exact-duplicate
  documents/vectors, a zero-norm embedding, hash-samples that keep nothing.
- ``empty``: every table present with zero rows.
- ``skewed`` (round 8): Zipf-keyed — one key holds ~30% of the rows in
  every fact table, the hot-key regime the skew toolkit targets.

The assertion is the driver's own comparison — no exception on either
engine, identical column names, row counts, and normalized values. This
freezes the r5 OLS-crash class (single-day series -> ANSI DIVIDE_BY_ZERO)
into CI for the WHOLE registry, the way test_plan_lint froze the plan
audits: a new query with an unguarded ratio/log/sqrt/variance denominator
fails here automatically.
"""

from __future__ import annotations

import os

import duckdb
import pytest

# Heavy tier: 3 fixtures x 207 queries x (Spark + DuckDB) is the bulk of the
# suite's wall time. The bug classes frozen here regress only when a query's
# GUARDS change; the default tier still runs every query against the
# real-data oracle (test_oracle_parity), so this sweep runs in the builder's
# idle full-suite pass (KVS_HEAVY_TESTS=1, log committed to bench_logs/).
pytestmark = pytest.mark.heavy

import __spark_entry__ as entry_mod
from degenerate_data import write_degenerate, write_empty, write_skewed
from test_oracle_parity import TABLES, _normalize

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="session")
def degenerate_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("degenerate-sf"))
    write_degenerate(d)
    return d


@pytest.fixture(scope="session")
def empty_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty-sf"))
    write_empty(d)
    return d


@pytest.fixture(scope="session")
def skewed_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("skewed-sf"))
    write_skewed(d)
    return d


def _check(spark, sf_dir: str, name: str) -> None:
    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    res = con.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} (spark) vs {len(drows)} (duckdb)"
    )
    sn = _normalize(srows, scols)
    dn = _normalize(drows, dcols)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_degenerate_corpus_parity(spark, degenerate_dir, name):
    _check(spark, degenerate_dir, name)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_empty_corpus_parity(spark, empty_dir, name):
    _check(spark, empty_dir, name)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_skewed_corpus_parity(spark, skewed_dir, name):
    """VERDICT r7 item 3: the Zipf-keyed fixture (one key = ~30% of rows in
    every fact table) joins the gate — every registered query must stay
    correct when its groupBy/join key distribution is maximally lopsided,
    the regime AQE skew splitting and the manual salting toolkit target."""
    _check(spark, skewed_dir, name)
