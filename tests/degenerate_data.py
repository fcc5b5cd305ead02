"""Adversarial degenerate-input fixtures (VERDICT r6 item 1).

Two synthetic sf-dirs with the exact schemas of /root/testdata/sf*:

- ``write_degenerate(dir)``: the pathological-but-nonempty corpus — single-
  day/single-hour time series, zero-variance value columns, single-row and
  empty groups, empty/whitespace/single-char documents, exact-duplicate
  documents and vectors, a zero-norm embedding, constant group keys. Every
  divide/log/sqrt/variance denominator a query can hit sits at its boundary.
- ``write_empty(dir)``: every table present, zero rows (schema-bearing
  parquet footers) — the cold-start / filtered-to-nothing case.

The registry-wide gate (test_degenerate_inputs.py) runs every registered
query AND its DuckDB oracle against both dirs: no engine may crash, and
parity must hold — freezing the r5 OLS-crash class (single-day series →
ANSI DIVIDE_BY_ZERO) into CI for all queries at once.

Timestamps are written as naive TIMESTAMP(MICROS) — the physical type the
driver's own testdata generation ships (sources.tables.load_table already
normalizes it).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64

SCHEMAS = {
    "region": pa.schema(
        [("r_regionkey", pa.int32()), ("r_name", pa.string())]
    ),
    "nation": pa.schema(
        [
            ("n_nationkey", pa.int32()),
            ("n_name", pa.string()),
            ("n_regionkey", pa.int32()),
        ]
    ),
    "customer": pa.schema(
        [
            ("c_custkey", pa.int64()),
            ("c_name", pa.string()),
            ("c_nationkey", pa.int32()),
            ("c_acctbal", pa.float64()),
            ("c_mktsegment", pa.string()),
        ]
    ),
    "supplier": pa.schema(
        [
            ("s_suppkey", pa.int64()),
            ("s_name", pa.string()),
            ("s_nationkey", pa.int32()),
            ("s_acctbal", pa.float64()),
        ]
    ),
    "part": pa.schema(
        [
            ("p_partkey", pa.int64()),
            ("p_name", pa.string()),
            ("p_brand", pa.string()),
            ("p_type", pa.string()),
            ("p_size", pa.int32()),
            ("p_retailprice", pa.float64()),
        ]
    ),
    "orders": pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderstatus", pa.string()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]
    ),
    "lineitem": pa.schema(
        [
            ("l_orderkey", pa.int64()),
            ("l_partkey", pa.int64()),
            ("l_suppkey", pa.int64()),
            ("l_linenumber", pa.int32()),
            ("l_quantity", pa.float64()),
            ("l_extendedprice", pa.float64()),
            ("l_discount", pa.float64()),
            ("l_tax", pa.float64()),
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("l_shipdate", pa.timestamp("us")),
        ]
    ),
    "events": pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    ),
    "documents": pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    ),
    "embeddings": pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    ),
}


def _write(dir_path: str, name: str, rows: list[dict]) -> None:
    schema = SCHEMAS[name]
    cols = {f.name: [r[f.name] for r in rows] for f in schema}
    pq.write_table(
        pa.Table.from_pydict(cols, schema=schema), f"{dir_path}/{name}.parquet"
    )


def _ts(day: int, hour: int, minute: int, second: int = 0):
    import datetime

    return datetime.datetime(2024, 1, day, hour, minute, second)


def write_degenerate(dir_path: str) -> None:
    import datetime

    _write(dir_path, "region", [
        {"r_regionkey": i, "r_name": n}
        for i, n in enumerate(["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])
    ])
    # two nations, BOTH in one region (cross-nation queries get a pair,
    # every other region is an empty group)
    _write(dir_path, "nation", [
        {"n_nationkey": 0, "n_name": "NATION_0", "n_regionkey": 2},
        {"n_nationkey": 1, "n_name": "NATION_1", "n_regionkey": 2},
    ])
    # constant acctbal (zero variance), constant segment; customer 2 has no
    # orders (empty group under every per-customer aggregate)
    _write(dir_path, "customer", [
        {"c_custkey": 1, "c_name": "Customer#000000001", "c_nationkey": 0,
         "c_acctbal": 100.0, "c_mktsegment": "BUILDING"},
        {"c_custkey": 2, "c_name": "Customer#000000002", "c_nationkey": 1,
         "c_acctbal": 100.0, "c_mktsegment": "BUILDING"},
    ])
    _write(dir_path, "supplier", [
        {"s_suppkey": 1, "s_name": "Supplier#000000001", "s_nationkey": 0,
         "s_acctbal": 100.0},
    ])
    _write(dir_path, "part", [
        {"p_partkey": 1, "p_name": "promo burnished copper", "p_brand": "Brand#1",
         "p_type": "PROMO", "p_size": 1, "p_retailprice": 10.0},
        {"p_partkey": 2, "p_name": "standard plated brass", "p_brand": "Brand#2",
         "p_type": "STANDARD", "p_size": 1, "p_retailprice": 10.0},
    ])
    # one customer owns EVERY order; single order date; constant price,
    # status, and priority
    d0 = datetime.datetime(1996, 3, 15)
    _write(dir_path, "orders", [
        {"o_orderkey": k, "o_custkey": 1, "o_orderstatus": "F",
         "o_totalprice": 100.0, "o_orderdate": d0, "o_orderpriority": "1-URGENT"}
        for k in range(1, 5)
    ])
    # single shipdate, constant quantity/price/discount/tax, ONE
    # (returnflag, linestatus) group; order 4 has a single lineitem
    s0 = datetime.datetime(1996, 3, 20)
    _write(dir_path, "lineitem", [
        {"l_orderkey": ok, "l_partkey": 1 + (ln % 2), "l_suppkey": 1,
         "l_linenumber": ln, "l_quantity": 10.0, "l_extendedprice": 100.0,
         "l_discount": 0.05, "l_tax": 0.0, "l_returnflag": "A",
         "l_linestatus": "F", "l_shipdate": s0}
        for ok, ln in [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (4, 1)]
    ])
    # user 1: four events inside ONE hour of ONE day, constant value (zero
    # variance; single-day OLS; single point per hour bucket); user 2: a
    # single event ever (single-row group, zero-lag autocorrelation)
    _write(dir_path, "events", [
        {"event_id": 1, "ts": _ts(1, 10, 0), "user_id": 1,
         "event_type": "signup", "value": 5.0, "props": '{"k": 1}'},
        {"event_id": 2, "ts": _ts(1, 10, 15), "user_id": 1,
         "event_type": "click", "value": 5.0, "props": '{"k": 1}'},
        {"event_id": 3, "ts": _ts(1, 10, 30), "user_id": 1,
         "event_type": "purchase", "value": 5.0, "props": '{"k": 1}'},
        {"event_id": 4, "ts": _ts(1, 10, 45), "user_id": 1,
         "event_type": "error", "value": 5.0, "props": '{"k": 1}'},
        {"event_id": 5, "ts": _ts(1, 10, 50), "user_id": 2,
         "event_type": "view", "value": 0.0, "props": "{}"},
    ])
    # empty text, whitespace-only, single char, exact duplicates across
    # sources, a single-type document (one Zipf rank)
    fox = "the quick brown fox jumps over the lazy dog"
    _write(dir_path, "documents", [
        {"doc_id": 1, "text": "", "lang": "en", "source": "src0", "n_chars": 0},
        {"doc_id": 2, "text": "   ", "lang": "en", "source": "src0", "n_chars": 3},
        {"doc_id": 3, "text": "a", "lang": "en", "source": "src0", "n_chars": 1},
        {"doc_id": 4, "text": fox, "lang": "en", "source": "src0",
         "n_chars": len(fox)},
        {"doc_id": 5, "text": fox, "lang": "en", "source": "src1",
         "n_chars": len(fox)},
        {"doc_id": 6, "text": "spark spark spark spark", "lang": "en",
         "source": "src1", "n_chars": 23},
    ])
    # zero-norm vector (cosine denominator 0), constant vector, an exact
    # duplicate pair; constant label; fewer points than typical n_clusters
    v3 = [round(0.1 * ((i * 7) % 13 - 6), 4) for i in range(DIM)]
    _write(dir_path, "embeddings", [
        {"vec_id": 1, "embedding": [0.0] * DIM, "label": 0},
        {"vec_id": 2, "embedding": [0.5] * DIM, "label": 0},
        {"vec_id": 3, "embedding": v3, "label": 0},
        {"vec_id": 4, "embedding": list(v3), "label": 0},
    ])


def write_empty(dir_path: str) -> None:
    for name in SCHEMAS:
        _write(dir_path, name, [])


def write_skewed(dir_path: str) -> None:
    """Zipf-keyed fixture (VERDICT r7 item 3): one key holds ~30% of the
    rows in every fact table — the hot-key regime the skew toolkit
    (operators/skew.py) exists for. customer 1 owns 30% of orders, orderkey
    1 carries 30% of lineitem rows, user 1 emits 30% of events, src_hot
    publishes half the documents, and 30% of embeddings sit in one
    near-identical pile. Deterministic arithmetic only (no RNG), sized so
    the registry-wide gate stays fast while every groupBy/join key
    distribution is maximally lopsided instead of uniform."""
    import datetime

    _write(dir_path, "region", [
        {"r_regionkey": i, "r_name": n}
        for i, n in enumerate(["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])
    ])
    _write(dir_path, "nation", [
        {"n_nationkey": i, "n_name": f"NATION_{i}", "n_regionkey": i % 5}
        for i in range(6)
    ])
    _write(dir_path, "customer", [
        {"c_custkey": c, "c_name": f"Customer#{c:09d}", "c_nationkey": c % 6,
         "c_acctbal": float(50 + (c * 37) % 900),
         "c_mktsegment": ["BUILDING", "MACHINERY", "AUTOMOBILE"][c % 3]}
        for c in range(1, 21)
    ])
    _write(dir_path, "supplier", [
        {"s_suppkey": s, "s_name": f"Supplier#{s:09d}", "s_nationkey": s % 6,
         "s_acctbal": float(100 + s * 13)}
        for s in range(1, 6)
    ])
    _write(dir_path, "part", [
        {"p_partkey": p, "p_name": f"part {p} copper", "p_brand": f"Brand#{p % 4}",
         "p_type": ["PROMO", "STANDARD", "ECONOMY"][p % 3], "p_size": 1 + p % 9,
         "p_retailprice": float(10 + p)}
        for p in range(1, 11)
    ])
    # 400 orders: custkey 1 owns the first 120 (30%), the rest spread
    # Zipf-ish over 2..20; dates walk across two months
    def custkey(k: int) -> int:
        if k <= 120:
            return 1
        return 2 + ((k * 7) % 19)

    d0 = datetime.datetime(1996, 1, 1)
    _write(dir_path, "orders", [
        {"o_orderkey": k, "o_custkey": custkey(k),
         "o_orderstatus": "OF"[k % 2],
         "o_totalprice": float(100 + (k * 31) % 5000),
         "o_orderdate": d0 + datetime.timedelta(days=k % 60),
         "o_orderpriority": f"{1 + k % 5}-P"}
        for k in range(1, 401)
    ])
    # 1000 lineitems: orderkey 1 carries the first 300 (30%); partkey 1 is
    # hot the same way; two suppliers carry most rows
    _write(dir_path, "lineitem", [
        {"l_orderkey": 1 if i <= 300 else 1 + ((i * 11) % 399),
         "l_partkey": 1 if i % 10 < 3 else 1 + ((i * 3) % 9),
         "l_suppkey": 1 + (i % 5 if i % 4 == 0 else 0),
         "l_linenumber": i, "l_quantity": float(1 + i % 50),
         "l_extendedprice": float(100 + (i * 17) % 900),
         "l_discount": round(0.01 * (i % 10), 2), "l_tax": 0.02,
         "l_returnflag": "ARN"[i % 3], "l_linestatus": "OF"[i % 2],
         "l_shipdate": d0 + datetime.timedelta(days=(i * 3) % 70)}
        for i in range(1, 1001)
    ])
    # 1200 events: user 1 emits the first 360 (30%), spread over 5 days
    types = ["view", "click", "purchase", "signup", "error"]
    _write(dir_path, "events", [
        {"event_id": i,
         "ts": _ts(1 + (i % 5), (i * 7) % 24, (i * 13) % 60, i % 60),
         "user_id": 1 if i <= 360 else 2 + ((i * 3) % 40),
         "event_type": types[i % 5],
         "value": float((i * 7) % 100) / 10.0,
         "props": '{"k": %d}' % (i % 3)}
        for i in range(1, 1201)
    ])
    # 60 documents: src_hot publishes half, including one 10x-duplicated
    # text pile (the dedup hot group); vocab skew via repeated tokens
    words = ["stream", "filter", "merge", "batch", "shard", "spill",
             "probe", "scan", "sort", "hash"]

    def text(i: int) -> str:
        if i % 6 < 3:
            return "hot shard spill " + " ".join(
                words[(i + j) % 10] for j in range(8)
            )
        return " ".join(words[(i * (j + 3)) % 10] + str((i * j) % 7) for j in range(12))

    _write(dir_path, "documents", [
        {"doc_id": i, "text": text(i) if i % 10 else "hot shard spill dup pile",
         "lang": "en" if i % 4 else "de",
         "source": "src_hot" if i % 2 == 0 else f"src{i % 5}",
         "n_chars": len(text(i))}
        for i in range(1, 61)
    ])
    # 50 embeddings: 15 near-identical (one mega-cluster / hot LSH bucket),
    # the rest spread; labels skewed 70/30
    hot = [round(0.3 + 0.001 * ((i * 5) % 7), 4) for i in range(DIM)]
    def vec(i: int) -> list:
        if i <= 15:
            return [round(v + 0.0001 * (i % 3), 4) for v in hot]
        return [round(0.1 * (((i * 7 + j * 13) % 19) - 9), 4) for j in range(DIM)]

    _write(dir_path, "embeddings", [
        {"vec_id": i, "embedding": vec(i), "label": 0 if i % 10 < 7 else 1}
        for i in range(1, 51)
    ])
