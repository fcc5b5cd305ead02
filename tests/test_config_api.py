"""Config + ops API tests — translations of internal/config/config_test.go and
internal/api/server_test.go (SURVEY §5 tier 1)."""

from __future__ import annotations

from k8s_vectordb_sync_spark.api import pipeline_counts, trigger_resync
from k8s_vectordb_sync_spark.config import EngineConfig
from k8s_vectordb_sync_spark.schemas import DEFAULT_EXCLUDED_RESOURCE_TYPES


def test_config_defaults():
    # config_test.go: defaults (config.go:44-57)
    cfg = EngineConfig.from_env({})
    assert cfg.debounce_window_ms == 10_000
    assert cfg.batch_flush_interval_ms == 5_000
    assert cfg.batch_max_size == 50
    assert cfg.resync_interval_min == 1_440
    assert cfg.watch_resource_types == ()
    assert cfg.exclude_resource_types == tuple(DEFAULT_EXCLUDED_RESOURCE_TYPES)
    assert not cfg.crd_pipeline_enabled


def test_config_env_overrides():
    cfg = EngineConfig.from_env(
        {
            "INSTANCES_ENDPOINT": "http://x/instances",
            "CAPABILITIES_ENDPOINT": "http://x/capabilities",
            "DEBOUNCE_WINDOW_MS": "250",
            "BATCH_MAX_SIZE": "7",
            "WATCH_RESOURCE_TYPES": " Pods , DEPLOYMENTS ,",
        }
    )
    assert cfg.debounce_window_ms == 250
    assert cfg.batch_max_size == 7
    # CSV parsing: trim + lowercase + drop empties (config.go:75-99)
    assert cfg.watch_resource_types == ("pods", "deployments")
    assert cfg.crd_pipeline_enabled


def test_config_invalid_int_falls_back():
    # config.go:59-73: unparseable -> default
    cfg = EngineConfig.from_env({"DEBOUNCE_WINDOW_MS": "not-a-number"})
    assert cfg.debounce_window_ms == 10_000


def test_trigger_resync_counts_and_merge(spark):
    # server_test.go:24-122 response contract + merge semantics
    target = spark.createDataFrame(
        [("a", 1), ("b", 1), ("stale", 1)], "id string, v int"
    )
    snapshot = spark.createDataFrame(
        [("a", 2), ("c", 2)], "id string, v int"
    )
    merged, result = trigger_resync(snapshot, target)
    assert result.status == "completed"
    assert result.resources == 2
    assert "2 resources" in result.message and "2 stale removed" in result.message
    state = {r["id"]: r["v"] for r in merged.collect()}
    assert state == {"a": 2, "c": 2}  # updated, inserted; stale+b removed


def test_pipeline_counts(spark):
    df = spark.createDataFrame(
        [("upsert",), ("upsert",), ("delete",)], "op string"
    )
    assert pipeline_counts(df) == {"upserts": 2, "deletes": 1, "total": 3}


def test_cli_bench_queries_lists_registry():
    # __main__.py contract: machine-readable registry listing (no Spark session)
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "k8s_vectordb_sync_spark", "bench-queries"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    data = json.loads(out.stdout.strip().splitlines()[-1])
    assert len(data["queries"]) >= 49
    assert set(data["with_oracle"]) <= set(data["queries"])


def test_cli_resync_does_not_resurrect_deleted_keys(tmp_path):
    # regression: the resync snapshot must exclude keys whose LATEST event is
    # a DELETE — resync heals drift, it must not undo deletions
    import subprocess
    import sys

    import duckdb

    events_dir = tmp_path / "sf"
    events_dir.mkdir()
    duckdb.sql(
        """COPY (SELECT * FROM (VALUES
             (1, TIMESTAMP '2024-01-01 00:00:00', 3, 'signup', 1.0, '{}'),
             (2, TIMESTAMP '2024-01-01 00:01:00', 3, 'error', 0.0, '{}'),
             (3, TIMESTAMP '2024-01-01 00:00:00', 4, 'signup', 2.0, '{}')
           ) t(event_id, ts, user_id, event_type, value, props))
           TO '%s' (FORMAT PARQUET)"""
        % (events_dir / "events.parquet")
    )
    target = tmp_path / "target"
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "k8s_vectordb_sync_spark",
            "resync",
            "--events-dir",
            str(events_dir),
            "--target",
            str(target),
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    ids = {
        r[0]
        for r in duckdb.sql(
            f"SELECT id FROM '{target}.resynced/*.parquet'"
        ).fetchall()
    }
    assert ids == {"user/4"}  # user/3's latest event is a DELETE


def test_bench_queries_all_registered():
    """Every name bench.py times must exist in the registry — a typo would
    crash the driver's per-round bench run, which is a silent round-killer."""
    import bench

    from k8s_vectordb_sync_spark.queries import ORACLES, QUERIES

    missing = [q for q in bench.BENCH_QUERIES if q not in QUERIES]
    assert missing == []
    # bench names are unique (no double-timed queries skewing the total)
    assert len(bench.BENCH_QUERIES) == len(set(bench.BENCH_QUERIES))
    # and the registry invariant: every query has an oracle
    assert set(QUERIES) == set(ORACLES)


def test_cli_tune_emits_sweep_json_lines():
    """`tune lsh-bands` prints one JSON line per banding configuration with
    the S-curve fields; `tune ivf-nprobe` one per probe count with the
    full-scan row anchored at recall 1.0."""
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "k8s_vectordb_sync_spark", "tune", "lsh-bands",
         "--sf-dir", "/root/testdata/sf0.001"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    rows = [json.loads(ln) for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    assert [r["rows_per_band"] for r in rows] == [1, 2, 4, 8]
    assert all({"n_bands", "n_candidates", "n_true_pairs", "precision", "t50"} <= set(r) for r in rows)

    out = subprocess.run(
        [sys.executable, "-m", "k8s_vectordb_sync_spark", "tune", "ivf-nprobe",
         "--sf-dir", "/root/testdata/sf0.001"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    rows = [json.loads(ln) for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    assert [r["nprobe"] for r in rows] == [1, 2, 4, 8]
    assert rows[-1]["mean_recall"] == 1.0 and rows[-1]["scan_frac"] == 1.0


def test_cli_tune_semantic_cap_emits_sweep_and_choice():
    """`tune semantic-cap` prints one JSON line per swept cap plus a final
    chosen_cap line that agrees with choose_semantic_cap's documented rule
    (largest swept cap within the linear pair-volume budget)."""
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "k8s_vectordb_sync_spark", "tune", "semantic-cap",
         "--sf-dir", "/root/testdata/sf0.001", "--caps", "5,20,80",
         "--pairs-budget", "8.0"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    rows = [json.loads(ln) for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    sweep, choice = rows[:-1], rows[-1]
    assert [r["cap"] for r in sweep] == [5, 20, 80]
    assert all(
        {"clusters_kept", "rows_kept", "candidate_pairs", "overflow_rows"} <= set(r)
        for r in sweep
    )
    total = sweep[0]["rows_kept"] + sweep[0]["overflow_rows"]
    fitting = [r["cap"] for r in sweep if r["candidate_pairs"] <= 8.0 * total]
    assert choice["chosen_cap"] == (max(fitting) if fitting else 5)
