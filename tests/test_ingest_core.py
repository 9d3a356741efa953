"""End-to-end CDC ingest correctness vs the DuckDB oracle.

Mirrors the reference's conformance-corpus strategy
(``/root/reference/extractor_transformer/tests/README.md:1-8``,
``src/sonic_config/test.rs:174-221``): deterministic inputs, golden
post-replay table state, exact comparison — plus the per-row sha256
invariant from BASELINE.json.
"""

from __future__ import annotations

import glob

import pytest

from sonic_etl_ray.generator import StreamSpec, generate_stream
from sonic_etl_ray.oracle import assert_state_equal, oracle_final_state
from sonic_etl_ray.pipelines.ingest import (
    lake_final_table,
    run_ingest,
    scratch_lake_dir,
)


def _roundtrip(tmp_path, spec: StreamSpec, ingest_kwargs=None, replay_segments=0):
    seg_dir = str(tmp_path / "segments")
    files = generate_stream(seg_dir, spec)
    lake = scratch_lake_dir("test")
    inputs = files + files[:replay_segments]  # duplicate delivery simulation
    run_ingest(inputs, lake, **(ingest_kwargs or {}))
    return lake_final_table(lake), oracle_final_state(files)


def test_tiny_insert_only(tmp_path):
    spec = StreamSpec(n_events=300, n_repos=5, seed=7, segment_size=100, p_insert=1.0, p_update=0.0)
    engine, golden = _roundtrip(tmp_path, spec, {"num_partitions": 4, "segments_per_epoch": 2})
    assert engine.num_rows > 0
    assert_state_equal(engine, golden)


def test_tiny_mixed_ops(tmp_path):
    spec = StreamSpec(n_events=1000, n_repos=5, seed=42, segment_size=100)
    engine, golden = _roundtrip(tmp_path, spec, {"num_partitions": 4, "segments_per_epoch": 3})
    assert_state_equal(engine, golden)


def test_mixed_multi_partition(tmp_path):
    spec = StreamSpec(n_events=10_000, n_repos=20, seed=42, segment_size=1000)
    engine, golden = _roundtrip(tmp_path, spec, {"num_partitions": 8, "segments_per_epoch": 4})
    assert_state_equal(engine, golden)


def test_duplicate_delivery_exactly_once(tmp_path):
    """Replaying whole segments (at-least-once) must not change final state."""
    spec = StreamSpec(n_events=5000, n_repos=10, seed=1, segment_size=500)
    engine, golden = _roundtrip(
        tmp_path, spec, {"num_partitions": 4, "segments_per_epoch": 3}, replay_segments=4
    )
    assert_state_equal(engine, golden)


def test_hot_repo_skew(tmp_path):
    """A repo holding ~40% of events spreads over partitions via (repo,path) keying."""
    import os

    spec = StreamSpec(n_events=20_000, n_repos=50, seed=3, segment_size=2000, hot_repo_frac=0.4)
    seg_dir = str(tmp_path / "segments")
    files = generate_stream(seg_dir, spec)
    lake = scratch_lake_dir("skew")
    run_ingest(files, lake, num_partitions=8, segments_per_epoch=20)
    state_files = glob.glob(os.path.join(lake, "part=*", "state-*.parquet"))
    parts_used = {f.split("part=")[1].split("/")[0] for f in state_files}
    assert len(parts_used) == 8, "hot repo must not collapse into few partitions"

    from sonic_etl_ray.pipelines.qc import skew_report

    rep = skew_report(lake)
    assert rep["partitions"] == 8
    assert rep["imbalance"] < 1.5, f"hot repo skew leaked into partitions: {rep}"
    assert_state_equal(lake_final_table(lake), oracle_final_state(files))


def test_resume_after_partial_run(tmp_path):
    """Kill-and-resume: run some epochs, then rerun; final state identical and
    committed epochs are not re-applied (no duplicate or lost applies)."""
    spec = StreamSpec(n_events=8000, n_repos=10, seed=5, segment_size=500)
    seg_dir = str(tmp_path / "segments")
    files = generate_stream(seg_dir, spec)

    lake = scratch_lake_dir("resume")
    # partial run: only first 6 segments (3 epochs of 2)
    run_ingest(files[:6], lake, num_partitions=4, segments_per_epoch=2)
    # resume with the full input; earlier epochs must be skipped
    stats = run_ingest(files, lake, num_partitions=4, segments_per_epoch=2)
    assert stats["epochs_skipped"] == 3
    assert stats["epochs_applied"] == stats["epochs_total"] - 3

    # compare to an uninterrupted run
    lake2 = scratch_lake_dir("resume_ref")
    run_ingest(files, lake2, num_partitions=4, segments_per_epoch=2)
    assert_state_equal(lake_final_table(lake), lake_final_table(lake2))
    assert_state_equal(lake_final_table(lake), oracle_final_state(files))


def test_schema_evolution_add_and_widen(tmp_path):
    """Later segments add size_hint:int32 (→int64) and branch:string; the sink
    unifies schemas (column add + type widen, north rule)."""
    spec = StreamSpec(n_events=6000, n_repos=10, seed=9, segment_size=500, evolve_at=(2000, 4000))
    engine, _ = _roundtrip(tmp_path, spec, {"num_partitions": 4, "segments_per_epoch": 3})
    golden = oracle_final_state(
        sorted(glob.glob(str(tmp_path / "segments" / "*.parquet"))),
        extra_columns=["size_hint", "branch"],
    )
    import pyarrow as pa

    assert engine.schema.field("size_hint").type == pa.int64()
    assert "branch" in engine.column_names
    assert_state_equal(engine, golden)


def test_generator_determinism(tmp_path):
    from sonic_etl_ray.generator import generate_events

    spec = StreamSpec(n_events=500, seed=11)
    assert generate_events(spec).equals(generate_events(spec))
