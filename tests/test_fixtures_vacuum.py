"""Conformance-fixture walk (the reference's test-set pattern) + vacuum GC."""

from __future__ import annotations

import glob
import os

import pytest

from sonic_etl_ray.generator import StreamSpec, generate_stream
from sonic_etl_ray.oracle import assert_state_equal
from sonic_etl_ray.pipelines.ingest import (
    lake_final_table,
    run_ingest,
    scratch_lake_dir,
    vacuum,
)
from sonic_etl_ray.sources.fixtures import (
    create_test_set,
    discover_test_sets,
    load_test_set,
)

# the FIXTURES.md §4 sets (scaled to keep the suite fast)
FIXTURE_SPECS = {
    "tiny": StreamSpec(n_events=1000, n_repos=5, seed=42, segment_size=100),
    "mixed": StreamSpec(n_events=5000, n_repos=20, seed=7, segment_size=500),
    "hot": StreamSpec(n_events=5000, n_repos=50, seed=3, segment_size=500, hot_repo_frac=0.4),
}


def test_conformance_walk(tmp_path):
    """Create fixture sets, then walk and validate every one — the
    ``test.rs:243-271`` every-test-dir loop."""
    base = str(tmp_path)
    for name, spec in FIXTURE_SPECS.items():
        create_test_set(base, name, spec)
    roots = discover_test_sets(base)
    assert len(roots) == len(FIXTURE_SPECS)
    for root in roots:
        files, golden, stats = load_test_set(root)
        lake = scratch_lake_dir("conform")
        run_ingest(files, lake, num_partitions=4, segments_per_epoch=4)
        state = lake_final_table(lake)
        assert state.num_rows == stats["final_rows"]
        assert_state_equal(state, golden)
        # stats invariants: watermark + per-repo counts (row_counts.py analog)
        assert max(state.column("applied_lsn").to_pylist()) == stats["watermark"]


def test_vacuum_keeps_live_state(tmp_path):
    spec = StreamSpec(n_events=4000, n_repos=8, seed=13, segment_size=250)
    files = generate_stream(str(tmp_path / "segs"), spec)
    lake = scratch_lake_dir("vac")
    run_ingest(files, lake, num_partitions=4, segments_per_epoch=2)  # 8 epochs
    before = lake_final_table(lake)
    n_files_before = len(glob.glob(os.path.join(lake, "part=*", "state-*.parquet")))

    res = vacuum(lake, keep_epochs=1)
    assert res["removed"] > 0
    n_files_after = len(glob.glob(os.path.join(lake, "part=*", "state-*.parquet")))
    assert n_files_after == 4  # exactly one live file per partition
    assert n_files_before == n_files_after + res["removed"]

    assert_state_equal(lake_final_table(lake), before)  # live state unchanged

    with pytest.raises(ValueError):
        vacuum(lake, keep_epochs=0)
