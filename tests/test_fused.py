"""Fused (single-execution) ingest must be bit-equivalent to the epoch loop."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

from sonic_etl_ray.generator import StreamSpec, generate_stream
from sonic_etl_ray.oracle import assert_state_equal, oracle_final_state
from sonic_etl_ray.pipelines.ingest import (
    lake_final_table,
    repo_stats_view,
    run_ingest,
    scratch_lake_dir,
)
from sonic_etl_ray.state import commitlog as cl


def test_fused_equals_sequential_and_oracle(tmp_path):
    spec = StreamSpec(n_events=6000, n_repos=10, seed=303, segment_size=500)
    files = generate_stream(str(tmp_path / "segs"), spec)

    lake_seq = scratch_lake_dir("seq")
    run_ingest(files, lake_seq, num_partitions=4, segments_per_epoch=3)

    lake_fused = scratch_lake_dir("fused")
    stats = run_ingest(files, lake_fused, num_partitions=4, segments_per_epoch=3, fused=True)
    assert stats.get("fused") and stats["epochs_applied"] == 4

    a, b = lake_final_table(lake_fused), lake_final_table(lake_seq)
    assert_state_equal(a, b)
    assert_state_equal(a, oracle_final_state(files))
    # per-epoch manifests + commits exist exactly as in sequential mode
    assert cl.committed_epochs(lake_fused) == cl.committed_epochs(lake_seq)
    # the incremental stats view is maintained identically
    assert repo_stats_view(lake_fused).equals(repo_stats_view(lake_seq))


def test_fused_resume_skips_committed(tmp_path):
    spec = StreamSpec(n_events=4000, n_repos=6, seed=304, segment_size=500)
    files = generate_stream(str(tmp_path / "segs"), spec)
    lake = scratch_lake_dir("fusedresume")
    # first: sequential partial run (2 of 4 epochs)
    run_ingest(files[:4], lake, num_partitions=4, segments_per_epoch=2)
    # then: fused run over everything — committed epochs are excluded from
    # the fused execution entirely
    stats = run_ingest(files, lake, num_partitions=4, segments_per_epoch=2, fused=True)
    assert stats["epochs_skipped"] == 2 and stats["epochs_applied"] == 2
    assert_state_equal(lake_final_table(lake), oracle_final_state(files))


def test_fused_duplicate_delivery(tmp_path):
    spec = StreamSpec(n_events=3000, n_repos=6, seed=305, segment_size=500)
    files = generate_stream(str(tmp_path / "segs"), spec)
    lake = scratch_lake_dir("fuseddup")
    run_ingest(files + files[:3], lake, num_partitions=4, segments_per_epoch=2, fused=True)
    assert_state_equal(lake_final_table(lake), oracle_final_state(files))


def test_fused_empty_epoch_gets_manifest(tmp_path):
    """An epoch whose segments hold zero rows must still be manifested in
    fused mode, or every later run re-plans it forever."""
    import pyarrow.parquet as pq

    spec = StreamSpec(n_events=2000, n_repos=5, seed=306, segment_size=500)
    files = generate_stream(str(tmp_path / "segs"), spec)  # segments 0..3
    empty = str(tmp_path / "segs" / "segment_000004.parquet")
    # same physical schema as real segments, zero rows — uniform schemas keep
    # the fused path engaged
    pq.write_table(pq.read_schema(files[0]).empty_table(), empty)
    allfiles = files + [empty]

    lake = scratch_lake_dir("fusedempty")
    s1 = run_ingest(allfiles, lake, num_partitions=2, segments_per_epoch=2, fused=True)
    assert s1.get("fused") and s1["epochs_applied"] == 3  # incl. the empty epoch
    assert len(cl.committed_epochs(lake)) == 3
    s2 = run_ingest(allfiles, lake, num_partitions=2, segments_per_epoch=2, fused=True)
    assert s2["epochs_applied"] == 0 and s2["epochs_skipped"] == 3
    assert_state_equal(lake_final_table(lake), oracle_final_state(files))


def test_fused_manifests_carry_per_epoch_frontier(tmp_path):
    """Time travel into a fused batch must match the sequential twin: the
    rolling frontier cursor is seeded BEFORE the batch commits anything, so
    epoch 0's manifest snapshots the pre-batch frontier + its own commits,
    not the end-of-batch state (regression: a fresh lake's first fused run
    stamped every manifest with the final frontier and as_of epoch 0 read
    the whole batch)."""
    from sonic_etl_ray.pipelines.ingest import read_lake

    spec = StreamSpec(n_events=4000, n_repos=8, seed=55, segment_size=500)
    files = generate_stream(str(tmp_path / "segs"), spec)
    fused, seq = scratch_lake_dir("fusedtt"), scratch_lake_dir("seqtt")
    run_ingest(files, fused, num_partitions=4, segments_per_epoch=2, fused=True)
    run_ingest(files, seq, num_partitions=4, segments_per_epoch=2)
    for e in (0, 1):
        want = lake_final_table(seq, as_of_epoch=e)
        assert lake_final_table(fused, as_of_epoch=e).equals(want)
        got = pa.concat_tables(
            [ray.get(r) for r in read_lake(fused, as_of_epoch=e).to_arrow_refs()]
        )
        got = got.take(
            pc.sort_indices(got, sort_keys=[("repo", "ascending"), ("path", "ascending")])
        )
        assert got.num_rows == want.num_rows  # final tables are live rows
    assert lake_final_table(fused).equals(lake_final_table(seq))
