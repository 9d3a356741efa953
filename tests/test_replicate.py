"""Lake→lake replication via change-feed subscription: the downstream lake
must be bit-equal to the upstream across partition counts, merge modes,
incremental catch-up, and schema evolution."""

from __future__ import annotations

import glob

from sonic_etl_ray.generator import StreamSpec, generate_stream
from sonic_etl_ray.oracle import assert_state_equal, oracle_final_state
from sonic_etl_ray.pipelines.ingest import (
    lake_final_table,
    replicate_lake,
    run_ingest,
    scratch_lake_dir,
)


def _segments(tmp_path, spec):
    seg = str(tmp_path / "segments")
    generate_stream(seg, spec)
    return sorted(glob.glob(seg + "/segment_*.parquet"))


def test_replicate_bit_equal_across_partition_counts(tmp_path):
    files = _segments(tmp_path, StreamSpec(n_events=6000, n_repos=10, seed=5, segment_size=500))
    src, dst = scratch_lake_dir("rsrc"), scratch_lake_dir("rdst")
    run_ingest(files, src, num_partitions=8, segments_per_epoch=4)
    out = replicate_lake(src, dst, num_partitions=3)
    assert out["epochs_applied"] == 3
    assert lake_final_table(dst).equals(lake_final_table(src))
    assert_state_equal(lake_final_table(dst), oracle_final_state(files))
    # idempotent re-run
    assert replicate_lake(src, dst, num_partitions=3)["epochs_applied"] == 0


def test_replicate_incremental_catchup(tmp_path):
    """Subscribe mid-stream: replicate after 2 upstream epochs, ingest 2
    more upstream, replicate again — downstream converges."""
    files = _segments(tmp_path, StreamSpec(n_events=4000, n_repos=8, seed=7, segment_size=500))
    src, dst = scratch_lake_dir("rcsrc"), scratch_lake_dir("rcdst")
    run_ingest(files[:4], src, num_partitions=4, segments_per_epoch=2)
    assert replicate_lake(src, dst, num_partitions=4)["epochs_applied"] == 2
    run_ingest(files, src, num_partitions=4, segments_per_epoch=2)
    out = replicate_lake(src, dst, num_partitions=4)
    assert out["epochs_applied"] == 2 and out["epochs_skipped"] == 2
    assert lake_final_table(dst).equals(lake_final_table(src))


def test_replicate_into_mor_destination(tmp_path):
    files = _segments(tmp_path, StreamSpec(n_events=5000, n_repos=10, seed=9, segment_size=500))
    src, dst = scratch_lake_dir("rmsrc"), scratch_lake_dir("rmdst")
    run_ingest(files, src, num_partitions=4, segments_per_epoch=5, merge_mode="mor")
    replicate_lake(src, dst, num_partitions=4, merge_mode="mor")
    assert lake_final_table(dst).equals(lake_final_table(src))
    assert glob.glob(dst + "/part=*/delta-*.parquet")


def test_replicate_schema_evolution(tmp_path):
    """Evolved columns (added mid-stream) flow through the feed payload and
    surface identically downstream."""
    files = _segments(
        tmp_path,
        StreamSpec(n_events=6000, n_repos=8, seed=11, segment_size=500, evolve_at=(2000, 4000)),
    )
    src, dst = scratch_lake_dir("resrc"), scratch_lake_dir("redst")
    run_ingest(files, src, num_partitions=4, segments_per_epoch=4)
    replicate_lake(src, dst, num_partitions=4)
    a, b = lake_final_table(src), lake_final_table(dst)
    assert "branch" in b.schema.names
    assert a.schema.names == b.schema.names
    assert a.equals(b)


def test_replicate_bootstraps_from_vacuumed_source(tmp_path):
    """A fresh replica of a source whose early history was compacted and
    vacuumed must still converge bit-equal: the replication feed runs in
    snapshot mode, so the first reconstructible epoch per partition emits
    the cut's full state (regression: the strict-feed vacuum guard made
    every feed empty and the replica came up permanently empty, while its
    manifests marked the epochs done)."""
    from sonic_etl_ray.pipelines.ingest import compact_lake_states, vacuum

    files = _segments(
        tmp_path, StreamSpec(n_events=5000, n_repos=9, seed=13, segment_size=500)
    )
    src = scratch_lake_dir("rvacsrc")
    run_ingest(
        files, src, num_partitions=4, segments_per_epoch=4, merge_mode="mor"
    )
    compact_lake_states(src)
    vacuum(src, keep_epochs=1)
    dst = scratch_lake_dir("rvacdst")
    replicate_lake(src, dst, num_partitions=3)
    assert lake_final_table(dst).equals(lake_final_table(src))
    assert_state_equal(lake_final_table(dst), oracle_final_state(files))
    # idempotent re-run
    assert replicate_lake(src, dst, num_partitions=3)["epochs_applied"] == 0


def test_replicate_vacuumed_source_with_deletes(tmp_path):
    """Snapshot-mode bootstrap must carry tombstones as deletes: a replica
    that already applied pre-vacuum epochs (incremental subscriber) must
    drop keys the source deleted in the vacuumed window."""
    import pyarrow as pa
    import ray

    from sonic_etl_ray.pipelines.ingest import (
        apply_epoch, compact_lake_states, vacuum,
    )

    def events(rows):
        lsn, op, repo, path, content = map(list, zip(*rows))
        return ray.data.from_arrow(pa.table({
            "lsn": pa.array(lsn, pa.int64()),
            "op": pa.array(op, pa.string()),
            "repo": pa.array(repo, pa.string()),
            "path": pa.array(path, pa.string()),
            "commit": pa.array([f"c{n}" for n in lsn], pa.string()),
            "lang": pa.array(["py"] * len(lsn), pa.string()),
            "content": content,
        }))

    src, dst = scratch_lake_dir("rvdsrc"), scratch_lake_dir("rvddst")
    apply_epoch(events([(1, "insert", "rA", "a.py", "alpha"),
                        (2, "insert", "rA", "b.py", "beta")]),
                src, epoch=0, num_partitions=2, merge_mode="mor")
    replicate_lake(src, dst, num_partitions=2)  # subscriber is caught up
    apply_epoch(events([(3, "delete", "rA", "b.py", None),
                        (4, "insert", "rA", "c.py", "charlie")]),
                src, epoch=1, num_partitions=2, merge_mode="mor")
    compact_lake_states(src)
    vacuum(src, keep_epochs=1)
    replicate_lake(src, dst, num_partitions=2)
    assert lake_final_table(dst).equals(lake_final_table(src))
    assert "b.py" not in lake_final_table(dst)["path"].to_pylist()


def _diff_df(d):
    import pandas as pd

    df = d.to_pandas()
    return df.sort_values(["repo", "path"]).reset_index(drop=True)


def test_diff_lakes_replica_verification(tmp_path):
    """A faithful replica diffs empty against its source (the operational
    use: verify replication), on BOTH execution shapes — same partition
    count (zero-shuffle zip) and mismatched counts (rehash path)."""
    from sonic_etl_ray.pipelines.ingest import diff_lakes

    files = _segments(
        tmp_path, StreamSpec(n_events=6000, n_repos=10, seed=31, segment_size=500)
    )
    src = scratch_lake_dir("dlsrc")
    run_ingest(files, src, num_partitions=6, segments_per_epoch=4)
    same_p, other_p = scratch_lake_dir("dlsame"), scratch_lake_dir("dlother")
    replicate_lake(src, same_p, num_partitions=6)
    replicate_lake(src, other_p, num_partitions=4)
    assert diff_lakes(src, same_p).count() == 0  # fast path
    assert diff_lakes(src, other_p).count() == 0  # rehash path
    assert diff_lakes(other_p, src).count() == 0  # rehash, A the smaller side


def test_diff_lakes_statuses_and_path_equivalence(tmp_path):
    """only_a / only_b / differs all surface, the two execution shapes agree
    row-for-row, and as_of pins make a lagging replica diff empty."""
    import pyarrow.parquet as pq

    from sonic_etl_ray.pipelines.ingest import diff_lakes

    files = _segments(
        tmp_path, StreamSpec(n_events=8000, n_repos=12, seed=32, segment_size=500)
    )
    full_6, full_4 = scratch_lake_dir("dlf6"), scratch_lake_dir("dlf4")
    run_ingest(files, full_6, num_partitions=6, segments_per_epoch=4)
    run_ingest(files, full_4, num_partitions=4, segments_per_epoch=4)
    half_6, half_4 = scratch_lake_dir("dlh6"), scratch_lake_dir("dlh4")
    run_ingest(files[: len(files) // 2], half_6, num_partitions=6,
               segments_per_epoch=4)
    run_ingest(files[: len(files) // 2], half_4, num_partitions=4,
               segments_per_epoch=4)

    fast = _diff_df(diff_lakes(full_6, half_6))
    rehash = _diff_df(diff_lakes(full_6, half_4))
    assert fast.equals(rehash)
    assert set(fast["status"]) >= {"only_a", "differs"}

    # brute-force oracle over the final tables
    a = lake_final_table(full_6).to_pandas()[["repo", "path", "content_sha256"]]
    b = lake_final_table(half_6).to_pandas()[["repo", "path", "content_sha256"]]
    m = a.merge(b, on=["repo", "path"], how="outer", suffixes=("_a", "_b"))
    only_a = m["content_sha256_b"].isna() & m["content_sha256_a"].notna()
    only_b = m["content_sha256_a"].isna() & m["content_sha256_b"].notna()
    differs = (
        m["content_sha256_a"].notna() & m["content_sha256_b"].notna()
        & (m["content_sha256_a"] != m["content_sha256_b"])
    )
    want = m[only_a | only_b | differs].copy()
    assert len(fast) == len(want)
    got_counts = fast["status"].value_counts().to_dict()
    assert got_counts.get("only_a", 0) == int(only_a.sum())
    assert got_counts.get("only_b", 0) == int(only_b.sum())
    assert got_counts.get("differs", 0) == int(differs.sum())

    # lag-tolerant verification: pin A to the epoch the half-replica last saw
    n_half_epochs = (len(files) // 2 + 3) // 4
    lagged = diff_lakes(full_6, half_6, as_of_a=n_half_epochs - 1)
    assert lagged.count() == 0


def test_diff_lakes_empty_side_and_parallel_shape(tmp_path):
    """An empty/nonexistent A side short-circuits to all-only_b (no modulus
    to hash into); the same-P path schedules one block per partition."""
    from sonic_etl_ray.pipelines.ingest import _per_part_dataset, diff_lakes

    files = _segments(
        tmp_path, StreamSpec(n_events=2000, n_repos=5, seed=33, segment_size=500)
    )
    b = scratch_lake_dir("dlonlyb")
    run_ingest(files, b, num_partitions=4, segments_per_epoch=4)
    d = _diff_df(diff_lakes(scratch_lake_dir("dlnone"), b))
    assert (d["status"] == "only_b").all()
    assert len(d) == lake_final_table(b).num_rows
    assert d["a_lsn"].isna().all() and d["b_lsn"].notna().all()
    assert _per_part_dataset(list(range(6))).materialize().num_blocks() == 6
