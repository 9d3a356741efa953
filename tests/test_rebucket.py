"""Partition-count migration (rebucket_lake) — state-preserving and resumable."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from sonic_etl_ray.generator import StreamSpec, generate_stream
from sonic_etl_ray.oracle import assert_state_equal
from sonic_etl_ray.pipelines.ingest import (
    lake_final_table,
    lake_state_files,
    rebucket_lake,
    run_ingest,
    scratch_lake_dir,
)


def _make_lake(tmp_path, **spec_kwargs):
    seg_dir = str(tmp_path / "segments")
    files = generate_stream(
        seg_dir, StreamSpec(n_events=2_000, n_repos=8, seed=13, segment_size=500, **spec_kwargs)
    )
    lake = scratch_lake_dir("rb_src")
    run_ingest(files, lake, num_partitions=8, segments_per_epoch=2)
    return lake


def test_rebucket_preserves_state_and_tombstones(tmp_path):
    src = _make_lake(tmp_path, p_insert=0.6, p_update=0.25)  # p_delete = 0.15
    dst = scratch_lake_dir("rb_dst")
    out = rebucket_lake(src, dst, num_partitions=3)
    assert out["partitions"] <= 3
    assert_state_equal(lake_final_table(dst), lake_final_table(src))
    # physical part=N dirs must never hive-leak into the logical schema
    from sonic_etl_ray.pipelines.ingest import read_lake

    assert "part" not in read_lake(dst).schema().names
    # tombstones must survive the migration (resurrect protection): physical
    # deleted rows exist in the destination
    n_tomb = 0
    for f in lake_state_files(dst):
        t = pq.read_table(f, columns=["deleted"])
        n_tomb += pc.sum(pc.cast(t["deleted"], pa.int64())).as_py() or 0
    assert n_tomb > 0


def test_rebucket_grow_and_evolved_columns(tmp_path):
    src = _make_lake(tmp_path, evolve_at=(800, 1_400))  # adds columns mid-stream
    dst = scratch_lake_dir("rb_dst2")
    rebucket_lake(src, dst, num_partitions=16)
    got, want = lake_final_table(dst), lake_final_table(src)
    assert got.schema.names == want.schema.names  # evolved column rode along
    assert_state_equal(got, want)


def test_rebucket_idempotent_rerun(tmp_path):
    src = _make_lake(tmp_path)
    dst = scratch_lake_dir("rb_dst3")
    rebucket_lake(src, dst, num_partitions=4)
    rebucket_lake(src, dst, num_partitions=4)  # commit gates make this a no-op
    assert_state_equal(lake_final_table(dst), lake_final_table(src))
