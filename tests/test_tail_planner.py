"""Tailer (micro-batch streaming) and work-planner tests."""

from __future__ import annotations

import glob

from sonic_etl_ray.generator import StreamSpec, generate_events, write_segments
from sonic_etl_ray.oracle import assert_state_equal, oracle_final_state
from sonic_etl_ray.pipelines.ingest import lake_final_table, scratch_lake_dir
from sonic_etl_ray.pipelines.tail import Tailer, set_watermark_override
from sonic_etl_ray.sources.planner import (
    IngestRequest,
    chunk_range,
    compress_to_ranges,
    discover_segments,
    read_lsn_list_csv,
)


def test_chunk_range():
    got = chunk_range(0, 2500, 1000)
    assert [(r.start, r.end) for r in got] == [(0, 999), (1000, 1999), (2000, 2500)]
    assert chunk_range(5, 4) == []
    assert got[0].include_state  # default all-on flags (SimpleRequest analog)


def test_compress_to_ranges():
    assert compress_to_ranges([5, 1, 2, 3, 9]) == [(1, 3), (5, 5), (9, 9)]


def test_read_lsn_list_csv(tmp_path):
    p = tmp_path / "lsns.csv"
    p.write_text("block_number\n5\n7\n\n9\n")
    assert read_lsn_list_csv(str(p)) == [5, 7, 9]
    p2 = tmp_path / "noheader.csv"
    p2.write_text("1\n2\n")
    assert read_lsn_list_csv(str(p2)) == [1, 2]


def test_tailer_incremental_and_resume(tmp_path):
    """Segments appear over time; the tailer applies only complete epochs,
    picks up new ones on later ticks, and a second tailer resumes without
    re-applying (idempotence via the commit log)."""
    spec = StreamSpec(n_events=4000, n_repos=8, seed=23, segment_size=500)
    table = generate_events(spec)
    seg_dir = str(tmp_path / "segs")
    hidden = str(tmp_path / "hidden")
    all_files = write_segments(table, hidden, spec)

    import os
    import shutil

    os.makedirs(seg_dir)
    # first 4 of 8 segments are visible
    for f in all_files[:4]:
        shutil.copy(f, seg_dir)

    lake = scratch_lake_dir("tail")
    tailer = Tailer(seg_dir, lake, num_partitions=4, segments_per_epoch=2)
    r1 = tailer.tick()
    assert r1["epochs_applied"] == 2 and r1["head_segment"] == 3

    for f in all_files[4:]:
        shutil.copy(f, seg_dir)
    r2 = tailer.tick()
    assert r2["epochs_applied"] == 2 and r2["epochs_skipped"] == 2

    # a fresh tailer (restart) skips everything already committed
    r3 = Tailer(seg_dir, lake, num_partitions=4, segments_per_epoch=2).tick()
    assert r3["epochs_applied"] == 0 and r3["epochs_skipped"] == 4

    assert_state_equal(lake_final_table(lake), oracle_final_state(all_files))


def test_tailer_self_compacts_commit_log(tmp_path):
    """compact_every rolls the commit log into the checkpoint as the tail
    advances; a restarted tailer resumes from the checkpoint alone."""
    import glob
    import os

    spec = StreamSpec(n_events=4000, n_repos=8, seed=23, segment_size=500)
    table = generate_events(spec)
    seg_dir = str(tmp_path / "segs")
    write_segments(table, seg_dir, spec)
    lake = scratch_lake_dir("tailcc")
    t = Tailer(seg_dir, lake, num_partitions=4, segments_per_epoch=2, compact_every=2)
    t.tick()
    assert glob.glob(os.path.join(lake, "_commits", "epoch=*")) == []  # all rolled up
    r = Tailer(seg_dir, lake, num_partitions=4, segments_per_epoch=2).tick()
    assert r["epochs_applied"] == 0 and r["epochs_skipped"] == 4
    assert_state_equal(
        lake_final_table(lake), oracle_final_state(sorted(glob.glob(seg_dir + "/*.parquet")))
    )


def test_watermark_override(tmp_path):
    """manual_set analog: overriding the watermark skips early epochs."""
    spec = StreamSpec(n_events=2000, n_repos=5, seed=31, segment_size=500)
    seg_dir = str(tmp_path / "segs")
    write_segments(generate_events(spec), seg_dir, spec)
    lake = scratch_lake_dir("override")
    set_watermark_override(lake, 1)  # epoch 0 marked done without running
    r = Tailer(seg_dir, lake, num_partitions=2, segments_per_epoch=2).tick()
    assert r["epochs_skipped"] == 1 and r["epochs_applied"] == 1
    # only events from segments 2-3 were applied
    state = lake_final_table(lake)
    assert state.num_rows > 0
    golden_late = oracle_final_state(sorted(glob.glob(seg_dir + "/*.parquet"))[2:])
    assert_state_equal(state, golden_late)
