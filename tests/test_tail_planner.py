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


def test_tailer_metrics_counters_advance_and_http_surface(tmp_path):
    """ST7 observability: counters advance across ticks from commit
    records, the watermark-lag map is per-partition, and the loopback
    /metrics + /healthz endpoints serve while the tailer runs
    (reference analog: metrics/prometheus.rs + main.rs actix servers)."""
    import json
    import urllib.request

    spec = StreamSpec(n_events=2000, n_repos=8, seed=31, segment_size=500)
    table = generate_events(spec)
    seg_dir = str(tmp_path / "segs")
    write_segments(table, seg_dir, spec)

    lake = scratch_lake_dir("tailmetrics")
    tailer = Tailer(seg_dir, lake, num_partitions=4, segments_per_epoch=2)
    port = tailer.serve_metrics(port=0)

    r1 = tailer.tick()
    m1 = tailer.metrics()
    assert m1["ticks_total"] == 1
    assert m1["epochs_applied_total"] == r1["epochs_applied"] == 2
    assert m1["events_applied_total"] == 2000
    assert m1["committed_frontier"] == 1
    assert m1["events_per_sec"] > 0
    assert set(m1["partition_watermark"]) == {0, 1, 2, 3}
    assert min(m1["partition_watermark_lag"].values()) == 0

    r2 = tailer.tick()  # nothing new: skips advance, applies don't
    m2 = tailer.metrics()
    assert m2["ticks_total"] == 2
    assert m2["epochs_applied_total"] == 2
    assert m2["epochs_skipped_total"] == m1["epochs_skipped_total"] + 2
    assert m2["events_applied_total"] == 2000

    # a RESUMED tailer (fresh process, everything already committed) must
    # still report the real frontier — skips advance the gauge
    t2 = Tailer(seg_dir, lake, num_partitions=4, segments_per_epoch=2)
    t2.tick()
    assert t2.metrics()["committed_frontier"] == 1

    body = urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics").read().decode()
    assert "sonic_etl_events_applied_total 2000" in body
    assert 'sonic_etl_partition_watermark_lag{part="0"}' in body
    health = urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz")
    assert health.status == 200
    assert json.loads(health.read())["alive"] is True
    tailer._metrics_server.shutdown()


def test_tailer_healthz_goes_503_when_stalled():
    from sonic_etl_ray.pipelines.metrics import TailerMetrics, serve_metrics

    fake_now = [1000.0]
    m = TailerMetrics(clock=lambda: fake_now[0])
    m.record_tick(head_segment=0, applied=0, skipped=0)
    srv, port = serve_metrics(m, port=0, liveness_window_s=5.0)
    try:
        import urllib.error
        import urllib.request

        assert urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz").status == 200
        fake_now[0] += 60.0  # loop stalls past the liveness window
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz")
            raise AssertionError("expected 503")
        except urllib.error.HTTPError as e:
            assert e.code == 503
    finally:
        srv.shutdown()


def test_tailer_healthz_startup_grace():
    """Before the FIRST tick completes (cold backlog), /healthz must report
    alive — a liveness probe that 503s at startup restart-loops the pod."""
    from sonic_etl_ray.pipelines.metrics import TailerMetrics, serve_metrics

    m = TailerMetrics(clock=lambda: 1000.0)
    srv, port = serve_metrics(m, port=0, liveness_window_s=5.0)
    try:
        import urllib.request

        assert urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz").status == 200
    finally:
        srv.shutdown()
