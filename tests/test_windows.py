"""Watermark-gated tumbling-window view: exactly-once finalization,
incremental refresh under a tailing ingest, lateness gating, resume."""

from __future__ import annotations

import glob

import numpy as np
import pyarrow.parquet as pq

from sonic_etl_ray.generator import StreamSpec, generate_stream
from sonic_etl_ray.pipelines.ingest import run_ingest, scratch_lake_dir
from sonic_etl_ray.pipelines.windows import TumblingWindowView, applied_watermark


def _segments(tmp_path, n_events=6000):
    seg = str(tmp_path / "segments")
    generate_stream(seg, StreamSpec(n_events=n_events, n_repos=7, seed=21, segment_size=500))
    return sorted(glob.glob(seg + "/segment_*.parquet"))


def _brute(files, W, lo_w, hi_w):
    """(window, repo) -> (n_events, n_deletes) from the raw segments."""
    out = {}
    for f in files:
        t = pq.read_table(f, columns=["lsn", "op", "repo"])
        for lsn, op, repo in zip(
            t["lsn"].to_pylist(), t["op"].to_pylist(), t["repo"].to_pylist()
        ):
            k = lsn // W
            if lo_w <= k < hi_w:
                n, d = out.get((k, repo), (0, 0))
                out[(k, repo)] = (n + 1, d + (op == "delete"))
    return out


def test_windowed_view_incremental_and_exactly_once(tmp_path):
    files = _segments(tmp_path)
    lake = scratch_lake_dir("winlake")
    W = 997

    # ingest the first half, refresh: only fully-applied windows finalize
    run_ingest(files[: len(files) // 2], lake, num_partitions=4, segments_per_epoch=3)
    wm1 = applied_watermark(lake)
    assert wm1 == len(files) // 2 * 500 - 1  # dense LSNs, in-order epochs
    v = TumblingWindowView(lake, window=W)
    r1 = v.refresh(files)
    assert r1["next_window"] == (wm1 + 1) // W
    assert r1["windows_finalized"] == r1["next_window"]
    # re-run is a no-op (exactly-once)
    assert v.refresh(files)["windows_finalized"] == 0

    # ingest the rest; a FRESH view object resumes from the manifest
    run_ingest(files, lake, num_partitions=4, segments_per_epoch=3)
    wm2 = applied_watermark(lake)
    assert wm2 == len(files) * 500 - 1
    v2 = TumblingWindowView(lake, window=W)
    r2 = v2.refresh(files)
    assert r2["next_window"] == (wm2 + 1) // W
    assert r2["windows_finalized"] == r2["next_window"] - r1["next_window"]

    got = v2.table().to_pandas()
    want = _brute(files, W, 0, r2["next_window"])
    assert len(got) == len(want)
    for row in got.itertuples(index=False):
        n, d = want[(row.window_id, row.repo)]
        assert (row.n_events, row.n_deletes) == (n, d)
    # the tail partial window is never emitted
    assert got["window_id"].max() == r2["next_window"] - 1
    assert (wm2 + 1) % W != 0  # the test really does leave a partial tail


def test_windowed_view_lateness_and_empty_lake(tmp_path):
    files = _segments(tmp_path, n_events=3000)
    lake = scratch_lake_dir("winlate")
    v = TumblingWindowView(lake, window=500, lateness=600)
    # empty lake: watermark -1, nothing finalizable
    assert applied_watermark(lake) == -1
    assert v.refresh(files)["windows_finalized"] == 0

    run_ingest(files, lake, num_partitions=4, segments_per_epoch=2)
    wm = applied_watermark(lake)
    r = v.refresh(files)
    # lateness holds back windows whose end+lateness exceeds watermark+1
    assert r["next_window"] == (wm + 1 - 600) // 500 < (wm + 1) // 500
    got = v.table()
    assert got.num_rows > 0
    assert np.asarray(got["window_id"]).max() == r["next_window"] - 1


def test_windowed_view_segment_pruning(tmp_path):
    """A refresh over an already-finalized prefix reads nothing: the footer
    LSN stats exclude every segment outside the new span."""
    from sonic_etl_ray.pipelines.windows import _segment_lsn_range

    files = _segments(tmp_path, n_events=3000)
    rng = _segment_lsn_range(files[0])
    assert rng == (0, 499)
    lake = scratch_lake_dir("winprune")
    run_ingest(files[:2], lake, num_partitions=4, segments_per_epoch=2)
    v = TumblingWindowView(lake, window=100)
    v.refresh(files)
    # second half applied: the new span starts at 1000 — segment 0/1 excluded
    run_ingest(files, lake, num_partitions=4, segments_per_epoch=2)
    lo = v.next_window() * 100
    covered = [f for f in files if _segment_lsn_range(f)[1] >= lo]
    assert len(covered) == len(files) - 2
    r = v.refresh(files)
    assert r["windows_finalized"] == (applied_watermark(lake) + 1) // 100 - lo // 100


def test_tailer_refreshes_window_views(tmp_path):
    """The tailing loop finalizes windows as the watermark advances —
    growing the source between ticks finalizes exactly the new span."""
    from sonic_etl_ray.pipelines.tail import Tailer

    seg = str(tmp_path / "segments")
    spec = StreamSpec(n_events=4000, n_repos=7, seed=22, segment_size=500)
    generate_stream(seg, spec)
    files = sorted(glob.glob(seg + "/segment_*.parquet"))
    import os
    import shutil

    live = str(tmp_path / "live")
    os.makedirs(live)
    for f in files[:4]:
        shutil.copy(f, live)

    lake = scratch_lake_dir("wintail")
    v = TumblingWindowView(lake, window=300)
    t = Tailer(live, lake, num_partitions=4, segments_per_epoch=2, window_views=[v])
    r1 = t.tick()
    assert r1["windows_finalized"] == v.next_window() > 0
    for f in files[4:]:
        shutil.copy(f, live)
    r2 = t.tick()
    assert r2["windows_finalized"] > 0
    assert v.next_window() == (applied_watermark(lake) + 1) // 300
    got = v.table().to_pandas()
    want = _brute(files, 300, 0, v.next_window())
    assert len(got) == len(want)


def test_windowed_quantile_view_exact_and_incremental(tmp_path):
    """TumblingQuantileView: per-window size quantiles equal a numpy
    quantile_disc brute force (k=window => exact), finalize exactly once,
    resume from the manifest, and deletes (null content) are excluded."""
    from sonic_etl_ray.pipelines.windows import TumblingQuantileView

    files = _segments(tmp_path)
    lake = scratch_lake_dir("winqlake")
    W, qs = 997, (0.5, 0.9, 0.99)

    run_ingest(files[: len(files) // 2], lake, num_partitions=4, segments_per_epoch=3)
    v = TumblingQuantileView(lake, window=W, qs=qs)
    r1 = v.refresh(files)
    assert r1["windows_finalized"] == r1["next_window"] > 0
    assert v.refresh(files)["windows_finalized"] == 0  # exactly-once

    run_ingest(files, lake, num_partitions=4, segments_per_epoch=3)
    v2 = TumblingQuantileView(lake, window=W, qs=qs)  # fresh object resumes
    r2 = v2.refresh(files)
    assert r2["next_window"] > r1["next_window"]

    # brute force: quantile_disc rank rule per window over non-null sizes
    sizes: dict[int, list[int]] = {}
    for f in files:
        t = pq.read_table(f, columns=["lsn", "content"])
        for lsn, c in zip(t["lsn"].to_pylist(), t["content"].to_pylist()):
            if c is not None and lsn // W < r2["next_window"]:
                sizes.setdefault(lsn // W, []).append(len(c.encode("utf-8")))
    got = v2.table().to_pandas()
    assert set(got["window_id"]) == set(sizes)
    for (w, q), grp in got.groupby(["window_id", "q"]):
        s = np.sort(sizes[int(w)])
        rank = max(int(np.ceil(q * len(s))) - 1, 0)
        assert int(grp["size"].iloc[0]) == s[rank], (w, q)


def test_windowed_quantile_view_approximate_k(tmp_path):
    """k << window: the sketch path still finalizes and every reported
    quantile's true rank stays within the KLL error envelope."""
    from sonic_etl_ray.pipelines.windows import TumblingQuantileView

    files = _segments(tmp_path)
    lake = scratch_lake_dir("winqa")
    run_ingest(files, lake, num_partitions=4, segments_per_epoch=3)
    W = 2500
    v = TumblingQuantileView(lake, window=W, qs=(0.5, 0.9), k=64)
    r = v.refresh(files)
    assert r["windows_finalized"] > 0
    sizes: dict[int, list[int]] = {}
    for f in files:
        t = pq.read_table(f, columns=["lsn", "content"])
        for lsn, c in zip(t["lsn"].to_pylist(), t["content"].to_pylist()):
            if c is not None and lsn // W < r["next_window"]:
                sizes.setdefault(lsn // W, []).append(len(c.encode("utf-8")))
    got = v.table().to_pandas()
    for (w, q), grp in got.groupby(["window_id", "q"]):
        s = np.sort(sizes[int(w)])
        est = int(grp["size"].iloc[0])
        true_rank = np.searchsorted(s, est, side="right") / len(s)
        assert abs(true_rank - q) < 0.15, (w, q, true_rank)  # k=64 envelope


def test_windowed_topk_view_matches_brute_force(tmp_path):
    from sonic_etl_ray.pipelines.windows import TumblingTopKView

    files = _segments(tmp_path)
    lake = scratch_lake_dir("wintop")
    run_ingest(files, lake, num_partitions=4, segments_per_epoch=3)
    W, K = 997, 3
    v = TumblingTopKView(lake, window=W, k=K)
    r = v.refresh(files)
    assert r["windows_finalized"] > 0
    got = v.table().to_pandas()

    hi = r["next_window"]
    counts = _brute(files, W, 0, hi)
    for w in range(hi):
        rows = sorted(
            ((n, repo) for (k, repo), (n, _) in counts.items() if k == w),
            key=lambda x: (-x[0], x[1]),
        )[:K]
        g = got[got["window_id"] == w].sort_values("rank")
        assert list(zip(g["n_events"], g[v.group_col])) == rows, w
        assert g["rank"].tolist() == list(range(1, len(rows) + 1))
    # idempotent re-refresh: nothing new, view unchanged
    before = v.table()
    assert v.refresh(files)["windows_finalized"] == 0
    assert v.table().equals(before)


def _brute_sessions(files, G, wm):
    """Closed sessions per repo from the raw segments (lsn <= wm)."""
    rows = []
    for f in files:
        t = pq.read_table(f, columns=["lsn", "repo"])
        rows += [x for x in zip(t["repo"].to_pylist(), t["lsn"].to_pylist()) if x[1] <= wm]
    rows.sort()
    out, cur = [], None
    for repo, lsn in rows:
        if cur is not None and repo == cur[0] and lsn - cur[2] <= G:
            cur = (repo, cur[1], lsn, cur[3] + 1)
        else:
            if cur is not None:
                out.append(cur)
            cur = (repo, lsn, lsn, 1)
    if cur is not None:
        out.append(cur)
    return [s for s in out if s[2] + G <= wm]


def test_session_view_incremental_equals_oneshot_and_brute(tmp_path):
    from sonic_etl_ray.pipelines.windows import SessionView, applied_watermark

    files = _segments(tmp_path)
    G = 40
    # incremental: ingest half, refresh, ingest rest, refresh
    lake_inc = scratch_lake_dir("sessinc")
    half = len(files) // 2
    run_ingest(files[:half], lake_inc, num_partitions=4, segments_per_epoch=3)
    v = SessionView(lake_inc, gap=G)
    r1 = v.refresh(files)
    assert r1["sessions_closed"] > 0 and r1["open_sessions"] > 0
    run_ingest(files, lake_inc, num_partitions=4, segments_per_epoch=3)
    r2 = v.refresh(files)
    got_inc = v.table().to_pandas()

    # one-shot on a fully-ingested lake
    lake_one = scratch_lake_dir("sessone")
    run_ingest(files, lake_one, num_partitions=4, segments_per_epoch=3)
    v1 = SessionView(lake_one, gap=G)
    v1.refresh(files)
    got_one = v1.table().to_pandas()
    assert got_inc.equals(got_one)

    wm = applied_watermark(lake_one)
    want = _brute_sessions(files, G, wm)
    got = list(
        zip(got_one["repo"], got_one["start_lsn"], got_one["last_lsn"], got_one["n_events"])
    )
    assert got == want

    # idempotent re-refresh: watermark unchanged → nothing new
    r3 = v1.refresh(files)
    assert r3["sessions_closed"] == 0
    assert v1.table().to_pandas().equals(got_one)


def test_session_view_boundary_session_stays_open_then_closes(tmp_path):
    """A session still within `gap` of the watermark must NOT be emitted
    until later events (or watermark movement) prove the gap elapsed."""
    from sonic_etl_ray.pipelines.windows import SessionView

    files = _segments(tmp_path)
    lake = scratch_lake_dir("sessb")
    run_ingest(files, lake, num_partitions=4, segments_per_epoch=3)
    # a huge gap: nothing can close
    v = SessionView(lake, gap=10**9)
    r = v.refresh(files)
    assert r["sessions_closed"] == 0 and r["open_sessions"] > 0
    assert v.table().num_rows == 0


def test_tailer_drives_session_view(tmp_path):
    """SessionView rides the Tailer's window_views hook: sessions close as
    the tailing watermark advances, and the final view equals brute force."""
    import os
    import shutil

    from sonic_etl_ray.pipelines.tail import Tailer
    from sonic_etl_ray.pipelines.windows import SessionView, applied_watermark

    seg = str(tmp_path / "segments")
    generate_stream(seg, StreamSpec(n_events=4000, n_repos=7, seed=23, segment_size=500))
    files = sorted(glob.glob(seg + "/segment_*.parquet"))
    live = str(tmp_path / "live")
    os.makedirs(live)
    for f in files[:4]:
        shutil.copy(f, live)

    lake = scratch_lake_dir("sesstail")
    G = 40
    v = SessionView(lake, gap=G)
    t = Tailer(live, lake, num_partitions=4, segments_per_epoch=2, window_views=[v])
    r1 = t.tick()
    assert r1["windows_finalized"] > 0
    n_after_first = v.table().num_rows
    for f in files[4:]:
        shutil.copy(f, live)
    t.tick()
    got = v.table().to_pandas()
    assert got.shape[0] > n_after_first
    wm = applied_watermark(lake)
    want = _brute_sessions(files, G, wm)
    assert (
        list(zip(got["repo"], got["start_lsn"], got["last_lsn"], got["n_events"]))
        == want
    )
