"""QC-job tests: gap detection, range compression, count invariants,
freshness — the pytest analog of the reference's QC-as-production-DAGs
(``daily_qc_airflow/``)."""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

from sonic_etl_ray.generator import StreamSpec, generate_stream
from sonic_etl_ray.pipelines.ingest import read_lake, run_ingest, scratch_lake_dir
from sonic_etl_ray.pipelines.qc import (
    detect_gaps,
    freshness,
    gaps_to_ranges,
    row_count_invariants,
    verify_lake_counts,
)


def test_detect_gaps_dense_and_holed():
    ds = ray.data.from_arrow(pa.table({"lsn": [0, 1, 2, 3, 4]}))
    assert detect_gaps(ds) == []
    ds = ray.data.from_arrow(pa.table({"lsn": [0, 1, 5, 6, 9]}))
    assert detect_gaps(ds) == [2, 3, 4, 7, 8]


def test_gaps_to_ranges():
    assert gaps_to_ranges([2, 3, 4, 7, 8, 11]) == [(2, 4), (7, 8), (11, 11)]
    assert gaps_to_ranges([]) == []


def test_detect_gap_ranges_sparse_huge_span():
    """A 10^8-wide span with 3 present runs: the ranges API returns the 2
    gap ranges without ever materializing the span (the old dense
    ``np.arange`` path would allocate ~800 MB here; O(gaps) summaries must
    stay tiny). Runs split across blocks to exercise the seam merge."""
    import numpy as np

    from sonic_etl_ray.pipelines.qc import detect_gap_ranges

    lsns = np.concatenate(
        [
            np.arange(0, 3_000, dtype=np.int64),
            np.arange(40_000_000, 40_002_000, dtype=np.int64),
            np.arange(99_999_000, 100_000_001, dtype=np.int64),
        ]
    )
    rng = np.random.default_rng(7)
    rng.shuffle(lsns)  # arbitrary arrival order, arbitrary block boundaries
    ds = ray.data.from_arrow(pa.table({"lsn": lsns})).repartition(8)
    assert detect_gap_ranges(ds) == [
        (3_000, 39_999_999),
        (40_002_000, 99_998_999),
    ]
    # dense path still exact on small spans
    small = ray.data.from_arrow(pa.table({"lsn": [0, 1, 5, 6, 9]}))
    assert detect_gaps(small) == [2, 3, 4, 7, 8]


def test_backfill_plan_and_repair(tmp_path):
    """Ingest with two segments withheld; the backfill planner selects
    exactly those, and replaying them repairs the lake to the full oracle
    state (idempotent merge makes over-replay safe too)."""
    from sonic_etl_ray.oracle import assert_state_equal, oracle_final_state
    from sonic_etl_ray.pipelines.ingest import lake_final_table
    from sonic_etl_ray.pipelines.qc import plan_backfill

    spec = StreamSpec(n_events=3000, n_repos=6, seed=29, segment_size=500)
    files = generate_stream(str(tmp_path / "seg"), spec)
    lake = scratch_lake_dir("backfill")
    # lose the middle two segments (one whole epoch of 2)
    delivered = files[:2] + files[4:]
    run_ingest(files[:2], lake, num_partitions=2, segments_per_epoch=2)
    run_ingest(files[:2] + files[4:6], lake, num_partitions=2, segments_per_epoch=2)

    plan = plan_backfill(lake, files)
    assert sorted(plan["replay_segments"]) == sorted(files[2:4] + files[6:])
    assert plan["ranges"][0] == (1000, 1999)

    # repair: replay everything — order doesn't matter because the merge is
    # per-key last-writer-wins by LSN over (prior ∪ incoming)
    run_ingest(files, lake, num_partitions=2, segments_per_epoch=2)
    assert_state_equal(lake_final_table(lake), oracle_final_state(files))
    assert plan_backfill(lake, files)["replay_segments"] == []


def test_lake_qc_roundtrip(tmp_path):
    spec = StreamSpec(n_events=3000, n_repos=8, seed=17, segment_size=500)
    files = generate_stream(str(tmp_path / "seg"), spec)
    lake = scratch_lake_dir("qc")
    run_ingest(files, lake, num_partitions=4, segments_per_epoch=6)

    assert verify_lake_counts(lake)  # commit-log n_rows == actual file rows

    fresh = freshness(lake)
    assert fresh and all(v["applied_lsn"] is not None for v in fresh.values())
    assert max(v["applied_lsn"] for v in fresh.values()) == spec.n_events - 1

    counts = row_count_invariants(read_lake(lake))
    total = sum(v["n_files"] for v in counts.values())
    from sonic_etl_ray.pipelines.ingest import lake_final_table

    assert total == lake_final_table(lake).num_rows


def test_analyze_lake_exact_stats_with_nulls(ray_session, tmp_path):
    """ANALYZE vs pandas truth, including an evolved column that is null
    for every pre-evolution row and an int column's min/max as strings."""
    import pyarrow as pa
    import ray.data

    from sonic_etl_ray.pipelines.ingest import apply_epoch, lake_final_table
    from sonic_etl_ray.pipelines.qc import analyze_lake

    def ev(rows, extra_col=None):
        cols = {
            "op": pa.array(["insert"] * len(rows), pa.string()),
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "repo": pa.array([r[1] for r in rows], pa.string()),
            "path": pa.array([r[2] for r in rows], pa.string()),
            "commit": pa.array([f"c{r[0]}" for r in rows], pa.string()),
            "lang": pa.array([r[3] for r in rows], pa.string()),
            "content": pa.array([r[4] for r in rows], pa.string()),
        }
        if extra_col is not None:
            cols["license"] = pa.array(extra_col, pa.string())
        return pa.table(cols)

    lake = str(tmp_path / "lake")
    rows = [(i, f"r{i % 3}", f"f{i}", f"l{i % 4}", "x" * (i + 1)) for i in range(20)]
    apply_epoch(ray.data.from_arrow(ev(rows)), lake, epoch=0, num_partitions=4)
    apply_epoch(
        ray.data.from_arrow(ev([(100, "r0", "lic", "l0", "y")], extra_col=["mit"])),
        lake, epoch=1, num_partitions=4,
    )
    got = analyze_lake(lake, ["repo", "license", "size_bytes"])
    truth = lake_final_table(lake).to_pandas()
    for _, row in got.iterrows():
        c = row["column"]
        s = truth[c]
        assert row["n_nulls"] == int(s.isna().sum()), c
        assert row["n_distinct"] == int(s.dropna().nunique()), c
        if c == "size_bytes":
            assert row["min_v"] == str(int(s.min())) and row["max_v"] == str(int(s.max()))
        else:
            assert row["min_v"] == s.dropna().min() and row["max_v"] == s.dropna().max()
    lic = got[got["column"] == "license"].iloc[0]
    assert lic["n_nulls"] == 20 and lic["n_distinct"] == 1


def test_analyze_lake_approx_matches_exact_stats(ray_session, tmp_path):
    """Sketch ANALYZE: min/max/null exact vs analyze_lake; ndv within raw-HLL
    error (m=128 → ~9% rse; assert 3σ) and exact-invariant for tiny ndv is
    NOT assumed (raw estimator bias) — only the error band."""
    import pyarrow as pa
    import ray.data

    from sonic_etl_ray.pipelines.ingest import apply_epoch
    from sonic_etl_ray.pipelines.qc import analyze_lake, analyze_lake_approx

    rows = [(i, f"r{i % 7}", f"f{i}", f"l{i % 4}", "x" * (i % 50 + 1)) for i in range(800)]
    t = pa.table(
        {
            "op": pa.array(["insert"] * len(rows), pa.string()),
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "repo": pa.array([r[1] for r in rows], pa.string()),
            "path": pa.array([r[2] for r in rows], pa.string()),
            "commit": pa.array([f"c{r[0]}" for r in rows], pa.string()),
            "lang": pa.array([r[3] for r in rows], pa.string()),
            "content": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    lake = str(tmp_path / "lake")
    apply_epoch(ray.data.from_arrow(t), lake, epoch=0, num_partitions=4)
    cols = ["repo", "lang", "size_bytes", "path"]
    exact = analyze_lake(lake, cols).set_index("column")
    approx = analyze_lake_approx(lake, cols).set_index("column")
    for c in cols:
        assert approx.loc[c, "min_v"] == exact.loc[c, "min_v"], c
        assert approx.loc[c, "max_v"] == exact.loc[c, "max_v"], c
        assert approx.loc[c, "n_nulls"] == exact.loc[c, "n_nulls"], c
        nd = int(exact.loc[c, "n_distinct"])
        est = int(approx.loc[c, "est_distinct"])
        assert abs(est - nd) <= max(3, int(0.28 * nd)), (c, est, nd)


def test_check_constraints_all_kinds(ray_session, tmp_path):
    """Every constraint kind vs pandas truth on a lake with real
    violations (nulls, out-of-domain values, out-of-range sizes,
    non-matching paths, duplicate langs)."""
    import pyarrow as pa
    import ray.data

    from sonic_etl_ray.pipelines.ingest import apply_epoch, lake_final_table
    from sonic_etl_ray.pipelines.qc import Constraint, check_constraints

    rows = [
        (i, f"r{i % 3}", f"f{i}" + ("/view" if i % 4 == 0 else ""),
         ["py", "rs", "zz", None][i % 4], "x" * (i + 1))
        for i in range(24)
    ]
    t = pa.table(
        {
            "op": pa.array(["insert"] * len(rows), pa.string()),
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "repo": pa.array([r[1] for r in rows], pa.string()),
            "path": pa.array([r[2] for r in rows], pa.string()),
            "commit": pa.array([f"c{r[0]}" for r in rows], pa.string()),
            "lang": pa.array([r[3] for r in rows], pa.string()),
            "content": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    lake = str(tmp_path / "lake")
    apply_epoch(ray.data.from_arrow(t), lake, epoch=0, num_partitions=4)
    got = check_constraints(
        lake,
        [
            Constraint("lang_nn", "not_null", ("lang",)),
            Constraint("lang_ok", "accepted_values", ("lang",), values=("py", "rs")),
            Constraint("size_rng", "range", ("size_bytes",), lo=3, hi=20),
            Constraint("view_path", "regex", ("path",), pattern="view"),
            Constraint("pk", "unique", ("repo", "path")),
            Constraint("lang_uni", "unique", ("lang",)),
        ],
    ).set_index("constraint")
    truth = lake_final_table(lake).to_pandas()
    n = len(truth)
    assert (got["n_rows"] == n).all()
    assert got.loc["lang_nn", "violations"] == int(truth["lang"].isna().sum())
    assert got.loc["lang_ok", "violations"] == int(
        (~truth["lang"].isin(["py", "rs"]) & truth["lang"].notna()).sum()
    )
    assert got.loc["size_rng", "violations"] == int(
        ((truth["size_bytes"] < 3) | (truth["size_bytes"] > 20)).sum()
    )
    assert got.loc["view_path", "violations"] == int(
        (~truth["path"].str.contains("view")).sum()
    )
    assert got.loc["pk", "violations"] == 0  # merge guarantees the PK
    assert got.loc["lang_uni", "violations"] == int(
        truth["lang"].notna().sum() - truth["lang"].dropna().nunique()
    )


def test_constraint_monitor_incremental_matches_full(ray_session, tmp_path):
    """Counters maintained from the change feed equal a full rescan after
    inserts, updates (violation appearing AND clearing) and deletes; the
    per-epoch persist makes re-refresh a no-op."""
    import pyarrow as pa
    import ray.data

    from sonic_etl_ray.pipelines.ingest import apply_epoch
    from sonic_etl_ray.pipelines.qc import Constraint, ConstraintMonitor, check_constraints

    lake = str(tmp_path / "lake")

    def ev(rows):
        return pa.table(
            {
                "op": pa.array([r[0] for r in rows], pa.string()),
                "lsn": pa.array([r[1] for r in rows], pa.int64()),
                "repo": pa.array([r[2] for r in rows], pa.string()),
                "path": pa.array([r[3] for r in rows], pa.string()),
                "commit": pa.array([f"c{r[1]}" for r in rows], pa.string()),
                "lang": pa.array([r[4] for r in rows], pa.string()),
                "content": pa.array([r[5] for r in rows], pa.string()),
            }
        )

    cons = [
        Constraint("lang_ok", "accepted_values", ("lang",), values=("py", "rs")),
        Constraint("small", "range", ("size_bytes",), hi=5),
    ]
    # epoch 0: 3 rows, one lang violation, one size violation
    apply_epoch(ray.data.from_arrow(ev([
        ("insert", 0, "r0", "a", "py", "xx"),
        ("insert", 1, "r0", "b", "zz", "xxx"),          # lang violation
        ("insert", 2, "r0", "c", "rs", "xxxxxxxxxx"),   # size violation
    ])), lake, epoch=0, num_partitions=2)

    mon = ConstraintMonitor(lake, cons, str(tmp_path / "mon.json"))
    r0 = mon.report().set_index("constraint")
    full0 = check_constraints(lake, cons).set_index("constraint")
    assert r0.equals(full0)

    # epoch 1: update clears the lang violation, another introduces a size
    # violation, a delete removes the size-violating row, new insert adds
    apply_epoch(ray.data.from_arrow(ev([
        ("insert", 10, "r0", "b", "py", "ok"),           # clears lang violation
        ("insert", 11, "r0", "a", "py", "xxxxxxxxxxxx"), # size violation appears
        ("delete", 12, "r0", "c", "rs", None),           # removes old size violation
        ("insert", 13, "r1", "d", "qq", "x"),            # new lang violation
    ])), lake, epoch=1, num_partitions=2)

    r1 = mon.report().set_index("constraint")
    full1 = check_constraints(lake, cons).set_index("constraint")
    assert r1.equals(full1), (r1, full1)
    assert int(r1.loc["lang_ok", "violations"]) == 1
    assert int(r1.loc["small", "violations"]) == 1
    assert int(r1.loc["small", "n_rows"]) == 3

    # idempotent: nothing new -> state unchanged
    again = mon.report().set_index("constraint")
    assert again.equals(r1)

    # a fresh monitor object resumes from the persisted state file
    mon2 = ConstraintMonitor(lake, cons, str(tmp_path / "mon.json"))
    assert mon2.report().set_index("constraint").equals(r1)


def test_tailer_drives_constraint_monitor(ray_session, tmp_path):
    """A Tailer(monitors=[...]) advances streaming QC each tick."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sonic_etl_ray.pipelines.qc import Constraint, ConstraintMonitor, check_constraints
    from sonic_etl_ray.pipelines.tail import Tailer

    seg_dir = str(tmp_path / "segs")
    lake = str(tmp_path / "lake")
    os.makedirs(seg_dir)

    def seg(i, rows):
        t = pa.table(
            {
                "op": pa.array(["insert"] * len(rows), pa.string()),
                "lsn": pa.array([r[0] for r in rows], pa.int64()),
                "repo": pa.array([r[1] for r in rows], pa.string()),
                "path": pa.array([r[2] for r in rows], pa.string()),
                "commit": pa.array([f"c{r[0]}" for r in rows], pa.string()),
                "lang": pa.array([r[3] for r in rows], pa.string()),
                "content": pa.array(["x" * r[4] for r in rows], pa.string()),
            }
        )
        pq.write_table(t, f"{seg_dir}/segment_{i:05d}.parquet")

    seg(0, [(0, "r0", "a", "py", 2), (1, "r0", "b", "zz", 3)])
    seg(1, [(2, "r0", "c", "py", 9)])
    cons = [Constraint("lang_ok", "accepted_values", ("lang",), values=("py",)),
            Constraint("small", "range", ("size_bytes",), hi=5)]
    mon = ConstraintMonitor(lake, cons, str(tmp_path / "mon.json"))
    t = Tailer(seg_dir, lake, num_partitions=2, segments_per_epoch=1, monitors=[mon])
    t.tick()
    got = mon.report().set_index("constraint")
    want = check_constraints(lake, cons).set_index("constraint")
    assert got.equals(want)
    assert int(got.loc["lang_ok", "violations"]) == 1
    assert int(got.loc["small", "violations"]) == 1
    # stream grows; next tick advances the monitor incrementally
    seg(2, [(10, "r1", "d", "qq", 1)])
    t.tick()
    got2 = mon.report().set_index("constraint")
    assert got2.equals(check_constraints(lake, cons).set_index("constraint"))
    assert int(got2.loc["lang_ok", "violations"]) == 2

def test_constraint_monitor_bootstrap_pins_scan_epoch(ray_session, tmp_path, monkeypatch):
    """A writer committing BETWEEN the bootstrap's frontier pin and its full
    scan must not be double-counted (scan includes it + refresh re-folds
    it). The bootstrap scan is pinned to the cursor epoch, so the racing
    epoch is seen exactly once — by refresh()."""
    import pyarrow as pa
    import ray.data

    from sonic_etl_ray.pipelines import qc as qc_mod
    from sonic_etl_ray.pipelines.ingest import apply_epoch
    from sonic_etl_ray.pipelines.qc import Constraint, ConstraintMonitor, check_constraints

    lake = str(tmp_path / "lake")

    def ev(rows):
        return pa.table(
            {
                "op": pa.array(["insert"] * len(rows), pa.string()),
                "lsn": pa.array([r[0] for r in rows], pa.int64()),
                "repo": pa.array([r[1] for r in rows], pa.string()),
                "path": pa.array([r[2] for r in rows], pa.string()),
                "commit": pa.array([f"c{r[0]}" for r in rows], pa.string()),
                "lang": pa.array([r[3] for r in rows], pa.string()),
                "content": pa.array(["xxx"] * len(rows), pa.string()),
            }
        )

    cons = [Constraint("lang_ok", "accepted_values", ("lang",), values=("py",))]
    apply_epoch(ray.data.from_arrow(ev([(0, "r0", "a", "py"), (1, "r0", "b", "zz")])),
                lake, epoch=0, num_partitions=2)

    # racing writer: commits epoch 1 AFTER the monitor pinned the frontier
    # but BEFORE the bootstrap scan runs
    real = qc_mod.check_constraints

    def racing(lake_dir, constraints, **kw):
        apply_epoch(ray.data.from_arrow(ev([(10, "r1", "c", "qq")])),
                    lake, epoch=1, num_partitions=2)
        return real(lake_dir, constraints, **kw)

    monkeypatch.setattr(qc_mod, "check_constraints", racing)
    mon = ConstraintMonitor(lake, cons, str(tmp_path / "mon.json"))
    got = mon.report().set_index("constraint")
    monkeypatch.setattr(qc_mod, "check_constraints", real)
    want = check_constraints(lake, cons).set_index("constraint")
    assert got.equals(want), (got, want)
    assert int(got.loc["lang_ok", "violations"]) == 2  # zz + qq, each once
    assert int(got.loc["lang_ok", "n_rows"]) == 3
