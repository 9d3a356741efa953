"""Unit tests for the shared run-fold protocol (state/runfold.py) — the
crash-safety core under the history / decoded / error compactions."""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from sonic_etl_ray.state.runfold import EpochCover, fold_partition_runs, list_runs


def _t(vals):
    return pa.table({"v": pa.array(vals, pa.int64())})


def _merge(tables):
    merged = pa.concat_tables(tables)
    import pyarrow.compute as pc

    return merged.take(pc.sort_indices(merged, sort_keys=[("v", "ascending")]))


def _write_epoch(d, e, vals):
    os.makedirs(d, exist_ok=True)
    f = os.path.join(d, f"e{e}.parquet")
    pq.write_table(_t(vals), f)
    return (e, f)


def test_fold_refold_coverage_and_gc(tmp_path):
    src = str(tmp_path / "src")
    run_dir = str(tmp_path / "runs")
    e0 = _write_epoch(src, 0, [3, 1])
    e1 = _write_epoch(src, 1, [2])
    n = fold_partition_runs(run_dir, [e0, e1], [e0, e1], _merge, min_files=2)
    assert n == 2
    runs = list_runs(run_dir)
    assert len(runs) == 1 and runs[0][2]["covered_ranges"] == [[0, 1]]
    assert pq.read_table(runs[0][1]).column("v").to_pylist() == [1, 2, 3]
    # originals survive the first fold (one-generation grace)
    assert os.path.exists(e0[1]) and os.path.exists(e1[1])

    # second fold: new epoch + the already-covered ones offered again
    e2 = _write_epoch(src, 2, [5])
    n2 = fold_partition_runs(run_dir, [e0, e1, e2], [e0, e1, e2], _merge, min_files=1)
    assert n2 == 1  # only the uncovered epoch folds
    runs2 = list_runs(run_dir)
    # the superseded run gets one generation of grace too: both present,
    # newest (seq 1) is authoritative
    assert [r[0] for r in runs2] == [0, 1]
    assert runs2[-1][2]["covered_ranges"] == [[0, 2]]
    assert pq.read_table(runs2[-1][1]).column("v").to_pylist() == [1, 2, 3, 5]
    # generation-1 originals swept now; the new epoch's original still graced
    assert not os.path.exists(e0[1]) and not os.path.exists(e1[1])
    assert os.path.exists(e2[1])

    # third fold sweeps the seq-0 run (its grace generation has passed)
    e3 = _write_epoch(src, 3, [7])
    assert fold_partition_runs(run_dir, [e3], [e2, e3], _merge, min_files=1) == 1
    assert [r[0] for r in list_runs(run_dir)] == [1, 2]
    assert not os.path.exists(os.path.join(run_dir, "run-seq=00000000.parquet"))


def test_min_files_amortization_gate(tmp_path):
    src = str(tmp_path / "src")
    run_dir = str(tmp_path / "runs")
    e0 = _write_epoch(src, 0, [1])
    # first fold needs max(min_files, 2)
    assert fold_partition_runs(run_dir, [e0], [e0], _merge, min_files=1) == 0
    e1 = _write_epoch(src, 1, [2])
    assert fold_partition_runs(run_dir, [e0, e1], [e0, e1], _merge, min_files=1) == 2
    # refold below threshold is a no-op, nothing rewritten
    e2 = _write_epoch(src, 2, [3])
    before = list_runs(run_dir)
    assert fold_partition_runs(run_dir, [e2], [e0, e1, e2], _merge, min_files=5) == 0
    assert list_runs(run_dir) == before


def test_orphan_data_file_is_overwritten_not_trusted(tmp_path):
    """A crash between the data rename and the marker rename leaves an
    orphan run data file: it must be invisible to readers and harmlessly
    overwritten by the next fold."""
    src = str(tmp_path / "src")
    run_dir = str(tmp_path / "runs")
    os.makedirs(run_dir)
    pq.write_table(_t([99]), os.path.join(run_dir, "run-seq=00000000.parquet"))
    assert list_runs(run_dir) == []  # no marker -> not a run
    e0 = _write_epoch(src, 0, [1])
    e1 = _write_epoch(src, 1, [2])
    assert fold_partition_runs(run_dir, [e0, e1], [e0, e1], _merge, min_files=2) == 2
    runs = list_runs(run_dir)
    assert pq.read_table(runs[0][1]).column("v").to_pylist() == [1, 2]  # 99 gone


def test_marker_without_data_file_ignored(tmp_path):
    run_dir = str(tmp_path / "runs")
    os.makedirs(run_dir)
    with open(os.path.join(run_dir, "run-seq=00000003.json"), "w") as fh:
        json.dump({"data_file": os.path.join(run_dir, "gone.parquet"), "covered_epochs": [7]}, fh)
    assert list_runs(run_dir) == []


def test_epoch_cover_ranges_and_legacy(tmp_path):
    """Range-compressed coverage: membership, min/max, union, and legacy
    covered_epochs list markers still read."""
    c = EpochCover.from_epochs([0, 1, 2, 5, 7, 8])
    assert c.ranges == [(0, 2), (5, 5), (7, 8)]
    assert 1 in c and 5 in c and 8 in c
    assert 3 not in c and 6 not in c and 9 not in c
    assert c.min() == 0 and c.max() == 8
    u = c.union_epochs([3, 4, 9])
    assert u.ranges == [(0, 5), (7, 9)]
    legacy = EpochCover.from_marker({"covered_epochs": [4, 2, 3]})
    assert legacy.ranges == [(2, 4)] and 3 in legacy
    # a fully-contiguous million-epoch history is ONE range
    big = EpochCover.from_epochs(range(1_000_000))
    assert big.ranges == [(0, 999_999)] and 999_999 in big

    # legacy marker on disk folds forward into the ranges format
    import json

    import pyarrow.parquet as pq

    run_dir = str(tmp_path / "runs")
    os.makedirs(run_dir)
    pq.write_table(_t([1, 2]), os.path.join(run_dir, "run-seq=00000000.parquet"))
    with open(os.path.join(run_dir, "run-seq=00000000.json"), "w") as fh:
        json.dump({"data_file": os.path.join(run_dir, "run-seq=00000000.parquet"),
                   "covered_epochs": [0, 1], "n_rows": 2}, fh)
    src = str(tmp_path / "src")
    e2 = _write_epoch(src, 2, [9])
    assert fold_partition_runs(run_dir, [e2], [e2], _merge, min_files=1) == 1
    runs = list_runs(run_dir)
    assert runs[-1][2]["covered_ranges"] == [[0, 2]]
    assert pq.read_table(runs[-1][1]).column("v").to_pylist() == [1, 2, 9]


def test_epoch_cover_property_vs_set_model():
    """EpochCover behaves exactly like a set of ints under construction,
    membership, union, and min/max — property-checked."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(0, 200), max_size=40),
        st.lists(st.integers(0, 200), max_size=40),
        st.integers(-1, 201),
    )
    def prop(a, b, probe):
        model = set(a)
        c = EpochCover.from_epochs(a)
        assert (probe in c) == (probe in model)
        if model:
            assert c.min() == min(model) and c.max() == max(model)
        assert bool(c) == bool(model)
        u = c.union_epochs(b)
        um = model | set(b)
        assert (probe in u) == (probe in um)
        # ranges are canonical: sorted, disjoint, non-adjacent
        for (lo1, hi1), (lo2, hi2) in zip(u.ranges, u.ranges[1:]):
            assert hi1 + 1 < lo2
        assert sum(hi - lo + 1 for lo, hi in u.ranges) == len(um)

    prop()


def test_epoch_cover_canonicalizes_marker_input():
    """Non-canonical (unsorted/overlapping/adjacent) marker ranges are
    normalized on construction — bisect membership stays correct."""
    c = EpochCover([[5, 9], [0, 3], [4, 4], [11, 11]])
    assert c.ranges == [(0, 9), (11, 11)]
    assert 1 in c and 4 in c and 9 in c and 11 in c and 10 not in c
