"""Point-lookup data skipping: a key lookup touches only the partition it
hashes to (plus Parquet row-group pruning inside the sorted state file) —
never a lake scan."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from sonic_etl_ray.generator import StreamSpec, generate_stream
from sonic_etl_ray.pipelines.ingest import (
    lake_final_table,
    lake_num_partitions,
    lookup_keys,
    run_ingest,
    scratch_lake_dir,
)


def _lake(tmp_path, merge_mode="cow", n=5000):
    seg = str(tmp_path / "segments")
    generate_stream(seg, StreamSpec(n_events=n, n_repos=10, seed=8, segment_size=500))
    import glob

    files = sorted(glob.glob(seg + "/segment_*.parquet"))
    lake = scratch_lake_dir("lkp")
    run_ingest(files, lake, num_partitions=8, segments_per_epoch=5, merge_mode=merge_mode)
    return lake


def _sample_keys(full: pa.Table, k=25, seed=5):
    import random

    rng = random.Random(seed)
    idx = rng.sample(range(full.num_rows), k)
    return [(full.column("repo")[i].as_py(), full.column("path")[i].as_py()) for i in idx]


def _rows_for(full: pa.Table, keys):
    ks = pa.array(sorted({f"{r}\x00{p}" for r, p in keys}))
    joined = pc.binary_join_element_wise(full.column("repo"), full.column("path"), "\x00")
    return full.filter(pc.is_in(joined, value_set=ks))


def test_lookup_matches_full_scan_cow_and_mor(tmp_path):
    for mode in ("cow", "mor"):
        lake = _lake(tmp_path / mode, merge_mode=mode)
        assert lake_num_partitions(lake) == 8  # discovered from the manifest
        full = lake_final_table(lake)
        keys = _sample_keys(full)
        got = lookup_keys(lake, keys)
        want = _rows_for(full, keys)
        assert got.sort_by([("repo", "ascending"), ("path", "ascending")]).equals(
            want.sort_by([("repo", "ascending"), ("path", "ascending")])
        ), mode


def test_lookup_misses_tombstones_and_unknown_keys(tmp_path):
    lake = _lake(tmp_path, n=4000)
    full = lake_final_table(lake)
    # a deleted key must not resurface; an unknown key returns no row
    assert lookup_keys(lake, [("zzz", "never/existed")]).num_rows == 0
    keys = _sample_keys(full, k=5) + [("zzz", "never/existed")]
    assert lookup_keys(lake, keys).num_rows == 5


def test_lookup_time_travel(tmp_path):
    lake = _lake(tmp_path)
    t0 = lake_final_table(lake, as_of_epoch=0)
    keys = _sample_keys(t0, k=10, seed=2)
    got = lookup_keys(lake, keys, as_of_epoch=0)
    want = _rows_for(t0, keys)
    assert got.sort_by([("repo", "ascending"), ("path", "ascending")]).equals(
        want.sort_by([("repo", "ascending"), ("path", "ascending")])
    )


def test_lookup_empty_inputs(tmp_path):
    lake = _lake(tmp_path, n=1000)
    assert lookup_keys(lake, []).num_rows == 0
    assert lookup_keys("/tmp/does/not/exist", [("a", "b")]).num_rows == 0


def test_final_table_column_subset_regression(tmp_path):
    """columns omitting the sort keys must not break the canonical sort."""
    lake = _lake(tmp_path, n=1000)
    t = lake_final_table(lake, columns=["size_bytes"])
    assert t.column_names == ["size_bytes"] and t.num_rows > 0
