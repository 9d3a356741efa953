"""Snapshot export (final-table publish): fidelity, resumability, manifest
atomicity semantics."""

from __future__ import annotations

import json
import os

import pyarrow.compute as pc

from sonic_etl_ray.generator import StreamSpec, generate_stream
from sonic_etl_ray.pipelines.ingest import (
    export_snapshot,
    lake_final_table,
    read_snapshot,
    run_ingest,
    scratch_lake_dir,
)


def _mk_lake(tmp_path) -> str:
    files = generate_stream(
        str(tmp_path / "segs"),
        StreamSpec(n_events=2_000, n_repos=8, seed=13, segment_size=500),
    )
    lake = scratch_lake_dir("exp")
    run_ingest(files, lake, num_partitions=4, segments_per_epoch=2)
    return lake


def test_export_roundtrip_equals_lake_state(tmp_path):
    lake = _mk_lake(tmp_path)
    out = str(tmp_path / "snap")
    stats = export_snapshot(lake, out)
    assert stats["partitions_written"] == 4 and stats["partitions_skipped"] == 0

    snap = read_snapshot(out).to_pandas()
    want = lake_final_table(lake).to_pandas()
    cols = sorted(want.columns)
    got = snap[cols].sort_values(["repo", "path"]).reset_index(drop=True)
    want = want[cols].sort_values(["repo", "path"]).reset_index(drop=True)
    assert got.equals(want)
    assert stats["rows"] == len(want)


def test_export_rerun_skips_finished_partitions(tmp_path):
    lake = _mk_lake(tmp_path)
    out = str(tmp_path / "snap")
    export_snapshot(lake, out)
    again = export_snapshot(lake, out)
    assert again["partitions_written"] == 0
    assert again["partitions_skipped"] == 4

    # a missing partition file (failed run) is re-written, others skipped
    manifest = json.load(open(f"{out}/SNAPSHOT.json"))
    os.remove(manifest["partitions"][0]["file"])
    repaired = export_snapshot(lake, out)
    assert repaired["partitions_written"] == 1
    assert repaired["partitions_skipped"] == 3


def test_export_live_rerun_repins_after_new_epochs(tmp_path):
    """A LIVE export is pinned to the committed frontier: after new epochs
    commit, a re-run must NOT skip existing partition files (their content
    is stale for the new frontier) — it re-pins and rewrites, and the
    published snapshot equals the new lake state."""
    files = generate_stream(
        str(tmp_path / "segs"),
        StreamSpec(n_events=2_000, n_repos=8, seed=13, segment_size=500),
    )
    lake = scratch_lake_dir("exp_repin")
    run_ingest(files[:2], lake, num_partitions=4, segments_per_epoch=2)
    out = str(tmp_path / "snap_live")
    export_snapshot(lake, out)
    early_rows = json.load(open(f"{out}/SNAPSHOT.json"))["rows"]

    run_ingest(files, lake, num_partitions=4, segments_per_epoch=2)  # advance
    stats = export_snapshot(lake, out)
    assert stats["partitions_skipped"] == 0  # stale pin → full rewrite
    manifest = json.load(open(f"{out}/SNAPSHOT.json"))
    assert manifest["pinned_epoch"] == 1  # re-pinned to the new frontier
    want = lake_final_table(lake)
    assert manifest["rows"] == want.num_rows != early_rows
    snap = read_snapshot(out).to_pandas()
    cols = ["repo", "path", "content_sha256"]
    got = snap[cols].sort_values(cols).reset_index(drop=True)
    exp = want.to_pandas()[cols].sort_values(cols).reset_index(drop=True)
    assert got.equals(exp)
    # unchanged lake, same pin → skips resume working as before
    again = export_snapshot(lake, out)
    assert again["partitions_written"] == 0 and again["partitions_skipped"] == 4


def test_export_as_of_epoch_is_time_travel(tmp_path):
    lake = _mk_lake(tmp_path)
    out = str(tmp_path / "snap_asof")
    export_snapshot(lake, out, as_of_epoch=0)
    snap = read_snapshot(out).to_pandas()
    want = lake_final_table(lake, as_of_epoch=0).to_pandas()
    assert len(snap) == len(want)
    # changing as_of invalidates the prior manifest entries (full re-export)
    stats = export_snapshot(lake, out, as_of_epoch=None)
    assert stats["partitions_written"] == 4


def test_read_snapshot_ignores_stray_files(tmp_path):
    lake = _mk_lake(tmp_path)
    out = str(tmp_path / "snap_stray")
    export_snapshot(lake, out)
    # a torn write leaves a tmp file behind — readers must not see it
    with open(f"{out}/part=0/snapshot.parquet.tmp", "w") as f:
        f.write("garbage")
    n = read_snapshot(out).count()
    assert n == lake_final_table(lake).num_rows


def test_token_shards_matches_bruteforce():
    import re

    import pandas as pd
    import pyarrow.parquet as pq

    from sonic_etl_ray.pipelines.corpus import token_shards

    SF = "/root/testdata/sf0.001"
    got = token_shards(SF, capacity=2_000)
    docs = (
        pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang", "text"])
        .to_pandas()
        .sort_values(["lang", "doc_id"])
    )
    docs["n_tokens"] = docs["text"].map(lambda t: len(re.findall(r"\S+", t or "")))
    docs["shard_id"] = (
        docs.groupby("lang")["n_tokens"].cumsum() - docs["n_tokens"]
    ) // 2_000
    want = docs[["doc_id", "lang", "n_tokens", "shard_id"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "lang", "n_tokens", "shard_id"]], want, check_dtype=False
    )
    # shard invariants: within (lang, shard) token sums stay under capacity
    # + one document overhang; shard ids start at 0 and never decrease in
    # doc order (an over-capacity document may legitimately skip ids)
    for (_, _), g in got.groupby(["lang", "shard_id"]):
        assert g["n_tokens"].iloc[:-1].sum() < 2_000
    for _, g in got.groupby("lang"):
        assert g["shard_id"].iloc[0] == 0
        assert g["shard_id"].is_monotonic_increasing
