"""Secondary value index (per-partition distinct-value zone maps).

Correctness: the pruned read must equal the unpruned filtered scan, always.
Pruning: a value held by a single key reads only that key's partition.
Staleness: epochs committed after the build are scanned unconditionally —
the index never has to be rebuilt for reads to stay exact.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from sonic_etl_ray.pipelines.ingest import apply_epoch, read_lake
from sonic_etl_ray.pipelines.colindex import (
    build_value_index,
    probe_parts,
    read_lake_by_value,
)

P = 8


def _events(rows):
    """rows: (lsn, repo, path, lang, content)"""
    return pa.table(
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


@pytest.fixture()
def lake(ray_session, tmp_path):
    import ray.data

    rows = [(i, f"r{i % 5}", f"f{i}.txt", "common", f"body {i}") for i in range(64)]
    rows.append((1000, "r0", "rare.txt", "rare", "the rare one"))
    lake = str(tmp_path / "lake")
    apply_epoch(ray.data.from_arrow(_events(rows)), lake, epoch=0, num_partitions=P)
    return lake


def test_indexed_read_equals_filtered_scan(lake):
    import pyarrow.compute as pc

    build_value_index(lake, "lang")
    got = (
        read_lake_by_value(lake, "lang", ["rare"], columns=["repo", "path", "lang"])
        .to_pandas()
        .sort_values("path")
        .reset_index(drop=True)
    )
    want = (
        read_lake(lake, columns=["repo", "path", "lang"], filter=pc.field("lang") == "rare")
        .to_pandas()
        .sort_values("path")
        .reset_index(drop=True)
    )
    assert got.equals(want)
    assert got["path"].tolist() == ["rare.txt"]


def test_probe_prunes_to_value_partitions(lake):
    build_value_index(lake, "lang")
    sel, stale = probe_parts(lake, "lang", ["rare"])
    assert stale == []
    assert len(sel) == 1  # single key ⇒ single partition
    sel_common, _ = probe_parts(lake, "lang", ["common"])
    assert len(sel_common) > 1
    sel_none, _ = probe_parts(lake, "lang", ["absent"])
    assert sel_none == []
    # empty selection reads an empty dataset, not an error
    assert read_lake_by_value(lake, "lang", ["absent"]).count() == 0


def test_stale_partitions_scanned_without_rebuild(lake):
    import ray.data

    build_value_index(lake, "lang")
    # commit a new epoch adding 'rare' under ANOTHER key (other partition)
    apply_epoch(
        ray.data.from_arrow(_events([(2000, "r3", "late-rare.txt", "rare", "late")])),
        lake,
        epoch=1,
        num_partitions=P,
    )
    sel, stale = probe_parts(lake, "lang", ["rare"])
    assert len(stale) >= 1  # the touched partition's frontier moved
    got = read_lake_by_value(lake, "lang", ["rare"], columns=["path"]).to_pandas()
    assert sorted(got["path"]) == ["late-rare.txt", "rare.txt"]
    # rebuild re-freshens: no stale parts, both partitions indexed
    build_value_index(lake, "lang")
    sel2, stale2 = probe_parts(lake, "lang", ["rare"])
    assert stale2 == [] and len(sel2) == 2


def test_missing_index_falls_back_to_full_scan(lake):
    got = read_lake_by_value(
        lake, "lang", ["rare"], columns=["path"], index_root=str(lake) + "_nowhere"
    ).to_pandas()
    assert got["path"].tolist() == ["rare.txt"]


def test_index_root_outside_lake(lake, tmp_path):
    root = str(tmp_path / "idx_root")
    build_value_index(lake, "lang", index_root=root)
    assert os.path.exists(os.path.join(root, "column=lang", "MANIFEST.json"))
    assert not os.path.exists(os.path.join(lake, "_colindex"))
    sel, stale = probe_parts(lake, "lang", ["rare"], index_root=root)
    assert len(sel) == 1 and stale == []


def test_incremental_refresh_reuses_unchanged_partitions(lake):
    import json

    import pyarrow.parquet as pq
    import ray.data

    d = build_value_index(lake, "lang")
    # one new epoch touching ONE key → one partition's frontier moves
    apply_epoch(
        ray.data.from_arrow(_events([(3000, "r1", "fresh.txt", "newlang", "x")])),
        lake,
        epoch=1,
        num_partitions=P,
    )
    build_value_index(lake, "lang")
    man = json.load(open(os.path.join(d, "MANIFEST.json")))
    assert man["parts_rebuilt"] == 1 and man["parts_reused"] == P - 1
    # refreshed index equals a from-scratch rebuild (force by nuking manifest)
    idx_inc = (
        pq.read_table(os.path.join(d, man["file"]))
        .to_pandas()
        .sort_values(["part", "value"])
        .reset_index(drop=True)
    )
    os.unlink(os.path.join(d, "MANIFEST.json"))
    build_value_index(lake, "lang")
    man2 = json.load(open(os.path.join(d, "MANIFEST.json")))
    assert man2["parts_rebuilt"] == P and man2["parts_reused"] == 0
    idx_full = (
        pq.read_table(os.path.join(d, man2["file"]))
        .to_pandas()
        .sort_values(["part", "value"])
        .reset_index(drop=True)
    )
    assert idx_inc.equals(idx_full)
    sel, stale = probe_parts(lake, "lang", ["newlang"])
    assert len(sel) == 1 and stale == []


def test_index_on_evolved_column(lake):
    """Indexing a column only SOME partitions carry: pre-evolution
    partitions contribute empty zone maps (all-null reads), probes hit only
    the evolved partition, and the pruned read equals the filtered scan."""
    import pyarrow.compute as pc2
    import ray.data

    evolved = pa.table(
        {
            "op": pa.array(["insert"], pa.string()),
            "lsn": pa.array([5000], pa.int64()),
            "repo": pa.array(["r4"], pa.string()),
            "path": pa.array(["lic.txt"], pa.string()),
            "commit": pa.array(["c5000"], pa.string()),
            "lang": pa.array(["common"], pa.string()),
            "content": pa.array(["licensed"], pa.string()),
            "license": pa.array(["mit"], pa.string()),
        }
    )
    apply_epoch(ray.data.from_arrow(evolved), lake, epoch=1, num_partitions=P)
    build_value_index(lake, "license")
    sel, stale = probe_parts(lake, "license", ["mit"])
    assert stale == [] and len(sel) == 1
    got = read_lake_by_value(lake, "license", ["mit"], columns=["path"]).to_pandas()
    want = (
        read_lake(lake, columns=["path"], filter=pc2.field("license") == "mit")
        .to_pandas()
    )
    assert sorted(got["path"]) == sorted(want["path"]) == ["lic.txt"]


def test_probe_canonicalizes_non_string_values(lake):
    """Zone maps store Arrow cast-to-string forms; probes must canonicalize
    the same way (str(True) = 'True' but Arrow casts bool to 'true') or
    non-string columns silently prune away real matches."""
    import pyarrow.compute as pc2
    import ray.data

    flagged = pa.table(
        {
            "op": pa.array(["insert"], pa.string()),
            "lsn": pa.array([7000], pa.int64()),
            "repo": pa.array(["r2"], pa.string()),
            "path": pa.array(["flag.txt"], pa.string()),
            "commit": pa.array(["c7000"], pa.string()),
            "lang": pa.array(["common"], pa.string()),
            "content": pa.array(["flagged"], pa.string()),
            "flag": pa.array([True], pa.bool_()),
        }
    )
    apply_epoch(ray.data.from_arrow(flagged), lake, epoch=1, num_partitions=P)
    build_value_index(lake, "flag")
    sel, stale = probe_parts(lake, "flag", [True])
    assert stale == [] and len(sel) == 1
    got = read_lake_by_value(lake, "flag", [True], columns=["path"]).to_pandas()
    want = read_lake(lake, columns=["path"], filter=pc2.field("flag") == True)  # noqa: E712
    assert got["path"].tolist() == want.to_pandas()["path"].tolist() == ["flag.txt"]
