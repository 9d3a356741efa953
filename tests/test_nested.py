"""Nested (list<struct>) columns through schema evolution and the merge.

The reference's REPEATED RECORD shapes (``schemas/bq/traces.json`` action/
result, ``schemas/proto/blocks.proto:7-27`` withdrawals): nested columns
must survive column-add evolution, struct-field widening, struct-field
ADD, and the tombstone-LWW merge sink.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from sonic_etl_ray.pipelines.ingest import lake_final_table, run_ingest, scratch_lake_dir
from sonic_etl_ray.schemas import conform_array, conform_table, unify_schemas, widen_type


def test_widen_nested_types():
    s32 = pa.list_(pa.struct([("k", pa.string()), ("n", pa.int32())]))
    s64 = pa.list_(pa.struct([("k", pa.string()), ("n", pa.int64())]))
    assert widen_type(s32, s64).equals(s64)
    added = pa.list_(pa.struct([("k", pa.string()), ("n", pa.int64()), ("w", pa.string())]))
    assert widen_type(s32, added).equals(added)


def test_conform_array_struct_field_add_and_widen():
    ls = pa.array(
        [[{"k": "a", "n": 1}], None, [{"k": "b", "n": 2}, {"k": "c", "n": 3}]],
        pa.list_(pa.struct([("k", pa.string()), ("n", pa.int32())])),
    )
    target = pa.list_(pa.struct([("k", pa.string()), ("n", pa.int64()), ("w", pa.string())]))
    out = conform_array(ls, target)
    assert out.type.equals(target)
    assert out.to_pylist() == [
        [{"k": "a", "n": 1, "w": None}],
        None,
        [{"k": "b", "n": 2, "w": None}, {"k": "c", "n": 3, "w": None}],
    ]


def _segment(path: str, rows: list[dict], attrs_type: pa.DataType | None):
    cols = {
        "lsn": pa.array([r["lsn"] for r in rows], pa.int64()),
        "op": pa.array(["insert"] * len(rows), pa.string()),
        "repo": pa.array([r["repo"] for r in rows], pa.string()),
        "path": pa.array([r["path"] for r in rows], pa.string()),
        "commit": pa.array(["c"] * len(rows), pa.string()),
        "lang": pa.array(["py"] * len(rows), pa.string()),
        "content": pa.array([r["content"] for r in rows], pa.string()),
    }
    if attrs_type is not None:
        cols["attrs"] = pa.array([r["attrs"] for r in rows], attrs_type)
    pq.write_table(pa.table(cols), path)


def test_list_struct_through_evolution_and_merge(tmp_path):
    """Three-segment history: no attrs → attrs with int32 n → attrs with
    int64 n AND an added struct field. The merge must unify to the widest
    nested schema and keep per-key LWW payloads intact."""
    seg = str(tmp_path / "segs")
    os.makedirs(seg)
    t32 = pa.list_(pa.struct([("k", pa.string()), ("n", pa.int32())]))
    t64w = pa.list_(pa.struct([("k", pa.string()), ("n", pa.int64()), ("w", pa.string())]))
    _segment(f"{seg}/segment_000000.parquet",
             [{"lsn": 0, "repo": "r", "path": "a", "content": "v0"},
              {"lsn": 1, "repo": "r", "path": "b", "content": "v0"}], None)
    _segment(f"{seg}/segment_000001.parquet",
             [{"lsn": 2, "repo": "r", "path": "b", "content": "v1",
               "attrs": [{"k": "x", "n": 7}]}], t32)
    _segment(f"{seg}/segment_000002.parquet",
             [{"lsn": 3, "repo": "r", "path": "c", "content": "v0",
               "attrs": [{"k": "y", "n": 2**40, "w": "deep"}, {"k": "z", "n": 1, "w": None}]}],
             t64w)
    lake = scratch_lake_dir("nested")
    run_ingest(sorted(glob.glob(seg + "/*.parquet")), lake,
               num_partitions=2, segments_per_epoch=1)
    final = lake_final_table(lake)
    assert final.schema.field("attrs").type.equals(t64w)
    rows = {(r["repo"], r["path"]): r["attrs"] for r in final.to_pylist()}
    assert rows[("r", "a")] is None
    assert rows[("r", "b")] == [{"k": "x", "n": 7, "w": None}]
    assert rows[("r", "c")] == [
        {"k": "y", "n": 2**40, "w": "deep"},
        {"k": "z", "n": 1, "w": None},
    ]


def test_unify_schemas_nested_column_add():
    base = pa.schema([("repo", pa.string())])
    withnested = pa.schema(
        [("repo", pa.string()),
         ("attrs", pa.list_(pa.struct([("k", pa.string())])))]
    )
    u = unify_schemas(base, withnested)
    assert u.field("attrs").type.equals(withnested.field("attrs").type)
    t = conform_table(pa.table({"repo": pa.array(["r"])}), u)
    assert t.column("attrs").to_pylist() == [None]
