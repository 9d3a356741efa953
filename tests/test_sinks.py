"""Auxiliary sink tests (JSONL/JSON fixtures, bucketed Parquet layout)."""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from sonic_etl_ray.sources.sinks import (
    write_bucketed_parquet,
    write_json_fixture,
    write_jsonl,
)


def test_write_jsonl(tmp_path):
    ds = ray.data.from_items([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    out = write_jsonl(ds, str(tmp_path / "jl"))
    rows = []
    for f in glob.glob(os.path.join(out, "*.json")):
        with open(f) as fh:
            rows += [json.loads(line) for line in fh if line.strip()]
    assert sorted(r["a"] for r in rows) == [1, 2]


def test_write_json_fixture(tmp_path):
    p = write_json_fixture({"k": [1, 2]}, str(tmp_path), "golden")
    assert json.load(open(p)) == {"k": [1, 2]}
    # truncate-overwrite semantics (output/json.rs:45-67)
    p = write_json_fixture({"k": [3]}, str(tmp_path), "golden")
    assert json.load(open(p)) == {"k": [3]}


def test_write_bucketed_parquet(tmp_path):
    t = pa.table({"lsn": list(range(100)), "v": [str(i) for i in range(100)]})
    out = write_bucketed_parquet(ray.data.from_arrow(t), str(tmp_path / "bp"), "lsn", 25)
    dirs = sorted(os.path.basename(d) for d in glob.glob(os.path.join(out, "bucket=*")))
    assert dirs == ["bucket=0", "bucket=1", "bucket=2", "bucket=3"]
    got = pq.read_table(out)
    assert got.num_rows == 100


def test_parquet_compression_knob(monkeypatch):
    """SONIC_ETL_COMPRESSION picks the codec for every lake artifact write
    (end-to-end proof in BASELINE.md: identical state sha256 under snappy
    and zstd, zstd 38% smaller on the synthetic content)."""
    from sonic_etl_ray.config import parquet_write_kwargs

    monkeypatch.delenv("SONIC_ETL_COMPRESSION", raising=False)
    monkeypatch.delenv("SONIC_ETL_COMPRESSION_LEVEL", raising=False)
    assert parquet_write_kwargs() == {"compression": "snappy"}
    monkeypatch.setenv("SONIC_ETL_COMPRESSION", "zstd")
    assert parquet_write_kwargs() == {"compression": "zstd", "compression_level": 1}
    monkeypatch.setenv("SONIC_ETL_COMPRESSION_LEVEL", "3")
    assert parquet_write_kwargs() == {"compression": "zstd", "compression_level": 3}
