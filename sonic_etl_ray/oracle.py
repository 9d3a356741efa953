"""Independent oracle: golden final-table state via DuckDB.

The reference's conformance corpus compares transform output to golden
fixtures bit-for-bit (``sonic_config/test.rs:174-221``); our analog replays
the change stream through an *independent engine* (DuckDB SQL window
functions) and compares against the Ray lake state, including the per-row
``sha256(content)`` invariant (BASELINE.json ``input_hint``).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.compute as pc

from .schemas import STATE_SORT

_ORACLE_SQL = """
WITH ev AS (
  SELECT * FROM read_parquet({files}, union_by_name=true)
),
dedup AS (  -- duplicate delivery: identical (lsn) rows collapse to one
  SELECT * FROM ev QUALIFY row_number() OVER (PARTITION BY lsn) = 1
),
last AS (   -- last-writer-wins per (repo, path) by LSN
  SELECT * FROM dedup
  QUALIFY row_number() OVER (PARTITION BY repo, path ORDER BY lsn DESC) = 1
)
SELECT
  repo, path, "commit", lang, content,
  sha256(content) AS content_sha256,
  CAST(strlen(content) AS BIGINT) AS size_bytes,
  lsn AS applied_lsn
  {extra_cols}
FROM last
WHERE op <> 'delete'
ORDER BY repo, path
"""


def oracle_final_state(segment_files: list[str], extra_columns: list[str] | None = None) -> pa.Table:
    """Golden lake state for a segmented change stream (canonically sorted)."""
    files = "[" + ", ".join(f"'{f}'" for f in segment_files) + "]"
    extra = "".join(f', "{c}"' for c in (extra_columns or []))
    con = duckdb.connect()
    try:
        tbl = con.sql(_ORACLE_SQL.format(files=files, extra_cols=extra)).arrow()
    finally:
        con.close()
    return tbl


def assert_state_equal(engine: pa.Table, golden: pa.Table) -> None:
    """Bit-for-bit equality on shared columns + recomputed sha256 cross-check."""
    import hashlib

    assert engine.num_rows == golden.num_rows, (
        f"row count {engine.num_rows} != golden {golden.num_rows}"
    )
    engine = engine.take(pc.sort_indices(engine, sort_keys=STATE_SORT))
    golden = golden.take(pc.sort_indices(golden, sort_keys=STATE_SORT))
    for name in golden.column_names:
        a = engine.column(name).combine_chunks().cast(golden.column(name).type)
        b = golden.column(name).combine_chunks()
        if not a.equals(b):
            neq = pc.fill_null(pc.not_equal(a, b), True)
            idx = pc.index(neq, True).as_py()
            raise AssertionError(
                f"column {name!r} differs at row {idx}: "
                f"engine={a[idx] if idx >= 0 else None} golden={b[idx] if idx >= 0 else None}"
            )
    # cross-check: recompute sha256 from content, compare to stored column
    contents = engine.column("content").to_pylist()
    stored = engine.column("content_sha256").to_pylist()
    for i, (c, s) in enumerate(zip(contents, stored)):
        want = None if c is None else hashlib.sha256(c.encode()).hexdigest()
        assert want == s, f"sha256 mismatch at row {i}"
