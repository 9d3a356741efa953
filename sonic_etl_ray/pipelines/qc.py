"""QC jobs: gap detection, row-count invariants, freshness, lake audit.

Re-expressions of the reference's Airflow QC DAGs:
- gap detection → ``daily_qc_airflow/daily_backfill_mainnet.py:47-159``
  (missing block numbers in the dense LSN range, re-compressed into
  contiguous backfill ranges);
- row-count invariants → ``daily_qc_airflow/row_counts.py:16-22,85-102``
  (per-parent child counts must match stored count columns);
- freshness/liveness → ``daily_qc_airflow/mainnet_hourly_block_check.py:33-47``.

All distributed: per-batch partial summaries inside ``map_batches``, a tiny
driver-side merge at the end (never ``take_all`` on the raw data).
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pyarrow as pa

import ray.data


def detect_gap_ranges(ds: ray.data.Dataset, lsn_column: str = "lsn") -> list[tuple[int, int]]:
    """Missing-LSN ranges in the dense [min, max] span of ``ds`` — O(gaps)
    on the driver, never O(span).

    Distributed run-length compression: each batch emits its contiguous
    present-runs as (start, end) pairs (one pair per run, not per LSN — a
    near-contiguous CDC block summarizes to ~1 row regardless of block
    size). The run lists are interval-unioned and complemented to gap
    ranges; the driver only ever sees run/gap summaries, so a sparse
    10^10-wide span costs O(runs), not the ~80 GB a dense ``np.arange``
    would. Mirrors the backfill DAG's ``find_contiguous_ranges``
    (``daily_backfill_mainnet.py:104-144``), which also works in ranges.
    """

    def summarize(t: pa.Table) -> pa.Table:
        arr = np.unique(np.asarray(t.column(lsn_column)))
        if arr.size == 0:
            return pa.table({"start": pa.array([], pa.int64()), "end": pa.array([], pa.int64())})
        brk = np.nonzero(np.diff(arr) != 1)[0]
        starts = np.concatenate(([arr[0]], arr[brk + 1]))
        ends = np.concatenate((arr[brk], [arr[-1]]))
        return pa.table({"start": starts, "end": ends})

    def coalesce(t: pa.Table) -> pa.Table:
        # second-level distributed merge: union overlapping/adjacent runs
        # within each (sorted) block so the driver's final merge is over an
        # already-compressed list
        s = np.asarray(t.column("start"))
        e = np.asarray(t.column("end"))
        if s.size == 0:
            return t
        order = np.argsort(s, kind="stable")
        s, e = s[order], e[order]
        keep = [0]
        for i in range(1, s.size):
            if s[i] <= e[keep[-1]] + 1:
                e[keep[-1]] = max(e[keep[-1]], e[i])
            else:
                keep.append(i)
        return pa.table({"start": s[keep], "end": e[keep]})

    runs = (
        ds.map_batches(summarize, batch_format="pyarrow")
        .sort("start")
        .map_batches(coalesce, batch_format="pyarrow")
        .take_all()
    )  # take_all here is over run summaries (O(runs)), not the data
    if not runs:
        return []
    # final cross-block union (blocks are start-sorted but may abut/overlap
    # at the seams); then complement → gap ranges
    merged: list[list[int]] = []
    for r in runs:
        s, e = int(r["start"]), int(r["end"])
        if merged and s <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    return [(merged[i - 1][1] + 1, merged[i][0] - 1) for i in range(1, len(merged))]


def detect_gaps(ds: ray.data.Dataset, lsn_column: str = "lsn") -> list[int]:
    """Missing LSNs in the dense [min, max] span of ``ds``, expanded from
    :func:`detect_gap_ranges`. Convenience for small gap sets (tests, the
    sf-scale oracle); at the 10^10-event design point call
    ``detect_gap_ranges`` directly — expansion is O(missing) by definition.
    """
    out: list[int] = []
    for lo, hi in detect_gap_ranges(ds, lsn_column):
        out.extend(range(lo, hi + 1))
    return out


def gaps_to_ranges(missing: list[int]) -> list[tuple[int, int]]:
    """Compress missing LSNs into contiguous inclusive ranges (re-publishable
    as backfill work units, ``daily_backfill_mainnet.py:104-144``)."""
    out: list[tuple[int, int]] = []
    for m in missing:
        if out and out[-1][1] == m - 1:
            out[-1] = (out[-1][0], m)
        else:
            out.append((m, m))
    return out


def plan_backfill(
    lake_dir: str, segment_files: list[str], lsn_column: str = "lsn"
) -> dict[str, Any]:
    """The full backfill-DAG loop (``daily_backfill_mainnet.py:47-159``):
    detect LSNs present in the source segments but absent from the lake's
    applied state, compress them into contiguous ranges, and return the
    minimal set of segments to replay (replay is safe: the merge is
    idempotent and watermark-gated, so re-ingesting a whole segment only
    applies what was missed).
    """
    import os

    import pyarrow.parquet as pq

    from ..state import commitlog as cl

    applied_segments: set[str] = set()
    for e in cl.committed_epochs(lake_dir):
        m = cl.read_manifest(lake_dir, e) or {}
        applied_segments.update(m.get("input", {}).get("segments", []))

    replay: list[str] = []
    spans: list[tuple[int, int]] = []
    for f in segment_files:
        if os.path.basename(f) in applied_segments:
            continue
        replay.append(f)
        # LSN span from footer metadata only (no data read) for the report —
        # kept as (lo, hi) PAIRS, never densely materialized (a 10^10-wide
        # span is ~80 GB of Python ints; same O(gaps) discipline as
        # detect_gap_ranges). The column is resolved BY NAME: positional
        # column(0) silently reads a different column's stats when the LSN
        # column is not physically first.
        md = pq.read_metadata(f)
        try:
            ci = md.schema.names.index(lsn_column)
        except ValueError:
            continue  # column absent — nothing to report for this file
        try:
            lo = min(md.row_group(i).column(ci).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(ci).statistics.max for i in range(md.num_row_groups))
            spans.append((int(lo), int(hi)))
        except (AttributeError, TypeError):  # no stats written
            pass
    # merge overlapping/adjacent spans into canonical disjoint ranges
    ranges: list[tuple[int, int]] = []
    for lo, hi in sorted(spans):
        if ranges and lo <= ranges[-1][1] + 1:
            ranges[-1] = (ranges[-1][0], max(ranges[-1][1], hi))
        else:
            ranges.append((lo, hi))
    return {
        "missing_lsns": sum(hi - lo + 1 for lo, hi in ranges),
        "ranges": ranges,
        "replay_segments": replay,
    }


def row_count_invariants(state: ray.data.Dataset) -> dict[str, Any]:
    """Per-repo file counts + byte totals from the lake state (J3 analog)."""
    from ray.data.aggregate import Count, Sum

    per_repo = (
        state.groupby("repo")
        .aggregate(Count(alias_name="n_files"), Sum("size_bytes", alias_name="total_bytes"))
        .take_all()
    )
    return {r["repo"]: {"n_files": r["n_files"], "total_bytes": r["total_bytes"]} for r in per_repo}


def freshness(lake_dir: str) -> dict[str, Any]:
    """Max applied LSN + commit epoch per partition (liveness metric, W5)."""
    import os

    from ..state import commitlog as cl

    out: dict[str, Any] = {}
    if not os.path.isdir(lake_dir):
        return out
    for name in sorted(os.listdir(lake_dir)):
        if not name.startswith("part="):
            continue
        part = int(name.split("=")[1])
        ref = cl.latest_file(lake_dir, part)  # delta commits advance liveness too
        if ref:
            rec = cl.read_commit(lake_dir, ref[1], part) or {}
            # row count at the frontier: copy-on-write commit → record n_rows;
            # merge-on-read delta frontier → record n_delta_rows; compaction
            # base (a state file riding a delta commit) → its lineage marker
            if ref[3] == "state" and rec.get("kind") == "delta":
                n_rows = _compaction_rows(ref[0])
            elif rec.get("kind") == "delta":
                n_rows = rec.get("n_delta_rows")
            else:
                n_rows = rec.get("n_rows")
            out[part] = {
                "epoch": ref[1],
                "applied_lsn": rec.get("applied_lsn"),
                "n_rows": n_rows,
                "kind": ref[3],
                # the resolved frontier FILE, so consumers verify against
                # the same snapshot this record describes (re-resolving
                # later races a live writer's next commit)
                "file": ref[0],
            }
    return out


def _compaction_rows(state_file: str) -> int | None:
    import json
    import os

    marker = state_file + ".compaction.json"
    if not os.path.exists(marker):
        return None
    with open(marker) as fh:
        return int(json.loads(fh.read())["n_rows"])


def skew_report(lake_dir: str) -> dict[str, Any]:
    """Partition-balance report from the commit log: row counts per
    partition, max/mean imbalance ratio, and the largest partitions.

    The explicit-skew-handling evidence the north rule asks for: with
    (repo, path) keying a 40%-hot repo should still yield imbalance ≈ 1;
    a report far above 1 means a pathological key needs salting.
    """
    f = freshness(lake_dir)
    if not f:
        return {"partitions": 0, "imbalance": None}
    rows = {p: int(v["n_rows"]) for p, v in f.items() if v.get("n_rows") is not None}
    vals = list(rows.values())
    if not vals:  # frontier exists but no recorded counts (e.g. a
        # compaction base whose lineage marker write was lost mid-crash)
        return {"partitions": len(f), "imbalance": None}
    mean = sum(vals) / len(vals)
    top = sorted(rows.items(), key=lambda kv: -kv[1])[:5]
    return {
        "partitions": len(vals),
        "total_rows": sum(vals),
        "mean_rows": round(mean, 1),
        "max_rows": max(vals),
        "imbalance": round(max(vals) / mean, 3) if mean else None,
        "top_partitions": top,
    }


def verify_lake_counts(lake_dir: str) -> bool:
    """Commit-log n_rows must equal actual data-file row counts (the
    count-column cross-check, A1–A4/J3 analog). For a merge-on-read frontier
    the recorded delta row count is checked against the delta file."""
    import pyarrow.parquet as pq

    for part, info in freshness(lake_dir).items():
        if info["n_rows"] is None:
            return False  # a frontier with no recorded count is a QC failure
        # verify against the SAME file freshness resolved — re-resolving the
        # frontier here would race a live writer's next commit and flag a
        # healthy lake
        actual = pq.read_metadata(info["file"]).num_rows
        if actual != info["n_rows"]:
            return False
    return True


def analyze_lake(lake_dir: str, columns: list[str]) -> "Any":
    """ANALYZE: exact per-column statistics of the lake's live state —
    (column, min_v, max_v, n_nulls, n_distinct), min/max rendered as
    strings (BIGINT via str(int), matching SQL CAST AS VARCHAR).

    Shape: one column-pruned pass; each batch emits its DISTINCT values
    per column (plus one null-count row per column), one groupby dedupes —
    shuffle volume is unique values, never rows (the exact-count-distinct
    combiner pattern). min/max/ndv then fold DISTRIBUTEDLY over the
    deduped rows in the column's native dtype (string compare of
    stringified ints would order '10' < '9'), so the driver only ever
    receives len(columns) stat rows — a content-sha-like column never
    lands its distinct set on the driver. The reference's analog is
    BigQuery's automatic table stats; here it is an explicit,
    oracle-checked QC op."""
    import pandas as pd
    import pyarrow.compute as pc

    from .ingest import read_lake

    ds = read_lake(lake_dir, columns=columns)
    dtypes = {f.name: f.type for f in ds.schema().base_schema}
    kinds = {
        c: "i" if pa.types.is_integer(dtypes[c]) else "f" if pa.types.is_floating(dtypes[c]) else "o"
        for c in columns
    }

    # null-count rows ride the same exchange under a NUL-prefixed sentinel
    # (a None value would break the sort-based groupby's key ordering);
    # real values can't collide: no lake column carries NUL bytes
    NULLS = "\x00__nulls__"

    def partial(t: pa.Table) -> pa.Table:
        cols, vals, ns = [], [], []
        for c in columns:
            arr = t.column(c)
            uniq = pc.unique(arr.drop_null()).cast(pa.string())
            cols += [c] * len(uniq)
            vals += uniq.to_pylist()
            ns += [1] * len(uniq)
            cols.append(c)
            vals.append(NULLS)
            ns.append(arr.null_count)
        return pa.table(
            {
                "column": pa.array(cols, pa.string()),
                "value": pa.array(vals, pa.string()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    from ray.data.aggregate import Max, Min, Sum

    def fold(t: pa.Table) -> pa.Table:
        # per-block typed partials over the DEDUPED (column, value) rows:
        # one output row per column per block, so the second groupby moves
        # O(blocks × columns) rows and the driver sees len(columns).
        # Vectorized per column (≤ len(columns) pandas groups per block).
        df = t.to_pandas()
        isnull = df["value"] == NULLS
        nulls = df[isnull].groupby("column")["n"].sum()
        acc: dict[str, dict] = {}
        for c, sub in df[~isnull].groupby("column"):
            k = kinds[c]
            v = (
                sub["value"].astype("int64")
                if k == "i"
                else sub["value"].astype("float64") if k == "f" else sub["value"]
            )
            acc[c] = {"n_distinct": len(sub), "mn": v.min(), "mx": v.max()}
        cols = sorted(set(acc) | set(nulls.index))
        def typed(field, kind_sel):
            return [
                acc[c][field] if c in acc and kinds[c] == kind_sel else None
                for c in cols
            ]
        return pa.table(
            {
                "column": pa.array(cols, pa.string()),
                "min_i": pa.array(typed("mn", "i"), pa.int64()),
                "max_i": pa.array(typed("mx", "i"), pa.int64()),
                "min_f": pa.array(typed("mn", "f"), pa.float64()),
                "max_f": pa.array(typed("mx", "f"), pa.float64()),
                "min_s": pa.array(typed("mn", "o"), pa.string()),
                "max_s": pa.array(typed("mx", "o"), pa.string()),
                "n_nulls": pa.array(
                    [int(nulls.get(c, 0)) for c in cols], pa.int64()
                ),
                "n_distinct": pa.array(
                    [acc[c]["n_distinct"] if c in acc else 0 for c in cols], pa.int64()
                ),
            }
        )

    stats = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["column", "value"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(fold, batch_format="pyarrow")
        .groupby("column")
        .aggregate(
            Min("min_i", alias_name="min_i"),
            Max("max_i", alias_name="max_i"),
            Min("min_f", alias_name="min_f"),
            Max("max_f", alias_name="max_f"),
            Min("min_s", alias_name="min_s"),
            Max("max_s", alias_name="max_s"),
            Sum("n_nulls", alias_name="n_nulls"),
            Sum("n_distinct", alias_name="n_distinct"),
        )
        .to_pandas()
        .set_index("column")
    )
    rows = []
    for c in columns:
        s = stats.loc[c]
        nd = int(s["n_distinct"])
        if nd == 0:
            mn = mx = None
        elif kinds[c] == "i":
            mn, mx = str(int(s["min_i"])), str(int(s["max_i"]))
        elif kinds[c] == "f":
            mn, mx = str(float(s["min_f"])), str(float(s["max_f"]))
        else:
            mn, mx = s["min_s"], s["max_s"]
        rows.append((c, mn, mx, int(s["n_nulls"]), nd))
    out = pd.DataFrame(
        rows, columns=["column", "min_v", "max_v", "n_nulls", "n_distinct"]
    )
    return out.sort_values("column").reset_index(drop=True)


def analyze_lake_approx(lake_dir: str, columns: list[str]) -> "Any":
    """Sketch-based ANALYZE — the 100-TB path. Same output shape as
    :func:`analyze_lake` but ndv comes from the integer-exact HLL sketch
    (``functions.sketch``): min/max/null counts stay EXACT (per-batch Arrow
    min_max folds merged by one tiny groupby), while n_distinct becomes
    ``est_distinct``. Shuffle volume is O(columns × (m+1)) rows per batch —
    independent of row count and of column cardinality, where the exact
    path ships every distinct value (fine for enums, quadratic trouble for
    content-sha-like columns at 10^10 rows).

    Parity: the estimate is reproducible bit-for-bit in SQL (md5-based
    register hash, dyadic integer sum — see ``sketch.hll_oracle_sql``), so
    the driver gate holds a hash-exact oracle row over it. min/max render
    as strings via str(int) for integer columns, matching CAST AS VARCHAR;
    float columns would NOT render identically (Python repr vs DuckDB
    VARCHAR formatting) — keep floats out of oracle-checked calls."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..functions.sketch import HLL_M, _hll_partial, hll_estimate_corrected
    from .ingest import read_lake

    ds = read_lake(lake_dir, columns=columns)
    dtypes = {f.name: f.type for f in ds.schema().base_schema}

    STAT_FIELDS = {
        "max_rho": pa.int64(),
        "min_i": pa.int64(),
        "max_i": pa.int64(),
        "min_f": pa.float64(),
        "max_f": pa.float64(),
        "min_s": pa.string(),
        "max_s": pa.string(),
        "n_nulls": pa.int64(),
    }

    def partial(t: pa.Table) -> pa.Table:
        frames = []
        for c in columns:
            arr = t.column(c).combine_chunks()
            vals = arr.drop_null()
            n = len(vals)
            # register rows: (column, bucket, max_rho), ≤ m per column
            if n:
                regs = _hll_partial(
                    pd.DataFrame({"column": [c] * n, "v": vals.to_pylist()}),
                    "column",
                    "v",
                )
            else:
                regs = pd.DataFrame({"column": [], "bucket": [], "max_rho": []})
            regs = pa.table(
                {
                    "column": pa.array(regs["column"], pa.string()),
                    "bucket": pa.array(regs["bucket"], pa.int64()),
                    "max_rho": pa.array(regs["max_rho"], pa.int64()),
                }
            )
            # one stats row per column under bucket=-1 (exact partials)
            stat: dict[str, Any] = {k: None for k in STAT_FIELDS}
            stat["n_nulls"] = arr.null_count
            if n:
                mm = pc.min_max(vals)
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
                if pa.types.is_integer(dtypes[c]):
                    stat["min_i"], stat["max_i"] = lo, hi
                elif pa.types.is_floating(dtypes[c]):
                    stat["min_f"], stat["max_f"] = lo, hi
                else:
                    stat["min_s"], stat["max_s"] = str(lo), str(hi)
            srow = pa.table(
                {
                    "column": pa.array([c], pa.string()),
                    "bucket": pa.array([-1], pa.int64()),
                    **{k: pa.array([stat[k]], typ) for k, typ in STAT_FIELDS.items()},
                }
            )
            # null-extend register rows to the full stat schema
            for k, typ in STAT_FIELDS.items():
                if k != "max_rho":
                    regs = regs.append_column(k, pa.nulls(regs.num_rows, typ))
            frames.append(regs)
            frames.append(srow)
        return pa.concat_tables(frames, promote_options="default")

    from ray.data.aggregate import Max, Min, Sum

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["column", "bucket"])
        .aggregate(
            Max("max_rho", alias_name="max_rho"),
            Min("min_i", alias_name="min_i"),
            Max("max_i", alias_name="max_i"),
            Min("min_f", alias_name="min_f"),
            Max("max_f", alias_name="max_f"),
            Min("min_s", alias_name="min_s"),
            Max("max_s", alias_name="max_s"),
            Sum("n_nulls", alias_name="n_nulls"),
        )
        .to_pandas()
    )
    regs = merged[merged["bucket"] >= 0]
    est = hll_estimate_corrected(
        regs[["column", "bucket", "max_rho"]], "column"
    ).set_index("column")["est_distinct"]
    rows = []
    for c in columns:
        s = merged[(merged["column"] == c) & (merged["bucket"] == -1)].iloc[0]
        if pa.types.is_integer(dtypes[c]):
            mn = None if pd.isna(s["min_i"]) else str(int(s["min_i"]))
            mx = None if pd.isna(s["max_i"]) else str(int(s["max_i"]))
        elif pa.types.is_floating(dtypes[c]):
            mn = None if pd.isna(s["min_f"]) else str(float(s["min_f"]))
            mx = None if pd.isna(s["max_f"]) else str(float(s["max_f"]))
        else:
            mn = s["min_s"] if isinstance(s["min_s"], str) else None
            mx = s["max_s"] if isinstance(s["max_s"], str) else None
        rows.append((c, mn, mx, int(s["n_nulls"]), int(est.get(c, 0))))
    out = pd.DataFrame(
        rows, columns=["column", "min_v", "max_v", "n_nulls", "est_distinct"]
    )
    return out.sort_values("column").reset_index(drop=True)


from dataclasses import dataclass as _dataclass


@_dataclass(frozen=True)
class Constraint:
    """One declarative data-quality rule over the lake's live state — the
    Deequ/dbt-test shape re-expressed for the CDC lake (the reference's
    QC DAG checks fixed invariants, ``daily_qc_airflow/row_counts.py:16-22``;
    this is the user-extensible version).

    kinds: ``not_null`` | ``accepted_values`` (nulls pass) | ``range``
    (inclusive bounds, nulls pass) | ``regex`` (search semantics — anchor
    the pattern for full-match; nulls pass) | ``unique`` (violations =
    non-null rows minus distinct keys; multi-column keys join on NUL)."""

    name: str
    kind: str
    columns: tuple[str, ...]
    values: tuple = ()
    lo: float | int | None = None
    hi: float | int | None = None
    pattern: str | None = None


def map_violations(t: pa.Table, con: Constraint) -> int:
    """Violation count of one MAP-kind constraint (not_null /
    accepted_values / range / regex) over one Arrow batch — the
    vectorized per-row predicate shared by the full scan
    (:func:`check_constraints`) and the incremental monitor
    (:class:`ConstraintMonitor`); a map kind is a pure row predicate, so
    counts are sign-decomposable over change-feed pre/post images."""
    import pyarrow.compute as pc

    arr = t.column(con.columns[0])
    vals = arr.drop_null()
    if con.kind == "not_null":
        return int(arr.null_count)
    if con.kind == "accepted_values":
        if not len(vals):
            return 0
        ok = pc.is_in(vals, value_set=pa.array(list(con.values), arr.type))
        return int(len(vals) - pc.sum(ok).as_py())
    if con.kind == "range":
        v = 0
        if len(vals):
            if con.lo is not None:
                v += pc.sum(pc.less(vals, con.lo)).as_py() or 0
            if con.hi is not None:
                v += pc.sum(pc.greater(vals, con.hi)).as_py() or 0
        return int(v)
    if con.kind == "regex":
        if not len(vals):
            return 0
        return int(len(vals) - (pc.sum(pc.match_substring_regex(vals, con.pattern)).as_py() or 0))
    raise ValueError(f"unknown constraint kind {con.kind!r}")


def check_constraints(
    lake_dir: str,
    constraints: list[Constraint],
    consistent: bool = False,
    as_of_epoch: int | None = None,
) -> "Any":
    """Evaluate constraints over the live lake state, distributed, in ONE
    column-pruned scan: the map kinds (not_null / accepted_values / range
    / regex) are fixed-size per-batch counter partials, and ALL unique
    rules ship their per-batch distinct keys through the SAME exchange
    (sentinel-keyed counter rows ride alongside the (rule, key) pairs —
    the pattern :func:`analyze_lake` uses for its null-count rows). One
    groupby dedupes keys and sums counters; a per-block fold then reduces
    the deduped pairs to per-rule ndv partials, so the driver only ever
    sees one row per constraint. Returns (constraint, violations,
    n_rows)."""
    import pandas as pd
    import pyarrow.compute as pc

    from .ingest import read_lake

    cols = sorted({c for con in constraints for c in con.columns})
    ds = read_lake(lake_dir, columns=cols, consistent=consistent, as_of_epoch=as_of_epoch)
    maps = [c for c in constraints if c.kind != "unique"]
    uniqs = [c for c in constraints if c.kind == "unique"]

    TOTAL = "\x00__rows__"
    SENTK = "\x00#"  # counter-row key sentinel; lake values never carry NUL

    def _key_array(t: pa.Table, con: Constraint) -> pa.Array:
        parts = [t.column(c).cast(pa.string()) for c in con.columns]
        if len(parts) == 1:
            return parts[0].combine_chunks()
        return pc.binary_join_element_wise(*parts, "\x00")

    def partial(t: pa.Table) -> pa.Table:
        names = [TOTAL]
        viols = [t.num_rows]
        for con in maps:
            names.append(con.name)
            viols.append(map_violations(t, con))
        # unique rules ride the SAME exchange: a nonnull counter row per
        # rule plus the batch's distinct (rule, key) pairs. Counter rows
        # use a sentinel key so the groupby sums them; pair rows carry
        # n=0 and only contribute their existence (deduped by the key).
        keys = [SENTK] * len(names)
        for con in uniqs:
            key = _key_array(t, con)
            names.append(f"\x00__nonnull__{con.name}")
            viols.append(len(key.drop_null()))
            keys.append(SENTK)
            u = pc.unique(key.drop_null())
            names.extend([con.name] * len(u))
            viols.extend([0] * len(u))
            keys.extend(u.to_pylist())
        return pa.table(
            {
                "constraint": pa.array(names, pa.string()),
                "key": pa.array(keys, pa.string()),
                "n": pa.array(viols, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    def fold(t: pa.Table) -> pa.Table:
        # per-block reduce of the deduped exchange: counter rows pass
        # through; each rule's surviving key rows collapse to one ndv
        # partial — the driver receives one row per constraint total
        is_counter = pc.equal(t.column("key"), SENTK)
        counters = t.filter(is_counter)
        pairs = t.filter(pc.invert(is_counter))
        names = counters.column("constraint").to_pylist()
        ns = counters.column("n").to_pylist()
        vc = pairs.column("constraint").combine_chunks().value_counts()
        names += [f"\x00__ndv__{v}" for v in vc.field("values").to_pylist()]
        ns += vc.field("counts").to_pylist()
        return pa.table(
            {"constraint": pa.array(names, pa.string()), "n": pa.array(ns, pa.int64())}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["constraint", "key"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(fold, batch_format="pyarrow")
        .groupby("constraint")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .set_index("constraint")["n"]
    )
    n_rows = int(agg[TOTAL])
    out_rows = [(c.name, int(agg.get(c.name, 0)), n_rows) for c in maps]
    for con in uniqs:
        out_rows.append(
            (
                con.name,
                int(agg[f"\x00__nonnull__{con.name}"]) - int(agg.get(f"\x00__ndv__{con.name}", 0)),
                n_rows,
            )
        )
    out = pd.DataFrame(out_rows, columns=["constraint", "violations", "n_rows"])
    return out.sort_values("constraint").reset_index(drop=True)


class ConstraintMonitor:
    """Incremental data-quality monitoring: MAP-kind constraint counters
    over the lake's LIVE state, maintained from the change feed instead of
    rescanning — streaming QC for a long-running tail.

    Map kinds (not_null / accepted_values / range / regex) are pure row
    predicates, so their live-state counts decompose over the feed's
    signed images: insert/update post-images add, update_preimage/delete
    rows (which carry the removed row's last live values,
    ``read_change_feed(include_preimages=True)``) subtract. Per refreshed
    epoch the monitor folds one lazy feed Dataset (per-batch counter
    partials — no lake read, no shuffle) and atomically persists
    counters + cursor in ONE fsync'd state file, so a crash between fold
    and persist simply refolds that epoch (the fold is a pure function of
    the feed). Bootstrap runs one full :func:`check_constraints` scan
    pinned to the committed frontier and starts the cursor there.

    Unique rules are rejected (their state is the key multiset, not a
    counter — use the full scan); the monitored epochs' pre-states must
    not be vacuumed away before refresh (size ``vacuum(keep_epochs=...)``
    to the refresh cadence, same discipline the replica feed needs)."""

    def __init__(
        self,
        lake_dir: str,
        constraints: list[Constraint],
        state_path: str,
        on_violation: "Callable[[dict], None] | None" = None,
    ):
        bad = [c.name for c in constraints if c.kind == "unique"]
        if bad:
            raise ValueError(f"unique constraints cannot be monitored incrementally: {bad}")
        self.lake_dir = lake_dir
        self.constraints = list(constraints)
        self.state_path = state_path
        # alert hook (the reference wires task_fail_alert into every QC DAG,
        # daily_qc_airflow/google_chat_callbacks.py:1): called once per
        # (epoch, constraint) whose violation counter INCREASED — and once
        # per already-violated constraint at bootstrap — with a dict
        # {constraint, new_violations, total, epoch, lake[, bootstrap]}.
        # At-least-once: a crash between fold and persist refolds the epoch
        # and may re-fire. Clean epochs never fire.
        self.on_violation = on_violation

    def _load(self) -> dict | None:
        import json

        try:
            with open(self.state_path) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return None

    def _persist(self, state: dict) -> None:
        import json
        import os

        from ..state import commitlog as cl

        os.makedirs(os.path.dirname(self.state_path) or ".", exist_ok=True)
        cl._atomic_write(self.state_path, json.dumps(state).encode())

    def _bootstrap(self) -> dict:
        from .ingest import committed_frontier

        pin = committed_frontier(self.lake_dir)
        # Scan pinned to the SAME epoch the cursor starts at: consistent=True
        # alone re-resolves the frontier inside read_lake, so a concurrent
        # writer committing between the two calls would be both included in
        # the bootstrap scan AND re-folded by refresh() — double-counted.
        # pin is None ⇒ nothing is committed ⇒ the state at the cursor is
        # EMPTY by definition: start from zeros without scanning at all
        # (a scan here would reopen the same race for the first epoch a
        # concurrent writer commits).
        if pin is None:
            return {
                "acked_epoch": None,
                "n_rows": 0,
                "violations": {c.name: 0 for c in self.constraints},
            }
        full = check_constraints(
            self.lake_dir, self.constraints, as_of_epoch=pin
        ).set_index("constraint")
        n_rows = int(full["n_rows"].iloc[0]) if len(full) else 0
        return {
            "acked_epoch": pin,
            "n_rows": n_rows,
            "violations": {c.name: int(full.loc[c.name, "violations"]) for c in self.constraints},
        }

    def _fold_epoch(self, epoch: int) -> dict[str, int]:
        """Signed counter deltas from one epoch's feed."""
        from .ingest import read_change_feed

        feed = read_change_feed(self.lake_dir, epoch, include_preimages=True)
        cons = self.constraints

        def partial(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ct = t.column("change_type")
            plus = t.filter(pc.is_in(ct, value_set=pa.array(["insert", "update"])))
            minus = t.filter(pc.is_in(ct, value_set=pa.array(["update_preimage", "delete"])))
            names = ["\x00__rows__"]
            deltas = [
                int(pc.sum(pc.equal(ct, "insert")).as_py() or 0)
                - int(pc.sum(pc.equal(ct, "delete")).as_py() or 0)
            ]
            for con in cons:
                names.append(con.name)
                deltas.append(map_violations(plus, con) - map_violations(minus, con))
            return pa.table(
                {"constraint": pa.array(names, pa.string()), "d": pa.array(deltas, pa.int64())}
            )

        out = feed.map_batches(partial, batch_format="pyarrow").to_pandas()
        return out.groupby("constraint")["d"].sum().to_dict()

    def refresh(self) -> dict:
        """Fold every committed epoch past the cursor; returns the state."""
        from ..state import commitlog as cl

        state = self._load()
        if state is None:
            state = self._bootstrap()
            # fire BEFORE the cursor persists: a crash between the two
            # re-bootstraps and re-fires (at-least-once, the documented
            # contract); persisting first would make a crash lose the
            # alert forever (at-most-once)
            if self.on_violation:
                for name, v in state["violations"].items():
                    if v > 0:
                        self._fire(name, v, v, state["acked_epoch"], bootstrap=True)
            self._persist(state)
        acked = state["acked_epoch"]
        for e in cl.committed_epochs(self.lake_dir):
            if acked is not None and e <= acked:
                continue
            deltas = self._fold_epoch(e)
            state["n_rows"] += int(deltas.pop("\x00__rows__", 0))
            for name, d in deltas.items():
                state["violations"][name] = state["violations"].get(name, 0) + int(d)
            state["acked_epoch"] = acked = e
            # same ordering as bootstrap: alert, then advance the cursor —
            # a crash in between refolds epoch e and re-fires (alert sinks
            # must be idempotent per (epoch, constraint); _fire swallows
            # sink exceptions so the persist below always runs)
            if self.on_violation:
                for name, d in deltas.items():
                    if int(d) > 0:
                        self._fire(name, int(d), state["violations"][name], e)
            self._persist(state)  # atomic per epoch: crash refolds, never skips
        return state

    def _fire(self, name: str, new: int, total: int, epoch, **extra) -> None:
        import logging

        evt = {
            "constraint": name,
            "new_violations": new,
            "total": total,
            "epoch": epoch,
            "lake": self.lake_dir,
            **extra,
        }
        try:
            self.on_violation(evt)
        except Exception:  # an alert sink must never kill the monitor loop
            logging.getLogger(__name__).exception("on_violation callback failed")

    def report(self) -> "Any":
        """Current counters as the same frame shape as check_constraints."""
        import pandas as pd

        state = self.refresh()
        rows = [
            (c.name, int(state["violations"].get(c.name, 0)), int(state["n_rows"]))
            for c in self.constraints
        ]
        return (
            pd.DataFrame(rows, columns=["constraint", "violations", "n_rows"])
            .sort_values("constraint")
            .reset_index(drop=True)
        )
