"""Multi-table fan-out: one fused transform → several logical tables.

The reference's fused transform ``transform_logs_and_events`` emits rows for
TWO tables from one pass (``transformation/common.rs:309-496``) and the
publisher fans them out to per-table topics (K1,
``sonic_config/streampublisher.rs:27-88``). Ray-Data-idiomatic version: the
fused ``map_batches`` emits one envelope table with a ``__table`` column
(superset schema, unused columns null), and ONE ``write_parquet(...,
partition_cols=["__table"])`` routes every logical table to its own
directory in a single pass — no second execution, no per-table shuffle.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

TABLE_COLUMN = "__table"


def fused_detail_and_stats(batch: pa.Table) -> pa.Table:
    """One pass over raw events → detail rows + per-user stat PARTIALS.

    Partials follow the combiner pattern: one stat row per user per batch;
    the small final aggregate happens on read-back (never a full shuffle of
    the detail table).
    """
    detail = pa.table(
        {
            TABLE_COLUMN: pa.array(["detail"] * batch.num_rows),
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "value": batch.column("value"),
            "n_events": pa.nulls(batch.num_rows, pa.int64()),
        }
    )
    part = (
        pa.table({"user_id": batch.column("user_id"), "value": batch.column("value")})
        .group_by("user_id")
        .aggregate([("value", "sum"), ("value", "count")])
    )
    stats = pa.table(
        {
            TABLE_COLUMN: pa.array(["user_stats"] * part.num_rows),
            "event_id": pa.nulls(part.num_rows, pa.int64()),
            "user_id": part.column("user_id"),
            "value": part.column("value_sum"),
            "n_events": pc.cast(part.column("value_count"), pa.int64()),
        }
    )
    return pa.concat_tables([detail, stats])


def fanout_pipeline(sf_dir: str, out_dir: str) -> dict[str, str]:
    """events → fused transform → one partitioned write routing both tables."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    ds.map_batches(fused_detail_and_stats, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=[TABLE_COLUMN]
    )
    return {
        "detail": os.path.join(out_dir, f"{TABLE_COLUMN}=detail"),
        "user_stats": os.path.join(out_dir, f"{TABLE_COLUMN}=user_stats"),
    }


def user_stats_from_fanout(sf_dir: str) -> pd.DataFrame:
    """Run the fan-out, then finalize the per-user aggregate from the stats
    table only (the detail table stays untouched on disk)."""
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="sonic_etl_ray_fanout_")
    paths = fanout_pipeline(sf_dir, out_dir)
    from ray.data.aggregate import Sum

    stats = ray.data.read_parquet(paths["user_stats"], columns=["user_id", "value", "n_events"])
    out = (
        stats.groupby("user_id")
        .aggregate(Sum("value", alias_name="sum_value"), Sum("n_events", alias_name="n_events"))
        .to_pandas()
    )
    # cross-check the detail table's cardinality against the stat totals
    # (the row-counts QC invariant, J3) — cheap metadata read
    import pyarrow.parquet as pq

    n_detail = pq.ParquetDataset(paths["detail"]).read(columns=["event_id"]).num_rows
    assert n_detail == int(out["n_events"].sum()), "detail/stat cardinality mismatch"
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)
