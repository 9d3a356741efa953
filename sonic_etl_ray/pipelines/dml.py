"""Predicate-driven bulk DML over the lake: DELETE/UPDATE ... WHERE.

The lake's only write path is the change stream, and bulk DML must not
bypass it: :func:`delete_where` / :func:`update_where` compile a pyarrow
predicate into synthetic change events derived FROM THE LIVE STATE
(per-key ``lsn = applied_lsn + 1``, ``op = delete``/``update``) and
replay them through :func:`~sonic_etl_ray.pipelines.ingest.apply_epoch`
under a dedicated admin epoch. Bulk mutations therefore inherit the
exactly-once commit gate, idempotent kill/resume, schema evolution,
history archiving and merge-on-read semantics of the normal ingest path
— no in-place file rewrites, no second mutation protocol.

Reference analog: the reference's only bulk mutation is the daily MERGE
repair (``daily_qc_airflow/daily_dedupe_mainnet.py:65-81``), which
likewise expresses the mutation as a replayed MERGE over the live table
rather than a file rewrite.

Scale shape (100 TB): the predicate pushes into the Parquet scan
(``read_lake(filter=...)`` → row-group stats pruning), event synthesis
is a vectorized ``map_batches``, and the apply is the normal
partition-exchange merge. Nothing materializes on the driver; a DML
touches only the row groups the predicate selects plus the partitions
holding matches — an epoch whose partitions saw no matches commits
nothing and rewrites nothing.

Correctness notes:

- **Per-key LSN bump.** Each synthetic event carries its own row's
  ``applied_lsn + 1``, so it beats exactly the version it was derived
  from under per-key LWW — deterministic from the data alone, with no
  global watermark read. A concurrent stream writer can still win with
  any later LSN (standard DML-vs-stream race; run under the writer
  lease for serial semantics).
- **Deterministic admin epoch.** ``epoch = max(DML_EPOCH_BASE,
  committed_frontier + 1)``; the manifest is only written after every
  partition commits, so a killed DML re-run recomputes the SAME epoch
  and resumes: already-committed partitions are skipped by the commit
  gate, and their matched rows no longer match (deleted / updated), so
  they contribute no fresh events either. ``DML_EPOCH_BASE`` sits above
  the repair-epoch range (90,000,000–99,999,999), so time travel with
  ``as_of_epoch`` below the DML epoch reads the pre-DML state.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import pyarrow as pa
import pyarrow.compute as pc
import ray

from .ingest import (
    apply_epoch,
    committed_frontier,
    lake_num_partitions,
    read_lake,
)

# far above stream epochs AND the repair range (REPAIR_EPOCH_BASE + <10^7)
DML_EPOCH_BASE = 200_000_000

# derived columns validate_and_derive recomputes; never forwarded as event
# payload (applied_lsn becomes the event's lsn instead)
_DERIVED = ("content_sha256", "size_bytes", "applied_lsn")


def dml_epoch(lake_dir: str) -> int:
    """Deterministic admin epoch for the next DML: resumable (see module
    docstring) and monotonic across successive DMLs on the same lake."""
    frontier = committed_frontier(lake_dir)
    return max(DML_EPOCH_BASE, (frontier if frontier is not None else -1) + 1)


def _event_frame(state: pa.Table) -> dict[str, Any]:
    """State columns → change-event columns: lsn bumps past the source
    row's version; derived columns drop (the apply recomputes them);
    evolved extras pass through so updates don't lose added columns."""
    cols: dict[str, Any] = {
        "lsn": pc.add(state.column("applied_lsn"), pa.scalar(1, pa.int64()))
    }
    for name in state.column_names:
        if name not in _DERIVED:
            cols[name] = state.column(name)
    return cols


def _to_delete_events(state: pa.Table) -> pa.Table:
    cols = _event_frame(state)
    n = state.num_rows
    cols["op"] = pa.array(["delete"] * n, pa.string())
    # deletes carry null content (validate_and_derive rejects the opposite)
    cols["content"] = pa.nulls(n, state.column("content").type)
    return pa.table(cols)


def _to_update_events(state: pa.Table, assign: Mapping[str, Any]) -> pa.Table:
    """Vectorized update-event synthesis; assignments resolve per batch."""
    cols = _event_frame(state)
    n = state.num_rows
    for name, value in assign.items():
        if callable(value):
            arr = value(state)
        else:
            arr = pa.nulls(n) if value is None else pa.array([value] * n)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        cols[name] = arr
    cols["op"] = pa.array(["update"] * n, pa.string())
    return pa.table(cols)


def _run_dml(
    lake_dir: str,
    events: ray.data.Dataset,
    kind: str,
    predicate_desc: str,
    epoch: int | None,
    num_partitions: int | None,
    track_history: bool,
    merge_mode: str,
) -> dict[str, Any]:
    nparts = num_partitions or max(lake_num_partitions(lake_dir), 1)
    epoch = dml_epoch(lake_dir) if epoch is None else epoch
    records = apply_epoch(
        events,
        lake_dir,
        epoch,
        num_partitions=nparts,
        input_desc={"dml": kind, "predicate": predicate_desc},
        track_history=track_history,
        merge_mode=merge_mode,
    )
    return {
        "epoch": epoch,
        "kind": kind,
        "n_rows_affected": sum(int(r["n_events"]) for r in records),
        "parts_touched": sorted(int(r["part"]) for r in records),
    }


def delete_where(
    lake_dir: str,
    predicate: "pc.Expression",
    *,
    num_partitions: int | None = None,
    epoch: int | None = None,
    track_history: bool = False,
    merge_mode: str = "cow",
) -> dict[str, Any]:
    """DELETE FROM lake WHERE ``predicate`` via the exactly-once path.

    ``predicate`` is a pyarrow dataset expression over the state schema
    (e.g. ``pc.field("lang") == "markdown"``); it pushes into the Parquet
    scan. Matched live rows become tombstones through the normal merge —
    physically removed at the next compaction, historically preserved if
    the lake tracks history (pass ``track_history=True`` on such lakes so
    the DML's versions are archived like any other epoch's).
    """
    ds = read_lake(lake_dir, filter=predicate)
    events = ds.map_batches(_to_delete_events, batch_format="pyarrow")
    return _run_dml(
        lake_dir, events, "delete", str(predicate), epoch, num_partitions,
        track_history, merge_mode,
    )


def update_where(
    lake_dir: str,
    predicate: "pc.Expression",
    assign: Mapping[str, Any | Callable[[pa.Table], pa.Array]],
    *,
    num_partitions: int | None = None,
    epoch: int | None = None,
    track_history: bool = False,
    merge_mode: str = "cow",
) -> dict[str, Any]:
    """UPDATE lake SET ``assign`` WHERE ``predicate`` via the exactly-once
    path.

    ``assign`` maps column → new value: a plain scalar broadcasts; a
    callable receives the matched-state batch (pa.Table) and returns the
    replacement array — vectorized, so transforms like
    ``{"content": lambda t: pc.utf8_upper(t["content"])}`` run as Arrow
    kernels per batch. Assigning a column the lake doesn't have yet is
    schema evolution and flows through the merge's normal widen/conform.
    ``content`` must stay non-null (an update with null content is a
    malformed event by the stream contract — use :func:`delete_where`).
    ``content_sha256`` / ``size_bytes`` are derived downstream and cannot
    be assigned.
    """
    bad = [c for c in assign if c in _DERIVED]
    if bad:
        raise ValueError(f"cannot assign derived columns: {bad}")
    ds = read_lake(lake_dir, filter=predicate)
    events = ds.map_batches(
        _to_update_events, fn_kwargs={"assign": dict(assign)},
        batch_format="pyarrow",
    )
    return _run_dml(
        lake_dir, events, "update", str(predicate), epoch, num_partitions,
        track_history, merge_mode,
    )
