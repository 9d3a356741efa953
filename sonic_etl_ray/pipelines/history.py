"""History sidecar readers: the SCD2 / change-archive surface of the lake.

``run_ingest(..., track_history=True)`` makes every merge unit archive its
distinct delivered versions into an append-only, commit-gated file
``_history/epoch=E/part=P.parquet`` (see ``MergeApplier.apply_unit``). This
module is the read side:

- :func:`history_files` — committed history files (the commit record is the
  gate: a crash between the sidecar write and the commit leaves an orphan
  file that is invisible here and harmlessly overwritten on replay);
- :func:`read_history` — the archive as a streaming ``ray.data.Dataset``;
- :func:`scd2_view` — the SCD2 dimension derived DISTRIBUTEDLY from the
  archive alone: one bucket-keyed exchange on hash(repo, path), then a
  vectorized close-LSN shift inside each bucket (per-bucket Python, never
  per-key) — the same kernel shape as ``cdc_queries.cdc_scd2_history`` but
  fed from the incrementally-maintained sidecar instead of a full stream
  re-read.

Scale notes: history volume is O(distinct delivered events) by definition —
the sidecar only ever appends one file per (epoch, partition), no rewrite,
no read amplification on the ingest path. ``scd2_view`` reads only the five
columns it needs (column-pruned parquet scan) and its exchange fan-out is
``num_buckets``, independent of key cardinality. The reference keeps no
history at all — its daily MERGE (``daily_qc_airflow/daily_dedupe_mainnet.py``)
collapses duplicates and discards superseded rows; this sidecar is the
warehouse SCD2 pattern the north rule's schema-evolution/exactly-once
replay makes safe to maintain incrementally.
"""

from __future__ import annotations

import glob
import os
import re

import pyarrow as pa

import ray.data

from ..state import commitlog as cl

HISTORY_DIR = "_history"

_HFILE_RE = re.compile(r"epoch=(\d+)[/\\]part=(\d+)\.parquet$")


def history_files(lake_dir: str, as_of_epoch: int | None = None) -> list[str]:
    """Committed history sidecar files, (epoch, part)-ascending.

    A file counts only if its (epoch, part) COMMIT record exists — the same
    exactly-once gate the merge uses, so resumed/killed runs never expose a
    half-written unit. ``as_of_epoch`` restricts to epochs ``<=`` it (the
    time-travel analog for the archive)."""
    out: list[tuple[int, int, str]] = []
    for f in glob.glob(
        os.path.join(lake_dir, HISTORY_DIR, "epoch=*", "part=*.parquet")
    ):
        m = _HFILE_RE.search(f)
        if not m:
            continue
        epoch, part = int(m.group(1)), int(m.group(2))
        if as_of_epoch is not None and epoch > as_of_epoch:
            continue
        if os.path.exists(cl.commit_path(lake_dir, epoch, part)):
            out.append((epoch, part, f))
    return [f for _, _, f in sorted(out)]


def read_history(
    lake_dir: str,
    as_of_epoch: int | None = None,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """The change archive as a streaming Dataset (one block per sidecar
    file; committed units only). Pass ``columns`` to prune the scan — also
    the safe way to read a schema-evolved archive (early epochs lack
    later-added columns; a pruned read of the stable base columns always
    unifies)."""
    files = history_files(lake_dir, as_of_epoch)
    if not files:
        return ray.data.from_arrow(pa.table({}))
    return ray.data.read_parquet(files, columns=columns)


def scd2_view(
    lake_dir: str,
    num_buckets: int = 64,
    as_of_epoch: int | None = None,
) -> ray.data.Dataset:
    """SCD2 dimension from the history sidecar: every archived non-delete
    version opens an interval ``[lsn, next-version-lsn)``; a later version
    of ANY op closes it; a trailing non-delete version is current
    (``valid_to_lsn = -1`` sentinel, ``is_current = 1``).

    Distribution: bucket-keyed exchange on hash(repo, path) → per-bucket
    vectorized shift over (repo, path, lsn)-sorted rows. Cross-epoch
    replays of the SAME version (at-least-once delivery that straddles an
    epoch boundary) dedupe inside the bucket kernel, so the view is stable
    under any delivery schedule the engine itself tolerates."""
    import numpy as np
    import pandas as pd

    from ..functions.text import md5_u64

    if not history_files(lake_dir, as_of_epoch):  # empty archive → typed empty
        return ray.data.from_arrow(
            pa.table(
                {
                    "repo": pa.array([], pa.string()),
                    "path": pa.array([], pa.string()),
                    "commit": pa.array([], pa.string()),
                    "lang": pa.array([], pa.string()),
                    "valid_from_lsn": pa.array([], pa.int64()),
                    "valid_to_lsn": pa.array([], pa.int64()),
                    "is_current": pa.array([], pa.int64()),
                }
            )
        )
    ds = read_history(
        lake_dir, as_of_epoch, columns=["repo", "path", "commit", "lang", "lsn", "op"]
    )

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        key = (b["repo"].astype(str) + "\x00" + b["path"].astype(str)).tolist()
        b["__bucket"] = md5_u64(key).view(np.int64) % num_buckets
        return b

    def scd2_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.sort_values(["repo", "path", "lsn"], kind="stable")
            .drop_duplicates(["repo", "path", "lsn"], keep="first")
            .reset_index(drop=True)
        )
        same_next = (g["repo"].shift(-1) == g["repo"]) & (
            g["path"].shift(-1) == g["path"]
        )
        nxt = np.where(
            same_next.to_numpy(), g["lsn"].shift(-1).fillna(-1).to_numpy(), -1
        ).astype(np.int64)
        keep = (g["op"] != "delete").to_numpy()
        out = pd.DataFrame(
            {
                "repo": g["repo"],
                "path": g["path"],
                "commit": g["commit"],
                "lang": g["lang"],
                "valid_from_lsn": g["lsn"].astype("int64"),
                "valid_to_lsn": nxt,
                "is_current": (nxt == -1).astype("int64"),
            }
        )
        return out[keep]

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(scd2_bucket, batch_format="pandas")
    )
