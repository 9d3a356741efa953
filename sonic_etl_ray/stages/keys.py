"""Stable key hashing and hash partitioning for the upsert shuffle.

The reference's merge keys are natural per-table keys
(``daily_qc_airflow/daily_dedupe_mainnet.py:28-35``); ours is ``(repo, path)``.
Partitioning is on the FULL ``(repo, path)`` key — not ``repo`` — which is the
hot-key split demanded by the north rule: one popular repo (zipf head) is
spread over all partitions by its paths, while per-key LSN ordering is
preserved because a single file's events still land in one partition.

Hash must be deterministic across processes and nodes (no PYTHONHASHSEED
dependence): pandas' SipHash-1-3 (``pd.util.hash_array`` with its fixed
default key) over the ``repo\\x00path`` concatenation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

PART_COLUMN = "__part"
KEY_SEP = "\x00"


def key_strings(tbl: pa.Table, key: tuple[str, ...] = ("repo", "path")) -> pa.Array:
    """Single-column string key ``k1\\x00k2…`` (vectorized arrow concat)."""
    cols = [pc.cast(tbl.column(name), pa.string()) for name in key]
    if len(cols) == 1:
        out = cols[0]
    else:
        # last positional arg is the element-wise separator
        out = pc.binary_join_element_wise(*cols, KEY_SEP)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def stable_hash64(strings: pa.Array) -> np.ndarray:
    """Deterministic uint64 hash of a string array (SipHash via pandas)."""
    obj = np.asarray(strings.to_pandas(), dtype=object)
    return pd.util.hash_array(obj, categorize=False)


def add_partition_column(
    tbl: pa.Table, num_partitions: int, key: tuple[str, ...] = ("repo", "path")
) -> pa.Table:
    """Append ``__part = stable_hash(key) % P`` for the merge shuffle."""
    parts = (stable_hash64(key_strings(tbl, key)) % np.uint64(num_partitions)).astype(
        np.int32
    )
    return tbl.append_column(PART_COLUMN, pa.array(parts, pa.int32()))
