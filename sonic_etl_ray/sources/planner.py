"""Work planning: LSN-range chunking, CSV backfill lists, segment discovery.

The coordinator side of the reference, re-expressed driver-side:
- :func:`chunk_range` — fixed-size inclusive LSN chunks
  (``indexing_coordinator/publish_ranges.py:122-146``, 1000-block ranges);
- :func:`read_lsn_list_csv` — the CSV block-list reader with header
  sniffing and range compression (``extractor_transformer/src/main.rs:140-185``
  + gap-run compression ``daily_backfill_mainnet.py:104-144``);
- :func:`discover_segments` — segment files as the work list (the
  subscription-pull analog; Ray read-task scheduling replaces competing
  consumers).
"""

from __future__ import annotations

import csv
import glob
import os
from dataclasses import dataclass


@dataclass(frozen=True)
class IngestRequest:
    """A work unit: an inclusive LSN range plus per-output flags — the
    ``IndexingRequest`` analog (``schemas/proto/request.proto:1-19``).
    Flags select which derived outputs are produced (per-run table
    selection, ``sonic_config/mod.rs:403-496``)."""

    start: int
    end: int
    include_state: bool = True
    include_lineage: bool = True
    include_errors: bool = True


def chunk_range(start: int, end: int, chunk: int = 1000) -> list[IngestRequest]:
    """Inclusive [start, end] → fixed-size inclusive chunks."""
    if end < start:
        return []
    out = []
    lo = start
    while lo <= end:
        out.append(IngestRequest(lo, min(lo + chunk - 1, end)))
        lo += chunk
    return out


def compress_to_ranges(lsns: list[int]) -> list[tuple[int, int]]:
    """Sorted LSNs → contiguous inclusive ranges (backfill planning)."""
    out: list[tuple[int, int]] = []
    for x in sorted(set(lsns)):
        if out and out[-1][1] == x - 1:
            out[-1] = (out[-1][0], x)
        else:
            out.append((x, x))
    return out


def read_lsn_list_csv(path: str) -> list[int]:
    """Read a one-column CSV of LSNs, sniffing and skipping a header row."""
    out: list[int] = []
    with open(path, newline="") as f:
        for i, row in enumerate(csv.reader(f)):
            if not row:
                continue
            cell = row[0].strip()
            if i == 0 and not cell.lstrip("-").isdigit():
                continue  # header
            out.append(int(cell))
    return out


def discover_segments(seg_dir: str, pattern: str = "segment_*.parquet") -> list[str]:
    """Sorted segment files (name order == ascending LSN spans)."""
    return sorted(glob.glob(os.path.join(seg_dir, pattern)))


def validate_segments(files: list[str]) -> tuple[list[str], list[dict]]:
    """Footer-validate segment files before planning: a corrupt or truncated
    Parquet file in the stream (partial upload, bad disk) must not abort the
    whole epoch loop NOR be silently dropped. Returns (readable, quarantined)
    where each quarantine entry records path, size, and the footer error —
    callers persist it so the repair path (re-ingesting the fixed file maps
    to the same stable epoch, or a repair epoch if already manifested) stays
    replayable. Footer reads are O(KB) per file, no data scan."""
    import pyarrow.parquet as pq

    good: list[str] = []
    bad: list[dict] = []
    for f in files:
        try:
            pq.read_schema(f)
            good.append(f)
        except Exception as ex:  # corrupt footer / truncated / not parquet
            bad.append(
                {
                    "file": f,
                    "size_bytes": os.path.getsize(f) if os.path.exists(f) else -1,
                    "error": f"{type(ex).__name__}: {ex}",
                }
            )
    return good, bad
