"""Golden conformance-fixture save/load — the ``CreateTestSet`` analog.

The reference generates per-block golden fixtures (raw extraction JSON +
golden transformed ``PerBlockRecords``) under
``tests/<name>_<start>_<end>/{extraction,transformation}/`` via the
``CreateTestSet`` CLI (``main.rs:453-476``, ``sonic_config/test.rs:122-150``)
and later asserts bit-identical re-transformation (``test.rs:174-221``).

Here a fixture set is ``<dir>/<name>_<start>_<end>/`` holding:
- ``events/segment_*.parquet`` — the raw change stream (extraction analog);
- ``golden/final_state.parquet`` — oracle-replayed lake state;
- ``golden/stats.json`` — per-repo counts, watermark, applied-LSN list.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..generator import StreamSpec, generate_stream
from ..oracle import oracle_final_state


def fixture_dir(base: str, name: str, start: int, end: int) -> str:
    return os.path.join(base, f"{name}_{start}_{end}")


def create_test_set(base: str, name: str, spec: StreamSpec) -> str:
    """Generate a named fixture set: raw events + golden outputs."""
    start = spec.start_lsn
    end = spec.start_lsn + spec.n_events - 1
    root = fixture_dir(base, name, start, end)
    seg_dir = os.path.join(root, "events")
    files = generate_stream(seg_dir, spec)

    golden = oracle_final_state(files)
    gdir = os.path.join(root, "golden")
    os.makedirs(gdir, exist_ok=True)
    pq.write_table(golden, os.path.join(gdir, "final_state.parquet"))

    per_repo: dict[str, int] = {}
    for r in golden.column("repo").to_pylist():
        per_repo[r] = per_repo.get(r, 0) + 1
    stats = {
        "name": name,
        "start": start,
        "end": end,
        "n_events": spec.n_events,
        "final_rows": golden.num_rows,
        "rows_per_repo": per_repo,
        "watermark": max(golden.column("applied_lsn").to_pylist(), default=-1),
        "applied_lsns": sorted(golden.column("applied_lsn").to_pylist()),
    }
    with open(os.path.join(gdir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2, sort_keys=True)
    return root


def load_test_set(root: str) -> tuple[list[str], pa.Table, dict]:
    """(segment files, golden final state, stats) for a fixture set."""
    files = sorted(glob.glob(os.path.join(root, "events", "segment_*.parquet")))
    golden = pq.read_table(os.path.join(root, "golden", "final_state.parquet"))
    with open(os.path.join(root, "golden", "stats.json")) as f:
        stats = json.load(f)
    return files, golden, stats


def discover_test_sets(base: str) -> list[str]:
    """All fixture-set roots under ``base`` (the test.rs:243-271 walk)."""
    out = []
    for p in sorted(glob.glob(os.path.join(base, "*_*_*"))):
        if os.path.isdir(os.path.join(p, "events")) and os.path.isdir(
            os.path.join(p, "golden")
        ):
            out.append(p)
    return out
