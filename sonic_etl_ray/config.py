"""Engine-wide storage tunables.

``SONIC_ETL_COMPRESSION`` picks the Parquet codec for every lake artifact
(state, deltas, history, decoded/error sidecars, snapshots): ``snappy``
(default — cheapest CPU, the right choice while the apply path is
shuffle/CPU-bound), ``zstd`` (≈30–45% smaller files on text-heavy content
for a few % CPU — the right choice when the deployment is storage- or
network-bound, e.g. object-store-backed lakes), or any other codec pyarrow
accepts. ``SONIC_ETL_COMPRESSION_LEVEL`` optionally pins the codec level
(zstd default 1 here: levels >3 cost CPU quadratically for single-digit
extra ratio on this payload shape).

Read from the environment at import time in every worker process — in
local mode workers inherit the driver's environment; on a real cluster
ship it via ``ray.init(runtime_env={"env_vars": {...}})``. Results are
byte-identical under any codec (compression never changes values), so the
knob is safe to flip between epochs of the same lake: Parquet files are
self-describing and readers mix codecs freely.
"""

from __future__ import annotations

import os


def parquet_write_kwargs() -> dict:
    """kwargs for every ``pq.write_table`` that persists a lake artifact."""
    codec = os.environ.get("SONIC_ETL_COMPRESSION", "snappy")
    out: dict = {"compression": codec}
    level = os.environ.get("SONIC_ETL_COMPRESSION_LEVEL")
    if level:
        out["compression_level"] = int(level)
    elif codec == "zstd":
        out["compression_level"] = 1
    return out
