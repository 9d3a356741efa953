"""Empty-block-safe, size-adaptive Dataset joins.

Two problems with ``Dataset.join`` as shipped, one correctness and one
cost, both fixed here at the call-site level:

**Correctness — schema-less empty blocks.** Ray 2.49's sort-based
``groupby().aggregate()`` emits a ZERO-COLUMN empty block for every output
partition that received no rows. Downstream, ``Dataset.join``'s
hash-shuffle transport disseminates each side's schema to the aggregator
actors exactly once — piggybacked on the FIRST block submitted per input
(``hash_shuffle.py::_shuffle_block``,
``send_empty_blocks=should_broadcast_schemas``). If that first block is
one of the zero-row blocks, ``_shuffle_block`` returns before fanning
anything out, yet the operator still flips its has-broadcast flag — so
any join partition that never receives a real row on that side finalizes
``ArrowBlockBuilder().build()`` == a 0-column table, and
``pyarrow.Table.join`` fails with ``ArrowInvalid: No match or multiple
matches for key field reference ...``.

The failure is parallelism-dependent (more CPUs → more aggregate output
partitions → more empty blocks → more likely one is submitted first), so
it passes a busy single-node test and detonates on a 256-node cluster the
first time a filtered dimension goes sparse.

A ``map_batches`` stage CANNOT repair this: batching iterates rows, so an
empty block yields zero batches — the fn never sees it and the task
re-emits a fresh schema-less empty block. The only user-level fix is
block-level: materialize the side (the join pins each side whole inside
its aggregator actors anyway, so peak memory is unchanged), drop the
zero-row block REFS (no data moves — the driver touches O(blocks)
metadata only), and rebuild the dataset from the surviving refs.

**Cost — fixed hash-shuffle overhead.** The hash join spins up a pool of
``HashShuffleAggregator`` actors per join (~1.8 s measured on this host
regardless of input size) and moves BOTH sides through an all-to-all
exchange. When one side is small — the overwhelmingly common shape here:
an aggregate joined back to its input, a dimension table, a candidate
list — the classic engine answer is a broadcast (map-side) join: ship the
small table to every map task once via the object store and join each
batch locally with ``pyarrow.Table.join``. No shuffle of the big side, no
aggregator actors, streaming preserved. At cluster scale the small table
is transferred once per NODE (Ray object-store dedup), not per task, so
the pattern holds at 100 TB exactly as documented for broadcast lookups
elsewhere in this repo.

``safe_join`` picks the strategy from the materialized sides' byte sizes
(already known — the scrub materializes): right side under
``SONIC_BROADCAST_JOIN_MAX_BYTES`` (default 32 MiB) and an inner /
left-outer join → broadcast; otherwise the scrubbed hash join. pyarrow
and Ray joins agree on output schema (left columns then right non-key
columns; right key dropped), verified in tests.
"""

from __future__ import annotations

import logging
import os

import pyarrow as pa
import ray
import ray.data

log = logging.getLogger(__name__)

_PA_JOIN_TYPE = {"inner": "inner", "left_outer": "left outer"}


def _broadcast_max_bytes() -> int:
    return int(os.environ.get("SONIC_BROADCAST_JOIN_MAX_BYTES", 32 << 20))


def _scrub(ds: ray.data.Dataset) -> tuple[ray.data.Dataset, int | None]:
    """Materialize ``ds``, drop zero-row block refs, and report total bytes.

    Blocks stay in the object store; the rebuilt dataset holds the same
    object refs, which also keeps them alive after the intermediate
    materialized handle goes out of scope. If every block is empty the
    materialized dataset is returned unchanged (a degenerate join input —
    nothing to scrub can save it, and non-empty inputs never hit this).
    Returns ``(dataset, size_bytes)``; size is ``None`` when any block's
    metadata lacks a byte count (then no broadcast decision is made).
    """
    mat = ds.materialize()
    refs = []
    total_bytes: int | None = 0
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)  # keep unknown-count blocks: only drop PROVEN empties
                if total_bytes is not None and meta.size_bytes is not None:
                    total_bytes += meta.size_bytes
                else:
                    total_bytes = None
    if not refs:
        return mat, 0
    return ray.data.from_arrow_refs(refs), total_bytes


def drop_empty_blocks(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Materialize ``ds`` and rebuild it without zero-row blocks."""
    return _scrub(ds)[0]


class _BroadcastJoiner:
    """Per-batch ``pyarrow.Table.join`` against a broadcast small side.

    Plain function-style callable holding only the object ref — each
    ``ray.get`` inside a task is a zero-copy view of the node-local copy.
    """

    def __init__(self, small_ref, left_keys, right_keys, pa_join_type):
        self._ref = small_ref
        self._lk = list(left_keys)
        self._rk = list(right_keys)
        self._jt = pa_join_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        small: pa.Table = ray.get(self._ref)
        return batch.join(small, keys=self._lk, right_keys=self._rk, join_type=self._jt)


def _collect_table(ds: ray.data.Dataset) -> pa.Table:
    blocks = []
    for bundle in ds.materialize().iter_internal_ref_bundles():
        blocks.extend(ray.get(list(bundle.block_refs)))
    tables = [
        pa.Table.from_pandas(b, preserve_index=False) if not isinstance(b, pa.Table) else b
        for b in blocks
    ]
    tables = [t for t in tables if t.num_columns > 0]
    return (
        pa.concat_tables(tables, promote_options="default").combine_chunks()
        if tables
        else pa.table({})
    )


def safe_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    join_type: str,
    num_partitions: int,
    on: tuple[str, ...],
    right_on: tuple[str, ...] | None = None,
    **join_kwargs,
) -> ray.data.Dataset:
    """``left.join(right, ...)`` with empty-block scrubbing and an adaptive
    broadcast fast path for small right sides (see module docstring).

    Degenerate right side — ONLY schema-less empty blocks (Ray's aggregate
    over an empty input emits 0-column blocks and ``Dataset.schema()`` is
    ``None``, so nothing can recover the right schema): the hash join would
    crash inside the aggregator actors, so the correct result is
    synthesized instead — ``inner`` → the left limited to 0 rows,
    ``left_outer`` → the left unchanged (no right row exists to pad;
    right column NAMES are unknowable so none are added). Both are logged.
    """
    r_ds, r_bytes = _scrub(right)
    rk = tuple(right_on) if right_on is not None else tuple(on)

    small = (
        _collect_table(r_ds)
        if r_bytes is not None and r_bytes <= _broadcast_max_bytes()
        else None
    )
    if small is not None and small.num_columns == 0:
        log.warning(
            "safe_join: right side is entirely schema-less empty blocks; "
            "synthesizing the %s-join result (right columns unknowable)",
            join_type,
        )
        if join_type == "inner":
            return left.limit(0)
        if join_type == "left_outer":
            return left
        raise ValueError(
            f"cannot synthesize a {join_type!r} join against a schema-less "
            "empty right side (Ray aggregates over empty inputs emit "
            "0-column blocks); materialize a typed empty table instead"
        )
    if small is not None and not join_kwargs and join_type in _PA_JOIN_TYPE:
        # A right non-key column colliding with ANY left name (keys
        # included — pyarrow keeps left keys in the output) produces a
        # duplicate output column; Ray's hash join dies on the same shape
        # ('Field "x" exists 2 times in schema' inside the aggregator
        # actors, verified on 2.49), so neither path can represent it —
        # fail fast with an actionable message instead.
        l_schema = left.schema(fetch_if_missing=True)
        l_names = set(l_schema.names) if l_schema is not None else None
        collide = (
            (set(small.column_names) - set(rk)) & l_names
            if l_names is not None
            else set()
        )
        if collide:
            raise ValueError(
                f"join would duplicate column(s) {sorted(collide)}: right "
                "non-key columns collide with left columns — rename them "
                "before joining (neither pyarrow nor Ray's hash join can "
                "suffix on this engine version)"
            )
        if l_names is not None:
            # broadcast path: the LEFT side streams — no scrub/materialize
            # of the big side (zero-row left blocks simply yield no batches)
            ref = ray.put(small)
            return left.map_batches(
                _BroadcastJoiner(ref, on, rk, _PA_JOIN_TYPE[join_type]),
                batch_format="pyarrow",
            )

    l_ds, _ = _scrub(left)
    if l_ds.schema(fetch_if_missing=True) is None:
        # degenerate LEFT (e.g. a candidate-pair set that came up empty):
        # the hash join would crash in the aggregators exactly like the
        # right-side case ('No match ... FieldRef.Name(...) on left side').
        # For inner/left_outer the correct result is empty; left column
        # NAMES are unknowable, so the empty stays schema-less.
        log.warning(
            "safe_join: left side is entirely schema-less empty blocks; "
            "synthesizing the empty %s-join result", join_type,
        )
        if join_type in ("inner", "left_outer"):
            return l_ds.limit(0)
        raise ValueError(
            f"cannot synthesize a {join_type!r} join from a schema-less "
            "empty left side; materialize a typed empty table instead"
        )
    return l_ds.join(
        r_ds,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
        **join_kwargs,
    )
