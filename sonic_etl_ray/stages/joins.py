"""Empty-block-safe Dataset joins.

Ray 2.49's sort-based ``groupby().aggregate()`` emits a ZERO-COLUMN empty
block for every output partition that received no rows. Downstream,
``Dataset.join``'s hash-shuffle transport disseminates each side's schema
to the aggregator actors exactly once — piggybacked on the FIRST block
submitted per input (``hash_shuffle.py::_shuffle_block``,
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
"""

from __future__ import annotations

import ray.data


def drop_empty_blocks(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Materialize ``ds`` and rebuild it without zero-row blocks.

    Blocks stay in the object store; the rebuilt dataset holds the same
    object refs, which also keeps them alive after the intermediate
    materialized handle goes out of scope. If every block is empty the
    materialized dataset is returned unchanged (a degenerate join input —
    nothing to scrub can save it, and non-empty inputs never hit this).
    """
    mat = ds.materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)  # keep unknown-count blocks: only drop PROVEN empties
    if not refs:
        return mat
    return ray.data.from_arrow_refs(refs)


def safe_join(
    left: ray.data.Dataset, right: ray.data.Dataset, **join_kwargs
) -> ray.data.Dataset:
    """``left.join(right, **join_kwargs)`` with both sides scrubbed of the
    zero-column empty blocks Ray's sort-aggregate emits for empty output
    partitions (see module docstring)."""
    return drop_empty_blocks(left).join(drop_empty_blocks(right), **join_kwargs)
