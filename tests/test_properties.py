"""Property-based tests (hypothesis) for the engine's core invariants —
a testing depth the reference lacks entirely (SURVEY.md §5.3)."""

from __future__ import annotations

import hypothesis.strategies as st
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings

from sonic_etl_ray.schemas import conform_table, unify_schemas
from sonic_etl_ray.stages.keys import add_partition_column, stable_hash64
from sonic_etl_ray.stages.transform import reduce_last_per_key
from sonic_etl_ray.stages.typed import cap_bignumeric

# -- event-batch strategy ---------------------------------------------------

_keys = st.tuples(
    st.sampled_from(["r0", "r1", "r2"]), st.sampled_from(["a", "b", "c", "d"])
)


@st.composite
def event_batches(draw):
    rows = draw(st.lists(_keys, min_size=1, max_size=40))
    n = len(rows)
    lsns = draw(
        st.lists(st.integers(0, 10_000), min_size=n, max_size=n, unique=True)
    )
    ops = draw(st.lists(st.sampled_from(["insert", "update", "delete"]), min_size=n, max_size=n))
    return pa.table(
        {
            "lsn": pa.array(lsns, pa.int64()),
            "op": pa.array(ops),
            "repo": pa.array([r for r, _ in rows]),
            "path": pa.array([p for _, p in rows]),
            "commit": pa.array([f"c{i}" for i in range(n)]),
            "lang": pa.array(["x"] * n),
            "content": pa.array([None if o == "delete" else f"body{i}" for i, o in enumerate(ops)]),
        }
    )


@given(event_batches())
@settings(max_examples=60, deadline=None)
def test_reduce_last_per_key_matches_naive(batch):
    """The vectorized combiner equals the obvious pandas groupby-idxmax."""
    reduced = reduce_last_per_key(batch)
    # __w carries raw-delivery counts for lineage; equality is on the data
    got = reduced.drop_columns(["__w"]).to_pandas().sort_values(["repo", "path"])
    assert sum(reduced.column("__w").to_pylist()) == batch.num_rows
    df = batch.to_pandas()
    naive = (
        df.loc[df.groupby(["repo", "path"])["lsn"].idxmax()]
        .sort_values(["repo", "path"])
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), naive.reset_index(drop=True)
    )


@given(event_batches())
@settings(max_examples=30, deadline=None)
def test_reduce_is_idempotent_and_composes(batch):
    """f(f(x)) == f(x) and f(f(x[:k]) ++ f(x[k:])) == f(x) — the combiner law
    that makes per-batch pre-reduction before the shuffle correct."""
    once = reduce_last_per_key(batch)
    assert reduce_last_per_key(once).sort_by("lsn").equals(once.sort_by("lsn"))
    k = batch.num_rows // 2
    split = pa.concat_tables(
        [reduce_last_per_key(batch.slice(0, k)), reduce_last_per_key(batch.slice(k))],
        promote_options="default",
    )
    recombined = reduce_last_per_key(split).sort_by("lsn")
    assert recombined.equals(once.sort_by("lsn"))


@given(st.lists(st.tuples(st.text(min_size=1, max_size=8), st.text(min_size=1, max_size=8)), min_size=1, max_size=50))
@settings(max_examples=50, deadline=None)
def test_partitioning_is_deterministic_and_in_range(pairs):
    t = pa.table(
        {"repo": pa.array([a for a, _ in pairs]), "path": pa.array([b for _, b in pairs])}
    )
    p1 = add_partition_column(t, 16).column("__part").to_pylist()
    p2 = add_partition_column(t, 16).column("__part").to_pylist()
    assert p1 == p2
    assert all(0 <= p < 16 for p in p1)
    # same key → same partition regardless of batch composition
    single = add_partition_column(t.slice(0, 1), 16).column("__part")[0].as_py()
    assert single == p1[0]


@given(st.lists(st.integers(0, 10**45), min_size=1, max_size=30))
@settings(max_examples=50, deadline=None)
def test_cap_bignumeric_properties(vals):
    arr = pa.array([str(v) for v in vals], pa.string())
    capped, lossless = cap_bignumeric(arr)
    for v, c, l in zip(vals, capped.to_pylist(), lossless.to_pylist()):
        assert l == str(v)  # lossless dual always exact
        assert int(c) == min(v, 10**38 - 1)  # saturation, never distortion


@given(
    st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=4, unique=True),
    st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=4, unique=True),
)
@settings(max_examples=40, deadline=None)
def test_unify_schemas_total_and_conform_safe(old_names, new_names):
    old = pa.schema([(n, pa.int32()) for n in old_names])
    new = pa.schema([(n, pa.int64()) for n in new_names])
    u = unify_schemas(old, new)
    assert set(u.names) == set(old_names) | set(new_names)
    t = pa.table({n: pa.array([1, 2], pa.int32()) for n in old_names})
    out = conform_table(t, u)
    assert out.schema == u and out.num_rows == 2
