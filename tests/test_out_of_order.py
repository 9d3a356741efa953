"""Out-of-order + duplicated epoch application vs the oracle.

The strongest claim of the tombstone-LWW merge: final state is invariant
under ANY epoch application order and any amount of duplicate delivery.
Exercised with several seeded random orders (not hypothesis — each case
runs real Ray pipelines, so a handful of orders is the right budget).
"""

from __future__ import annotations

import random

import ray.data

from sonic_etl_ray.generator import StreamSpec, generate_events, write_segments
from sonic_etl_ray.oracle import assert_state_equal, oracle_final_state
from sonic_etl_ray.pipelines.ingest import (
    apply_epoch,
    lake_final_table,
    scratch_lake_dir,
)


def _apply_order(files, order, lake, dup_epochs=()):
    for e in order:
        ds = ray.data.read_parquet([files[e]])
        apply_epoch(ds, lake, epoch=e, num_partitions=4)
    for e in dup_epochs:  # duplicate delivery of whole epochs, post hoc
        ds = ray.data.read_parquet([files[e]])
        # duplicate applies arrive under a FRESH epoch id (a redelivery is a
        # new unit of work); the per-key LSN compare must no-op them
        apply_epoch(ds, lake, epoch=100 + e, num_partitions=4)


def test_random_stream_shapes_vs_oracle(tmp_path):
    """Fuzz across generator parameter space: op mixes, skew, segment sizes,
    partition counts — engine must match the oracle for every shape."""
    from sonic_etl_ray.pipelines.ingest import run_ingest

    shapes = [
        StreamSpec(n_events=800, n_repos=3, seed=201, segment_size=77, p_insert=0.4, p_update=0.4),
        StreamSpec(n_events=1200, n_repos=30, seed=202, segment_size=301, p_insert=0.9, p_update=0.05),
        StreamSpec(n_events=600, n_repos=2, seed=203, segment_size=600, hot_repo_frac=0.9),
        StreamSpec(n_events=1500, n_repos=10, seed=204, segment_size=100, p_insert=0.5, p_update=0.1),
    ]
    for i, spec in enumerate(shapes):
        files = write_segments(generate_events(spec), str(tmp_path / f"s{i}"), spec)
        lake = scratch_lake_dir(f"fuzz{i}")
        run_ingest(files, lake, num_partitions=3 + i, segments_per_epoch=2 + i)
        assert_state_equal(lake_final_table(lake), oracle_final_state(files))


def test_random_epoch_orders_and_duplicates(tmp_path):
    spec = StreamSpec(n_events=3000, n_repos=8, seed=101, segment_size=500)
    table = generate_events(spec)
    files = write_segments(table, str(tmp_path / "segs"), spec)
    golden = oracle_final_state(files)

    n = len(files)
    rng = random.Random(5)
    orders = [list(range(n)), list(range(n - 1, -1, -1))]
    for _ in range(3):
        o = list(range(n))
        rng.shuffle(o)
        orders.append(o)

    for i, order in enumerate(orders):
        lake = scratch_lake_dir(f"ooo{i}")
        _apply_order(files, order, lake, dup_epochs=(order[0], order[-1]))
        assert_state_equal(lake_final_table(lake), golden)


def test_random_mixed_mode_orders_match_oracle(tmp_path):
    """The strongest merge-on-read claim: final state is invariant under ANY
    epoch order, ANY duplicate delivery, ANY per-epoch choice of cow/mor,
    and ANY compaction points in between — all resolve to the same LWW
    snapshot the oracle computes."""
    from sonic_etl_ray.pipelines.ingest import compact_lake_states

    spec = StreamSpec(n_events=2400, n_repos=8, seed=303, segment_size=400)
    table = generate_events(spec)
    files = write_segments(table, str(tmp_path / "segs"), spec)
    golden = oracle_final_state(files)

    rng = random.Random(77)
    for trial in range(3):
        lake = scratch_lake_dir(f"mixooo{trial}")
        order = list(range(len(files)))
        rng.shuffle(order)
        dups = rng.sample(order, 2)
        for e in order:
            mode = rng.choice(["cow", "mor"])
            apply_epoch(
                ray.data.read_parquet([files[e]]), lake, epoch=e,
                num_partitions=4, merge_mode=mode,
            )
            if rng.random() < 0.3:
                compact_lake_states(lake)
        for e in dups:  # whole-epoch redelivery under fresh ids
            apply_epoch(
                ray.data.read_parquet([files[e]]), lake, epoch=100 + e,
                num_partitions=4, merge_mode=rng.choice(["cow", "mor"]),
            )
        assert_state_equal(lake_final_table(lake), golden)
