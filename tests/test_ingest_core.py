"""End-to-end CDC ingest correctness vs the DuckDB oracle.

Mirrors the reference's conformance-corpus strategy
(``/root/reference/extractor_transformer/tests/README.md:1-8``,
``src/sonic_config/test.rs:174-221``): deterministic inputs, golden
post-replay table state, exact comparison — plus the per-row sha256
invariant from BASELINE.json.
"""

from __future__ import annotations

import glob

import pytest

from sonic_etl_ray.generator import StreamSpec, generate_stream
from sonic_etl_ray.oracle import assert_state_equal, oracle_final_state
from sonic_etl_ray.pipelines.ingest import (
    lake_final_table,
    run_ingest,
    scratch_lake_dir,
)


def _roundtrip(tmp_path, spec: StreamSpec, ingest_kwargs=None, replay_segments=0):
    seg_dir = str(tmp_path / "segments")
    files = generate_stream(seg_dir, spec)
    lake = scratch_lake_dir("test")
    inputs = files + files[:replay_segments]  # duplicate delivery simulation
    run_ingest(inputs, lake, **(ingest_kwargs or {}))
    return lake_final_table(lake), oracle_final_state(files)


def test_tiny_insert_only(tmp_path):
    spec = StreamSpec(n_events=300, n_repos=5, seed=7, segment_size=100, p_insert=1.0, p_update=0.0)
    engine, golden = _roundtrip(tmp_path, spec, {"num_partitions": 4, "segments_per_epoch": 2})
    assert engine.num_rows > 0
    assert_state_equal(engine, golden)


def test_tiny_mixed_ops(tmp_path):
    spec = StreamSpec(n_events=1000, n_repos=5, seed=42, segment_size=100)
    engine, golden = _roundtrip(tmp_path, spec, {"num_partitions": 4, "segments_per_epoch": 3})
    assert_state_equal(engine, golden)


def test_mixed_multi_partition(tmp_path):
    spec = StreamSpec(n_events=10_000, n_repos=20, seed=42, segment_size=1000)
    engine, golden = _roundtrip(tmp_path, spec, {"num_partitions": 8, "segments_per_epoch": 4})
    assert_state_equal(engine, golden)


def test_duplicate_delivery_exactly_once(tmp_path):
    """Replaying whole segments (at-least-once) must not change final state."""
    spec = StreamSpec(n_events=5000, n_repos=10, seed=1, segment_size=500)
    engine, golden = _roundtrip(
        tmp_path, spec, {"num_partitions": 4, "segments_per_epoch": 3}, replay_segments=4
    )
    assert_state_equal(engine, golden)


def test_hot_repo_skew(tmp_path):
    """A repo holding ~40% of events spreads over partitions via (repo,path) keying."""
    import os

    spec = StreamSpec(n_events=20_000, n_repos=50, seed=3, segment_size=2000, hot_repo_frac=0.4)
    seg_dir = str(tmp_path / "segments")
    files = generate_stream(seg_dir, spec)
    lake = scratch_lake_dir("skew")
    run_ingest(files, lake, num_partitions=8, segments_per_epoch=20)
    state_files = glob.glob(os.path.join(lake, "part=*", "state-*.parquet"))
    parts_used = {f.split("part=")[1].split("/")[0] for f in state_files}
    assert len(parts_used) == 8, "hot repo must not collapse into few partitions"

    from sonic_etl_ray.pipelines.qc import skew_report

    rep = skew_report(lake)
    assert rep["partitions"] == 8
    assert rep["imbalance"] < 1.5, f"hot repo skew leaked into partitions: {rep}"
    assert_state_equal(lake_final_table(lake), oracle_final_state(files))


def test_resume_after_partial_run(tmp_path):
    """Kill-and-resume: run some epochs, then rerun; final state identical and
    committed epochs are not re-applied (no duplicate or lost applies)."""
    spec = StreamSpec(n_events=8000, n_repos=10, seed=5, segment_size=500)
    seg_dir = str(tmp_path / "segments")
    files = generate_stream(seg_dir, spec)

    lake = scratch_lake_dir("resume")
    # partial run: only first 6 segments (3 epochs of 2)
    run_ingest(files[:6], lake, num_partitions=4, segments_per_epoch=2)
    # resume with the full input; earlier epochs must be skipped
    stats = run_ingest(files, lake, num_partitions=4, segments_per_epoch=2)
    assert stats["epochs_skipped"] == 3
    assert stats["epochs_applied"] == stats["epochs_total"] - 3

    # compare to an uninterrupted run
    lake2 = scratch_lake_dir("resume_ref")
    run_ingest(files, lake2, num_partitions=4, segments_per_epoch=2)
    assert_state_equal(lake_final_table(lake), lake_final_table(lake2))
    assert_state_equal(lake_final_table(lake), oracle_final_state(files))


def test_schema_evolution_add_and_widen(tmp_path):
    """Later segments add size_hint:int32 (→int64) and branch:string; the sink
    unifies schemas (column add + type widen, north rule)."""
    spec = StreamSpec(n_events=6000, n_repos=10, seed=9, segment_size=500, evolve_at=(2000, 4000))
    engine, _ = _roundtrip(tmp_path, spec, {"num_partitions": 4, "segments_per_epoch": 3})
    golden = oracle_final_state(
        sorted(glob.glob(str(tmp_path / "segments" / "*.parquet"))),
        extra_columns=["size_hint", "branch"],
    )
    import pyarrow as pa

    assert engine.schema.field("size_hint").type == pa.int64()
    assert "branch" in engine.column_names
    assert_state_equal(engine, golden)


def test_generator_determinism(tmp_path):
    from sonic_etl_ray.generator import generate_events

    spec = StreamSpec(n_events=500, seed=11)
    assert generate_events(spec).equals(generate_events(spec))


def test_late_segment_repair_for_committed_epoch(tmp_path):
    """A segment arriving AFTER its epoch was manifested must still be
    applied (under a fresh repair epoch) — never silently lost."""
    spec = StreamSpec(n_events=4000, n_repos=6, seed=31, segment_size=500)
    files = generate_stream(str(tmp_path / "seg"), spec)
    lake = scratch_lake_dir("repair")
    # epoch 0 = segments 0..3; deliver it PARTIAL (missing segment 2), so the
    # epoch closes without it, then the straggler shows up
    first = [files[0], files[1], files[3]] + files[4:]
    r1 = run_ingest(first, lake, num_partitions=2, segments_per_epoch=4)
    assert r1["epochs_applied"] == 2 and r1["epochs_repaired"] == 0
    r2 = run_ingest(files, lake, num_partitions=2, segments_per_epoch=4)
    assert r2["epochs_repaired"] == 1 and r2["epochs_applied"] == 0
    assert_state_equal(lake_final_table(lake), oracle_final_state(files))
    # idempotent: a third run repairs nothing and changes nothing
    r3 = run_ingest(files, lake, num_partitions=2, segments_per_epoch=4)
    assert r3["epochs_repaired"] == 0 and r3["epochs_applied"] == 0
    assert_state_equal(lake_final_table(lake), oracle_final_state(files))


def test_finalize_false_defers_trailing_partial_epoch(tmp_path):
    """finalize=False must NOT close a trailing partial epoch; the segments
    apply later once the epoch fills (or a finalize=True run flushes it)."""
    spec = StreamSpec(n_events=3000, n_repos=6, seed=33, segment_size=500)
    files = generate_stream(str(tmp_path / "seg"), spec)  # 6 segments
    lake = scratch_lake_dir("finalize")
    r1 = run_ingest(files[:5], lake, num_partitions=2, segments_per_epoch=4, finalize=False)
    assert r1["epochs_applied"] == 1 and r1["segments_deferred"] == 1
    # the deferred segment is NOT in the lake yet
    assert_state_equal(lake_final_table(lake), oracle_final_state(files[:4]))
    # still-partial trailing epoch stays deferred on a finalize=False rerun
    r2 = run_ingest(files, lake, num_partitions=2, segments_per_epoch=4, finalize=False)
    assert r2["epochs_applied"] == 0 and r2["segments_deferred"] == 2
    # an explicit finalize run flushes the tail; no repair epoch needed
    r3 = run_ingest(files, lake, num_partitions=2, segments_per_epoch=4)
    assert r3["epochs_applied"] == 1 and r3["epochs_repaired"] == 0
    assert_state_equal(lake_final_table(lake), oracle_final_state(files))


def test_task_exchange_equals_groupby_exchange(tmp_path):
    """The raw-task hash exchange (default merge transport) must produce a
    bit-identical lake to the Dataset groupby transport."""
    import ray.data

    from sonic_etl_ray.pipelines.ingest import apply_epoch

    spec = StreamSpec(n_events=4000, n_repos=6, seed=37, segment_size=1000)
    files = generate_stream(str(tmp_path / "seg"), spec)
    lakes = {}
    for mode in ("tasks", "tasks2", "groupby"):
        lake = scratch_lake_dir(f"ex_{mode}")
        apply_epoch(
            ray.data.read_parquet(files), lake, epoch=0,
            num_partitions=4, exchange=mode,
        )
        lakes[mode] = lake
    assert_state_equal(lake_final_table(lakes["tasks"]), lake_final_table(lakes["groupby"]))
    assert_state_equal(lake_final_table(lakes["tasks"]), lake_final_table(lakes["tasks2"]))
    assert_state_equal(lake_final_table(lakes["tasks"]), oracle_final_state(files))


def test_two_level_exchange_ragged_groups(tmp_path):
    """tasks2 with P=7 (group_size √7→3: groups of 3+3+1, exercising the
    single-partition tail group and empty group slices) must be
    bit-identical to the one-level exchange and the oracle."""
    import ray.data

    from sonic_etl_ray.pipelines.ingest import apply_epoch

    spec = StreamSpec(n_events=3000, n_repos=5, seed=91, segment_size=1000)
    files = generate_stream(str(tmp_path / "seg"), spec)
    lakes = {}
    for mode in ("tasks", "tasks2"):
        lake = scratch_lake_dir(f"rg_{mode}")
        apply_epoch(
            ray.data.read_parquet(files), lake, epoch=0,
            num_partitions=7, exchange=mode,
        )
        lakes[mode] = lake
    assert_state_equal(lake_final_table(lakes["tasks"]), lake_final_table(lakes["tasks2"]))
    assert_state_equal(lake_final_table(lakes["tasks2"]), oracle_final_state(files))


def test_read_fallback_failover_on_poisoned_primary(tmp_path):
    """ST6 source failover: an epoch whose primary segment files are
    corrupt is retried from a fallback mirror root; the final lake is
    bit-identical to the oracle and the stats record the failover
    (reference analog: sonic_config/mod.rs:174-242 provider fallback)."""
    import os
    import shutil

    spec = StreamSpec(n_events=4000, n_repos=6, seed=51, segment_size=1000)
    mirror = str(tmp_path / "mirror")
    files = generate_stream(mirror, spec)

    primary = str(tmp_path / "primary")
    os.makedirs(primary)
    for f in files:
        shutil.copy(f, primary)
    # poison one epoch's segment in the primary (epoch 1 with 2 segs/epoch)
    poisoned = os.path.join(primary, os.path.basename(files[2]))
    with open(poisoned, "wb") as fh:
        fh.write(b"not a parquet file")

    primary_files = sorted(glob.glob(primary + "/*.parquet"))
    lake = scratch_lake_dir("failover")
    stats = run_ingest(
        primary_files, lake, num_partitions=4, segments_per_epoch=2,
        read_fallbacks=[mirror],
    )
    assert stats["epochs_applied"] == 2
    assert stats["epochs_failed_over"] == 1
    assert_state_equal(lake_final_table(lake), oracle_final_state(files))

    # no fallback -> the corrupt epoch is a hard error
    lake2 = scratch_lake_dir("failover2")
    with pytest.raises(Exception):
        run_ingest(primary_files, lake2, num_partitions=4, segments_per_epoch=2)

    # fallback that also lacks the file -> original error propagates
    lake3 = scratch_lake_dir("failover3")
    with pytest.raises(Exception):
        run_ingest(
            primary_files, lake3, num_partitions=4, segments_per_epoch=2,
            read_fallbacks=[str(tmp_path / "nonexistent")],
        )


def test_two_level_exchange_single_group_and_tiny_p(tmp_path):
    """tasks2 with P<=2 (num_groups==1) must fall back to the one-level
    exchange instead of tripping Ray's num_returns=1 tuple-as-one-object
    trap, and still match the oracle."""
    import ray.data

    from sonic_etl_ray.pipelines.ingest import apply_epoch

    spec = StreamSpec(n_events=1500, n_repos=4, seed=17, segment_size=500)
    files = generate_stream(str(tmp_path / "seg"), spec)
    lake = scratch_lake_dir("tiny_p_tasks2")
    apply_epoch(
        ray.data.read_parquet(files), lake, epoch=0,
        num_partitions=2, exchange="tasks2",
    )
    assert_state_equal(lake_final_table(lake), oracle_final_state(files))

def test_auto_two_level_exchange_decision_and_equality(tmp_path, monkeypatch):
    """The default exchange='tasks' streams one-level splits until the ref
    limit is crossed, then routes the REMAINING blocks two-level (hybrid).
    Below the limit the two-level exchange is never invoked; with the limit
    forced to 0 the same call goes hybrid — and every shape is bit-identical
    to the forced one-level path and the oracle."""
    import ray.data

    from sonic_etl_ray.pipelines import ingest as ing

    spec = StreamSpec(n_events=3000, n_repos=5, seed=23, segment_size=1000)
    files = generate_stream(str(tmp_path / "seg"), spec)

    calls = {"two": 0}
    real_two = ing._exchange_two_level

    def spy_two(*a, **kw):
        calls["two"] += 1
        return real_two(*a, **kw)

    monkeypatch.setattr(ing, "_exchange_two_level", spy_two)

    # default limit (250k): a few blocks x 4 parts -> pure one-level
    lake_auto = scratch_lake_dir("auto_one")
    ing.apply_epoch(ray.data.read_parquet(files), lake_auto, epoch=0, num_partitions=4)
    assert calls["two"] == 0

    # limit 0: head keeps one block (streaming overlap floor), the tail
    # routes through the two-level exchange -> hybrid rows
    monkeypatch.setenv("SONIC_TWO_LEVEL_AUTO_REFS", "0")
    lake_auto2 = scratch_lake_dir("auto_two")
    ing.apply_epoch(
        ray.data.read_parquet(files, override_num_blocks=3),
        lake_auto2, epoch=0, num_partitions=4, batch_size=500,
    )
    assert calls["two"] == 1

    # both auto decisions and the forced paths agree bit-for-bit
    monkeypatch.delenv("SONIC_TWO_LEVEL_AUTO_REFS")
    lake_forced = scratch_lake_dir("auto_forced1")
    ing.apply_epoch(
        ray.data.read_parquet(files), lake_forced, epoch=0,
        num_partitions=4, exchange="tasks1",
    )
    assert_state_equal(lake_final_table(lake_auto), lake_final_table(lake_auto2))
    assert_state_equal(lake_final_table(lake_auto), lake_final_table(lake_forced))
    assert_state_equal(lake_final_table(lake_auto), oracle_final_state(files))
