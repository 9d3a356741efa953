"""Single-writer lease: exclusion, heartbeat fencing, stale takeover."""

from __future__ import annotations

import os
import time

import pytest

from sonic_etl_ray.state.commitlog import (
    LeaseHeld,
    acquire_writer_lease,
    refresh_writer_lease,
    release_writer_lease,
)


def test_lease_excludes_second_writer(tmp_path):
    lake = str(tmp_path / "lake")
    tok = acquire_writer_lease(lake, "a")
    with pytest.raises(LeaseHeld) as ei:
        acquire_writer_lease(lake, "b")
    assert "'a'" in str(ei.value)
    release_writer_lease(lake, tok)
    tok2 = acquire_writer_lease(lake, "b")  # free after release
    release_writer_lease(lake, tok2)


def test_stale_lease_taken_over_and_old_holder_fenced(tmp_path):
    lake = str(tmp_path / "lake")
    tok_dead = acquire_writer_lease(lake, "dead", ttl_s=0.2)
    time.sleep(0.4)  # no heartbeat → stale
    tok_new = acquire_writer_lease(lake, "new", ttl_s=0.2)
    # the dead holder is fenced out of refresh and cannot release the
    # new owner's lease
    with pytest.raises(LeaseHeld):
        refresh_writer_lease(lake, tok_dead)
    release_writer_lease(lake, tok_dead)  # no-op: not the holder
    refresh_writer_lease(lake, tok_new)  # still held
    release_writer_lease(lake, tok_new)


def test_refresh_keeps_lease_live(tmp_path):
    lake = str(tmp_path / "lake")
    tok = acquire_writer_lease(lake, "a", ttl_s=0.5)
    for _ in range(3):
        time.sleep(0.2)
        refresh_writer_lease(lake, tok)
    # heartbeats kept it fresh: takeover must fail
    with pytest.raises(LeaseHeld):
        acquire_writer_lease(lake, "b", ttl_s=0.5)
    release_writer_lease(lake, tok)


def test_run_ingest_exclusive(tmp_path):
    from sonic_etl_ray.generator import StreamSpec, generate_stream
    from sonic_etl_ray.pipelines.ingest import run_ingest

    files = generate_stream(
        str(tmp_path / "segs"),
        StreamSpec(n_events=600, n_repos=4, seed=5, segment_size=200),
    )
    lake = str(tmp_path / "lake")
    other = acquire_writer_lease(lake, "other")
    with pytest.raises(LeaseHeld):
        run_ingest(files, lake, num_partitions=2, exclusive=True)
    release_writer_lease(lake, other)
    stats = run_ingest(files, lake, num_partitions=2, exclusive=True)
    assert stats["epochs_applied"] > 0
    # lease released after the run: immediately reacquirable
    tok = acquire_writer_lease(lake, "after")
    release_writer_lease(lake, tok)
    assert not os.path.exists(f"{lake}/_WRITER_LEASE.json")


def test_corrupt_segment_quarantine_and_repair(tmp_path):
    from sonic_etl_ray.generator import StreamSpec, generate_stream
    from sonic_etl_ray.oracle import assert_state_equal, oracle_final_state
    from sonic_etl_ray.pipelines.ingest import (
        lake_final_table,
        read_quarantine,
        run_ingest,
    )

    files = generate_stream(
        str(tmp_path / "segs"),
        StreamSpec(n_events=800, n_repos=4, seed=9, segment_size=200),
    )
    good_bytes = open(files[1], "rb").read()
    with open(files[1], "wb") as f:
        f.write(b"NOT A PARQUET FILE")
    lake = str(tmp_path / "lake")

    stats = run_ingest(
        files, lake, num_partitions=2, segments_per_epoch=1, validate_inputs=True
    )
    assert stats["segments_quarantined"] == 1
    assert stats["epochs_applied"] == 3
    q = read_quarantine(lake)
    assert len(q) == 1 and q[0]["file"] == files[1] and "error" in q[0]
    # idempotent record: re-run doesn't duplicate quarantine entries
    run_ingest(files, lake, num_partitions=2, segments_per_epoch=1, validate_inputs=True)
    assert len(read_quarantine(lake)) == 1

    # repair: restore the file, re-run — stable epoch numbering applies it
    # to the epoch it always belonged to; final state == full oracle replay
    with open(files[1], "wb") as f:
        f.write(good_bytes)
    stats2 = run_ingest(
        files, lake, num_partitions=2, segments_per_epoch=1, validate_inputs=True
    )
    assert stats2["segments_quarantined"] == 0
    assert stats2["epochs_applied"] == 1 and stats2["epochs_skipped"] == 3
    assert_state_equal(lake_final_table(lake), oracle_final_state(files))


def test_tailer_exclusive_holds_and_releases(tmp_path):
    from sonic_etl_ray.generator import StreamSpec, generate_stream
    from sonic_etl_ray.pipelines.tail import Tailer

    segs = str(tmp_path / "segs")
    generate_stream(segs, StreamSpec(n_events=400, n_repos=3, seed=3, segment_size=100))
    lake = str(tmp_path / "lake")

    held_during: list[bool] = []

    def probe(_tick):
        try:
            tok = acquire_writer_lease(lake, "intruder")
        except LeaseHeld:
            held_during.append(True)
        else:  # pragma: no cover - would mean the lease failed
            release_writer_lease(lake, tok)
            held_during.append(False)

    t = Tailer(segs, lake, num_partitions=2, segments_per_epoch=2)
    res = t.run(poll_interval_s=0.01, max_ticks=2, on_tick=probe, exclusive=True)
    assert res["ticks"] == 2
    assert held_during and all(held_during)  # lease held across the loop
    tok = acquire_writer_lease(lake, "after")  # released at loop exit
    release_writer_lease(lake, tok)


def test_claimant_ttl_cannot_steal_from_slower_holder(tmp_path):
    """Staleness is judged against the TTL the HOLDER acquired with (it is
    persisted in the lease file) — a claimant passing a tiny ttl_s must not
    steal from a holder heartbeating at its own granted cadence."""
    lake = str(tmp_path / "lake")
    tok = acquire_writer_lease(lake, "slow", ttl_s=30.0)
    time.sleep(0.3)  # well within the holder's 30s TTL
    with pytest.raises(LeaseHeld):
        acquire_writer_lease(lake, "thief", ttl_s=0.05)
    release_writer_lease(lake, tok)


def test_takeover_leaves_no_corpse_files(tmp_path):
    lake = str(tmp_path / "lake")
    acquire_writer_lease(lake, "dead", ttl_s=0.1)
    time.sleep(0.3)
    tok = acquire_writer_lease(lake, "new", ttl_s=0.1)
    stale = [f for f in os.listdir(lake) if ".stale" in f]
    assert stale == []
    release_writer_lease(lake, tok)


def test_exclusive_ingest_heartbeats_every_epoch(tmp_path):
    """run_ingest(exclusive=True) refreshes + fence-checks the lease before
    every epoch apply, so a run longer than the TTL never goes stale: a
    rival claimant during the run must see a live lease."""
    from sonic_etl_ray.generator import StreamSpec, generate_stream
    from sonic_etl_ray.pipelines.ingest import _run_ingest_impl, run_ingest

    files = generate_stream(
        str(tmp_path / "segs"),
        StreamSpec(n_events=1_500, n_repos=4, seed=3, segment_size=250),
    )
    # unit level: the hook fires once per applied epoch
    calls: list[int] = []
    lake = str(tmp_path / "lake_hook")
    _run_ingest_impl(
        files, lake, num_partitions=2, segments_per_epoch=2,
        on_epoch=lambda: calls.append(1),
    )
    assert len(calls) == 3  # 6 segments / 2 per epoch

    # integration: the lease file's heartbeat advances during the run
    # (TTL far below the run length) and the lease is released at the end
    lake2 = str(tmp_path / "lake_hb")
    stats = run_ingest(
        files, lake2, num_partitions=2, segments_per_epoch=2,
        exclusive=True, lease_ttl_s=0.4,
    )
    assert stats["epochs_applied"] == 3
    from sonic_etl_ray.state.commitlog import LEASE_NAME

    assert not os.path.exists(os.path.join(lake2, LEASE_NAME))


def test_torn_lease_file_recovers(tmp_path):
    """A 0-byte / torn lease (writer killed between O_EXCL create and write)
    must NOT wedge the lake: recent torn file -> LeaseHeld; once older than
    the claimant TTL it is taken over like any stale corpse."""
    import os
    import time

    import pytest

    from sonic_etl_ray.state import commitlog as cl

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    path = os.path.join(lake, "_WRITER_LEASE.json")
    open(path, "w").close()  # torn: exists, empty
    with pytest.raises(cl.LeaseHeld, match="mid-write"):
        cl.acquire_writer_lease(lake, owner="x", ttl_s=60.0)
    old = time.time() - 120
    os.utime(path, (old, old))  # now stale
    token = cl.acquire_writer_lease(lake, owner="x", ttl_s=60.0)
    assert token
    cl.release_writer_lease(lake, token)


def test_release_does_not_delete_rivals_lease(tmp_path):
    """release(tokenA) after a takeover must leave the new holder's lease in
    place (rename-verify, not read-check-remove)."""
    import json
    import os

    from sonic_etl_ray.state import commitlog as cl

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    a = cl.acquire_writer_lease(lake, owner="a", ttl_s=60.0)
    path = os.path.join(lake, "_WRITER_LEASE.json")
    rival = {"owner": "b", "pid": 1, "token": "rival-token", "ttl_s": 60.0}
    with open(path, "w") as f:
        json.dump(rival, f)  # simulate completed takeover
    cl.release_writer_lease(lake, a)
    with open(path) as f:
        assert json.load(f)["token"] == "rival-token"  # rival survives
    cl.release_writer_lease(lake, "rival-token")
    assert not os.path.exists(path)


def test_refresh_fenced_after_takeover(tmp_path):
    """refresh with a superseded token raises LeaseHeld (zombie fencing)."""
    import json
    import os

    import pytest

    from sonic_etl_ray.state import commitlog as cl

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    a = cl.acquire_writer_lease(lake, owner="a", ttl_s=60.0)
    path = os.path.join(lake, "_WRITER_LEASE.json")
    with open(path, "w") as f:
        json.dump({"owner": "b", "pid": 1, "token": "rival", "ttl_s": 60.0}, f)
    with pytest.raises(cl.LeaseHeld):
        cl.refresh_writer_lease(lake, a)
