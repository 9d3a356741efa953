"""Per-epoch change-data-feed reads (the Delta-CDF analog of the
reference's per-table publish stream, ``sonic_config/mod.rs:501-574``).

Two layers: a hand-built scenario pinning the insert/update/delete
classification and delete post-image semantics, and a generated-stream
property check diffing the feed against two time-travel snapshots."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from sonic_etl_ray.generator import StreamSpec, generate_stream
from sonic_etl_ray.pipelines.ingest import (
    apply_epoch,
    lake_final_table,
    read_change_feed,
    run_ingest,
    scratch_lake_dir,
)


def _events(rows: list[tuple[int, str, str, str, str | None]]) -> ray.data.Dataset:
    lsn, op, repo, path, content = map(list, zip(*rows))
    return ray.data.from_arrow(
        pa.table(
            {
                "lsn": pa.array(lsn, pa.int64()),
                "op": pa.array(op, pa.string()),
                "repo": pa.array(repo, pa.string()),
                "path": pa.array(path, pa.string()),
                "commit": pa.array([f"c{n}" for n in lsn], pa.string()),
                "lang": pa.array(["py"] * len(lsn), pa.string()),
                "content": pa.array(content, pa.string()),
            }
        )
    )


def test_feed_classification():
    lake = scratch_lake_dir("feedtest")
    apply_epoch(
        _events(
            [
                (1, "insert", "rA", "f1", "one"),
                (2, "insert", "rA", "f2", "two"),
                (3, "insert", "rB", "f3", "three"),
            ]
        ),
        lake, epoch=0, num_partitions=4,
    )
    apply_epoch(
        _events(
            [
                (4, "insert", "rA", "f1", "one-v2"),  # update of a live key
                (5, "delete", "rA", "f2", None),       # delete of a live key
                (6, "insert", "rB", "f4", "four"),     # brand-new key
                (7, "delete", "rB", "f9", None),       # delete of a never-seen key
            ]
        ),
        lake, epoch=1, num_partitions=4,
    )

    # epoch 0: everything is an insert
    f0 = read_change_feed(lake, epoch=0).to_pandas()
    assert sorted(f0["change_type"]) == ["insert"] * 3

    f1 = (
        read_change_feed(lake, epoch=1)
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    assert list(zip(f1["repo"], f1["path"], f1["change_type"], f1["lsn"])) == [
        ("rA", "f1", "update", 4),
        ("rA", "f2", "delete", 5),
        ("rB", "f4", "insert", 6),
        # (rB, f9): tombstone for a key never live → no logical change row
    ]
    # delete rows carry no post-image payload
    drow = f1[f1["change_type"] == "delete"].iloc[0]
    assert pd.isna(drow["content"]) and pd.isna(drow["size_bytes"])
    # update rows carry the post-image
    urow = f1[f1["change_type"] == "update"].iloc[0]
    assert urow["content"] == "one-v2" and urow["commit"] == "c4"

    # an epoch with no commits for any partition yields an empty feed
    f2 = read_change_feed(lake, epoch=2)
    assert f2.count() == 0


def _brute_diff(cur: pa.Table, prev: pa.Table) -> pd.DataFrame:
    c = cur.to_pandas().set_index(["repo", "path"])
    p = prev.to_pandas().set_index(["repo", "path"])
    rows = []
    for key in c.index:
        if key not in p.index:
            rows.append((*key, "insert", int(c.loc[key, "applied_lsn"])))
        elif int(c.loc[key, "applied_lsn"]) != int(p.loc[key, "applied_lsn"]):
            rows.append((*key, "update", int(c.loc[key, "applied_lsn"])))
    for key in p.index.difference(c.index):
        rows.append((*key, "delete", None))  # lsn checked structurally below
    return (
        pd.DataFrame(rows, columns=["repo", "path", "change_type", "lsn"])
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )


def test_feed_matches_snapshot_diff(tmp_path):
    """Generated mixed stream, 3 epochs: every epoch's feed must equal the
    brute-force diff of the two adjacent time-travel snapshots."""
    spec = StreamSpec(n_events=3000, n_repos=8, seed=11, segment_size=500)
    files = generate_stream(str(tmp_path / "segs"), spec)
    lake = scratch_lake_dir("feedprop")
    run_ingest(files, lake, num_partitions=4, segments_per_epoch=2)

    for epoch in range(3):
        feed = (
            read_change_feed(lake, epoch=epoch)
            .to_pandas()
            .sort_values(["repo", "path"])
            .reset_index(drop=True)
        )
        cur = lake_final_table(lake, as_of_epoch=epoch)
        prev = (
            lake_final_table(lake, as_of_epoch=epoch - 1)
            if epoch > 0
            else cur.schema.empty_table()
        )
        golden = _brute_diff(cur, prev)
        got = feed[["repo", "path", "change_type"]]
        pd.testing.assert_frame_equal(
            got, golden[["repo", "path", "change_type"]], check_dtype=False
        )
        # non-delete rows: winning lsn and post-image match the snapshot
        live = feed[feed["change_type"] != "delete"].set_index(["repo", "path"])
        snap = cur.to_pandas().set_index(["repo", "path"])
        for key, row in live.iterrows():
            assert int(row["lsn"]) == int(snap.loc[key, "applied_lsn"])
            assert row["content_sha256"] == snap.loc[key, "content_sha256"]


def test_change_feed_commit_order_stable_around_dml():
    """A DML epoch's changes appear under ITS epoch and do not vanish when
    a later (numerically smaller) stream epoch commits — the feed for an
    already-consumed epoch must never mutate."""
    import pyarrow.compute as pc

    from sonic_etl_ray.pipelines.dml import delete_where

    def feed(lake, epoch):
        refs = read_change_feed(lake, epoch).to_arrow_refs()
        return pa.concat_tables([ray.get(r) for r in refs])

    lake = scratch_lake_dir("cfdml")
    apply_epoch(
        _events([(1, "insert", "rA", "a.py", "alpha"),
                 (2, "insert", "rA", "b.py", "beta")]),
        lake, epoch=0, num_partitions=4,
    )
    res = delete_where(lake, pc.field("path") == "b.py")
    feed_at_dml = feed(lake, res["epoch"])
    assert feed_at_dml.num_rows == 1
    assert feed_at_dml["change_type"].to_pylist() == ["delete"]
    # reinsert under a later stream epoch with a smaller epoch NUMBER
    apply_epoch(_events([(50, "insert", "rA", "b.py", "beta-v2")]),
                lake, epoch=1, num_partitions=4)
    assert feed(lake, res["epoch"]).equals(feed_at_dml)  # consumed feed immutable
    e1 = feed(lake, 1)
    assert e1["change_type"].to_pylist() == ["insert"]
    assert e1.filter(pc.equal(e1["path"], "b.py"))["content"].to_pylist() == ["beta-v2"]


def test_feed_consumer_cursor_protocol(ray_session, tmp_path):
    """Durable subscription: poll → process → ack; a crash between process
    and ack re-delivers (at-least-once), acked epochs never re-deliver,
    out-of-order acks refuse, and the cursor survives 'restart' (a fresh
    consumer object)."""
    import pyarrow as pa
    import ray.data

    from sonic_etl_ray.pipelines.ingest import FeedConsumer, apply_epoch

    lake = str(tmp_path / "lake")

    def ev(lsn, path, content):
        return pa.table(
            {
                "op": pa.array(["insert"], pa.string()),
                "lsn": pa.array([lsn], pa.int64()),
                "repo": pa.array(["r0"], pa.string()),
                "path": pa.array([path], pa.string()),
                "commit": pa.array([f"c{lsn}"], pa.string()),
                "lang": pa.array(["py"], pa.string()),
                "content": pa.array([content], pa.string()),
            }
        )

    for e in range(3):
        apply_epoch(ray.data.from_arrow(ev(e * 10, f"f{e}", f"v{e}")), lake,
                    epoch=e, num_partitions=2)

    cur = str(tmp_path / "consumer" / "cursor.json")
    c = FeedConsumer(lake, cur)
    assert c.acked_epoch() is None
    got = [(e, ds.count()) for e, ds in c.poll()]
    assert [e for e, _ in got] == [0, 1, 2]
    assert all(n == 1 for _, n in got)

    # process epoch 0 then "crash" before ack: epoch 0 re-delivers
    assert [e for e, _ in FeedConsumer(lake, cur).poll()] == [0, 1, 2]
    c.ack(0)
    assert [e for e, _ in FeedConsumer(lake, cur).poll()] == [1, 2]

    # out-of-order ack refuses; in-order proceeds; re-ack is idempotent
    import pytest as _pytest

    with _pytest.raises(ValueError):
        c.ack(2)
    c.ack(1)
    c.ack(1)
    assert c.acked_epoch() == 1

    # new upstream epoch becomes visible to the same cursor
    apply_epoch(ray.data.from_arrow(ev(100, "f9", "v9")), lake, epoch=3, num_partitions=2)
    assert [e for e, _ in c.poll()] == [2, 3]
    c.ack(2)
    c.ack(3)
    assert list(c.poll()) == []
    # nothing pending: a forward ack must refuse, not silently skip
    with _pytest.raises(ValueError):
        c.ack(99)
    assert c.acked_epoch() == 3
