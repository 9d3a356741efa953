"""Change-feed-driven ANN index maintenance, end to end.

The CDC-native maintenance story the extended-index queries document, but
driven through the REAL epoch machinery: ingest commits epochs → a durable
`FeedConsumer` polls each committed epoch's change feed → vectors derived
from the post-images are appended to a live LSH index with
`extend_lsh_index(tag=epoch)` → the consumer acks. Verifies:

- the drained index holds exactly one row per applied insert/update change
  with the SAME bucket a direct hyperplane hash assigns (no lost, dup, or
  mis-bucketed extension rows);
- at-least-once delivery is safe: re-delivering an already-extended epoch
  (crash between extend and ack) is a marker no-op — file count unchanged.
"""
from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _vectors_from_feed(feed) -> pa.Table:
    """Deterministic (vec_id, embedding) rows from one epoch's feed:
    vec_id = winning LSN (unique per logical change), embedding = the first
    16 bytes of content_sha256 as floats — a stand-in for a real encoder
    with the same plumbing (content-derived, delete rows excluded)."""
    df = feed.to_pandas()
    df = df[df["change_type"] != "delete"]
    if df.empty:
        return pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        )
    vecs = [
        np.frombuffer(bytes.fromhex(h[:32]), dtype=np.uint8).astype(np.float32)
        for h in df["content_sha256"]
    ]
    return pa.table(
        {
            "vec_id": pa.array(df["lsn"].to_numpy(), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }
    )


def test_feed_driven_ann_index_maintenance(tmp_path):
    import ray.data

    from sonic_etl_ray.functions.similarity import (
        HyperplaneHasher,
        build_lsh_index,
        extend_lsh_index,
    )
    from sonic_etl_ray.generator import StreamSpec, generate_stream
    from sonic_etl_ray.pipelines.ingest import FeedConsumer, run_ingest

    segs = str(tmp_path / "segs")
    lake = str(tmp_path / "lake")
    generate_stream(
        segs, StreamSpec(n_events=3000, n_repos=8, seed=11, segment_size=500)
    )
    stats = run_ingest(
        sorted(glob.glob(segs + "/*.parquet")), lake,
        num_partitions=4, segments_per_epoch=2,
    )
    assert stats["epochs_applied"] == 3

    consumer = FeedConsumer(lake, str(tmp_path / "cursor.json"))
    idx = str(tmp_path / "lsh_idx")
    sf_base = str(tmp_path / "sf_base")
    os.makedirs(sf_base)

    n_planes, seed = 5, 13
    all_vecs: list[pa.Table] = []
    for epoch, feed in consumer.poll():
        vecs = _vectors_from_feed(feed)
        all_vecs.append(vecs)
        if epoch == 0:
            # bootstrap: the first epoch becomes the index's base build
            pq.write_table(vecs, f"{sf_base}/embeddings.parquet")
            build_lsh_index(sf_base, idx, n_planes=n_planes, seed=seed)
        else:
            stats_e = extend_lsh_index(
                idx, ray.data.from_arrow(vecs), tag=f"e{epoch}"
            )
            assert stats_e["rows"] == vecs.num_rows
        consumer.ack(epoch)
    assert consumer.acked_epoch() == 2

    # drained index == every applied change, hashed with the SAME family
    want = pa.concat_tables(all_vecs)
    dim = len(want["embedding"][0])
    hasher = HyperplaneHasher(dim, n_planes, seed)
    want_bucket = hasher.bucket(
        np.stack([np.asarray(v, np.float64) for v in want["embedding"].to_pylist()])
    )
    want_map = dict(zip(want["vec_id"].to_pylist(), want_bucket.tolist()))

    got_map: dict[int, int] = {}
    for bdir in glob.glob(os.path.join(idx, "bucket=*")):
        b = int(os.path.basename(bdir).split("=")[1])
        for f in glob.glob(os.path.join(bdir, "*.parquet")):
            for v in pq.read_table(f, columns=["vec_id"])["vec_id"].to_pylist():
                assert v not in got_map, f"duplicate vec_id {v} in index"
                got_map[v] = b
    assert got_map == want_map

    # at-least-once: crash between extend and ack re-delivers the epoch —
    # the tag marker makes the re-extension a no-op (no files added)
    n_files = len(glob.glob(os.path.join(idx, "bucket=*", "*.parquet")))
    replay = extend_lsh_index(idx, ray.data.from_arrow(all_vecs[-1]), tag="e2")
    assert replay["rows"] == all_vecs[-1].num_rows  # stats replayed from marker
    assert len(glob.glob(os.path.join(idx, "bucket=*", "*.parquet"))) == n_files
