"""sf1-scale stress harness: 10x the sf0.1 tables, then oracle + engine runs.

Round-5 evidence path (VERDICT r04 stretch #8). Three steps, each idempotent:

    python tools/sf1_stress.py generate   # build /tmp/sf1 (10x sf0.1, ~1 min)
    python tools/sf1_stress.py oracle     # 11 tractable-oracle queries via the
                                          # dtype-strict gate replica
    python tools/sf1_stress.py engine     # engine-only timings for the dedup
                                          # family whose brute-force SQL
                                          # oracles are quadratic

The generated input is deterministic and derived only from the driver's
sf0.1 parquet: documents = 10 copies (copy 0 byte-identical; later copies
append a copy-tag token to alternating docs — a pathologically dup-heavy
corpus that stresses the banded joins' skew behavior), embeddings = 10
id-remapped copies (cosine ties exercise the vec_id tie-break), events = 10
copies with event_id remapped past the original span (10x-deep version
chains per key — the hot-key case). Engine-vs-oracle comparison runs on the
SAME generated parquet, so the input needs only the right shape, not the
driver's generator. Round-5 findings from this harness: the all-duplicate
ingest batch schema-loss crash and the once-per-shared-band candidate
multiplicity (fixed in functions/dedup.py; 306 s -> 44 s fuzzy, 40 -> 21 s
minhash at sf1).
"""
from __future__ import annotations

import os
import subprocess
import sys

SRC = os.environ.get("SF1_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("SF1_DIR", "/tmp/sf1")
COPIES = 10

ORACLE_QUERIES = [
    "cdc_scd2_incremental", "cdc_state_at_lsn", "cdc_key_history",
    "cdc_pit_enrich", "dedup_incremental", "dedup_incremental_sharded",
    "substring_dup_spans", "embedding_topk_cosine", "embedding_lsh_topk",
    "embedding_lsh_indexed_extended", "embedding_ivf_indexed_extended",
    # round-5 additions with linear oracles — tractable at sf1
    "typed_narrowing_audit", "content_sha_hex", "range_chunk_plan",
    "bucketed_sink_roundtrip", "jsonl_roundtrip", "csv_backfill_ranges",
    "ipc_export_roundtrip", "checked_timestamp_roundtrip",
]
ENGINE_QUERIES = [
    "minhash_lsh_dedup", "near_dup_clusters", "dedup_incremental_fuzzy",
    "interdoc_ngram_dup", "semantic_dedup",
]


def generate() -> None:
    import numpy as np  # noqa: F401  (kept: grep-parity with generator deps)
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DST, exist_ok=True)

    t = pq.read_table(f"{SRC}/documents.parquet")
    n = t.num_rows
    base_id = t["doc_id"].to_numpy()
    texts = t["text"].to_pylist()
    parts = []
    for c in range(COPIES):
        txt = texts if c == 0 else [
            s if (i + c) % 2 else s + f" c{c}" for i, s in enumerate(texts)
        ]
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array(base_id + c * n, pa.int64()),
                    "text": pa.array(txt, pa.string()),
                    "lang": t["lang"],
                    "source": t["source"],
                    "n_chars": pa.array([len(s) for s in txt], pa.int64()),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{DST}/documents.parquet")
    print("documents", n * COPIES)

    e = pq.read_table(f"{SRC}/embeddings.parquet")
    m = e.num_rows
    vid = e["vec_id"].to_numpy()
    pq.write_table(
        pa.concat_tables(
            [
                pa.table(
                    {
                        "vec_id": pa.array(vid + c * m, pa.int64()),
                        "embedding": e["embedding"],
                        "label": e["label"],
                    }
                )
                for c in range(COPIES)
            ]
        ),
        f"{DST}/embeddings.parquet",
    )
    print("embeddings", m * COPIES)

    ev = pq.read_table(f"{SRC}/events.parquet")
    k = ev.num_rows
    eid = ev["event_id"].to_numpy()
    span = int(eid.max()) + 1
    pq.write_table(
        pa.concat_tables(
            [
                pa.table(
                    {
                        "event_id": pa.array(eid + c * span, pa.int64()),
                        "ts": ev["ts"],
                        "user_id": ev["user_id"],
                        "event_type": ev["event_type"],
                        "value": ev["value"],
                        "props": ev["props"],
                    }
                )
                for c in range(COPIES)
            ]
        ),
        f"{DST}/events.parquet",
    )
    print("events", k * COPIES)

    for side in "region nation customer supplier part orders lineitem".split():
        dst = f"{DST}/{side}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{side}.parquet", dst)
    print("side tables linked")


def oracle() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.exit(
        subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "check_contract.py"),
             DST, *ORACLE_QUERIES],
            cwd=repo,
        ).returncode
    )


def engine() -> None:
    import time

    import ray

    ray.init(
        address="local", num_cpus=32, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import __ray_entry__ as e

    qs = e.queries()
    for name in ENGINE_QUERIES:
        t0 = time.perf_counter()
        out = qs[name](DST)
        n = len(out) if hasattr(out, "__len__") else out.count()
        print(f"{name:28s} {time.perf_counter() - t0:7.2f}s  rows={n}", flush=True)
    ray.shutdown()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "generate"
    {"generate": generate, "oracle": oracle, "engine": engine}[cmd]()
