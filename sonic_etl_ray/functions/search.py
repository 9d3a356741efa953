"""Sharded inverted token index + conjunctive / ranked text search.

The reference has no search surface (its lookup joins are key-equality only,
SURVEY §2.5), but a training-data lake needs "find the documents containing
these terms" without scanning every row's text — the same read-pruning story
as the LSH/IVF ANN indexes in :mod:`.similarity`, applied to tokens:

- **Index layout**: one Parquet posting table ``(term, doc_id, tf)``
  hash-partitioned into ``bucket=N/`` directories by
  ``md5_number_lower('tok:' || term) % num_buckets``. A query for k terms
  reads at most k bucket directories (file-level pruning) and pushes
  ``term IN (...)`` into the Parquet scan (row-group pruning) — the rest of
  the index is never opened. At 100 TB the posting table is itself large,
  but per-query I/O is bounded by the queried terms' posting lists, not the
  corpus.
- **Build shape**: tf is per-document, and a document is wholly contained in
  one batch, so the posting builder is a pure per-batch combiner (one row
  per distinct (doc, term) in the batch — never one per occurrence). The
  only wide step is the partitioned write. Built in a staging dir and
  atomically renamed (shared with the ANN indexes'
  :func:`~sonic_etl_ray.functions.similarity._publish_index_dir`).
- **Determinism / oracle**: bucket routing uses DuckDB's
  ``md5_number_lower`` (like :mod:`.sampling`), and ranking weights are
  integer-quantized (floor-log2 via bit length, like
  :func:`~sonic_etl_ray.functions.text.lm_quality_proxy`) so BOTH engines
  compute exact integers and every query has a hash-exact SQL oracle.

Ranking: ``score(doc) = Σ_t tf(doc,t) · w(t)`` with
``w(t) = 1 + floor_log2((N+1) // (df(t)+1))`` — a tf-idf family member whose
idf is exact integer math. df comes from the queried terms' posting lists
alone (count of postings per term); N rides in the index's ``meta.json``.
"""

from __future__ import annotations

import glob
import json
import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .text import TOKEN_RE, md5_u64

NUM_BUCKETS = 16


# --------------------------------------------------------------- build


def _postings_batch(b: pd.DataFrame, num_buckets: int) -> pa.Table:
    """Per-batch posting combiner: (term, doc_id, tf, bucket) — exact
    because each document's text is wholly inside the batch."""
    toks = b["text"].fillna("").str.lower().str.findall(TOKEN_RE)
    lens = toks.str.len().fillna(0).astype(np.int64).to_numpy()
    if int(lens.sum()) == 0:
        return pa.table(
            {
                "term": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
            }
        )
    flat = pd.DataFrame(
        {
            "doc_id": np.repeat(b["doc_id"].to_numpy(), lens),
            "term": toks.explode().dropna().to_numpy(),
        }
    )
    tf = flat.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
    bucket = (md5_u64(("tok:" + tf["term"]).tolist()) % np.uint64(num_buckets)).astype(
        np.int64
    )
    return pa.table(
        {
            "term": pa.array(tf["term"].astype(str), pa.string()),
            "doc_id": pa.array(tf["doc_id"].to_numpy(), pa.int64()),
            "tf": pa.array(tf["tf"].to_numpy().astype(np.int64), pa.int64()),
            "bucket": pa.array(bucket, pa.int64()),
        }
    )


def build_token_index(
    sf_dir: str, index_dir: str, num_buckets: int = NUM_BUCKETS
) -> str:
    """Build the bucket-partitioned posting index for ``documents.parquet``.

    Streaming: read (doc_id, text) → per-batch posting combiner →
    ``write_parquet(partition_cols=['bucket'])``. No driver materialization;
    the index can be arbitrarily larger than driver memory."""
    from .similarity import _publish_index_dir

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_docs = ds.count()  # Parquet metadata read — no scan
    posts = ds.map_batches(
        lambda b: _postings_batch(b, num_buckets), batch_format="pandas"
    )
    tmp_dir = f"{index_dir}.build.{uuid.uuid4().hex[:8]}"
    posts.write_parquet(tmp_dir, partition_cols=["bucket"])
    with open(os.path.join(tmp_dir, "meta.json"), "w") as f:
        json.dump({"n_docs": int(n_docs), "num_buckets": num_buckets}, f)
    open(os.path.join(tmp_dir, "_INDEX_READY"), "w").close()
    _publish_index_dir(tmp_dir, index_dir)
    return index_dir


def _ensure_index(sf_dir: str, num_buckets: int = NUM_BUCKETS) -> str:
    """On-disk cached index keyed on (path, mtime+size, params) — the SAME
    cache-key helper as the ANN indexes (md5 digest, not salted ``hash()``;
    mtime+size invalidates on in-place input change), pointed at the
    documents table."""
    from .similarity import _index_cache_dir

    index_dir = _index_cache_dir(
        "tok", sf_dir, num_buckets, src_name="documents.parquet"
    )
    if not os.path.exists(os.path.join(index_dir, "_INDEX_READY")):
        build_token_index(sf_dir, index_dir, num_buckets=num_buckets)
    return index_dir


# --------------------------------------------------------------- query


def _term_posting_paths(index_dir: str, terms: list[str]) -> list[str]:
    """Files for ONLY the buckets the query terms hash into — the
    file-level read pruning that makes the index an index."""
    meta = json.load(open(os.path.join(index_dir, "meta.json")))
    nb = np.uint64(meta["num_buckets"])
    buckets = sorted({int(h % nb) for h in md5_u64([f"tok:{t}" for t in terms])})
    return [
        f
        for bkt in buckets
        for f in sorted(glob.glob(os.path.join(index_dir, f"bucket={bkt}", "*.parquet")))
    ]


def _read_postings(index_dir: str, terms: list[str]) -> ray.data.Dataset | None:
    import pyarrow.compute as pc

    paths = _term_posting_paths(index_dir, terms)
    if not paths:
        return None
    return ray.data.read_parquet(
        paths,
        columns=["term", "doc_id", "tf"],
        filter=pc.field("term").isin(terms),
    )


def search_docs(
    sf_dir: str, terms: tuple[str, ...] = ("spark", "window")
) -> pd.DataFrame:
    """Conjunctive (AND) search: doc_ids containing EVERY query term.

    Postings hold one row per (doc, term), so a doc matches iff its posting
    count over the query terms equals the number of distinct terms — one
    small groupby over the pruned posting read, nothing driver-side."""
    qterms = sorted(set(terms))
    index_dir = _ensure_index(sf_dir)
    posts = _read_postings(index_dir, qterms)
    if posts is None:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    hits = posts.groupby("doc_id").count()

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:  # empty blocks can arrive schema-less; a RENAMED
            # count column must instead fail loudly, not read as no-hits
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
        m = b["count()"].to_numpy() == len(qterms)
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy()[m].astype("int64")})

    out = hits.map_batches(keep, batch_format="pandas").to_pandas()
    if "doc_id" not in out.columns:  # zero blocks survived the filter
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True)


def search_ranked(
    sf_dir: str, terms: tuple[str, ...] = ("spark", "dup", "hash"), k: int = 15
) -> pd.DataFrame:
    """Disjunctive (OR) ranked search: top-k docs by the integer tf-idf
    score in the module docstring; ties break on doc_id ascending.

    df per term and the per-doc score reductions both run over the pruned
    posting read; the global top-k is per-block top-k → a ≤k-row sort, the
    same bounded-sort pattern as ``vocab_topk``."""
    from ray.data.aggregate import Sum

    qterms = sorted(set(terms))
    index_dir = _ensure_index(sf_dir)
    meta = json.load(open(os.path.join(index_dir, "meta.json")))
    n_docs = int(meta["n_docs"])
    posts = _read_postings(index_dir, qterms)
    if posts is None:
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="int64")}
        )
    posts = posts.materialize()  # read once, feed both df and the scorer

    # document frequency of each queried term = its posting-list length
    df_tbl = posts.groupby("term").count().to_pandas()  # ≤ len(qterms) rows
    weight = {}
    for t, dfc in zip(df_tbl["term"], df_tbl["count()"]):
        q = (n_docs + 1) // (int(dfc) + 1)  # ≥ 1 since df ≤ N
        weight[t] = 1 + (int(q).bit_length() - 1)  # 1 + floor_log2(q)

    def score(b: pd.DataFrame) -> pa.Table:
        if len(b) == 0:  # empty filtered blocks can arrive schema-less
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.int64())}
            )
        w = b["term"].map(weight).fillna(0).to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(b["doc_id"].to_numpy(), pa.int64()),
                "score": pa.array(b["tf"].to_numpy() * w, pa.int64()),
            }
        )

    totals = (
        posts.map_batches(score, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(Sum("score", alias_name="score"))
    )

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="stable"
        ).head(k)

    out = totals.map_batches(local_topk, batch_format="pandas").to_pandas()
    out = out.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="stable"
    ).head(k)
    out["score"] = out["score"].astype("int64")
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.reset_index(drop=True)
