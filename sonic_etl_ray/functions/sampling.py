"""Deterministic sampling / splitting operators for training-data pipelines.

The reference has NO sampling surface at all (SURVEY §2.7: "No top-k, no
sampling"), yet every large-scale training-data pipeline needs content-stable
dataset splits and stratified subsamples. All operators here are built on the
same primitive: a per-row hash bucket from ``md5_number_lower`` (low 8 bytes
of md5, little-endian) over a deterministic key string — exactly DuckDB's
function of the same name, so every op has an exact SQL oracle and the same
row lands in the same split on every engine, at any scale, under any
partitioning (no RNG state, no driver coordination, embarrassingly parallel).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .text import TOKEN_RE, md5_u64

# train/val/test boundaries over 100 hash buckets
SPLIT_BOUNDS = (("train", 90), ("val", 95), ("test", 100))


def _hash_bucket(keys: list[str], mod: int) -> np.ndarray:
    return (md5_u64(keys) % np.uint64(mod)).astype(np.int64)


def assign_splits(
    ds: ray.data.Dataset, id_col: str = "doc_id", group_col: str | None = None
) -> ray.data.Dataset:
    """Hash-split every row into train/val/test (90/5/5) keyed on the id —
    content-stable: adding or removing other rows never moves an existing
    row's split (the property random shuffles + fractions lack).

    ``group_col`` keys the hash on the GROUP instead: every row of a
    group lands in the same split — the leakage-free assignment for
    grouped corpora (all files of one repo, all documents of one source,
    near-duplicate families keyed by cluster id must never straddle
    train/test). Zero shuffle either way: the split is a pure per-batch
    function of the key."""

    def split_batch(b: pd.DataFrame) -> pd.DataFrame:
        key_col = group_col or id_col
        bucket = _hash_bucket([str(i) for i in b[key_col]], 100)
        split = np.full(len(b), "train", dtype=object)
        for name, hi in reversed(SPLIT_BOUNDS):  # test, val, then train
            split[bucket < hi] = name
        cols = {id_col: b[id_col].to_numpy()}
        if group_col is not None:
            cols[group_col] = b[group_col].to_numpy()
        cols["split"] = split
        return pd.DataFrame(cols)

    return ds.map_batches(split_batch, batch_format="pandas")


def split_documents(sf_dir: str) -> pd.DataFrame:
    """Per-document split assignment over the documents table."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    out = assign_splits(ds).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def split_documents_grouped(sf_dir: str) -> pd.DataFrame:
    """Leakage-free split over documents keyed on ``source``: every
    document of a source shares its split."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    out = assign_splits(ds, group_col="source").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def stratified_sample(
    ds: ray.data.Dataset,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    pct: int = 20,
) -> ray.data.Dataset:
    """Keep ``pct``% of rows per stratum, deterministically: the hash key is
    ``stratum:id`` so each stratum is sampled independently (a doc's
    membership never shifts when other strata grow — the property a global
    ``random_sample`` lacks) and no shuffle is needed (pure per-batch
    filter; the stratum column rides along in the same batch)."""

    def sample_batch(b: pd.DataFrame) -> pd.DataFrame:
        keys = [f"{s}:{i}" for s, i in zip(b[stratum_col], b[id_col])]
        keep = _hash_bucket(keys, 100) < pct
        return b.loc[keep].reset_index(drop=True)

    return ds.map_batches(sample_batch, batch_format="pandas")


def stratified_sample_docs(sf_dir: str, pct: int = 20) -> pd.DataFrame:
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    out = stratified_sample(ds, pct=pct).to_pandas()
    if out.empty and "doc_id" not in out.columns:
        # every stratum sampled to zero: empty Ray blocks drop the schema
        out = pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"), "lang": pd.Series(dtype="object")}
        )
    return out.sort_values("doc_id").reset_index(drop=True)


def vocab_topk(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Top-k corpus vocabulary by global token frequency.

    Scale shape: per-batch token counting is a COMBINER (each batch emits
    one row per distinct token in the batch, not one per occurrence), the
    only shuffle is the groupby over (token, partial-count) rows, and the
    global top-k is per-block top-k → a sort of ≤ k rows per block — the
    same pre-aggregate + bounded-sort pattern as ``top_orders_by_revenue``.
    Ties break lexicographically so the result is total-order deterministic
    (and matches the SQL oracle's ORDER BY n DESC, token ASC)."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial_counts(b: pd.DataFrame) -> "pa.Table":  # noqa: F821
        import pyarrow as pa

        toks = b["text"].str.findall(TOKEN_RE).explode().dropna()
        vc = toks.value_counts()
        # emit ARROW blocks: Ray's aggregate on pandas blocks falls into a
        # per-group Python path (~1.3 ms/group measured); on Arrow it's
        # vectorized — at a real vocab (millions of tokens) this is the
        # difference between seconds and hours
        return pa.table(
            {
                "token": pa.array(vc.index.astype(str), pa.string()),
                "n": pa.array(vc.to_numpy().astype("int64"), pa.int64()),
            }
        )

    totals = (
        ds.map_batches(partial_counts, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["n", "token"], ascending=[False, True], kind="stable").head(k)

    out = totals.map_batches(local_topk, batch_format="pandas").to_pandas()
    out = out.sort_values(["n", "token"], ascending=[False, True], kind="stable").head(k)
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


def reservoir_sample(
    ds: ray.data.Dataset, k: int = 40, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Uniform k-row sample without replacement, by deterministic priority:
    keep the k rows with the SMALLEST md5 of ``'rsv:' || id``.

    This is distributed reservoir sampling with the random tags replaced by
    a content-stable hash (Efraimidis-Spirakis priorities, weight 1): each
    block keeps only its local k smallest (a bounded per-batch sort), the
    driver folds <= k rows per block, and the winner set is identical under
    any partitioning, any arrival order, and any engine — hence the exact
    ``ORDER BY md5 LIMIT k`` SQL oracle. No RNG state, no second pass, no
    coordination; at 100 TB the driver sees k x num_blocks tag-sized rows,
    never data."""

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        pri = md5_u64(["rsv:" + str(i) for i in b[id_col]])
        out = b.copy()
        out["__pri"] = pri
        return out.nsmallest(k, "__pri")

    return ds.map_batches(local_topk, batch_format="pandas")


def reservoir_sample_docs(sf_dir: str, k: int = 40) -> pd.DataFrame:
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    out = reservoir_sample(ds, k=k).to_pandas()
    out = out.nsmallest(k, "__pri").drop(columns="__pri")
    return out.sort_values("doc_id").reset_index(drop=True)


def mixture_by_token_budget(
    sf_dir: str, budget: int | None = None, rate_den: int = 1000
) -> pd.DataFrame:
    """Training-data mixture: down-sample each source so the corpus fits a
    total token budget allocated across sources by weight.

    Two passes, both distributed: (1) per-source token totals via a
    per-batch combiner + one tiny groupby (O(#sources) rows ever leave a
    task); (2) an embarrassingly-parallel hash-gate filter at each source's
    computed keep-rate. The plan math is INTEGER-only — per-source weight
    ``1 + (source_number % 3)``, budget ``total_tokens // 3`` when unset,
    keep-rate ``min(den, (budget·w·den) // (Σw·tokens_s))`` — and the gate
    is ``md5('mix:'||source||':'||id) % den < rate``, so DuckDB reproduces
    the whole pipeline bit-for-bit (no float rates, no RNG). The sample is
    content-stable per source: growing one source never reshuffles
    another's kept set."""
    from ray.data.aggregate import Sum

    from .text import TOKEN_RE

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )

    def tok_partial(b: pd.DataFrame) -> pa.Table:
        n = b["text"].fillna("").str.count(TOKEN_RE).astype("int64")
        g = pd.DataFrame({"source": b["source"], "toks": n}).groupby(
            "source", sort=False
        )["toks"].sum()
        return pa.table(
            {
                "source": pa.array(g.index.astype(str), pa.string()),
                "toks": pa.array(g.to_numpy(np.int64), pa.int64()),
            }
        )

    tok = (
        ds.map_batches(tok_partial, batch_format="pandas")
        .groupby("source")
        .aggregate(Sum("toks", alias_name="toks"))
        .to_pandas()
    )
    weights = {s: 1 + int(s[3:]) % 3 for s in tok["source"]}
    total = int(tok["toks"].sum())
    if budget is None:
        budget = total // 3
    sw = sum(weights.values())
    rate = {
        s: min(rate_den, (budget * weights[s] * rate_den) // (sw * int(t)))
        for s, t in zip(tok["source"], tok["toks"])
        if int(t) > 0
    }

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        keys = [f"mix:{s}:{i}" for s, i in zip(b["source"], b["doc_id"])]
        r = b["source"].map(rate).fillna(0).to_numpy(np.int64)
        keep = (md5_u64(keys) % np.uint64(rate_den)).astype(np.int64) < r
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy()[keep],
                "source": b["source"].to_numpy()[keep],
            }
        )

    out = ds.map_batches(gate, batch_format="pandas").to_pandas()
    if out.empty and "doc_id" not in out.columns:
        # every source gated to zero: empty Ray blocks drop the schema
        out = pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"), "source": pd.Series(dtype="object")}
        )
    return out.sort_values("doc_id").reset_index(drop=True)
