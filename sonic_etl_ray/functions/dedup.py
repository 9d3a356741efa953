"""Deduplication operators for training-data pipelines.

The reference's only dedup is the daily exact MERGE on natural keys
(``daily_qc_airflow/daily_dedupe_mainnet.py:28-35,65-81``); a 100 TB
training-data engine additionally needs near-dup. All operators follow the
same scale shape: per-batch vectorized signatures inside ``map_batches``,
then ONE hash/band groupby shuffle over small signature rows (never the
full text), then per-group verification. Candidate pairs stay a Dataset
end-to-end — texts are joined back by doc_id with the native hash join, so
no stage materializes candidates or text on the driver.

- exact: sha256(content) → groupby(hash) → keep min-id row;
- MinHash + LSH: shingle → minhash → band buckets → candidate pairs →
  distributed text join → verified Jaccard;
- SimHash: 64-bit token-weighted fingerprint (md5_number_lower token
  hashes → exact DuckDB oracle), batch-vectorized bit voting;
- n-gram Jaccard: exact pairwise Jaccard within small blocking groups.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from sonic_etl_ray.stages.joins import safe_join

from .text import TOKEN_RE, _doc_bounds, _documents_stamp, hash_token, md5_u64

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _sha256_series(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: hashlib.sha256(t.encode("utf-8")).hexdigest())


def exact_dedup(ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """Exact dedup: hash-partition on sha256(text), keep the min-id row per
    group (deterministic winner; the reference keeps an arbitrary
    ``ARRAY_AGG(… LIMIT 1)`` row — we strengthen to deterministic).
    Hashing reuses the zero-copy Arrow buffer walk from the CDC transform
    (no per-row str materialization / re-encode).

    Shape: winner selection is a VECTORIZED Min aggregate over tiny
    (hash, id) rows plus a semi-join of the winner ids back to the hashed
    rows — not a per-group ``map_groups`` (one Python call per unique
    document; at corpus scale that is billions of calls). The hashed
    dataset feeds both sides, so it is materialized once (spillable)
    rather than re-hashing the corpus."""
    from ray.data.aggregate import Min

    from ..stages.transform import sha256_column

    def add_hash(t: pa.Table) -> pa.Table:
        return t.append_column("text_sha256", sha256_column(t.column(text_col)))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow").materialize()
    winners = (
        hashed.select_columns(["text_sha256", id_col])
        .groupby("text_sha256")
        .aggregate(Min(id_col, alias_name="__winner_id"))
        .select_columns(["__winner_id"])
    )
    return safe_join(
        hashed,
        winners,
        join_type="inner",
        num_partitions=_auto_join_partitions(),
        on=(id_col,),
        right_on=("__winner_id",),
    )


# ---------------------------------------------------------------- MinHash/LSH


_SHINGLE_BASE = np.uint64(1099511628211)


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashed k-shingles (character k-grams) as uint64, fully vectorized:
    polynomial rolling hash over the utf-8 byte array (k strided
    multiply-adds instead of a Python loop per shingle)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n = data.size
    if n < k:
        return np.array([hash_token(text)], dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = np.zeros(n - k + 1, dtype=np.uint64)
        for j in range(k):  # k (=5) vector ops, not n python ops
            h = h * _SHINGLE_BASE + data[j : n - k + 1 + j]
    return np.unique(h)


class MinHasher:
    """Stage state: the random (a, b) affine family for n permutations —
    built once and shipped once per worker (tiny, deterministic by seed)."""

    def __init__(self, num_perm: int = 64, k: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 61, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 1 << 61, size=num_perm, dtype=np.uint64)
        self.k = k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes(text, self.k)
        # (n_shingles, num_perm) affine hashes; min per column
        with np.errstate(over="ignore"):
            vals = (sh[:, None] * self.a[None, :] + self.b[None, :]) & _M64
        return vals.min(axis=0)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # per-doc loop is the FAST shape here: each doc's (n_shingles,
        # num_perm) affine temp stays cache-resident (~1 MB); a whole-batch
        # matrix + segmented reduceat measured 50x slower (134 MB temps)
        sigs = np.stack([self.signature(t) for t in batch["text"]])
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(), "sig": list(sigs)})


def _band_rows(df: pd.DataFrame, bands: int, rows_per_band: int) -> pa.Table:
    """Explode signatures to (band_id, band_hash, doc_id) rows for the LSH
    self-join — the shuffle moves only tiny signature rows. Vectorized: one
    (n_docs, bands, rows_per_band) reshape, a columnwise polynomial mix per
    band, and a final avalanche (band hashes are bucket keys only — a rare
    collision merely adds a candidate pair that verification rejects).
    Returns an Arrow table so downstream ``rename_columns`` projections stay
    zero-copy on Arrow blocks."""
    if not len(df):
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "band_id": pa.array([], pa.int64()),
                "band_hash": pa.array([], pa.uint64()),
            }
        )
    sig = np.stack([np.asarray(s, dtype=np.uint64) for s in df["sig"]])
    n = sig.shape[0]
    grid = sig[:, : bands * rows_per_band].reshape(n, bands, rows_per_band)
    with np.errstate(over="ignore"):
        h = np.full((n, bands), np.uint64(1469598103934665603), dtype=np.uint64)
        for r in range(rows_per_band):  # rows_per_band vector ops
            h = (h ^ grid[:, :, r]) * _SHINGLE_BASE
        # fibonacci avalanche so adjacent values spread across buckets
        h ^= h >> np.uint64(33)
        h *= np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(29)
    doc_ids = np.repeat(df["doc_id"].to_numpy(), bands)
    band_ids = np.tile(np.arange(bands, dtype=np.int64), n)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "band_id": pa.array(band_ids, pa.int64()),
            "band_hash": pa.array(h.reshape(-1)),
        }
    )


def jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = shingle_hashes(a, k), shingle_hashes(b, k)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    return inter / float(sa.size + sb.size - inter)


def verify_jaccard_batch(b: pd.DataFrame, k: int, threshold: float) -> pd.DataFrame:
    """Exact Jaccard over joined (text_a, text_b) pair rows — a stateless
    task-based stage (an actor pool here would hold CPU slots alongside the
    two join operators and can deadlock a small cluster); texts arrive via
    the hash join, never via a driver broadcast."""
    if not len(b):
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    j = [jaccard(ta, tb, k) for ta, tb in zip(b["text_a"], b["text_b"])]
    out = pd.DataFrame(
        {"doc_a": b["doc_a"].to_numpy(), "doc_b": b["doc_b"].to_numpy(), "jaccard": j}
    )
    return out[out["jaccard"] >= threshold]


def minhash_candidate_pairs(
    docs: ray.data.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
) -> ray.data.Dataset:
    """LSH candidate (doc_a, doc_b) pairs as a Dataset: signatures → band
    rows → band-bucket SELF-JOIN (pair expansion as a native hash join —
    vectorized, unlike a per-bucket ``map_groups`` whose per-group Python
    call dominated at ~80k tiny buckets) → ordered filter doc_a < doc_b.

    Pairs sharing SEVERAL bands appear once per shared band (~6%
    multiplicity at high-recall settings, up to ``bands``× on dup-heavy
    corpora): consumers that join texts back should run the output through
    :func:`_distinct_pairs` first (as `minhash_verified_pairs` does) so the
    heavy text joins never pay the multiplicity."""
    rows_per_band = num_perm // bands
    sigs = docs.map_batches(
        MinHasher(num_perm=num_perm, k=k),
        batch_format="pandas",
        batch_size=1024,  # split one parquet block across the task pool
    )
    band_rows = sigs.map_batches(
        _band_rows,
        fn_kwargs={"bands": bands, "rows_per_band": rows_per_band},
        batch_format="pandas",
    )

    def ordered(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.less(t["doc_a"], t["doc_b"])
        return t.filter(keep).select(["doc_a", "doc_b"])

    joined = safe_join(
        band_rows.rename_columns({"doc_id": "doc_a"}),
        band_rows.rename_columns({"doc_id": "doc_b"}),
        join_type="inner",
        num_partitions=_auto_join_partitions(),
        on=("band_id", "band_hash"),
    )
    return joined.map_batches(ordered, batch_format="pyarrow")


def _distinct_pair_rows(t: pa.Table) -> pa.Table:
    """Distinct (doc_a, doc_b) rows of one Arrow batch/group."""
    return t.select(["doc_a", "doc_b"]).group_by(["doc_a", "doc_b"]).aggregate([])


def _distinct_pairs(cand: ray.data.Dataset) -> ray.data.Dataset:
    """Global distinct over candidate id pairs: local per-batch distinct
    shrinks the exchange, then one doc_a-partitioned distinct finishes.
    Pairs colliding in SEVERAL bands emerge once per band from the band
    join — on dup-heavy data that multiplies the (much heavier) text joins
    and jaccard verify by up to ``bands``× (measured 306 s → 46 s on an
    all-near-dup sf1 stress corpus); the id-pair shuffle this costs is
    16 bytes/row against the text intermediate it shrinks."""
    return (
        cand.map_batches(_distinct_pair_rows, batch_format="pyarrow")
        .groupby("doc_a")
        .map_groups(_distinct_pair_rows, batch_format="pyarrow")
    )


def _auto_join_partitions() -> int:
    """Partition count per join such that the TWO chained join operators'
    build/probe actors (≈ num_partitions CPU slots each) fit the cluster
    concurrently — oversubscribing deadlocks the streaming executor."""
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover - no cluster yet
        ncpu = 8
    return max(2, min(16, ncpu // 4))


def minhash_verified_pairs(
    sf_dir: str,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    join_partitions: int | None = None,
) -> ray.data.Dataset:
    """Near-dup pairs via MinHash+LSH, Jaccard-verified, fully distributed.

    Pipeline: map_batches(MinHasher actor pool) → band rows →
    groupby(band_id, band_hash) → candidate pairs → pair-key distinct →
    native hash joins pulling text_a/text_b back by doc_id → exact Jaccard
    verify ≥ threshold in map_batches. Nothing touches the driver; at scale
    the joins are the standard both-sides-large hash exchange.
    """
    if join_partitions is None:
        join_partitions = _auto_join_partitions()
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # Materialize the candidate pairs (bounded: they ARE the near-dup set,
    # tiny id-pair rows) so the self-join/aggregate graph releases its hash
    # aggregators before the two text joins spin up theirs — three
    # concurrent join operators can oversubscribe a small cluster's slots.
    cand = _distinct_pairs(
        minhash_candidate_pairs(docs, num_perm=num_perm, bands=bands, k=k)
    ).materialize()
    texts_a = docs.rename_columns({"doc_id": "__ta_id", "text": "text_a"})
    texts_b = docs.rename_columns({"doc_id": "__tb_id", "text": "text_b"})
    joined = safe_join(
        safe_join(
            cand,
            texts_a, join_type="inner", num_partitions=join_partitions,
            on=("doc_a",), right_on=("__ta_id",),
        ),
        texts_b, join_type="inner", num_partitions=join_partitions,
        on=("doc_b",), right_on=("__tb_id",),
    )
    verified = joined.map_batches(
        verify_jaccard_batch,
        fn_kwargs={"k": k, "threshold": threshold},
        batch_format="pandas",
    )
    return verified


# verified-pair memo: (sf_dir, params) → (input stamp, DataFrame). The pair
# population is tiny (it IS the dup set); memoizing lets pair-consumers
# (clustering) reuse one LSH execution instead of re-running the whole
# pipeline. The input's mtime+size is stored as the VALUE's stamp, so a
# rewrite of documents.parquet REPLACES the entry (O(1) entries per params —
# no growth across input refreshes) instead of serving stale pairs (same
# discipline as the on-disk ANN index cache in similarity.py).
_VERIFIED_PAIRS_CACHE: dict[tuple, tuple[str, pd.DataFrame]] = {}


def _input_stamp(sf_dir: str) -> str:
    # ONE staleness-stamp convention for every documents-keyed memo
    # (verified pairs here, DSIR weights in text.py)
    return _documents_stamp(sf_dir)


def minhash_lsh_dedup(
    sf_dir: str,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
) -> pd.DataFrame:
    """Verified near-dup pairs as a sorted DataFrame (query surface over
    :func:`minhash_verified_pairs`). With high-recall band settings (small
    rows-per-band) the LSH output equals the exact brute-force pair set —
    the configuration the driver's SQL oracle verifies hash-for-hash."""
    key = (sf_dir, threshold, num_perm, bands, k)
    stamp = _input_stamp(sf_dir)
    hit = _VERIFIED_PAIRS_CACHE.get(key)
    if hit is not None and hit[0] == stamp:
        return hit[1].copy()
    out = minhash_verified_pairs(
        sf_dir, threshold=threshold, num_perm=num_perm, bands=bands, k=k
    ).to_pandas()
    if out.empty:
        out = pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    else:
        # candidates carry per-shared-band multiplicity (see
        # minhash_candidate_pairs) — distinct on the tiny verified set here
        # instead of a full shuffle on the big candidate set
        out = out.drop_duplicates(["doc_a", "doc_b"])
        out = out.astype({"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"})
        out = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    _VERIFIED_PAIRS_CACHE[key] = (stamp, out)
    return out.copy()


# ------------------------------------------------------------- clustering


def label_propagation_clusters(
    pairs: ray.data.Dataset, max_iters: int = 50, num_partitions: int = 8
) -> pd.DataFrame:
    """Distributed connected components by iterated min-label propagation.

    Each round: every node sends its current label to its neighbors (one
    hash join edges⋈labels), each node takes the min over received labels
    and its own (one groupby), and convergence is detected from the summed
    label total (monotonically decreasing; fixed point = converged). All
    per-round state is (node, label) rows — never the corpus. Rounds needed
    = graph diameter, small for dup clusters; the driver sees only the
    per-round checksum."""
    from ray.data.aggregate import Min

    def both_dirs(b: pd.DataFrame) -> pa.Table:
        src = np.concatenate([b["doc_a"].to_numpy(), b["doc_b"].to_numpy()]).astype("int64")
        dst = np.concatenate([b["doc_b"].to_numpy(), b["doc_a"].to_numpy()]).astype("int64")
        return pa.table({"src": src, "dst": dst})

    # edges are re-joined every round — materialize once so the upstream
    # LSH pipeline doesn't re-execute per iteration (blocks stay in the
    # object store, spillable; edge rows are two int64s)
    edges = pairs.map_batches(both_dirs, batch_format="pandas").materialize()

    def init_labels(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["src"], "label": b["src"]})

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )
    prev_total = None
    for _ in range(max_iters):
        msgs = safe_join(
            edges,
            labels.rename_columns({"node": "__ln"}),
            join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("__ln",),
        ).map_batches(
            lambda b: pa.table({"node": b["dst"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        labels = (
            msgs.union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()  # labels are O(nodes) rows — tiny vs the corpus
        )
        total = labels.sum("label")  # monotone ↓; fixed point ⇒ converged
        if total == prev_total:
            break
        prev_total = total
    out = labels.to_pandas().rename(columns={"label": "cluster_id"})
    out = out.rename(columns={"node": "doc_id"}).astype({"doc_id": "int64", "cluster_id": "int64"})
    out["is_representative"] = out["doc_id"] == out["cluster_id"]
    return out.sort_values("doc_id").reset_index(drop=True)


def near_dup_clusters(
    sf_dir: str,
    threshold: float = 0.8,
    max_driver_pairs: int = 100_000,
    **lsh_kwargs,
) -> pd.DataFrame:
    """Near-duplicate clusters: LSH-verified pairs → connected components.
    Returns one row per document in any cluster: (doc_id, cluster_id = min
    doc in component, is_representative).

    The pair Dataset stays distributed; if the verified-pair population is
    measured-small (≤ ``max_driver_pairs``) union-find runs on the driver,
    else the distributed min-label-propagation path
    (:func:`label_propagation_clusters`) takes over — the 100 TB shape.
    """
    pairs = minhash_lsh_dedup(sf_dir, threshold=threshold, **lsh_kwargs)
    if len(pairs) > max_driver_pairs:
        return label_propagation_clusters(ray.data.from_pandas(pairs))
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((int(d), find(int(d))) for d in parent)
    out = pd.DataFrame(rows, columns=["doc_id", "cluster_id"])
    out["is_representative"] = out["doc_id"] == out["cluster_id"]
    return out.reset_index(drop=True)


# ------------------------------------------------------------------- SimHash


class SimHasher:
    """64-bit SimHash (Charikar) over md5_number_lower token hashes.

    Batch-vectorized: the batch's tokens are hashed flat, the (tokens, 64)
    bit matrix is segment-summed per doc (cumsum windows — safe for empty
    docs), and bit b of the result is set iff strictly more than half the
    doc's token hashes have bit b set. Exact DuckDB mirror: 64 generated
    list_filter counts over the same md5 hash (see ``__ray_entry__``)."""

    def __init__(self):
        self.shifts = np.arange(64, dtype=np.uint64)
        self.bits = np.uint64(1) << self.shifts

    def simhash_batch(self, texts: pd.Series) -> np.ndarray:
        toks = texts.str.findall(TOKEN_RE)
        counts, starts = _doc_bounds(toks)
        out = np.zeros(len(texts), dtype=np.uint64)
        if counts.sum() == 0:
            return out
        flat = [t for lst in toks for t in lst]
        hs = md5_u64(flat)
        bitmat = ((hs[:, None] >> self.shifts[None, :]) & np.uint64(1)).astype(np.int64)
        csum = np.vstack(
            [np.zeros((1, 64), dtype=np.int64), np.cumsum(bitmat, axis=0)]
        )
        seg = csum[starts + counts] - csum[starts]  # (docs, 64) set-bit counts
        setbits = (2 * seg) > counts[:, None]  # votes > 0 ⇔ set > half
        return (setbits.astype(np.uint64) * self.bits[None, :]).sum(axis=1)

    def simhash(self, text: str) -> int:
        """Scalar convenience over the batch kernel."""
        return int(self.simhash_batch(pd.Series([text]))[0])

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        return pd.DataFrame(
            {"doc_id": b["doc_id"], "simhash": pd.Series(self.simhash_batch(b["text"]), dtype="uint64")}
        )


def simhash_fingerprints(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(SimHasher(), batch_format="pandas").to_pandas()
    out["simhash"] = out["simhash"].astype("uint64")
    return out.sort_values("doc_id").reset_index(drop=True)


def ngram_jaccard_pairs(
    sf_dir: str,
    threshold: float = 0.5,
    k: int = 3,
    block_col: str = "source",
    max_block_pairs: int = 2_000_000,
) -> pd.DataFrame:
    """Exact k-gram Jaccard pairs ≥ threshold within blocking groups.

    Blocking on ``block_col`` keeps the pairwise work per group bounded —
    the groupby is the only shuffle; pairs never cross groups.

    Hot-key guardrail: a block whose all-pairs expansion would exceed
    ``max_block_pairs`` (a single dominant ``source`` at corpus scale is
    O(n²)) switches to block-LOCAL MinHash-LSH candidate generation —
    signatures + banded buckets inside the group, pairs only within
    buckets — and exact-verifies just the candidates. Same ≥-threshold
    semantics with LSH recall instead of exhaustive scan; small blocks are
    untouched, so the exact path (and its SQL oracle) is unchanged
    wherever it is tractable.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", block_col]
    )

    def _exact_pairs(ids, shingles, cand_iter):
        rows_a, rows_b, js = [], [], []
        for i, j in cand_iter:
            si, sj = shingles[i], shingles[j]
            inter = np.intersect1d(si, sj, assume_unique=True).size
            jac = inter / float(si.size + sj.size - inter)
            if jac >= threshold:
                rows_a.append(ids[i])
                rows_b.append(ids[j])
                js.append(jac)
        return pd.DataFrame({"doc_a": rows_a, "doc_b": rows_b, "jaccard": js})

    def _lsh_candidates(texts, num_perm: int = 64, bands: int = 16):
        """Block-local banded LSH: indices of candidate (i, j) pairs."""
        hasher = MinHasher(num_perm=num_perm, k=k)
        sigs = np.stack([hasher.signature(t) for t in texts])
        rows_per_band = num_perm // bands
        cands: set[tuple[int, int]] = set()
        for b in range(bands):
            band = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
            buckets: dict[bytes, list[int]] = {}
            for i, row in enumerate(band):
                buckets.setdefault(row.tobytes(), []).append(i)
            for members in buckets.values():
                for x in range(len(members)):
                    for y in range(x + 1, len(members)):
                        cands.add((members[x], members[y]))
        return sorted(cands)

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable")
        ids = g["doc_id"].to_numpy()
        n = len(ids)
        shingles = [shingle_hashes(t, k) for t in g["text"]]
        if n * (n - 1) // 2 > max_block_pairs:
            cand = _lsh_candidates(list(g["text"]))
            # the guardrail trades exact-recall for bounded cost — say so
            # loudly, or a gate mismatch on a hot block debugs blind
            import logging

            logging.getLogger(__name__).warning(
                "ngram_jaccard_pairs: block %r (n=%d, %d potential pairs) "
                "exceeded max_block_pairs=%d — using banded-LSH candidates "
                "(recall may drop below exact)",
                g[block_col].iloc[0] if block_col in g else "?",
                n, n * (n - 1) // 2, max_block_pairs,
            )
        else:
            cand = ((i, j) for i in range(n) for j in range(i + 1, n))
        return _exact_pairs(ids, shingles, cand)

    out = ds.groupby(block_col).map_groups(per_block, batch_format="pandas").to_pandas()
    if out.empty and "doc_a" not in out.columns:
        # zero pairs in EVERY block: empty Ray blocks drop the schema
        out = pd.DataFrame(
            {
                "doc_a": pd.Series(dtype="int64"),
                "doc_b": pd.Series(dtype="int64"),
                "jaccard": pd.Series(dtype="float64"),
            }
        )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def exact_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """Exact dedup over documents; returns surviving (doc_id, text_sha256)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = exact_dedup(ds).to_pandas()[["doc_id", "text_sha256"]]
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Incremental dedup: incoming batch vs existing lake (CDC-shaped)
# ---------------------------------------------------------------------------


def _admitted_frame(out: pd.DataFrame) -> pd.DataFrame:
    """Shared return boundary for the incremental-dedup admission gates:
    sort by doc_id with n_chars pinned to int64. An ALL-duplicate ingest
    batch (routine in CDC replays) leaves every Ray block empty and
    ``to_pandas`` drops the schema — pin the typed empty frame back
    (found by the sf1-scale stress run)."""
    if out.empty and "doc_id" not in out.columns:
        out = pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "lang": pd.Series(dtype="object"),
                "source": pd.Series(dtype="object"),
                "n_chars": pd.Series(dtype="int64"),
            }
        )
    out["n_chars"] = out["n_chars"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def dedup_incremental(
    sf_dir: str,
    split_frac: float = 0.8,
    prefix_len: int = 40,
    num_bloom_shards: int | None = None,
) -> pd.DataFrame:
    """Admit only incoming documents whose prefix fingerprint
    (``substr(text, 1, prefix_len)`` — the URL/boilerplate-prefix blocking
    key) does not already exist in the lake. The CDC-native dedup shape: the
    lake side is the accumulated corpus, the incoming side is one ingest
    batch (here a deterministic 80/20 doc_id split of `documents`).

    Scale shape (the Bloom-pruned anti-join):
      1. lake → per-block 16 KiB Bloom partials over the md5-64 of the
         fingerprint, OR-reduced on the driver (traffic = blocks × 16 KiB,
         never rows) and broadcast once via ``ray.put``;
      2. incoming → Bloom test per batch: negatives are PROVABLY new (zero
         false negatives) and pass without any join;
      3. only Bloom-positive candidates — |true dups| + |false positives|
         rows — are confirmed against the lake with an exact hash join on
         the fingerprint string, so exchange volume tracks the dup rate,
         not the corpus size. Confirmed-dup ids are tiny and broadcast into
         one final filter pass.
    At 10^10 lake keys a single 16 KiB filter saturates; pass
    ``num_bloom_shards=P`` to swap in the hash-sharded Bloom
    (:func:`..functions.sketch.bloom_build_sharded`): each key hashes to one
    of P independent fixed-size filters (capacity grows linearly in P), the
    per-shard partials OR-reduce through a hash groupby (volume = blocks × P
    × bitmap, never rows), and the PROBE co-locates with its filter — the
    incoming side exchanges by shard id and each probe task fetches exactly
    one shard's bitmap, so no worker ever holds the whole P-shard filter.
    The candidate-confirm join is unchanged either way, so both paths return
    identical rows; the shard count affects cost, not results.

    The lake-side bitmaps are PERSISTED (mtime+size-keyed, the ANN-index
    cache discipline) so repeat calls against an unchanged lake skip the
    full build scan and pay probe+confirm only; a rewritten
    documents.parquet changes the stamp and forces a rebuild. Publishes
    atomically (unsharded: write-temp + rename of one file; sharded: a
    staging DIR of per-shard files renamed into place behind a _READY
    marker — neither save nor load holds more than one shard's bitmap on
    the driver at a time), so a concurrent builder can never serve a torn
    bitmap. Probe geometry always derives from the LOADED bitmap's size,
    so a cache written under a different compile-time geometry can never
    produce false negatives.
    """
    import ray

    from .sketch import (
        BLOOM_BITS,
        BLOOM_K,
        _bloom_positions,
        bloom_build,
        bloom_build_sharded,
        bloom_shard_of,
    )
    from .similarity import _index_cache_dir

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)
    cut = int(split_frac * ds.count())

    # Arrow blocks end-to-end: range filters zero out most blocks, and empty
    # pandas object columns trip Ray's size estimator (similarity.py:108).
    # fp_key is INTERNAL (Bloom build + probe only — never leaves the
    # pipeline, no oracle touches it), so it uses the vectorized
    # SipHash-2-4 over Arrow buffers (stages/keys.py) instead of the
    # per-row md5 the SQL-parity hashes need: the build/probe scans were
    # dominated by md5-over-pylist before.
    from ..stages.keys import stable_hash64

    def add_fp(t: pa.Table) -> pa.Table:
        fp = pc.utf8_slice_codeunits(
            pc.fill_null(t.column("text"), ""), 0, prefix_len
        )
        keys = stable_hash64(fp).view(np.int64)
        return t.append_column("fp", fp).append_column(
            "fp_key", pa.array(keys, pa.int64())
        )

    def fp_only(t: pa.Table) -> pa.Table:
        # confirm-join side: just the prefix strings — no key hashing at all
        fp = pc.utf8_slice_codeunits(
            pc.fill_null(t.column("text"), ""), 0, prefix_len
        )
        return pa.table({"fp": fp})

    # the lake side only ever feeds the Bloom build (fp_key) and the
    # confirm join (fp): scan it through a 2-column pruned read, not the
    # full output-column read the incoming side needs
    slim = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    lake = slim.filter(expr=f"doc_id < {cut}").map_batches(add_fp, batch_format="pyarrow")
    lake_fp = slim.filter(expr=f"doc_id < {cut}").map_batches(
        fp_only, batch_format="pyarrow"
    )
    incoming = ds.filter(expr=f"doc_id >= {cut}").map_batches(
        add_fp, batch_format="pyarrow"
    )

    def _bitmap_cache_path(suffix: str) -> str:
        # "sip1" versions the KEY HASH into the cache identity: bitmaps
        # built under a different fp_key function must never be probed.
        # The FULL probe geometry is versioned too: bit count is also
        # derived from the loaded bitmap's size, but the number of probe
        # positions (BLOOM_K) is compile-time — a k change against an old
        # cache would probe unset positions and produce false negatives,
        # the one error class a Bloom must never make.
        base = _index_cache_dir(
            "bloomfp", sf_dir, split_frac, prefix_len,
            int(num_bloom_shards or 0), "sip1", f"g{BLOOM_BITS}x{BLOOM_K}",
            src_name="documents.parquet",
        )
        return base + suffix

    def _save_bitmap_file(path: str, arr: np.ndarray) -> None:
        import uuid

        tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "wb") as fh:  # handle form: np.save cannot mangle the name
            np.save(fh, arr)
        os.replace(tmp, path)

    if num_bloom_shards:
        # per-shard cache FILES under a marker-gated dir: neither save nor
        # load ever holds more than one shard's bitmap on the driver at a
        # time — the no-single-holder bound the sharded filter exists for
        cache_dir = _bitmap_cache_path(".shards")
        ready = os.path.join(cache_dir, "_READY")
        shard_refs = None
        if os.path.exists(ready):
            try:
                shard_refs = []
                for i in range(num_bloom_shards):
                    shard_refs.append(
                        ray.put(np.load(os.path.join(cache_dir, f"shard_{i}.npy")))
                    )
            except (OSError, ValueError, EOFError):  # torn/foreign cache: rebuild
                import shutil

                shard_refs = None
                # clear the bad dir or the atomic republish below would
                # fail forever (rename onto an existing dir) and every
                # future call would rebuild
                shutil.rmtree(cache_dir, ignore_errors=True)
        if shard_refs is None:
            shard_refs = bloom_build_sharded(
                lake.select_columns(["fp_key"]), "fp_key", num_bloom_shards
            )
            import shutil
            import uuid as _uuid

            staging = f"{cache_dir}.build.{_uuid.uuid4().hex[:8]}"
            os.makedirs(staging, exist_ok=True)
            for i, ref in enumerate(shard_refs):  # one shard in flight at a time
                _save_bitmap_file(os.path.join(staging, f"shard_{i}.npy"), ray.get(ref))
            open(os.path.join(staging, "_READY"), "w").close()
            try:
                os.rename(staging, cache_dir)  # atomic publish; loser discards
            except OSError:
                shutil.rmtree(staging, ignore_errors=True)

        def add_shard(t: pa.Table) -> pa.Table:
            keys = t.column("fp_key").to_numpy().astype(np.int64)
            return t.append_column(
                "shard", pa.array(bloom_shard_of(keys, num_bloom_shards), pa.int64())
            )

        def probe_shard(g: pa.Table) -> pa.Table:
            # one shard per group: fetch ONLY this shard's bitmap
            if g.num_rows == 0:
                return g.drop_columns(["shard"])
            shard = int(g.column("shard")[0].as_py())
            bits = np.unpackbits(ray.get(shard_refs[shard])).astype(bool)
            # probe geometry derives from the FETCHED bitmap so it can never
            # disagree with the built filter's bits_per_shard
            pos = _bloom_positions(g.column("fp_key").to_numpy(), bits=bits.size)
            return g.filter(pa.array(bits[pos].all(axis=0))).drop_columns(["shard"])

        candidates = (
            incoming.map_batches(add_shard, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(probe_shard, batch_format="pyarrow")
        )
    else:
        cache_path = _bitmap_cache_path(".npy")
        bitmap = None
        if os.path.exists(cache_path):
            try:
                bitmap = np.load(cache_path)
            except (OSError, ValueError, EOFError):  # torn/foreign file: rebuild
                bitmap = None
        if bitmap is None:
            bitmap = bloom_build(lake.select_columns(["fp_key"]), "fp_key")
            _save_bitmap_file(cache_path, bitmap)
        bitmap_ref = ray.put(np.ascontiguousarray(bitmap))

        def bloom_prune(t: pa.Table, *, ref) -> pa.Table:
            # task stage, not an actor pool: the probe state is one 16 KiB
            # packed bitmap fetched zero-copy from the node-local store —
            # unpacking per batch costs µs, while an actor pool would pay
            # ~1 s of startup for a stage this short
            if t.num_rows == 0:
                return t
            bits = np.unpackbits(ray.get(ref)).astype(bool)
            # geometry from the FETCHED bitmap (a cached bitmap built under
            # a different BLOOM_BITS must probe at ITS size or produce
            # false negatives — the one error class a Bloom must never make)
            pos = _bloom_positions(t.column("fp_key").to_numpy(), bits=bits.size)
            return t.filter(pa.array(bits[pos].all(axis=0)))

        candidates = incoming.map_batches(
            bloom_prune, fn_kwargs={"ref": bitmap_ref}, batch_format="pyarrow"
        )
    confirmed = safe_join(
        candidates.select_columns(["doc_id", "fp"]),
        lake_fp,
        join_type="inner",
        num_partitions=4,
        on=("fp",),
    )
    dup_ids = set(r["doc_id"] for r in confirmed.select_columns(["doc_id"]).take_all())
    dup_ref = ray.put(np.fromiter(dup_ids, dtype=np.int64, count=len(dup_ids)))

    def drop_dups(t: pa.Table, *, ref) -> pa.Table:
        # task stage for the same reason as bloom_prune: the dup-id array is
        # tiny (|confirmed dups|) and node-local
        dup = pa.array(ray.get(ref), pa.int64())
        keep = pc.invert(pc.is_in(t.column("doc_id"), value_set=dup))
        return t.filter(keep).select(["doc_id", "lang", "source", "n_chars"])

    out = incoming.map_batches(
        drop_dups, fn_kwargs={"ref": dup_ref}, batch_format="pyarrow"
    ).to_pandas()
    return _admitted_frame(out)


def dedup_incremental_fuzzy(
    sf_dir: str,
    split_frac: float = 0.8,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
) -> pd.DataFrame:
    """FUZZY incremental dedup: admit only incoming documents with NO
    near-duplicate (character-``k``-gram Jaccard ≥ ``threshold``) already
    in the lake — the MinHash-banded sibling of :func:`dedup_incremental`
    (which blocks on an exact prefix fingerprint). The CDC-native fuzzy
    admission gate: the lake side is the accumulated corpus, the incoming
    side is one ingest batch (the same deterministic 80/20 doc_id split).

    Scale shape — never all-pairs, never incoming × lake:
      1. BOTH sides map to tiny (band_id, band_hash, doc_id) rows
         (signatures inside ``map_batches``, the LSH banding that bounds
         candidate generation exactly as :func:`minhash_candidate_pairs`);
      2. one hash join on the band key yields only bucket-colliding
         (lake doc_a, incoming doc_b) candidates — cost tracks the
         near-dup rate, not |lake| × |incoming|;
      3. candidates pull both texts back through the standard hash joins
         and are Jaccard-VERIFIED ≥ threshold (zero false positives);
      4. the rejected-incoming id set (tiny — it IS the fuzzy-dup set)
         broadcasts into one final filter pass over the incoming batch.
    With the default high-recall band settings the banded candidate set
    achieves full recall on this corpus, so the output equals the exact
    brute-force NOT EXISTS the SQL oracle computes (same verified-equality
    stance as ``minhash_lsh_dedup``). That equality is EMPIRICAL, not
    structural: LSH recall at jaccard exactly ``threshold`` is
    1-(1-s^r)^b (~0.9998 at the defaults, r=``num_perm//bands``), so a
    borderline pair missed by every band would admit a doc the brute force
    rejects — the operator is approximate in general; raise ``bands`` /
    ``num_perm`` (both knobs above) for provable-in-practice recall on
    corpora with mass near the threshold. Reference analog: the daily MERGE
    dedup (`daily_qc_airflow/daily_dedupe_mainnet.py:28-81`) is
    exact-identity only; this is the content-similarity admission gate a
    training-data pipeline adds in front of the lake.

    The verified pair set is DERIVED, not recomputed: MinHash signatures
    and band buckets are split-independent, so the cross-side candidates
    are exactly the full-corpus banded pairs restricted to pairs crossing
    the split (``doc_a < cut ≤ doc_b`` under the canonical
    ``doc_a < doc_b`` ordering) — one LSH execution
    (:func:`minhash_lsh_dedup`'s memoized pair store, the in-process stand-in
    for the persisted band index ``similarity.extend_lsh_index`` maintains
    at lake scale) serves pairs, clustering, keep-best AND this admission
    gate, instead of each re-hashing the corpus."""
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"],
    )
    cut = int(split_frac * ds.count())
    pairs = minhash_lsh_dedup(
        sf_dir, threshold=threshold, num_perm=num_perm, bands=bands, k=k
    )
    crossing = pairs[(pairs["doc_a"] < cut) & (pairs["doc_b"] >= cut)]
    rejected = set(crossing["doc_b"].astype("int64").tolist())
    rej_ref = ray.put(np.fromiter(rejected, dtype=np.int64, count=len(rejected)))

    def admit(t: pa.Table, *, ref) -> pa.Table:
        rej = pa.array(ray.get(ref), pa.int64())
        keep = pc.invert(pc.is_in(t.column("doc_id"), value_set=rej))
        return t.filter(keep).select(["doc_id", "lang", "source", "n_chars"])

    out = (
        ds.filter(expr=f"doc_id >= {cut}")
        .map_batches(admit, fn_kwargs={"ref": rej_ref}, batch_format="pyarrow")
        .to_pandas()
    )
    return _admitted_frame(out)


# ------------------------------------------------------------ exact dup spans


_SPAN_BASE = np.uint64(1000003)


class SpanHasher:
    """Emit one (doc_id, h) row per DISTINCT ``span_len``-token window of
    each document — the unit of exact substring-level dedup (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better":
    repeated ≥L-token substrings across documents; `interdoc_ngram_dup` is
    the occurrence-count variant, this is the distinct-document one).

    Tokenization = the repetition-op convention (collapse whitespace, split
    on single spaces) so the DuckDB oracle's
    ``string_split(regexp_replace(text,'\\s+',' ','g'), ' ')`` mirrors it
    exactly. The window hash is a 64-bit rolling polynomial over per-token
    md5-64 hashes: ``span_len`` vectorized multiply-adds over the batch's
    flat token-hash array (the `shingle_hashes` shape lifted from chars to
    tokens), never a Python loop per window. Tokens cannot contain spaces,
    so span-string → token-sequence is injective and hash equality stands
    in for string equality (64-bit collision odds are negligible at test
    scale; a 10^10-window corpus would switch `_SPAN_BASE` hashing to the
    128-bit variant — same shape, two uint64 lanes)."""

    def __init__(self, span_len: int = 8):
        self.L = int(span_len)
        self.base = _SPAN_BASE

    def __call__(self, b: pd.DataFrame) -> pa.Table:
        b = b.reset_index(drop=True)
        # ARROW output block (the NgramPairEmitter lesson): Ray's sort-based
        # aggregate over pandas blocks drops into a per-group Python path —
        # measured here too (8.8 s vs 0.5 s on the same 23k spans)
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "h": pa.array([], pa.int64())}
        )
        if not len(b):
            return empty
        L = self.L
        norm = b["text"].fillna("").str.replace(r"\s+", " ", regex=True)
        toks = norm.str.split(" ")
        counts, starts = _doc_bounds(toks)
        total = int(counts.sum())
        if total < L:
            return empty
        flat = [t for lst in toks for t in lst]
        hs = md5_u64(flat)
        n_starts = total - L + 1
        with np.errstate(over="ignore"):
            h = np.zeros(n_starts, dtype=np.uint64)
            for j in range(L):  # L vector ops, not n_starts python ops
                h = h * self.base + hs[j : n_starts + j]
        # a window starting at in-doc position p is valid iff p + L <= doc_len
        pos = np.arange(n_starts, dtype=np.int64) - np.repeat(starts, counts)[:n_starts]
        doc_len = np.repeat(counts, counts)[:n_starts]
        valid = pos <= doc_len - L
        doc_idx = np.repeat(np.arange(len(b), dtype=np.int64), counts)[:n_starts]
        df = pd.DataFrame(
            # int64 bit-reinterpret: Ray's groupby/aggregate round-trips
            # int64 losslessly while uint64 keys come back widened
            {"doc_id": b["doc_id"].to_numpy()[doc_idx[valid]], "h": h[valid].view(np.int64)}
        ).drop_duplicates(ignore_index=True)
        return pa.Table.from_pandas(df, preserve_index=False)


def dup_spans(sf_dir: str, span_len: int = 8, min_docs: int = 2) -> pd.DataFrame:
    """Per-document exact duplicated-span accounting: of a doc's distinct
    ``span_len``-token windows, how many occur in ≥ ``min_docs`` DISTINCT
    documents corpus-wide. Output per doc (ALL docs, zero-filled):
    ``n_spans``, ``n_dup_spans``, ``dup_ratio``.

    Distributed shape (the `interdoc_ngram_dup` three-exchange plan): per-
    batch vectorized span hashing with within-doc dedup (`SpanHasher`) →
    the span dataset is materialized ONCE (8-byte key + doc id columns,
    object-store-spillable) and feeds both sides of ONE native hash join:
    groupby(h) count — each (h, doc) row is unique, so the count IS the
    distinct-doc count — joined back to the span rows (small side
    broadcast when it fits), then a single groupby(doc_id) sums
    n_spans / n_dup_spans together. Nothing but the per-doc result
    reaches the driver (the doc spine is a single-column point read; the
    result itself is O(docs) by definition). Reference analog: the daily
    MERGE dedup (`daily_qc_airflow/daily_dedupe_mainnet.py:28-81`) is
    row-identity only; this is the content-substring extension a
    training-data pipeline needs."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    spans = ds.map_batches(
        SpanHasher(span_len), batch_format="pandas"
    ).materialize()
    totals = spans.groupby("h").aggregate(Count(alias_name="n_docs"))

    def mark(t: pa.Table) -> pa.Table:
        dup = pc.cast(pc.greater_equal(t.column("n_docs"), min_docs), pa.int64())
        ones = pa.array(np.ones(t.num_rows, dtype=np.int64))
        return pa.table({"doc_id": t["doc_id"], "one": ones, "dup": dup})

    per_doc = (
        safe_join(
            spans, totals, join_type="inner",
            num_partitions=_auto_join_partitions(), on=("h",),
        )
        .map_batches(mark, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("one", alias_name="n_spans"), Sum("dup", alias_name="n_dup_spans"))
        .to_pandas()
    )
    spine = pd.DataFrame({"doc_id": pd.unique(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .column("doc_id").to_pandas()
    )})
    out = spine.merge(per_doc, on="doc_id", how="left")
    out["n_spans"] = out["n_spans"].fillna(0).astype("int64")
    out["n_dup_spans"] = out["n_dup_spans"].fillna(0).astype("int64")
    out["dup_ratio"] = (
        out["n_dup_spans"] / out["n_spans"].clip(lower=1)
    ).round(6).astype("float64")
    return out.sort_values("doc_id").reset_index(drop=True)


def near_dup_keep_best(
    sf_dir: str,
    threshold: float = 0.8,
    **lsh_kwargs,
) -> pd.DataFrame:
    """Near-dup retention policy: within each near-duplicate cluster keep
    the best document (longest ``n_chars``, ties to the smallest doc_id)
    and mark the rest for drop — the policy step an LLM-data pipeline
    runs after clustering (keeping the min-id "representative" regardless
    of quality throws away the best copy).

    Shape: clusters from :func:`near_dup_clusters` (banded LSH + verified
    pairs + components — nothing driver-side beyond the cluster rows);
    the quality column for CLUSTERED docs only rides a column-pruned scan
    with a broadcast membership filter (clusters ≪ corpus by
    construction), so no join shuffle. Returns one row per clustered doc:
    (doc_id, cluster_id, n_chars, keep)."""
    clusters = near_dup_clusters(sf_dir, threshold=threshold, **lsh_kwargs)
    if clusters.empty:
        return pd.DataFrame(columns=["doc_id", "cluster_id", "n_chars", "keep"])
    member = frozenset(int(x) for x in clusters["doc_id"])

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["doc_id"].isin(member)]

    sub = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
        )
        .map_batches(pick, batch_format="pandas")
        .to_pandas()
    )
    out = clusters[["doc_id", "cluster_id"]].merge(sub, on="doc_id")
    out = out.sort_values(
        ["cluster_id", "n_chars", "doc_id"], ascending=[True, False, True]
    )
    out["keep"] = ~out.duplicated("cluster_id")
    out["n_chars"] = out["n_chars"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)
