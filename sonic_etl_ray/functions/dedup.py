"""Deduplication operators for training-data pipelines.

The reference's only dedup is the daily exact MERGE on natural keys
(``daily_qc_airflow/daily_dedupe_mainnet.py:28-35,65-81``); a 100 TB
training-data engine additionally needs near-dup. All operators follow the
same scale shape: per-batch vectorized signatures inside ``map_batches``,
then ONE hash/band groupby shuffle over small signature rows (never the
full text), then per-group verification.

- exact: sha256(content) → groupby(hash) → keep min-id row;
- MinHash + LSH: shingle → minhash → band buckets → candidate pairs →
  verified Jaccard;
- SimHash: 64-bit token-weighted fingerprint, Hamming-bucketed;
- n-gram Jaccard: exact pairwise Jaccard within small blocking groups.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .text import hash_token

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _sha256_series(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: hashlib.sha256(t.encode("utf-8")).hexdigest())


def exact_dedup(ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """Exact dedup: hash-partition on sha256(text), keep the min-id row per
    group (deterministic winner; the reference keeps an arbitrary
    ``ARRAY_AGG(… LIMIT 1)`` row — we strengthen to deterministic)."""

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["text_sha256"] = _sha256_series(b[text_col])
        return b

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="stable").head(1)

    return (
        ds.map_batches(add_hash, batch_format="pandas")
        .groupby("text_sha256")
        .map_groups(keep_first, batch_format="pandas")
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
    """Per-actor state: the random (a, b) affine family for n permutations
    (built once — the ST1 'index loaded per worker' pattern)."""

    def __init__(self, num_perm: int = 64, k: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 61, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 1 << 61, size=num_perm, dtype=np.uint64)
        self.k = k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes(text, self.k)
        # (n_shingles, num_perm) affine hashes; min per column
        vals = (sh[:, None] * self.a[None, :] + self.b[None, :]) & _M64
        return vals.min(axis=0)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in batch["text"]])
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(), "sig": list(sigs)})


def _band_rows(df: pd.DataFrame, bands: int, rows_per_band: int) -> pd.DataFrame:
    """Explode signatures to (band_id, band_hash, doc_id) rows for the LSH
    groupby — the shuffle moves only tiny signature rows."""
    out_doc, out_band, out_hash = [], [], []
    for doc, sig in zip(df["doc_id"], df["sig"]):
        sig = np.asarray(sig, dtype=np.uint64)
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
            out_doc.append(doc)
            out_band.append(b)
            out_hash.append(h)
    return pd.DataFrame({"doc_id": out_doc, "band_id": out_band, "band_hash": out_hash})


def jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = shingle_hashes(a, k), shingle_hashes(b, k)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    return inter / float(sa.size + sb.size - inter)


def minhash_lsh_dedup(
    sf_dir: str,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
) -> pd.DataFrame:
    """Near-dup pairs via MinHash+LSH, Jaccard-verified.

    Pipeline: map_batches(MinHasher actor pool) → explode to band rows →
    groupby(band_id, band_hash) → candidate pairs per bucket → broadcast
    text lookup → exact Jaccard verify ≥ threshold. Returns (doc_a, doc_b,
    jaccard) with doc_a < doc_b, sorted.
    """
    rows_per_band = num_perm // bands
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "k": k},
        batch_format="pandas",
        concurrency=(1, 4),
    )
    band_rows = sigs.map_batches(
        _band_rows,
        fn_kwargs={"bands": bands, "rows_per_band": rows_per_band},
        batch_format="pandas",
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if ids.size < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        ia, ib = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    cand = (
        band_rows.groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if cand.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    cand = cand.drop_duplicates(["doc_a", "doc_b"]).astype({"doc_a": "int64", "doc_b": "int64"})

    # verify: broadcast the candidate docs' texts (small side)
    import pyarrow.parquet as pq

    need = np.unique(np.concatenate([cand["doc_a"], cand["doc_b"]]))
    texts_tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    mask = pc.is_in(texts_tbl["doc_id"], value_set=pa.array(need))
    lut = dict(
        zip(
            texts_tbl.filter(mask)["doc_id"].to_pylist(),
            texts_tbl.filter(mask)["text"].to_pylist(),
        )
    )
    ref = ray.put(lut)

    class Verify:
        def __init__(self, ref, k, threshold):
            self.lut = ray.get(ref)
            self.k, self.threshold = k, threshold

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            j = [jaccard(self.lut[a], self.lut[x], self.k) for a, x in zip(b["doc_a"], b["doc_b"])]
            b = b.assign(jaccard=j)
            return b[b["jaccard"] >= self.threshold]

    verified = (
        ray.data.from_pandas(cand)
        .map_batches(Verify, fn_constructor_args=(ref, k, threshold), batch_format="pandas", concurrency=(1, 4))
        .to_pandas()
    )
    return verified.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def near_dup_clusters(sf_dir: str, threshold: float = 0.8, **lsh_kwargs) -> pd.DataFrame:
    """Near-duplicate clusters: LSH candidate pairs → connected components.

    The verified pair set is tiny relative to the corpus (it IS the dup
    population), so union-find runs on the driver — the guide's sanctioned
    small-candidate-set path; at larger dup rates switch to iterated
    min-label propagation via groupby. Returns one row per document that
    belongs to a cluster: (doc_id, cluster_id=min doc in component,
    is_representative).
    """
    pairs = minhash_lsh_dedup(sf_dir, threshold=threshold, **lsh_kwargs)
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
    """64-bit SimHash over token hashes (charikar); per-actor bit table."""

    def __init__(self):
        self.bits = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        hs = np.fromiter((hash_token(t) for t in toks), dtype=np.uint64)
        bitmat = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        votes = (2 * bitmat - 1).sum(axis=0)
        return int(((votes > 0).astype(np.uint64) * self.bits).sum() & _M64)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["doc_id"], "simhash": [self.simhash(t) for t in b["text"]]}
        )


def simhash_fingerprints(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(SimHasher, batch_format="pandas", concurrency=(1, 4)).to_pandas()
    out["simhash"] = out["simhash"].astype("uint64")
    return out.sort_values("doc_id").reset_index(drop=True)


def ngram_jaccard_pairs(
    sf_dir: str, threshold: float = 0.5, k: int = 3, block_col: str = "source"
) -> pd.DataFrame:
    """Exact k-gram Jaccard pairs ≥ threshold within blocking groups.

    Blocking on ``block_col`` keeps the pairwise work per group bounded —
    the groupby is the only shuffle; pairs never cross groups.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", block_col]
    )

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable")
        ids = g["doc_id"].to_numpy()
        shingles = [shingle_hashes(t, k) for t in g["text"]]
        rows_a, rows_b, js = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                si, sj = shingles[i], shingles[j]
                inter = np.intersect1d(si, sj, assume_unique=True).size
                jac = inter / float(si.size + sj.size - inter)
                if jac >= threshold:
                    rows_a.append(ids[i])
                    rows_b.append(ids[j])
                    js.append(jac)
        return pd.DataFrame({"doc_a": rows_a, "doc_b": rows_b, "jaccard": js})

    out = ds.groupby(block_col).map_groups(per_block, batch_format="pandas").to_pandas()
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def exact_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """Exact dedup over documents; returns surviving (doc_id, text_sha256)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = exact_dedup(ds).to_pandas()[["doc_id", "text_sha256"]]
    return out.sort_values("doc_id").reset_index(drop=True)
