"""Text analysis stages for training-data pipelines over `documents`.

Callable-class ``map_batches`` stages with compiled state — the ST1
pattern (``ErcEventCatalog`` built once per worker,
``events/erc.rs:13-180``): regexes compiled and stopword/ngram tables built
in ``__init__``, vectorized work in ``__call__``. Instances are passed to
``map_batches`` as plain callables: the state is tiny (compiled patterns,
small tables), so it serializes once into the task spec and ships once per
worker process — same once-per-worker amortization as an actor pool, with
zero actor-process startup (measured ~1 s per pool per query; the catalog
decode stage in ``stages/catalog.py``, whose state is genuinely heavy,
stays an actor pool).

Ops: token counting (regex \\S+, SQL-parity semantics), quality scoring
(char/token stats + stopword ratio), language-ID (stopword + n-gram
heuristic), rolling-hash document fingerprinting.

Every op here has exact SQL-parity semantics so the driver's DuckDB oracle
can verify it hash-for-hash: the per-token 64-bit hash is the LOW 8 bytes
of md5 (little-endian), i.e. DuckDB's ``md5_number_lower``; the rolling
fingerprint and SimHash are wrap-around uint64 arithmetic DuckDB can mirror
with HUGEINT modular expressions.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import ray.data

from sonic_etl_ray.stages.joins import safe_join

STOPWORDS_EN = ("the", "a", "and", "of", "to")
TOKEN_RE = r"\S+"

# Tiny per-language stopword catalogs for the heuristic language-ID stage.
_LANG_MARKERS = {
    "en": {"the", "a", "and", "of", "to", "is", "in"},
    "de": {"der", "die", "das", "und", "nicht", "ist"},
    "fr": {"le", "la", "et", "les", "des", "est"},
    "es": {"el", "la", "los", "y", "es", "de"},
}

FP_BASE = 1099511628211
FP_OFFSET = 14695981039346656037
_M64_INT = 0xFFFFFFFFFFFFFFFF


def md5_u64(tokens: list[str]) -> np.ndarray:
    """Per-token 64-bit hash = low 8 bytes of md5, little-endian — exactly
    DuckDB's ``md5_number_lower`` (verified byte-for-byte), so every op built
    on it has an exact SQL oracle. The md5 core is C; the comprehension is
    the only per-token Python and is bounded by token count, not bytes."""
    md5 = hashlib.md5
    return np.fromiter(
        (int.from_bytes(md5(t.encode("utf-8")).digest()[8:16], "little") for t in tokens),
        dtype=np.uint64,
        count=len(tokens),
    )


def _doc_bounds(token_lists: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(counts, starts) for a Series of per-doc token lists."""
    counts = token_lists.map(len).to_numpy(dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return counts, starts


class TokenCounter:
    """n_tokens per doc; tokens = maximal runs of non-whitespace (\\S+).
    The pattern string is passed to pandas directly (re's internal compile
    cache makes per-batch recompiles free; a compiled-object attribute here
    would be dead state)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["text"].str.count(TOKEN_RE).fillna(0).astype("int64")
        return pd.DataFrame({"doc_id": batch["doc_id"], "n_tokens": n})


class QualityScorer:
    """Length / token / stopword-ratio quality features.

    Columns (SQL-parity semantics; see ``__ray_entry__.oracle_sql``):
      n_chars, n_tokens, stop_ratio = en-stopword tokens / tokens.
    Stopword counting is vectorized: explode → isin → index-grouped sum.
    """

    def __init__(self):
        self.stop = frozenset(STOPWORDS_EN)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        text = batch["text"].fillna("")  # null docs score as empty, not crash
        n_chars = text.str.len().astype("int64")
        toks = text.str.findall(TOKEN_RE)
        n_tokens = toks.map(len).astype("int64")
        flat = toks.explode()
        n_stop = (
            flat.isin(self.stop)
            .groupby(level=0)
            .sum()
            .reindex(batch.index, fill_value=0)
            .astype("int64")
        )
        stop_ratio = (n_stop / n_tokens.clip(lower=1)).astype("float64")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "stop_ratio": stop_ratio,
            }
        )


class LangId:
    """Heuristic language ID: argmax over per-language marker-token hits,
    'und' when nothing matches. Deterministic tie-break by language code
    (first language in sorted order achieving the max). Vectorized: one
    explode, one isin per language, index-grouped sums."""

    def __init__(self):
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}
        self.order = sorted(self.markers)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        flat = batch["text"].str.lower().str.findall(TOKEN_RE).explode()
        scores = pd.DataFrame(
            {
                lang: flat.isin(self.markers[lang])
                .groupby(level=0)
                .sum()
                .reindex(batch.index, fill_value=0)
                for lang in self.order
            }
        )
        best = scores.idxmax(axis=1)  # ties → first (sorted) column
        best[scores.max(axis=1) == 0] = "und"
        return pd.DataFrame({"doc_id": batch["doc_id"], "lang_pred": best})


class Fingerprinter:
    """64-bit rolling polynomial fingerprint of the token stream.

    h = OFFSET; for each token: h = (h * BASE + md5_u64(token)) mod 2^64.
    Deterministic and order-sensitive — the document-identity analog of the
    reference's per-row content invariants. Vectorized: the whole batch's
    tokens are hashed flat, positional BASE powers come from one wrap-around
    cumulative product, and per-doc reduction is a segmented sum. Exact SQL
    mirror: list_reduce over md5_number_lower with HUGEINT modular steps.
    """

    def __init__(self):
        self.base = np.uint64(FP_BASE)
        self.offset = np.uint64(FP_OFFSET)

    def fingerprint_batch(self, texts: pd.Series) -> np.ndarray:
        toks = texts.fillna("").str.findall(TOKEN_RE)  # null -> empty doc
        counts, starts = _doc_bounds(toks)
        total = int(counts.sum())
        if total == 0:
            return np.full(len(texts), FP_OFFSET, dtype=np.uint64)
        flat: list[str] = [t for lst in toks for t in lst]
        hs = md5_u64(flat)
        nmax = int(counts.max())
        with np.errstate(over="ignore"):
            # pow_table[i] = BASE^i mod 2^64 (uint64 wrap-around is the mod)
            pow_table = np.ones(nmax + 1, dtype=np.uint64)
            np.multiply.accumulate(
                np.full(nmax, self.base, dtype=np.uint64), out=pow_table[1:]
            )
            # token at position p of an n-token doc contributes hash*BASE^(n-1-p)
            pos = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
            exp = np.repeat(counts, counts) - 1 - pos
            terms = hs * pow_table[exp]
            csum = np.concatenate([[np.uint64(0)], np.cumsum(terms, dtype=np.uint64)])
            seg = csum[starts + counts] - csum[starts]
            return self.offset * pow_table[counts] + seg

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        fps = self.fingerprint_batch(batch["text"])
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "fingerprint": pd.Series(fps, dtype="uint64")}
        )

    @classmethod
    def fingerprint(cls, text: str) -> int:
        """Scalar convenience over the batch kernel."""
        return int(cls().fingerprint_batch(pd.Series([text]))[0])


def hash_token(tok: str) -> int:
    """Stable per-token 64-bit hash (md5 low 8 bytes, little-endian —
    DuckDB ``md5_number_lower`` parity)."""
    return int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[8:16], "little")


BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


class BpeishTokenizer:
    """BPE-ish pre-tokenization: letter runs / digit runs / punctuation runs
    (the GPT-2-style pre-split, simplified to a pattern both Python re and
    RE2 execute identically so the DuckDB oracle can mirror it)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["text"].str.count(BPE_PATTERN).fillna(0).astype("int64")
        return pd.DataFrame({"doc_id": batch["doc_id"], "n_bpe_tokens": n})


def bpe_token_counts(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(BpeishTokenizer(), batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def token_counts(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(TokenCounter(), batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_quality(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(QualityScorer(), batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def lang_id(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(LangId(), batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_fingerprints(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(Fingerprinter(), batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


class RepetitionScorer:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    documents dominated by repeated tokens / n-grams are low-quality
    training data. Per doc:

      n_tokens        — tokens of the whitespace-normalized text
      dup_token_frac  — 1 − unique/total token occurrences
      top_2gram_frac  — tokens covered by the most frequent 2-gram (2·max/n)

    Tokenization = split on single spaces after collapsing all whitespace,
    exactly mirroring the SQL oracle's
    ``string_split(regexp_replace(text, '\\s+', ' ', 'g'), ' ')``.
    Vectorized: one explode, grouped nunique, grouped shift for pairs."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        norm = batch["text"].fillna("").str.replace(r"\s+", " ", regex=True)
        toks = norm.str.split(" ")
        n = toks.map(len).astype("int64")
        flat = toks.explode()
        nuniq = (
            flat.groupby(level=0).nunique().reindex(batch.index, fill_value=0).astype("int64")
        )
        dup_frac = (1.0 - nuniq / n.clip(lower=1)).where(n > 0, 0.0)
        df = flat.to_frame("tok")
        df["nxt"] = df.groupby(level=0)["tok"].shift(-1)
        p = df.dropna(subset=["nxt"])
        if len(p):
            pair_counts = p.groupby([p.index, (p["tok"] + " " + p["nxt"]).values]).size()
            top2 = (
                pair_counts.groupby(level=0).max().reindex(batch.index, fill_value=0)
            ).astype("int64")
        else:
            top2 = pd.Series(0, index=batch.index, dtype="int64")
        top2_frac = (2 * top2 / n.clip(lower=1)).where(n >= 2, 0.0)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n,
                "dup_token_frac": dup_frac.astype("float64"),
                "top_2gram_frac": top2_frac.astype("float64"),
            }
        )


def repetition_stats(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(RepetitionScorer(), batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# deterministic "benchmark set" for the contamination check: every 50th doc
# contributes its normalized tokens [10:23] as a 13-gram snippet (13-gram
# overlap is the GPT-3/PaLM decontamination window)
CONTAM_EVERY = 50
CONTAM_LO, CONTAM_HI = 10, 23
CONTAM_MIN_TOKENS = 30


def _normalize_ws(s: pd.Series) -> pd.Series:
    return s.fillna("").str.replace(r"\s+", " ", regex=True)


def benchmark_snippets(sf_dir: str) -> list[str]:
    """The (tiny) benchmark side: deterministic 13-gram snippets drawn from
    every ``CONTAM_EVERY``-th document. This is the broadcast-small side —
    collected once on the driver, shipped to every checker actor via
    ``ray.put``, never joined through a shuffle."""
    import pyarrow as pa
    import ray as _ray

    def _pick(t: pa.Table) -> pa.Table:
        mask = np.asarray(t["doc_id"]) % CONTAM_EVERY == 0
        return t.filter(pa.array(mask))

    refs = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(_pick, batch_format="pyarrow")
        .to_arrow_refs()
    )

    picked = [x for x in _ray.get(refs) if x.num_rows]
    if not picked:  # empty corpus / nothing sampled: no benchmark side
        return []
    t = pa.concat_tables(picked)
    df = t.to_pandas().sort_values("doc_id")
    toks = _normalize_ws(df["text"]).str.split(" ")
    keep = toks.map(len) >= CONTAM_MIN_TOKENS
    return [
        " ".join(ts[CONTAM_LO:CONTAM_HI]) for ts in toks[keep]
    ]


class ContaminationChecker:
    """Benchmark-contamination flag: does the (whitespace-normalized) doc
    contain any benchmark 13-gram verbatim? The snippet list is fetched
    once at construction and ships once per worker; the per-batch check is one
    vectorized ``str.contains`` per snippet — exact substring, no regex."""

    def __init__(self, snippets_ref):
        import ray as _ray

        self.snippets = _ray.get(snippets_ref)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        norm = _normalize_ws(batch["text"])
        flag = pd.Series(False, index=batch.index)
        for s in self.snippets:
            flag |= norm.str.contains(s, regex=False)
        return pd.DataFrame({"doc_id": batch["doc_id"], "contaminated": flag})


def contamination_check(sf_dir: str) -> pd.DataFrame:
    import ray as _ray

    snippets_ref = _ray.put(benchmark_snippets(sf_dir))
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(
        ContaminationChecker(snippets_ref), batch_format="pandas"
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


class NgramPairEmitter:
    """Per-batch stage 1 of the inter-document n-gram duplication signal:
    explode each doc's whitespace-normalized tokens into trigrams, hash each
    trigram (md5 low-64 — 8-byte shuffle keys instead of strings), and emit
    pre-counted (gh, doc_id, c) rows. The per-batch group_by bounds shuffle
    volume to distinct (ngram, doc) pairs per batch. Emits ARROW blocks:
    Ray's downstream aggregate on pandas blocks falls into a per-group
    Python path (measured 38.7 s vs 2.1 s on identical 27k-group data)."""

    N = 3

    def __call__(self, batch: pd.DataFrame) -> "pa.Table":  # noqa: F821
        import pyarrow as pa

        empty = pa.table(
            {
                "gh": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        if not len(batch):
            return empty
        batch = batch.reset_index(drop=True)
        norm = batch["text"].fillna("").str.replace(r"\s+", " ", regex=True)
        toks = norm.str.split(" ")
        flat = toks.explode()
        df = flat.to_frame("t0")
        grp = df.groupby(level=0)["t0"]
        df["t1"] = grp.shift(-1)
        df["t2"] = grp.shift(-2)
        p = df.dropna(subset=["t1", "t2"])
        if not len(p):
            return empty
        ng = (p["t0"] + " " + p["t1"] + " " + p["t2"]).tolist()
        gh = md5_u64(ng).view(np.int64)
        pairs = pd.DataFrame(
            {"gh": gh, "doc_id": batch["doc_id"].to_numpy()[p.index.to_numpy()]}
        )
        out = pairs.groupby(["gh", "doc_id"], as_index=False).size()
        return pa.table(
            {
                "gh": pa.array(out["gh"].to_numpy(), pa.int64()),
                "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
                "c": pa.array(out["size"].to_numpy().astype("int64"), pa.int64()),
            }
        )


def interdoc_ngram_dup(sf_dir: str, min_count: int = 2) -> pd.DataFrame:
    """Corpus-wide duplicated-n-gram fraction per document (the Gopher-style
    INTER-document repetition signal — `RepetitionScorer` is intra-doc):
    for each doc with ≥1 trigram, how many of its trigram occurrences appear
    ≥ ``min_count`` times across the WHOLE corpus.

    Distributed shape: batch-pre-counted (gh, doc, c) pairs → one groupby on
    the ngram hash for global totals → native hash join pairs⋈totals on the
    same key → one groupby on doc_id. All three exchanges are key-partitioned
    columnar int64; nothing materializes on the driver except the per-doc
    result. The md5-64 ngram hash keeps exchange keys at 8 bytes (collision
    odds negligible vs the quality-signal use)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # pairs feed BOTH the totals aggregate and the join probe side:
    # materialize once (columnar int64 rows, object-store-spillable) instead
    # of re-running tokenize+hash over the corpus a second time
    pairs = ds.map_batches(
        NgramPairEmitter(), batch_format="pandas"
    ).materialize()
    totals = pairs.groupby("gh").aggregate(Sum("c", alias_name="total"))
    joined = safe_join(
        pairs,
        totals.select_columns(["gh", "total"]),
        join_type="inner",
        num_partitions=8,
        on=("gh",),
    )

    def mark(t: pa.Table) -> pa.Table:
        dup = pc.if_else(
            pc.greater_equal(t["total"], min_count), t["c"], pa.scalar(0, pa.int64())
        )
        return pa.table(
            {"doc_id": t["doc_id"], "n_ngrams": t["c"], "dup_ngrams": dup}
        )

    out = (
        joined.map_batches(mark, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("n_ngrams", alias_name="n_ngrams"),
            Sum("dup_ngrams", alias_name="dup_ngrams"),
        )
        .to_pandas()
    )
    out["n_ngrams"] = out["n_ngrams"].astype("int64")
    out["dup_ngrams"] = out["dup_ngrams"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


class TextNormalizer:
    """Unicode-light text normalization for training prep: lowercase,
    collapse all whitespace runs to single spaces, strip leading/trailing
    space — fully vectorized pandas ``.str`` kernels, exact SQL parity
    (``lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))``). Reports the
    character delta so quality filters can gate on how much cleanup a doc
    needed."""

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        raw = b["text"].fillna("")
        clean = (
            raw.str.replace(r"\s+", " ", regex=True).str.strip().str.lower()
        )
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "clean_text": clean,
                "n_chars": clean.str.len().astype("int64"),
                "chars_removed": (raw.str.len() - clean.str.len()).astype("int64"),
            }
        )


def normalize_text(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(TextNormalizer(), batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# PII / deny-list scrubbing
# ---------------------------------------------------------------------------

# (pattern, replacement) in application order. Each pattern is plain RE2-safe
# syntax so the DuckDB oracle can run the identical strings through
# regexp_replace(..., 'g'). Deny-list terms stand in for canary strings /
# known-bad phrases a production scrub would carry.
SCRUB_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    (r"\b(?:customer|spark)\b", "[TERM]"),
)


class Scrubber:
    """PII / deny-list redaction for training prep (the DataTrove/Dolma
    `PIIFormatter` shape): replace every match of each pattern, in a fixed
    order, and report how many spans were redacted per document.

    ST1 discipline: patterns compiled once in ``__init__`` (shipped once
    per worker); ``__call__`` is all vectorized pandas ``.str`` kernels.
    Match counts are measured against the ORIGINAL text (the cascade cannot
    re-create an earlier pattern from these replacement literals), which is
    what the SQL oracle mirrors with len(regexp_extract_all(text, p))."""

    def __init__(self, patterns: tuple[tuple[str, str], ...] = SCRUB_PATTERNS):
        self.compiled = [(re.compile(p), repl) for p, repl in patterns]

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        text = b["text"].fillna("")
        n_red = np.zeros(len(b), dtype=np.int64)
        clean = text
        for pat, repl in self.compiled:
            n_red += text.str.count(pat).to_numpy(np.int64)
            clean = clean.str.replace(pat, repl, regex=True)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "clean_text": clean,
                "n_redactions": n_red,
            }
        )


def scrub_text(sf_dir: str) -> pd.DataFrame:
    """Corpus-wide scrub: embarrassingly parallel map_batches, no shuffle;
    at 100 TB this runs at read bandwidth with the actor pool sized to the
    cluster and output written back per-block (here collected only because
    the gate compares full results)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(Scrubber(), batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Per-doc distinctive terms (tf × 1/df — the tf-idf family, SQL-exact)
# ---------------------------------------------------------------------------


class DocTermCounter:
    """Per-batch (doc_id, term, tf) pairs — tf is complete because a doc
    never spans batches (one row per doc). Vectorized explode + value_counts;
    emits ARROW blocks (the aggregate after this is per-group Python on
    pandas blocks — see SCALE.md)."""

    def __call__(self, b: pd.DataFrame) -> "pa.Table":  # noqa: F821
        import pyarrow as pa

        if not len(b):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        toks = b["text"].fillna("").str.findall(TOKEN_RE)
        n = toks.str.len().to_numpy(np.int64)
        doc_ids = np.repeat(b["doc_id"].to_numpy(np.int64), n)
        flat = pd.Series(doc_ids).to_frame("doc_id")
        flat["term"] = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        vc = flat.value_counts(["doc_id", "term"], sort=False)
        idx = vc.index.to_frame(index=False)
        return pa.table(
            {
                "doc_id": pa.array(idx["doc_id"].to_numpy(np.int64), pa.int64()),
                "term": pa.array(idx["term"].astype(str), pa.string()),
                "tf": pa.array(vc.to_numpy().astype(np.int64), pa.int64()),
            }
        )


def distinctive_terms(sf_dir: str, k: int = 5, num_buckets: int = 64) -> pd.DataFrame:
    """Top-k most distinctive terms per document, weighted tf × 1/df (the
    tf-idf family with a rational idf so ordering is bit-deterministic:
    score = tf/df in IEEE double, identical in numpy and DuckDB; ties break
    (df ASC, term ASC)).

    Scale shape: per-batch (doc,term,tf) combiner → ONE groupby(term) for
    document frequencies → hash join pairs⋈df on the 8-byte-ish term key →
    bucket-keyed exchange (doc_id % num_buckets) with the per-doc top-k
    computed VECTORIZED inside each bucket (sort + cumcount over the whole
    bucket frame — per-bucket Python, never per-doc, so group-invocation
    overhead is bounded by num_buckets, not corpus size)."""
    import pyarrow as pa
    from ray.data.aggregate import Count

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = ds.map_batches(
        DocTermCounter(), batch_format="pandas"
    ).materialize()
    dfreq = pairs.groupby("term").aggregate(Count(alias_name="df"))
    joined = safe_join(
        pairs,
        dfreq.select_columns(["term", "df"]),
        join_type="inner",
        num_partitions=8,
        on=("term",),
    )

    def add_bucket(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        return t.append_column(
            "__bucket",
            pc.cast(pc.bit_wise_and(t.column("doc_id"), num_buckets - 1), pa.int64()),
        )

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["df"] = g["df"].astype("int64")
        g["score"] = g["tf"].to_numpy(np.float64) / g["df"].to_numpy(np.float64)
        g = g.sort_values(
            ["doc_id", "score", "df", "term"],
            ascending=[True, False, True, True],
            kind="stable",
        )
        g["rank"] = g.groupby("doc_id").cumcount().astype("int64") + 1
        out = g[g["rank"] <= k]
        return out[["doc_id", "term", "tf", "df", "rank"]]

    out = (
        joined.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()
    )
    for c in ("doc_id", "tf", "df", "rank"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["doc_id", "rank"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Unigram-LM quality proxy (integer-quantized log-likelihood)
# ---------------------------------------------------------------------------


def lm_quality_proxy(sf_dir: str) -> pd.DataFrame:
    """CCNet-style language-model quality signal without a model: per doc,
    the sum over token occurrences of floor(log2(corpus frequency)) — docs
    made of common tokens score high, rare-token noise scores low. The log
    is integer-quantized via bit length, so BOTH engines compute exact
    integers (no float log, no accumulation-order sensitivity) and the
    oracle is hash-exact.

    Shape (same exchanges as :func:`distinctive_terms`): (doc, token, tf)
    per-batch combiner → ONE groupby(token) for corpus counts → hash join →
    per-doc groupby-sum. floor_log2 via ``np.frexp`` (exact for int64
    counts), mirrored in SQL as ``strlen(bin(cnt)) - 1``."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = ds.map_batches(
        DocTermCounter(), batch_format="pandas"
    ).materialize()
    totals = pairs.groupby("term").aggregate(Sum("tf", alias_name="cnt"))
    joined = safe_join(
        pairs,
        totals.select_columns(["term", "cnt"]),
        join_type="inner",
        num_partitions=8,
        on=("term",),
    )

    def score(t: pa.Table) -> pa.Table:
        cnt = t.column("cnt").to_numpy().astype(np.int64)
        flog2 = (np.frexp(cnt.astype(np.float64))[1] - 1).astype(np.int64)
        tf = t.column("tf").to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(tf, pa.int64()),
                "score": pa.array(tf * flog2, pa.int64()),
            }
        )

    out = (
        joined.map_batches(score, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("n_tokens", alias_name="n_tokens"), Sum("score", alias_name="lm_score")
        )
        .to_pandas()
    )
    for c in ("n_tokens", "lm_score"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Compression-ratio quality signal (zlib; no SQL analog → pytest-verified)
# ---------------------------------------------------------------------------


class CompressionScorer:
    """Gopher-style compressibility filter: highly repetitive documents
    compress far below typical prose; ratio = deflate(text)/len(text).
    Per-item C-speed zlib in the batch kernel (decode-class work); level
    fixed for determinism. No SQL analog — verified by pytest invariants."""

    def __init__(self, level: int = 6):
        self.level = level

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        import zlib

        lvl = self.level
        raw = [t.encode("utf-8") if t else b"" for t in b["text"]]
        comp = np.array([len(zlib.compress(r, lvl)) for r in raw], dtype=np.int64)
        n = np.array([len(r) for r in raw], dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_bytes": n,
                "compressed_bytes": comp,
                "compression_ratio": comp / np.maximum(n, 1),
            }
        )


def compression_scores(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(
        CompressionScorer(), batch_format="pandas"
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def corpus_profile(sf_dir: str) -> pd.DataFrame:
    """Single-scan corpus profile ("dataset card" numbers): document /
    char / token totals plus per-(lang, source) document counts, all from
    ONE column-pruned pass — per-batch additive partials (a handful of
    rows per batch regardless of batch size) folded by one tiny groupby.
    Derived ratios (mean doc length, tokens per doc) are computed
    driver-side from the additive components so every emitted number is
    exactly SQL-reproducible. Tokens = \\S+ runs, identical to
    :class:`TokenCounter`."""
    import pyarrow as pa

    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "lang", "source"]
    )

    def partial(b: pd.DataFrame) -> pa.Table:
        toks = b["text"].str.count(TOKEN_RE).fillna(0).astype("int64")
        chars = b["text"].str.len().fillna(0).astype("int64")
        metrics = ["n_docs", "n_chars", "n_tokens"]
        values = [len(b), int(chars.sum()), int(toks.sum())]
        for lang, n in b.groupby("lang").size().items():
            metrics.append(f"docs_lang={lang}")
            values.append(int(n))
        for src, n in b.groupby("source").size().items():
            metrics.append(f"docs_source={src}")
            values.append(int(n))
        return pa.table(
            {
                "metric": pa.array(metrics, pa.string()),
                "value": pa.array(values, pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("metric")
        .aggregate(Sum("value", alias_name="value"))
        .to_pandas()
    )
    if out.empty:
        # an empty corpus still has a profile (the oracle COALESCEs its
        # empty-input sums to 0); per-group rows are rightly absent —
        # NULL lang/source groups are skipped on both sides
        out = pd.DataFrame(
            {"metric": ["n_chars", "n_docs", "n_tokens"], "value": [0, 0, 0]}
        )
    out["value"] = out["value"].astype("int64")
    return out.sort_values("metric").reset_index(drop=True)


# ------------------------------------------------------ DSIR importance


class _GramBucketCounter:
    """Pass 1 of :func:`dsir_importance_weights`: per-batch partial counts
    of hashed-bigram buckets, split target vs all. Emits ARROW (bucket,
    n_t, n_all) rows — at most ``num_buckets`` per batch, a fixed-size
    partial regardless of corpus size (the mergeable-sketch shape)."""

    def __init__(self, target_lang: str, num_buckets: int):
        self.target = target_lang
        self.B = int(num_buckets)

    def __call__(self, batch: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        empty = pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "n_t": pa.array([], pa.int64()),
                "n_all": pa.array([], pa.int64()),
            }
        )
        if not len(batch):
            return empty
        batch = batch.reset_index(drop=True)
        buckets, doc_rows = _bigram_buckets(batch["text"], self.B)
        if buckets.size == 0:
            return empty
        is_t = (batch["lang"] == self.target).to_numpy()[doc_rows]
        n_all = np.bincount(buckets, minlength=self.B)
        n_t = np.bincount(buckets[is_t], minlength=self.B)
        nz = np.nonzero(n_all)[0]
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "n_t": pa.array(n_t[nz], pa.int64()),
                "n_all": pa.array(n_all[nz], pa.int64()),
            }
        )


def _bigram_buckets(texts: pd.Series, B: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket ids, source row index) for every bigram of every text, under
    the corpus tokenization convention (collapse whitespace, split on
    single spaces — the ``string_split(regexp_replace(...))`` mirror)."""
    norm = texts.fillna("").str.replace(r"\s+", " ", regex=True)
    toks = norm.str.split(" ")
    flat = toks.explode()
    df = flat.to_frame("t0")
    df["t1"] = df.groupby(level=0)["t0"].shift(-1)
    p = df.dropna(subset=["t1"])
    if not len(p):
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    ng = (p["t0"] + " " + p["t1"]).tolist()
    buckets = (md5_u64(ng) % np.uint64(B)).astype(np.int64)
    return buckets, p.index.to_numpy()


class _DsirScorer:
    """Pass 2: per-doc importance weight = Σ over bigrams of the broadcast
    bucket log-likelihood ratio. Light state (B float64s) — constructed
    instance → task stage, shipped once per worker via the function table."""

    def __init__(self, lr: np.ndarray, B: int):
        self.lr = lr
        self.B = int(B)

    def __call__(self, batch: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        if not len(batch):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_grams": pa.array([], pa.int64()),
                    "weight": pa.array([], pa.float64()),
                }
            )
        batch = batch.reset_index(drop=True)
        buckets, doc_rows = _bigram_buckets(batch["text"], self.B)
        n = len(batch)
        n_grams = np.bincount(doc_rows, minlength=n).astype(np.int64)
        weight = np.bincount(doc_rows, weights=self.lr[buckets], minlength=n)
        return pa.table(
            {
                "doc_id": pa.array(batch["doc_id"].to_numpy(), pa.int64()),
                "n_grams": pa.array(n_grams, pa.int64()),
                "weight": pa.array(weight, pa.float64()),
            }
        )


# weights memo: (sf_dir, params) → (input stamp, DataFrame) — the same
# replace-on-stale discipline as dedup._VERIFIED_PAIRS_CACHE, so the
# selection step reuses one weight computation in-process.
_DSIR_CACHE: dict[tuple, tuple[str, pd.DataFrame]] = {}


def _documents_stamp(sf_dir: str) -> str:
    import os

    try:
        st = os.stat(f"{sf_dir}/documents.parquet")
        return f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        return "missing"


def dsir_importance_weights(
    sf_dir: str, target_lang: str = "en", num_buckets: int = 4096
) -> pd.DataFrame:
    """Data Selection via Importance Resampling weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    per-document log-likelihood ratio of a hashed-bigram bag-of-ngrams
    model fit on the TARGET subset (``lang == target_lang``) vs the full
    corpus, add-1 smoothed over ``num_buckets`` hash buckets.

    Two bounded passes: (1) distributed partial bucket counts (≤B rows per
    batch, one small groupby — the fixed-size mergeable-partial shape that
    never grows with the corpus); (2) the B-float log-ratio table ships to
    a task stage and every doc's weight is a vectorized gather-sum. Bucket
    hash = md5 low-64 (``md5_number_lower`` parity), so the SQL oracle
    reproduces the weights exactly; log-ratio is computed divide-then-log
    in the identical order on both sides. At 10^10 docs the count pass is
    one column-pruned scan + a B-row exchange; the score pass is
    broadcast-lookup — no all-to-all on gram keys."""
    from ray.data.aggregate import Sum

    B = int(num_buckets)
    key = (sf_dir, target_lang, B)
    stamp = _documents_stamp(sf_dir)
    hit = _DSIR_CACHE.get(key)
    if hit is not None and hit[0] == stamp:
        return hit[1].copy()
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    hist = (
        ds.map_batches(
            _GramBucketCounter(target_lang, B), batch_format="pandas"
        )
        .groupby("bucket")
        .aggregate(Sum("n_t", alias_name="n_t"), Sum("n_all", alias_name="n_all"))
        .to_pandas()
    )
    n_t = np.zeros(B, dtype=np.int64)
    n_all = np.zeros(B, dtype=np.int64)
    if len(hist):
        idx = hist["bucket"].to_numpy()
        n_t[idx] = hist["n_t"].to_numpy()
        n_all[idx] = hist["n_all"].to_numpy()
    tt = float(n_t.sum())
    ta = float(n_all.sum())
    lr = np.log((n_t + 1.0) / (tt + B)) - np.log((n_all + 1.0) / (ta + B))
    out = (
        ds.map_batches(_DsirScorer(lr, B), batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    _DSIR_CACHE[key] = (stamp, out)
    return out.copy()


def dsir_resample(sf_dir: str, frac: float = 0.25, target_lang: str = "en",
                  num_buckets: int = 4096) -> pd.DataFrame:
    """DSIR selection step: keep the top ``ceil(frac·n)`` documents by
    importance weight (ties broken by doc_id — duplicate texts carry
    exactly equal weights, so the tiebreak is load-bearing). Operates on
    the weight table (16 bytes/doc metadata, not the corpus); at 10^10
    docs the same selection runs as a weight-threshold filter computed by
    the bounded-histogram quantile machinery (`price_percentiles` shape)
    instead of a driver sort."""
    import math

    w = dsir_importance_weights(
        sf_dir, target_lang=target_lang, num_buckets=num_buckets
    )
    k = math.ceil(frac * len(w))
    sel = w.sort_values(
        ["weight", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return (
        sel[["doc_id", "weight"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
