"""Text analysis stages for training-data pipelines over `documents`.

Actor-pool ``map_batches`` stages with per-actor compiled state — the ST1
pattern (``ErcEventCatalog`` built once per worker,
``events/erc.rs:13-180``): regexes compiled and stopword/ngram tables built
in ``__init__``, vectorized work in ``__call__``.

Ops: token counting (regex \\S+, SQL-parity semantics), quality scoring
(char/token stats + stopword ratio), language-ID (stopword + n-gram
heuristic), rolling-hash document fingerprinting.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data

STOPWORDS_EN = ("the", "a", "and", "of", "to")
TOKEN_RE = r"\S+"

# Tiny per-language stopword catalogs for the heuristic language-ID stage.
_LANG_MARKERS = {
    "en": {"the", "a", "and", "of", "to", "is", "in"},
    "de": {"der", "die", "das", "und", "nicht", "ist"},
    "fr": {"le", "la", "et", "les", "des", "est"},
    "es": {"el", "la", "los", "y", "es", "de"},
}

_FP_BASE = np.uint64(1099511628211)
_FP_OFFSET = np.uint64(14695981039346656037)


class TokenCounter:
    """n_tokens per doc; tokens = maximal runs of non-whitespace (\\S+)."""

    def __init__(self):
        self.pat = re.compile(TOKEN_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["text"].str.count(TOKEN_RE).fillna(0).astype("int64")
        return pd.DataFrame({"doc_id": batch["doc_id"], "n_tokens": n})


class QualityScorer:
    """Length / token / stopword-ratio quality features.

    Columns (SQL-parity semantics; see ``__ray_entry__.oracle_sql``):
      n_chars, n_tokens, stop_ratio = en-stopword tokens / tokens.
    """

    def __init__(self):
        self.stop = set(STOPWORDS_EN)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        n_chars = text.str.len().astype("int64")
        toks = text.str.findall(TOKEN_RE)
        n_tokens = toks.map(len).astype("int64")
        n_stop = toks.map(lambda ws: sum(1 for w in ws if w in self.stop)).astype("int64")
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
    'und' when nothing matches. Deterministic tie-break by language code."""

    def __init__(self):
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}
        self.order = sorted(self.markers)

    def _score(self, tokens: list[str]) -> str:
        best, best_n = "und", 0
        for lang in self.order:
            n = sum(1 for t in tokens if t in self.markers[lang])
            if n > best_n:
                best, best_n = lang, n
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(TOKEN_RE)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "lang_pred": toks.map(self._score)}
        )


class Fingerprinter:
    """64-bit rolling (FNV-style polynomial) fingerprint of the token stream.

    Deterministic and order-sensitive — the document-identity analog of the
    reference's per-row content invariants. Vectorized per token via numpy
    (wrap-around uint64 arithmetic).
    """

    def __init__(self):
        self.pat = re.compile(TOKEN_RE)

    @staticmethod
    def fingerprint(text: str) -> int:
        h = int(_FP_OFFSET)
        base = int(_FP_BASE)
        for tok in re.findall(TOKEN_RE, text):
            h = (h * base + hash_token(tok)) & 0xFFFFFFFFFFFFFFFF  # wraparound intended
        return h

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        fps = batch["text"].map(self.fingerprint).astype("uint64")
        return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": fps})


def hash_token(tok: str) -> int:
    """Stable per-token 64-bit hash (FNV-1a over utf-8 bytes)."""
    h = 14695981039346656037
    for b in tok.encode("utf-8"):
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


class BpeishTokenizer:
    """BPE-ish pre-tokenization: letter runs / digit runs / punctuation runs
    (the GPT-2-style pre-split, simplified to a pattern both Python re and
    RE2 execute identically so the DuckDB oracle can mirror it)."""

    def __init__(self):
        self.pat = re.compile(BPE_PATTERN)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["text"].str.count(BPE_PATTERN).fillna(0).astype("int64")
        return pd.DataFrame({"doc_id": batch["doc_id"], "n_bpe_tokens": n})


def bpe_token_counts(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(BpeishTokenizer, batch_format="pandas", concurrency=(1, 4)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def token_counts(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(TokenCounter, batch_format="pandas", concurrency=(1, 4)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_quality(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(QualityScorer, batch_format="pandas", concurrency=(1, 4)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def lang_id(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(LangId, batch_format="pandas", concurrency=(1, 4)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_fingerprints(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(Fingerprinter, batch_format="pandas", concurrency=(1, 4)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)
