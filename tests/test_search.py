"""Inverted token index + conjunctive/ranked search.

Results verified brute-force against a pandas tokenization of the corpus;
the index property under test is read PRUNING (only the queried terms'
bucket directories are opened) — results must be identical to a full scan.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _brute_postings() -> pd.DataFrame:
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    rows = []
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks = re.findall(r"\S+", (text or "").lower())
        vc = pd.Series(toks).value_counts()
        for t, n in vc.items():
            rows.append((did, t, int(n)))
    return pd.DataFrame(rows, columns=["doc_id", "term", "tf"])


@pytest.fixture(scope="module")
def postings():
    return _brute_postings()


def test_conjunctive_matches_brute_force(ray_session, postings):
    from sonic_etl_ray.functions.search import search_docs

    terms = ("spark", "window")
    got = search_docs(SF, terms)
    per_doc = postings[postings["term"].isin(terms)].groupby("doc_id")["term"].nunique()
    want = sorted(per_doc[per_doc == len(terms)].index.tolist())
    assert got["doc_id"].tolist() == want
    assert len(want) > 0  # non-degenerate at this sf


def test_conjunctive_absent_term_is_empty(ray_session):
    from sonic_etl_ray.functions.search import search_docs

    got = search_docs(SF, ("spark", "zz_never_a_token_zz"))
    assert len(got) == 0
    assert list(got.columns) == ["doc_id"]


def test_ranked_matches_brute_force(ray_session, postings):
    from sonic_etl_ray.functions.search import search_ranked

    terms = ("spark", "dup", "hash")
    k = 15
    got = search_ranked(SF, terms, k=k)

    n_docs = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    sub = postings[postings["term"].isin(terms)].copy()
    df = sub.groupby("term")["doc_id"].nunique()
    w = {t: 1 + (int((n_docs + 1) // (int(d) + 1)).bit_length() - 1) for t, d in df.items()}
    sub["score"] = sub["tf"] * sub["term"].map(w)
    want = (
        sub.groupby("doc_id")["score"]
        .sum()
        .reset_index()
        .sort_values(["score", "doc_id"], ascending=[False, True], kind="stable")
        .head(k)
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score"].tolist() == want["score"].astype("int64").tolist()
    assert got["score"].nunique() > 1  # ranking is non-degenerate


def test_query_reads_only_term_buckets(ray_session):
    """The pruning claim: the posting paths for a query cover exactly the
    buckets its terms hash to — a strict subset of the index."""
    from sonic_etl_ray.functions.search import (
        NUM_BUCKETS,
        _ensure_index,
        _term_posting_paths,
    )
    from sonic_etl_ray.functions.text import md5_u64

    index_dir = _ensure_index(SF)
    terms = ["spark", "window"]
    paths = _term_posting_paths(index_dir, terms)
    want_buckets = {int(h % np.uint64(NUM_BUCKETS)) for h in md5_u64([f"tok:{t}" for t in terms])}
    got_buckets = {int(p.split("bucket=")[1].split(os.sep)[0]) for p in paths}
    assert got_buckets == want_buckets
    all_buckets = {
        int(d.split("=")[1])
        for d in os.listdir(index_dir)
        if d.startswith("bucket=")
    }
    assert got_buckets < all_buckets  # strictly fewer than the whole index


def test_index_is_cached_and_complete(ray_session, postings):
    """Second _ensure_index call reuses the published dir (no rebuild), and
    the index's posting rows equal the brute-force tokenization exactly."""
    from sonic_etl_ray.functions.search import _ensure_index

    d1 = _ensure_index(SF)
    stamp = os.stat(os.path.join(d1, "_INDEX_READY")).st_mtime_ns
    d2 = _ensure_index(SF)
    assert d1 == d2
    assert os.stat(os.path.join(d2, "_INDEX_READY")).st_mtime_ns == stamp

    meta = json.load(open(os.path.join(d1, "meta.json")))
    assert meta["n_docs"] == pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows

    import glob

    files = glob.glob(os.path.join(d1, "bucket=*", "*.parquet"))
    got = (
        pd.concat([pq.read_table(f, columns=["term", "doc_id", "tf"]).to_pandas() for f in files])
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    want = postings.sort_values(["doc_id", "term"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "term", "tf"]].astype({"tf": "int64"}),
        want[["doc_id", "term", "tf"]].astype({"tf": "int64"}),
    )
