"""Deterministic split / stratified-sample / vocab operators."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from sonic_etl_ray.functions.sampling import (
    assign_splits,
    stratified_sample,
    vocab_topk,
)

SF = "/root/testdata/sf0.001"


def test_split_proportions_and_stability():
    ids = pd.DataFrame({"doc_id": np.arange(10_000, dtype=np.int64)})
    out = assign_splits(ray.data.from_pandas(ids)).to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert 0.88 < frac["train"] < 0.92
    assert 0.03 < frac["val"] < 0.07
    assert 0.03 < frac["test"] < 0.07
    # content-stable: a row's split never moves when the corpus shrinks
    sub = assign_splits(ray.data.from_pandas(ids.head(100))).to_pandas()
    merged = sub.merge(out, on="doc_id", suffixes=("_sub", "_full"))
    assert (merged["split_sub"] == merged["split_full"]).all()


def test_stratified_sample_per_stratum_independent():
    df = pd.DataFrame(
        {
            "doc_id": np.arange(5_000, dtype=np.int64),
            "lang": np.where(np.arange(5_000) % 10 == 0, "rare", "common"),
        }
    )
    out = stratified_sample(ray.data.from_pandas(df), pct=20).to_pandas()
    by = out.groupby("lang").size()
    n_rare, n_common = 500, 4_500
    assert 0.12 < by["rare"] / n_rare < 0.28  # ~20% of the small stratum too
    assert 0.17 < by["common"] / n_common < 0.23
    # dropping the other stratum entirely must not move this stratum's sample
    only_rare = df[df["lang"] == "rare"]
    out2 = stratified_sample(ray.data.from_pandas(only_rare), pct=20).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out[out["lang"] == "rare"]["doc_id"])


def test_vocab_topk_matches_bruteforce():
    import pyarrow.parquet as pq

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    counts = texts["text"].str.findall(r"\S+").explode().dropna().value_counts()
    brute = (
        counts.rename_axis("token")
        .reset_index(name="n")
        .sort_values(["n", "token"], ascending=[False, True], kind="stable")
        .head(50)
        .reset_index(drop=True)
    )
    got = vocab_topk(SF, k=50)
    pd.testing.assert_frame_equal(
        got, brute.astype({"n": "int64"}), check_dtype=False
    )


def test_reservoir_sample_matches_brute_force(ray_session):
    import hashlib

    import pyarrow.parquet as pq2

    from sonic_etl_ray.functions.sampling import reservoir_sample_docs

    sf = "/root/testdata/sf0.001"
    k = 40
    got = reservoir_sample_docs(sf, k=k)
    docs = pq2.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "lang"]
    ).to_pandas()

    def pri(i):
        return int.from_bytes(hashlib.md5(f"rsv:{i}".encode()).digest()[8:], "little")

    docs["p"] = docs["doc_id"].map(pri)
    want = (
        docs.nsmallest(k, "p")
        .drop(columns="p")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == k


def test_reservoir_sample_stable_under_partitioning(ray_session):
    """Same winners whatever the block layout — the property that lets any
    node evaluate its blocks independently."""
    import ray.data

    from sonic_etl_ray.functions.sampling import reservoir_sample

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "lang"])
    a = reservoir_sample(ds, k=10).to_pandas().nsmallest(10, "__pri")
    b = (
        reservoir_sample(ds.repartition(7), k=10)
        .to_pandas()
        .nsmallest(10, "__pri")
    )
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_mixture_by_token_budget_matches_brute_force(ray_session):
    import hashlib
    import re

    import pyarrow.parquet as pq2

    from sonic_etl_ray.functions.sampling import mixture_by_token_budget

    sf = "/root/testdata/sf0.001"
    got = mixture_by_token_budget(sf)
    docs = pq2.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pandas()
    docs["toks"] = docs["text"].map(lambda t: len(re.findall(r"\S+", t or "")))
    tok = docs.groupby("source")["toks"].sum()
    w = {s: 1 + int(s[3:]) % 3 for s in tok.index}
    total = int(tok.sum())
    budget, sw = total // 3, sum(w.values())
    rate = {s: min(1000, (budget * w[s] * 1000) // (sw * int(t))) for s, t in tok.items()}

    def h(s, i):
        return int.from_bytes(
            hashlib.md5(f"mix:{s}:{i}".encode()).digest()[8:], "little"
        )

    keep = docs.apply(lambda r: h(r["source"], r["doc_id"]) % 1000 < rate[r["source"]], axis=1)
    want = (
        docs.loc[keep, ["doc_id", "source"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # the budget actually bites: kept tokens land within [50%, 110%] of it
    kept_toks = int(docs.loc[keep, "toks"].sum())
    assert 0.5 * budget <= kept_toks <= 1.1 * budget


def test_mixture_respects_weights(ray_session):
    """Higher-weight sources keep proportionally more of their tokens."""
    from sonic_etl_ray.functions.sampling import mixture_by_token_budget

    sf = "/root/testdata/sf0.01"
    got = mixture_by_token_budget(sf)
    kept = got.groupby("source").size()
    # weights cycle 1,2,3 by source number; average kept-count of weight-3
    # sources must exceed weight-1 sources (uniform source sizes)
    w = {s: 1 + int(s[3:]) % 3 for s in kept.index}
    by_w = {}
    for s, n in kept.items():
        by_w.setdefault(w[s], []).append(n)
    assert np.mean(by_w[3]) > np.mean(by_w[1])


def test_grouped_split_no_leakage(ray_session):
    """Every group maps to exactly one split; per-row coverage intact and
    the grouped assignment is stable under adding other groups."""
    from sonic_etl_ray.functions.sampling import assign_splits

    df = pd.DataFrame(
        {
            "doc_id": np.arange(3_000, dtype=np.int64),
            "source": [f"src{i % 37}" for i in range(3_000)],
        }
    )
    got = assign_splits(ray.data.from_pandas(df), group_col="source").to_pandas()
    assert len(got) == len(df)
    per_src = got.groupby("source")["split"].nunique()
    assert (per_src == 1).all()
    assert set(got["split"]) <= {"train", "val", "test"}
    # content-stable: restricting to a subset of groups moves nothing
    sub = df[df["source"].isin([f"src{i}" for i in range(5)])]
    got2 = assign_splits(ray.data.from_pandas(sub), group_col="source").to_pandas()
    m = got.set_index("doc_id")["split"]
    assert (got2.set_index("doc_id")["split"] == m.loc[got2["doc_id"]].to_numpy()).all()
