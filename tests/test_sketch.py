"""Sketch operators: HLL registers/estimate, Bloom semi-join, range join.

Exactness claims verified brute-force; accuracy claims (the only
approximate part) verified against exact distinct counts at a scale where
the raw HLL estimator is in-regime (n ≳ 2.5·m).
"""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_hll_hash_and_rho_match_reference():
    from sonic_etl_ray.functions.sketch import (
        HLL_RHO_MAX,
        HLL_TAIL_BITS,
        _hll_partial,
    )

    vals = pd.Series([0, 1, 12345, 99999999, -7])
    batch = pd.DataFrame({"g": ["x"] * len(vals), "v": vals})
    out = _hll_partial(batch, "g", "v")
    # independent per-row reference: md5 → top bits bucket, tail bit_length
    regs: dict[int, int] = {}
    for v in vals:
        h = int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big")
        bucket = h >> HLL_TAIL_BITS
        tail = h & ((1 << HLL_TAIL_BITS) - 1)
        rho = HLL_RHO_MAX - tail.bit_length() if tail else HLL_RHO_MAX
        regs[bucket] = max(regs.get(bucket, 0), rho)
    got = dict(zip(out["bucket"], out["max_rho"]))
    assert got == regs


def test_hll_registers_merge_equals_single_pass():
    """Mergeability: sketch(A ∪ B) == max-merge(sketch(A), sketch(B))."""
    from sonic_etl_ray.functions.sketch import _hll_partial

    rng = np.random.default_rng(7)
    a = pd.DataFrame({"g": "k", "v": rng.integers(0, 10_000, 5_000)})
    b = pd.DataFrame({"g": "k", "v": rng.integers(5_000, 20_000, 5_000)})
    whole = _hll_partial(pd.concat([a, b]), "g", "v")
    merged = (
        pd.concat([_hll_partial(a, "g", "v"), _hll_partial(b, "g", "v")])
        .groupby(["g", "bucket"], as_index=False)["max_rho"]
        .max()
    )
    assert whole.sort_values("bucket").reset_index(drop=True).equals(
        merged.sort_values("bucket").reset_index(drop=True)
    )


def test_hll_estimate_accuracy_in_regime():
    """At sf0.01 each return flag has ~2000 distinct partkeys with m=128
    registers (n/m ≈ 15 — raw-estimator regime): expect ≤15% error, well
    inside 3σ of the 1.04/√m ≈ 9.2% standard error."""
    from sonic_etl_ray.functions.sketch import hll_distinct_parts

    est = hll_distinct_parts(SF01).set_index("l_returnflag")["est_distinct"]
    exact = (
        duckdb.sql(
            f"SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS d "
            f"FROM '{SF01}/lineitem.parquet' GROUP BY 1"
        )
        .df()
        .set_index("l_returnflag")["d"]
    )
    for flag in exact.index:
        rel = abs(int(est[flag]) - int(exact[flag])) / int(exact[flag])
        assert rel < 0.15, (flag, int(est[flag]), int(exact[flag]))


def test_bloom_no_false_negatives_and_prunes():
    from sonic_etl_ray.functions.sketch import _bloom_positions, BLOOM_BITS

    rng = np.random.default_rng(3)
    members = rng.choice(1 << 40, 2_000, replace=False)
    others = members + 1  # disjoint by construction (choice w/o replace on evens not guaranteed; filter)
    others = np.setdiff1d(others, members)
    bits = np.zeros(BLOOM_BITS, dtype=bool)
    bits[_bloom_positions(members).ravel()] = True
    assert bits[_bloom_positions(members)].all(axis=0).all()  # zero false negatives
    fp = bits[_bloom_positions(others)].all(axis=0).mean()
    assert fp < 0.05  # 2k keys in 128k bits, k=4 → expected ≪ 1%


def test_bloom_semijoin_matches_duckdb():
    from sonic_etl_ray.functions.sketch import bloom_semijoin_revenue

    got = bloom_semijoin_revenue(SF)
    want = duckdb.sql(
        f"""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM '{SF}/orders.parquet'
        WHERE o_custkey IN (SELECT c_custkey FROM '{SF}/customer.parquet'
                            WHERE c_mktsegment='BUILDING')
        GROUP BY 1 ORDER BY 1"""
    ).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_range_join_matches_duckdb():
    from sonic_etl_ray.pipelines.relational import attribution_range_join

    got = attribution_range_join(SF)
    want = duckdb.sql(
        f"""
        SELECT p.event_id, p.user_id,
               CAST(COUNT(e.event_id) AS BIGINT) AS n_touches,
               CAST(COALESCE(SUM(CAST(ROUND(e.value*100) AS BIGINT)), 0) AS BIGINT) AS touch_cents
        FROM '{SF}/events.parquet' p
        LEFT JOIN '{SF}/events.parquet' e
          ON e.user_id = p.user_id AND e.event_type IN ('view','click')
         AND e.ts >= p.ts - INTERVAL 30 MINUTE AND e.ts < p.ts
        WHERE p.event_type = 'purchase' GROUP BY 1,2 ORDER BY 1"""
    ).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].reset_index(drop=True),
        want[sorted(want.columns)].reset_index(drop=True),
        check_dtype=False,
    )


def test_range_join_boundary_semantics():
    """Half-open window: a touch exactly at anchor−window is included, a
    touch exactly at the anchor timestamp is excluded."""
    from sonic_etl_ray.pipelines.relational import attribution_range_join  # noqa: F401  (import parity)
    import numpy as np

    # direct check of the sweep math on a synthetic group
    s_ts = np.array(["2024-01-01T00:00:00", "2024-01-01T00:30:00"], dtype="datetime64[us]")
    a_ts = np.array(["2024-01-01T00:30:00"], dtype="datetime64[us]")
    win = np.timedelta64(30 * 60, "s")
    lo = np.searchsorted(s_ts, a_ts - win, side="left")
    hi = np.searchsorted(s_ts, a_ts, side="left")
    assert (hi - lo).tolist() == [1]  # 00:00 in, 00:30 (== anchor) out


def test_rollup_matches_duckdb():
    from sonic_etl_ray.pipelines.relational import rollup_revenue

    got = rollup_revenue(SF)
    want = duckdb.sql(
        f"""
        SELECT COALESCE(c_mktsegment,'ALL') AS c_mktsegment,
               COALESCE(o_orderpriority,'ALL') AS o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM '{SF}/orders.parquet' JOIN '{SF}/customer.parquet' ON o_custkey = c_custkey
        GROUP BY ROLLUP (c_mktsegment, o_orderpriority) ORDER BY 1, 2"""
    ).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].reset_index(drop=True),
        want[sorted(want.columns)].reset_index(drop=True),
        check_dtype=False,
    )


def test_rollup_levels_are_consistent():
    from sonic_etl_ray.pipelines.relational import rollup_revenue

    out = rollup_revenue(SF)
    fine = out[(out.c_mktsegment != "ALL") & (out.o_orderpriority != "ALL")]
    seg = out[(out.c_mktsegment != "ALL") & (out.o_orderpriority == "ALL")]
    tot = out[(out.c_mktsegment == "ALL")]
    assert len(tot) == 1
    assert fine["n_orders"].sum() == tot["n_orders"].iloc[0]
    assert seg["revenue_cents"].sum() == tot["revenue_cents"].iloc[0]


def test_interdoc_ngram_dup_matches_bruteforce():
    from sonic_etl_ray.functions.text import interdoc_ngram_dup
    import re
    import pyarrow.parquet as pq
    from collections import Counter

    got = interdoc_ngram_dup(SF).set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    per_doc: dict[int, list[str]] = {}
    totals: Counter = Counter()
    for _, r in docs.iterrows():
        t = re.sub(r"\s+", " ", r["text"] or "").split(" ")
        ngs = [" ".join(t[i : i + 3]) for i in range(len(t) - 2)]
        per_doc[r["doc_id"]] = ngs
        totals.update(ngs)
    for doc_id, ngs in per_doc.items():
        if not ngs:
            assert doc_id not in got.index
            continue
        dup = sum(1 for g in ngs if totals[g] >= 2)
        assert got.loc[doc_id, "n_ngrams"] == len(ngs)
        assert got.loc[doc_id, "dup_ngrams"] == dup, doc_id


def test_cms_one_sided_and_tight_for_heavy_hitters():
    """CMS guarantee: est ≥ true count for every token; for the corpus's
    heavy hitters the 4×1024 sketch should be near-exact at this scale."""
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from sonic_etl_ray.functions.sketch import cms_token_freq

    got = cms_token_freq(SF, probe_every=50).set_index("token")["est_count"]
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    true = Counter()
    for t in docs["text"]:
        true.update(re.sub(r"\s+", " ", t or "").split(" "))
    assert len(got) > 10
    for tok, est in got.items():
        assert est >= true[tok], tok  # one-sided error, always
    heavy = [t for t, c in true.most_common(10) if t in got.index]
    assert heavy
    for t in heavy:
        assert got[t] <= true[t] * 1.5 + 50  # collisions stay small


def test_cms_partials_are_additive():
    from sonic_etl_ray.functions.sketch import _cms_partial
    import pandas as pd

    a = pd.DataFrame({"text": ["x y x", "z"]})
    b = pd.DataFrame({"text": ["x q"]})
    whole = _cms_partial(pd.concat([a, b], ignore_index=True), "text")
    merged = (
        pd.concat([_cms_partial(a, "text"), _cms_partial(b, "text")])
        .groupby(["row", "bucket"], as_index=False)["cnt"]
        .sum()
    )
    w = whole.sort_values(["row", "bucket"]).reset_index(drop=True)
    m = merged.sort_values(["row", "bucket"]).reset_index(drop=True)
    assert w.equals(m)


def test_lsh_indexed_equals_filter_path(tmp_path):
    import os

    from sonic_etl_ray.functions.similarity import (
        _index_cache_dir,
        lsh_topk,
        lsh_topk_indexed,
    )

    a = lsh_topk(SF)
    b = lsh_topk_indexed(SF)  # builds into the deterministic on-disk cache
    idx = _index_cache_dir("lsh", SF, 8, 13)
    assert os.path.exists(os.path.join(idx, "_INDEX_READY"))
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True), check_dtype=False
    )
    # the index prunes at the directory level: probe reads one bucket dir
    buckets = [d for d in os.listdir(idx) if d.startswith("bucket=")]
    assert len(buckets) > 1  # layout actually split the corpus


def test_ivf_indexed_equals_filter_path(tmp_path):
    import os

    from sonic_etl_ray.functions.similarity import (
        _index_cache_dir,
        ivf_topk,
        ivf_topk_indexed,
    )

    idx = _index_cache_dir("ivf", SF, 4)
    a = ivf_topk(SF, n_clusters=4, n_probe=2)
    b = ivf_topk_indexed(SF, n_clusters=4, n_probe=2)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True), check_dtype=False
    )
    clusters = [d for d in os.listdir(idx) if d.startswith("cluster=")]
    assert len(clusters) > 1


def test_index_cache_invalidates_on_source_change(tmp_path):
    """The on-disk ANN index cache keys on the source file's mtime+size, so
    a lake mutated in place gets a fresh index dir rather than stale results."""
    import os
    import shutil

    from sonic_etl_ray.functions.similarity import _index_cache_dir

    sf_copy = tmp_path / "sf"
    sf_copy.mkdir()
    shutil.copy(os.path.join(SF, "embeddings.parquet"), sf_copy / "embeddings.parquet")
    before = _index_cache_dir("lsh", str(sf_copy), 8, 13)
    os.utime(sf_copy / "embeddings.parquet", ns=(1, 1))
    after = _index_cache_dir("lsh", str(sf_copy), 8, 13)
    assert before != after


def test_pivot_matches_duckdb_and_is_dense():
    from sonic_etl_ray.pipelines.relational import pivot_orders_by_priority

    got = pivot_orders_by_priority(SF)
    want = duckdb.sql(
        f"""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
               COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS p1_urgent,
               COUNT(*) FILTER (o_orderpriority = '5-LOW') AS p5_low
        FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()
    assert got["year"].tolist() == want["year"].tolist()
    assert got["p1_urgent"].tolist() == want["p1_urgent"].tolist()
    assert got["p5_low"].tolist() == want["p5_low"].tolist()
    # wide shape: every (year, priority) cell present, zero-filled
    assert got.shape[1] == 6 and not got.isna().any().any()


def test_balance_moments_mergeable_and_exact():
    import pyarrow.parquet as pq

    from sonic_etl_ray.pipelines.relational import balance_moments

    got = balance_moments(SF).set_index("c_nationkey")
    df = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
    ).to_pandas()
    cents = np.round(df["c_acctbal"].to_numpy() * 100.0).astype(np.int64)
    df = df.assign(c=cents, c2=cents * cents)
    ref = df.groupby("c_nationkey").agg(n=("c", "size"), s=("c", "sum"), s2=("c2", "sum"))
    for k, row in ref.iterrows():
        assert got.loc[k, "n"] == row["n"]
        assert got.loc[k, "sum_cents"] == row["s"]
        assert got.loc[k, "sumsq_cents"] == row["s2"]
        # variance derivable downstream from the exact triple
        var = row["s2"] / row["n"] - (row["s"] / row["n"]) ** 2
        assert var >= 0


def test_normalize_text_semantics():
    from sonic_etl_ray.functions.text import normalize_text

    out = normalize_text(SF)
    assert (out["clean_text"].str.contains("  ", regex=False) == False).all()  # noqa: E712
    assert (out["clean_text"] == out["clean_text"].str.lower()).all()
    assert (out["chars_removed"] >= 0).all()
    assert (out["n_chars"] == out["clean_text"].str.len()).all()


def test_kll_exact_config_matches_numpy():
    """k >= n: no compaction fires, every quantile equals the exact
    quantile_disc order statistic (rank ceil(q*n)-1 of the sorted values)."""
    import numpy as np

    from sonic_etl_ray.functions.sketch import KllSketch

    rng = np.random.default_rng(3)
    vals = rng.normal(100.0, 25.0, size=5_000)
    sk = KllSketch(k=10_000)
    sk.update_many(vals)
    s = np.sort(vals)
    for q in (0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0):
        rank = max(int(np.ceil(q * len(s))) - 1, 0)
        assert sk.quantile(q) == s[rank], q


def test_kll_compacted_rank_error_and_memory():
    """k=200 over 200k values: every reported quantile's true rank is
    within 2% of the requested rank, total retained items stay O(k·levels),
    and the same input stream yields a bit-identical sketch (deterministic
    compaction coin)."""
    import numpy as np

    from sonic_etl_ray.functions.sketch import KllSketch

    rng = np.random.default_rng(11)
    vals = rng.exponential(10.0, size=200_000)
    def build():
        sk = KllSketch(k=200)
        for chunk in np.array_split(vals, 37):
            sk.update_many(chunk)
        return sk
    sk, sk2 = build(), build()
    assert [a.tolist() for a in sk.levels] == [a.tolist() for a in sk2.levels]
    retained = sum(a.size for a in sk.levels)
    assert retained <= 200 * len(sk.levels) * 3  # O(k) per level, geometric below top
    assert sk.n == len(vals)
    s = np.sort(vals)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = sk.quantile(q)
        true_rank = np.searchsorted(s, est, side="right") / len(s)
        assert abs(true_rank - q) < 0.02, (q, true_rank)


def test_kll_merge_equivalent_to_single_stream():
    """Merging per-chunk sketches answers within the same rank-error bound
    as one sketch over the whole stream — the per-batch-partial contract
    the Ray pipeline relies on."""
    import numpy as np

    from sonic_etl_ray.functions.sketch import KllSketch

    rng = np.random.default_rng(23)
    vals = rng.uniform(0.0, 1000.0, size=120_000)
    merged = KllSketch(k=200)
    for chunk in np.array_split(vals, 16):
        part = KllSketch(k=200)
        part.update_many(chunk)
        merged.merge(part)
    assert merged.n == len(vals)
    s = np.sort(vals)
    for q in (0.25, 0.5, 0.75, 0.95):
        est = merged.quantile(q)
        true_rank = np.searchsorted(s, est, side="right") / len(s)
        assert abs(true_rank - q) < 0.03, (q, true_rank)


def test_kll_roundtrip_and_nan_handling():
    """to_table/from_rows round-trips the level structure; NaNs are dropped
    on update (parquet nulls arrive as NaN through float64 casts)."""
    import numpy as np

    from sonic_etl_ray.functions.sketch import KllSketch

    sk = KllSketch(k=64)
    sk.update_many(np.array([5.0, np.nan, 1.0, 3.0, np.nan]))
    assert sk.n == 3
    t = sk.to_table()
    back = KllSketch.from_rows(
        t.column("level").to_numpy(), t.column("value").to_numpy(), 64
    )
    assert back.n == 3 and back.quantile(0.5) == sk.quantile(0.5) == 3.0


# --------------------------------------------------------------- Misra-Gries


def test_mg_exact_recall_matches_brute_force(ray_session):
    import re

    import pyarrow.parquet as pq2

    from sonic_etl_ray.functions.sketch import heavy_hitter_tokens

    sf = "/root/testdata/sf0.001"
    got = heavy_hitter_tokens(sf, phi_den=100)
    docs = pq2.read_table(f"{sf}/documents.parquet", columns=["text"]).to_pandas()
    toks = [t for txt in docs["text"].dropna() for t in re.findall(r"\S+", txt)]
    vc = pd.Series(toks).value_counts()
    n = int(vc.sum())
    want = vc[vc * 100 >= n].reset_index()
    want.columns = ["token", "est_count"]
    want = want.sort_values(
        ["est_count", "token"], ascending=[False, True], kind="stable"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want.astype({"est_count": "int64"}), check_dtype=False
    )
    assert len(got) > 0


def test_mg_error_bound_holds_at_small_capacity(ray_session):
    """The approximate regime: capacity far below the vocabulary. MG
    guarantees true - n/(m+1) <= est <= true for every retained token —
    verified against brute-force truth end-to-end through the distributed
    partial -> groupby merge -> final compress path."""
    import re

    import pyarrow.parquet as pq2
    import ray.data

    from sonic_etl_ray.functions.sketch import mg_summary

    sf = "/root/testdata/sf0.001"
    m = 4
    ds = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    summary, n = mg_summary(ds, capacity=m)
    assert len(summary) <= m
    docs = pq2.read_table(f"{sf}/documents.parquet", columns=["text"]).to_pandas()
    toks = [t for txt in docs["text"].dropna() for t in re.findall(r"\S+", txt)]
    truth = pd.Series(toks).value_counts()
    assert n == int(truth.sum())
    # distributed merge inflates the subtracted mass vs a sequential pass,
    # but never past n/(m+1) per merge level; the end-to-end bound below is
    # the mergeable-summaries theorem (sum of decrements <= n/(m+1))
    for tok, est in zip(summary["token"], summary["est_count"]):
        true = int(truth.get(tok, 0))
        assert est <= true, (tok, est, true)
        assert true - est <= n // (m + 1) + 1, (tok, est, true, n)


def test_mg_compress_unit():
    from sonic_etl_ray.functions.sketch import _mg_compress

    toks = np.array(["a", "b", "c", "d"], dtype=object)
    cnts = np.array([10, 7, 3, 2], dtype=np.int64)
    t, c = _mg_compress(toks, cnts, 2)
    # pivot = 3 (3rd largest): a->7, b->4, c/d dropped
    assert list(t) == ["a", "b"] and list(c) == [7, 4]
    t, c = _mg_compress(toks, cnts, 10)
    assert list(t) == list(toks) and list(c) == list(cnts)
