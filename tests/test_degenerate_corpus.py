"""Degenerate-input robustness: tiny corpus, zero-result paths.

A 12-doc / 8-vector / 120-event truncation of the test tables drives every
zero-result code path at once: no near-dup pair exists anywhere (empty
candidate sets through bands, joins, and verify), token totals fit in one
shard, and no event reaches the schema-evolution LSN cut. Round-5 sweep
found 10 of 127 queries crashing on this shape — all the same hazard
family (empty Ray blocks/datasets losing their schema): schema-less empty
sort blocks in the token-shard prefix sums, schema-less empty JOIN sides
(left-side crash inside Ray's hash-join aggregators), columnless
``to_pandas`` frames, and the never-observed evolved column. These are the
shapes a real CDC pipeline hits on quiet days, not exotica.
"""
from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.001"

FORMERLY_CRASHING = [
    "minhash_lsh_dedup",
    "near_dup_clusters",
    "near_dup_keep_best",
    "ngram_jaccard_pairs",
    "dedup_incremental_fuzzy",
    "pack_sequences",
    "token_shards",
    "prep_corpus_full",
    "cdc_schema_evolution",
    "cdc_nested_evolution",
]


@pytest.fixture(scope="module")
def sfmin(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sfmin"))
    for t, n in [("documents", 12), ("embeddings", 8), ("events", 120)]:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(tbl.slice(0, n), f"{dst}/{t}.parquet")
    for side in "region nation customer supplier part orders lineitem".split():
        os.symlink(f"{SRC}/{side}.parquet", f"{dst}/{side}.parquet")
    return dst


FORMERLY_CRASHING_AT_ONE = [
    # the n=1 shape (single doc/vector, 2 events) additionally empties the
    # index base, the %97 key sample, every decoded table but one, the
    # error channel, asof/range anchors, the mixture gate, and strata
    "embedding_lsh_indexed_extended",
    "embedding_ivf_indexed_extended",
    "cdc_point_lookup",
    "cdc_split_decoded_tables",
    "cdc_error_channel",
    "asof_join_last_signup",
    "attribution_range_join",
    "mixture_by_token_budget",
    "stratified_sample",
    "cdc_indexed_value_scan",
]


@pytest.fixture(scope="module")
def sfone(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sfone"))
    for t, n in [("documents", 1), ("embeddings", 1), ("events", 2)]:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(tbl.slice(0, n), f"{dst}/{t}.parquet")
    for side in "region nation customer supplier part orders lineitem".split():
        os.symlink(f"{SRC}/{side}.parquet", f"{dst}/{side}.parquet")
    return dst


@pytest.mark.parametrize("name", FORMERLY_CRASHING)
def test_degenerate_corpus_query_survives(sfmin, name):
    import __ray_entry__ as entry

    out = entry.queries()[name](sfmin)
    n = len(out) if hasattr(out, "__len__") else out.count()
    assert n >= 0  # no crash, a countable result
    # zero-pair dedup queries must come back with their TYPED empty schema
    if name in ("minhash_lsh_dedup", "ngram_jaccard_pairs"):
        assert list(out.columns) == ["doc_a", "doc_b", "jaccard"]


@pytest.mark.parametrize("name", FORMERLY_CRASHING_AT_ONE)
def test_single_row_corpus_query_survives(sfone, name):
    import __ray_entry__ as entry

    out = entry.queries()[name](sfone)
    n = len(out) if hasattr(out, "__len__") else out.count()
    assert n >= 0
