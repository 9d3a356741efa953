"""Driver-contract meta-tests over ``__ray_entry__`` (no query execution).

The driver's correctness gate checks the FIRST 50 ``queries()`` entries per
round and never re-checks greens before exhausting unverified rows — the
dict ORDER is therefore part of the contract, and an accidental reorder can
silently push a fix out of the verification window (round-4 lesson). These
tests pin the structural invariants without running any pipeline.
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __ray_entry__ as entry  # noqa: E402

# rows-only by design: stateful/streaming/approximate ops the driver checks
# with the weaker rows-only verdict (documented in the entry module)
_EXPECTED_NO_ORACLE: set[str] = set()


def test_query_and_oracle_keys_consistent():
    qs = entry.queries()
    sql = entry.oracle_sql()
    assert len(qs) == 137
    unknown = set(sql) - set(qs)
    assert not unknown, f"oracle entries without a query: {sorted(unknown)}"
    no_oracle = set(qs) - set(sql)
    assert no_oracle == _EXPECTED_NO_ORACLE, (
        f"queries without an oracle changed: {sorted(no_oracle)} — every "
        "operator claimed done needs BOTH entries unless documented rows-only"
    )


def test_round5_fixes_inside_driver_window():
    window = list(entry.queries())[:50]
    must_be_checked = {
        # the only two non-green driver rows ever (dtype fixes, round 5)
        "media_payload_stats",
        "cdc_state_at_lsn",
        # never driver-verified surface (new round 5)
        "embedding_lsh_indexed_extended",
        "embedding_ivf_indexed_extended",
        # implementation changed round 5 (int32 key pin)
        "supplier_balance_stats",
        # never driver-verified surface (new round 5: pytest-only §2 ops
        # promoted to driver rows — M9/M10, M7, S1/O5)
        "typed_narrowing_audit",
        "content_sha_hex",
        "range_chunk_plan",
        # never driver-verified surface (new round 5: sink/reader
        # roundtrips — K2, K3, S8)
        "bucketed_sink_roundtrip",
        "jsonl_roundtrip",
        "csv_backfill_ranges",
        # never driver-verified surface (new round 5: K6 IPC export,
        # M12 checked timestamp)
        "ipc_export_roundtrip",
        "checked_timestamp_roundtrip",
        # never driver-verified surface (new round 5: DSIR importance)
        "dsir_importance_weights",
        "dsir_resample",
    }
    missing = must_be_checked - set(window)
    assert not missing, (
        f"round-5 critical queries slipped out of the 50-row driver window: "
        f"{sorted(missing)}"
    )


def test_window_boundary_comment_is_accurate():
    names = list(entry.queries())
    assert names[49] == "multitable_fanout_stats"  # last row inside the window
    assert names[50] == "token_counts"  # first row outside


def test_oracles_are_plain_sql_strings():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), name
        assert "select" in sql.lower(), f"{name}: oracle is not a SELECT"
