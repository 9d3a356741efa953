"""Unit tests for the typed-cast discipline and schema evolution rules —
per-operator tests the reference lacks (SURVEY.md §5: improvement (b))."""

import pyarrow as pa
import pytest

from sonic_etl_ray.schemas import conform_table, unify_schemas, widen_type
from sonic_etl_ray.stages.typed import (
    BIGNUMERIC_CAP,
    NUMERIC_MAX,
    TypedCastError,
    cap_bignumeric,
    checked_int64,
    checked_numeric,
    checked_timestamp_s,
    format_fixed_bytes,
)


def test_checked_int64_ok():
    assert checked_int64(pa.array([1, 2, None])).to_pylist() == [1, 2, None]


def test_checked_int64_overflow_is_error_not_clamp():
    with pytest.raises(TypedCastError):
        checked_int64(pa.array([2**63], pa.uint64()), "gas")


def test_checked_numeric_bound():
    ok = [str(NUMERIC_MAX), str(-NUMERIC_MAX), "0", None]
    assert checked_numeric(pa.array(ok, pa.string())).to_pylist() == ok
    with pytest.raises(TypedCastError):
        checked_numeric(pa.array([str(NUMERIC_MAX + 1)]))


def test_cap_bignumeric_saturates_with_lossless_dual():
    big = str(BIGNUMERIC_CAP + 5)
    capped, lossless = cap_bignumeric(pa.array(["7", big, None]))
    assert capped.to_pylist() == ["7", "9" * 38, None]
    assert lossless.to_pylist() == ["7", big, None]


def test_cap_bignumeric_fast_path_untouched():
    vals = ["123", "9" * 38, None]
    capped, lossless = cap_bignumeric(pa.array(vals))
    assert capped.to_pylist() == vals and lossless.to_pylist() == vals


def test_checked_timestamp():
    out = checked_timestamp_s(pa.array([0, 1_700_000_000]))
    assert str(out.type) == "timestamp[s]"


def test_format_fixed_bytes():
    assert format_fixed_bytes(pa.array([b"\xde\xad", None], pa.binary())).to_pylist() == [
        "0xdead",
        None,
    ]


def test_widen_int_and_float():
    assert widen_type(pa.int32(), pa.int64()) == pa.int64()
    assert widen_type(pa.float32(), pa.float64()) == pa.float64()
    with pytest.raises(TypeError):
        widen_type(pa.int64(), pa.float64())  # lossy — rejected


def test_unify_schemas_add_and_widen():
    old = pa.schema([("a", pa.int32()), ("b", pa.string())])
    new = pa.schema([("a", pa.int64()), ("c", pa.float64())])
    u = unify_schemas(old, new)
    assert u.names == ["a", "b", "c"]
    assert u.field("a").type == pa.int64()
    assert u.field("b").nullable and u.field("c").nullable


def test_conform_table_fills_and_casts():
    t = pa.table({"a": pa.array([1, 2], pa.int32())})
    s = pa.schema([("a", pa.int64()), ("b", pa.string())])
    out = conform_table(t, s)
    assert out.schema == s
    assert out.column("b").null_count == 2


def test_sha256_column_large_string_and_type_errors():
    """sha256 must read int64 offsets for large_string (a >2 GiB block or a
    parquet file restoring large_string via ARROW:schema metadata) and must
    refuse non-string input instead of hashing garbage buffers."""
    import hashlib

    from sonic_etl_ray.stages.transform import sha256_column

    vals = ["abc", None, "", "xyzw"]
    want = [hashlib.sha256(v.encode()).hexdigest() if v is not None else None for v in vals]
    for typ in (pa.string(), pa.large_string()):
        got = sha256_column(pa.array(vals, typ)).to_pylist()
        assert got == want, typ
    # sliced large_string arrays exercise the offset-window arithmetic
    sliced = pa.array(vals, pa.large_string())[1:]
    assert sha256_column(sliced).to_pylist() == want[1:]
    with pytest.raises(TypeError):
        sha256_column(pa.array([1, 2, 3]))
