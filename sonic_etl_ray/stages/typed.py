"""Typed-cast discipline: checked narrowing, saturating caps, lossless duals.

Re-expresses the reference's BigQuery type-discipline layer
(``transformation/bq/{integer,numeric,bignumeric,timestamp}.rs`` and
``cap_bignumeric`` in ``transformation/common.rs:149-160``) as vectorized
pyarrow/numpy kernels:

- checked narrowing to int64 raises :class:`TypedCastError` on overflow —
  errors, not clamps (``transformation/bq/integer.rs:64-152``);
- NUMERIC is bounded at ±(10**28 - 1) and errors beyond
  (``transformation/bq/numeric.rs:71-100``);
- BIGNUMERIC *saturates* at 38 nines while keeping the full value in a
  ``*_lossless`` string dual (``transformation/common.rs:149-160,211-212``);
- timestamps are checked u64→i64 seconds (``transformation/bq/timestamp.rs``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

NUMERIC_MAX = 10**28 - 1
BIGNUMERIC_CAP = 10**38 - 1
_BIGNUMERIC_CAP_STR = "9" * 38


class TypedCastError(ValueError):
    """Raised when a checked cast overflows (the ``TransformationErr`` analog,
    ``transformation/err.rs:1-31``)."""

    def __init__(self, field: str, msg: str):
        super().__init__(f"{field}: {msg}")
        self.field = field


def checked_int64(arr: pa.Array | pa.ChunkedArray, field: str = "value") -> pa.ChunkedArray:
    """Checked narrowing to int64; overflow is an error, never a clamp."""
    try:
        return pc.cast(arr, pa.int64(), safe=True)
    except (pa.ArrowInvalid, OverflowError) as e:  # pragma: no cover - msg path
        raise TypedCastError(field, f"overflows int64 ({e})") from e


def checked_numeric(
    decimal_strings: pa.Array | pa.ChunkedArray, field: str = "value"
) -> pa.Array:
    """NUMERIC discipline on decimal-as-string values (the i128/u128 range of
    the reference): bounded at ±(1e28-1), *error* beyond — unlike BIGNUMERIC
    which saturates. Length fast-path: ≤28 digits is always in range."""
    if isinstance(decimal_strings, pa.ChunkedArray):
        decimal_strings = decimal_strings.combine_chunks()
    lengths = pc.utf8_length(pc.utf8_ltrim(decimal_strings, "-"))
    maybe_over = pc.fill_null(pc.greater(lengths, 28), False)
    if pc.any(maybe_over).as_py():
        for v in decimal_strings.to_pylist():
            if v is not None and abs(int(v)) > NUMERIC_MAX:
                raise TypedCastError(field, f"{v} exceeds NUMERIC bound ±{NUMERIC_MAX}")
    return decimal_strings


def cap_bignumeric(decimal_strings: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, pa.Array]:
    """Saturate decimal-as-string values above 38 nines; return (capped, lossless).

    The lossless dual preserves the exact value next to the capped column,
    mirroring ``value``/``value_lossless`` (``transformation/common.rs:679-687``).
    Uses a length fast-path like the reference's bit-length check: any
    non-negative integer decimal string shorter than 39 chars is in range.
    """
    if isinstance(decimal_strings, pa.ChunkedArray):
        decimal_strings = decimal_strings.combine_chunks()
    lossless = decimal_strings
    lengths = pc.utf8_length(decimal_strings)
    maybe_over = pc.fill_null(pc.greater(lengths, 38), False)
    if not pc.any(maybe_over).as_py():
        return lossless, lossless
    # Slow path only for the >38-digit tail (rare).
    py = decimal_strings.to_pylist()
    capped = [
        v if v is None or len(v) <= 38 or int(v) <= BIGNUMERIC_CAP else _BIGNUMERIC_CAP_STR
        for v in py
    ]
    return pa.array(capped, pa.string()), lossless


def checked_timestamp_s(arr: pa.Array | pa.ChunkedArray, field: str = "ts") -> pa.ChunkedArray:
    """Checked unix-seconds to timestamp[s] (``bq/timestamp.rs:23-29``)."""
    return pc.cast(checked_int64(arr, field), pa.timestamp("s"))


def format_fixed_bytes(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """binary → ``0x…`` lowercase hex string (``format_fixed_bytes``,
    ``transformation/common.rs:25-28``). pyarrow has no hex kernel; this is a
    C-loop over the buffer via ``bytes.hex`` (not a hot-path stage)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.array(
        [None if v is None else "0x" + v.hex() for v in arr.to_pylist()], pa.string()
    )
