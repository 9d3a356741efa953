"""Stable key hashing and hash partitioning for the upsert shuffle.

The reference's merge keys are natural per-table keys
(``daily_qc_airflow/daily_dedupe_mainnet.py:28-35``); ours is ``(repo, path)``.
Partitioning is on the FULL ``(repo, path)`` key — not ``repo`` — which is the
hot-key split demanded by the north rule: one popular repo (zipf head) is
spread over all partitions by its paths, while per-key LSN ordering is
preserved because a single file's events still land in one partition.

Hash must be deterministic across processes and nodes (no PYTHONHASHSEED
dependence): SipHash-2-4 with pandas' fixed default key (bit-identical to
``pd.util.hash_array(obj, categorize=False)``) over the ``repo\\x00path``
concatenation — but computed lane-vectorized in numpy straight off the
Arrow string buffers, so the hot shuffle-key path never materializes a
Python object per row.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

PART_COLUMN = "__part"
KEY_SEP = "\x00"

# pandas' fixed default hash key (pd.core.util.hashing._default_hash_key)
_SIP_KEY = b"0123456789123456"
_SIP_K0 = np.uint64(int.from_bytes(_SIP_KEY[:8], "little"))
_SIP_K1 = np.uint64(int.from_bytes(_SIP_KEY[8:], "little"))
_U64 = np.uint64
# beyond this key width the padded lane matrix stops paying for itself
_MAX_VEC_LEN = 512


def _rotl(x: np.ndarray, b: int) -> np.ndarray:
    return (x << _U64(b)) | (x >> _U64(64 - b))


def _sipround(v0, v1, v2, v3):
    v0 = v0 + v1
    v1 = _rotl(v1, 13)
    v1 ^= v0
    v0 = _rotl(v0, 32)
    v2 = v2 + v3
    v3 = _rotl(v3, 16)
    v3 ^= v2
    v0 = v0 + v3
    v3 = _rotl(v3, 21)
    v3 ^= v0
    v2 = v2 + v1
    v1 = _rotl(v1, 17)
    v1 ^= v2
    v2 = _rotl(v2, 32)
    return v0, v1, v2, v3


_LANE_CHUNK = 32768  # lanes per block: all temps stay L2/L3-resident


def _siphash24_lanes(data: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """SipHash-2-4 over n variable-length byte strings, lane-vectorized.

    Lanes are processed in cache-sized blocks of ``_LANE_CHUNK``: each block
    gathers its strings into one zero-padded (lanes, words*8) matrix (viewed
    as little-endian uint64 words, tail word pre-tagged with the spec's
    length byte), then runs the compression loop over WORD INDEX — a fixed
    set of numpy kernels per word across all lanes in the block, with
    shorter lanes masked out. Blocking matters: at full-array width every
    numpy op is a main-memory pass and the cython-per-row path wins; inside
    L2 the same ops run ~5× faster (measured on 2M 35-byte keys: 0.98 s
    blocked vs 7.7 s unblocked vs 1.39 s pandas-object).

    Verified bit-identical to pandas' cython SipHash-2-4
    (test_properties.py pins values and partition assignment).
    """
    n = lengths.size
    out = np.empty(n, dtype=np.uint64)
    dmax = np.int64(max(data.size - 1, 0))
    for c0 in range(0, n, _LANE_CHUNK):
        c1 = min(c0 + _LANE_CHUNK, n)
        st, ln = starts[c0:c1], lengths[c0:c1]
        m_count = st.size
        max_len = int(ln.max()) if m_count else 0
        width = (max_len // 8 + 1) * 8
        span = np.arange(width, dtype=np.int64)
        idx = st[:, None] + span
        np.minimum(idx, dmax, out=idx)
        chunk = data[idx]
        chunk[span[None, :] >= ln[:, None]] = 0
        w = chunk.view("<u8")
        full = ln // 8  # index of each lane's (length-tagged) tail word
        w[np.arange(m_count), full] |= (ln.astype(np.uint64) & _U64(0xFF)) << _U64(56)

        v0 = np.full(m_count, _U64(0x736F6D6570736575) ^ _SIP_K0, dtype=np.uint64)
        v1 = np.full(m_count, _U64(0x646F72616E646F6D) ^ _SIP_K1, dtype=np.uint64)
        v2 = np.full(m_count, _U64(0x6C7967656E657261) ^ _SIP_K0, dtype=np.uint64)
        v3 = np.full(m_count, _U64(0x7465646279746573) ^ _SIP_K1, dtype=np.uint64)
        for j in range(int(full.max()) + 1 if m_count else 0):
            active = full >= j
            m = w[:, j]
            x0, x1, x2, x3 = _sipround(v0, v1, v2, v3 ^ m)
            x0, x1, x2, x3 = _sipround(x0, x1, x2, x3)
            x0 ^= m
            v0 = np.where(active, x0, v0)
            v1 = np.where(active, x1, v1)
            v2 = np.where(active, x2, v2)
            v3 = np.where(active, x3, v3)
        v2 ^= _U64(0xFF)
        for _ in range(4):
            v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
        out[c0:c1] = v0 ^ v1 ^ v2 ^ v3
    return out


def key_strings(tbl: pa.Table, key: tuple[str, ...] = ("repo", "path")) -> pa.Array:
    """Single-column string key ``k1\\x00k2…`` (vectorized arrow concat)."""
    cols = [pc.cast(tbl.column(name), pa.string()) for name in key]
    if len(cols) == 1:
        out = cols[0]
    else:
        # last positional arg is the element-wise separator
        out = pc.binary_join_element_wise(*cols, KEY_SEP)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def first_indices(tbl: pa.Table, key: tuple[str, ...]) -> pa.Array:
    """Positional indices of the FIRST occurrence per composite key, in
    input order — the shared at-least-once dedup idiom (duplicate deliveries
    are byte-identical by contract, so first-wins is exact). Used by the
    version-preserving combiner, the history archive writer, and the
    archive key lookup; keep them in lockstep through this helper."""
    keys = key_strings(tbl, key=key)
    idx = pa.table(
        {"k": keys, "i": pa.array(np.arange(tbl.num_rows, dtype=np.int64))}
    )
    firsts = idx.group_by("k").aggregate([("i", "min")]).column("i_min")
    return firsts.take(pc.sort_indices(firsts))  # preserve input order


def _hash_via_pandas(strings: pa.Array) -> np.ndarray:
    obj = np.asarray(strings.to_pandas(), dtype=object)
    return pd.util.hash_array(obj, categorize=False)


def _splitmix64(vals: np.ndarray) -> np.ndarray:
    # pandas' post-hash redistribution (pd.core.util.hashing._hash_ndarray)
    vals = vals.copy()
    vals ^= vals >> _U64(30)
    vals *= _U64(0xBF58476D1CE4E5B9)
    vals ^= vals >> _U64(27)
    vals *= _U64(0x94D049BB133111EB)
    vals ^= vals >> _U64(31)
    return vals


def stable_hash64(strings: pa.Array) -> np.ndarray:
    """Deterministic uint64 hash of a string array.

    Bit-identical to ``pd.util.hash_array(obj, categorize=False)``
    (SipHash-2-4 + splitmix64 redistribution) but vectorized over the Arrow
    string buffers — no per-row Python object on the shuffle-key path. Falls
    back to the pandas cython path off the happy path (nulls, pathological
    key widths, non-little-endian hosts).
    """
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if (
        strings.null_count
        or sys.byteorder != "little"
        or not pa.types.is_string(strings.type)
    ):
        return _hash_via_pandas(strings)
    _, offs_buf, data_buf = strings.buffers()
    offsets = np.frombuffer(offs_buf, dtype=np.int32, count=n + 1, offset=strings.offset * 4)
    starts = offsets[:-1].astype(np.int64)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    if lengths.max() > _MAX_VEC_LEN:
        return _hash_via_pandas(strings)
    data = np.frombuffer(data_buf, dtype=np.uint8) if data_buf is not None else np.empty(0, np.uint8)
    if data.size == 0:
        # all-empty strings: keep the gather indexable; every byte is masked
        data = np.zeros(1, np.uint8)
    return _splitmix64(_siphash24_lanes(data, starts, lengths))


def add_partition_column(
    tbl: pa.Table, num_partitions: int, key: tuple[str, ...] = ("repo", "path")
) -> pa.Table:
    """Append ``__part = stable_hash(key) % P`` for the merge shuffle."""
    parts = (stable_hash64(key_strings(tbl, key)) % np.uint64(num_partitions)).astype(
        np.int32
    )
    return tbl.append_column(PART_COLUMN, pa.array(parts, pa.int32()))
