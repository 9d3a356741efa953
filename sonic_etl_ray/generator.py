"""Deterministic synthetic repo-file change-stream generator.

Produces the BASELINE.json ``input_hint`` shape — a Parquet table of
source-code repository records ``(repo, path, commit, lang, content)`` —
wrapped in a CDC envelope ``(lsn, op)`` and written as contiguous LSN-span
segment files (the analog of the coordinator's 1000-block
``IndexingRequest`` ranges, ``indexing_coordinator/publish_ranges.py:110-146``).

Fully seeded and vectorized (numpy); the same (seed, params) always produce
byte-identical segments, so fixtures, duplicate-delivery replays, and bench
inputs at any scale come from one code path. Content is ASCII pseudo-source
sliced from a seeded token pool with log-normal-ish lengths (a few wide rows
to exercise block splitting).

Generation rules (FIXTURES.md §2): inserts create previously unseen
``(repo, path)`` keys; updates/deletes pick already-inserted keys; repo
popularity is zipf-like (hot-key skew); every key's event sequence is
LSN-increasing by construction (events are emitted in LSN order).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_EXTS = ["py", "rs", "go", "js", "md", "c", "java", "rb"]
_LANGS = {
    "py": "python",
    "rs": "rust",
    "go": "go",
    "js": "javascript",
    "md": "markdown",
    "c": "c",
    "java": "java",
    "rb": "ruby",
}
_WORDS = (
    "fn def let mut impl struct enum match return if else for while loop break "
    "import from class self super async await yield map filter reduce fold "
    "table scan merge sort hash join batch stream window commit lsn upsert "
    "delete insert update schema column row value key range segment epoch"
).split()


@dataclass
class StreamSpec:
    """Parameters of a deterministic change stream."""

    n_events: int
    n_repos: int = 20
    seed: int = 42
    segment_size: int = 1000
    start_lsn: int = 0
    p_insert: float = 0.70
    p_update: float = 0.25  # p_delete = 1 - p_insert - p_update
    # hot-key skew: fraction of keys forced into repo 0 (None → zipf-ish only)
    hot_repo_frac: float | None = None
    mean_len: int = 200
    wide_row_every: int = 5000  # every Nth insert gets a ~100x content
    # schema evolution: (lsn where size_hint:int32 appears,
    #                    lsn where it widens to int64 and branch:string appears)
    evolve_at: tuple[int, int] | None = None
    # bounded key universe: once this many keys exist, further inserts become
    # updates of existing keys — the steady-state regime of a long CDC stream
    # replaying into a bounded repo-file table (state ≪ events)
    max_live_keys: int | None = None
    extra: dict = field(default_factory=dict)


def _token_pool(rng: np.random.Generator, size: int = 1 << 20) -> str:
    words = rng.choice(np.array(_WORDS, dtype=object), size=size // 6)
    return " ".join(words.tolist())


class _StreamPlan:
    """All numeric draws for a stream, computed once (vectorized numpy);
    string assembly happens per chunk in :func:`_chunk_table` so arbitrarily
    long streams generate with flat memory."""

    def __init__(self, spec: StreamSpec):
        rng = np.random.default_rng(spec.seed)
        n = spec.n_events
        self.spec = spec
        self.lsn = np.arange(spec.start_lsn, spec.start_lsn + n, dtype=np.int64)

        u = rng.random(n)
        op_code = np.where(
            u < spec.p_insert, 0, np.where(u < spec.p_insert + spec.p_update, 1, 2)
        )
        op_code[0] = 0  # first event must be an insert
        ins_mask = op_code == 0
        if spec.max_live_keys is not None:
            # cap the key universe: inserts past the cap flip to updates
            over = (np.cumsum(ins_mask) - 1 >= spec.max_live_keys) & ins_mask
            op_code = np.where(over, 1, op_code)
            ins_mask = op_code == 0
        self.op_code = op_code
        n_keys = int(ins_mask.sum())
        # key id per event: inserts get fresh sequential ids; updates/deletes
        # pick a uniformly random already-inserted key at that point
        insert_seq = np.cumsum(ins_mask) - 1
        avail = np.maximum(np.cumsum(ins_mask), 1)
        pick = np.floor(rng.random(n) * avail).astype(np.int64)
        self.key_id = np.where(ins_mask, insert_seq, pick)

        # repo per key: zipf-ish power law (+ optional forced hot repo)
        ku = rng.random(n_keys)
        key_repo = np.floor(spec.n_repos * ku**2.5).astype(np.int64)
        if spec.hot_repo_frac:
            hot = rng.random(n_keys) < spec.hot_repo_frac
            key_repo = np.where(hot, 0, key_repo)
        self.key_repo = key_repo
        self.key_ext = rng.integers(0, len(_EXTS), size=n_keys)

        # commit entropy: 3×62-bit per event → 40-hex at assembly time
        self.commit_words = rng.integers(0, 1 << 62, size=(n, 3), dtype=np.int64)

        pool = _token_pool(rng)
        self.pool_raw = pool.encode("ascii")
        lens = np.minimum(
            (rng.lognormal(mean=np.log(spec.mean_len), sigma=0.6, size=n)).astype(np.int64) + 8,
            len(pool) // 2,
        )
        wide = (np.arange(n) % spec.wide_row_every) == (spec.wide_row_every - 1)
        self.lens = np.where(wide, np.minimum(lens * 100, len(pool) - 1), lens)
        self.offs = rng.integers(0, len(pool) - int(self.lens.max()) - 1, size=n)

        self.repo_names = np.array(
            [f"org{r % 7}/repo{r}" for r in range(spec.n_repos)], dtype=object
        )
        self.lang_names = np.array([_LANGS[e] for e in _EXTS], dtype=object)


def _hex40(words: np.ndarray) -> pa.Array:
    """(m, 3) int64 → 40-char lowercase hex strings, fully vectorized: one
    hexlify of the big-endian buffer, fixed-width offsets into one data
    buffer (no per-row Python)."""
    import binascii

    m = len(words)
    hexbuf = binascii.hexlify(words.astype(">u8").tobytes())  # 48 chars/row
    data = np.frombuffer(hexbuf, dtype=np.uint8).reshape(m, 48)[:, :40].tobytes()
    offsets = np.arange(0, 40 * (m + 1), 40, dtype=np.int32)
    return pa.StringArray.from_buffers(
        m, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)
    )


def _content_array(
    pool_raw: bytes, offs: np.ndarray, lens: np.ndarray, is_del: np.ndarray
) -> pa.Array:
    """Content assembly into one utf-8 data buffer + offsets: zero-copy
    memoryview slices of the pool joined with a single C-level memcpy;
    deletes are nulls."""
    m = len(offs)
    keep_lens = np.where(is_del, 0, lens)
    view = memoryview(pool_raw)
    data = b"".join(
        view[o : o + l]
        for o, l in zip(offs.tolist(), keep_lens.tolist())
        if l
    )
    offsets = np.concatenate([[0], np.cumsum(keep_lens)]).astype(np.int32)
    validity = np.packbits(~is_del, bitorder="little")
    return pa.StringArray.from_buffers(
        m,
        pa.py_buffer(offsets.tobytes()),
        pa.py_buffer(data),
        pa.py_buffer(validity.tobytes()),
        null_count=int(is_del.sum()),
    )


_OPS_ARR = np.array(["insert", "update", "delete"], dtype=object)


def _chunk_table(plan: _StreamPlan, lo: int, hi: int) -> pa.Table:
    """Assemble rows [lo, hi) of the planned stream as an Arrow table."""
    spec = plan.spec
    kid = plan.key_id[lo:hi]
    ext_id = plan.key_ext[kid]
    op_code = plan.op_code[lo:hi]
    is_del = op_code == 2
    path = np.array(
        [f"src/m{int(k) % 37}/f{int(k)}.{_EXTS[int(e)]}" for k, e in zip(kid, ext_id)],
        dtype=object,
    )
    cols: dict[str, pa.Array] = {
        "lsn": pa.array(plan.lsn[lo:hi], pa.int64()),
        "op": pa.array(_OPS_ARR[op_code], pa.string()),
        "repo": pa.array(plan.repo_names[plan.key_repo[kid]], pa.string()),
        "path": pa.array(path, pa.string()),
        "commit": _hex40(plan.commit_words[lo:hi]),
        "lang": pa.array(plan.lang_names[ext_id], pa.string()),
        "content": _content_array(
            plan.pool_raw, plan.offs[lo:hi], plan.lens[lo:hi], is_del
        ),
    }
    if spec.evolve_at is not None:
        t1, t2 = spec.evolve_at
        lsn = plan.lsn[lo:hi]
        hint = np.where(is_del, -1, plan.lens[lo:hi]).astype(np.int64)
        cols["size_hint"] = pa.array(
            np.where(hint < 0, 0, hint),
            pa.int64(),
            mask=(lsn < t1) | (hint < 0),
        )
        cols["branch"] = pa.array(
            np.where(kid % 3 != 0, "main", "dev").astype(object),
            pa.string(),
            mask=lsn < t2,
        )
    return pa.table(cols)


def generate_events(spec: StreamSpec) -> pa.Table:
    """The full stream as one Arrow table (segment-agnostic), LSN-ascending."""
    plan = _StreamPlan(spec)
    return _chunk_table(plan, 0, spec.n_events)


def write_segments(table: pa.Table, out_dir: str, spec: StreamSpec) -> list[str]:
    """Split the stream into contiguous LSN-span segment Parquet files.

    Under schema evolution, a segment written entirely before the evolution
    point drops the not-yet-existing columns — later segments add them, so
    the sink sees genuine column-add / type-widen across segments.
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    n = table.num_rows
    t1, t2 = spec.evolve_at if spec.evolve_at else (None, None)
    for s, lo in enumerate(range(0, n, spec.segment_size)):
        seg = table.slice(lo, spec.segment_size)
        if spec.evolve_at is not None:
            seg = _apply_segment_evolution(seg, t1, t2)
        p = os.path.join(out_dir, f"segment_{s:06d}.parquet")
        pq.write_table(seg, p, compression="zstd")
        paths.append(p)
    return paths


def _apply_segment_evolution(seg: pa.Table, t1: int, t2: int) -> pa.Table:
    """Segments written entirely before an evolution point drop the
    not-yet-existing columns (and carry the pre-widening int32 type)."""
    max_lsn = seg.column("lsn")[-1].as_py()
    if max_lsn < t1:
        return seg.drop_columns(["size_hint", "branch"])
    if max_lsn < t2:
        seg = seg.drop_columns(["branch"])
        return seg.set_column(
            seg.column_names.index("size_hint"),
            "size_hint",
            seg.column("size_hint").cast(pa.int32()),
        )
    return seg


def generate_stream(out_dir: str, spec: StreamSpec) -> list[str]:
    """Generate + write a segmented change stream; returns segment paths.

    Chunked: numeric draws are planned once (small int arrays), strings are
    assembled one segment at a time — memory stays flat at any stream size
    (the full-table path would hold every content string at once)."""
    os.makedirs(out_dir, exist_ok=True)
    plan = _StreamPlan(spec)
    n = spec.n_events
    t1, t2 = spec.evolve_at if spec.evolve_at else (None, None)
    paths = []
    for s, lo in enumerate(range(0, n, spec.segment_size)):
        seg = _chunk_table(plan, lo, min(lo + spec.segment_size, n))
        if spec.evolve_at is not None:
            seg = _apply_segment_evolution(seg, t1, t2)
        p = os.path.join(out_dir, f"segment_{s:06d}.parquet")
        pq.write_table(seg, p, compression="zstd")
        paths.append(p)
    return paths
