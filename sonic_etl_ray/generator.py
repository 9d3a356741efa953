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
    extra: dict = field(default_factory=dict)


def _token_pool(rng: np.random.Generator, size: int = 1 << 20) -> str:
    words = rng.choice(np.array(_WORDS, dtype=object), size=size // 6)
    return " ".join(words.tolist())


def generate_events(spec: StreamSpec) -> pa.Table:
    """The full stream as one Arrow table (segment-agnostic), LSN-ascending."""
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events
    lsn = np.arange(spec.start_lsn, spec.start_lsn + n, dtype=np.int64)

    u = rng.random(n)
    op_code = np.where(u < spec.p_insert, 0, np.where(u < spec.p_insert + spec.p_update, 1, 2))
    op_code[0] = 0  # first event must be an insert

    ins_mask = op_code == 0
    n_keys = int(ins_mask.sum())
    # key id per event: inserts get fresh sequential ids; updates/deletes pick
    # a uniformly random already-inserted key at that point in the stream
    insert_seq = np.cumsum(ins_mask) - 1
    avail = np.maximum(np.cumsum(ins_mask), 1)
    pick = np.floor(rng.random(n) * avail).astype(np.int64)
    key_id = np.where(ins_mask, insert_seq, pick)

    # repo per key: zipf-ish power law over n_repos (+ optional forced hot repo)
    ku = rng.random(n_keys)
    key_repo = np.floor(spec.n_repos * ku**2.5).astype(np.int64)  # skewed head
    if spec.hot_repo_frac:
        hot = rng.random(n_keys) < spec.hot_repo_frac
        key_repo = np.where(hot, 0, key_repo)
    key_ext = rng.integers(0, len(_EXTS), size=n_keys)

    ev_repo_id = key_repo[key_id]
    ev_ext_id = key_ext[key_id]
    repo = np.array([f"org{r % 7}/repo{r}" for r in range(spec.n_repos)], dtype=object)[
        ev_repo_id
    ]
    exts = np.array(_EXTS, dtype=object)
    langs = np.array([_LANGS[e] for e in _EXTS], dtype=object)
    kid = key_id  # path is a pure function of key id → stable across events
    path = np.array(
        [f"src/m{int(k) % 37}/f{int(k)}.{_EXTS[int(e)]}" for k, e in zip(kid, ev_ext_id)],
        dtype=object,
    )
    lang = langs[ev_ext_id]

    # commit: 40-hex, deterministic from rng stream
    ch = rng.integers(0, 1 << 62, size=(n, 3), dtype=np.int64)
    commit = np.array(
        [f"{a:016x}{b:016x}{c:08x}"[:40] for a, b, c in ch], dtype=object
    )

    pool = _token_pool(rng)
    lens = np.minimum(
        (rng.lognormal(mean=np.log(spec.mean_len), sigma=0.6, size=n)).astype(np.int64) + 8,
        len(pool) // 2,
    )
    wide = (np.arange(n) % spec.wide_row_every) == (spec.wide_row_every - 1)
    lens = np.where(wide, np.minimum(lens * 100, len(pool) - 1), lens)
    offs = rng.integers(0, len(pool) - int(lens.max()) - 1, size=n)
    is_del = op_code == 2
    content = np.empty(n, dtype=object)
    for i in range(n):  # slice assembly; C-speed string slicing, gen-time only
        content[i] = None if is_del[i] else pool[offs[i] : offs[i] + lens[i]]

    op = np.array(["insert", "update", "delete"], dtype=object)[op_code]
    cols: dict[str, pa.Array] = {
        "lsn": pa.array(lsn, pa.int64()),
        "op": pa.array(op, pa.string()),
        "repo": pa.array(repo, pa.string()),
        "path": pa.array(path, pa.string()),
        "commit": pa.array(commit, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "content": pa.array(content.tolist(), pa.string()),
    }

    if spec.evolve_at is not None:
        t1, t2 = spec.evolve_at
        hint = np.where(is_del, -1, lens).astype(np.int64)
        cols["size_hint"] = pa.array(
            [None if (l < t1 or h < 0) else int(h) for l, h in zip(lsn, hint)],
            pa.int64(),
        )
        cols["branch"] = pa.array(
            [None if l < t2 else ("main" if k % 3 else "dev") for l, k in zip(lsn, key_id)],
            pa.string(),
        )
    return pa.table(cols)


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
            max_lsn = seg.column("lsn")[-1].as_py()
            if max_lsn < t1:
                seg = seg.drop_columns(["size_hint", "branch"])
            elif max_lsn < t2:
                seg = seg.drop_columns(["branch"])
                seg = seg.set_column(
                    seg.column_names.index("size_hint"),
                    "size_hint",
                    seg.column("size_hint").cast(pa.int32()),
                )
        p = os.path.join(out_dir, f"segment_{s:06d}.parquet")
        pq.write_table(seg, p, compression="zstd")
        paths.append(p)
    return paths


def generate_stream(out_dir: str, spec: StreamSpec) -> list[str]:
    """Generate + write a segmented change stream; returns segment paths."""
    return write_segments(generate_events(spec), out_dir, spec)
