"""Mergeable sketches as Ray Data combiners: HyperLogLog distinct-count
registers and a Bloom-filter-pruned semi-join.

Both follow the engine's partial-aggregate discipline (SCALE.md): each
``map_batches`` task emits a FIXED-SIZE summary (128-entry register table,
16 KiB bitmap) regardless of input rows, so the shuffle/driver volume is
O(sketch), not O(data). The HLL hash and estimator use integer-only math
that DuckDB reproduces bit-for-bit (md5 → top-p bucket bits → leading-zero
rank → dyadic register sum), so even the *approximate* operator is
oracle-exact: the approximation is in the algorithm, not the execution.

Reference analog: the per-block count aggregates A1–A4 and the QC count
comparison (``coordinator/qc.py``) are exact; these add the sublinear
summaries a 100 TB corpus needs when exact distinct-counting would itself
be a full shuffle.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from sonic_etl_ray.stages.joins import safe_join
from ray.data.aggregate import Count, Max, Sum

# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007), integer-exact variant
# ---------------------------------------------------------------------------

HLL_P = 7  # 2^7 = 128 registers
HLL_M = 1 << HLL_P
HLL_TAIL_BITS = 64 - HLL_P  # 57
HLL_RHO_MAX = HLL_TAIL_BITS + 1  # 58 (all-zero tail)
HLL_SCALE = 40  # dyadic register sum uses 2^(SCALE - min(rho, SCALE))
# floor(alpha_m * m^2 * 2^SCALE) with alpha_m = 0.7213 / (1 + 1.079/m);
# embedded as the SAME integer literal in the SQL oracle so the final
# division is bit-identical on both sides.
HLL_ALPHA_NUM = int(0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M * (1 << HLL_SCALE))


def _hll_hash64(values: pd.Series) -> np.ndarray:
    """md5 of the decimal string of each value → first 16 hex chars as a
    uint64. Matches DuckDB ``('0x' || substr(md5(x::VARCHAR),1,16))::UBIGINT``
    exactly. md5 is inherently per-row (same precedent as the exact-dedup
    sha256); the cost is one digest per row, amortized per batch."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big") for v in values),
        dtype=np.uint64,
        count=len(values),
    )


def _hll_partial(batch: pd.DataFrame, group_col: str, value_col: str) -> pd.DataFrame:
    """Per-batch HLL combiner: (group, bucket) → max rho. Output is capped at
    |groups in batch| × m rows — the fixed-size partial sketch."""
    h = _hll_hash64(batch[value_col])
    bucket = (h >> np.uint64(HLL_TAIL_BITS)).astype(np.int64)
    tail = h & np.uint64((1 << HLL_TAIL_BITS) - 1)
    # rho = leading zeros of the 57-bit tail + 1; all-zero tail → 58.
    # bit_length by vectorized binary reduction — integer-exact (float log2
    # misrounds above 2^53, which 57-bit tails exceed).
    nbits = np.zeros(len(tail), dtype=np.int64)
    t = tail.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = t >= np.uint64(1 << shift)
        nbits[big] += shift
        t[big] >>= np.uint64(shift)
    nbits[tail != 0] += 1
    rho = HLL_RHO_MAX - nbits
    part = pd.DataFrame({group_col: batch[group_col].to_numpy(), "bucket": bucket, "rho": rho})
    out = part.groupby([group_col, "bucket"], as_index=False)["rho"].max()
    return out.rename(columns={"rho": "max_rho"})


def hll_registers(ds: ray.data.Dataset, group_col: str, value_col: str) -> ray.data.Dataset:
    """Distributed HLL sketch per group: ``map_batches`` partials (fixed-size
    per batch) → one small ``groupby`` max-merge. The register table IS the
    mergeable artifact — union of sketches = groupby-max of their rows, which
    is how cross-epoch / cross-shard merges compose without re-reading data."""
    return (
        ds.map_batches(
            # arrow blocks into the aggregate: Ray's aggregate on pandas
            # blocks is per-group Python, on Arrow it's vectorized
            lambda b: pa.Table.from_pandas(
                _hll_partial(b, group_col, value_col), preserve_index=False
            ),
            batch_format="pandas",
        )
        .groupby([group_col, "bucket"])
        .aggregate(Max("max_rho", alias_name="max_rho"))
    )


def hll_estimate(registers: pd.DataFrame, group_col: str) -> pd.DataFrame:
    """Integer-exact raw-HLL estimate from a register table: dyadic register
    sum S = Σ 2^(SCALE−min(rho,SCALE)) (empty registers contribute 2^SCALE),
    estimate = ALPHA_NUM // S. No floats anywhere, so DuckDB reproduces it
    bit-for-bit. Raw estimator only (no small-range linear counting — a log()
    branch would break integer parity); callers needing small-n accuracy
    should size p so n ≳ 2.5·m."""
    rows = []
    for g, sub in registers.groupby(group_col, sort=True):
        rho = np.minimum(sub["max_rho"].to_numpy(np.int64), HLL_SCALE)
        s = int(np.sum(np.int64(1) << (HLL_SCALE - rho))) + (HLL_M - len(sub)) * (
            1 << HLL_SCALE
        )
        rows.append({group_col: g, "est_distinct": HLL_ALPHA_NUM // s, "n_registers": len(sub)})
    out = pd.DataFrame(
        rows, columns=[group_col, "est_distinct", "n_registers"]
    )  # explicit columns: an empty register table yields a typed empty frame
    out["est_distinct"] = out["est_distinct"].astype("int64")
    out["n_registers"] = out["n_registers"].astype("int64")
    return out


def hll_distinct_parts(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct ``l_partkey`` per ``l_returnflag`` over lineitem —
    the fact-table "distinct products per return status" sketch. Exact
    distinct would shuffle every (flag, partkey) pair; this ships 128
    integers per flag per batch."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_partkey"]
    )
    regs = hll_registers(ds, "l_returnflag", "l_partkey").to_pandas()
    out = hll_estimate(regs, "l_returnflag")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def hll_oracle_sql(table: str, group_col: str, value_col: str) -> str:
    """DuckDB SQL computing the identical registers and integer estimate."""
    tail_mask = (1 << HLL_TAIL_BITS) - 1
    return f"""
WITH hashed AS (
  SELECT {group_col},
         ('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 16))::UBIGINT AS h
  FROM {table}
), ranked AS (
  SELECT {group_col},
         CAST(h >> {HLL_TAIL_BITS} AS BIGINT) AS bucket,
         CAST(h & {tail_mask} AS BIGINT) AS tail
  FROM hashed
), regs AS (
  SELECT {group_col}, bucket,
         MAX(CASE WHEN tail = 0 THEN {HLL_RHO_MAX}
                  ELSE {HLL_RHO_MAX} - LENGTH(BIN(tail)) END) AS max_rho
  FROM ranked GROUP BY 1, 2
)
SELECT {group_col},
       CAST({HLL_ALPHA_NUM}::BIGINT //
         (SUM(1::BIGINT << ({HLL_SCALE} - LEAST(max_rho, {HLL_SCALE})))
          + ({HLL_M} - COUNT(*)) * (1::BIGINT << {HLL_SCALE})) AS BIGINT) AS est_distinct,
       CAST(COUNT(*) AS BIGINT) AS n_registers
FROM regs GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Bloom-filter-pruned semi-join
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 17  # 16 KiB bitmap — fixed size, independent of build rows
BLOOM_K = 4

_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)


def _bloom_mix(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """The two splitmix64-style mixes behind both the bit positions and the
    shard assignment — vectorized over the batch."""
    x = keys.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * _SPLITMIX_C1
    x = (x ^ (x >> np.uint64(27))) * _SPLITMIX_C2
    h1 = x ^ (x >> np.uint64(31))
    y = h1 * _SPLITMIX_C1
    h2 = (y ^ (y >> np.uint64(29))) | np.uint64(1)
    return h1, h2


def _bloom_positions(keys: np.ndarray, bits: int = BLOOM_BITS) -> np.ndarray:
    """k bit positions per key via double hashing of two splitmix64-style
    mixes — fully vectorized over the batch. Internal only (no oracle parity
    needed: the final join re-verifies, so the filter affects cost, not
    results)."""
    h1, h2 = _bloom_mix(keys)
    ks = np.arange(BLOOM_K, dtype=np.uint64)[:, None]
    return ((h1[None, :] + ks * h2[None, :]) % np.uint64(bits)).astype(np.int64)


def bloom_shard_of(keys: np.ndarray, num_shards: int) -> np.ndarray:
    """Shard id per key for the sharded Bloom filter. Uses the TOP bits of
    the first mix while the bit positions use its low-order residues, so a
    key's shard is uncorrelated with where it lands inside the shard."""
    h1, _ = _bloom_mix(keys)
    return ((h1 >> np.uint64(33)) % np.uint64(num_shards)).astype(np.int64)


def bloom_build_sharded(
    ds: ray.data.Dataset,
    key_col: str,
    num_shards: int,
    bits_per_shard: int = BLOOM_BITS,
) -> list["ray.ObjectRef"]:
    """Hash-sharded Bloom build — the 10^10-key shape the single-bitmap
    :func:`bloom_build` docstring promises. Each key hashes to exactly one
    of ``num_shards`` independent filters, so total capacity grows linearly
    with the shard count while every individual filter stays a fixed-size
    bitmap.

    Build shape: each block task emits one (shard, partial-bitmap) row per
    shard its keys touch; a hash ``groupby("shard")`` routes all partials
    for a shard to ONE reduce task which ORs them — the all-to-all volume is
    O(blocks × shards × bitmap), never rows, and per-reduce memory is one
    bitmap. The driver materializes only the P reduced bitmaps (P × bitmap
    bytes) and ``ray.put``s each one separately, so a probe task can fetch
    ONLY its shard. Beyond ~10^4 shards, persist the reduced bitmaps to lake
    storage (one object per shard) instead of driver-side ``ray.put`` — the
    build and probe shapes are unchanged.
    """
    nbytes = bits_per_shard // 8

    def partials(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy().astype(np.int64)
        shard = bloom_shard_of(keys, num_shards)
        pos = _bloom_positions(keys, bits_per_shard)  # (k, n)
        out_shards, out_maps = [], []
        for s in np.unique(shard):
            bits = np.zeros(bits_per_shard, dtype=bool)
            bits[pos[:, shard == s].ravel()] = True
            out_shards.append(int(s))
            out_maps.append(np.packbits(bits).tobytes())
        return pa.table(
            {"shard": pa.array(out_shards, pa.int64()),
             "bitmap": pa.array(out_maps, pa.binary())}
        )

    def or_reduce(g: pa.Table) -> pa.Table:
        acc = np.zeros(nbytes, dtype=np.uint8)
        for buf in g.column("bitmap").to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint8)
        return pa.table(
            {"shard": g.column("shard").slice(0, 1),
             "bitmap": pa.array([acc.tobytes()], pa.binary())}
        )

    reduced = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(or_reduce, batch_format="pyarrow")
        .take_all()
    )
    refs: list = [None] * num_shards
    empty = None
    for row in reduced:
        refs[int(row["shard"])] = ray.put(np.frombuffer(row["bitmap"], dtype=np.uint8))
    for s in range(num_shards):
        if refs[s] is None:  # shard no key hashed to: provably-empty filter
            if empty is None:
                empty = ray.put(np.zeros(nbytes, dtype=np.uint8))
            refs[s] = empty
    return refs


def bloom_build(ds: ray.data.Dataset, key_col: str) -> np.ndarray:
    """Distributed Bloom build: each batch task emits its own 16 KiB bitmap;
    the driver ORs the per-block partials (driver traffic = blocks × 16 KiB,
    never rows). Returns the packed uint8 bitmap."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(BLOOM_BITS, dtype=bool)
        pos = _bloom_positions(b[key_col].to_numpy(np.int64))
        bits[pos.ravel()] = True
        return pd.DataFrame({"bitmap": [np.packbits(bits).tobytes()]})

    packed = ds.map_batches(partial, batch_format="pandas").take_all()
    out = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
    for row in packed:
        out |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return out


class BloomPrune:
    """Fact-side filter: the broadcast bitmap is fetched once at
    construction (driver-side when passed as an instance — the 16 KiB
    filter serializes into the task spec and ships once per worker), and
    membership is tested vectorized per batch.
    Keeps false positives — the downstream exact join removes them — and
    guarantees zero false negatives by Bloom construction."""

    def __init__(self, bitmap_ref, key_col: str):
        self.bits = np.unpackbits(ray.get(bitmap_ref)).astype(bool)
        self.key_col = key_col

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        pos = _bloom_positions(b[self.key_col].to_numpy(np.int64))
        return b[self.bits[pos].all(axis=0)]


def bloom_semijoin_revenue(sf_dir: str, segment: str = "BUILDING") -> pd.DataFrame:
    """Orders placed by customers of one market segment: revenue + count by
    order priority, as a Bloom-pruned semi-join.

    Scale shape: at 100 TB the dim side may be too large to broadcast as an
    exact hash set, but its 16 KiB Bloom bitmap always broadcasts. The fact
    table is pruned to ~|matches| + FP rows BEFORE the only shuffle (the
    verification hash join), so exchange volume tracks the match rate, not
    the fact size. Money sums are exact scaled-int64 cents (order-independent
    — same bit-exactness discipline as q1)."""
    dim = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).filter(expr=f"c_mktsegment == '{segment}'")
    dim_keys = dim.select_columns(["c_custkey"])
    bitmap_ref = ray.put(bloom_build(dim_keys, "c_custkey"))

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority", "o_totalprice"]
    )
    survivors = orders.map_batches(
        BloomPrune(bitmap_ref, "o_custkey"), batch_format="pandas"
    )

    def to_cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": b["o_custkey"],
                "o_orderpriority": b["o_orderpriority"],
                "cents": np.round(b["o_totalprice"].to_numpy() * 100.0).astype(np.int64),
            }
        )

    verified = safe_join(
        survivors.map_batches(to_cents, batch_format="pandas"),
        dim_keys,
        join_type="inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    out = (
        verified.groupby("o_orderpriority")
        .aggregate(
            Count(alias_name="n_orders"), Sum("cents", alias_name="revenue_cents")
        )
        .to_pandas()
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005), integer-exact variant
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024  # 4 KiB of int64 counters per partial — fixed size


def _cms_hash(tokens: pd.Series, row: int) -> np.ndarray:
    """Row-j bucket of each token: top-8-byte md5 of 'j:token' mod width —
    the same hash DuckDB computes as
    ``('0x' || substr(md5(j || ':' || token), 1, 16))::UBIGINT % width``."""
    pre = f"{row}:"
    return (_hll_hash64(pre + tokens.astype(str)) % CMS_WIDTH).astype(np.int64)


def _cms_partial(batch: pd.DataFrame, text_col: str) -> pd.DataFrame:
    """Per-batch CMS combiner over whitespace-normalized tokens: emits
    (row, bucket, cnt) register increments — ≤ depth×width rows per batch
    regardless of input size. Tokens are de-duplicated per batch before
    hashing so md5 runs once per distinct token, not per occurrence."""
    # dropna, NOT fillna: the DuckDB oracle's unnest(string_split(NULL))
    # emits zero rows for a null document; fillna would manufacture a ''
    # token per null and break bit parity
    norm = batch[text_col].dropna().str.replace(r"\s+", " ", regex=True)
    counts = norm.str.split(" ").explode().value_counts()
    if not len(counts):
        return pd.DataFrame(
            {
                "row": pd.Series(dtype="int64"),
                "bucket": pd.Series(dtype="int64"),
                "cnt": pd.Series(dtype="int64"),
            }
        )
    toks = counts.index.to_series().astype(str)
    n = counts.to_numpy(np.int64)
    frames = []
    for j in range(CMS_DEPTH):
        b = _cms_hash(toks, j)
        reg = np.zeros(CMS_WIDTH, dtype=np.int64)
        np.add.at(reg, b, n)
        nz = np.nonzero(reg)[0]
        frames.append(
            pd.DataFrame({"row": np.int64(j), "bucket": nz, "cnt": reg[nz]})
        )
    return pd.concat(frames, ignore_index=True)


def cms_registers(ds: ray.data.Dataset, text_col: str = "text") -> pd.DataFrame:
    """Distributed CMS build: fixed-size per-batch partials → one tiny
    groupby-sum merge (registers are additive — union of sketches = sum of
    their register tables, the same mergeability story as the HLL max)."""
    regs = (
        ds.map_batches(
            lambda b: pa.Table.from_pandas(
                _cms_partial(b, text_col), preserve_index=False
            ),
            batch_format="pandas",
        )
        .groupby(["row", "bucket"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    return regs.astype({"row": "int64", "bucket": "int64", "cnt": "int64"})


def cms_token_freq(sf_dir: str, probe_every: int = 100) -> pd.DataFrame:
    """Estimated corpus-wide token frequencies for a deterministic probe set
    (the distinct tokens of every ``probe_every``-th document): point-query
    heavy-hitter estimation from a 16 KiB mergeable sketch instead of a full
    token shuffle. Estimate = min over depth rows of the probed register —
    integer-only, so the DuckDB oracle reproduces it bit-for-bit (CMS
    one-sided error: estimate ≥ true count, verified in pytest)."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    regs = cms_registers(docs)  # register build touches only text
    lut = {
        (int(r), int(b)): int(c)
        for r, b, c in zip(regs["row"], regs["bucket"], regs["cnt"])
    }

    def probe_tokens(b: pd.DataFrame) -> pd.DataFrame:
        sel = b[b["doc_id"] % probe_every == 0]
        norm = sel["text"].dropna().str.replace(r"\s+", " ", regex=True)
        toks = norm.str.split(" ").explode().dropna().unique()
        return pd.DataFrame({"token": pd.Series(toks, dtype="object")})

    # probe-set extraction stays distributed: each batch ships only its
    # DEDUPED token strings, never document text, to the driver
    probe_rows = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(probe_tokens, batch_format="pandas").take_all()
    probes = sorted({r["token"] for r in probe_rows})
    # vectorized probe: ONE _cms_hash call per depth row over the whole
    # probe series (not a fresh Series + fromiter per token per row)
    pser = pd.Series(probes, dtype="object")
    est = np.full(len(probes), np.iinfo(np.int64).max, dtype=np.int64)
    for j in range(CMS_DEPTH):
        buckets = _cms_hash(pser, j)
        row_est = np.fromiter(
            (lut.get((j, int(b)), 0) for b in buckets), dtype=np.int64, count=len(probes)
        )
        est = np.minimum(est, row_est)
    if not len(probes):
        est = np.array([], dtype=np.int64)
    return pd.DataFrame({"token": probes, "est_count": pd.Series(est, dtype="int64")})


def cms_oracle_sql(table: str = "documents", probe_every: int = 100) -> str:
    """DuckDB SQL computing the identical registers and min-estimates."""
    return rf"""
WITH toks AS (
  SELECT unnest(string_split(regexp_replace(text, '\s+', ' ', 'g'), ' ')) AS token
  FROM {table}
), rows_j AS (
  SELECT * FROM (VALUES (0), (1), (2), (3)) AS r(j)
), regs AS (
  SELECT j AS row,
         CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || token), 1, 16))::UBIGINT
              % {CMS_WIDTH} AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks, rows_j GROUP BY 1, 2
), probes AS (
  SELECT DISTINCT unnest(string_split(regexp_replace(text, '\s+', ' ', 'g'), ' ')) AS token
  FROM {table} WHERE doc_id % {probe_every} = 0
)
SELECT p.token,
       CAST(MIN(r.cnt) AS BIGINT) AS est_count
FROM probes p
JOIN rows_j ON TRUE
JOIN regs r
  ON r.row = rows_j.j
 AND r.bucket = CAST(('0x' || substr(md5(CAST(rows_j.j AS VARCHAR) || ':' || p.token), 1, 16))::UBIGINT
                     % {CMS_WIDTH} AS BIGINT)
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# KLL-style mergeable quantile sketch (Karnin, Lang, Liberty 2016)
# ---------------------------------------------------------------------------

KLL_DEFAULT_K = 200


class KllSketch:
    """Deterministic KLL-style quantile compactor: level *i* holds items of
    weight 2^i; an over-capacity level sorts itself and promotes every other
    item to the level above (odd leftover stays behind). Per-level capacity
    shrinks geometrically (×2/3) below the top level, so total memory is
    O(k) regardless of stream length, and two sketches merge by levelwise
    concatenation + recompaction — the partial-aggregate discipline every
    sketch in this module follows.

    Deviations from the paper, both deliberate: the compaction coin is a
    deterministic per-level alternation instead of a random bit (replay /
    resume must be bit-stable; the randomized worst-case bound degrades to
    an average-case one, pinned by the rank-error test), and with
    ``k >= n`` nothing ever compacts, so the sketch is EXACT — the gate
    query runs in that exact-recall configuration (the module's standard
    trick) while the scale path uses k=200.

    Quantile rule = DuckDB ``quantile_disc``: value at weighted rank
    ``ceil(q*n) - 1`` (0-based), matching `price_percentiles`."""

    def __init__(self, k: int = KLL_DEFAULT_K):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self._coin: list[int] = [0]

    def _cap(self, lvl: int) -> int:
        h = len(self.levels)
        return max(int(np.ceil(self.k * (2.0 / 3.0) ** (h - 1 - lvl))), 8)

    def _add_level(self) -> None:
        self.levels.append(np.empty(0, np.float64))
        self._coin.append(0)

    def update_many(self, vals) -> None:
        v = np.asarray(vals, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size:
            self.levels[0] = np.concatenate([self.levels[0], v])
            self._compress()

    def merge(self, other: "KllSketch") -> None:
        while len(self.levels) < len(other.levels):
            self._add_level()
        for i, arr in enumerate(other.levels):
            if arr.size:
                self.levels[i] = np.concatenate([self.levels[i], arr])
        self._compress()

    def _compress(self) -> None:
        changed = True
        while changed:
            changed = False
            for i in range(len(self.levels)):
                arr = self.levels[i]
                if arr.size <= self._cap(i) or arr.size < 2:
                    continue
                arr = np.sort(arr)
                m = arr.size - (arr.size % 2)
                off = self._coin[i]
                self._coin[i] ^= 1
                if i + 1 == len(self.levels):
                    self._add_level()
                self.levels[i + 1] = np.concatenate(
                    [self.levels[i + 1], arr[off:m:2]]
                )
                self.levels[i] = arr[m:]  # odd leftover stays at this level
                changed = True

    # -- query / interchange ------------------------------------------------

    def items(self) -> tuple[np.ndarray, np.ndarray]:
        vals = np.concatenate([a for a in self.levels if a.size] or [np.empty(0)])
        wts = np.concatenate(
            [np.full(a.size, 1 << i, dtype=np.int64) for i, a in enumerate(self.levels) if a.size]
            or [np.empty(0, np.int64)]
        )
        return vals, wts

    @property
    def n(self) -> int:
        return int(sum(a.size << i for i, a in enumerate(self.levels)))

    def quantile(self, q: float) -> float:
        vals, wts = self.items()
        if not vals.size:
            return float("nan")
        order = np.argsort(vals, kind="stable")
        cum = np.cumsum(wts[order])
        rank = max(int(np.ceil(q * cum[-1])) - 1, 0)
        idx = int(np.searchsorted(cum, rank + 1, side="left"))
        return float(vals[order][min(idx, vals.size - 1)])

    def to_table(self) -> pa.Table:
        vals, _ = self.items()
        lvls = np.concatenate(
            [np.full(a.size, i, dtype=np.int64) for i, a in enumerate(self.levels) if a.size]
            or [np.empty(0, np.int64)]
        )
        return pa.table({"level": pa.array(lvls), "value": pa.array(vals, pa.float64())})

    @classmethod
    def from_rows(cls, levels: np.ndarray, values: np.ndarray, k: int) -> "KllSketch":
        sk = cls(k)
        if len(levels):
            for lvl in range(int(np.max(levels)) + 1):
                while len(sk.levels) <= lvl:
                    sk._add_level()
                sk.levels[lvl] = values[levels == lvl].astype(np.float64)
            sk._compress()
        return sk


def kll_quantiles(
    sf_dir: str,
    table: str = "lineitem",
    col: str = "l_extendedprice",
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95, 0.99),
    k: int | None = None,
) -> pd.DataFrame:
    """Single-pass mergeable quantiles: each ``map_batches`` task emits its
    batch's KLL partial as (level, value) rows — O(k·log(n/k)) rows per
    task, NOT the column — and the driver folds the bounded partials into
    one sketch (the `hll_estimate` driver-side-finish pattern). Where
    `price_percentiles` is the exact two-pass path, this is the one-pass
    fixed-memory path a streaming tail or a per-epoch lineage record can
    afford. ``k=None`` (the gate config) sizes k from the Parquet footer
    row count, so the exact-recall guarantee (no compaction fires ⇒ the
    DuckDB ``quantile_disc`` oracle is bit-exact) SELF-ADJUSTS to any sf
    instead of silently breaking past a fixed k — the price is that the
    gate config's 'bounded partials' are the whole column, which is the
    module's standard exact-recall trade (the scale path passes an
    explicit k and is pinned by the rank-error pytest). A folded-weight
    check asserts the no-compaction invariant actually held."""
    import pyarrow.parquet as pq_
    import ray.data

    exact = k is None
    if exact:
        k = max(int(pq_.read_metadata(f"{sf_dir}/{table}.parquet").num_rows), 1024)
    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])

    def partial(t: pa.Table) -> pa.Table:
        sk = KllSketch(k)
        sk.update_many(np.asarray(t.column(col), dtype=np.float64))
        return sk.to_table()

    rows = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    sk = KllSketch.from_rows(
        rows["level"].to_numpy(), rows["value"].to_numpy(), k
    )
    if exact and sum(a.size for a in sk.levels) != sk.n:
        # retained items < total weight ⇔ some compaction fired ⇔ the
        # quantile_disc oracle is no longer bit-valid; fail loudly rather
        # than hand the gate a silently-approximate answer
        raise AssertionError(
            f"kll_quantiles exact config violated: retained "
            f"{sum(a.size for a in sk.levels)} of n={sk.n}"
        )
    return pd.DataFrame({"q": list(qs), "price": [sk.quantile(q) for q in qs]})


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters (Misra & Gries 1982), in the mergeable-summaries
# form of Agarwal et al. 2013: a capacity-m counter set whose merge is
# pointwise sum followed by subtracting the (m+1)-th largest count and
# clipping at zero. Guarantees after ANY merge tree:
#     true - n/(m+1)  <=  est  <=  true
# so every token with true count > n/(m+1) survives (no false negatives at
# the phi >= 1/(m+1) threshold). The gate runs the exact-recall config
# (capacity >= corpus vocabulary: no compression ever fires, counters are
# exact counts) so the DuckDB GROUP BY oracle is bit-exact; the scale path
# passes a small capacity and is pinned by the error-bound pytest.
# ---------------------------------------------------------------------------

MG_CAPACITY = 4096
# '' can never be a \S+ token: rides each partial's TOTAL token count (the n
# of the error bound) through the same groupby-sum as the counters — no
# second corpus scan, no driver-side total
_MG_TOTAL_KEY = ""


def _mg_compress(
    tokens: np.ndarray, counts: np.ndarray, m: int
) -> tuple[np.ndarray, np.ndarray]:
    """Decrement-and-drop to ≤ m counters: subtract the (m+1)-th largest
    count from the top m and keep the positive remainder."""
    if len(tokens) <= m:
        return tokens, counts
    order = np.argsort(-counts, kind="stable")
    pivot = counts[order[m]]
    keep = order[:m]
    kept = counts[keep] - pivot
    nz = kept > 0
    return tokens[keep][nz], kept[nz]


def _mg_partial(batch: pd.DataFrame, text_col: str, m: int) -> pa.Table:
    """Per-batch MG summary over \\S+ tokens: ≤ m+1 rows out regardless of
    batch size (the +1 is the '' total-count row)."""
    from .text import TOKEN_RE

    vc = batch[text_col].dropna().str.findall(TOKEN_RE).explode().dropna().value_counts()
    total = int(vc.to_numpy().sum())
    toks, cnts = _mg_compress(
        vc.index.to_numpy(dtype=object), vc.to_numpy(np.int64), m
    )
    return pa.table(
        {
            "token": pa.array(list(map(str, toks)) + [_MG_TOTAL_KEY], pa.string()),
            "cnt": pa.array(np.append(cnts, total), pa.int64()),
        }
    )


def mg_summary(
    ds: ray.data.Dataset, text_col: str = "text", capacity: int = MG_CAPACITY
) -> tuple[pd.DataFrame, int]:
    """Distributed MG build → (counter table ≤ capacity rows, total n).

    Shape: per-batch partials are ≤ capacity+1 rows each; ONE groupby-sum
    merges them (pointwise sum — the first half of the MG merge); the final
    subtract-and-clip runs driver-side over the merged table, which is
    bounded by capacity × read-parallelism rows, not by the corpus. For a
    very wide cluster the same compress can run as one more
    repartition+map_batches level (the two-level pattern of
    ``bloom_build_sharded``); at this repo's parallelism the single
    driver-side fold is exact and O(capacity·B)."""
    merged = (
        ds.map_batches(
            lambda b: _mg_partial(b, text_col, capacity), batch_format="pandas"
        )
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    is_total = merged["token"].astype(str) == _MG_TOTAL_KEY
    n = int(merged.loc[is_total, "cnt"].sum())
    body = merged.loc[~is_total]
    toks, cnts = _mg_compress(
        body["token"].to_numpy(dtype=object),
        body["cnt"].to_numpy(np.int64),
        capacity,
    )
    out = pd.DataFrame({"token": pd.Series(toks, dtype="object"), "est_count": cnts})
    return out.reset_index(drop=True), n


def heavy_hitter_tokens(
    sf_dir: str, phi_den: int = 100, capacity: int = MG_CAPACITY
) -> pd.DataFrame:
    """Corpus tokens with frequency ≥ 1/phi_den of all token occurrences,
    by MG summary. The threshold compare is integer-only
    (``est * phi_den >= n``) so the oracle needs no float ceil. At the
    default capacity the synthetic corpus vocabulary fits (exact-recall
    config; asserted), making the SQL GROUP BY + HAVING the true answer."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    summary, n = mg_summary(ds, capacity=capacity)
    if int(summary["est_count"].sum()) != n:
        # some compress fired ⇒ counts are lower bounds ⇒ the GROUP BY
        # oracle is no longer bit-valid; fail loudly (kll_quantiles rule)
        raise AssertionError(
            f"heavy_hitter_tokens exact config violated: retained weight "
            f"{int(summary['est_count'].sum())} of n={n}; raise capacity"
        )
    hot = summary[summary["est_count"].to_numpy(np.int64) * phi_den >= n].copy()
    hot = hot.sort_values(
        ["est_count", "token"], ascending=[False, True], kind="stable"
    ).reset_index(drop=True)
    hot["est_count"] = hot["est_count"].astype("int64")
    return hot


# Linear-counting hybrid (classic HLL small-range correction). Raw HLL's
# floor is ~alpha*m for near-empty sketches, so small cardinalities need
# the filled-register count V instead: n ≈ m*ln(m/(m-V)). The log would
# break integer parity with the SQL oracle, so the inversion is a
# precomputed V → n table embedded in BOTH sides — the oracle SQL is
# generated from this same in-process list (hll_lc_values_sql), so the two
# sides agree by construction on any platform. V = m falls back to raw.
HLL_LC_TABLE = [
    round(HLL_M * math.log(HLL_M / (HLL_M - v))) for v in range(HLL_M)
]


def hll_estimate_corrected(registers: pd.DataFrame, group_col: str) -> pd.DataFrame:
    """:func:`hll_estimate` with the linear-counting switch: when the raw
    estimate is ≤ 5m/2 and some register is empty, report the LC table
    value for the filled-register count — the textbook HLL hybrid, kept
    bit-reproducible in SQL via the shared lookup table."""
    out = hll_estimate(registers, group_col)
    v = out["n_registers"].to_numpy(np.int64)
    raw = out["est_distinct"].to_numpy(np.int64)
    use_lc = (v < HLL_M) & (raw <= 5 * HLL_M // 2)
    lc = np.array([HLL_LC_TABLE[int(x)] if x < HLL_M else 0 for x in v], dtype=np.int64)
    out["est_distinct"] = np.where(use_lc, lc, raw).astype("int64")
    return out


def hll_lc_values_sql() -> str:
    """``(VALUES (0,0),(1,1),...)`` rendering of HLL_LC_TABLE for joining
    inside an oracle query — one row per filled-register count."""
    return "(VALUES " + ", ".join(
        f"({v}, {n})" for v, n in enumerate(HLL_LC_TABLE)
    ) + ")"
