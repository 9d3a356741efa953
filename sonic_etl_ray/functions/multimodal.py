"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata columns beside them. The Ray-side plumbing — schemas, actor-pool
stage signatures, small-batch sizing for wide rows, output layout — is real
and tested; the actual codec work is STUBBED (the decode libraries are not
in this container): ``DecodeStub`` raises ``NotImplementedError`` unless
constructed with ``fake=True``, in which case it produces a deterministic
fake feature vector so the distributed plumbing can be exercised end-to-end.

Wide-row guidance (SURVEY.md §7.5): binary payloads make rows KBs–MBs, so
stages here default to small ``batch_size`` and callers should raise
``DataContext.target_max_block_size`` rather than letting blocks split
absurdly small.
"""

from __future__ import annotations

import hashlib

import numpy as np

import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64(), nullable=False),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("mime", pa.string()),
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 16


def synth_media_table(n: int = 64, seed: int = 0) -> pa.Table:
    """Deterministic fake media rows for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[rng.integers(0, 3, n)]
    payloads = [rng.bytes(int(64 + 512 * rng.random())) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds, pa.string()),
            "mime": pa.array(["application/octet-stream"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rng.integers(16, 512, n, dtype=np.int32)),
            "height": pa.array(rng.integers(16, 512, n, dtype=np.int32)),
            "duration_ms": pa.array(rng.integers(0, 10_000, n, dtype=np.int32)),
        }
    )


class DecodeStub:
    """Actor-pool decode/feature-extract stage (signature is production-real).

    With ``fake=False`` (default): raises NotImplementedError — the decode
    libraries (PIL/ffmpeg/torchaudio) are not available in this container.
    With ``fake=True``: emits a deterministic FEATURE_DIM-float vector from
    sha256(payload), preserving all plumbing semantics (arrow list column
    out, per-actor init, small batches).
    """

    def __init__(self, fake: bool = False):
        self.fake = fake

    def _features(self, payload: bytes) -> np.ndarray:
        digest = hashlib.sha256(payload).digest()
        raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
        return (raw % 1000).astype(np.float32) / 1000.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "media decode requires codec libraries not present in this container; "
                "construct DecodeStub(fake=True) for the deterministic test path"
            )
        import pyarrow.compute as pc

        payloads = batch.column("payload").to_pylist()
        feats = [self._features(p) for p in payloads]
        cols = {
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            "payload_sha256": pa.array(
                [hashlib.sha256(p).hexdigest() for p in payloads], pa.string()
            ),
            # decoders report sizes; downstream accounting needs them
            "payload_bytes": pc.cast(pc.binary_length(batch.column("payload")), pa.int64()),
        }
        # metadata columns ride along (a production pipeline must not drop
        # the keys/labels it later aggregates or joins on)
        for name in batch.schema.names:
            if name not in cols and name != "payload":
                cols[name] = batch.column(name)
        return pa.table(cols)


def extract_features(ds: ray.data.Dataset, fake: bool = True, batch_size: int = 16) -> ray.data.Dataset:
    """Feature-extraction pipeline stage: actor pool, small batches for wide
    binary rows, arrow-native list<float> output."""
    return ds.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
        num_cpus=1,
    )


def media_payload_stats(sf_dir: str) -> "pd.DataFrame":  # noqa: F821
    """Per-source media accounting through the FULL multimodal path.

    Drives the production plumbing end-to-end on deterministic payloads:
    the ``documents`` table's utf-8 text bytes stand in for opaque media
    blobs (zero-copy ``cast(string → binary)``), flow through the
    actor-pool decode stage (:class:`DecodeStub`, fake deterministic
    decode), and are aggregated per source label: item count, distinct
    payload count (content-hash dedup, the A1–A4 count-invariant shape),
    and total payload bytes. Two groupbys, both on (source, hash) →
    (source): the per-hash pre-aggregate bounds the second shuffle to
    unique payloads, the same combiner discipline as the ingest path."""
    import pandas as pd
    import pyarrow.compute as pc2
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def to_media(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": t["doc_id"],
                "kind": pa.array(["doc"] * len(t), pa.string()),
                "payload": pc2.cast(t["text"], pa.binary()),  # utf-8 bytes, zero-copy
                "source": t["source"],
            }
        )

    feats = extract_features(ds.map_batches(to_media, batch_format="pyarrow"), fake=True)
    per_hash = feats.select_columns(["source", "payload_sha256", "payload_bytes"]).groupby(
        ["source", "payload_sha256"]
    ).aggregate(Count(alias_name="n_dup"), Sum("payload_bytes", alias_name="bytes_all"))
    out = (
        per_hash.groupby("source")
        .aggregate(
            Sum("n_dup", alias_name="n_media"),
            Count(alias_name="n_unique_payloads"),
            Sum("bytes_all", alias_name="total_bytes"),
        )
        .to_pandas()
    )
    return out.sort_values("source").reset_index(drop=True)


class FrameSampler:
    """Actor-pool frame-sampling stage: treat each opaque payload as
    fixed-``frame_bytes`` windows and keep every ``stride``-th (deterministic
    temporal subsampling — the video frame-sample analog that needs no codec:
    real decoders replace the windowing, the Ray plumbing is identical).
    Emits per item the frame count, sampled count/bytes, and the sha256 of
    the concatenated sample for integrity. Per-item slicing is inherent to
    the media class (payload-proportional work in an actor pool, small
    batches — same sizing discipline as DecodeStub)."""

    def __init__(self, frame_bytes: int = 16, stride: int = 4):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        import hashlib

        fb, st = self.frame_bytes, self.stride
        ids, n_frames, n_sampled, s_bytes, digests = [], [], [], [], []
        payloads = t.column("payload").to_pylist()
        for mid, p in zip(t.column("media_id").to_pylist(), payloads):
            p = p or b""
            nf = (len(p) + fb - 1) // fb
            h = hashlib.sha256()
            ns = sb = 0
            for i in range(0, nf, st):
                fr = p[i * fb : i * fb + fb]
                h.update(fr)
                ns += 1
                sb += len(fr)
            ids.append(mid)
            n_frames.append(nf)
            n_sampled.append(ns)
            s_bytes.append(sb)
            digests.append(h.hexdigest())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "n_frames": pa.array(n_frames, pa.int64()),
                "n_sampled": pa.array(n_sampled, pa.int64()),
                "sampled_bytes": pa.array(s_bytes, pa.int64()),
                "sample_sha256": pa.array(digests, pa.string()),
            }
        )


def media_frame_sample(sf_dir: str) -> "pd.DataFrame":  # noqa: F821
    """Frame-sample every document payload (utf-8 bytes standing in for
    opaque media — ASCII corpus, so the SQL oracle's codeunit windows are
    the same bytes) through the actor-pool sampler; shuffle-free."""
    import pandas as pd
    import pyarrow.compute as pc2

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def to_media(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": t["doc_id"],
                "payload": pc2.cast(t["text"], pa.binary()),
            }
        )

    out = (
        ds.map_batches(to_media, batch_format="pyarrow")
        .map_batches(
            FrameSampler, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
        )
        .to_pandas()
    )
    return out.sort_values("media_id").reset_index(drop=True)


class ResizeStub:
    """Actor-pool image/frame resize stage (signature is production-real:
    target dims in ``__init__`` — the per-actor state — small batches, Arrow
    in/out, metadata pass-through).

    With ``fake=False`` (default): raises NotImplementedError — the imaging
    libraries (PIL/opencv) are not in this container. With ``fake=True``:
    deterministic byte-grid subsample standing in for the interpolation —
    the payload is treated as a ``height × width`` byte grid (row-major,
    padded) and sampled at ``target_h × target_w`` nearest-neighbor
    positions, so output payload size, dims metadata, and plumbing are
    exactly what a real resize produces."""

    def __init__(self, target_w: int = 32, target_h: int = 32, fake: bool = False):
        self.tw, self.th, self.fake = target_w, target_h, fake

    def _resize(self, payload: bytes, w: int, h: int) -> bytes:
        grid = np.frombuffer(payload, dtype=np.uint8)
        need = w * h
        if len(grid) < need:
            grid = np.pad(grid, (0, need - len(grid)))
        grid = grid[:need].reshape(h, w)
        ys = (np.arange(self.th) * h) // self.th
        xs = (np.arange(self.tw) * w) // self.tw
        return grid[np.ix_(ys, xs)].tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "media resize requires imaging libraries not present in this "
                "container; construct ResizeStub(fake=True) for the "
                "deterministic test path"
            )
        payloads = batch.column("payload").to_pylist()
        ws = batch.column("width").to_pylist()
        hs = batch.column("height").to_pylist()
        out = [self._resize(p, int(w), int(h)) for p, w, h in zip(payloads, ws, hs)]
        cols = {
            "media_id": batch.column("media_id"),
            "payload": pa.array(out, pa.binary()),
            "width": pa.array([self.tw] * len(out), pa.int32()),
            "height": pa.array([self.th] * len(out), pa.int32()),
        }
        for name in batch.schema.names:
            if name not in cols:
                cols[name] = batch.column(name)
        return pa.table(cols)


def resize_media(
    ds: ray.data.Dataset, target_w: int = 32, target_h: int = 32,
    fake: bool = True, batch_size: int = 16,
) -> ray.data.Dataset:
    """Resize every media row to (target_w, target_h): actor pool, small
    byte-heavy batches — same sizing discipline as extract_features."""
    return ds.map_batches(
        ResizeStub,
        fn_constructor_args=(target_w, target_h, fake),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )
