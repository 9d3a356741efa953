"""Stateful decoder-catalog stage — the ST1 analog for the CDC path.

The reference builds an ``ErcEventCatalog`` once per worker (22 ERC + 7 SFC
ABI events keyed by ``(selector, n_topics)``, ``events/erc.rs:13-180``) and
uses it to decode logs, silently skipping unknown events and erroring on
malformed ones (``transformation/common.rs:309-496``). Our analog: a
language/extension catalog built once per actor that normalizes the ``lang``
column from the path extension, flags mismatches, and classifies content —
the same shape: broadcast-small-side lookup state living in ``__init__`` of a
callable class run with ``map_batches(..., concurrency=N)``.

Catalog conflict policy mirrors ``compare_events`` (``events/compare.rs``):
inserting an extension twice with the same lang is ignored; with a different
lang it raises at catalog build (actor init) time.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_EXT_LANGS: dict[str, str] = {
    "py": "python",
    "rs": "rust",
    "go": "go",
    "js": "javascript",
    "ts": "typescript",
    "md": "markdown",
    "c": "c",
    "h": "c",
    "cc": "cpp",
    "cpp": "cpp",
    "java": "java",
    "rb": "ruby",
    "sh": "shell",
    "yaml": "config",
    "yml": "config",
    "toml": "config",
    "json": "config",
}


class CatalogConflictError(ValueError):
    """Two catalog entries disagree (the MismatchedParamIndexing analog)."""


class LangCatalog:
    """ext → canonical lang catalog with conflict-checked construction."""

    def __init__(self, entries: dict[str, str] | None = None, extra: dict[str, str] | None = None):
        self.map: dict[str, str] = {}
        for src in (entries or DEFAULT_EXT_LANGS, extra or {}):
            for ext, lang in src.items():
                self.add(ext, lang)

    def add(self, ext: str, lang: str) -> None:
        old = self.map.get(ext)
        if old is None:
            self.map[ext] = lang
        elif old != lang:  # same key, different decoding → hard error
            raise CatalogConflictError(f"extension {ext!r}: {old!r} vs {lang!r}")
        # identical re-insert: ignored (ExactlyEqual/SameDecoding)

    def lookup(self, ext: str) -> str | None:
        return self.map.get(ext)


class LangNormalizer:
    """Actor-pool stage: catalog built ONCE per actor in ``__init__``;
    per-batch vectorized lookup in ``__call__``.

    Adds ``lang_norm`` (canonical lang from the path extension; unknown
    extensions keep the event's own ``lang`` — the silent-skip path) and
    ``lang_mismatch`` (event lang ≠ catalog lang — the QC flag).
    """

    def __init__(self, extra_entries: dict[str, str] | None = None):
        self.catalog = LangCatalog(extra=extra_entries)
        # vectorization support: a dictionary-encode join table
        self._exts = pa.array(list(self.catalog.map.keys()), pa.string())
        self._langs = pa.array(list(self.catalog.map.values()), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        path = batch.column("path")
        # extension = text after the last '.' in the basename (null when none)
        ext_struct = pc.extract_regex(path, r"\.(?P<ext>[^./\\]+)$")
        ext = pc.struct_field(ext_struct, "ext")
        idx = pc.index_in(ext, value_set=self._exts)
        norm = pc.take(self._langs, idx)  # null where unknown
        lang = batch.column("lang")
        lang_norm = pc.coalesce(norm, lang)
        mismatch = pc.fill_null(
            pc.and_(pc.is_valid(norm), pc.not_equal(norm, lang)), False
        )
        batch = batch.append_column("lang_norm", lang_norm)
        return batch.append_column("lang_mismatch", mismatch)
