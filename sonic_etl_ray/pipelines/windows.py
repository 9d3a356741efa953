"""Watermark-gated tumbling-window aggregates over the change stream.

The streaming-window operator for the tail (SURVEY §2.8 family): windows
tile the LSN axis (the stream's native event-time, dense and monotone —
``sonic_config/mod.rs:264``'s block-number clock), and a window finalizes
EXACTLY ONCE when the lake's applied watermark passes the window end plus
the allowed lateness. Finalized windows are published as idempotent
per-window Parquet artifacts under the lake's ``_views`` dir with an
atomic manifest, so a killed tick re-runs as a no-op and a restarted
tailer resumes where it left off — the same commit discipline as the
merge path, applied to a derived view.

Scale shape: a refresh reads ONLY the segments whose footer LSN range
overlaps the newly finalized span (parquet row-group stats prune inside
the files too), aggregates them with a per-batch Arrow combiner into
fixed-size (window, group) partials, and one small hash groupby reduces
the partials — per-tick cost is O(new windows), never O(stream). The
watermark comes from the epoch manifests alone (no data reads): epochs
apply in stream order, so the committed frontier's ``applied_lsn_max`` is
the exact applied-prefix bound. Out-of-order admin/backfill epochs are
the caller's signal to pick a non-zero ``lateness``.
"""

from __future__ import annotations

import json
import os
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..state import commitlog as cl


def applied_watermark(lake_dir: str) -> int:
    """The exact applied-prefix bound: every event with ``lsn <=`` this is
    in the lake. Read from the committed frontier's manifest only (epochs
    apply in stream order; a partially-committed in-flight epoch never
    advances the frontier). -1 on an empty lake."""
    from .ingest import committed_frontier

    e = committed_frontier(lake_dir)
    if e is None:
        return -1
    m = cl.read_manifest(lake_dir, e) or {}
    return int(m.get("applied_lsn_max", -1))


def _segment_lsn_range(path: str) -> tuple[int, int] | None:
    """(min, max) of the segment's ``lsn`` column from the Parquet footer —
    a stats-only read, no data pages touched."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    lo, hi = None, None
    for rg in range(md.num_row_groups):
        row = md.row_group(rg)
        for ci in range(row.num_columns):
            col = row.column(ci)
            if col.path_in_schema == "lsn" and col.statistics is not None:
                s = col.statistics
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
    if lo is None:
        return None
    return int(lo), int(hi)


class TumblingWindowView:
    """Finalized tumbling-window aggregates (``n_events``, ``n_deletes``
    per ``group_col``) maintained incrementally under the lake.

    Layout: ``<lake>/_views/win-<group>-w<W>-l<L>/window=<K>.parquet`` plus
    ``VIEW.json`` recording ``next_window`` (the first not-yet-final id).
    Window files are written tmp+rename BEFORE the manifest advances, and
    their content is a deterministic function of the stream, so any crash
    point replays idempotently; readers see only manifest-listed windows.
    """

    def __init__(
        self,
        lake_dir: str,
        window: int,
        lateness: int = 0,
        group_col: str = "repo",
        view_root: str | None = None,
    ):
        """``view_root`` relocates the published view (default: under the
        lake's ``_views``) — for read-only lake storage or shared lakes."""
        if window <= 0:
            raise ValueError("window must be positive")
        self.lake_dir = lake_dir
        self.window = int(window)
        self.lateness = int(lateness)
        self.group_col = group_col
        self.view_dir = os.path.join(
            view_root or os.path.join(lake_dir, "_views"), self._view_name()
        )

    def _view_name(self) -> str:
        return f"win-{self.group_col}-w{self.window}-l{self.lateness}"

    def _columns(self) -> list[str]:
        """Stream columns the aggregate needs (read/prune set)."""
        return ["lsn", "op", self.group_col]

    def _window_sort_keys(self) -> list[tuple[str, str]]:
        """Within-window deterministic output order."""
        return [(self.group_col, "ascending")]

    # ------------------------------------------------------------ manifest

    def _manifest_path(self) -> str:
        return os.path.join(self.view_dir, "VIEW.json")

    def next_window(self) -> int:
        try:
            with open(self._manifest_path()) as f:
                return int(json.load(f)["next_window"])
        except (FileNotFoundError, ValueError, KeyError):
            return 0

    def finalizable(self) -> int:
        """First window id NOT yet final under the current watermark: window
        K covers [K*W, (K+1)*W) and finalizes when
        ``(K+1)*W + lateness <= watermark + 1``."""
        wm = applied_watermark(self.lake_dir)
        return max(0, (wm + 1 - self.lateness) // self.window)

    # ------------------------------------------------------------- refresh

    def refresh(self, stream: "list[str] | ray.data.Dataset") -> dict[str, Any]:
        """Finalize every newly finalizable window from ``stream`` (the
        segment file list — pruned by footer LSN stats — or an equivalent
        Dataset with ``lsn``/``op``/group columns for in-memory sources).
        Returns {"windows_finalized": n, "next_window": k}."""
        done, hi = self.next_window(), self.finalizable()
        if hi <= done:
            return {"windows_finalized": 0, "next_window": done}
        lo_lsn, hi_lsn = done * self.window, hi * self.window
        flt = (pc.field("lsn") >= lo_lsn) & (pc.field("lsn") < hi_lsn)
        if isinstance(stream, list):
            files = []
            for f in stream:
                rng = _segment_lsn_range(f)
                if rng is not None and rng[0] < hi_lsn and rng[1] >= lo_lsn:
                    files.append(f)
            if not files:
                ds = ray.data.from_arrow(self._empty_partials())
            else:
                ds = ray.data.read_parquet(
                    files, columns=self._columns(), filter=flt
                )
        else:
            ds = stream.filter(expr=f"lsn >= {lo_lsn} and lsn < {hi_lsn}")

        out = self._aggregate(ds)
        # per-window files, tmp+rename, BEFORE the manifest advance
        import pyarrow.parquet as pq

        os.makedirs(self.view_dir, exist_ok=True)
        for k in range(done, hi):
            wt = (
                out.filter(pc.equal(out.column("window_id"), k))
                if out.num_rows
                else self._empty_partials()
            )
            wt = wt.cast(self._schema())
            wt = wt.take(pc.sort_indices(wt, sort_keys=self._window_sort_keys()))
            path = os.path.join(self.view_dir, f"window={k:08d}.parquet")
            pq.write_table(wt, path + ".tmp")
            os.replace(path + ".tmp", path)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "next_window": hi,
                    "window": self.window,
                    "lateness": self.lateness,
                    "group_col": self.group_col,
                },
                f,
            )
        os.replace(tmp, self._manifest_path())
        return {"windows_finalized": hi - done, "next_window": hi}

    def _count_empty(self) -> pa.Table:
        """Empty COUNT-partial table — the internal schema of
        :meth:`_aggregate`'s stream, which subclasses overriding only
        :meth:`_schema` (e.g. the top-k view) must not disturb."""
        return pa.schema(
            [
                ("window_id", pa.int64()),
                (self.group_col, pa.string()),
                ("n_events", pa.int64()),
                ("n_deletes", pa.int64()),
            ]
        ).empty_table()

    def _aggregate(self, ds: "ray.data.Dataset") -> pa.Table:
        """Reduce the pruned stream slice to one output row set
        (``window_id`` + count columns); subclasses override or post-fold."""
        W, group_col = self.window, self.group_col

        def partials(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return self._count_empty()
            win = pc.cast(
                pc.floor(pc.divide(pc.cast(t.column("lsn"), pa.float64()), W)),
                pa.int64(),
            )
            is_del = pc.cast(
                pc.equal(t.column("op"), pa.scalar("delete")), pa.int64()
            )
            g = pa.table(
                {
                    "window_id": win,
                    group_col: t.column(group_col),
                    "one": pa.array([1] * t.num_rows, pa.int64()),
                    "del_": is_del,
                }
            ).group_by(["window_id", group_col]).aggregate(
                [("one", "sum"), ("del_", "sum")]
            )
            return g.rename_columns(
                ["window_id", group_col, "n_events", "n_deletes"]
            )

        from ray.data.aggregate import Sum

        agg = (
            ds.map_batches(partials, batch_format="pyarrow")
            .groupby(["window_id", group_col])
            .aggregate(
                Sum("n_events", alias_name="n_events"),
                Sum("n_deletes", alias_name="n_deletes"),
            )
        )
        pdf = agg.to_pandas()
        cols = ["window_id", self.group_col, "n_events", "n_deletes"]
        if pdf.empty or any(c not in pdf.columns for c in cols):
            return self._empty_partials()
        return pa.Table.from_pandas(pdf[cols], preserve_index=False)

    # --------------------------------------------------------------- reads

    def _schema(self) -> pa.Schema:
        return pa.schema(
            [
                ("window_id", pa.int64()),
                (self.group_col, pa.string()),
                ("n_events", pa.int64()),
                ("n_deletes", pa.int64()),
            ]
        )

    def _empty_partials(self) -> pa.Table:
        return self._schema().empty_table()

    def read(self) -> ray.data.Dataset:
        """Finalized windows as a Dataset (manifest-listed files only)."""
        n = self.next_window()
        files = [
            os.path.join(self.view_dir, f"window={k:08d}.parquet")
            for k in range(n)
        ]
        if not files:
            return ray.data.from_arrow(self._empty_partials())
        return ray.data.read_parquet(files)

    def table(self) -> pa.Table:
        """All finalized windows as one sorted Arrow table (view-sized)."""
        refs = [t for t in ray.get(self.read().to_arrow_refs()) if t.num_rows]
        if not refs:
            return self._empty_partials()
        t = pa.concat_tables([r.cast(self._schema()) for r in refs])
        return t.take(
            pc.sort_indices(
                t,
                sort_keys=[("window_id", "ascending")] + self._window_sort_keys(),
            )
        )


class TumblingQuantileView(TumblingWindowView):
    """Per-window payload-size quantiles of the change stream via the KLL
    sketch (:class:`~sonic_etl_ray.functions.sketch.KllSketch`): each batch
    emits bounded ``(window_id, level, value)`` partial rows, the driver
    folds one sketch per finalized window (rows ≤ windows × batches × k —
    view-sized, never the stream). Deletes carry no payload and are
    excluded, matching the oracle's ``content IS NOT NULL``.

    A tumbling window bounds its own population — W consecutive LSNs hold
    at most W events — so the default ``k = window`` makes every window's
    sketch EXACT with O(W) memory per in-flight window (the quantile rule
    is ``quantile_disc``'s, same as the sketch). Wide-window deployments
    pass ``k < window`` for the approximate fixed-memory path whose rank
    error the sketch tests pin. Publication, watermark gating, lateness,
    resume and read-back are inherited unchanged from the base view."""

    def __init__(
        self,
        lake_dir: str,
        window: int,
        lateness: int = 0,
        qs: tuple[float, ...] = (0.5, 0.9, 0.99),
        k: int | None = None,
        view_root: str | None = None,
    ):
        self.qs = tuple(qs)
        self.k = int(k) if k else int(window)
        super().__init__(
            lake_dir, window, lateness, group_col="repo", view_root=view_root
        )

    def _view_name(self) -> str:
        return f"winq-size-w{self.window}-l{self.lateness}-k{self.k}"

    def _columns(self) -> list[str]:
        return ["lsn", "content"]

    def _window_sort_keys(self) -> list[tuple[str, str]]:
        return [("q", "ascending")]

    def _schema(self) -> pa.Schema:
        return pa.schema(
            [("window_id", pa.int64()), ("q", pa.float64()), ("size", pa.int64())]
        )

    def _aggregate(self, ds: "ray.data.Dataset") -> pa.Table:
        import numpy as np

        from ..functions.sketch import KllSketch

        W, k = self.window, self.k
        empty = pa.schema(
            [("window_id", pa.int64()), ("level", pa.int64()), ("value", pa.float64())]
        ).empty_table()

        def partials(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t.column("content")))
            if t.num_rows == 0:
                return empty
            win = np.asarray(t.column("lsn"), dtype=np.int64) // W
            size = np.asarray(pc.binary_length(t.column("content")), dtype=np.float64)
            outs = []
            for w in np.unique(win):  # batches span few windows (lsn-clustered)
                sk = KllSketch(k)
                sk.update_many(size[win == w])
                part = sk.to_table()
                outs.append(
                    part.append_column(
                        "window_id",
                        pa.array(np.full(part.num_rows, w, dtype=np.int64)),
                    )
                )
            return pa.concat_tables(outs).select(["window_id", "level", "value"])

        rows = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
        out_w, out_q, out_s = [], [], []
        for w, grp in rows.groupby("window_id"):
            sk = KllSketch.from_rows(
                grp["level"].to_numpy(), grp["value"].to_numpy(), self.k
            )
            for q in self.qs:
                out_w.append(int(w))
                out_q.append(float(q))
                out_s.append(int(sk.quantile(q)))
        return pa.table(
            {
                "window_id": pa.array(out_w, pa.int64()),
                "q": pa.array(out_q, pa.float64()),
                "size": pa.array(out_s, pa.int64()),
            }
        )


class TumblingTopKView(TumblingWindowView):
    """Per-window top-k groups by event count — the streaming "trending
    keys" view. The base count aggregate is a full (window, group) groupby
    (exact, view-sized); the top-k cut + total-order 1..k rank (row_number
    semantics: ties take distinct ranks via the group tie-break) is a
    driver-side
    fold of that already-small result. Ties break on the group ascending so
    the view is total-order deterministic (= the oracle's
    ``row_number() OVER (ORDER BY n_events DESC, group)``). Publication,
    watermark gating, lateness, resume and read-back inherited unchanged."""

    def __init__(
        self,
        lake_dir: str,
        window: int,
        k: int = 3,
        lateness: int = 0,
        group_col: str = "repo",
        view_root: str | None = None,
    ):
        self.k = int(k)
        super().__init__(
            lake_dir, window, lateness, group_col=group_col, view_root=view_root
        )

    def _view_name(self) -> str:
        return f"wintop-{self.group_col}-w{self.window}-l{self.lateness}-k{self.k}"

    def _window_sort_keys(self) -> list[tuple[str, str]]:
        return [("rank", "ascending")]

    def _schema(self) -> pa.Schema:
        return pa.schema(
            [
                ("window_id", pa.int64()),
                (self.group_col, pa.string()),
                ("n_events", pa.int64()),
                ("rank", pa.int64()),
            ]
        )

    def _aggregate(self, ds: "ray.data.Dataset") -> pa.Table:
        base = super()._aggregate(ds)  # (window_id, group, n_events, n_deletes)
        if base.num_rows == 0:
            return self._empty_partials()
        pdf = base.to_pandas()
        pdf = pdf.sort_values(
            ["window_id", "n_events", self.group_col],
            ascending=[True, False, True],
            kind="stable",
        )
        pdf["rank"] = pdf.groupby("window_id").cumcount() + 1
        pdf = pdf[pdf["rank"] <= self.k]
        return pa.Table.from_pandas(
            pdf[["window_id", self.group_col, "n_events", "rank"]],
            preserve_index=False,
        )


class SessionView:
    """Gap-closed session windows per key over the change stream — the
    stateful streaming-window shape (tumbling views tile the LSN axis;
    sessions don't tile, they CLOSE when the key goes quiet).

    Semantics: consecutive events of a key belong to one session while the
    LSN gap between them is ≤ ``gap``; a session is FINAL exactly when
    ``last_lsn + gap <= watermark`` — no future event can rejoin it, since
    every unapplied event has ``lsn > watermark`` (epochs apply in stream
    order). Emitted once, never revised.

    Incremental state: the carried OPEN sessions (one row per key at most
    ``O(live keys)``) ride a per-tick Parquet file; each refresh reads only
    the newly applied LSN span (footer-pruned segments), pre-sessionizes
    per batch (a mergeable interval summary: within-batch sessions of
    (key, start, last, n)), folds partial sessions + carried state with one
    vectorized pass, and splits closed from still-open. Crash-safe by the
    same discipline as the tumbling views: per-tick files land tmp+rename
    BEFORE the manifest advances; a killed tick replays identically.

    Scale note: the fold input is partial sessions (events collapse within
    batches), view-sized rather than stream-sized; at extreme key
    cardinality the same fold runs per hash bucket (the
    ``sliding_user_window`` exchange pattern) — the in-driver vectorized
    fold here is the single-node realization."""

    def __init__(
        self,
        lake_dir: str,
        gap: int,
        key_col: str = "repo",
        view_root: str | None = None,
    ):
        if gap <= 0:
            raise ValueError("gap must be positive")
        self.lake_dir = lake_dir
        self.gap = int(gap)
        self.key_col = key_col
        self.view_dir = os.path.join(
            view_root or os.path.join(lake_dir, "_views"),
            f"sess-{key_col}-g{self.gap}",
        )

    # ------------------------------------------------------------ manifest

    def _manifest_path(self) -> str:
        return os.path.join(self.view_dir, "VIEW.json")

    def _manifest(self) -> dict[str, Any]:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return {"processed_lsn": -1, "tick": 0, "closed_files": [], "open_file": None}

    # ------------------------------------------------------------- refresh

    def _span_partials(self, stream, lo: int, hi: int) -> "Any":
        """Partial sessions of the [lo, hi] LSN span: per-batch interval
        summaries (key, start_lsn, last_lsn, n_events)."""
        import pandas as pd

        flt = (pc.field("lsn") >= lo) & (pc.field("lsn") <= hi)
        if isinstance(stream, list):
            files = []
            for f in stream:
                rng = _segment_lsn_range(f)
                if rng is not None and rng[0] <= hi and rng[1] >= lo:
                    files.append(f)
            if not files:
                return None
            ds = ray.data.read_parquet(files, columns=["lsn", self.key_col], filter=flt)
        else:
            ds = stream.filter(expr=f"lsn >= {lo} and lsn <= {hi}")
        G, key = self.gap, self.key_col

        def partial(b: "pd.DataFrame") -> "pd.DataFrame":
            if len(b) == 0:
                return pd.DataFrame(
                    {
                        key: pd.Series(dtype="object"),
                        "start_lsn": pd.Series(dtype="int64"),
                        "last_lsn": pd.Series(dtype="int64"),
                        "n_events": pd.Series(dtype="int64"),
                    }
                )
            b = b.sort_values([key, "lsn"], kind="stable")
            brk = (b[key].to_numpy() != b[key].shift().to_numpy()) | (
                b["lsn"].to_numpy() - b["lsn"].shift().fillna(-(10**18)).to_numpy() > G
            )
            sid = brk.cumsum()
            g = b.groupby(sid, sort=False)
            out = pd.DataFrame(
                {
                    key: g[key].first(),
                    "start_lsn": g["lsn"].min().astype("int64"),
                    "last_lsn": g["lsn"].max().astype("int64"),
                    "n_events": g["lsn"].size().astype("int64"),
                }
            )
            return out.reset_index(drop=True)

        return ds.map_batches(partial, batch_format="pandas")

    def refresh(self, stream: "list[str] | ray.data.Dataset") -> dict[str, Any]:
        """Process the newly applied LSN span; returns
        {"sessions_closed": n, "open_sessions": m, "processed_lsn": wm}."""
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        man = self._manifest()
        wm = applied_watermark(self.lake_dir)
        done = int(man["processed_lsn"])
        if wm <= done:
            return {
                "sessions_closed": 0,
                "open_sessions": None,
                "processed_lsn": done,
            }
        parts_ds = self._span_partials(stream, done + 1, wm)
        key = self.key_col
        cols = [key, "start_lsn", "last_lsn", "n_events"]
        frames = []
        if parts_ds is not None:
            pdf = parts_ds.to_pandas()
            if not pdf.empty:
                frames.append(pdf[cols])
        if man["open_file"]:
            frames.append(
                pq.read_table(os.path.join(self.view_dir, man["open_file"]))
                .to_pandas()[cols]
            )
        if frames:
            allp = pd.concat(frames, ignore_index=True)
            allp = allp.sort_values([key, "start_lsn"], kind="stable")
            k = allp[key].to_numpy()
            start = allp["start_lsn"].to_numpy(np.int64)
            last = allp["last_lsn"].to_numpy(np.int64)
            n = allp["n_events"].to_numpy(np.int64)
            # partial sessions from different batches may interleave per
            # key; the merge rule is start − max(previous lasts in the
            # run) ≤ gap, so compute the per-key running max of `last`
            # (vectorized grouped cummax — no Python loop)
            seg_start = np.ones(len(allp), dtype=bool)
            seg_start[1:] = k[1:] != k[:-1]
            seg_id = np.cumsum(seg_start)
            run_max = (
                pd.Series(last).groupby(seg_id).cummax().to_numpy(np.int64)
            )
            brk = np.ones(len(allp), dtype=bool)
            prev_run_max = np.empty_like(run_max)
            prev_run_max[0] = -(10**18)
            prev_run_max[1:] = run_max[:-1]
            brk[1:] = (k[1:] != k[:-1]) | (start[1:] - prev_run_max[1:] > self.gap)
            sid = np.cumsum(brk)
            merged = pd.DataFrame(
                {key: k, "start_lsn": start, "last_lsn": last, "n_events": n, "sid": sid}
            )
            g = merged.groupby("sid", sort=False)
            sess = pd.DataFrame(
                {
                    key: g[key].first(),
                    "start_lsn": g["start_lsn"].min().astype("int64"),
                    "last_lsn": g["last_lsn"].max().astype("int64"),
                    "n_events": g["n_events"].sum().astype("int64"),
                }
            ).reset_index(drop=True)
        else:
            sess = pd.DataFrame(
                {
                    key: pd.Series(dtype="object"),
                    "start_lsn": pd.Series(dtype="int64"),
                    "last_lsn": pd.Series(dtype="int64"),
                    "n_events": pd.Series(dtype="int64"),
                }
            )
        closed_mask = sess["last_lsn"].to_numpy(np.int64) + self.gap <= wm
        closed = sess[closed_mask].sort_values([key, "start_lsn"], kind="stable")
        open_ = sess[~closed_mask].sort_values([key, "start_lsn"], kind="stable")

        os.makedirs(self.view_dir, exist_ok=True)
        tick = int(man["tick"])
        closed_name = f"closed-{tick:06d}.parquet"
        open_name = f"open-{tick:06d}.parquet"
        schema = pa.schema(
            [
                (key, pa.string()),
                ("start_lsn", pa.int64()),
                ("last_lsn", pa.int64()),
                ("n_events", pa.int64()),
            ]
        )
        for name, df in ((closed_name, closed), (open_name, open_)):
            t = pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)
            t = t.cast(schema) if t.num_rows else schema.empty_table()
            pq.write_table(t, os.path.join(self.view_dir, name + ".tmp"))
            os.replace(
                os.path.join(self.view_dir, name + ".tmp"),
                os.path.join(self.view_dir, name),
            )
        new_man = {
            "processed_lsn": int(wm),
            "tick": tick + 1,
            "closed_files": list(man["closed_files"]) + [closed_name],
            "open_file": open_name,
            "gap": self.gap,
            "key_col": key,
        }
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(new_man, f)
        os.replace(tmp, self._manifest_path())
        return {
            "sessions_closed": int(len(closed)),
            "open_sessions": int(len(open_)),
            "processed_lsn": int(wm),
        }

    # --------------------------------------------------------------- reads

    def table(self) -> pa.Table:
        """All CLOSED sessions (manifest-listed files only), sorted."""
        import pyarrow.parquet as pq

        man = self._manifest()
        tabs = [
            pq.read_table(os.path.join(self.view_dir, f))
            for f in man["closed_files"]
        ]
        schema = pa.schema(
            [
                (self.key_col, pa.string()),
                ("start_lsn", pa.int64()),
                ("last_lsn", pa.int64()),
                ("n_events", pa.int64()),
            ]
        )
        tabs = [t for t in tabs if t.num_rows]
        if not tabs:
            return schema.empty_table()
        t = pa.concat_tables([x.cast(schema) for x in tabs])
        return t.take(
            pc.sort_indices(
                t,
                sort_keys=[(self.key_col, "ascending"), ("start_lsn", "ascending")],
            )
        )
