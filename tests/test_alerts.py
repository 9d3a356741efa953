"""QC alert channel: ConstraintMonitor.on_violation + Tailer.on_alert +
CLI ``tail --alert-cmd`` (reference analog: task_fail_alert wired into every
DAG, daily_qc_airflow/google_chat_callbacks.py:1)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np  # noqa: F401  (parity with sibling test modules)
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _events(rows):
    return pa.table(
        {
            "op": pa.array([r[0] for r in rows], pa.string()),
            "lsn": pa.array([r[1] for r in rows], pa.int64()),
            "repo": pa.array([r[2] for r in rows], pa.string()),
            "path": pa.array([r[3] for r in rows], pa.string()),
            "commit": pa.array([f"c{r[1]}" for r in rows], pa.string()),
            "lang": pa.array([r[4] for r in rows], pa.string()),
            "content": pa.array([r[5] for r in rows], pa.string()),
        }
    )


def test_monitor_on_violation_fires_only_on_new_violations(ray_session, tmp_path):
    """Planted violation → exactly one event with the right delta; a clean
    epoch → no event; bootstrap with pre-existing violations → one
    bootstrap-tagged event per violated constraint."""
    import ray.data

    from sonic_etl_ray.pipelines.ingest import apply_epoch
    from sonic_etl_ray.pipelines.qc import Constraint, ConstraintMonitor

    lake = str(tmp_path / "lake")
    cons = [Constraint("lang_ok", "accepted_values", ("lang",), values=("py",))]
    apply_epoch(
        ray.data.from_arrow(_events([("insert", 0, "r0", "a", "py", "x"),
                                     ("insert", 1, "r0", "b", "zz", "x")])),
        lake, epoch=0, num_partitions=2,
    )
    events: list[dict] = []
    mon = ConstraintMonitor(
        lake, cons, str(tmp_path / "mon.json"), on_violation=events.append
    )
    mon.refresh()
    assert len(events) == 1
    assert events[0]["constraint"] == "lang_ok"
    assert events[0]["new_violations"] == 1 and events[0]["total"] == 1
    assert events[0].get("bootstrap") is True

    # clean epoch: counter unchanged -> NO alert
    apply_epoch(
        ray.data.from_arrow(_events([("insert", 10, "r1", "c", "py", "x")])),
        lake, epoch=1, num_partitions=2,
    )
    mon.refresh()
    assert len(events) == 1

    # planted violation -> one more alert with delta 1, total 2
    apply_epoch(
        ray.data.from_arrow(_events([("insert", 20, "r1", "d", "qq", "x")])),
        lake, epoch=2, num_partitions=2,
    )
    mon.refresh()
    assert len(events) == 2
    assert events[1] == {
        "constraint": "lang_ok", "new_violations": 1, "total": 2,
        "epoch": 2, "lake": lake,
    }

    # a violation CLEARING (delta < 0) is not an alert
    apply_epoch(
        ray.data.from_arrow(_events([("insert", 30, "r1", "d", "py", "x")])),
        lake, epoch=3, num_partitions=2,
    )
    mon.refresh()
    assert len(events) == 2


def test_tailer_alert_on_constraint_violation_not_on_clean_tick(ray_session, tmp_path):
    """Tailer(on_alert=...) receives monitor violations; clean ticks stay
    silent; a broken alert sink never stops ingestion."""
    from sonic_etl_ray.pipelines.qc import Constraint, ConstraintMonitor
    from sonic_etl_ray.pipelines.tail import Tailer

    seg_dir = str(tmp_path / "segs")
    lake = str(tmp_path / "lake")
    os.makedirs(seg_dir)
    pq.write_table(
        _events([("insert", 0, "r0", "a", "py", "x")]),
        f"{seg_dir}/segment_00000.parquet",
    )
    alerts: list[dict] = []

    def sink(evt):
        alerts.append(evt)
        raise RuntimeError("pager down")  # must be swallowed

    cons = [Constraint("lang_ok", "accepted_values", ("lang",), values=("py",))]
    mon = ConstraintMonitor(lake, cons, str(tmp_path / "mon.json"))
    t = Tailer(seg_dir, lake, num_partitions=2, segments_per_epoch=1,
               monitors=[mon], on_alert=sink)
    r = t.tick()  # clean data -> applied, no alerts
    assert r["epochs_applied"] == 1
    assert alerts == []

    pq.write_table(
        _events([("insert", 10, "r0", "b", "zz", "x")]),
        f"{seg_dir}/segment_00001.parquet",
    )
    r = t.tick()
    assert r["epochs_applied"] == 1  # broken sink did not stop ingestion
    assert len(alerts) == 1
    assert alerts[0]["kind"] == "constraint_violation"
    assert alerts[0]["constraint"] == "lang_ok"
    assert alerts[0]["new_violations"] == 1


def test_tailer_alert_on_epoch_failure_and_freshness(ray_session, tmp_path, monkeypatch):
    """Epoch failure alerts then re-raises; a freshness breach alerts once
    per breach and re-arms on progress."""
    from sonic_etl_ray.pipelines import tail as tail_mod
    from sonic_etl_ray.pipelines.tail import Tailer

    seg_dir = str(tmp_path / "segs")
    lake = str(tmp_path / "lake")
    os.makedirs(seg_dir)
    pq.write_table(
        _events([("insert", 0, "r0", "a", "py", "x")]),
        f"{seg_dir}/segment_00000.parquet",
    )
    alerts: list[dict] = []

    boom = RuntimeError("corrupt segment")

    def failing_apply(*a, **kw):
        raise boom

    real_apply = tail_mod.apply_epoch
    monkeypatch.setattr(tail_mod, "apply_epoch", failing_apply)
    t = Tailer(seg_dir, lake, num_partitions=2, segments_per_epoch=1,
               on_alert=alerts.append, freshness_timeout_s=0.0)
    try:
        t.tick()
        raise AssertionError("expected the epoch failure to propagate")
    except RuntimeError as e:
        assert e is boom
    assert alerts and alerts[-1]["kind"] == "epoch_failure"
    assert alerts[-1]["epoch"] == 0 and "corrupt segment" in alerts[-1]["error"]

    monkeypatch.setattr(tail_mod, "apply_epoch", real_apply)
    alerts.clear()
    r = t.tick()  # applies -> progress, no freshness alert
    assert r["epochs_applied"] == 1 and alerts == []
    t.tick()  # no new segments -> breach (timeout 0)
    assert len(alerts) == 1 and alerts[0]["kind"] == "freshness"
    t.tick()  # still breached -> NOT re-fired
    assert len(alerts) == 1
    pq.write_table(
        _events([("insert", 10, "r0", "b", "py", "x")]),
        f"{seg_dir}/segment_00001.parquet",
    )
    t.tick()  # progress re-arms
    assert len(alerts) == 1
    t.tick()  # idle again -> second breach alert
    assert len(alerts) == 2 and alerts[1]["kind"] == "freshness"


def test_cli_tail_alert_cmd(tmp_path):
    """``tail --alert-cmd`` pipes each alert event as JSON to the command's
    stdin (planted constraint violation -> one event in the sink file)."""
    seg_dir = str(tmp_path / "segs")
    lake = str(tmp_path / "lake")
    sink = str(tmp_path / "alerts.jsonl")
    os.makedirs(seg_dir)
    pq.write_table(
        _events([("insert", 0, "r0", "a", "py", "x"),
                 ("insert", 1, "r0", "b", "zz", "x")]),
        f"{seg_dir}/segment_00000.parquet",
    )
    spec = tmp_path / "cons.json"
    spec.write_text(json.dumps([
        {"name": "lang_ok", "kind": "accepted_values", "columns": ["lang"],
         "values": ["py"]},
    ]))
    out = subprocess.run(
        [sys.executable, "-m", "sonic_etl_ray", "--num-cpus", "2", "tail",
         "--segments", seg_dir, "--lake", lake, "--partitions", "2",
         "--segments-per-epoch", "1", "--ticks", "1", "--poll-interval", "0.1",
         "--constraints-json", str(spec),
         "--alert-cmd", f"cat >> {sink}"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO}, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    with open(sink) as fh:
        events = [json.loads(line) for line in fh.read().splitlines() if line]
    assert len(events) == 1
    assert events[0]["kind"] == "constraint_violation"
    assert events[0]["constraint"] == "lang_ok"
    assert events[0]["new_violations"] == 1

def test_monitor_fires_before_cursor_persist(ray_session, tmp_path):
    """At-least-once ordering: on_violation fires BEFORE the advanced
    cursor is persisted (a crash between the two refolds and re-fires —
    never silently loses the alert), and a raising sink still lets the
    persist proceed."""
    import pyarrow as pa
    import ray.data

    from sonic_etl_ray.pipelines.ingest import apply_epoch
    from sonic_etl_ray.pipelines.qc import Constraint, ConstraintMonitor

    lake = str(tmp_path / "lake")
    apply_epoch(
        ray.data.from_arrow(_events([("insert", 0, "r0", "a", "zz", "x")])),
        lake, epoch=0, num_partitions=2,
    )
    seq = []
    cons = [Constraint("lang_ok", "accepted_values", ("lang",), values=("py",))]
    mon = ConstraintMonitor(lake, cons, str(tmp_path / "mon.json"))
    real_persist = mon._persist
    mon._persist = lambda st: (seq.append("persist"), real_persist(st))[1]

    def sink(evt):
        seq.append("fire")
        raise RuntimeError("sink down")  # must not block the persist

    mon.on_violation = sink
    mon.refresh()
    assert seq == ["fire", "persist"], seq  # bootstrap: alert, then cursor
    # epoch path: same order
    apply_epoch(
        ray.data.from_arrow(_events([("insert", 10, "r1", "b", "qq", "x")])),
        lake, epoch=1, num_partitions=2,
    )
    seq.clear()
    mon.refresh()
    assert seq == ["fire", "persist"], seq
    # state did persist despite the raising sink
    mon2 = ConstraintMonitor(lake, cons, str(tmp_path / "mon.json"))
    assert int(mon2.report().set_index("constraint").loc["lang_ok", "violations"]) == 2


def test_cli_tail_alert_cmd_failing_sink_does_not_stop_tail(tmp_path):
    """A pager command exiting nonzero is caught by the Tailer's
    except-and-log (check=True) — ingestion completes."""
    import pyarrow.parquet as pq

    seg_dir = str(tmp_path / "segs")
    lake = str(tmp_path / "lake")
    os.makedirs(seg_dir)
    pq.write_table(
        _events([("insert", 0, "r0", "a", "zz", "x")]),
        f"{seg_dir}/segment_00000.parquet",
    )
    spec = tmp_path / "cons.json"
    spec.write_text(json.dumps([
        {"name": "lang_ok", "kind": "accepted_values", "columns": ["lang"],
         "values": ["py"]},
    ]))
    out = subprocess.run(
        [sys.executable, "-m", "sonic_etl_ray", "--num-cpus", "2", "tail",
         "--segments", seg_dir, "--lake", lake, "--partitions", "2",
         "--segments-per-epoch", "1", "--ticks", "1", "--poll-interval", "0.1",
         "--constraints-json", str(spec), "--alert-cmd", "exit 3"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO}, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    last = json.loads(out.stdout.strip().splitlines()[-1])
    assert last["epochs_applied"] + last["epochs_skipped"] == 1
