"""CLI end-to-end via subprocess (the IndexRange/SaveRange surface)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-m", "sonic_etl_ray", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO},
        timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_generate_ingest_qc_vacuum(tmp_path):
    segs, lake = str(tmp_path / "segs"), str(tmp_path / "lake")
    r = _run("generate", "--out", segs, "--events", "2000", "--segment-size", "500")
    assert r["segments"] == 4

    r = _run("--num-cpus", "2", "ingest", "--segments", segs, "--lake", lake,
             "--partitions", "2", "--segments-per-epoch", "2")
    assert r["epochs_applied"] == 2

    r = _run("--num-cpus", "2", "qc", "--lake", lake)
    assert r["counts_ok"] is True
    assert r["skew"]["partitions"] == 2

    # re-ingest: everything skipped (resume surface)
    r = _run("--num-cpus", "2", "ingest", "--segments", segs, "--lake", lake,
             "--partitions", "2", "--segments-per-epoch", "2")
    assert r["epochs_skipped"] == 2 and r["epochs_applied"] == 0

    r = _run("vacuum", "--lake", lake, "--keep-epochs", "1")
    assert r["removed"] >= 0


def test_cli_export_roundtrip(tmp_path):
    segs, lake, out = str(tmp_path / "segs"), str(tmp_path / "lake"), str(tmp_path / "snap")
    _run("generate", "--out", segs, "--events", "1500", "--segment-size", "500")
    _run("--num-cpus", "2", "ingest", "--segments", segs, "--lake", lake,
         "--partitions", "2", "--segments-per-epoch", "1")
    r = _run("--num-cpus", "2", "export", "--lake", lake, "--out", out)
    assert r["partitions_written"] == 2 and r["rows"] > 0
    manifest = json.load(open(f"{out}/SNAPSHOT.json"))
    assert manifest["rows"] == r["rows"]


def test_cli_bulk_dml(tmp_path):
    segs, lake = str(tmp_path / "segs"), str(tmp_path / "lake")
    _run("generate", "--out", segs, "--events", "2000", "--segment-size", "500")
    _run("--num-cpus", "2", "ingest", "--segments", segs, "--lake", lake,
         "--partitions", "2", "--segments-per-epoch", "2")

    r = _run("--num-cpus", "2", "delete-where", "--lake", lake,
             "--where", "lang=markdown")
    assert r["kind"] == "delete" and r["n_rows_affected"] > 0
    n_deleted = r["n_rows_affected"]

    # nothing left to match: the rerun is a no-op under a fresh admin epoch
    r2 = _run("--num-cpus", "2", "delete-where", "--lake", lake,
              "--where", "lang=markdown")
    assert r2["n_rows_affected"] == 0 and r2["epoch"] > r["epoch"]

    r3 = _run("--num-cpus", "2", "update-where", "--lake", lake,
              "--where", "lang=python", "--set", "lang=py3")
    assert r3["kind"] == "update" and r3["n_rows_affected"] > 0

    # verify through the lookup-free qc surface: counts still consistent
    q = _run("--num-cpus", "2", "qc", "--lake", lake)
    assert q["counts_ok"] is True
    assert n_deleted > 0


def test_cli_clone_index_repair(tmp_path):
    segs, lake = str(tmp_path / "segs"), str(tmp_path / "lake")
    branch = str(tmp_path / "branch")
    _run("generate", "--out", segs, "--events", "2000", "--segment-size", "500")
    _run("ingest", "--segments", segs, "--lake", lake, "--partitions", "4")
    r = _run("clone", "--src", lake, "--dst", branch)
    assert r["files_linked"] > 0 and r["files_copied"] == 0
    r = _run("index", "--lake", lake, "--column", "lang")
    assert r["parts_rebuilt"] > 0
    r = _run("index", "--lake", lake, "--column", "lang")  # refresh = all reused
    assert r["parts_rebuilt"] == 0 and r["parts_reused"] > 0
    r = _run("delete-where", "--lake", branch, "--where", "repo=org0/repo0")
    assert r["n_rows_affected"] > 0
    r = _run("repair-replica", "--replica", branch, "--src", lake)
    assert r["n_rows_affected"] > 0
    r = _run("repair-replica", "--replica", branch, "--src", lake)  # converged
    assert r["n_rows_affected"] == 0


def test_cli_analyze(tmp_path):
    segs, lake = str(tmp_path / "segs"), str(tmp_path / "lake")
    _run("generate", "--out", segs, "--events", "2000", "--segment-size", "500")
    _run("--num-cpus", "2", "ingest", "--segments", segs, "--lake", lake,
         "--partitions", "2", "--segments-per-epoch", "2")

    out = subprocess.run(
        [sys.executable, "-m", "sonic_etl_ray", "--num-cpus", "2", "analyze",
         "--lake", lake, "--columns", "repo,size_bytes"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO}, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = json.loads(out.stdout.strip().splitlines()[-1])
    by_col = {r["column"]: r for r in rows}
    assert set(by_col) == {"repo", "size_bytes"}
    assert by_col["repo"]["n_nulls"] == 0 and by_col["repo"]["n_distinct"] >= 1

    out = subprocess.run(
        [sys.executable, "-m", "sonic_etl_ray", "--num-cpus", "2", "analyze",
         "--lake", lake, "--columns", "repo", "--approx"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO}, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = json.loads(out.stdout.strip().splitlines()[-1])
    nd = by_col["repo"]["n_distinct"]  # small ndv → LC regime: within a couple of bucket collisions
    assert abs(rows[0]["est_distinct"] - nd) <= max(2, nd // 5)


def test_cli_qc_constraints_and_replay_errors(tmp_path):
    segs, lake = str(tmp_path / "segs"), str(tmp_path / "lake")
    _run("generate", "--out", segs, "--events", "1500", "--segment-size", "500")
    _run("--num-cpus", "2", "ingest", "--segments", segs, "--lake", lake,
         "--partitions", "2", "--segments-per-epoch", "1")

    spec = tmp_path / "cons.json"
    spec.write_text(json.dumps([
        {"name": "pk", "kind": "unique", "columns": ["repo", "path"]},
        {"name": "repo_nn", "kind": "not_null", "columns": ["repo"]},
        {"name": "size_pos", "kind": "range", "columns": ["size_bytes"], "lo": 0},
    ]))
    r = _run("--num-cpus", "2", "qc", "--lake", lake, "--constraints-json", str(spec))
    by = {c["constraint"]: c for c in r["constraints"]}
    assert by["pk"]["violations"] == 0
    assert by["repo_nn"]["violations"] == 0
    assert by["size_pos"]["violations"] == 0
    assert r["counts_ok"] is True

    # no routed errors -> replay is a clean no-op
    r2 = _run("--num-cpus", "2", "replay-errors", "--lake", lake)
    assert r2["files"] == 0 and r2["repair_epoch"] is None


def test_cli_pit_join(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    segs, lake = str(tmp_path / "segs"), str(tmp_path / "lake")
    _run("generate", "--out", segs, "--events", "1500", "--segment-size", "500")
    _run("--num-cpus", "2", "ingest", "--segments", segs, "--lake", lake,
         "--partitions", "2", "--segments-per-epoch", "1", "--track-history")
    # probe: ask for state far past every lsn -> matches = current versions
    seg0 = pq.read_table(sorted(__import__("glob").glob(segs + "/*.parquet"))[0])
    probe = pa.table(
        {
            "repo": seg0.column("repo").slice(0, 3),
            "path": seg0.column("path").slice(0, 3),
            "at_lsn": pa.array([10**9] * 3, pa.int64()),
        }
    )
    pq.write_table(probe, str(tmp_path / "probe.parquet"))
    out_path = str(tmp_path / "pit.parquet")
    r = _run("--num-cpus", "2", "pit-join", "--lake", lake,
             "--probe", str(tmp_path / "probe.parquet"), "--out", out_path)
    assert r["rows"] == 3
    t = pq.read_table(out_path)
    assert set(t.column_names) >= {"repo", "path", "at_lsn", "asof_lsn", "asof_op"}
    assert all(v >= 0 for v in t.column("asof_lsn").to_pylist())

def test_cli_pit_join_streamed_dir(tmp_path):
    """An --out WITHOUT a .parquet suffix streams via write_parquet — no
    driver materialization — and still reports the row count."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq

    segs, lake = str(tmp_path / "segs"), str(tmp_path / "lake")
    _run("generate", "--out", segs, "--events", "1500", "--segment-size", "500")
    _run("--num-cpus", "2", "ingest", "--segments", segs, "--lake", lake,
         "--partitions", "2", "--segments-per-epoch", "1", "--track-history")
    seg0 = pq.read_table(sorted(_glob.glob(segs + "/*.parquet"))[0])
    probe = pa.table(
        {
            "repo": seg0.column("repo").slice(0, 3),
            "path": seg0.column("path").slice(0, 3),
            "at_lsn": pa.array([10**9] * 3, pa.int64()),
        }
    )
    pq.write_table(probe, str(tmp_path / "probe.parquet"))
    out_dir = str(tmp_path / "pit_out")
    os.makedirs(out_dir)
    keepsake = os.path.join(out_dir, "NOTES.txt")  # unrelated user file
    with open(keepsake, "w") as fh:
        fh.write("do not delete")
    r = _run("--num-cpus", "2", "pit-join", "--lake", lake,
             "--probe", str(tmp_path / "probe.parquet"), "--out", out_dir)
    assert r["rows"] == 3
    # rerun into the same dir: prior parquet is REPLACED, not accumulated,
    # and non-parquet user files survive (no recursive delete)
    r2 = _run("--num-cpus", "2", "pit-join", "--lake", lake,
              "--probe", str(tmp_path / "probe.parquet"), "--out", out_dir)
    assert r2["rows"] == 3
    assert os.path.exists(keepsake)
    import glob as _g
    files = _g.glob(os.path.join(out_dir, "*.parquet"))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    assert t.num_rows == 3
    assert set(t.column_names) >= {"repo", "path", "at_lsn", "asof_lsn", "asof_op"}

    # ownership gate: a directory holding parquet this tool did NOT write
    # (no _PIT_JOIN_OUT marker) must be refused, and its files left intact
    foreign_dir = str(tmp_path / "foreign_out")
    os.makedirs(foreign_dir)
    foreign = os.path.join(foreign_dir, "precious.parquet")
    pq.write_table(probe, foreign)
    out = subprocess.run(
        [sys.executable, "-m", "sonic_etl_ray", "--num-cpus", "2", "pit-join",
         "--lake", lake, "--probe", str(tmp_path / "probe.parquet"),
         "--out", foreign_dir],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO}, timeout=240,
    )
    assert out.returncode != 0 and "refusing" in (out.stderr + out.stdout)
    assert os.path.exists(foreign)
    assert pq.read_table(foreign).num_rows == 3  # untouched

def test_cli_extend_index(tmp_path):
    """`extend-index` appends an epoch-tagged vector batch to a built LSH
    index; the probe bucket contents grow accordingly and a repeat with the
    same tag is a no-op."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    SF = "/root/testdata/sf0.001"
    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    import pyarrow.compute as pc
    ids = emb["vec_id"]
    cut = int(pc.approximate_median(ids).as_py())
    base = emb.filter(pc.less(ids, cut))
    extra = emb.filter(pc.greater_equal(ids, cut))
    sf_base = str(tmp_path / "sfb")
    os.makedirs(sf_base)
    pq.write_table(base, f"{sf_base}/embeddings.parquet")
    pq.write_table(extra, str(tmp_path / "extra.parquet"))

    import subprocess, sys
    out = subprocess.run(
        [sys.executable, "-c",
         "import sys, ray; ray.init(address='local', num_cpus=2, include_dashboard=False, logging_level='ERROR');"
         "from sonic_etl_ray.functions.similarity import build_lsh_index;"
         f"build_lsh_index({sf_base!r}, {str(tmp_path / 'idx')!r}, n_planes=5, seed=3); ray.shutdown()"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO}, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]

    r = _run("--num-cpus", "2", "extend-index", "--index-dir", str(tmp_path / "idx"),
             "--vectors", str(tmp_path / "extra.parquet"), "--tag", "ep1")
    assert r["kind"] == "lsh" and r["rows"] == extra.num_rows
    total = sum(
        pq.read_metadata(f).num_rows
        for f in _glob.glob(str(tmp_path / "idx" / "bucket=*" / "*.parquet"))
    )
    assert total == emb.num_rows
    # idempotent repeat
    r2 = _run("--num-cpus", "2", "extend-index", "--index-dir", str(tmp_path / "idx"),
              "--vectors", str(tmp_path / "extra.parquet"), "--tag", "ep1")
    assert r2 == r
