"""TOML config loading, CLI wiring, export job, skew metrics."""

import json
import os

import pyarrow.parquet as pq
import pytest

from data_sync_ray import StreamSpec, SyncConfig, gen_base_table, gen_change_stream, write_event_log
from data_sync_ray.pipelines.replay import ReplayJob, export_lake

TOML = """
[sync]
lake_root = "{lake}"
include_tables = ["docs"]
exclude_tables = ["scratch"]
num_partitions = 8
batch_size = 4096
schema_policy = "unify"

[sync.filter_cols]
docs = ["secret_col"]
"""


def test_from_toml(tmp_path):
    p = tmp_path / "job.toml"
    p.write_text(TOML.format(lake=str(tmp_path / "lake")))
    cfg = SyncConfig.from_toml(str(p))
    assert cfg.include_tables == ("docs",)
    assert cfg.exclude_tables == ("scratch",)
    assert cfg.filter_cols == {"docs": ("secret_col",)}
    assert cfg.num_partitions == 8


@pytest.mark.usefixtures("ray_session")
def test_export_and_skew_metrics(tmp_path):
    spec = StreamSpec(n_events=1500, n_docs=100, n_epochs=2, seed=5,
                      hot_frac=0.02, hot_weight=0.6)
    base = gen_base_table(100, seed=5)
    ev_root = os.path.join(str(tmp_path), "events")
    write_event_log(ev_root, gen_change_stream(spec))
    cfg = SyncConfig(lake_root=os.path.join(str(tmp_path), "lake"),
                     num_partitions=8)
    job = ReplayJob(cfg)
    summary = job.replay(ev_root, bootstrap=base)
    # skew lineage present and sane: hottest key saw multiple events
    mx = max(r["max_key_events"] for r in summary["metrics"])
    assert mx >= 1
    out_dir = os.path.join(str(tmp_path), "export")
    export_lake(cfg.lake_root, out_dir)
    files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    assert files
    total = sum(
        pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows
        for f in files
    )
    assert total == job.lake.read_all().num_rows


@pytest.mark.usefixtures("ray_session")
def test_export_pinned_manifest(tmp_path):
    """export --manifest-version: the exported snapshot reflects the
    pinned manifest even after later commits (a concurrent tail)."""
    import shutil

    spec = StreamSpec(n_events=600, n_docs=60, n_epochs=2, seed=9)
    base = gen_base_table(60, seed=9)
    staging = os.path.join(str(tmp_path), "staging")
    write_event_log(staging, gen_change_stream(spec))
    ev_root = os.path.join(str(tmp_path), "events")
    os.makedirs(ev_root)
    shutil.move(os.path.join(staging, "epoch=00000"), ev_root)
    cfg = SyncConfig(lake_root=os.path.join(str(tmp_path), "lake"),
                     num_partitions=8)
    job = ReplayJob(cfg)
    job.replay(ev_root, bootstrap=base)  # publishes a manifest
    v = job.lake.manifest_version()
    pinned_rows = job.lake.read_all().num_rows
    # a later epoch arrives (the concurrent-tail analog) — the pinned
    # export must NOT see it
    shutil.move(os.path.join(staging, "epoch=00001"), ev_root)
    job.replay(ev_root)
    out_dir = os.path.join(str(tmp_path), "export_pinned")
    export_lake(cfg.lake_root, out_dir, manifest_version=v)
    total = sum(
        pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows
        for f in os.listdir(out_dir) if f.endswith(".parquet")
    )
    assert total == pinned_rows
    # and the live lake has genuinely moved on (epoch 1 inserts docs)
    assert job.lake.read_all().num_rows != pinned_rows


def test_cli_ingest_subprocess(tmp_path):
    """CLI ingest: one canal-envelope JSON-lines batch -> one committed
    epoch, via the real `python -m data_sync_ray.cli` entry (subprocess:
    the CLI owns its own Ray session and shuts it down on exit, which
    must not touch this test session's Ray)."""
    import subprocess
    import sys

    cfg_path = tmp_path / "job.toml"
    cfg_path.write_text(TOML.format(lake=str(tmp_path / "lake")))
    lines = [
        json.dumps({
            "type": "INSERT", "table": "docs", "isDdl": False,
            "id": i + 1, "es": 1700000000000,
            "data": [{"doc_id": f"d{i}", "tokens": [i], "n_tok": 1,
                      "source": "cli"}],
        })
        for i in range(5)
    ]
    ev = tmp_path / "batch.jsonl"
    ev.write_text("\n".join(lines))
    r = subprocess.run(
        [sys.executable, "-m", "data_sync_ray.cli", "ingest",
         "--config", str(cfg_path), "--events", str(ev),
         "--epoch", "0", "--source-format", "canal", "--num-cpus", "4"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "PYTHONPATH": "/root/repo"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["events_applied"] == 5
    assert out["format"] == "canal"


@pytest.mark.usefixtures("ray_session")
def test_cli_lookup(tmp_path, capsys):
    from data_sync_ray.cli import main

    spec = StreamSpec(n_events=800, n_docs=80, n_epochs=2, seed=11)
    base = gen_base_table(80, seed=11)
    ev_root = os.path.join(str(tmp_path), "events")
    write_event_log(ev_root, gen_change_stream(spec))
    cfg = SyncConfig(lake_root=os.path.join(str(tmp_path), "lake"),
                     num_partitions=8)
    job = ReplayJob(cfg)
    job.replay(ev_root, bootstrap=base)
    p = tmp_path / "job.toml"
    p.write_text(f'[sync]\nlake_root = "{cfg.lake_root}"\n')
    state = job.lake.read_all()
    alive = state.column("doc_id")[0].as_py()
    want = state.filter(
        __import__("pyarrow").compute.equal(state.column("doc_id"), alive)
    )
    assert main(["lookup", "--config", str(p), "--key", alive]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["found"] and len(out["rows"]) == 1
    assert out["rows"][0]["log_pos"] == want.column("log_pos")[0].as_py()
    assert main(["lookup", "--config", str(p), "--key", "doc99999999"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not out["found"] and out["rows"] == []


@pytest.mark.usefixtures("ray_session")
def test_export_hive_partitioned(tmp_path):
    """partition_by lays the snapshot out hive-style (out/source=X/...)
    and the union of shards equals the lake exactly — a consumer can
    read one source without scanning the rest."""
    import pyarrow.dataset as pads

    spec = StreamSpec(n_events=600, n_docs=80, n_epochs=1, seed=9)
    base = gen_base_table(80, seed=9)
    ev_root = os.path.join(str(tmp_path), "events")
    write_event_log(ev_root, gen_change_stream(spec))
    cfg = SyncConfig(lake_root=os.path.join(str(tmp_path), "lake"),
                     num_partitions=4)
    job = ReplayJob(cfg)
    job.replay(ev_root, bootstrap=base)
    out_dir = os.path.join(str(tmp_path), "export_hive")
    export_lake(cfg.lake_root, out_dir, partition_by=["source"])

    live = job.lake.read_all()
    srcs = set(live.column("source").to_pylist())
    dirs = {d for d in os.listdir(out_dir) if d.startswith("source=")}
    assert dirs == {f"source={s}" for s in srcs}

    back = pads.dataset(out_dir, partitioning="hive").to_table()
    assert back.num_rows == live.num_rows
    want = {
        (d, s)
        for d, s in zip(live.column("doc_id").to_pylist(),
                        live.column("source").to_pylist())
    }
    got = {
        (d, str(s))
        for d, s in zip(back.column("doc_id").to_pylist(),
                        back.column("source").to_pylist())
    }
    assert got == want
