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
def test_single_pass_equals_per_table_replay(tmp_path):
    """replay_single_pass (one read of the shared log for all tables)
    produces lakes identical to the per-table-pass mode and the oracle,
    and a second invocation is a no-op (per-lake resume)."""
    spec = StreamSpec(n_events=1800, n_docs=150, n_epochs=3, seed=29,
                      decoy_table_frac=0.25)
    base = gen_base_table(150, seed=29)
    epochs = gen_change_stream(spec)
    ev_root = os.path.join(str(tmp_path), "events")
    write_event_log(ev_root, epochs)

    multi1 = MultiTableReplay(
        SyncConfig(lake_root=os.path.join(str(tmp_path), "lakes_sp"),
                   num_partitions=4),
        ["docs", "ignored_tbl"],
    )
    out = multi1.replay_single_pass(ev_root, bootstraps={"docs": base})
    assert out["docs"]["epochs_run"] == 3

    multi2 = MultiTableReplay(
        SyncConfig(lake_root=os.path.join(str(tmp_path), "lakes_pp"),
                   num_partitions=4),
        ["docs", "ignored_tbl"],
    )
    multi2.replay(ev_root, bootstraps={"docs": base})

    for t in ("docs", "ignored_tbl"):
        a = multi1.read_table(t).sort_by("doc_id")
        b = multi2.read_table(t).sort_by("doc_id")
        assert a.equals(b.select(a.column_names)), f"table {t} differs"
    want = replay_oracle(base, epochs, include_tables=("docs",))
    assert multi1.read_table("docs").num_rows == want.num_rows

    # resume: everything already done -> no epochs run, state unchanged
    out2 = multi1.replay_single_pass(ev_root)
    assert out2["docs"]["epochs_run"] == 0
    assert multi1.read_table("docs").num_rows == want.num_rows


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
