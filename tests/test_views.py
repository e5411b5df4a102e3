"""Incremental materialized views: partition-level invalidation."""

import pyarrow.compute as pc
import pytest
import ray.data as rd

from data_sync_ray import StreamSpec, gen_change_stream

from test_replay_e2e import build_fixture, make_job


@pytest.mark.usefixtures("ray_session")
def test_materialized_view_incremental(tmp_path):
    from data_sync_ray.state.views import source_stats_view

    spec = StreamSpec(n_events=500, n_docs=100, n_epochs=1, seed=31)
    base, epochs, ev_root = build_fixture(str(tmp_path), spec,
                                          n_base=100, seed=31)
    job = make_job(str(tmp_path), num_partitions=8)
    job.replay(ev_root, bootstrap=base)
    lake_root = job.cfg.lake_root

    def expected():
        t = job.lake.read_all()
        out = {}
        for s, n in zip(t.column("source").to_pylist(),
                        t.column("n_tok").to_pylist()):
            e = out.setdefault(s or "", [0, 0])
            e[0] += 1
            e[1] += int(n or 0)
        return out

    def as_dict(df):
        return {
            r.source: [r.n_docs, r.total_tokens]
            for r in df.itertuples()
        }

    # first refresh computes every non-empty partition
    df1, n1 = source_stats_view(lake_root)
    assert n1 == 8
    assert as_dict(df1) == expected()

    # steady state: nothing changed => nothing recomputed
    df1b, n1b = source_stats_view(lake_root)
    assert n1b == 0
    assert as_dict(df1b) == as_dict(df1)

    # a tiny epoch touching a handful of docs invalidates only their
    # partitions — refresh cost is O(changed), not O(lake)
    tiny = gen_change_stream(
        StreamSpec(n_events=6, n_docs=100, n_epochs=1, seed=77)
    )[0]
    tiny = tiny.filter(pc.equal(tiny.column("op"), "insert"))
    assert tiny.num_rows > 0
    job.apply_epoch(5, rd.from_arrow(tiny))
    df2, n2 = source_stats_view(lake_root)
    assert 0 < n2 < 8, n2
    assert as_dict(df2) == expected()

    # torn view state: delete and refresh => full recompute, same answer
    import os
    os.unlink(os.path.join(lake_root, "views", "source_stats.json"))
    df3, n3 = source_stats_view(lake_root)
    assert n3 == 8
    assert as_dict(df3) == as_dict(df2)


@pytest.mark.usefixtures("ray_session")
def test_tail_refreshes_views_incrementally(tmp_path):
    from data_sync_ray.state.views import source_stats_view

    spec = StreamSpec(n_events=400, n_docs=80, n_epochs=2, seed=13)
    base, epochs, ev_root = build_fixture(str(tmp_path), spec,
                                          n_base=80, seed=13)
    job = make_job(str(tmp_path), num_partitions=4)
    totals = job.tail(ev_root, poll_interval=0.01, max_rounds=2,
                      bootstrap=base, refresh_views=("source_stats",))
    # round 1 replays everything -> full view build; round 2 sees no new
    # epochs -> zero partitions recomputed
    assert totals["views_recomputed"] == {"source_stats": 0}
    df, n = source_stats_view(job.cfg.lake_root)
    assert n == 0  # tail left the view fully fresh
    t = job.lake.read_all()
    assert int(df["n_docs"].sum()) == t.num_rows


@pytest.mark.usefixtures("ray_session")
def test_token_histogram_and_custom_view_registration(tmp_path):
    from data_sync_ray.state.views import (
        REGISTRY,
        register_view,
        token_length_histogram_view,
    )

    spec = StreamSpec(n_events=300, n_docs=60, n_epochs=1, seed=41)
    base, epochs, ev_root = build_fixture(str(tmp_path), spec,
                                          n_base=60, seed=41)
    job = make_job(str(tmp_path), num_partitions=4)
    job.replay(ev_root, bootstrap=base)

    df, n = token_length_histogram_view(job.cfg.lake_root)
    assert n == 4
    t = job.lake.read_all()
    assert int(df["n_docs"].sum()) == t.num_rows
    # bucket membership: every n_tok falls in [2^(b-1), 2^b)
    for b in df["bucket_log2"]:
        assert b >= 1

    calls = []

    def my_view(lake_root):
        calls.append(lake_root)
        return None, 0

    register_view("my_view", my_view)
    assert REGISTRY["my_view"] is my_view
    job.tail(ev_root, poll_interval=0.01, max_rounds=1,
             refresh_views=("my_view",))
    assert calls == [job.cfg.lake_root]


@pytest.mark.usefixtures("ray_session")
def test_hll_distinct_view_incremental(tmp_path):
    """The incremental cardinality gauge: register partials cached per
    partition, merge = exact sketch union, estimate equals a
    from-scratch HLL over the same key set at every step."""
    import numpy as np

    from data_sync_ray.functions.sketch import _HLL_M, hll_estimate, hll_registers
    from data_sync_ray.state.views import hll_distinct_view

    spec = StreamSpec(n_events=800, n_docs=120, n_epochs=1, seed=13)
    base, epochs, ev_root = build_fixture(str(tmp_path), spec,
                                          n_base=120, seed=13)
    job = make_job(str(tmp_path), num_partitions=8)
    job.replay(ev_root, bootstrap=base)
    lake_root = job.cfg.lake_root

    def scratch():
        ids = job.lake.read_all().column("doc_id").to_pylist()
        m_j = np.zeros(_HLL_M, dtype=np.int64)
        for b, r in hll_registers(ids).items():
            m_j[b] = max(m_j[b], r)
        return hll_estimate(m_j), len(set(ids))

    df1, n1 = hll_distinct_view(lake_root)
    want, n_true = scratch()
    assert df1["int_sum"].iloc[0] == want["int_sum"].iloc[0]
    assert df1["est_distinct"].iloc[0] == want["est_distinct"].iloc[0]
    # m=256 -> ~6.5% relative error; generous 4-sigma bound
    assert abs(df1["est_distinct"].iloc[0] - n_true) / n_true < 0.3

    # steady state: zero partitions recomputed, same registers
    df2, n2 = hll_distinct_view(lake_root)
    assert n2 == 0 and df2["int_sum"].iloc[0] == df1["int_sum"].iloc[0]

    # new inserts invalidate only their partitions; estimate tracks
    tiny = gen_change_stream(
        StreamSpec(n_events=10, n_docs=120, n_epochs=1, seed=99)
    )[0]
    tiny = tiny.filter(pc.equal(tiny.column("op"), "insert"))
    assert tiny.num_rows > 0
    job.apply_epoch(7, rd.from_arrow(tiny))
    df3, n3 = hll_distinct_view(lake_root)
    assert 0 < n3 < 8
    want3, _ = scratch()
    assert df3["int_sum"].iloc[0] == want3["int_sum"].iloc[0]


@pytest.mark.usefixtures("ray_session")
def test_content_dup_gauge_view(tmp_path):
    """The streaming dup gauge: rows minus HLL-distinct content equals a
    from-scratch sketch over the same buffers at every step, recompute
    is O(changed partitions), and planting exact copies moves est_dups
    while distinct-content stays put."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from data_sync_ray.functions.sketch import (
        _HLL_M,
        hll_estimate,
        hll_registers,
    )
    from data_sync_ray.state.views import content_dup_gauge_view

    spec = StreamSpec(n_events=600, n_docs=100, n_epochs=1, seed=21)
    base, epochs, ev_root = build_fixture(str(tmp_path), spec,
                                          n_base=100, seed=21)
    job = make_job(str(tmp_path), num_partitions=8)
    job.replay(ev_root, bootstrap=base)
    lake_root = job.cfg.lake_root

    def scratch():
        t = job.lake.read_all()
        hs = [
            hashlib.blake2b(
                np.asarray(r if r is not None else [], dtype=np.int32)
                .tobytes(),
                digest_size=8,
            ).hexdigest()
            for r in t.column("tokens").to_pylist()
        ]
        m_j = np.zeros(_HLL_M, dtype=np.int64)
        for b, r in hll_registers(hs).items():
            m_j[b] = max(m_j[b], r)
        est = int(hll_estimate(m_j)["est_distinct"].iloc[0])
        return t.num_rows, est

    df1, n1 = content_dup_gauge_view(lake_root)
    rows, est = scratch()
    assert df1["n_rows"].iloc[0] == rows
    assert df1["est_distinct_contents"].iloc[0] == est
    assert df1["est_dups"].iloc[0] == max(0, rows - est)

    # steady state: nothing recomputed
    df2, n2 = content_dup_gauge_view(lake_root)
    assert n2 == 0 and df2.equals(df1)

    # plant exact content copies of existing docs under NEW doc ids:
    # distinct contents must not grow, est_dups must
    live = job.lake.read_all()
    dup_rows = live.slice(0, 10)
    planted = pa.table(
        {
            "doc_id": pa.array(
                [f"dupcopy{i:04d}" for i in range(10)], pa.string()
            ),
            "op": pa.array(["insert"] * 10),
            "log_pos": pa.array(
                [10_000_000 + i for i in range(10)], pa.int64()
            ),
            "tokens": dup_rows.column("tokens"),
            "source": dup_rows.column("source"),
        }
    )
    job.apply_epoch(9, rd.from_arrow(planted))
    df3, n3 = content_dup_gauge_view(lake_root)
    assert 0 < n3 <= 8
    rows3, est3 = scratch()
    assert df3["n_rows"].iloc[0] == rows3 == rows + 10
    assert df3["est_distinct_contents"].iloc[0] == est3 == est
    assert df3["est_dups"].iloc[0] == df1["est_dups"].iloc[0] + 10


@pytest.mark.usefixtures("ray_session")
def test_source_freshness_view(tmp_path):
    """Per-source watermark view: max log_pos and live counts equal a
    full-scan ground truth, steady-state refresh recomputes nothing,
    and an insert moves only its source's watermark."""
    import pyarrow as pa

    from data_sync_ray.state.views import source_freshness_view

    spec = StreamSpec(n_events=500, n_docs=80, n_epochs=1, seed=31)
    base, epochs, ev_root = build_fixture(str(tmp_path), spec,
                                          n_base=80, seed=31)
    job = make_job(str(tmp_path), num_partitions=8)
    job.replay(ev_root, bootstrap=base)
    lake_root = job.cfg.lake_root

    def scratch():
        t = job.lake.read_all()
        acc = {}
        for s, lp in zip(t.column("source").to_pylist(),
                         t.column("log_pos").to_pylist()):
            e = acc.setdefault(s or "", [0, 0])
            e[0] = max(e[0], int(lp))
            e[1] += 1
        return {s: tuple(v) for s, v in acc.items()}

    df1, n1 = source_freshness_view(lake_root)
    got = {r["source"]: (r["max_log_pos"], r["n_docs"])
           for _, r in df1.iterrows()}
    assert got == scratch()

    df2, n2 = source_freshness_view(lake_root)
    assert n2 == 0 and df2.equals(df1)

    # one insert for a single source: its watermark advances, others hold
    target_src = df1["source"].iloc[0]
    planted = pa.table(
        {
            "doc_id": pa.array(["freshdoc0001"], pa.string()),
            "op": pa.array(["insert"]),
            "log_pos": pa.array([99_999_999], pa.int64()),
            "tokens": pa.array([[1, 2, 3]], pa.list_(pa.int32())),
            "source": pa.array([target_src], pa.string()),
        }
    )
    job.apply_epoch(5, rd.from_arrow(planted))
    df3, n3 = source_freshness_view(lake_root)
    assert 0 < n3 <= 8
    got3 = {r["source"]: (r["max_log_pos"], r["n_docs"])
            for _, r in df3.iterrows()}
    assert got3 == scratch()
    assert got3[target_src][0] == 99_999_999
    for s in got:
        if s != target_src:
            assert got3[s] == got[s]


@pytest.mark.usefixtures("ray_session")
def test_export_lake_incremental(tmp_path):
    """Incremental mirror: first export writes every partition, steady
    state writes none, a tiny epoch re-exports only its partitions, and
    the mirror always reads back equal to the live lake state."""
    import os

    import pyarrow.parquet as pq
    from pyarrow import concat_tables

    from data_sync_ray.pipelines.replay import export_lake_incremental

    spec = StreamSpec(n_events=600, n_docs=120, n_epochs=1, seed=41)
    base, epochs, ev_root = build_fixture(str(tmp_path), spec,
                                          n_base=120, seed=41)
    job = make_job(str(tmp_path), num_partitions=8)
    job.replay(ev_root, bootstrap=base)
    out = os.path.join(str(tmp_path), "mirror")

    def mirror_table():
        parts = [
            pq.read_table(os.path.join(out, d, "part-0.parquet"))
            for d in sorted(os.listdir(out)) if d.startswith("partition=")
        ]
        return concat_tables(parts).sort_by("doc_id")

    r1 = export_lake_incremental(job.cfg.lake_root, out)
    assert r1 == {"exported": 8, "skipped": 0}
    want = job.lake.read_all().sort_by("doc_id")
    got = mirror_table().select(want.column_names)
    assert got.combine_chunks().equals(want.combine_chunks())

    # steady state: no checkpoint moved => nothing rewritten
    mtimes = {
        d: os.path.getmtime(os.path.join(out, d, "part-0.parquet"))
        for d in os.listdir(out) if d.startswith("partition=")
    }
    r2 = export_lake_incremental(job.cfg.lake_root, out)
    assert r2 == {"exported": 0, "skipped": 8}

    # a tiny epoch re-exports only the partitions it touched
    tiny = gen_change_stream(
        StreamSpec(n_events=6, n_docs=120, n_epochs=1, seed=43)
    )[0]
    tiny = tiny.filter(pc.equal(tiny.column("op"), "insert"))
    assert tiny.num_rows > 0
    job.apply_epoch(5, rd.from_arrow(tiny))
    r3 = export_lake_incremental(job.cfg.lake_root, out)
    assert 0 < r3["exported"] < 8
    unchanged = [
        d for d in mtimes
        if os.path.getmtime(os.path.join(out, d, "part-0.parquet"))
        == mtimes[d]
    ]
    assert len(unchanged) == 8 - r3["exported"]
    want2 = job.lake.read_all().sort_by("doc_id")
    got2 = mirror_table().select(want2.column_names)
    assert got2.combine_chunks().equals(want2.combine_chunks())


def test_export_empty_lake_reports_zero(tmp_path):
    """A lake with checkpoints but zero data files must export nothing
    and say so — not count its partitions as exported every round while
    never writing a part file."""
    import os

    from data_sync_ray import Lake, SyncConfig
    from data_sync_ray.pipelines.replay import export_lake_incremental

    cfg = SyncConfig(lake_root=os.path.join(str(tmp_path), "lake"),
                     num_partitions=4)
    lake = Lake.create(cfg)
    # materialize checkpoints with empty files lists (the RMW path any
    # commit uses) — a lake that has bookkeeping but no fragments yet
    for p in range(4):
        lake.record_failure(p, "probe")
    assert len(lake.partitions()) == 4
    for p in lake.partitions():
        assert lake.read_checkpoint(p).get("files", []) == []
    out = os.path.join(str(tmp_path), "mirror")
    r = export_lake_incremental(cfg.lake_root, out)
    assert r == {"exported": 0, "skipped": 4}
    r2 = export_lake_incremental(cfg.lake_root, out)
    assert r2 == {"exported": 0, "skipped": 4}


@pytest.mark.usefixtures("ray_session")
def test_tail_keeps_export_mirror_fresh(tmp_path):
    """tail(export_dir=...) republishes changed partitions per round and
    the mirror ends equal to the lake."""
    import os

    import pyarrow.parquet as pq
    from pyarrow import concat_tables

    spec = StreamSpec(n_events=400, n_docs=80, n_epochs=2, seed=17)
    base, epochs, ev_root = build_fixture(str(tmp_path), spec,
                                          n_base=80, seed=17)
    job = make_job(str(tmp_path), num_partitions=4)
    out = os.path.join(str(tmp_path), "mirror")
    totals = job.tail(ev_root, poll_interval=0.01, max_rounds=2,
                      bootstrap=base, export_dir=out)
    # round 1 exports all 4 partitions; round 2 replays nothing new
    assert totals["exported_partitions"] == 4
    want = job.lake.read_all().sort_by("doc_id")
    got = concat_tables([
        pq.read_table(os.path.join(out, d, "part-0.parquet"))
        for d in sorted(os.listdir(out)) if d.startswith("partition=")
    ]).sort_by("doc_id").select(want.column_names)
    assert got.combine_chunks().equals(want.combine_chunks())


@pytest.mark.usefixtures("ray_session")
def test_export_mirror_heals_torn_state(tmp_path):
    """Crash-shaped damage heals on the next export round: a deleted
    manifest re-publishes everything; a deleted part file re-publishes
    just that partition (fingerprint match is not trusted over a
    missing file); stray tmp files never shadow the real part."""
    import os

    import pyarrow.parquet as pq
    from pyarrow import concat_tables

    from data_sync_ray.pipelines.replay import export_lake_incremental

    spec = StreamSpec(n_events=500, n_docs=100, n_epochs=1, seed=53)
    base, epochs, ev_root = build_fixture(str(tmp_path), spec,
                                          n_base=100, seed=53)
    job = make_job(str(tmp_path), num_partitions=4)
    job.replay(ev_root, bootstrap=base)
    out = os.path.join(str(tmp_path), "mirror")
    export_lake_incremental(job.cfg.lake_root, out)
    want = job.lake.read_all().sort_by("doc_id")

    def mirror():
        return concat_tables([
            pq.read_table(os.path.join(out, d, "part-0.parquet"))
            for d in sorted(os.listdir(out)) if d.startswith("partition=")
        ]).sort_by("doc_id").select(want.column_names)

    # torn manifest: everything re-publishes, state unchanged
    os.unlink(os.path.join(out, "_EXPORT_MANIFEST.json"))
    r = export_lake_incremental(job.cfg.lake_root, out)
    assert r["exported"] == 4
    assert mirror().combine_chunks().equals(want.combine_chunks())

    # missing part file with a CURRENT manifest: only it re-publishes
    victim = os.path.join(out, "partition=2", "part-0.parquet")
    os.unlink(victim)
    with open(victim + ".tmp.999", "w") as f:
        f.write("torn")  # stray tmp from a killed writer
    r2 = export_lake_incremental(job.cfg.lake_root, out)
    assert r2 == {"exported": 1, "skipped": 3}
    assert os.path.exists(victim)
    assert mirror().combine_chunks().equals(want.combine_chunks())
