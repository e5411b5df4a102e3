"""Round-2 durability/crash-safety regressions:

- stale checkpoint tmp files from a crash mid-atomic-write must not block
  resume (ADVICE: lake.py part-* glob matched *.tmp.* partials);
- truncated spill fragments from a killed phase-1 task must be skipped or
  cleared, never wedge the fold (ADVICE: exchange.py);
- reopening a lake with different immutable config must fail loudly, not
  silently re-route keys (ADVICE: Lake.create CONFIG.json overwrite);
- sort-mode catch-up must serialize a partition's epoch commits in one
  task (ADVICE high: (partition, epoch) grouping raced the checkpoint RMW);
- the T4 failures counter is actually wired.
"""

import json
import os

import pyarrow as pa
import pytest

from data_sync_ray import (
    ReplayJob,
    StreamSpec,
    SyncConfig,
    gen_base_table,
    gen_change_stream,
    replay_oracle,
    write_event_log,
)
from data_sync_ray.stages.exchange import (
    _read_spill_safe,
    _write_spill,
    prepare_spill_dirs,
    spill_dir,
)
from data_sync_ray.state.lake import Lake

from test_replay_e2e import assert_tables_equal, build_fixture, make_job


def test_stale_ckpt_tmp_does_not_block_resume(tmp_path):
    cfg = SyncConfig(lake_root=str(tmp_path / "lake"), num_partitions=4)
    lake = Lake.create(cfg)
    lake.commit_delta(1, 0, pa.table({"doc_id": ["a"], "log_pos": [1]}), 1)
    # crash mid-atomic-write leaves a partial tmp file
    partial = os.path.join(lake.ckpt_dir, "part-00002.json.tmp.12345")
    with open(partial, "w") as f:
        f.write('{"partition": 2, "watermark')  # truncated JSON
    # listings must ignore it instead of raising JSONDecodeError
    assert lake.partitions() == [1]
    assert lake.watermarks() == {1: 1}
    assert lake.committed_partitions(0) == {1}
    assert lake.sweep_stale_tmp() == 1
    assert not os.path.exists(partial)


def test_truncated_spill_fragment_is_quarantined(tmp_path):
    root = str(tmp_path / "lake")
    prepare_spill_dirs(root, [0], 2)
    d = spill_dir(root, 0, 0)
    good = os.path.join(d, "good.arrows")
    _write_spill(pa.table({"doc_id": ["a"], "log_pos": [1]}), good)
    bad = os.path.join(d, "bad.arrows")
    with open(good, "rb") as f:
        blob = f.read()
    with open(bad, "wb") as f:
        f.write(blob[: len(blob) // 2])  # killed mid-write
    assert _read_spill_safe(good).num_rows == 1
    assert _read_spill_safe(bad) is None
    assert os.path.exists(bad + ".bad")  # quarantined, not re-parsed
    # and prepare_spill_dirs clears leftovers from a crashed prior run
    prepare_spill_dirs(root, [0], 2)
    assert os.listdir(spill_dir(root, 0, 0)) == []


def test_reopen_lake_with_different_partitioning_fails(tmp_path):
    cfg = SyncConfig(lake_root=str(tmp_path / "lake"), num_partitions=8)
    Lake.create(cfg)
    with pytest.raises(ValueError, match="num_partitions"):
        Lake.create(
            SyncConfig(lake_root=str(tmp_path / "lake"), num_partitions=16)
        )
    # same immutable fields: reopen fine (mutable fields may change)
    Lake.create(
        SyncConfig(lake_root=str(tmp_path / "lake"), num_partitions=8,
                   batch_size=1024)
    )


def test_failures_counter_is_wired(tmp_path):
    cfg = SyncConfig(lake_root=str(tmp_path / "lake"), num_partitions=4)
    lake = Lake.create(cfg)
    lake.record_failure(3, "RuntimeError('boom')")
    lake.record_failure(3)
    ck = lake.read_checkpoint(3)
    assert ck["failures"] == 2
    assert "boom" in ck["last_error"]


@pytest.mark.usefixtures("ray_session")
def test_chunked_fold_bounded_memory_equals_oracle(tmp_path):
    """fold_chunk_rows far below the spill size forces the incremental
    LWW reduce path many times over; the final state must still equal the
    sequential oracle exactly (fold algebra associativity in practice)."""
    spec = StreamSpec(n_events=6000, n_docs=300, n_epochs=3, seed=31,
                      evolve_from_epoch=2)
    base, epochs, ev_root = build_fixture(str(tmp_path), spec, n_base=300,
                                          seed=31)
    job = make_job(str(tmp_path), fold_chunk_rows=64)
    job.replay(ev_root, bootstrap=base)
    assert_tables_equal(job.lake.read_all(), replay_oracle(base, epochs))
    # events_in metric still counts raw (pre-reduce) spilled events
    total_in = sum(
        ln["events_in"]
        for p in job.lake.partitions()
        for ln in job.lake.read_checkpoint(p)["lineage"]
    )
    assert total_in >= 300  # bootstrap inserts alone


@pytest.mark.usefixtures("ray_session")
def test_sort_catchup_single_committer_per_partition(tmp_path):
    """Sort-mode catch-up: all of a partition's epochs commit from ONE
    group task (serially), so no checkpoint RMW race can drop a delta.
    Verified by (a) oracle equality and (b) every applied epoch's delta
    file still referenced in the checkpoint it committed to."""
    spec = StreamSpec(n_events=4000, n_docs=250, n_epochs=5, seed=99)
    base, epochs, ev_root = build_fixture(str(tmp_path), spec, n_base=250,
                                          seed=99)
    job = make_job(str(tmp_path), exchange_mode="sort")
    summary = job.replay(ev_root, bootstrap=base, catch_up=True)
    assert summary["epochs_run"] == 5
    assert_tables_equal(job.lake.read_all(), replay_oracle(base, epochs))
    for p in job.lake.partitions():
        ck = job.lake.read_checkpoint(p)
        lineage_writes = {
            ln["epoch"] for ln in ck["lineage"] if ln["rows_written"] > 0
        }
        referenced = {
            os.path.basename(f) for f in ck["files"]
        }
        for e in lineage_writes:
            tag = f"e{e:07d}" if e >= 0 else "bootstrap"
            assert f"delta-{tag}.parquet" in referenced, (
                f"partition {p}: epoch {e} delta lost from checkpoint"
            )


@pytest.mark.usefixtures("ray_session")
def test_span_commit_catchup_exact_and_time_travel(tmp_path):
    """Round-4 batched-commit amortization: a multi-epoch spill catch-up
    commits SPAN delta files (one per partition per span chunk), the
    final state stays oracle-exact, and an as-of read whose horizon
    falls strictly INSIDE a span reconstructs the per-epoch state via
    the `_epoch` row filter (time travel survives the coalescing)."""
    import glob

    spec = StreamSpec(n_events=5000, n_docs=250, n_epochs=6, seed=77)
    base, epochs, ev_root = build_fixture(str(tmp_path), spec, n_base=250,
                                          seed=77)
    job = make_job(str(tmp_path))
    job.replay(ev_root, bootstrap=base, catch_up=True)
    assert_tables_equal(job.lake.read_all(), replay_oracle(base, epochs))
    spans = glob.glob(
        os.path.join(job.cfg.lake_root, "data", "part=*", "delta-s*")
    )
    assert spans, "batched catch-up should write span deltas"
    # horizon inside the span: epochs {-1, 0, 1, 2} visible only
    want = replay_oracle(base, epochs[:3])
    got = [
        job.lake.read_partition(p, as_of_epoch=2)
        for p in job.lake.partitions()
    ]
    got = pa.concat_tables(
        [t for t in got if t is not None and t.num_rows],
        promote_options="permissive",
    )
    assert_tables_equal(got, want)


def test_span_commit_exactly_once_and_zone_maps(tmp_path):
    """commit_delta_span: duplicate delivery no-ops per epoch; a partial
    overlap writes only the fresh epochs into a NEW smaller span (never
    clobbering a committed file); file_stats keys == files throughout."""
    cfg = SyncConfig(lake_root=str(tmp_path / "lake"), num_partitions=4)
    lake = Lake.create(cfg)
    d0 = pa.table({"doc_id": ["a"], "log_pos": [1]})
    d1 = pa.table({"doc_id": ["b"], "log_pos": [2]})
    ms = lake.commit_delta_span(1, [(0, d0, 1), (1, d1, 1)])
    assert [m["replayed"] for m in ms] == [False, False]
    ck = lake.read_checkpoint(1)
    assert ck["applied_epochs"] == [0, 1]
    assert ck["watermark_log_pos"] == 2
    files_before = list(ck["files"])
    assert any("delta-s0_1" in f for f in files_before)
    # duplicate delivery: all epochs no-op, nothing written
    ms2 = lake.commit_delta_span(1, [(0, d0, 1), (1, d1, 1)])
    assert all(m["replayed"] for m in ms2)
    assert lake.read_checkpoint(1)["files"] == files_before
    # partial overlap: only epoch 2 lands, in its own span file
    d2 = pa.table({"doc_id": ["c"], "log_pos": [3]})
    ms3 = lake.commit_delta_span(1, [(1, d1, 1), (2, d2, 1)])
    assert [m["replayed"] for m in ms3] == [True, False]
    ck = lake.read_checkpoint(1)
    assert ck["applied_epochs"] == [0, 1, 2]
    assert any("delta-s2_2" in f for f in ck["files"])
    assert set(ck["file_stats"]) == set(ck["files"])
    # merged read sees all three rows, `_epoch` never leaks out
    t = lake.read_partition(1)
    assert sorted(t.column("doc_id").to_pylist()) == ["a", "b", "c"]
    assert "_epoch" not in t.column_names
    # as-of at 0 keeps only the first span's epoch-0 rows
    t0 = lake.read_partition(1, as_of_epoch=0)
    assert t0.column("doc_id").to_pylist() == ["a"]


@pytest.mark.usefixtures("ray_session")
def test_span_chunking_and_compaction(tmp_path):
    """span_commit_epochs below the backlog size splits the catch-up
    into multiple span commits per partition; compaction folds spans
    into the base and raises the time-travel horizon as usual."""
    import glob

    spec = StreamSpec(n_events=4000, n_docs=200, n_epochs=5, seed=13)
    base, epochs, ev_root = build_fixture(str(tmp_path), spec, n_base=200,
                                          seed=13)
    job = make_job(str(tmp_path), span_commit_epochs=2)
    job.replay(ev_root, bootstrap=base, catch_up=True)
    want = replay_oracle(base, epochs)
    assert_tables_equal(job.lake.read_all(), want)
    # 6 epochs (incl. bootstrap) / span 2 => up to 3 span files per part
    one_part = sorted(
        os.path.basename(f)
        for f in glob.glob(
            os.path.join(job.cfg.lake_root, "data", "part=00000", "*")
        )
    )
    assert len([f for f in one_part if f.startswith("delta-s")]) >= 2
    job.compact()
    assert_tables_equal(job.lake.read_all(), want)
    with pytest.raises(ValueError, match="compacted"):
        job.lake.read_partition(job.lake.partitions()[0], as_of_epoch=1)
