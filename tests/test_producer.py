"""EventLogProducer (K3 producer analog): produce -> flush -> a tailing
ReplayJob consumes the new epoch; numbering resumes across producers;
half-written epochs are never visible (atomic rename publish)."""

import os

import pyarrow as pa
import pytest

from data_sync_ray import (
    EventLogProducer,
    ReplayJob,
    StreamSpec,
    SyncConfig,
    gen_base_table,
    gen_change_stream,
    list_epoch_dirs,
    replay_oracle,
    write_event_log,
)

from test_replay_e2e import assert_tables_equal


@pytest.mark.usefixtures("ray_session")
def test_produce_flush_tail_roundtrip(tmp_path):
    spec = StreamSpec(n_events=900, n_docs=90, n_epochs=3, seed=55)
    base = gen_base_table(90, seed=55)
    epochs = gen_change_stream(spec)
    ev_root = os.path.join(str(tmp_path), "events")

    # producer publishes the three epochs one flush at a time
    prod = EventLogProducer(ev_root)
    for t in epochs:
        assert prod.produce(t) == t.num_rows
        assert prod.flush() is not None
    assert prod.flush() is None  # empty buffer -> no-op
    assert [e for e, _ in list_epoch_dirs(ev_root)] == [0, 1, 2]

    job = ReplayJob(SyncConfig(lake_root=os.path.join(str(tmp_path), "lake"),
                               num_partitions=4))
    job.replay(ev_root, bootstrap=base)
    assert_tables_equal(job.lake.read_all(), replay_oracle(base, epochs))


def test_epoch_numbering_resumes_and_tmp_never_visible(tmp_path):
    ev_root = str(tmp_path / "events")
    write_event_log(ev_root, gen_change_stream(
        StreamSpec(n_events=100, n_docs=20, n_epochs=2, seed=1)))
    prod = EventLogProducer(ev_root)
    assert prod.next_epoch == 2  # resumes after existing log
    prod.produce(pa.table({"doc_id": ["a"], "log_pos": [999],
                           "op": ["insert"], "table": ["docs"]}))
    # buffered but unflushed rows are invisible to consumers
    assert len(list_epoch_dirs(ev_root)) == 2
    path = prod.flush()
    assert path.endswith("epoch=00002")
    assert len(list_epoch_dirs(ev_root)) == 3
    # a second producer continues the sequence
    assert EventLogProducer(ev_root).next_epoch == 3


def test_concurrent_producers_serialize_epoch_numbers(tmp_path):
    """Two producers that both saw the same log state must publish
    SEQUENTIAL epochs (the flush lock re-derives the number), and a
    failed flush keeps the buffer so it can be retried."""
    root = str(tmp_path / "ev")
    p1, p2 = EventLogProducer(root), EventLogProducer(root)
    assert p1.next_epoch == p2.next_epoch == 0
    row = {"doc_id": "a", "log_pos": 1, "op": "insert", "table": "docs"}
    p1.produce(dict(row))
    p2.produce(dict(row, log_pos=2))
    d1 = p1.flush()
    d2 = p2.flush()  # re-derives under the lock: no collision
    assert d1.endswith("epoch=00000")
    assert d2.endswith("epoch=00001")
    assert len(list_epoch_dirs(root)) == 2
    # no orphaned tmp dirs after successful flushes
    assert not [n for n in os.listdir(root) if n.startswith(".tmp-")]


def test_produce_accepts_row_dicts(tmp_path):
    prod = EventLogProducer(str(tmp_path / "ev"))
    n = prod.produce({"doc_id": "x", "log_pos": 1, "op": "insert",
                      "table": "docs"})
    assert n == 1
    n = prod.produce([{"doc_id": "y", "log_pos": 2, "op": "insert",
                       "table": "docs"}])
    assert n == 2
    assert prod.flush() is not None
