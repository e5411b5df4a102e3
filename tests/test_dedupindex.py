"""Cross-epoch incremental dedup index (state/dedupindex.py).

Semantics under test: first epoch wins, then min doc_id; exactly-once
per (partition, epoch); epochs strictly increasing with torn-epoch
resume enforced; compaction preserves both the seen-set and every
recorded epoch's replay answer.
"""

import hashlib

import pandas as pd
import pytest
import ray.data as rd

from data_sync_ray.state.dedupindex import DedupIndex


def _ds(rows):
    """rows: list of (doc_id, text)."""
    return rd.from_pandas(
        pd.DataFrame(
            {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
        )
    )


def _survivor_ids(ds) -> list[int]:
    df = ds.to_pandas()
    if len(df) == 0:  # zero-row to_pandas is column-less (CLAUDE.md)
        return []
    return sorted(int(i) for i in df["doc_id"])


def _oracle(epochs: dict[int, list[tuple[int, str]]]) -> dict[int, list[int]]:
    """Keep-first over (epoch, doc_id) per distinct text — the SQL the
    query oracle uses, restated in pandas."""
    rows = [
        (e, did, text)
        for e in sorted(epochs)
        for did, text in epochs[e]
    ]
    df = pd.DataFrame(rows, columns=["epoch", "doc_id", "text"])
    keep = df.sort_values(["epoch", "doc_id"]).drop_duplicates("text")
    return {
        e: sorted(g["doc_id"].tolist())
        for e, g in keep.groupby("epoch")
    }


EPOCHS = {
    0: [(1, "alpha"), (2, "beta"), (3, "alpha"), (9, "gamma")],
    1: [(11, "beta"), (12, "delta"), (13, "delta"), (14, "epsilon")],
    2: [(21, "alpha"), (22, "zeta"), (23, "epsilon"), (24, "zeta")],
}


def test_three_epoch_keep_first(ray_session, tmp_path):
    idx = DedupIndex.create(str(tmp_path / "idx"), num_partitions=4)
    want = _oracle(EPOCHS)
    for e in sorted(EPOCHS):
        got = _survivor_ids(idx.ingest_epoch(_ds(EPOCHS[e]), e))
        assert got == want.get(e, []), f"epoch {e}"


def test_idempotent_replay(ray_session, tmp_path):
    idx = DedupIndex.create(str(tmp_path / "idx"), num_partitions=4)
    first = _survivor_ids(idx.ingest_epoch(_ds(EPOCHS[0]), 0))
    files_before = [
        idx.read_checkpoint(p)["files"] for p in range(4)
    ]
    again = _survivor_ids(idx.ingest_epoch(_ds(EPOCHS[0]), 0))
    assert again == first
    assert [idx.read_checkpoint(p)["files"] for p in range(4)] == files_before


def test_out_of_order_raises(ray_session, tmp_path):
    idx = DedupIndex.create(str(tmp_path / "idx"), num_partitions=4)
    idx.ingest_epoch(_ds(EPOCHS[0]), 0)
    idx.ingest_epoch(_ds(EPOCHS[1]), 5)
    with pytest.raises(ValueError, match="increasing order"):
        idx.ingest_epoch(_ds(EPOCHS[2]), 3)


def test_torn_epoch_resume(ray_session, tmp_path):
    """Simulate a crash mid-ingest: one partition committed, the rest
    not. The index must refuse later epochs until the torn one resumes,
    and the resumed ingest must return the same global survivor set as
    a clean run."""
    clean = DedupIndex.create(str(tmp_path / "clean"), num_partitions=4)
    clean.ingest_epoch(_ds(EPOCHS[0]), 0)
    want = _survivor_ids(clean.ingest_epoch(_ds(EPOCHS[1]), 1))

    torn = DedupIndex.create(str(tmp_path / "torn"), num_partitions=4)
    torn.ingest_epoch(_ds(EPOCHS[0]), 0)
    # hand-commit epoch 1 for ONE partition only (the torn state a
    # SIGKILL between partition commits leaves behind)
    by_part = {}
    for did, text in EPOCHS[1]:
        h = hashlib.md5(text.encode()).hexdigest()
        by_part.setdefault(int(h[:8], 16) % 4, []).append((did, h))
    p, rows = sorted(by_part.items())[0]
    torn.commit_epoch_partition(
        p,
        1,
        pd.DataFrame(
            {"doc_id": [r[0] for r in rows],
             "content_hash": [r[1] for r in rows]}
        ),
    )
    assert torn.pending_epochs() == {1}
    with pytest.raises(ValueError, match="partially committed"):
        torn.ingest_epoch(_ds(EPOCHS[2]), 2)
    got = _survivor_ids(torn.ingest_epoch(_ds(EPOCHS[1]), 1))
    assert got == want
    assert torn.pending_epochs() == set()


def test_compact_preserves_seen_and_replay(ray_session, tmp_path):
    idx = DedupIndex.create(str(tmp_path / "idx"), num_partitions=4)
    replay_want = {}
    for e in sorted(EPOCHS):
        replay_want[e] = _survivor_ids(idx.ingest_epoch(_ds(EPOCHS[e]), e))
    for p in range(4):
        idx.compact(p)
    for p in range(4):
        assert len(idx.read_checkpoint(p)["files"]) <= 1
    # replay of every past epoch still answers from the compacted base
    for e in sorted(EPOCHS):
        assert _survivor_ids(idx.ingest_epoch(_ds(EPOCHS[e]), e)) == \
            replay_want[e]
    # the seen-set survived: an epoch of pure re-sends admits nothing,
    # one genuinely new text survives
    nxt = [(31, "alpha"), (32, "delta"), (33, "eta")]
    assert _survivor_ids(idx.ingest_epoch(_ds(nxt), 3)) == [33]


def test_num_partitions_immutable(ray_session, tmp_path):
    DedupIndex.create(str(tmp_path / "idx"), num_partitions=4)
    with pytest.raises(ValueError, match="num_partitions"):
        DedupIndex.create(str(tmp_path / "idx"), num_partitions=8)


def test_empty_epoch_is_done_noop(ray_session, tmp_path):
    idx = DedupIndex.create(str(tmp_path / "idx"), num_partitions=4)
    idx.ingest_epoch(_ds(EPOCHS[0]), 0)
    assert _survivor_ids(idx.ingest_epoch(_ds([]), 1)) == []
    assert 1 in idx.epochs_done()
    # and the pipeline continues past it
    got = _survivor_ids(idx.ingest_epoch(_ds([(41, "theta")]), 2))
    assert got == [41]
