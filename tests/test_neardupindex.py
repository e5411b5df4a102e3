"""Cross-epoch incremental NEAR-dup index (state/neardupindex.py).

Semantics under test: drop iff within Hamming<=3 of ANY earlier-SEEN
doc (earlier epoch, then smaller doc_id; dropped docs still shield),
exactly-once per (partition, epoch), torn-epoch resume, compaction
preserving both the seen-set and every epoch's replay answer.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from data_sync_ray.functions.dedup import SimHasher
from data_sync_ray.state.neardupindex import NearDupIndex, _explode_bands


def _ds(rows):
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
    """Sequential seen-rule reference: brute-force Hamming against every
    earlier doc's signature, dropped docs included."""
    h = SimHasher()
    seen: list[np.uint64] = []
    surv: dict[int, list[int]] = {}
    for e in sorted(epochs):
        for did, text in sorted(epochs[e]):
            s = np.uint64(h.signature(text))
            drop = any(
                bin(int(s ^ t)).count("1") <= 3 for t in seen
            )
            seen.append(s)
            if not drop:
                surv.setdefault(e, []).append(did)
    return surv


def _corpus(seed: int = 3) -> dict[int, list[tuple[int, str]]]:
    """3 epochs: unique 30-word docs, exact cross-epoch dups, and
    one-word variants (often-but-not-always within Hamming 3 — the
    oracle decides; the exact dups guarantee the test bites)."""
    rng = np.random.default_rng(seed)
    words = lambda n: " ".join(  # noqa: E731
        str(int(w)) for w in rng.integers(0, 1 << 40, size=n)
    )
    base = {i: words(30) for i in range(6)}
    variant = {
        i: base[i].rsplit(" ", 1)[0] + f" {i}x" for i in range(6)
    }
    return {
        0: [(1, base[0]), (2, base[1]), (3, base[0]), (4, base[2])],
        1: [(11, base[1]), (12, words(30)), (13, variant[0]),
            (14, base[3])],
        2: [(21, variant[1]), (22, base[3]), (23, words(30)),
            (24, variant[3]), (25, base[0])],
    }


EPOCHS = _corpus()


def test_matches_sequential_oracle(ray_session, tmp_path):
    idx = NearDupIndex.create(str(tmp_path / "idx"), num_partitions=4)
    want = _oracle(EPOCHS)
    dropped_any = 0
    for e in sorted(EPOCHS):
        got = _survivor_ids(idx.ingest_epoch(_ds(EPOCHS[e]), e))
        assert got == want.get(e, []), f"epoch {e}"
        dropped_any += len(EPOCHS[e]) - len(got)
    assert dropped_any >= 4  # the planted exact dups really dropped


def test_idempotent_replay(ray_session, tmp_path):
    idx = NearDupIndex.create(str(tmp_path / "idx"), num_partitions=4)
    first = _survivor_ids(idx.ingest_epoch(_ds(EPOCHS[0]), 0))
    files = [idx.read_checkpoint(p)["files"] for p in range(4)]
    again = _survivor_ids(idx.ingest_epoch(_ds(EPOCHS[0]), 0))
    assert again == first
    assert [idx.read_checkpoint(p)["files"] for p in range(4)] == files


def test_torn_epoch_resume(ray_session, tmp_path):
    clean = NearDupIndex.create(str(tmp_path / "clean"), num_partitions=4)
    clean.ingest_epoch(_ds(EPOCHS[0]), 0)
    want = _survivor_ids(clean.ingest_epoch(_ds(EPOCHS[1]), 1))

    torn = NearDupIndex.create(str(tmp_path / "torn"), num_partitions=4)
    torn.ingest_epoch(_ds(EPOCHS[0]), 0)
    # hand-commit epoch 1 for ONE partition only
    h = SimHasher()
    sigs = np.array(
        [h.signature(t) for _, t in sorted(EPOCHS[1])], dtype=np.uint64
    )
    ids = np.array([d for d, _ in sorted(EPOCHS[1])], dtype=np.int64)
    bands = _explode_bands(sigs, ids, 4)
    p = int(bands["_part"].iloc[0])
    torn.commit_epoch_partition(
        p, 1, bands[bands["_part"] == p].drop(columns=["_part"])
    )
    assert torn.pending_epochs() == {1}
    with pytest.raises(ValueError, match="partially committed"):
        torn.ingest_epoch(_ds(EPOCHS[2]), 2)
    got = _survivor_ids(torn.ingest_epoch(_ds(EPOCHS[1]), 1))
    assert got == want
    assert torn.pending_epochs() == set()


def test_compact_preserves_seen_and_replay(ray_session, tmp_path):
    idx = NearDupIndex.create(str(tmp_path / "idx"), num_partitions=4)
    replay_want = {}
    for e in sorted(EPOCHS):
        replay_want[e] = _survivor_ids(idx.ingest_epoch(_ds(EPOCHS[e]), e))
    for p in range(4):
        idx.compact(p)
    for p in range(4):
        assert len(idx.read_checkpoint(p)["files"]) <= 1
    for e in sorted(EPOCHS):
        assert _survivor_ids(idx.ingest_epoch(_ds(EPOCHS[e]), e)) == \
            replay_want[e]
    # seen-set intact post-compaction: a re-send of epoch-0 text drops,
    # a genuinely new doc survives
    rng_txt = " ".join(str(i * 7919 + 13) for i in range(30))
    nxt = [(31, EPOCHS[0][0][1]), (32, rng_txt)]
    assert _survivor_ids(idx.ingest_epoch(_ds(nxt), 3)) == [32]


def test_out_of_order_raises(ray_session, tmp_path):
    idx = NearDupIndex.create(str(tmp_path / "idx"), num_partitions=4)
    idx.ingest_epoch(_ds(EPOCHS[0]), 0)
    idx.ingest_epoch(_ds(EPOCHS[1]), 5)
    with pytest.raises(ValueError, match="increasing order"):
        idx.ingest_epoch(_ds(EPOCHS[2]), 3)
