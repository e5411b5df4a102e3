"""Property-based proofs of the merge semantics (hypothesis, no Ray).

The engine's whole exactly-once/ordering story rests on: LWW-by-log_pos is
commutative, associative, and idempotent, so ANY grouping of events into
delta fragments folded in ANY order — including with duplicated events —
yields the sequential-replay state. These tests pin that algebra.
"""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from data_sync_ray.stages.merge import DELETED_COL, fold_state, lww_winners

KEYS = ["a", "b", "c", "d"]


def event_strategy():
    return st.fixed_dictionaries(
        {
            "doc_id": st.sampled_from(KEYS),
            "op": st.sampled_from(["insert", "update", "delete"]),
            "v": st.integers(0, 100),
        }
    )


def with_log_pos(events):
    return [
        {**e, "log_pos": i + 1, DELETED_COL: e["op"] == "delete"}
        for i, e in enumerate(events)
    ]


def oracle(events):
    state = {}
    for e in sorted(events, key=lambda x: x["log_pos"]):
        if e[DELETED_COL]:
            state.pop(e["doc_id"], None)
        else:
            state[e["doc_id"]] = (e["log_pos"], e["v"])
    return state


def fold_to_state(tables):
    out = fold_state([t for t in tables if t.num_rows])
    return {
        r["doc_id"]: (r["log_pos"], r["v"])
        for r in out.to_pylist()
        if not r.get(DELETED_COL, False)
    }


def to_table(rows):
    if not rows:
        return pa.schema(
            [("doc_id", pa.string()), ("op", pa.string()), ("v", pa.int64()),
             ("log_pos", pa.int64()), (DELETED_COL, pa.bool_())]
        ).empty_table()
    return pa.Table.from_pylist(rows)


@settings(max_examples=200, deadline=None)
@given(
    events=st.lists(event_strategy(), min_size=1, max_size=40),
    cut_points=st.lists(st.integers(0, 39), max_size=5),
    seed=st.integers(0, 2**16),
)
def test_any_fragmentation_and_order_matches_oracle(events, cut_points, seed):
    """Split the event sequence at arbitrary points into fragments, fold
    them in a shuffled order: result == sequential oracle."""
    import random

    rows = with_log_pos(events)
    cuts = sorted({c for c in cut_points if c < len(rows)} | {0, len(rows)})
    frags = [rows[a:b] for a, b in zip(cuts, cuts[1:])]
    random.Random(seed).shuffle(frags)
    got = fold_to_state([to_table(f) for f in frags])
    want = oracle(rows)
    assert got == want


@settings(max_examples=100, deadline=None)
@given(
    events=st.lists(event_strategy(), min_size=1, max_size=30),
    dup_idx=st.lists(st.integers(0, 29), max_size=10),
)
def test_duplicated_delivery_converges(events, dup_idx):
    """At-least-once delivery: re-delivering any subset of events (same
    log_pos) leaves the folded state unchanged."""
    rows = with_log_pos(events)
    dups = [rows[i] for i in dup_idx if i < len(rows)]
    base = fold_to_state([to_table(rows)])
    with_dups = fold_to_state([to_table(rows), to_table(dups)])
    assert base == with_dups


@settings(max_examples=100, deadline=None)
@given(events=st.lists(event_strategy(), min_size=1, max_size=30))
def test_winners_idempotent_and_fold_associative(events):
    rows = with_log_pos(events)
    t = to_table(rows)
    w1 = lww_winners(t)
    w2 = lww_winners(w1)
    assert w1.sort_by("doc_id").equals(w2.sort_by("doc_id"))
    # fold(fold(a), b) == fold(a + b)
    half = len(rows) // 2
    a, b = to_table(rows[:half]), to_table(rows[half:])
    nested = fold_to_state([fold_state([x for x in [a] if x.num_rows] or [a]), b])
    flat = fold_to_state([a, b])
    assert nested == flat


@settings(max_examples=200, deadline=None)
@given(
    a=st.tuples(st.integers(0, 10**6), st.integers(0, (1 << 40) - 1)),
    b=st.tuples(st.integers(0, 10**6), st.integers(0, (1 << 40) - 1)),
)
def test_binlog_position_total_order_preserved(a, b):
    """parse_position's (file_idx << 40) | offset encoding preserves the
    lexicographic (file, offset) order of binlog positions — the property
    LWW correctness rests on for "file:offset" streams."""
    from data_sync_ray.sources.maxwell import parse_position

    def pos(t):
        return parse_position(
            {"position": f"master.{t[0]:06d}:{t[1]}"}
        )

    pa_, pb_ = pos(a), pos(b)
    assert (a < b) == (pa_ < pb_)
    assert (a == b) == (pa_ == pb_)


@given(
    a=st.tuples(st.integers(0, 10**9), st.integers(0, (1 << 16) - 1)),
    b=st.tuples(st.integers(0, 10**9), st.integers(0, (1 << 16) - 1)),
)
def test_canal_position_total_order_preserved(a, b):
    """The Canal source's (id << 16) | row_idx encoding preserves the
    lexicographic (batch id, row index) delivery order — together with
    the oversized-message veto this is what makes it a valid LWW total
    order."""
    from data_sync_ray.sources.canal import canal_to_maxwell

    def pos(t):
        mid, idx = t
        evs = canal_to_maxwell(
            {"type": "INSERT", "table": "t", "id": mid, "isDdl": False,
             "data": [{"doc_id": "x"}] * (idx + 1)}
        )
        return evs[idx]["position"]

    pa_, pb_ = pos(a), pos(b)
    assert (a < b) == (pa_ < pb_)
    assert (a == b) == (pa_ == pb_)


@settings(max_examples=150, deadline=None)
@given(
    overrides=st.dictionaries(
        st.one_of(
            st.sampled_from(
                ["batch_size", "spill_groups", "exchange_mode", "apply_mode",
                 "include_tables", "num_partitions", "key_column", "junk"]
            ),
            st.text(max_size=12),
        ),
        st.one_of(
            st.none(), st.booleans(), st.integers(-5, 10**7),
            st.floats(allow_nan=False), st.text(max_size=8),
            st.lists(st.text(max_size=5), max_size=3),
        ),
        max_size=6,
    )
)
def test_control_overrides_never_crash_and_never_touch_identity(overrides):
    """Reload analog safety: arbitrary override dicts never raise, never
    change lake-identity fields, and every key is either applied or
    rejected (no silent drops)."""
    from data_sync_ray import SyncConfig
    from data_sync_ray.control import ControlPlane

    cfg = SyncConfig()
    new_cfg, applied, rejected = ControlPlane.apply_overrides(cfg, overrides)
    assert set(applied) | set(rejected) == set(overrides)
    for f in ("num_partitions", "key_column", "order_column", "lake_root"):
        assert getattr(new_cfg, f) == getattr(cfg, f)
    new_cfg.to_json()  # still serializable for status.json


@settings(max_examples=40, deadline=None)
@given(
    commits=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=120),  # key
                st.booleans(),                            # deleted
            ),
            min_size=1, max_size=25,
        ),
        min_size=1, max_size=5,
    ),
    lo=st.integers(min_value=-5, max_value=130),
    span=st.integers(min_value=0, max_value=60),
)
def test_zone_map_range_read_equals_filtered_full(tmp_path_factory, commits, lo, span):
    """For ANY commit history (random keys, deletes, overlaps) and ANY
    range, the zone-map-pruned read equals the unpruned read filtered —
    file skipping and row-group pruning can never change an answer."""
    import numpy as np
    import pyarrow as pa

    from data_sync_ray import Lake, SyncConfig
    from data_sync_ray.stages.transform import assign_partition

    tmp = tmp_path_factory.mktemp("zm")
    cfg = SyncConfig(lake_root=str(tmp / "lake"), num_partitions=3,
                     row_group_rows=8)
    lake = Lake.create(cfg)
    pos = 0
    for epoch, rows in enumerate(commits):
        seen = {}
        for k, d in rows:
            seen[k] = d  # one row per key per epoch (engine pre-combines)
        ks = sorted(seen)
        t = pa.table(
            {
                "doc_id": pa.array(ks, pa.int64()),
                "log_pos": pa.array(
                    [pos + i for i in range(len(ks))], pa.int64()
                ),
                "_deleted": pa.array([seen[k] for k in ks]),
            }
        )
        pos += len(ks)
        t = assign_partition(t, 3)
        part = t.column("partition").to_numpy()
        for p in np.unique(part):
            sub = t.filter(pa.compute.equal(t.column("partition"), int(p)))
            lake.commit_delta(int(p), epoch, sub, sub.num_rows)
    hi = lo + span
    for p in lake.partitions():
        full = lake.read_partition(p)
        want = set()
        if full is not None:
            ids = full.column("doc_id").to_pylist()
            want = {k for k in ids if lo <= k <= hi}
        got_t = lake.read_partition(p, key_range=(lo, hi))
        got = set() if got_t is None else set(
            got_t.column("doc_id").to_pylist()
        )
        assert got == want


# --- vectorized pair-generation kernels -------------------------------------


@given(
    st.lists(st.integers(1, 6), min_size=1, max_size=12),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=200, deadline=None)
def test_triu_by_runs_matches_per_group_triu(run_sizes, seed):
    """_triu_by_runs over concatenated runs == np.triu_indices per run —
    the vectorized construction every pair generator now rests on."""
    import numpy as np

    from data_sync_ray.functions.dedup import _triu_by_runs

    m = np.array(run_sizes, dtype=np.int64)
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 1000, size=int(m.sum()))
    ia, ib = _triu_by_runs(m)
    got = sorted(zip(vals[ia].tolist(), vals[ib].tolist()))
    exp = []
    off = 0
    for sz in run_sizes:
        iu, ju = np.triu_indices(sz, k=1)
        exp.extend(
            zip(vals[off + iu].tolist(), vals[off + ju].tolist())
        )
        off += sz
    assert got == sorted(exp)


@given(
    st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=20),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=100, deadline=None)
def test_repetition_stats_kernel_matches_bruteforce(word_lists):
    """Duplicate-2-gram accounting == brute-force tuple counting for any
    corpus shape (empty docs, one-word docs, all-same docs)."""
    import pandas as pd

    from data_sync_ray.functions.dedup import _shingle_hashes

    for ws in word_lists:
        text = " ".join(ws)
        hs = _shingle_hashes(text, 2, unique=False)
        grams = [tuple(ws[i:i + 2]) for i in range(len(ws) - 1)]
        assert hs.size == len(grams)
        import numpy as np

        assert np.unique(hs).size == len(set(grams))


@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 300)),
        min_size=1, max_size=60, unique_by=lambda t: t[0],
    ),
    st.integers(1, 64),
)
@settings(max_examples=100, deadline=None)
def test_pack_bins_invariants(docs, budget):
    """_pack_bins (the kernel pack_sequences_docs and
    corpus_pipeline_docs share) must, for ANY doc set and budget:
    conserve every doc and token, assign bins by the exclusive-cumsum
    rule (a doc counts wholly toward the bin where it starts), keep
    bins contiguous in doc_id order, and never overrun the budget by
    a full doc (bin start offset < budget by construction)."""
    import numpy as np
    import pandas as pd

    from data_sync_ray.pipelines.queries import _pack_bins

    g = pd.DataFrame({
        "doc_id": [d for d, _ in docs],
        "n_words": [n for _, n in docs],
        "_part": np.zeros(len(docs), dtype=np.int64),
    })
    out = _pack_bins(g, budget)
    assert int(out["n_docs"].sum()) == len(docs)
    assert int(out["sum_tokens"].sum()) == sum(n for _, n in docs)
    # reference: sequential exclusive-cumsum bin assignment
    ordered = sorted(docs)
    cum = 0
    want_bins = []
    for _, n in ordered:
        want_bins.append(cum // budget)
        cum += n
    # bins must appear in order with matching doc counts/ranges
    ids = [d for d, _ in ordered]
    row = 0
    for b in sorted(set(want_bins)):
        members = [i for i, wb in zip(ids, want_bins) if wb == b]
        r = out.iloc[row]
        assert int(r["bin"]) == b
        assert int(r["n_docs"]) == len(members)
        assert int(r["first_doc"]) == members[0]
        assert int(r["last_doc"]) == members[-1]
        row += 1
    assert row == len(out)


@given(
    st.lists(
        st.tuples(st.sampled_from(["s0", "s1", "s2"]),
                  st.integers(0, 50)),
        min_size=1, max_size=80,
    )
)
@settings(max_examples=100, deadline=None)
def test_percentile_threshold_rank_rule(rows):
    """The shared per-source 25th-percentile rule — threshold = the
    k-th smallest score with k = (m*25+99)//100, computed via the
    histogram walk — must equal the naive sorted-rank definition for
    any score multiset (ties, single rows, all-equal)."""
    import pandas as pd

    merged = (
        pd.DataFrame(rows, columns=["source", "score_c"])
        .groupby(["source", "score_c"], sort=True).size().rename("n")
        .reset_index()
    )
    # the driver-side walk, lifted verbatim from the helper
    thr = {}
    for src, g in merged.groupby("source"):
        m = int(g["n"].sum())
        k = (m * 25 + 99) // 100
        cum = g["n"].cumsum()
        thr[str(src)] = int(g.loc[cum >= k, "score_c"].iloc[0])
    by_src = {}
    for s, v in rows:
        by_src.setdefault(s, []).append(v)
    for s, vals in by_src.items():
        m = len(vals)
        k = (m * 25 + 99) // 100
        assert thr[s] == sorted(vals)[k - 1]
