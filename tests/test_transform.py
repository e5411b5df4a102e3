"""Unit tests: filter precedence, column drop w/ PK protection, custom
filters, partition assignment, hot-key histogram (no Ray needed)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from data_sync_ray.config import SyncConfig, table_passes
from data_sync_ray.stages.transform import (
    assign_partition,
    clear_custom_filters,
    drop_filtered_columns,
    filter_tables,
    key_histogram,
    make_transform,
    register_custom_filter,
    stable_hash_strings,
)


# all 5 branches of the reference's precedence (regular_base.go:15-35)
@pytest.mark.parametrize(
    "table,include,exclude,expect",
    [
        ("a", ("a",), ("a",), True),   # include wins over exclude
        ("a", (), ("a",), False),      # excluded
        ("b", (), ("a",), True),       # only-exclude => pass others
        ("b", ("a",), (), False),      # only-include => drop others
        ("b", (), (), False),          # neither => default deny
    ],
)
def test_table_passes_precedence(table, include, exclude, expect):
    assert table_passes(table, include, exclude) is expect


def test_filter_tables_vectorized():
    cfg = SyncConfig(include_tables=("docs",))
    t = pa.table({"table": ["docs", "ignored_tbl", "docs"], "x": [1, 2, 3]})
    out = filter_tables(t, cfg)
    assert out.column("x").to_pylist() == [1, 3]


def test_drop_cols_protects_primary_key():
    cfg = SyncConfig(
        include_tables=("docs",),
        filter_cols={"docs": ("doc_id", "secret")},
    )
    t = pa.table(
        {"table": ["docs"], "doc_id": ["a"], "secret": ["s"], "keep": [1]}
    )
    out = drop_filtered_columns(t, cfg)
    assert "doc_id" in out.column_names      # PK protected
    assert "secret" not in out.column_names  # dropped for all present tables
    assert "keep" in out.column_names


def test_drop_cols_partial_table_nulls():
    cfg = SyncConfig(
        include_tables=("docs", "other"), filter_cols={"docs": ("aux",)}
    )
    t = pa.table({"table": ["docs", "other"], "doc_id": ["a", "b"],
                  "aux": [1, 2]})
    out = drop_filtered_columns(t, cfg)
    assert out.column("aux").to_pylist() == [None, 2]


def test_custom_filter_hook():
    clear_custom_filters()
    register_custom_filter(
        "docs", lambda t: t.filter(pc.greater(t.column("x"), 1))
    )
    try:
        from data_sync_ray.stages.transform import apply_custom_filters

        cfg = SyncConfig(include_tables=("docs", "other"))
        t = pa.table({"table": ["docs", "docs", "other"], "x": [1, 2, 0]})
        out = apply_custom_filters(t, cfg)
        got = sorted(zip(out.column("table").to_pylist(),
                         out.column("x").to_pylist()))
        assert got == [("docs", 2), ("other", 0)]
    finally:
        clear_custom_filters()


def test_stable_hash_deterministic():
    a = stable_hash_strings(np.array(["x", "y", "z"], dtype=object))
    b = stable_hash_strings(np.array(["x", "y", "z"], dtype=object))
    assert (a == b).all()
    assert len(set(a.tolist())) == 3


def test_assign_partition_consistent_ownership():
    t = pa.table({"doc_id": ["a", "b", "a", "c"]})
    out = assign_partition(t, 8)
    p = out.column("partition").to_pylist()
    assert p[0] == p[2]  # same key -> same partition, always
    assert all(0 <= x < 8 for x in p)


def test_key_histogram_detects_hot_key():
    keys = ["hot"] * 60 + [f"k{i}" for i in range(40)]
    t = pa.table({"doc_id": keys})
    hist = key_histogram(t, threshold=0.05)
    assert hist == {"hot": 60}
    assert key_histogram(pa.table({"doc_id": [f"k{i}" for i in range(50)]})) == {}


def test_full_transform_precombines_and_partitions():
    cfg = SyncConfig(include_tables=("docs",), num_partitions=4)
    t = pa.table(
        {
            "table": ["docs"] * 4 + ["ignored_tbl"],
            "op": ["insert", "update", "update", "insert", "insert"],
            "doc_id": ["a", "a", "a", "b", "z"],
            "log_pos": pa.array([1, 3, 2, 4, 5], pa.int64()),
            "tokens": [[1], [3], [2], [4], [9]],
        }
    )
    out = make_transform(cfg)(t)
    got = {r["doc_id"]: r for r in out.to_pylist()}
    assert set(got) == {"a", "b"}          # decoy filtered, LWW pre-combined
    assert got["a"]["log_pos"] == 3        # winner survives the combiner
    assert "partition" in out.column_names


@pytest.mark.usefixtures("ray_session")
def test_route_queries_survive_mostly_empty_partitions(tmp_path):
    """A 2-user events table / 3-vector embeddings table routed across
    32 fixed partitions leaves ~30 groups EMPTY; Ray's sort-based
    map_groups hands those through as column-less blocks. The two
    queries the round-3 verdict flagged must still produce exact
    results (the fn-level typed-empty guards + Ray's passthrough both
    tolerate the shape)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_sync_ray.pipelines.queries import (
        cdc_apply_final, embedding_near_dup_lsh,
    )

    events = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([0, 1, 2, 3], pa.timestamp("us")),
        "user_id": pa.array([7, 7, 9, 9], pa.int64()),
        "event_type": pa.array(["view", "purchase", "view", "click"]),
        "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        "props": pa.array(["{}"] * 4),
    })
    pq.write_table(events, str(tmp_path / "events.parquet"))
    emb = np.eye(3, 8, dtype=np.float32)
    emb[1] = emb[0]  # planted near-dup pair
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in emb],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1], pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))

    out = cdc_apply_final(str(tmp_path)).sort_values("user_id")
    # user 7's LWW winner is a purchase tombstone -> dropped
    assert out["user_id"].tolist() == [9]
    assert out["event_id"].tolist() == [4]

    pairs = embedding_near_dup_lsh(str(tmp_path))
    assert (pairs["vec_a"].tolist(), pairs["vec_b"].tolist()) == ([0], [1])
