"""Unit tests for the pure LWW merge kernels (no Ray needed)."""

import pyarrow as pa
import pyarrow.compute as pc

from data_sync_ray.stages.merge import (
    DELETED_COL,
    events_to_delta,
    fold_state,
    lww_winners,
    unify_concat,
)


def t(rows, schema=None):
    return pa.Table.from_pylist(rows, schema=schema)


def test_lww_winner_basic_and_out_of_order():
    tab = t(
        [
            {"doc_id": "a", "log_pos": 3, "v": 30},
            {"doc_id": "a", "log_pos": 1, "v": 10},
            {"doc_id": "b", "log_pos": 2, "v": 20},
            {"doc_id": "a", "log_pos": 2, "v": 20},
        ]
    )
    out = lww_winners(tab)
    got = {r["doc_id"]: r for r in out.to_pylist()}
    assert got["a"]["log_pos"] == 3 and got["a"]["v"] == 30
    assert got["b"]["log_pos"] == 2


def test_lww_winner_duplicate_rows_converge():
    rows = [{"doc_id": "x", "log_pos": 5, "v": 1}] * 3
    out = lww_winners(t(rows))
    assert out.num_rows == 1


def test_fold_tombstone_drops_key():
    base = t([{"doc_id": "a", "log_pos": 0, "v": 1},
              {"doc_id": "b", "log_pos": 0, "v": 2}])
    delta = t([{"doc_id": "a", "log_pos": 9, "v": None, DELETED_COL: True}])
    out = fold_state([base, delta])
    assert out.column("doc_id").to_pylist() == ["b"]
    assert DELETED_COL not in out.column_names


def test_fold_delete_then_reinsert():
    d1 = t([{"doc_id": "a", "log_pos": 5, "v": None, DELETED_COL: True}])
    d2 = t([{"doc_id": "a", "log_pos": 8, "v": 7, DELETED_COL: False}])
    base = t([{"doc_id": "a", "log_pos": 0, "v": 1}])
    # fold order must not matter (LWW is order-insensitive)
    out1 = fold_state([base, d1, d2])
    out2 = fold_state([d2, base, d1])
    assert out1.equals(out2)
    assert out1.to_pylist() == [{"doc_id": "a", "log_pos": 8, "v": 7}]


def test_unify_concat_schema_evolution_add_and_widen():
    a = pa.table({"doc_id": ["a"], "n": pa.array([1], pa.int32())})
    b = pa.table(
        {"doc_id": ["b"], "n": pa.array([2**40], pa.int64()),
         "quality": pa.array([0.5], pa.float32())}
    )
    out = unify_concat([a, b])
    assert out.schema.field("n").type == pa.int64()
    assert out.schema.field("quality").type == pa.float32()
    got = {r["doc_id"]: r for r in out.to_pylist()}
    assert got["a"]["quality"] is None
    assert got["b"]["n"] == 2**40


def test_events_to_delta_tombstones_and_envelope_drop():
    ev = t(
        [
            {"op": "insert", "table": "docs", "ts": None, "schema_ver": 1,
             "doc_id": "a", "log_pos": 1, "tokens": [1], "n_tok": 1,
             "source": "web"},
            {"op": "delete", "table": "docs", "ts": None, "schema_ver": 1,
             "doc_id": "b", "log_pos": 2, "tokens": None, "n_tok": None,
             "source": "web"},
        ]
    )
    d = events_to_delta(ev)
    assert set(d.column_names) == {"doc_id", "log_pos", "tokens", "n_tok",
                                   "source", DELETED_COL}
    assert d.column(DELETED_COL).to_pylist() == [False, True]


def test_fold_empty():
    empty = pa.schema([("doc_id", pa.string()), ("log_pos", pa.int64())])
    out = fold_state([empty.empty_table()])
    assert out.num_rows == 0
