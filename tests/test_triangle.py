"""Triangle census over the part co-purchase graph — handcrafted
graphs with counts known in closed form, checked end-to-end through
the two-exchange edge build + broadcast-CSR counting tasks."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from data_sync_ray.pipelines.queries import (
    common_neighbors_topk,
    triangle_count_graph,
)


def _write_lineitem(tmp_path, rows):
    t = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_k4_complete_graph(tmp_path, ray_session):
    # one order with 4 parts -> K4: C(4,3)=4 triangles, 6 edges,
    # every node deg 3 -> 12 wedges, cc = 3*4/12 = 1.0 = 10000 bp
    sf = _write_lineitem(tmp_path, [(1, p) for p in (1, 2, 3, 4)])
    out = triangle_count_graph(sf)
    row = out.iloc[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles,
            row.n_wedges, row.cc_bp) == (4, 6, 4, 12, 10000)


def test_two_orders_shared_edge(tmp_path, ray_session):
    # orders {1,2,3} and {2,3,4}: edge 2-3 shared (deduped), 5 edges,
    # triangles {1,2,3} and {2,3,4}; deg = (2,3,3,2) -> wedges 8,
    # cc = 6/8 -> 7500 bp. Duplicate lineitem rows must not inflate.
    rows = [(1, 1), (1, 2), (1, 3), (2, 2), (2, 3), (2, 4), (2, 4)]
    out = triangle_count_graph(_write_lineitem(tmp_path, rows))
    row = out.iloc[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles,
            row.n_wedges, row.cc_bp) == (4, 5, 2, 8, 7500)
    assert all(str(out[c].dtype) == "int64" for c in out.columns)


def test_triangle_free_and_empty(tmp_path, ray_session):
    # path graph (two 2-part orders sharing nothing triangular)
    rows = [(1, 1), (1, 2), (2, 2), (2, 3)]
    out = triangle_count_graph(_write_lineitem(tmp_path, rows))
    row = out.iloc[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles,
            row.n_wedges, row.cc_bp) == (3, 2, 0, 1, 0)
    # single-part orders -> no pairs at all -> all-zero census
    out0 = triangle_count_graph(_write_lineitem(tmp_path, [(1, 1), (2, 2)]))
    assert out0.iloc[0].tolist() == [0, 0, 0, 0, 0]


def test_common_neighbors_link_prediction(tmp_path, ray_session):
    # orders {1,2,3} and {2,3,4}: the ONLY non-adjacent pair is (1,4),
    # with common neighbors {2,3} -> exactly one predicted link
    rows = [(1, 1), (1, 2), (1, 3), (2, 2), (2, 3), (2, 4)]
    out = common_neighbors_topk(_write_lineitem(tmp_path, rows))
    assert out.values.tolist() == [[1, 4, 2]]
    assert all(str(out[c].dtype) == "int64" for c in out.columns)
    # K4 is complete: no non-edges -> empty prediction set
    k4 = _write_lineitem(tmp_path, [(1, p) for p in (1, 2, 3, 4)])
    assert len(common_neighbors_topk(k4)) == 0
    # no pairs at all -> empty, schema preserved
    out0 = common_neighbors_topk(_write_lineitem(tmp_path, [(1, 1)]))
    assert list(out0.columns) == ["part_a", "part_b", "common_neighbors"]
    assert len(out0) == 0
