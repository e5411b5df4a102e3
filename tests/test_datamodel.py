"""Unit tests: synthetic fixtures are deterministic and well-formed."""

import pyarrow as pa
import pyarrow.compute as pc

from data_sync_ray import (
    CHANGE_EVENT_SCHEMA,
    LAKE_SCHEMA,
    StreamSpec,
    gen_base_table,
    gen_change_stream,
    replay_oracle,
)


def test_base_table_deterministic():
    a = gen_base_table(100, seed=7)
    b = gen_base_table(100, seed=7)
    assert a.equals(b)
    assert a.schema.equals(LAKE_SCHEMA)
    # invariant: n_tok == len(tokens)
    lens = pc.list_value_length(a.column("tokens"))
    assert pc.all(pc.equal(lens.cast(pa.int32()), a.column("n_tok"))).as_py()


def test_stream_deterministic_and_shaped():
    spec = StreamSpec(n_events=2000, n_docs=300, n_epochs=3, seed=11)
    e1 = gen_change_stream(spec)
    e2 = gen_change_stream(spec)
    assert len(e1) == 3
    for a, b in zip(e1, e2):
        assert a.equals(b)
    allt = pa.concat_tables(e1)
    assert allt.num_rows == 2000
    # log_pos globally unique
    assert pc.count_distinct(allt.column("log_pos")).as_py() == 2000
    ops = set(pc.unique(allt.column("op")).to_pylist())
    assert ops == {"insert", "update", "delete"}
    # deletes carry no payload (ref: FilterDelete drops all but the PK)
    dels = allt.filter(pc.equal(allt.column("op"), pa.scalar("delete")))
    assert dels.num_rows > 0
    assert pc.all(pc.is_null(dels.column("tokens"))).as_py()
    # decoy table present for filter tests
    tables = set(pc.unique(allt.column("table")).to_pylist())
    assert tables == {"docs", "ignored_tbl"}
    for name in CHANGE_EVENT_SCHEMA.names:
        assert name in allt.column_names


def test_stream_chunked_token_take_matches_single_chunk(monkeypatch):
    """Soak-scale regression: once the flat token count crosses
    LIST_OFFSET_BUDGET, token lists are chunked and the per-epoch take must
    route through 64-bit offsets (ChunkedArray.take concatenates and dies
    with "offset overflow"). Shrink the budget to force many chunks at tiny
    n and pin bit-identical output vs the single-chunk path."""
    from data_sync_ray import datamodel

    spec = StreamSpec(n_events=1500, n_docs=200, n_epochs=3, seed=23)
    want = gen_change_stream(spec)
    base_want = gen_base_table(150, seed=9)
    monkeypatch.setattr(datamodel, "LIST_OFFSET_BUDGET", 997)
    got = gen_change_stream(spec)
    for a, b in zip(want, got):
        # chunking may differ; compare content
        assert a.combine_chunks().equals(b.combine_chunks())
    base_got = gen_base_table(150, seed=9)
    assert base_want.combine_chunks().equals(base_got.combine_chunks())


def test_stream_schema_evolution_epochs():
    spec = StreamSpec(
        n_events=900, n_docs=100, n_epochs=3, seed=5, evolve_from_epoch=2
    )
    epochs = gen_change_stream(spec)
    assert "quality" not in epochs[0].column_names
    assert "quality" in epochs[2].column_names
    assert set(pc.unique(epochs[2].column("schema_ver")).to_pylist()) == {2}


def test_oracle_lww_and_delete():
    base = gen_base_table(50, seed=1)
    rows = [
        # update doc 3 twice: later log_pos wins
        dict(log_pos=10, op="update", table="docs", doc_id="doc00000003",
             tokens=[1, 2], n_tok=2, source="web"),
        dict(log_pos=20, op="update", table="docs", doc_id="doc00000003",
             tokens=[9], n_tok=1, source="web"),
        # delete doc 5
        dict(log_pos=15, op="delete", table="docs", doc_id="doc00000005",
             tokens=None, n_tok=None, source="web"),
        # event for excluded table must be ignored
        dict(log_pos=30, op="update", table="ignored_tbl", doc_id="doc00000001",
             tokens=[7], n_tok=1, source="web"),
        # brand-new insert
        dict(log_pos=25, op="insert", table="docs", doc_id="doc99999999",
             tokens=[4, 4], n_tok=2, source="code"),
    ]
    for r in rows:
        r.update(ts=None, schema_ver=1)
    ev = pa.Table.from_pylist(rows, schema=CHANGE_EVENT_SCHEMA)
    out = replay_oracle(base, [ev])
    state = {r["doc_id"]: r for r in out.to_pylist()}
    assert state["doc00000003"]["tokens"] == [9]
    assert "doc00000005" not in state
    assert state["doc99999999"]["tokens"] == [4, 4]
    # ignored-table update did not touch doc 1
    b = {r["doc_id"]: r for r in base.to_pylist()}
    assert state["doc00000001"]["tokens"] == b["doc00000001"]["tokens"]
    assert out.num_rows == 50 - 1 + 1
