"""Maxwell-JSON parser conformance, mirroring the event shapes embedded in
the reference (format/insert.go:12-30, update.go:13-22, delete.go:12-24)."""

import json

import pytest

from data_sync_ray.sources.maxwell import parse_maxwell_batch


def ev(**kw):
    base = {
        "type": "insert",
        "database": "iot",
        "table": "docs",
        "ts": 1700000000,
        "position": 1,
        "primary_key": ["doc1"],
        "primary_key_columns": ["doc_id"],
        "data": {"doc_id": "doc1", "tokens": [1, 2, 3], "n_tok": 3,
                 "source": "web"},
    }
    base.update(kw)
    return json.dumps(base)


def test_insert_update_delete_roundtrip():
    lines = [
        ev(),
        ev(type="update", position=2,
           data={"doc_id": "doc1", "tokens": [9], "n_tok": 1, "source": "web"},
           old={"tokens": [1, 2, 3], "n_tok": 3}),
        ev(type="delete", position=3, data={"doc_id": "doc1"}),
    ]
    t = parse_maxwell_batch(lines)
    assert t.num_rows == 3
    assert t.column("op").to_pylist() == ["insert", "update", "delete"]
    assert t.column("log_pos").to_pylist() == [1, 2, 3]
    # update applies the NEW row image by default (not the ref's pre-image)
    assert t.column("tokens").to_pylist()[1] == [9]
    # delete carries no payload
    assert t.column("tokens").to_pylist()[2] is None


def test_old_quirk_semantics():
    """update_semantics='old_quirk' reproduces the reference's F9 behavior:
    SET list from the `old` pre-image (mysql_filter_service.go:99)."""
    lines = [
        ev(type="update", position=5,
           data={"doc_id": "doc1", "tokens": [9], "n_tok": 1, "source": "web"},
           old={"tokens": [1, 2, 3], "n_tok": 3}),
    ]
    t = parse_maxwell_batch(lines, update_semantics="old_quirk")
    assert t.column("tokens").to_pylist()[0] == [1, 2, 3]  # pre-image wins
    assert t.column("n_tok").to_pylist()[0] == 3


def test_unknown_type_and_garbage_skipped():
    lines = [
        ev(type="table_create"),  # ref: unknown types silently ignored
        "not json at all {",
        "",
        ev(position=7),
    ]
    t = parse_maxwell_batch(lines)
    assert t.num_rows == 1
    assert t.column("log_pos").to_pylist() == [7]


def test_pk_fallback_to_row_image_and_veto():
    no_pk_fields = ev(position=9)
    d = json.loads(no_pk_fields)
    del d["primary_key"], d["primary_key_columns"]
    missing_pk = dict(d, data={"tokens": [1]}, position=10)
    t = parse_maxwell_batch([json.dumps(d), json.dumps(missing_pk)])
    # first falls back to data['doc_id']; second is vetoed (ref: missing pk
    # is an error, mysql_format_service.go:99-104)
    assert t.num_rows == 1
    assert t.column("doc_id").to_pylist() == ["doc1"]


def test_binlog_string_position_total_order():
    """Real Maxwell emits position as "file:offset" (the reference's
    embedded example, format/insert.go) — must parse, order correctly
    across binlog file rollover, and never kill the batch."""
    lines = [
        ev(position="master.000006:800911"),
        ev(position="master.000007:12"),   # later file, smaller offset
        ev(position="not-a-position", xid=77),  # fallback to xid
        ev(position="master.junk:5", xid=None),  # unorderable -> vetoed
    ]
    t = parse_maxwell_batch(lines)
    got = t.column("log_pos").to_pylist()
    # the unorderable event is dropped, never demoted to log_pos 0 (it
    # would silently lose LWW to every prior event for its key)
    assert len(got) == 3
    assert got[0] == (6 << 40) | 800911
    assert got[1] == (7 << 40) | 12
    assert got[1] > got[0]  # file rollover preserves the total order
    assert got[2] == 77


def test_composite_primary_key_normalized():
    """Multi-column PKs zip to one canonical key (the analog of the
    reference's WHERE pk1=? AND pk2=?, mysql_filter_service.go:90-93)."""
    explicit = ev(position=11, primary_key=["a", "b:c"],
                  primary_key_columns=["k1", "k2"])
    d = json.loads(ev(position=12))
    del d["primary_key"]
    d["primary_key_columns"] = ["doc_id", "source"]
    from_image = json.dumps(d)
    t = parse_maxwell_batch([explicit, from_image])
    ids = t.column("doc_id").to_pylist()
    assert ids[0] == "a\x1fb:c"          # separator-safe join
    assert ids[1] == "doc1\x1fweb"       # zipped from the row image
    # missing one component of a composite key vetoes the event
    d2 = json.loads(from_image)
    d2["data"] = {"doc_id": "doc1"}
    assert parse_maxwell_batch([json.dumps(d2)]).num_rows == 0


def test_evolved_payload_columns_survive_parse():
    """Payload keys beyond the canonical schema become typed extra
    columns (the JSON-lines analog of parquet-path schema evolution);
    rows without the key are null-filled."""
    lines = [
        ev(position=1),
        ev(position=2, data={"doc_id": "doc2", "tokens": [4], "n_tok": 1,
                             "source": "wiki", "quality": 0.75}),
    ]
    t = parse_maxwell_batch(lines)
    assert "quality" in t.column_names
    import pyarrow as pa_

    assert pa_.types.is_floating(t.schema.field("quality").type)
    assert t.column("quality").to_pylist() == [None, 0.75]


@pytest.mark.usefixtures("ray_session")
def test_evolved_jsonl_column_reaches_lake(tmp_path):
    """An upstream-added payload column delivered via JSON lines evolves
    the lake schema (unify policy), matching the parquet path's
    column-add semantics."""
    from data_sync_ray import ReplayJob, SyncConfig
    from data_sync_ray.sources.maxwell import read_maxwell_json

    lines = [
        ev(position=1),
        ev(position=2, primary_key=["doc9"],
           data={"doc_id": "doc9", "tokens": [7, 8], "n_tok": 2,
                 "source": "wiki", "quality": 0.9}),
    ]
    p = tmp_path / "ev.jsonl"
    p.write_text("\n".join(lines))
    job = ReplayJob(SyncConfig(lake_root=str(tmp_path / "lake"),
                               num_partitions=4))
    job.apply_epoch(0, read_maxwell_json(str(p)))
    state = job.lake.read_all()
    assert "quality" in state.column_names
    by_id = dict(zip(state.column("doc_id").to_pylist(),
                     state.column("quality").to_pylist()))
    assert by_id["doc9"] == pytest.approx(0.9)
    assert by_id["doc1"] is None  # null-filled for pre-evolution rows


def test_payload_keys_cannot_shadow_envelope_fields():
    """A payload key named like a canonical column (ts, log_pos, op, ...)
    must neither overwrite the envelope value nor append a duplicate
    schema field — a payload `log_pos` overwriting the event's real
    position would silently corrupt LWW ordering."""
    lines = [
        ev(position=999,
           data={"doc_id": "d1", "tokens": [1], "n_tok": 1, "source": "web",
                 "log_pos": 1, "ts": "not-a-ts", "op": "delete",
                 "table": "evil", "schema_ver": 77}),
    ]
    t = parse_maxwell_batch(lines)
    assert t.num_rows == 1
    assert t.column_names.count("ts") == 1          # no duplicate fields
    assert t.column("log_pos").to_pylist() == [999]  # envelope wins
    assert t.column("op").to_pylist() == ["insert"]
    assert t.column("table").to_pylist() == ["docs"]


def test_parser_never_raises_on_garbage():
    """Fuzz: arbitrary malformed events are skipped, never crash the
    batch task (the reference logs+skips, mysql_handler.go:123-158)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    json_scalars = st.one_of(
        st.none(), st.booleans(), st.integers(), st.floats(allow_nan=False),
        st.text(max_size=20),
    )
    event = st.dictionaries(
        st.sampled_from(
            ["type", "table", "ts", "position", "xid", "primary_key",
             "primary_key_columns", "data", "old", "schema_ver", "junk"]
        ),
        st.one_of(
            json_scalars,
            st.lists(json_scalars, max_size=3),
            st.lists(st.lists(json_scalars, max_size=2), max_size=2),
            st.dictionaries(
                st.one_of(
                    st.text(max_size=8),
                    # canonical-name payload keys (shadowing attempts)
                    st.sampled_from(
                        ["ts", "log_pos", "op", "table", "schema_ver",
                         "doc_id", "tokens", "n_tok", "source"]
                    ),
                ),
                st.one_of(json_scalars, st.lists(json_scalars, max_size=2)),
                max_size=4,
            ),
        ),
        max_size=8,
    )

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.one_of(event.map(json.dumps), st.text(max_size=30)),
                    max_size=6))
    def run(lines):
        t = parse_maxwell_batch(lines)
        assert t.num_rows >= 0  # never raises

    run()


@pytest.mark.usefixtures("ray_session")
def test_maxwell_jsonl_replay_parity_with_parquet_path(tmp_path):
    """S1 parity: the SAME logical stream delivered as Maxwell JSON lines
    (the reference's real wire format) and as parquet epochs must produce
    identical lakes, both equal to the sequential oracle."""
    import os

    from data_sync_ray import (
        ReplayJob, StreamSpec, SyncConfig, gen_base_table,
        gen_change_stream, replay_oracle, write_event_log,
    )
    from data_sync_ray.sources.maxwell import read_maxwell_json
    from test_replay_e2e import assert_tables_equal

    spec = StreamSpec(n_events=1200, n_docs=120, n_epochs=2, seed=77)
    base = gen_base_table(120, seed=77)
    epochs = gen_change_stream(spec)

    # parquet path
    ev_root = os.path.join(str(tmp_path), "events")
    write_event_log(ev_root, epochs)
    job_pq = ReplayJob(SyncConfig(
        lake_root=os.path.join(str(tmp_path), "lake_pq"), num_partitions=8))
    job_pq.replay(ev_root, bootstrap=base)

    # Maxwell JSON-lines path (same events serialized to the wire format)
    job_js = ReplayJob(SyncConfig(
        lake_root=os.path.join(str(tmp_path), "lake_js"), num_partitions=8))
    job_js.bootstrap(base)
    for e, tbl in enumerate(epochs):
        lines = []
        for r in tbl.to_pylist():
            ev_ = {
                "type": r["op"],
                "database": "iot",
                "table": r["table"],
                "ts": int(r["ts"].timestamp()) if r["ts"] else None,
                "position": r["log_pos"],
                "primary_key": [r["doc_id"]],
                "primary_key_columns": ["doc_id"],
                "schema_ver": r["schema_ver"],
            }
            if r["op"] != "delete":
                ev_["data"] = {
                    "doc_id": r["doc_id"], "tokens": r["tokens"],
                    "n_tok": r["n_tok"], "source": r["source"],
                }
            else:
                ev_["data"] = {"doc_id": r["doc_id"]}
            lines.append(json.dumps(ev_))
        p = tmp_path / f"epoch{e}.jsonl"
        p.write_text("\n".join(lines))
        job_js.apply_epoch(e, read_maxwell_json(str(p)))

    want = replay_oracle(base, epochs)
    assert_tables_equal(job_pq.lake.read_all(), want)
    assert_tables_equal(job_js.lake.read_all(), want)


@pytest.mark.usefixtures("ray_session")
def test_read_maxwell_json_end_to_end(tmp_path):
    from data_sync_ray.sources.maxwell import read_maxwell_json

    p = tmp_path / "events.jsonl"
    p.write_text("\n".join([ev(position=i) for i in range(1, 21)]))
    ds = read_maxwell_json(str(p))
    t = ds.take_all()
    assert len(t) == 20
    assert {r["op"] for r in t} == {"insert"}
