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


@pytest.mark.usefixtures("ray_session")
def test_read_maxwell_json_end_to_end(tmp_path):
    from data_sync_ray.sources.maxwell import read_maxwell_json

    p = tmp_path / "events.jsonl"
    p.write_text("\n".join([ev(position=i) for i in range(1, 21)]))
    ds = read_maxwell_json(str(p))
    t = ds.take_all()
    assert len(t) == 20
    assert {r["op"] for r in t} == {"insert"}
