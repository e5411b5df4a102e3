"""Debezium-JSON source conformance: envelope parsing (wrapped + bare),
op mapping (c/u/d/r), MySQL file:pos and Postgres lsn ordering, and
replay parity — the same logical stream via Debezium and Maxwell formats
produces identical lakes."""

import json
import os

import pytest

from data_sync_ray.sources.debezium import (
    debezium_to_maxwell,
    parse_debezium_batch,
)


def dbz(op="c", after=None, before=None, src=None, wrap=True, **extra):
    payload = {
        "op": op,
        "before": before,
        "after": after if after is not None else {
            "doc_id": "doc1", "tokens": [1, 2], "n_tok": 2, "source": "web"},
        "source": src if src is not None else {
            "table": "docs", "ts_ms": 1700000000123,
            "file": "mysql-bin.000003", "pos": 154},
        **extra,
    }
    return json.dumps({"schema": {}, "payload": payload} if wrap
                      else payload)


def test_ops_and_ordering():
    lines = [
        dbz(op="c"),
        dbz(op="r", src={"table": "docs", "ts_ms": 1, "file":
            "mysql-bin.000003", "pos": 200}),                # snapshot read
        dbz(op="u", src={"table": "docs", "lsn": 33239706},  # Postgres lsn
            after={"doc_id": "doc1", "tokens": [9], "n_tok": 1,
                   "source": "web"}),
        dbz(op="d", after=None, wrap=False,                  # bare payload
            before={"doc_id": "doc1"},
            src={"table": "docs", "sequence": "777"}),
        dbz(op="x"),                                         # unknown op
        dbz(op="c", src={"table": "docs"}),                  # unorderable
        "garbage {",
    ]
    t = parse_debezium_batch(lines)
    assert t.column("op").to_pylist() == ["insert", "insert", "update",
                                          "delete"]
    got = t.column("log_pos").to_pylist()
    assert got[0] == (3 << 40) | 154       # MySQL binlog file:pos
    assert got[1] == (3 << 40) | 200
    assert got[2] == 33239706              # lsn passthrough
    assert got[3] == 777                   # sequence fallback (string int)
    assert t.column("table").to_pylist() == ["docs"] * 4
    # ts_ms milliseconds carry through to timestamp[us] (not truncated
    # to whole seconds by the Maxwell epoch-seconds round trip)
    assert t.column("ts").to_pylist()[0].timestamp() == 1700000000.123


def test_malformed_envelopes_skip_never_raise():
    """Unhashable ops, NaN/Infinity positions (json.loads admits them),
    and string MySQL pos values must skip or coerce, never raise."""
    lines = [
        json.dumps({"payload": {"op": ["c"], "after": {"doc_id": "x"},
                                "source": {"lsn": 1}}}),
        '{"payload": {"op": "c", "after": {"doc_id": "x"},'
        ' "source": {"lsn": NaN}}}',
        '{"payload": {"op": "c", "after": {"doc_id": "x"},'
        ' "source": {"lsn": Infinity}}}',
    ]
    assert parse_debezium_batch(lines).num_rows == 0
    # string-encoded MySQL pos must use the file:pos encoding, not fall
    # through to a bare int that loses LWW across binlog files
    t = parse_debezium_batch([
        dbz(op="c", src={"table": "docs", "file": "mysql-bin.000004",
                         "pos": "10"}),
    ])
    assert t.column("log_pos").to_pylist() == [(4 << 40) | 10]
    # a bare pos WITHOUT its file is not a global order -> vetoed
    assert parse_debezium_batch([
        dbz(op="c", src={"table": "docs", "pos": 10}),
    ]).num_rows == 0


def test_delete_uses_before_image_key():
    m = debezium_to_maxwell(json.loads(
        dbz(op="d", after=None, before={"doc_id": "doc7"},
            src={"table": "docs", "lsn": 5})))
    assert m["type"] == "delete"
    assert m["data"] == {"doc_id": "doc7"}


@pytest.mark.usefixtures("ray_session")
def test_debezium_replay_parity_with_maxwell(tmp_path):
    """The same logical stream in both wire formats -> identical lakes."""
    from data_sync_ray import ReplayJob, StreamSpec, SyncConfig, \
        gen_base_table, gen_change_stream, replay_oracle
    from data_sync_ray.sources.debezium import read_debezium_json
    from data_sync_ray.sources.maxwell import read_maxwell_json
    from test_replay_e2e import assert_tables_equal

    spec = StreamSpec(n_events=1000, n_docs=100, n_epochs=2, seed=61)
    base = gen_base_table(100, seed=61)
    epochs = gen_change_stream(spec)

    jobs = {}
    for fmt in ("mx", "dbz"):
        job = ReplayJob(SyncConfig(
            lake_root=os.path.join(str(tmp_path), f"lake_{fmt}"),
            num_partitions=4))
        job.bootstrap(base)
        jobs[fmt] = job
    for e, tbl in enumerate(epochs):
        mx_lines, dbz_lines = [], []
        for r in tbl.to_pylist():
            image = ({"doc_id": r["doc_id"]} if r["op"] == "delete" else
                     {"doc_id": r["doc_id"], "tokens": r["tokens"],
                      "n_tok": r["n_tok"], "source": r["source"]})
            ts_s = int(r["ts"].timestamp()) if r["ts"] else 0
            mx_lines.append(json.dumps({
                "type": r["op"], "table": r["table"], "ts": ts_s,
                "position": r["log_pos"], "data": image,
                "schema_ver": r["schema_ver"]}))
            op = {"insert": "c", "update": "u", "delete": "d"}[r["op"]]
            dbz_lines.append(json.dumps({"payload": {
                "op": op,
                "before": image if op == "d" else None,
                "after": None if op == "d" else image,
                "source": {"table": r["table"], "ts_ms": ts_s * 1000,
                           "lsn": r["log_pos"],
                           "version": r["schema_ver"]}}}))
        (tmp_path / f"mx{e}.jsonl").write_text("\n".join(mx_lines))
        (tmp_path / f"dbz{e}.jsonl").write_text("\n".join(dbz_lines))
        jobs["mx"].apply_epoch(e, read_maxwell_json(
            str(tmp_path / f"mx{e}.jsonl")))
        jobs["dbz"].apply_epoch(e, read_debezium_json(
            str(tmp_path / f"dbz{e}.jsonl")))

    want = replay_oracle(base, epochs)
    assert_tables_equal(jobs["mx"].lake.read_all(), want)
    assert_tables_equal(jobs["dbz"].lake.read_all(), want)
