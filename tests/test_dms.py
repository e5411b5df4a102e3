"""AWS DMS source: normalization contracts, veto rules, and replay
parity — the same logical stream via DMS and Maxwell formats produces
identical lakes."""

import json
import os

import pytest

from data_sync_ray.sources.dms import dms_to_maxwell, parse_dms_batch


def dm(operation="insert", data=None, txid=7, rec=None, **meta_extra):
    meta = {
        "timestamp": "2023-11-14T22:13:20.123000Z",
        "record-type": "data",
        "operation": operation,
        "partition-key-type": "schema-table",
        "schema-name": "db", "table-name": "docs",
        "transaction-id": txid,
        **meta_extra,
    }
    if rec is not None:
        meta["transaction-record-id"] = rec
    return {
        "data": data if data is not None else
        {"doc_id": "doc1", "tokens": [1, 2], "n_tok": 2, "source": "web"},
        "metadata": meta,
    }


def test_op_mapping_and_control_skip():
    assert dms_to_maxwell(dm("insert"))["type"] == "insert"
    assert dms_to_maxwell(dm("load"))["type"] == "insert"   # snapshot
    assert dms_to_maxwell(dm("UPDATE"))["type"] == "update"  # case
    assert dms_to_maxwell(dm("delete"))["type"] == "delete"
    assert dms_to_maxwell(dm("create-table")) is None        # DDL-ish
    ctl = dm()
    ctl["metadata"]["record-type"] = "control"
    assert dms_to_maxwell(ctl) is None


def test_position_encoding_and_veto_rules():
    assert dms_to_maxwell(dm(txid=5))["position"] == 6 << 20
    assert dms_to_maxwell(dm(txid=5, rec=3))["position"] == (6 << 20) | 3
    assert dms_to_maxwell(dm(txid="11"))["position"] == 12 << 20
    assert dms_to_maxwell(dm(txid=0))["position"] == 1 << 20  # > snapshot
    assert dms_to_maxwell(dm(txid=None)) is None      # unorderable CDC
    assert dms_to_maxwell(dm(txid=-2)) is None        # negative
    assert dms_to_maxwell(dm(txid=True)) is None      # bool is not int
    assert dms_to_maxwell(dm(txid=(1 << 43) - 1)) is None  # shift overflow
    assert dms_to_maxwell(dm(rec=1 << 20)) is None    # cross-txn collide
    assert dms_to_maxwell(dm(rec=-1)) is None


def test_full_load_without_transaction_id_is_snapshot():
    """Real DMS full-load records carry NO transaction-id (AWS docs:
    the field appears only in CDC records) — they must map to position
    0 (the bootstrap analog), never veto; any CDC write outranks them
    because CDC positions start at (0 + 1) << 20."""
    ev = dm("load")
    del ev["metadata"]["transaction-id"]
    out = dms_to_maxwell(ev)
    assert out is not None and out["position"] == 0
    assert out["type"] == "insert"
    # the same missing txid on a CDC op still vetoes
    ev2 = dm("update")
    del ev2["metadata"]["transaction-id"]
    assert dms_to_maxwell(ev2) is None


def test_timestamp_parse_and_fallbacks():
    ev = dms_to_maxwell(dm())
    assert abs(ev["ts"] - 1700000000.123) < 1e-6
    # naive timestamps are UTC; garbage drops ts but keeps the event
    assert "ts" in dms_to_maxwell(
        dm(timestamp="2023-11-14T22:13:20.123000"))
    assert "ts" not in dms_to_maxwell(dm(timestamp="not a time"))
    assert "ts" not in dms_to_maxwell(dm(timestamp=12345))


def test_malformed_records_skip_never_raise():
    lines = [
        "", "   ", "{not json", json.dumps([1]),
        json.dumps({"data": {"doc_id": "x"}}),            # no metadata
        json.dumps({"data": "nope", "metadata": {
            "record-type": "data", "operation": "insert",
            "transaction-id": 1}}),                        # bad image
        json.dumps(dm(data={"doc_id": "ok", "tokens": [1], "n_tok": 1,
                            "source": "s"}, txid=2)),
    ]
    t = parse_dms_batch(lines)
    assert t.num_rows == 1
    assert t.column("doc_id").to_pylist() == ["ok"]


@pytest.mark.usefixtures("ray_session")
def test_dms_replay_parity_with_maxwell(tmp_path):
    """The same logical stream in both wire formats -> identical lakes.
    DMS's (txid << 16 | rec) order is monotone in the stream's log_pos
    when txid = log_pos, so the LWW winners must match exactly."""
    from data_sync_ray import ReplayJob, StreamSpec, SyncConfig, \
        gen_base_table, gen_change_stream
    from data_sync_ray.sources.dms import read_dms_json
    from data_sync_ray.sources.maxwell import read_maxwell_json
    from test_replay_e2e import assert_tables_equal

    spec = StreamSpec(n_events=1000, n_docs=100, n_epochs=2, seed=63)
    base = gen_base_table(100, seed=63)
    epochs = gen_change_stream(spec)

    jobs = {}
    for fmt in ("mx", "dms"):
        job = ReplayJob(SyncConfig(
            lake_root=os.path.join(str(tmp_path), f"lake_{fmt}"),
            num_partitions=4))
        job.bootstrap(base)
        jobs[fmt] = job
    for e, tbl in enumerate(epochs):
        mx_lines, dms_lines = [], []
        for r in tbl.to_pylist():
            image = ({"doc_id": r["doc_id"]} if r["op"] == "delete" else
                     {"doc_id": r["doc_id"], "tokens": r["tokens"],
                      "n_tok": r["n_tok"], "source": r["source"]})
            ts_s = int(r["ts"].timestamp()) if r["ts"] else 0
            mx_lines.append(json.dumps({
                "type": r["op"], "table": r["table"], "ts": ts_s,
                "position": r["log_pos"] << 16, "data": image,
                "schema_ver": r["schema_ver"]}))
            dms_lines.append(json.dumps({
                "data": image,
                "metadata": {
                    "record-type": "data", "operation": r["op"],
                    "table-name": r["table"],
                    "transaction-id": r["log_pos"],
                    "timestamp": "1970-01-01T00:00:00Z"}}))
        (tmp_path / f"mx{e}.jsonl").write_text("\n".join(mx_lines))
        (tmp_path / f"dms{e}.jsonl").write_text("\n".join(dms_lines))
        jobs["mx"].apply_epoch(e, read_maxwell_json(
            str(tmp_path / f"mx{e}.jsonl")))
        jobs["dms"].apply_epoch(e, read_dms_json(
            str(tmp_path / f"dms{e}.jsonl")))

    a = jobs["mx"].lake.read_all()
    b = jobs["dms"].lake.read_all()
    cols = ["doc_id", "tokens", "n_tok", "source"]
    assert_tables_equal(a.select(cols), b.select(cols))
    assert a.num_rows > 0
