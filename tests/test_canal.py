"""Canal flat-message source: normalization contracts, veto rules, and
replay parity — the same logical stream via Canal and Maxwell formats
produces identical lakes."""

import json
import os

import pytest

from data_sync_ray.sources.canal import canal_to_maxwell, parse_canal_batch


def cn(type_="INSERT", data=None, **extra):
    msg = {
        "data": data if data is not None else [
            {"doc_id": "doc1", "tokens": [1, 2], "n_tok": 2,
             "source": "web"}
        ],
        "old": None,
        "database": "db", "table": "docs",
        "type": type_, "es": 1700000000123, "ts": 1700000000477,
        "id": 7, "isDdl": False, "pkNames": ["doc_id"],
        **extra,
    }
    return msg


def test_multi_row_message_fans_out_with_ordered_positions():
    rows = [{"doc_id": f"d{i}", "tokens": [i], "n_tok": 1,
             "source": "s"} for i in range(3)]
    evs = canal_to_maxwell(cn(data=rows, id=5))
    assert [e["position"] for e in evs] == [(5 << 16) | i
                                           for i in range(3)]
    assert all(e["type"] == "insert" for e in evs)
    assert evs[0]["ts"] == 1700000000.123  # es ms -> fractional seconds


def test_op_mapping_and_ddl_skip():
    assert canal_to_maxwell(cn("UPDATE"))[0]["type"] == "update"
    assert canal_to_maxwell(cn("DELETE"))[0]["type"] == "delete"
    assert canal_to_maxwell(cn("CREATE")) == []       # DDL kind
    assert canal_to_maxwell(cn(isDdl=True)) == []     # explicit DDL
    assert canal_to_maxwell(cn("insert"))[0]["type"] == "insert"  # case


def test_explicit_null_es_falls_back_to_ts():
    """Some Canal deployments send "es": null — the ts fallback must
    trigger on any non-numeric es, not only on an absent key."""
    evs = canal_to_maxwell(cn(es=None))
    assert evs[0]["ts"] == 1700000000.477          # ts ms, not dropped
    assert canal_to_maxwell(cn(es=True))[0]["ts"] == 1700000000.477
    assert canal_to_maxwell(cn(es="oops"))[0]["ts"] == 1700000000.477


def test_order_veto_rules():
    assert canal_to_maxwell(cn(id=None)) == []     # no delivery order
    assert canal_to_maxwell(cn(id=-3)) == []       # negative id
    assert canal_to_maxwell(cn(id="11"))[0]["position"] == (11 << 16)
    big = cn(data=[{"doc_id": "d"}] * ((1 << 16) + 1))
    assert canal_to_maxwell(big) == []             # index would collide


def test_pk_names_forward_to_composite_key():
    """pkNames reaches the Maxwell parser's composite-PK normalization:
    a stream keyed on (user_id, region) — no doc_id field at all — must
    produce the canonical \\x1f-joined key, not a silent veto."""
    msg = cn(data=[{"user_id": 7, "region": "eu", "tokens": [1],
                    "n_tok": 1, "source": "s"}],
             pkNames=["user_id", "region"])
    t = parse_canal_batch([json.dumps(msg)])
    assert t.num_rows == 1
    assert t.column("doc_id").to_pylist() == ["7\x1feu"]
    # garbage pkNames falls back to the default key column (doc_id
    # missing here => vetoed row, not a crash)
    bad = cn(data=[{"user_id": 7}], pkNames="user_id")
    assert parse_canal_batch([json.dumps(bad)]).num_rows == 0


def test_malformed_messages_skip_never_raise():
    lines = [
        "", "   ", "{not json", json.dumps([1, 2, 3]),
        json.dumps({"type": 5, "data": [{}], "id": 1}),
        json.dumps({"type": "INSERT", "data": "nope", "id": 1}),
        json.dumps({"type": "INSERT", "data": [{"doc_id": "ok",
                                                "tokens": [1],
                                                "n_tok": 1,
                                                "source": "s"}],
                    "table": "docs", "id": 2, "es": 1000}),
    ]
    t = parse_canal_batch(lines)
    assert t.num_rows == 1
    assert t.column("doc_id").to_pylist() == ["ok"]


@pytest.mark.usefixtures("ray_session")
def test_canal_replay_parity_with_maxwell(tmp_path):
    """The same logical stream in both wire formats -> identical lakes.
    Canal's (id << 16 | row) order is monotone in the stream's log_pos
    when id = log_pos, so the LWW winners must match exactly."""
    from data_sync_ray import ReplayJob, StreamSpec, SyncConfig, \
        gen_base_table, gen_change_stream, replay_oracle
    from data_sync_ray.sources.canal import read_canal_json
    from data_sync_ray.sources.maxwell import read_maxwell_json
    from test_replay_e2e import assert_tables_equal

    spec = StreamSpec(n_events=1000, n_docs=100, n_epochs=2, seed=62)
    base = gen_base_table(100, seed=62)
    epochs = gen_change_stream(spec)

    jobs = {}
    for fmt in ("mx", "cn"):
        job = ReplayJob(SyncConfig(
            lake_root=os.path.join(str(tmp_path), f"lake_{fmt}"),
            num_partitions=4))
        job.bootstrap(base)
        jobs[fmt] = job
    for e, tbl in enumerate(epochs):
        mx_lines, cn_lines = [], []
        for r in tbl.to_pylist():
            image = ({"doc_id": r["doc_id"]} if r["op"] == "delete" else
                     {"doc_id": r["doc_id"], "tokens": r["tokens"],
                      "n_tok": r["n_tok"], "source": r["source"]})
            ts_s = int(r["ts"].timestamp()) if r["ts"] else 0
            mx_lines.append(json.dumps({
                "type": r["op"], "table": r["table"], "ts": ts_s,
                "position": r["log_pos"] << 16, "data": image,
                "schema_ver": r["schema_ver"]}))
            cn_lines.append(json.dumps({
                "type": r["op"].upper(), "table": r["table"],
                "data": [image], "old": None, "es": ts_s * 1000,
                "id": r["log_pos"], "isDdl": False}))
        (tmp_path / f"mx{e}.jsonl").write_text("\n".join(mx_lines))
        (tmp_path / f"cn{e}.jsonl").write_text("\n".join(cn_lines))
        jobs["mx"].apply_epoch(e, read_maxwell_json(
            str(tmp_path / f"mx{e}.jsonl")))
        jobs["cn"].apply_epoch(e, read_canal_json(
            str(tmp_path / f"cn{e}.jsonl")))

    # both lakes agree with each other AND with the sequential oracle
    # modulo log_pos scaling: compare the two lakes directly
    got_mx = jobs["mx"].lake.read_all()
    got_cn = jobs["cn"].lake.read_all()
    assert_tables_equal(got_mx, got_cn)
    # winners also match the oracle's doc set and payloads
    want = replay_oracle(base, epochs)
    assert sorted(got_cn.column("doc_id").to_pylist()) == \
        sorted(want.column("doc_id").to_pylist())
