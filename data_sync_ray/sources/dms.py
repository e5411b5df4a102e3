"""AWS-DMS-JSON event source: the fourth standard CDC envelope, beside
Maxwell (sources/maxwell.py — the reference's wire format,
mysql_handler.go:121-160), Debezium (sources/debezium.py) and Canal
(sources/canal.py). AWS Database Migration Service publishes this shape
to S3 / Kinesis / Kafka targets (public AWS DMS documentation):

    {"data": {...row image...},
     "metadata": {
        "timestamp": "2019-05-03T19:32:19.942871Z",  # ISO-8601
        "record-type": "data",                       # or "control"
        "operation": "insert"|"update"|"delete"|"load",
        "partition-key-type": "schema-table",
        "schema-name": "db", "table-name": "docs",
        "transaction-id": 123456789,
        "transaction-record-id": 3}}                 # row within txn

Normalization to the Maxwell shape (one conversion, one battle-tested
parser — the debezium/canal pattern):

- record-type != "data" skips (control records announce DDL/checkpoints);
- operation `load` (the full-load snapshot phase) maps to insert — DMS's
  BuildDirectInsert analog, same as Debezium's op "r";
- the row image is always `data` (DMS delete records carry the key row
  there; before-images, when enabled, ride a separate field this engine
  does not need);
- total order: ((transaction-id + 1) << 20) | transaction-record-id.
  Real DMS FULL-LOAD records carry NO transaction-id (per the AWS
  docs, it appears only in CDC records), so orderless `load` records
  take position 0 — the snapshot precedes every CDC write, exactly the
  bootstrap's epoch -1 semantics, and the +1 shift guarantees even
  transaction-id 0 outranks the snapshot. CDC records
  (insert/update/delete) missing transaction-id are still vetoed
  (assigning an order would silently lose LWW writes — the shared veto
  philosophy), as are transaction-ids >= 2^43 - 1 and
  transaction-record-ids outside [0, 2^20) (they would collide orders
  across transactions). A record with a transaction-id but NO
  transaction-record-id defaults to record 0 — per the AWS docs both
  fields ship together (IncludeTransactionDetails), so this only
  covers non-conforming producers; the honest cost is that two
  same-key writes within ONE transaction from such a producer tie in
  LWW order, while vetoing instead would drop EVERY write from that
  producer — strictly worse. NOTE an honest envelope limitation: DMS
  delivers one record per line with no transaction boundary marker, so
  a >2^20-row transaction is vetoed RECORD-BY-RECORD (a prefix
  applies) — unlike Canal, whose multi-row message is vetoed
  atomically; there is nothing per-record to anchor an all-or-nothing
  veto to;
- `timestamp` parses as ISO-8601 (trailing Z accepted) to fractional
  epoch seconds; unparseable timestamps drop the ts, never the event;
- malformed records skip, never raise (the Maxwell parser's contract).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

import pyarrow as pa
import ray.data as rd

from ..datamodel import CHANGE_EVENT_SCHEMA
from .debezium import _as_int
from .maxwell import parse_maxwell_batch

_OP_MAP = {"insert": "insert", "load": "insert",
           "update": "update", "delete": "delete"}


def _iso_ts(v) -> float | None:
    """ISO-8601 string -> fractional epoch seconds; None on anything
    unparseable. Naive timestamps are taken as UTC (DMS emits UTC)."""
    if not isinstance(v, str):
        return None
    try:
        dt = datetime.fromisoformat(v.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.timestamp()


def dms_to_maxwell(ev: dict) -> dict | None:
    """Normalize one AWS DMS record to the Maxwell shape consumed by
    parse_maxwell_batch; None = skip (control record, DDL, unorderable,
    or garbage)."""
    if not isinstance(ev, dict):
        return None
    meta = ev.get("metadata")
    if not isinstance(meta, dict):
        return None
    if meta.get("record-type") != "data":
        return None
    raw_op = meta.get("operation")
    if not isinstance(raw_op, str):
        return None
    op = _OP_MAP.get(raw_op.lower())
    if op is None:
        return None
    data = ev.get("data")
    if not isinstance(data, dict):
        return None
    txid = _as_int(meta.get("transaction-id"))
    if txid is None:
        if raw_op.lower() != "load":
            return None  # unorderable CDC record: veto, never guess
        pos = 0  # full-load snapshot: precedes every CDC write
    else:
        if txid < 0 or txid >= (1 << 43) - 1:
            return None
        rec = meta.get("transaction-record-id")
        rec_i = _as_int(rec) if rec is not None else 0
        if rec_i is None or not (0 <= rec_i < (1 << 20)):
            return None  # would collide orders across transactions
        pos = ((txid + 1) << 20) | rec_i
    out = {
        "type": op,
        "table": meta.get("table-name", ""),
        "position": pos,
        "data": data,
    }
    ts = _iso_ts(meta.get("timestamp"))
    if ts is not None:
        out["ts"] = ts
    return out


def parse_dms_batch(
    lines: list[str], key_column: str = "doc_id"
) -> pa.Table:
    """One batch of raw AWS DMS JSON strings -> CHANGE_EVENT_SCHEMA
    table (+ evolved extra columns). Malformed records skip, never
    raise."""
    normalized = []
    for line in lines:
        if not line or not line.strip():
            continue
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        m = dms_to_maxwell(ev)
        if m is not None:
            normalized.append(json.dumps(m))
    if not normalized:
        return CHANGE_EVENT_SCHEMA.empty_table()
    return parse_maxwell_batch(normalized, key_column=key_column)


def read_dms_json(
    paths: str | list[str], key_column: str = "doc_id"
) -> rd.Dataset:
    """JSON-lines file(s) of AWS DMS records -> change-event Dataset."""
    ds = rd.read_text(paths)

    def parse(t: pa.Table) -> pa.Table:
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)  # worker-side stage: one Arrow thread
        return parse_dms_batch(
            t.column("text").to_pylist(), key_column=key_column
        )

    return ds.map_batches(parse, batch_format="pyarrow")
