"""Canal flat-message JSON source: the third standard MySQL CDC envelope
(Alibaba Canal's published flatMessage format), beside Maxwell
(sources/maxwell.py — the reference's wire format, mysql_handler.go:121-160)
and Debezium (sources/debezium.py):

    {"data": [{...}, ...],        # row images (one message, MANY rows)
     "old":  [{...}, ...] | null, # changed-col pre-images (UPDATE only)
     "database": "db", "table": "docs",
     "type": "INSERT" | "UPDATE" | "DELETE" | DDL kinds,
     "es": 1589373515000,         # binlog execute time (ms)
     "ts": 1589373515477,         # relay delivery time (ms)
     "id": 3,                     # batch id (monotone per queue)
     "isDdl": false, "pkNames": ["doc_id"], "sql": "", ...}

Normalization to the Maxwell shape (one conversion, one battle-tested
parser — same strategy as Debezium):
- one output event per element of `data` (flat messages batch rows);
- total order: flat messages carry NO binlog file:pos, so the order is
  the connector's delivery order (id, row index) encoded as
  (id << 16) | row_idx. Messages with a missing/negative id, or with
  more rows than the 16-bit index can hold, are VETOED — an order
  collision would silently lose LWW writes (same veto philosophy as
  Debezium's bare-`pos` rule);
- DELETE rows carry their full pre-image in `data`; UPDATE `data` is
  the new image (`old` holds changed-col pre-images and is unused, like
  the Maxwell old-image quirk's default);
- isDdl / unknown types skip; malformed messages skip, never raise.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data as rd

from ..datamodel import CHANGE_EVENT_SCHEMA
from .debezium import _as_int
from .maxwell import parse_maxwell_batch

_OP_MAP = {"INSERT": "insert", "UPDATE": "update", "DELETE": "delete"}

_MAX_ROWS = 1 << 16


def canal_to_maxwell(msg) -> list[dict]:
    """Normalize one Canal flat message to 0..n Maxwell-shaped events."""
    if not isinstance(msg, dict) or msg.get("isDdl") is True:
        return []
    raw_op = msg.get("type")
    if not isinstance(raw_op, str):
        return []
    op = _OP_MAP.get(raw_op.upper())
    if op is None:
        return []  # DDL kinds (CREATE/ALTER/...) and garbage skip
    mid = _as_int(msg.get("id"))
    if mid is None or mid < 0:
        return []  # no delivery order derivable: veto (never position 0)
    data = msg.get("data")
    if not isinstance(data, list) or len(data) > _MAX_ROWS:
        return []  # row index would collide into the next message's id
    table = msg.get("table")
    table = table if isinstance(table, str) else ""
    # some Canal deployments send an explicit "es": null — fall through to
    # "ts" on any non-numeric value, not only on an absent key
    es = msg.get("es")
    if not isinstance(es, (int, float)) or isinstance(es, bool):
        es = msg.get("ts")
    # flat messages name their own key columns; forward them so the
    # Maxwell parser's composite-PK normalization ("\x1f"-joined canonical
    # key, mysql_filter_service.go:90-93 analog) applies — without this a
    # non-doc_id-keyed stream would be silently vetoed row by row
    pk_names = msg.get("pkNames")
    if not (
        isinstance(pk_names, list)
        and pk_names
        and all(isinstance(c, str) for c in pk_names)
    ):
        pk_names = None
    out = []
    for i, row in enumerate(data):
        if not isinstance(row, dict):
            continue
        ev = {
            "type": op,
            "table": table,
            "position": (mid << 16) | i,
            "data": row,
        }
        if pk_names is not None:
            ev["primary_key_columns"] = pk_names
        if isinstance(es, (int, float)) and not isinstance(es, bool):
            ev["ts"] = es / 1000.0  # ms -> fractional seconds
        out.append(ev)
    return out


def parse_canal_batch(
    lines: list[str], key_column: str = "doc_id"
) -> pa.Table:
    """One batch of raw Canal flat-message JSON strings ->
    CHANGE_EVENT_SCHEMA table (+ evolved extra columns)."""
    normalized = []
    for line in lines:
        if not line or not line.strip():
            continue
        try:
            msg = json.loads(line)
        except json.JSONDecodeError:
            continue
        for ev in canal_to_maxwell(msg):
            normalized.append(json.dumps(ev))
    if not normalized:
        return CHANGE_EVENT_SCHEMA.empty_table()
    return parse_maxwell_batch(normalized, key_column=key_column)


def read_canal_json(
    paths: str | list[str], key_column: str = "doc_id"
) -> rd.Dataset:
    """JSON-lines file(s) of Canal flat messages -> change-event Dataset."""
    ds = rd.read_text(paths)

    def parse(t: pa.Table) -> pa.Table:
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)  # worker-side stage: one Arrow thread
        return parse_canal_batch(
            t.column("text").to_pylist(), key_column=key_column
        )

    return ds.map_batches(parse, batch_format="pyarrow")
