"""Debezium-JSON event source: the other standard CDC wire format.

The reference consumes Maxwell JSON (sources/maxwell.py); real deployments
frequently run Debezium instead, whose published envelope differs:

    {"schema": {...}, "payload": {
        "op": "c"|"u"|"d"|"r",          # create/update/delete/snapshot-read
        "before": {...} | null,          # old row image (u/d)
        "after":  {...} | null,          # new row image (c/u/r)
        "source": {"table": ..., "ts_ms": ...,
                   "file": "mysql-bin.000003", "pos": 154,   # MySQL
                   "lsn": 33239706, "sequence": ...},        # Postgres
        "ts_ms": ...}}

Both the schema-wrapped and bare-payload forms are accepted. Semantics
normalized to CHANGE_EVENT_SCHEMA exactly like the Maxwell path:
op r (initial snapshot read) maps to insert — it is Debezium's
BuildDirectInsert analog; the total order comes from the MySQL
(file index << 40) | pos encoding (shared with Maxwell binlog strings),
the Postgres lsn, or the source sequence, in that precedence; events
with no derivable order are vetoed (assigning 0 would lose LWW to every
prior writer). Unknown payload keys become typed extra columns (schema
evolution), with canonical names shadow-protected.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa
import ray.data as rd

from ..datamodel import CHANGE_EVENT_SCHEMA
from .maxwell import parse_maxwell_batch

_OP_MAP = {"c": "insert", "r": "insert", "u": "update", "d": "delete"}

_FILE_IDX_RE = re.compile(r"(\d+)$")


def _debezium_position(src: dict) -> int | None:
    """Total order from the Debezium source block; None = unorderable."""
    if not isinstance(src, dict):
        return None
    fname, pos = src.get("file"), src.get("pos")
    if isinstance(fname, str) and isinstance(pos, (int, float)) and not isinstance(pos, bool):
        m = _FILE_IDX_RE.search(fname.rsplit(".", 1)[-1])
        if m and 0 <= pos < (1 << 40):
            return (int(m.group(1)) << 40) | int(pos)
    for k in ("lsn", "sequence", "pos"):
        v = src.get(k)
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return int(v)
        if isinstance(v, str):
            try:
                return int(v)
            except ValueError:
                continue
    return None


def debezium_to_maxwell(ev: dict) -> dict | None:
    """Normalize one Debezium envelope to the Maxwell shape consumed by
    parse_maxwell_batch (one conversion, one battle-tested parser)."""
    if not isinstance(ev, dict):
        return None
    payload = ev.get("payload", ev)
    if not isinstance(payload, dict):
        return None
    op = _OP_MAP.get(payload.get("op"))
    if op is None:
        return None
    src = payload.get("source")
    src = src if isinstance(src, dict) else {}
    pos = _debezium_position(src)
    if pos is None:
        return None
    after = payload.get("after")
    before = payload.get("before")
    after = after if isinstance(after, dict) else {}
    before = before if isinstance(before, dict) else {}
    image = before if op == "delete" else after
    ts_ms = src.get("ts_ms", payload.get("ts_ms"))
    out = {
        "type": op,
        "table": src.get("table", ""),
        "position": pos,
        "data": image,
        "schema_ver": src.get("version", 1),
    }
    if isinstance(ts_ms, (int, float)) and not isinstance(ts_ms, bool):
        out["ts"] = int(ts_ms) // 1000  # Maxwell ts is epoch-seconds
    return out


def parse_debezium_batch(
    lines: list[str], key_column: str = "doc_id"
) -> pa.Table:
    """One batch of raw Debezium JSON strings -> CHANGE_EVENT_SCHEMA
    table (+ evolved extra columns). Malformed events skip, never raise
    (same contract as the Maxwell parser, which does the final parse)."""
    normalized = []
    for line in lines:
        if not line or not line.strip():
            continue
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        m = debezium_to_maxwell(ev)
        if m is not None:
            normalized.append(json.dumps(m))
    if not normalized:
        return CHANGE_EVENT_SCHEMA.empty_table()
    return parse_maxwell_batch(normalized, key_column=key_column)


def read_debezium_json(
    paths: str | list[str], key_column: str = "doc_id"
) -> rd.Dataset:
    """JSON-lines file(s) of Debezium events -> change-event Dataset."""
    ds = rd.read_text(paths)

    def parse(t: pa.Table) -> pa.Table:
        return parse_debezium_batch(
            t.column("text").to_pylist(), key_column=key_column
        )

    return ds.map_batches(parse, batch_format="pyarrow")
