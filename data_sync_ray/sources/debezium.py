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


def _as_int(v) -> int | None:
    """Lenient int coercion: accepts int/float/numeric-string, rejects
    bool, NaN/Infinity (json.loads admits them), and garbage."""
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        import math

        return int(v) if math.isfinite(v) else None
    if isinstance(v, str):
        try:
            return int(v)
        except ValueError:
            return None
    return None


def _debezium_position(src: dict) -> int | None:
    """Total order from the Debezium source block; None = unorderable.
    Precedence: MySQL (file index << 40) | pos, then lsn, then sequence —
    a bare `pos` without its file is NOT usable (it resets per binlog
    file, so treating it as a global order would collapse files)."""
    if not isinstance(src, dict):
        return None
    fname = src.get("file")
    pos = _as_int(src.get("pos"))
    if isinstance(fname, str) and pos is not None and 0 <= pos < (1 << 40):
        m = _FILE_IDX_RE.search(fname.rsplit(".", 1)[-1])
        if m:
            return (int(m.group(1)) << 40) | pos
    for k in ("lsn", "sequence"):
        v = _as_int(src.get(k))
        if v is not None:
            return v
    return None


def debezium_to_maxwell(ev: dict) -> dict | None:
    """Normalize one Debezium envelope to the Maxwell shape consumed by
    parse_maxwell_batch (one conversion, one battle-tested parser)."""
    if not isinstance(ev, dict):
        return None
    payload = ev.get("payload", ev)
    if not isinstance(payload, dict):
        return None
    raw_op = payload.get("op")
    if not isinstance(raw_op, str):
        return None  # unhashable/garbage op must skip, never raise
    op = _OP_MAP.get(raw_op)
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
        # NOTE: source.version is the CONNECTOR version string in real
        # Debezium envelopes, not a schema version — never map it
    }
    if isinstance(ts_ms, (int, float)) and not isinstance(ts_ms, bool):
        # fractional epoch-seconds: the Maxwell shape carries them through
        # to timestamp[us] without losing the wire format's milliseconds
        out["ts"] = ts_ms / 1000.0
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
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)  # worker-side stage: one Arrow thread
        return parse_debezium_batch(
            t.column("text").to_pylist(), key_column=key_column
        )

    return ds.map_batches(parse, batch_format="pyarrow")
