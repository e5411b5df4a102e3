"""Maxwell-JSON event source: parse raw binlog row-events (the reference's
actual wire format) into the columnar CHANGE_EVENT_SCHEMA.

The reference consumes Maxwell JSON from Kafka and dispatches on `type`
(/root/reference/src/application/mysql_handler.go:121-160); the event shape
(type, database, table, ts, position/xid, primary_key, primary_key_columns,
data, old) follows the embedded examples at
src/infrastructure/repo/format/insert.go:12-30, update.go:13-22,
delete.go:12-24. Unknown `type` values are silently dropped, like the
reference's default branch (mysql_handler.go:157-158).

Update semantics (ref F9 quirk): the reference builds the UPDATE's SET list
from `old` — the PRE-image of changed columns (mysql_filter_service.go:99)
— which is almost certainly a bug. Our default applies the full NEW row
image (`data`); `update_semantics="old_quirk"` reproduces the reference
bit-for-bit for parity testing.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data as rd

from ..datamodel import CHANGE_EVENT_SCHEMA

_OPS = {"insert", "update", "delete"}

#: every column of the output schema — a payload key colliding with ANY of
#: these must not become an "extra" column (it would shadow the envelope
#: field, e.g. a payload `log_pos` overwriting the event's real position,
#: or append a duplicate schema field)
_CANONICAL_KEYS = frozenset(CHANGE_EVENT_SCHEMA.names)


def parse_position(ev: dict) -> int | None:
    """Total order from the event's position/xid; None = unorderable.

    Real Maxwell output carries `position` as a string like
    "master.000006:800911" (binlog file : byte offset — see the reference's
    embedded example, src/infrastructure/repo/format/insert.go:12-30).
    Derive a total order as (file index << 40) | offset (binlog files are
    capped at 1 GiB, far below 2^40). Integer positions pass through;
    an unparseable position falls back to xid. If NEITHER yields an order
    the caller vetoes the event (counted like a missing pk) — assigning 0
    would silently lose the event's payload to every prior writer in the
    LWW fold, which is worse than dropping it visibly.
    """
    pos = ev.get("position")
    if pos is not None:
        if isinstance(pos, (int, float)) and not isinstance(pos, bool):
            return int(pos)
        s = str(pos)
        try:
            return int(s)
        except ValueError:
            pass
        file_part, sep, off_part = s.rpartition(":")
        if sep:
            try:
                idx = int(file_part.rsplit(".", 1)[-1])
                off = int(off_part)
                if 0 <= off < (1 << 40):
                    return (idx << 40) | off
            except ValueError:
                pass
    xid = ev.get("xid")
    if xid is not None:
        try:
            return int(xid)
        except (TypeError, ValueError):
            return None
    return None


def parse_maxwell_batch(
    lines: list[str],
    update_semantics: str = "new",
    key_column: str = "doc_id",
) -> pa.Table:
    """One batch of raw JSON strings -> CHANGE_EVENT_SCHEMA table
    (+ evolved payload columns).

    Row-wise by necessity (each line is an independent JSON document); runs
    inside map_batches so the loop is per-batch in a worker, never on the
    driver.

    Schema evolution: payload keys beyond the canonical schema (e.g. a
    `quality` column added upstream) become EXTRA typed columns — the
    JSON-lines path then evolves the lake exactly like the parquet path
    (schema_policy="unify"), instead of the reference's drop-unknown rule
    (mysql_filter_service.go:37-41, kept as schema_policy="conform").
    """
    rows = []
    extra_keys: set[str] = set()
    for line in lines:
        if not line or not line.strip():
            continue
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue  # ref: malformed messages only log+skip
        if not isinstance(ev, dict):
            continue  # valid JSON but not an event object
        op = ev.get("type")
        if not isinstance(op, str) or op not in _OPS:
            continue  # ref: unknown types silently ignored
        data = ev.get("data")
        old = ev.get("old")
        data = data if isinstance(data, dict) else {}
        old = old if isinstance(old, dict) else {}
        if op == "update" and update_semantics == "old_quirk":
            # ref quirk: SET list from the pre-image of changed columns
            payload = {**data, **old}
        else:
            payload = data
        # primary key: explicit fields win; else taken from the row image.
        # Composite PKs are normalized to ONE canonical key by zipping
        # primary_key_columns with the values — the analog of the
        # reference's WHERE pk1=? AND pk2=? zip
        # (src/service/mysql_filter_service.go:90-93); "\x1f" (unit
        # separator) joins parts so ("a","b:c") != ("a:b","c").
        pk_cols = ev.get("primary_key_columns")
        if (
            not isinstance(pk_cols, list)
            or not pk_cols
            or not all(isinstance(c, str) for c in pk_cols)
        ):
            pk_cols = [key_column]
        pk_vals = ev.get("primary_key")
        if pk_vals is not None:
            if isinstance(pk_vals, list):
                doc_id = "\x1f".join(str(v) for v in pk_vals)
            else:
                doc_id = str(pk_vals)
        else:
            vals = [payload.get(c) for c in pk_cols]
            if any(v is None for v in vals):
                continue  # ref: missing pk is an error -> veto the event
            doc_id = "\x1f".join(str(v) for v in vals)
        log_pos = parse_position(ev)
        if log_pos is None:
            continue  # unorderable event: veto (see parse_position)
        ts = ev.get("ts")
        if (
            not isinstance(ts, (int, float))
            or isinstance(ts, bool)
            or not (0 <= ts < 4e12)  # epoch-seconds; fits timestamp[us]
        ):
            ts = None
        sv = ev.get("schema_ver", 1)
        try:
            sv = int(sv)
            if not (-(2**31) <= sv < 2**31):
                sv = 1
        except (TypeError, ValueError):
            sv = 1
        tokens = None if op == "delete" else payload.get("tokens")
        if tokens is not None and not (
            isinstance(tokens, list)
            and all(
                isinstance(x, int) and not isinstance(x, bool)
                and -(2**31) <= x < 2**31
                for x in tokens
            )
        ):
            tokens = None
        n_tok = None if op == "delete" else payload.get("n_tok")
        if (
            isinstance(n_tok, bool)
            or not isinstance(n_tok, (int, float))
            or not (-(2**31) <= n_tok < 2**31)
        ):
            n_tok = None
        else:
            n_tok = int(n_tok)
        source = None if op == "delete" else payload.get("source")
        if source is not None and not isinstance(source, str):
            source = None
        table = ev.get("table", "")
        row = {
            "log_pos": log_pos,
            "ts": ts,
            "op": op,
            "table": table if isinstance(table, str) else "",
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": n_tok,
            "source": source,
            "schema_ver": sv,
        }
        if op != "delete":
            for k, v in payload.items():
                if k not in _CANONICAL_KEYS:
                    row[k] = v
                    extra_keys.add(k)
        rows.append(row)
    if not rows:
        return CHANGE_EVENT_SCHEMA.empty_table()
    for r in rows:
        if r["ts"] is not None:
            # Maxwell ts is epoch-seconds; fractional seconds (e.g. from
            # the Debezium ms adapter) carry through to timestamp[us]
            r["ts"] = int(round(r["ts"] * 1_000_000))
    schema = CHANGE_EVENT_SCHEMA
    if extra_keys:
        for r in rows:
            for k in extra_keys:
                r.setdefault(k, None)
        for k in sorted(extra_keys):
            try:
                # typed inference per batch; unify widens downstream
                inferred = pa.array([r[k] for r in rows]).type
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                inferred = None  # untypable mixed-type garbage
            if inferred is None or pa.types.is_null(inferred):
                # all-null in this batch conveys nothing and a null-typed
                # column would pollute downstream schema unification
                for r in rows:
                    r.pop(k, None)
                continue
            schema = schema.append(pa.field(k, inferred))
    return pa.Table.from_pylist(rows, schema=schema)


def read_maxwell_json(
    paths: str | list[str], update_semantics: str = "new"
) -> rd.Dataset:
    """JSON-lines file(s) of Maxwell events -> change-event Dataset.
    The Kafka-topic replay analog when the log is line-delimited JSON
    instead of parquet."""
    ds = rd.read_text(paths)

    def parse(t: pa.Table) -> pa.Table:
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)  # worker-side stage: one Arrow thread
        return parse_maxwell_batch(
            t.column("text").to_pylist(), update_semantics=update_semantics
        )

    return ds.map_batches(parse, batch_format="pyarrow")
