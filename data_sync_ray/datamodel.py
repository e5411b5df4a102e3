"""Arrow data model + deterministic synthetic CDC fixtures + sequential oracle.

The engine's unit of data is a row-change event keyed by ``doc_id`` with a
total order given by ``log_pos`` (the binlog-position analog of the Maxwell
events the reference parses — see /root/reference/src/infrastructure/repo/
format/insert.go:3-30, update.go:3-22, delete.go:3-24 for the reference's
event shape, and src/application/mysql_handler.go:121-160 for the type
dispatch this schema normalizes).

The lake row shape comes from BASELINE.json's input_hint:
``doc_id:string, tokens:list<int32>, n_tok:int32, source:string`` plus
``log_pos`` lineage (last writer's binlog position).

Everything here is deterministic under a seed — fixtures, skew, out-of-order
delivery, duplicate batches, and schema-evolution epochs are all reproducible
so tests and benchmarks are stable.
"""

from __future__ import annotations

import dataclasses
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# --- canonical schemas -----------------------------------------------------

OP_INSERT = "insert"
OP_UPDATE = "update"
OP_DELETE = "delete"
OPS = (OP_INSERT, OP_UPDATE, OP_DELETE)

#: Normalized change-event schema (Maxwell-event analog, columnar).
CHANGE_EVENT_SCHEMA = pa.schema(
    [
        ("log_pos", pa.int64()),  # strictly-increasing total order (binlog pos)
        ("ts", pa.timestamp("us")),
        ("op", pa.string()),  # insert | update | delete
        ("table", pa.string()),  # Maxwell `table`; drives include/exclude filter
        ("doc_id", pa.string()),  # primary key
        ("tokens", pa.list_(pa.int32())),  # new full row image (null for delete)
        ("n_tok", pa.int32()),
        ("source", pa.string()),
        ("schema_ver", pa.int32()),  # epoch marker for evolution tests
    ]
)

#: Lake (target table) schema, v1. Evolution may add columns / widen types.
LAKE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
        ("log_pos", pa.int64()),  # lineage: position of the last writer
    ]
)

#: Column added by schema-evolution epochs (additive unification at merge).
EVOLVED_COLUMN = ("quality", pa.float32())

#: log_pos assigned to bootstrap-snapshot rows (below any stream event)
BOOTSTRAP_SRC_LOG_POS = 0

SOURCES_V1 = ("web", "books", "code")
SOURCES_V2 = ("web", "books", "code", "wiki", "forum")  # enum growth


# --- vectorized token generation ------------------------------------------

#: Max flat elements per list<int32> chunk — one chunk's 32-bit offsets must
#: never overflow. Module-level so tests can shrink it to force the chunked
#: paths at tiny n.
LIST_OFFSET_BUDGET = (1 << 31) - 8


def _gen_token_lists(
    rng: np.random.Generator, n: int, min_tok: int = 8, max_tok: int = 512
) -> tuple[pa.ListArray | pa.ChunkedArray, np.ndarray]:
    """Variable-length int32 token lists, fully vectorized.

    Chunked so the cast to 32-bit-offset list<int32> never overflows —
    one flat array over ~2^31 elements (soak-scale streams) would fail
    `Array too large to convert to list`."""
    lens = rng.integers(min_tok, max_tok + 1, size=n, dtype=np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = rng.integers(0, 50_000, size=int(offsets[-1]), dtype=np.int32)
    budget = LIST_OFFSET_BUDGET
    chunks = []
    lo = 0
    while lo < n:
        hi = int(np.searchsorted(offsets, offsets[lo] + budget, "right")) - 1
        hi = min(max(hi, lo + 1), n)
        sub = offsets[lo : hi + 1] - offsets[lo]
        chunks.append(
            pa.LargeListArray.from_arrays(
                sub, pa.array(flat[offsets[lo] : offsets[hi]])
            ).cast(pa.list_(pa.int32()))
        )
        lo = hi
    if len(chunks) == 1:
        return chunks[0], lens.astype(np.int32)
    return pa.chunked_array(chunks), lens.astype(np.int32)


def _as_takeable_list32(
    arr: pa.ListArray | pa.ChunkedArray,
) -> pa.Array:
    """One-time conversion of a (possibly chunked) list<int32> column to a
    single take-safe array. ``ChunkedArray.take`` concatenates the chunks
    first, which overflows the 32-bit list offsets once the flat element
    count crosses 2^31 (measured: the 96M-event soak fixture dies with
    "offset overflow while concatenating arrays") — so multi-chunk input
    concatenates ONCE through large_list (64-bit offsets). Hoist this out
    of any per-epoch loop: the concat copies the whole flat buffer."""
    chunks = arr.chunks if isinstance(arr, pa.ChunkedArray) else [arr]
    if len(chunks) == 1:
        return chunks[0]
    return pa.concat_arrays(
        [c.cast(pa.large_list(pa.int32())) for c in chunks]
    )


def _take_list32(takeable: pa.Array, indices: pa.Array):
    """Random-access take over an `_as_takeable_list32` array, re-chunking
    a large_list result back to list<int32> chunks under
    LIST_OFFSET_BUDGET."""
    if not pa.types.is_large_list(takeable.type):
        return takeable.take(indices)
    big = takeable.take(indices)
    offs = np.asarray(big.offsets, dtype=np.int64)
    values = big.values
    n = len(big)
    out: list[pa.ListArray] = []
    lo = 0
    while lo < n:
        hi = (
            int(
                np.searchsorted(offs, offs[lo] + LIST_OFFSET_BUDGET, "right")
            )
            - 1
        )
        hi = min(max(hi, lo + 1), n)
        sub = (offs[lo : hi + 1] - offs[lo]).astype(np.int32)
        out.append(
            pa.ListArray.from_arrays(
                pa.array(sub, pa.int32()),
                values.slice(int(offs[lo]), int(offs[hi] - offs[lo])),
            )
        )
        lo = hi
    if not out:
        return pa.array([], pa.list_(pa.int32()))
    return out[0] if len(out) == 1 else pa.chunked_array(out)


def gen_base_table(n_docs: int, seed: int = 42) -> pa.Table:
    """Deterministic base lake table (the bootstrap snapshot, log_pos=0)."""
    rng = np.random.default_rng(seed)
    doc_ids = np.array([f"doc{i:08d}" for i in range(n_docs)])
    tokens, n_tok = _gen_token_lists(rng, n_docs)
    source = rng.choice(np.array(SOURCES_V1), size=n_docs)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "tokens": tokens,
            "n_tok": pa.array(n_tok),
            "source": pa.array(source),
            "log_pos": pa.array(np.zeros(n_docs, dtype=np.int64)),
        },
        schema=LAKE_SCHEMA,
    )


@dataclasses.dataclass
class StreamSpec:
    """Knobs for the synthetic Maxwell-analog change stream."""

    n_events: int = 10_000
    n_docs: int = 1_000  # existing doc_id universe (updates/deletes hit these)
    n_epochs: int = 4
    seed: int = 42
    op_mix: tuple[float, float, float] = (0.5, 0.4, 0.1)  # insert/update/delete
    hot_frac: float = 0.01  # fraction of keys that are hot
    hot_weight: float = 0.5  # fraction of update/delete traffic on hot keys
    shuffle_delivery: bool = True  # out-of-order delivery (log_pos stays truth)
    decoy_table_frac: float = 0.05  # events for an excluded table (filter test)
    evolve_from_epoch: int | None = None  # epochs >= this add `quality` column
    min_tok: int = 8
    max_tok: int = 512


def gen_change_stream(spec: StreamSpec) -> list[pa.Table]:
    """One pa.Table per epoch, CHANGE_EVENT_SCHEMA (+quality when evolved).

    log_pos is globally unique and increasing in *generation* order; rows
    within an epoch are delivered shuffled when spec.shuffle_delivery — the
    engine must converge under out-of-order delivery (LWW on log_pos).
    New doc_ids from inserts extend the key space beyond n_docs.
    """
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events
    ops = rng.choice(np.array(OPS), size=n, p=list(spec.op_mix))

    # Key choice: inserts mint fresh ids; updates/deletes target the existing
    # universe with a hot set absorbing `hot_weight` of the traffic (skew).
    n_hot = max(1, int(spec.n_docs * spec.hot_frac))
    hot_ids = rng.choice(spec.n_docs, size=n_hot, replace=False)
    is_ins = ops == OP_INSERT
    n_ins = int(is_ins.sum())
    new_ids = spec.n_docs + np.arange(n_ins)

    target = np.empty(n, dtype=np.int64)
    target[is_ins] = new_ids
    n_other = n - n_ins
    use_hot = rng.random(n_other) < spec.hot_weight
    picks = np.where(
        use_hot,
        hot_ids[rng.integers(0, n_hot, size=n_other)],
        rng.integers(0, spec.n_docs, size=n_other),
    )
    target[~is_ins] = picks
    # updates may also touch freshly-inserted keys in later events: remap a
    # third of update targets onto the inserted-id range when it exists
    if n_ins > 0:
        upd = np.flatnonzero(ops == OP_UPDATE)
        remap = upd[rng.random(upd.size) < 0.33]
        target[remap] = new_ids[rng.integers(0, n_ins, size=remap.size)]

    doc_ids = np.char.add("doc", np.char.zfill(target.astype("U10"), 8))
    log_pos = np.arange(1, n + 1, dtype=np.int64)
    ts = (1_700_000_000_000_000 + log_pos * 1_000).astype("datetime64[us]")

    table_col = np.full(n, "docs", dtype="U11")
    decoy = rng.random(n) < spec.decoy_table_frac
    table_col[decoy] = "ignored_tbl"

    tokens, n_tok = _gen_token_lists(rng, n, spec.min_tok, spec.max_tok)
    tokens = _as_takeable_list32(tokens)  # one concat, reused every epoch
    # delete events carry only the key (ref: FilterDelete drops the payload,
    # /root/reference/src/service/mysql_filter_service.go:105-127) — the
    # payload columns are nulled per epoch after the take (nulling first and
    # taking after would force a null-masked list rebuild in _take_list32)
    is_del = ops == OP_DELETE

    epoch_of = np.minimum(
        (log_pos - 1) * spec.n_epochs // n, spec.n_epochs - 1
    ).astype(np.int64)
    epochs: list[pa.Table] = []
    for e in range(spec.n_epochs):
        idx = np.flatnonzero(epoch_of == e)
        if spec.shuffle_delivery:
            idx = rng.permutation(idx)
        take = pa.array(idx)
        evolved = (
            spec.evolve_from_epoch is not None and e >= spec.evolve_from_epoch
        )
        sources = SOURCES_V2 if evolved else SOURCES_V1
        src = rng.choice(np.array(sources), size=idx.size)
        schema_ver = 2 if evolved else 1
        del_e = is_del[idx]
        tok_e = _take_list32(tokens, take)
        if del_e.any():
            tok_e = pa.compute.if_else(
                pa.array(del_e), pa.scalar(None, pa.list_(pa.int32())), tok_e
            )
        cols = {
            "log_pos": pa.array(log_pos[idx]),
            "ts": pa.array(ts[idx]),
            "op": pa.array(ops[idx]),
            "table": pa.array(table_col[idx]),
            "doc_id": pa.array(doc_ids[idx]),
            "tokens": tok_e,
            "n_tok": pa.array(n_tok[idx], mask=del_e),
            "source": pa.array(src),
            "schema_ver": pa.array(
                np.full(idx.size, schema_ver, dtype=np.int32)
            ),
        }
        if evolved:
            cols["quality"] = pa.array(
                rng.random(idx.size).astype(np.float32)
            )
        epochs.append(pa.table(cols))
    return epochs


def write_event_log(
    root: str, epochs: list[pa.Table], files_per_epoch: int = 2
) -> list[str]:
    """Write `events/epoch=K/part-*.parquet` (the Kafka-topic analog).

    Replay from OffsetOldest ≙ reading epoch dirs in order from a watermark
    (ref consumer start: /root/reference/src/lib/mq/kafka/mq_consumer.go:103).

    ATOMIC PUBLISH: the whole log is written into a sibling temp dir and
    renamed into place last, so `root` either exists complete or not at
    all. This is the log's durability contract (Kafka never exposes a
    half-committed message to a consumer): a process SIGKILLed mid-write
    must not leave a torn part-file that poisons every later replay of
    the same root — the chaos harness found exactly that (footer magic
    missing) when a kill landed during fixture generation."""
    tmp = f"{root}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    paths = []
    for e, t in enumerate(epochs):
        d = os.path.join(tmp, f"epoch={e:05d}")
        os.makedirs(d, exist_ok=True)
        k = max(1, min(files_per_epoch, t.num_rows))
        step = (t.num_rows + k - 1) // k
        for j in range(k):
            chunk = t.slice(j * step, step)
            if chunk.num_rows == 0:
                continue
            p = os.path.join(d, f"part-{j:04d}.parquet")
            pq.write_table(chunk, p)
        paths.append(os.path.join(root, f"epoch={e:05d}"))
    os.rename(tmp, root)  # the commit point
    return paths


def list_epoch_dirs(root: str) -> list[tuple[int, str]]:
    out = []
    for name in sorted(os.listdir(root)):
        if name.startswith("epoch="):
            out.append((int(name.split("=", 1)[1]), os.path.join(root, name)))
    return out


# --- sequential oracle ------------------------------------------------------


def replay_oracle(
    base: pa.Table | None,
    epochs: list[pa.Table],
    include_tables: tuple[str, ...] = ("docs",),
) -> pa.Table:
    """Single-threaded dict replay in log_pos order — mirrors the reference's
    strictly-serial apply loop (/root/reference/src/application/strategy/
    syncmq/sync_mq.go:74-94). Ground truth for every e2e test.

    insert/update ⇒ state[doc_id] = row image; delete ⇒ drop key. LWW: a row
    only wins if its log_pos exceeds the current holder's (handles replayed /
    duplicated delivery).
    """
    state: dict[str, dict] = {}
    if base is not None:
        for row in base.to_pylist():
            state[row["doc_id"]] = row
    live = [t for t in epochs if t.num_rows]
    # zero epochs (e.g. an as-of read at the bootstrap point) is a valid
    # prefix: the state is just the base image
    rows = (
        pa.concat_tables(live, promote_options="default").to_pylist()
        if live
        else []
    )
    rows.sort(key=lambda r: r["log_pos"])
    for r in rows:
        if r["table"] not in include_tables:
            continue
        cur = state.get(r["doc_id"])
        if cur is not None and cur["log_pos"] >= r["log_pos"]:
            continue  # stale replay
        if r["op"] == OP_DELETE:
            state.pop(r["doc_id"], None)
        else:
            rec = {
                "doc_id": r["doc_id"],
                "tokens": r["tokens"],
                "n_tok": r["n_tok"],
                "source": r["source"],
                "log_pos": r["log_pos"],
            }
            if "quality" in r:
                rec["quality"] = r["quality"]
            state[rec["doc_id"]] = rec
    out = sorted(state.values(), key=lambda r: r["doc_id"])
    evolved = any("quality" in r for r in out)
    if evolved:
        for r in out:
            r.setdefault("quality", None)
        schema = LAKE_SCHEMA.append(pa.field(*EVOLVED_COLUMN))
    else:
        schema = LAKE_SCHEMA
    if not out:
        return schema.empty_table()
    return pa.Table.from_pylist(out, schema=schema)
