"""Incremental materialized views over the lake — partition-level
invalidation.

The classic CDC payoff: an aggregate that stays fresh as epochs commit,
WITHOUT rescanning the whole lake. LWW upserts cannot be maintained by
pure delta addition (an upsert retracts an unseen old value), but this
engine's commit unit is the (partition, epoch) — a partition's
checkpoint `files` list changes iff its contents changed. So a view
caches one JSON-able partial per partition keyed by a fingerprint of
that list, and `refresh()` recomputes ONLY the partitions whose
fingerprint moved (one Ray task each, via the same merge-on-read fold as
read_lake), then re-combines the tiny partials on the driver.

Refresh cost is O(changed partitions), not O(lake); a tailing job whose
epochs touch a hot subset of the key space refreshes views nearly for
free. State lives at <lake>/views/<name>.json (atomic write, same
crash-anywhere contract as checkpoints: a torn refresh just recomputes).

The reference's closest analog is the inspect strategy's full
max-id/count rescan per tick (src/application/strategy/inspect.go) —
this is that consistency surface made incremental.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Callable

import pyarrow as pa
import ray.data as rd

from .lake import Lake


class MaterializedView:
    """name + partial_fn(pa.Table) -> JSON-able dict, one per partition.

    partial_fn must be a plain importable/serializable callable — it runs
    inside Ray tasks for changed partitions. `columns` prunes the
    partition fold to what the view needs (projection pushdown)."""

    def __init__(
        self,
        lake_root: str,
        name: str,
        partial_fn: Callable[[pa.Table], dict],
        columns: list[str] | None = None,
    ):
        self.lake_root = lake_root
        self.name = name
        self.partial_fn = partial_fn
        self.columns = columns
        #: storage-backend document key (posix file: <lake>/views/<name>.json)
        self.doc_key = f"views/{name}.json"
        self.path = os.path.join(lake_root, "views", f"{name}.json")

    def _load(self, lake: Lake) -> dict:
        try:
            state = lake.storage.doc_read_json(self.doc_key)
        except json.JSONDecodeError:
            state = None
        return state if state is not None else {"partitions": {}}

    def refresh(self) -> tuple[dict[int, dict], int]:
        """Returns ({partition: partial}, n_recomputed)."""
        lake = Lake(self.lake_root)
        state = self._load(lake)
        cached = state["partitions"]
        todo: list[int] = []
        fps: dict[int, str] = {}
        for p in lake.partitions():
            ck = lake.read_checkpoint(p)
            fp = hashlib.md5(
                json.dumps(sorted(ck.get("files", []))).encode()
            ).hexdigest()
            fps[p] = fp
            ent = cached.get(str(p))
            if ent is None or ent.get("fp") != fp:
                todo.append(p)
        if todo:
            lake_root, columns, fn = self.lake_root, self.columns, self.partial_fn

            def compute(t: pa.Table) -> pa.Table:
                lk = Lake(lake_root)
                out_p, out_j = [], []
                for p in t.column("partition").to_pylist():
                    part = lk.read_partition(p, columns=columns)
                    if part is None:
                        # honor the documented partial_fn(pa.Table)
                        # contract for empty partitions (built-ins treat
                        # None and 0 rows identically; user partials may
                        # not accept None) — PROJECTED to the view's
                        # columns, same shape non-empty partitions get
                        schema = lk.union_schema()
                        if schema is not None and columns:
                            schema = pa.schema(
                                [schema.field(c) for c in columns
                                 if c in schema.names]
                            )
                        part = (
                            schema.empty_table() if schema is not None
                            else pa.table({})
                        )
                    out_p.append(p)
                    out_j.append(json.dumps(fn(part)))
                return pa.table(
                    {"partition": pa.array(out_p, pa.int64()),
                     "partial": pa.array(out_j, pa.string())}
                )

            rows = (
                rd.from_items([{"partition": p} for p in todo])
                .map_batches(compute, batch_format="pyarrow", batch_size=1)
                .take_all()
            )
            for r in rows:
                cached[str(r["partition"])] = {
                    "fp": fps[r["partition"]],
                    "partial": json.loads(r["partial"]),
                }
        # drop entries for partitions that no longer exist
        live = {str(p) for p in fps}
        state["partitions"] = {k: v for k, v in cached.items() if k in live}
        lake.storage.doc_write_json(self.doc_key, state)
        return (
            {int(k): v["partial"] for k, v in state["partitions"].items()},
            len(todo),
        )


def _source_stats_partial(t: pa.Table | None) -> dict:
    """Per-source live-doc counts + token totals for one partition."""
    if t is None or t.num_rows == 0:
        return {}
    out: dict[str, list[int]] = {}
    srcs = t.column("source").to_pylist()
    ntoks = t.column("n_tok").to_pylist()
    for s, n in zip(srcs, ntoks):
        e = out.setdefault(s or "", [0, 0])
        e[0] += 1
        e[1] += int(n or 0)
    return out


def source_stats_view(lake_root: str):
    """Convenience: incrementally-maintained per-source corpus stats.
    Returns (pandas DataFrame(source, n_docs, total_tokens),
    n_partitions_recomputed)."""
    import pandas as pd

    view = MaterializedView(
        lake_root, "source_stats", _source_stats_partial,
        columns=["source", "n_tok"],
    )
    partials, n = view.refresh()
    acc: dict[str, list[int]] = {}
    for part in partials.values():
        for s, (c, tk) in part.items():
            e = acc.setdefault(s, [0, 0])
            e[0] += c
            e[1] += tk
    df = pd.DataFrame(
        [(s, v[0], v[1]) for s, v in sorted(acc.items())],
        columns=["source", "n_docs", "total_tokens"],
    )
    return df, n


#: named registry for CLI / tail wiring: name -> callable(lake_root) ->
#: (result DataFrame, n_partitions_recomputed)
REGISTRY: dict = {"source_stats": source_stats_view}


def register_view(name: str, fn) -> None:
    """User-extension surface (the custom-filter registry analog,
    customfilter/init.go): fn(lake_root) -> (DataFrame, n_recomputed),
    selectable from `tail(refresh_views=...)` and the CLI by name."""
    REGISTRY[name] = fn


def _tok_hist_partial(t: pa.Table | None) -> dict:
    """Per-partition histogram of n_tok in power-of-two buckets."""
    if t is None or t.num_rows == 0:
        return {}
    out: dict[str, int] = {}
    for n in t.column("n_tok").to_pylist():
        b = max(0, int(n or 0)).bit_length()  # bucket = [2^(b-1), 2^b)
        k = str(b)
        out[k] = out.get(k, 0) + 1
    return out


def token_length_histogram_view(lake_root: str):
    """Incrementally-maintained corpus token-length distribution:
    power-of-two buckets (bucket b holds docs with n_tok in
    [2^(b-1), 2^b)). Returns (DataFrame(bucket_log2, n_docs),
    n_partitions_recomputed)."""
    import pandas as pd

    view = MaterializedView(
        lake_root, "token_length_histogram", _tok_hist_partial,
        columns=["n_tok"],
    )
    partials, n = view.refresh()
    acc: dict[int, int] = {}
    for part in partials.values():
        for b, c in part.items():
            acc[int(b)] = acc.get(int(b), 0) + c
    df = pd.DataFrame(
        sorted(acc.items()), columns=["bucket_log2", "n_docs"]
    )
    return df, n


REGISTRY["token_length_histogram"] = token_length_histogram_view


def _hll_partial(t: pa.Table | None) -> dict:
    """Per-partition HLL registers over live doc_ids — keys are unique
    within a partition (LWW winners) AND across partitions (hash
    ownership), and registers merge by max, so the view's combine is
    exact sketch union."""
    if t is None or t.num_rows == 0:
        return {}
    from ..functions.sketch import hll_registers

    return {
        str(b): r
        for b, r in hll_registers(t.column("doc_id").to_pylist()).items()
    }


def hll_distinct_view(lake_root: str):
    """Incrementally-maintained approximate distinct-key count of the
    lake: HyperLogLog registers cached per partition, invalidated by the
    partition's checkpoint fingerprint — a tailing job keeps a
    cardinality gauge fresh at O(changed partitions) per round, never a
    full scan. Returns (DataFrame(m, nonzero, int_sum, est_distinct),
    n_partitions_recomputed) — same shape as functions.sketch's
    hll_estimate, so the estimate is comparable to a from-scratch
    hll_distinct over the exported lake."""
    import numpy as np
    import pandas as pd  # noqa: F401  (return type)

    from ..functions.sketch import _HLL_M, hll_estimate

    view = MaterializedView(
        lake_root, "hll_distinct", _hll_partial, columns=["doc_id"]
    )
    partials, n = view.refresh()
    m_j = np.zeros(_HLL_M, dtype=np.int64)
    for part in partials.values():
        for b, r in part.items():
            b = int(b)
            if r > m_j[b]:
                m_j[b] = r
    return hll_estimate(m_j), n


REGISTRY["hll_distinct"] = hll_distinct_view


def _content_dup_partial(t: pa.Table | None) -> dict:
    """Per-partition: live row count + HLL registers over CONTENT hashes
    (blake2b-64 of each row's token buffer — the same content key as
    lake_dedup_report, replay.py). A duplicated content spans partitions
    (the lake routes by doc_id, not content), but HLL union is exactly
    idempotent, so the combined registers estimate DISTINCT contents
    regardless of where the copies live."""
    if t is None or t.num_rows == 0:
        return {}
    import hashlib as _hl

    import numpy as _np

    from ..functions.sketch import hll_registers

    hs = [
        _hl.blake2b(
            _np.asarray(r if r is not None else [], dtype=_np.int32)
            .tobytes(),
            digest_size=8,
        ).hexdigest()
        for r in t.column("tokens").to_pylist()
    ]
    out = {str(b): r for b, r in hll_registers(hs).items()}
    out["__rows"] = t.num_rows
    return out


def content_dup_gauge_view(lake_root: str):
    """Incrementally-maintained duplicate-content gauge: live rows minus
    the HLL-estimated count of distinct token buffers — the streaming
    answer to 'how much exact duplication has this feed accumulated'
    without the full-scan lake_dedup_report. O(changed partitions) per
    tail round; registers re-derive only for partitions whose
    checkpoint fingerprint moved. Returns
    (DataFrame(n_rows, est_distinct_contents, est_dups), n_recomputed);
    est_dups clamps at 0 (the estimator can overshoot the row count at
    small cardinalities)."""
    import numpy as np
    import pandas as pd

    from ..functions.sketch import _HLL_M, hll_estimate

    view = MaterializedView(
        lake_root, "content_dup_gauge", _content_dup_partial,
        columns=["tokens"],
    )
    partials, n = view.refresh()
    m_j = np.zeros(_HLL_M, dtype=np.int64)
    n_rows = 0
    for part in partials.values():
        for b, r in part.items():
            if b == "__rows":
                n_rows += int(r)
                continue
            b = int(b)
            if r > m_j[b]:
                m_j[b] = r
    est = int(hll_estimate(m_j)["est_distinct"].iloc[0]) if n_rows else 0
    df = pd.DataFrame(
        {
            "n_rows": np.array([n_rows], dtype="int64"),
            "est_distinct_contents": np.array([est], dtype="int64"),
            "est_dups": np.array([max(0, n_rows - est)], dtype="int64"),
        }
    )
    return df, n


REGISTRY["content_dup_gauge"] = content_dup_gauge_view


def _content_dup_partial_text(t: pa.Table | None) -> dict:
    """Oracle-reproducible variant of _content_dup_partial: the content
    key is the ','-joined token string and registers come from the
    shared md5-64 sketch hash — DuckDB rebuilds the identical registers
    from md5(content_key) over the pinned fixture (see
    queries.cdc_lake_dup_gauge). The bytes/blake2b variant stays the
    fast default for operational gauges."""
    if t is None or t.num_rows == 0:
        return {}
    from ..functions.sketch import hll_registers

    keys = [
        ",".join(map(str, r or []))
        for r in t.column("tokens").to_pylist()
    ]
    out = {str(b): r for b, r in hll_registers(keys).items()}
    out["__rows"] = t.num_rows
    return out


def _source_freshness_partial(t: pa.Table | None) -> dict:
    """Per-partition {source: [max_log_pos, n_live]} — the reference's
    per-table sync watermark (T2, inspect.go's max-id tick) as an
    incrementally-maintained view."""
    if t is None or t.num_rows == 0:
        return {}
    out: dict[str, list[int]] = {}
    srcs = t.column("source").to_pylist()
    lps = t.column("log_pos").to_pylist()
    for s, lp in zip(srcs, lps):
        e = out.setdefault(s or "", [0, 0])
        if int(lp or 0) > e[0]:
            e[0] = int(lp or 0)
        e[1] += 1
    return out


def source_freshness_view(lake_root: str):
    """Incrementally-maintained per-source watermark: the highest
    log_pos each upstream source has landed in the lake, plus its live
    row count — the 'which feed is lagging' gauge a tailing operator
    watches. O(changed partitions) per round. Returns
    (DataFrame(source, max_log_pos, n_docs), n_recomputed)."""
    import pandas as pd

    view = MaterializedView(
        lake_root, "source_freshness", _source_freshness_partial,
        columns=["source", "log_pos"],
    )
    partials, n = view.refresh()
    acc: dict[str, list[int]] = {}
    for part in partials.values():
        for s, (mx, cnt) in part.items():
            e = acc.setdefault(s, [0, 0])
            if mx > e[0]:
                e[0] = mx
            e[1] += cnt
    df = pd.DataFrame(
        [(s, v[0], v[1]) for s, v in sorted(acc.items())],
        columns=["source", "max_log_pos", "n_docs"],
    )
    return df, n


REGISTRY["source_freshness"] = source_freshness_view
