"""Distributed aggregate operators beyond plain groupby.aggregate.

grouped_exact_percentiles: exact per-group percentiles at 100-TB shape.
A naive groupby(key).map_groups(np.percentile) materializes each group's
whole value column in ONE task — a scale hazard the moment a group
outgrows worker memory. Instead the value domain is quantized to integer
cents (floor(x*100+0.5), the repo-wide money convention, CLAUDE.md) and
percentiles reduce over per-batch COUNT HISTOGRAMS:

  1. per-batch combiner: groupby (key, cents) -> count. Output rows are
     bounded by distinct (key, cent) pairs per batch, independent of row
     count;
  2. one exchange of those tiny histogram rows on the group key;
  3. per-group merge: sum counts, sort by cents, walk the CDF — the
     P-th percentile is the smallest cents value whose cumulative count
     reaches rank ceil(P*n/100) = (P*n + 99) // 100, computed in INTEGER
     arithmetic (rank semantics pinned explicitly; the SQL oracle states
     the same formula with row_number, not an engine's quantile_disc
     whose edge conventions — and decimal-vs-double ceil — could
     differ).

Exact on the quantized metric by construction — histogram addition is
commutative/associative, so batch/block boundaries cannot change the
answer. The reference's aggregation surface is plain max/count
(src/service/check_service.go); this is the percentile analog a
monitoring/consistency pass needs at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..stages.groupmap import per_group


def grouped_exact_percentiles(
    ds: rd.Dataset,
    key: str,
    value: str,
    percents: tuple[int, ...] = (50, 90, 99),
    batch_size: int = 65536,
) -> rd.Dataset:
    """Per-`key` exact percentiles of integer-cent-quantized `value`.

    Returns one row per key: (key, n, p{NN}_cents ...) — all integers,
    so results hash identically across engines (no float interpolation
    arithmetic to diverge)."""
    pcols = [f"p{p:02d}_cents" for p in percents]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            batch[value].to_numpy(dtype=np.float64) * 100 + 0.5
        ).astype(np.int64)
        h = (
            batch.assign(_cents=cents)
            .groupby([key, "_cents"], sort=False)
            .size()
            .rename("_cnt")
            .reset_index()
        )
        h["_cnt"] = h["_cnt"].astype(np.int64)
        return h

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby("_cents", sort=True)["_cnt"].sum()
        cum = h.cumsum().to_numpy()
        n = int(cum[-1])
        vals = h.index.to_numpy()
        row: dict = {key: [g[key].iloc[0]], "n": np.int64(n)}
        for p, c in zip(percents, pcols):
            # 1-indexed rank ceil(P*n/100), pure integer arithmetic
            rank = max(1, (p * n + 99) // 100)
            row[c] = np.int64(vals[np.searchsorted(cum, rank)])
        return pd.DataFrame(row)

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
        .sort(key)
        .map_batches(per_group(finish, key),
                     batch_size=None, batch_format="pyarrow")
    )


def tree_sum_by_key(
    ds: rd.Dataset,
    keys: list[str],
    batch_size: int = 65536,
) -> pd.DataFrame:
    """Grouped SUM of every non-key column WITHOUT an all-to-all
    exchange, for BOUNDED-cardinality keys (segments, months, return
    flags — not user ids).

    Contract: the caller's upstream map_batches already emits one
    combined row per key per batch (the partial), and every summed
    column is an exact integer (int cents / counts) so addition order
    cannot flip a rounding. Shape: a tree-combine map_batches level
    sums ~batch_size partial rows at a time, then the driver sums the
    combined blocks — driver traffic is bounded by
    |keys| * ceil(blocks/combine_fanin), a few MB even at a million
    input blocks. Measured vs Ray's groupby.aggregate on the same
    partials: the sort-shuffle barrier alone costs ~1s per execution at
    sf0.1 (q1 1.6s -> 0.6s; hll 3.4s -> 0.3s — see functions/sketch.py).
    """

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return b
        return b.groupby(keys, as_index=False).sum()

    out = ds.map_batches(
        combine, batch_format="pandas", batch_size=batch_size
    ).to_pandas()
    if not len(out):
        return out
    return out.groupby(keys, as_index=False).sum()
