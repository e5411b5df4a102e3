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
        .groupby(key)
        .map_groups(finish, batch_format="pandas")
    )
