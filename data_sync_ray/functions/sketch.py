"""Mergeable sketches — the bounded-state summaries a 100 TB pipeline
uses where exact answers would shuffle the world.

Every sketch here is DETERMINISTIC (md5-derived hash functions, no
seeds, no stream-order dependence) and MERGEABLE (per-batch partials
combine by max / sum / bitwise-or), so:

- the Ray side is a map_batches combiner emitting O(sketch) rows per
  batch plus one tiny reduce — no all-to-all on the raw stream;
- the DuckDB oracle can re-derive the IDENTICAL sketch in SQL (md5 is
  available on both sides), so even the *approximate* answers are
  hash-checked bit-for-bit, not merely "close".

The reference has no sketches (its COUNT/MAX checks are exact SQL,
mysql_repository.go); these are the scale-path analogs of its
consistency/inspection reads: cardinality without COUNT(DISTINCT)'s
shuffle, frequency without a vocabulary sort, membership without a
join. All state is integer-exact: HLL's harmonic sum is kept as
Σ 2^(49-M_j) in int64 (exact — no float accumulation order to vary),
CMS cells and bloom bit positions are ints end-to-end.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import ray.data as rd
from ray.data.aggregate import Max, Sum

# --- 64-bit md5 hash shared with the SQL oracles ----------------------------
#: SQL equivalent: ('0x' || substr(md5(s), 1, 16))::UBIGINT


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:16], 16)


def _h64_many(values) -> np.ndarray:
    """md5-64 of each string; uint64. Callers pass UNIQUE values only
    (per-batch np.unique first), so the Python loop is over the batch's
    distinct keys, not its rows."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = _h64(v)
    return out


# --- HyperLogLog ------------------------------------------------------------

_HLL_M = 256  # 2^8 buckets; bucket = top 8 bits of the md5-64
_HLL_W = 48  # rank taken over the low 48 bits -> rho in [1, 49]
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256.0)


def hll_registers(values) -> dict[int, int]:
    """{bucket: max rho} for an iterable of (hashable) values — the
    mergeable HLL partial (merge = elementwise max). Shared by the
    streaming hll_distinct below and the incremental lake view."""
    uniq = np.unique(np.asarray(list(values), dtype=object))
    if len(uniq) == 0:
        return {}
    H = _h64_many([str(v) for v in uniq])
    bucket = (H >> np.uint64(56)).astype(np.int64)
    w = H & np.uint64((1 << _HLL_W) - 1)
    _, exp = np.frexp(w.astype(np.float64))
    rho = np.int64(_HLL_W + 1) - exp.astype(np.int64)
    out: dict[int, int] = {}
    for b, r in zip(bucket.tolist(), rho.tolist()):
        if r > out.get(b, 0):
            out[b] = r
    return out


def hll_estimate(m_j: np.ndarray) -> pd.DataFrame:
    """One-row summary (m, nonzero, int_sum, est_distinct) from a full
    register vector — the integer-exact estimator both the SQL oracle
    and the view derive from."""
    nonzero = int((m_j > 0).sum())
    int_sum = int(sum(1 << (_HLL_W + 1 - int(r)) for r in m_j))
    est = (
        _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << (_HLL_W + 1))
        / float(int_sum)
    )
    if est <= 2.5 * _HLL_M and nonzero < _HLL_M:
        est = _HLL_M * math.log(_HLL_M / float(_HLL_M - nonzero))
    return pd.DataFrame(
        {
            "m": np.array([_HLL_M], dtype=np.int64),
            "nonzero": np.array([nonzero], dtype=np.int64),
            "int_sum": np.array([int_sum], dtype=np.int64),
            "est_distinct": np.array([round(est, 2)], dtype=np.float64),
        }
    )


def hll_distinct(ds: rd.Dataset, column: str) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT column) via HyperLogLog (Flajolet et
    al. 2007), m=256 registers.

    Per batch: unique keys -> (bucket, rho) -> per-batch register MAXES
    (256 rows out regardless of batch size). Merge is SHUFFLE-FREE: a
    second map_batches level tree-combines ~256 partial blocks at a
    time (the 256-key Ray groupby.aggregate alternative measured
    1.2-2.3s of pure sort-shuffle overhead on a 23k-row partial stream
    vs 0.3s for this shape), then the driver max-merges the <=256 rows
    per combined block — bounded at 256 * ceil(blocks/256) rows, a few
    MB even at a million input blocks. The estimate is derived from the
    integer register sum
    Σ 2^(49-M_j) (fits int64: ≤ 256·2^49 = 2^57), so both engines
    divide the same two exact numbers — no float-sum order noise.
    Small-range (linear counting) correction applied as in the paper.

    Returns one row: m, nonzero, int_sum, est_distinct (rounded 2dp).
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vals = batch[column].dropna().to_numpy()
        uniq = np.unique(vals)
        if len(uniq) == 0:
            return pd.DataFrame(
                {"bucket": pd.Series([], dtype="int64"),
                 "rho": pd.Series([], dtype="int64")}
            )
        H = _h64_many([str(v) for v in uniq])
        bucket = (H >> np.uint64(56)).astype(np.int64)
        w = H & np.uint64((1 << _HLL_W) - 1)
        # rho = leading zeros in the 48-bit window + 1 = 49 - bit_length.
        # frexp's exponent IS bit_length exactly: a <=48-bit int converts
        # to float64 losslessly (53-bit mantissa), unlike np.log2 whose
        # rounding can tip log2(2^k - 1) up to k.
        _, exp = np.frexp(w.astype(np.float64))
        rho = (np.int64(_HLL_W + 1) - exp.astype(np.int64))
        out = (
            pd.DataFrame({"bucket": bucket, "rho": rho})
            .groupby("bucket", as_index=False)["rho"].max()
        )
        out["bucket"] = out["bucket"].astype("int64")
        out["rho"] = out["rho"].astype("int64")
        return out

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch
        return batch.groupby("bucket", as_index=False)["rho"].max()

    regs = (
        ds.map_batches(partial, batch_format="pandas", batch_size=65536)
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .to_pandas()  # <= 256 rows per ~256 input blocks
    )
    if len(regs):
        regs = regs.groupby("bucket", as_index=False)["rho"].max()
    m_j = np.zeros(_HLL_M, dtype=np.int64)
    if len(regs):
        m_j[regs["bucket"].to_numpy()] = regs["rho"].to_numpy()
    return hll_estimate(m_j)


# --- Count-Min sketch -------------------------------------------------------

_CMS_D = 4  # hash rows (salts "c0:".."c3:")
_CMS_W = 1024  # buckets per row


def _cms_buckets(tokens) -> np.ndarray:
    """(d, n) bucket ids for each token under the d salted hashes."""
    out = np.empty((_CMS_D, len(tokens)), dtype=np.int64)
    for j, t in enumerate(tokens):
        for i in range(_CMS_D):
            out[i, j] = _h64(f"c{i}:{t}") % _CMS_W
    return out


def cms_token_counts(
    docs: rd.Dataset, candidates: pd.DataFrame
) -> pd.DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of the corpus
    token stream, probed for the given candidate tokens.

    Per batch: value_counts of the batch's tokens (the combiner), each
    distinct token adds its count to d=4 cells of a 4x1024 table;
    partials leave the task as <=4096 (cell, cnt) rows however large
    the batch. Cells merge shuffle-free: a tree-combine map_batches
    level sums ~16 partial blocks at a time, then the driver sums the
    <=4096-row combined blocks (bounded at 4096 * ceil(blocks/16) rows
    — same shape as hll_distinct's merge, which measured ~1-2s cheaper
    than a tiny-key Ray groupby.aggregate). est_cnt = min over the d
    cells >= true_cnt always (CMS never undercounts).

    candidates: DataFrame (token, cnt) — e.g. the exact top-k from
    functions.text.top_tokens. Returns (token, true_cnt, est_cnt).
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = [w for t in batch["text"] for w in t.split()]
        if not toks:
            return pd.DataFrame(
                {"cell": pd.Series([], dtype="int64"),
                 "cnt": pd.Series([], dtype="int64")}
            )
        vc = pd.Series(toks, dtype="object").value_counts()
        buckets = _cms_buckets(vc.index.to_numpy(dtype=object))
        counts = vc.to_numpy(dtype=np.int64)
        table = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
        for i in range(_CMS_D):
            np.add.at(table[i], buckets[i], counts)
        cell = np.nonzero(table.ravel())[0].astype(np.int64)
        return pd.DataFrame(
            {"cell": cell, "cnt": table.ravel()[cell].astype(np.int64)}
        )

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch
        return batch.groupby("cell", as_index=False)["cnt"].sum()

    cells = (
        docs.map_batches(partial, batch_format="pandas", batch_size=8192)
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .to_pandas()  # <= 4096 rows per ~16 input blocks
    )
    table = np.zeros(_CMS_D * _CMS_W, dtype=np.int64)
    if len(cells):
        cells = cells.groupby("cell", as_index=False)["cnt"].sum()
        np.add.at(table, cells["cell"].to_numpy(), cells["cnt"].to_numpy())
    table = table.reshape(_CMS_D, _CMS_W)

    toks = candidates["token"].to_numpy(dtype=object)
    buckets = _cms_buckets(toks)
    est = table[np.arange(_CMS_D)[:, None], buckets].min(axis=0)
    out = pd.DataFrame(
        {
            "token": toks,
            "true_cnt": candidates["cnt"].to_numpy(dtype=np.int64),
            "est_cnt": est.astype(np.int64),
        }
    )
    return out.sort_values(
        ["true_cnt", "token"], ascending=[False, True]
    ).reset_index(drop=True)


# --- Bloom-filter semi-join -------------------------------------------------

_BLOOM_BITS = 1 << 16
_BLOOM_D = 3  # salts "b0:".."b2:"


#: process-level key -> (d,) positions memo: a probe key recurs in every
#: batch of the big side, so md5 runs once per DISTINCT key per worker
#: (same trick as dedup._WORD_CACHE)
_BLOOM_POS_CACHE: dict = {}


def _bloom_positions(keys) -> np.ndarray:
    """(d, n) bit positions for each key (int or str), md5 memoized."""
    c = _BLOOM_POS_CACHE
    out = np.empty((_BLOOM_D, len(keys)), dtype=np.int64)
    for j, k in enumerate(keys):
        p = c.get(k)
        if p is None:
            p = np.array(
                [_h64(f"b{i}:{k}") % _BLOOM_BITS for i in range(_BLOOM_D)],
                dtype=np.int64,
            )
            c[k] = p
        out[:, j] = p
    if len(c) > 1_000_000:  # bound worker memory on adversarial key sets
        c.clear()
    return out


def bloom_semijoin_stats(
    probe: rd.Dataset,
    probe_key: str,
    build: rd.Dataset,
    build_key: str,
) -> pd.DataFrame:
    """The bloom-pre-filter a shuffle join wants at scale: build a
    2^16-bit bloom filter of the build side's keys (per-batch bitmap
    partials OR-merged — 8 KB per batch out), broadcast it once, and
    probe the big side inside map_batches. Reports exactly how the
    filter behaved so the false-positive rate is itself oracle-checked:

      n_probe         rows on the probe side
      n_pass_bloom    rows whose key hits all d bloom positions
      n_true_match    rows whose key is REALLY in the build side
      n_false_pos     bloom-passing rows with no real match

    All four are exact integers — the approximation is *in* the
    numbers, not in the check. Positions use the shared md5-64 hash so
    DuckDB reproduces the identical bitmap (and the identical false
    positives)."""

    def build_partial(batch: pd.DataFrame) -> pd.DataFrame:
        keys = np.unique(batch[build_key].dropna().to_numpy()).astype(
            np.int64
        )
        bits = np.zeros(_BLOOM_BITS, dtype=bool)
        if len(keys):
            pos = _bloom_positions(keys.tolist())
            bits[pos.ravel()] = True
        # bitmap AND the batch's distinct keys ride the same partial row:
        # one pass over the build side covers both the filter and the
        # exact-membership accounting (was two executions)
        return pd.DataFrame(
            {"bitmap": [np.packbits(bits).tobytes()],
             "keys": [keys.tobytes()]}
        )

    import ray as _ray

    parts = build.map_batches(
        build_partial, batch_format="pandas", batch_size=65536
    ).take_all()  # one ~8 KB + keys row per build batch
    bits = np.zeros(_BLOOM_BITS, dtype=bool)
    key_arrs = [np.empty(0, dtype=np.int64)]
    for r in parts:
        bits |= np.unpackbits(
            np.frombuffer(r["bitmap"], dtype=np.uint8)
        ).astype(bool)
        key_arrs.append(np.frombuffer(r["keys"], dtype=np.int64))
    # exact membership array for the false-positive accounting (the build
    # side is the SMALL side by contract — same broadcast the engine's
    # semi-joins use); sorted for np.isin's merge path
    true_keys = np.unique(np.concatenate(key_arrs))
    bits_ref = _ray.put(np.packbits(bits))
    keys_ref = _ray.put(true_keys)

    # Plain TASK-mode map_batches (no actor pool): the broadcast state is
    # an 8 KB bitmap + small key set — a local plasma get + unpackbits per
    # batch is negligible, and task mode can't starve upstream stages the
    # way a fixed actor pool does on a small-CPU session (the chained-
    # actor-pool deadlock named in CLAUDE.md / SURVEY §8).
    def probe_batch(batch: pd.DataFrame) -> pd.DataFrame:
        pbits = np.unpackbits(_ray.get(bits_ref)).astype(bool)
        pkeys = _ray.get(keys_ref)
        vals = batch[probe_key].to_numpy()
        uniq, inv = np.unique(vals, return_inverse=True)
        pos = _bloom_positions(uniq.astype(np.int64).tolist())
        upass = pbits[pos].all(axis=0)
        utrue = np.isin(uniq.astype(np.int64), pkeys)
        return pd.DataFrame(
            {
                "n_probe": np.array([len(vals)], dtype=np.int64),
                "n_pass_bloom": np.array(
                    [int(upass[inv].sum())], dtype=np.int64
                ),
                "n_true_match": np.array(
                    [int(utrue[inv].sum())], dtype=np.int64
                ),
            }
        )

    rows = probe.map_batches(
        probe_batch, batch_format="pandas", batch_size=65536
    ).to_pandas()
    agg = rows.sum()
    return pd.DataFrame(
        {
            "n_probe": np.array([agg["n_probe"]], dtype=np.int64),
            "n_pass_bloom": np.array(
                [agg["n_pass_bloom"]], dtype=np.int64
            ),
            "n_true_match": np.array(
                [agg["n_true_match"]], dtype=np.int64
            ),
            "n_false_pos": np.array(
                [agg["n_pass_bloom"] - agg["n_true_match"]],
                dtype=np.int64,
            ),
        }
    )
