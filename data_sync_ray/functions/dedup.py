"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (100 TB design):
- exact dedup: per-batch combiner (local keep-first) -> hash-partition on
  the content hash into a FIXED number of parts -> per-part keep-first.
  The exchange key is a small int (never one group per distinct hash —
  many-tiny-group map_groups is a measured 20-100x pitfall, BASELINE.md).
- MinHash-LSH: shingle->minhash per batch (stateless, vectorized) ->
  explode to (band, band_hash, doc_id) rows (vectorized mix-hash) ->
  groupby on the band key (the only shuffle; band rows are tiny) ->
  candidate pairs -> exact-Jaccard verify. Verification co-partitions
  pairs and docs by doc id via two hash joins (pair->shingles), so no
  driver-side materialization of pairs or shingle sets.
- SimHash: 64-bit signature per doc (batch-vectorized bit-count sum);
  candidates via 4x16-bit band buckets, verified by exact Hamming.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.groupmap import per_group

_MERSENNE = np.uint64((1 << 61) - 1)


def _hash64(s: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(s.encode(), digest_size=8).digest(), "little"
    )


#: process-stable per-task memo of word -> blake2b-64 (the text vocabulary
#: is tiny relative to the token stream; same trick as SimHasher)
_WORD_CACHE: dict[str, int] = {}


def _word_hash_arr(words: list[str]) -> np.ndarray:
    c = _WORD_CACHE
    out = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        h = c.get(w)
        if h is None:
            h = _hash64(w)
            c[w] = h
        out[i] = h
    if len(c) > 2_000_000:  # bound task memory on adversarial vocabularies
        c.clear()
    return out


def _shingle_hashes(text: str, k: int, unique: bool = True) -> np.ndarray:
    """Word k-gram shingles -> uint64 hashes. Docs shorter than k words
    have no shingles (excluded from near-dup, both here and in oracles).

    Vectorized: blake2b only per UNIQUE word (memoized), then a k-step
    FNV-style mixing combine over shifted hash windows — no per-shingle
    digest calls. The mix is order-sensitive within the window, so
    "a b c" != "c b a"; identical shingles collide by construction and
    distinct ones at ~2^-64 (only risk: an off-by-one in Jaccard).
    unique=False keeps every occurrence in position order (for
    occurrence-counting callers like the repetition filter)."""
    w = text.split()
    if len(w) < k:
        return np.empty(0, dtype=np.uint64)
    wh = _word_hash_arr(w)
    n = wh.size
    with np.errstate(over="ignore"):  # mod-2^64 wraparound intended
        h = np.full(n - k + 1, 0x9E3779B97F4A7C15, dtype=np.uint64)
        for j in range(k):  # k is small (3); windows vectorized
            h = (h ^ wh[j : n - k + 1 + j]) * np.uint64(0x100000001B3)
            h ^= h >> np.uint64(31)
    return np.unique(h) if unique else h


def _triu_by_runs(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Global (ia, ib) index pairs for ALL within-group unordered pairs of
    an array laid out as consecutive runs of sizes `m` — the vectorized
    replacement for a per-group np.triu_indices loop. Element at local
    index i of a run pairs with the (m-1-i) elements after it; runs of
    size 1 emit nothing. O(total pairs) with no Python per-group loop."""
    total = int(m.sum())
    gstart = np.cumsum(m) - m
    local = np.arange(total) - np.repeat(gstart, m)
    rep = np.repeat(m, m) - 1 - local
    ia = np.repeat(np.arange(total), rep)
    runstart = np.cumsum(rep) - rep
    ib = np.arange(ia.size) - np.repeat(runstart, rep) + ia + 1
    return ia, ib


# --- exact dedup ------------------------------------------------------------


class ContentHasher:
    """Adds `content_hash` = md5(text) — the exact-dup key."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["content_hash"] = batch["text"].map(
            lambda t: hashlib.md5(t.encode()).hexdigest()
        )
        return batch


def exact_dedup(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    batch_size: int = 4096,
    num_parts: int = 32,
    payload_cols: list[str] | None = None,
) -> rd.Dataset:
    """Keep the first (min id) row per identical text.

    Shape: per-batch combiner (local keep-first) -> hash-partition the
    survivors on content_hash into `num_parts` int buckets -> per-bucket
    keep-first inside ONE group task per bucket. All rows of one hash land
    in one bucket, so the per-bucket drop_duplicates is a global dedup —
    same answer as a per-hash group, without one map_groups task per
    distinct hash (the many-tiny-group pitfall; was ~6s for 5k docs, now
    bounded by num_parts tasks). Size num_parts to the cluster.

    payload_cols: the columns (besides id_col + content_hash) to CARRY
    THROUGH the exchange. None = all input columns (the library
    contract: surviving rows come back whole). At 100 TB the default
    ships the corpus text through a sort exchange for callers that only
    consume the dedup DECISION — pass [] (ids + hashes only, ~48 B/row)
    or the few feature columns the downstream stage needs, computed
    BEFORE the dedup so text never enters the shuffle. The keep-first
    winner's payload is its own row's values either way, so slimming
    never changes results, only exchange bytes."""

    def local_first(batch: pd.DataFrame) -> pd.DataFrame:
        batch = ContentHasher()(batch)
        batch = batch.sort_values(id_col).drop_duplicates(
            "content_hash", keep="first"
        )
        if payload_cols is not None:
            batch = batch[[id_col, "content_hash", *payload_cols]]
        # deterministic bucket from the hash's own hex prefix
        batch["_part"] = (
            batch["content_hash"].str.slice(0, 8)
            .apply(lambda s: int(s, 16) % num_parts)
            .astype("int64")
        )
        return batch

    def part_first(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(id_col)
            .drop_duplicates("content_hash", keep="first")
            .drop(columns=["_part"])
        )

    return (
        ds.map_batches(local_first, batch_format="pandas",
                       batch_size=batch_size)
        .sort("_part")
        .map_batches(per_group(part_first, "_part"),
                     batch_size=None, batch_format="pyarrow")
    )


# --- MinHash + LSH ----------------------------------------------------------


class MinHasher:
    """MinHash signatures over word-k-gram shingles.

    Hash family a_i*x + b_i mod 2^61-1 with seeded coefficients built at
    construction; __call__ signs a whole batch in cache-sized chunks
    (see its docstring), signature() is the one-doc reference path."""

    def __init__(self, k: int = 3, num_hashes: int = 128, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.k = k
        self.a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.uint64)
        self.num_hashes = num_hashes

    def signature(self, text: str) -> np.ndarray | None:
        sh = _shingle_hashes(text, self.k)
        if sh.size == 0:
            return None
        # (H, S) universal hashing in uint64 mod-Mersenne arithmetic
        prod = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return prod.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Batch-vectorized signatures: hash the batch's concatenated
        shingles in (H, ~2048)-shingle chunks + per-doc minimum.reduceat —
        identical values to per-doc signature(), 4x faster. The chunk
        budget keeps the H x S scratch ~2 MB (cache-resident); measured
        on this host a whole-batch (H, 260k) scratch is 25x SLOWER than
        per-doc — three ~266 MB temporaries per op turn the kernel
        memory-bound (and fault-bound on ballooned VMs)."""
        shs = batch["text"].map(lambda t: _shingle_hashes(t, self.k))
        lens = shs.map(len).to_numpy(dtype=np.int64)
        keep = lens > 0
        out = batch.loc[keep, ["doc_id"]].copy()
        lens = lens[keep]
        if lens.size == 0:
            out["sig"] = pd.Series([], dtype="object")
            return out
        flat = np.concatenate(list(shs[keep]))
        offsets = np.cumsum(lens) - lens
        ends = offsets + lens
        sigs = np.empty((lens.size, self.num_hashes), dtype=np.uint64)
        target = max(2048, int(lens.max()))  # shingles per chunk
        i0 = 0
        while i0 < lens.size:
            i1 = int(np.searchsorted(ends, offsets[i0] + target, "left")) + 1
            i1 = min(max(i1, i0 + 1), lens.size)
            s0, s1 = offsets[i0], ends[i1 - 1]
            prod = (
                self.a[:, None] * flat[None, s0:s1] + self.b[:, None]
            ) % _MERSENNE
            sigs[i0:i1] = np.minimum.reduceat(
                prod, offsets[i0:i1] - s0, axis=1
            ).T
            i0 = i1
        out["sig"] = list(sigs)
        return out


class BandExploder:
    """Signature -> one row per LSH band: (band, band_hash, doc_id).

    Fully vectorized: the batch's signatures stack to an (N, bands, rows)
    uint64 cube and each band chunk is reduced with a splitmix-style mixing
    hash (equal chunks => equal hash; distinct chunks collide at ~2^-63 —
    collisions only cost a wasted verify, never a wrong answer). The prior
    per-doc-per-band blake2b loop was the hot spot of the LSH path."""

    def __init__(self, bands: int = 32, rows: int = 4):
        self.bands = bands
        self.rows = rows

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        if n == 0:
            return pd.DataFrame(
                {"band": pd.Series([], dtype="int64"),
                 "band_hash": pd.Series([], dtype="int64"),
                 "doc_id": pd.Series([], dtype="int64")}
            )
        sig = np.asarray(batch["sig"].tolist(), dtype=np.uint64)
        sig = sig.reshape(n, self.bands, self.rows)
        h = np.full((n, self.bands), 0x9E3779B97F4A7C15, dtype=np.uint64)
        with np.errstate(over="ignore"):  # mod-2^64 wraparound intended
            for r in range(self.rows):  # rows is small (4); cols vectorized
                h = (h ^ sig[:, :, r]) * np.uint64(0xBF58476D1CE4E5B9)
                h ^= h >> np.uint64(29)
        return pd.DataFrame(
            {
                "band": np.tile(
                    np.arange(self.bands, dtype=np.int64), n
                ),
                "band_hash": (h >> np.uint64(1)).astype(np.int64).ravel(),
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), self.bands),
            }
        )


def _bucket_pairs(g: pd.DataFrame, max_bucket: int = 200) -> pd.DataFrame:
    """Candidate pairs for every (band, band_hash) bucket within one hash
    partition of buckets. The group key is a SMALL int partition (bucket
    hash % P), not the bucket itself — one task emits all its buckets'
    pairs with one vectorized _triu_by_runs construction instead of one
    Ray group per bucket (many-tiny-group pitfall) or a Python loop over
    buckets. Buckets larger than max_bucket are truncated — a degenerate
    bucket would otherwise emit O(n^2) pairs."""
    empty = pd.DataFrame(
        {"doc_a": pd.Series([], dtype="int64"),
         "doc_b": pd.Series([], dtype="int64")}
    )
    if g.empty:
        return empty
    band = g["band"].to_numpy()
    bh = g["band_hash"].to_numpy()
    d = g["doc_id"].to_numpy()
    order = np.lexsort((d, bh, band))
    band, bh, d = band[order], bh[order], d[order]
    # unique doc ids within each bucket (duplicated doc rows would
    # otherwise self-pair), then truncate each bucket to max_bucket
    first = np.empty(d.size, dtype=bool)
    first[0] = True
    first[1:] = (
        (band[1:] != band[:-1]) | (bh[1:] != bh[:-1]) | (d[1:] != d[:-1])
    )
    band, bh, d = band[first], bh[first], d[first]
    bstart = np.empty(d.size, dtype=bool)
    bstart[0] = True
    bstart[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
    idx = np.flatnonzero(bstart)
    runs = np.diff(np.append(idx, d.size))
    local = np.arange(d.size) - np.repeat(idx, runs)
    keep = local < max_bucket
    d = d[keep]
    m = np.minimum(runs, max_bucket)
    ia, ib = _triu_by_runs(m)
    if ia.size == 0:
        return empty
    return pd.DataFrame({"doc_a": d[ia], "doc_b": d[ib]})


def dedup_pair_rows(
    pairs: rd.Dataset,
    cols: tuple[str, str] = ("doc_a", "doc_b"),
    num_parts: int = 16,
) -> rd.Dataset:
    """Distinct (doc_a, doc_b) rows via hash-partition + per-part
    drop_duplicates — NOT one map_groups group per pair (many-tiny-group
    pitfall). Local combiner first, then num_parts group tasks."""
    ca, cb = cols

    def route(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.drop_duplicates([ca, cb])
        h = pd.util.hash_pandas_object(batch[[ca, cb]], index=False)
        batch = batch.assign(
            _part=(h.to_numpy() % num_parts).astype(np.int64)
        )
        return batch

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates([ca, cb]).drop(columns=["_part"])

    # batch_size on route also COALESCES upstream blocks: pair producers
    # are usually groupby outputs (~200 mostly-empty blocks, the measured
    # Sort-task-per-block pitfall in BASELINE.md)
    return (
        pairs.map_batches(route, batch_format="pandas", batch_size=65536)
        .sort("_part")
        .map_batches(per_group(uniq, "_part"),
                     batch_size=None, batch_format="pyarrow")
    )


def minhash_lsh_candidates(
    docs: rd.Dataset,
    k: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    rows: int = 4,
    distinct: bool = True,
) -> rd.Dataset:
    """docs(text, doc_id) -> candidate pairs (doc_a < doc_b).

    distinct=False skips the pair-dedup exchange (a pair matching in many
    bands appears once per matching band) — callers that already dedup
    downstream (verify_jaccard's first attach) save a full shuffle."""
    assert bands * rows == num_hashes
    # cheap per-call state (seeded coefficients) => task-based map_batches.
    # Actor pools here would RESERVE CPUs per stage; two chained pools can
    # starve the read/shuffle tasks and stall the streaming executor.
    mh = MinHasher(k=k, num_hashes=num_hashes)
    be = BandExploder(bands=bands, rows=rows)
    num_parts = 16
    sig = docs.map_batches(mh.__call__, batch_format="pandas")

    def explode_and_route(batch: pd.DataFrame) -> pd.DataFrame:
        b = be(batch)
        # exchange on a small int partition of buckets, never per bucket
        b["_part"] = (
            b["band_hash"].to_numpy().astype(np.uint64) % num_parts
        ).astype(np.int64)
        return b

    band_rows = sig.map_batches(explode_and_route, batch_format="pandas")
    pairs = band_rows.sort("_part").map_batches(
        per_group(_bucket_pairs, "_part"),
        batch_size=None, batch_format="pyarrow",
    )
    if not distinct:
        return pairs
    # distinct pairs (a pair can match in many bands)
    return dedup_pair_rows(pairs)


_SH_TYPE = pa.list_(pa.int64())


def _attach_shingles(
    pair_rows: rd.Dataset,
    shingles: rd.Dataset,
    side: str,
    out_col: str,
    carry: tuple[str, ...],
    num_parts: int,
    id_col: str = "doc_id",
    dedup_pairs: bool = False,
) -> rd.Dataset:
    """Distributed hash join of pair rows with per-doc shingle lists on
    `side`, built from union + single-int-key groupby (Ray's native hash
    join rejects list-typed payload columns). Both inputs route to
    part = doc id % num_parts with IDENTICAL Arrow schemas (explicitly
    typed nulls for the absent columns), so the union concatenates
    cleanly; one group task per part builds the doc->shingles lookup and
    emits its pairs. Pairs whose doc has no shingle row are dropped
    (inner-join semantics; matches the old 0.0-Jaccard filter)."""

    def route_p(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            "_part": pa.array(
                t.column(side).to_numpy() % num_parts, pa.int64()
            ),
            "_id": t.column(side).combine_chunks().cast(pa.int64()),
            "_is_sh": pa.array(np.zeros(n, dtype=np.int8)),
            "doc_a": t.column("doc_a").combine_chunks().cast(pa.int64()),
            "doc_b": t.column("doc_b").combine_chunks().cast(pa.int64()),
            "_sh": pa.nulls(n, _SH_TYPE),
        }
        for c in carry:
            cols[c] = t.column(c).combine_chunks().cast(_SH_TYPE)
        return pa.table(cols)

    def route_s(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            "_part": pa.array(
                t.column(id_col).to_numpy() % num_parts, pa.int64()
            ),
            "_id": t.column(id_col).combine_chunks().cast(pa.int64()),
            # explicit side marker — an in-band doc_a=-1 sentinel would
            # misclassify pairs over a legal negative id space
            "_is_sh": pa.array(np.ones(n, dtype=np.int8)),
            "doc_a": pa.array(np.zeros(n, dtype=np.int64)),
            "doc_b": pa.array(np.zeros(n, dtype=np.int64)),
            "_sh": t.column("sh").combine_chunks().cast(_SH_TYPE),
        }
        for c in carry:
            cols[c] = pa.nulls(n, _SH_TYPE)
        return pa.table(cols)

    unioned = pair_rows.map_batches(
        route_p, batch_format="pyarrow", batch_size=65536
    ).union(
        shingles.map_batches(
            route_s, batch_format="pyarrow", batch_size=65536
        )
    )

    def attach(g: pd.DataFrame) -> pa.Table:
        # output is explicitly-typed Arrow: a pandas list column would be
        # re-inferred as Ray's variable-shaped-tensor extension type, which
        # the next round's cast to list<int64> rejects
        is_sh = g["_is_sh"].to_numpy() == 1
        sh = g.loc[is_sh, ["_id", "_sh"]]
        m = g.loc[~is_sh].drop(columns=["_sh"])
        if dedup_pairs:
            # every copy of a pair shares `side`, hence this partition —
            # the in-group distinct is global, saving a dedicated
            # dedup exchange upstream
            m = m.drop_duplicates(["doc_a", "doc_b"])
        # vectorized hash join; inner drops pairs whose doc has no shingles
        m = m.merge(sh, on="_id", how="inner")
        cols = {
            "doc_a": pa.array(m["doc_a"].to_numpy(), pa.int64()),
            "doc_b": pa.array(m["doc_b"].to_numpy(), pa.int64()),
        }
        for c in carry:
            cols[c] = pa.array(m[c].to_list(), _SH_TYPE)
        cols[out_col] = pa.array(m["_sh"].to_list(), _SH_TYPE)
        return pa.table(cols)

    return unioned.sort("_part").map_batches(per_group(attach, "_part"), batch_size=None, batch_format="pyarrow")


def verify_jaccard(
    pairs: rd.Dataset,
    docs: rd.Dataset,
    threshold: float,
    k: int = 3,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Exact word-k-gram Jaccard on candidate pairs — DISTRIBUTED.

    Co-partitions pairs and docs by doc id via two hash joins
    (pairs ⋈ shingles on doc_a, then on doc_b); the shingle sets travel
    inside the shuffled blocks, never through the driver. A doc that
    matches no pair is dropped by the join's build side — the semi-join
    falls out for free. Docs too short to shingle produce no shingle row,
    so their pairs drop at the join (same as a 0.0 Jaccard before).
    An empty pair set flows through as typed empty blocks.

    pairs is materialized first: it is tiny (the LSH output), and cutting
    the candidate lineage (two shuffles) out of the verify execution keeps
    each execution to at most two exchange barriers — chaining all four
    into one streaming graph measured ~2x slower."""
    pairs = pairs.materialize()

    def shingles_of(batch: pd.DataFrame) -> pd.DataFrame:
        # lists, not ndarrays: Ray's block size estimator chokes on
        # object columns of numpy arrays (noisy vectorize warnings).
        # >>1 keeps values int64-safe (the join shuffle casts to the
        # unified block type); 63-bit equality is all Jaccard needs.
        sh = batch["text"].map(
            lambda t: np.unique(
                (_shingle_hashes(t, k) >> np.uint64(1)).astype(np.int64)
            ).tolist()
        )
        keep = sh.map(len) > 0
        return pd.DataFrame(
            {id_col: batch.loc[keep, id_col], "sh": sh[keep]}
        )

    # materialize once: BOTH attach rounds consume this dataset, and an
    # unmaterialized Dataset re-executes its whole lineage per consumer
    # (double shingling of the corpus)
    shingles = docs.map_batches(
        shingles_of, batch_format="pandas"
    ).materialize()
    if num_partitions is None:
        # both inputs are materialized, so size_bytes() is metadata-free;
        # one group task holds ~1/num_partitions of EVERY doc's shingle
        # list (all docs route through the exchange, non-candidates drop
        # at the join) plus its pair rows — size by BYTES (shingle rows
        # are wide and variable) so a group frame targets ~256 MB instead
        # of pinning a constant a 100x corpus would overflow
        total = (shingles.size_bytes() or 0) + (pairs.size_bytes() or 0)
        num_partitions = int(max(8, min(256, total // (256 << 20) + 1)))
    j1 = _attach_shingles(
        pairs, shingles, side="doc_a", out_col="sh_a", carry=(),
        num_parts=num_partitions, id_col=id_col, dedup_pairs=True,
    )
    j2 = _attach_shingles(
        j1, shingles, side="doc_b", out_col="sh_b", carry=("sh_a",),
        num_parts=num_partitions, id_col=id_col,
    )

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        ja = np.empty(len(batch), dtype=np.float64)
        for i, (sa, sb) in enumerate(zip(batch["sh_a"], batch["sh_b"])):
            sa = np.asarray(sa, dtype=np.int64)
            sb = np.asarray(sb, dtype=np.int64)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            ja[i] = inter / (sa.size + sb.size - inter)
        out = pd.DataFrame(
            {
                "doc_a": batch["doc_a"].to_numpy(),
                "doc_b": batch["doc_b"].to_numpy(),
                "jaccard": ja,  # typed even for empty blocks
            }
        )
        return out[out["jaccard"] >= threshold]

    return j2.map_batches(score, batch_format="pandas", batch_size=65536)


def minhash_dedup_pairs(
    docs: rd.Dataset, threshold: float = 0.5, k: int = 3, **kw
) -> rd.Dataset:
    """End-to-end near-dup pairs: LSH candidates -> exact-Jaccard verify.
    Candidates skip their dedup exchange — verify's first attach dedups
    in the same shuffle it needs anyway."""
    cands = minhash_lsh_candidates(docs, k=k, distinct=False, **kw)
    return verify_jaccard(cands, docs, threshold, k=k)


def connected_components(pairs: pd.DataFrame) -> dict:
    """Union-find over verified near-dup pairs -> {doc_id: root}.

    Driver-side by design: the pair set is the LSH+verify output, which is
    tiny relative to the corpus (bounded by real near-dup density); at
    extreme densities switch to iterated min-label propagation via groupby
    rounds (same result, distributed)."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


@ray.remote
def _cc_route_block(t, num_parts: int):
    """Symmetrize one pair block and split it into per-part (u, v) edge
    arrays by u % num_parts (num_returns=num_parts fan-out — the
    SemDeDup shard-routing pattern). Blocks out of from_pandas datasets
    are pandas, parquet-read blocks are pa.Table — normalize; zero-row
    blocks can arrive column-less out of an exchange (CLAUDE.md
    invariant): no-op before touching columns."""
    if isinstance(t, pd.DataFrame):
        t = pa.Table.from_pandas(t, preserve_index=False)
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    if t.num_rows == 0:
        return [empty] * num_parts
    a = t.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
    b = t.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
    u = np.concatenate([a, b])
    v = np.concatenate([b, a])
    part = u % num_parts
    return [(u[m], v[m]) for m in (part == p for p in range(num_parts))]


@ray.remote
def _cc_build_part(*slices):
    """Concatenate one part's (u, v) slices from every routed block;
    emit (edges, initial labels) — nodes are this part's own-u
    universe, sorted (searchsorted lookups per round), labels start as
    the node ids themselves."""
    us = [s[0] for s in slices]
    u = np.concatenate(us) if us else np.empty(0, dtype=np.int64)
    vs = [s[1] for s in slices]
    v = np.concatenate(vs) if vs else np.empty(0, dtype=np.int64)
    nodes = np.unique(u)
    return (u, v, nodes), nodes.copy()


@ray.remote
def _cc_emit(part, labels, num_parts: int):
    """One propagation hop for one part: every edge (u, v) proposes
    label[u] to v, candidates routed by v % num_parts. Symmetric edges
    guarantee every candidate's target node exists in the receiving
    part's node universe."""
    u, v, nodes = part
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    if len(u) == 0:
        return [empty] * num_parts
    lu = labels[np.searchsorted(nodes, u)]
    part_v = v % num_parts
    return [(v[m], lu[m]) for m in (part_v == q for q in range(num_parts))]


@ray.remote
def _cc_combine(part, labels, *cands):
    """Min-combine the round's candidate labels into this part's label
    vector; second return is sum(labels) for the loop-safe convergence
    probe (labels are monotone non-increasing, bounded below by the
    component min)."""
    _, _, nodes = part
    new = labels.copy()
    for cn, cl in cands:
        if len(cn) == 0:
            continue
        np.minimum.at(new, np.searchsorted(nodes, cn), cl)
    return new, int(new.sum())


@ray.remote
def _cc_to_frame(part, labels) -> pd.DataFrame:
    _, _, nodes = part
    return pd.DataFrame(
        {"doc_id": nodes.astype(np.int64), "root": labels.astype(np.int64)}
    )


def connected_components_distributed(
    pairs: rd.Dataset,
    num_parts: int = 16,
    max_rounds: int = 25,
) -> rd.Dataset:
    """Min-label propagation over the pair graph — the DISTRIBUTED
    complement of `connected_components` for dup densities where even
    the pair set outgrows driver memory. Returns (doc_id, root) rows
    for every node that appears in a pair.

    Shape: ONE materialization of the pair set, then every round runs
    as plain tasks over cached object-store state (the measured
    kmeans/pca/pagerank pattern — re-launching the streaming executor
    per round cost ~0.6-1.2s/round regardless of data size; this
    rewrite took the sf0.1 profile query's CC from 4-11s to
    sub-second). Per round and per part: an emit task proposes
    label[u] to each edge's v (routed by v % num_parts via
    num_returns fan-out), a combine task min-merges candidates into
    its label shard. Labels are monotone non-increasing and bounded
    below by the component min, so sum(label) is a loop-safe
    convergence probe (one int per part per round to the driver).
    Rounds needed = graph diameter — near-dup components are shallow
    (near-cliques), so this converges in a handful of rounds;
    max_rounds guards degenerate chain graphs. Edge and label state
    lives in the object store; the driver holds only refs and the
    probe ints."""
    num_parts = max(2, int(num_parts))
    pairs = pairs.materialize()
    block_refs = [
        br
        for bundle in pairs.iter_internal_ref_bundles()
        for br in bundle.block_refs
    ]
    if not block_refs:
        return rd.from_pandas(
            pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "root": pd.Series([], dtype="int64")}
            )
        )
    P = num_parts
    sliced = [
        _cc_route_block.options(num_returns=P).remote(br, P)
        for br in block_refs
    ]
    built = [
        _cc_build_part.options(num_returns=2).remote(
            *[s[p] for s in sliced]
        )
        for p in range(P)
    ]
    parts = [b[0] for b in built]
    labels = [b[1] for b in built]
    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        cand = [
            _cc_emit.options(num_returns=P).remote(parts[p], labels[p], P)
            for p in range(P)
        ]
        outs = [
            _cc_combine.options(num_returns=2).remote(
                parts[q], labels[q], *[cand[p][q] for p in range(P)]
            )
            for q in range(P)
        ]
        labels = [o[0] for o in outs]
        s = sum(ray.get([o[1] for o in outs]))
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        import warnings

        # an unconverged run keeps >1 label inside one component — the
        # caller would keep extra dup members thinking they are roots
        warnings.warn(
            f"connected_components_distributed: not converged after "
            f"{max_rounds} rounds (graph diameter exceeds max_rounds); "
            f"labels may split components — raise max_rounds",
            RuntimeWarning,
        )
    return rd.from_pandas_refs(
        [_cc_to_frame.remote(parts[p], labels[p]) for p in range(P)]
    )


def drop_non_roots(
    ds: rd.Dataset, drop: set, id_col: str = "doc_id"
) -> rd.Dataset:
    """Filter out the non-root members of dup components: broadcast the
    drop set once (bounded by real dup density), stateless isin filter.
    The shared tail of every keep-first dedup (MinHash, cosine). An
    empty drop set returns the input unchanged — a dup-free corpus is
    the common case, not an error."""
    if not drop:
        return ds
    drop_ref = ray.put(drop)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        ds_ = ray.get(drop_ref)
        return batch[~batch[id_col].isin(ds_)]

    return ds.map_batches(keep, batch_format="pandas")


def drop_set_from_pairs(pairs: pd.DataFrame) -> set:
    """Union-find over a (doc_a, doc_b) pair frame -> the ids to drop
    (every component member except its min). A zero-pair frame — which
    Ray's to_pandas() may hand back WITHOUT columns — yields an empty
    set rather than a KeyError."""
    if pairs.empty or "doc_a" not in pairs.columns:
        return set()
    roots = connected_components(pairs)
    return {d for d, r in roots.items() if r != d}


def minhash_dedup_keep_first(
    docs: rd.Dataset,
    threshold: float = 0.5,
    k: int = 3,
    distributed_cc: bool | None = None,
    cc_pair_threshold: int = 1_000_000,
    **kw,
) -> rd.Dataset:
    """End-to-end near-dup REMOVAL: LSH candidates -> exact-Jaccard verify
    -> connected components -> keep the min-doc_id member of each dup
    group, drop the rest. Returns the surviving docs Dataset.

    distributed_cc selects the connected-components engine:
      None (default) — SIZE-SWITCH, the same metadata-derived discipline
        the joins use: the verified pairs are materialized once (object
        store, spillable — they feed CC anyway, so this also avoids
        re-running the LSH pipeline), and the driver union-find is used
        only while the pair count stays under `cc_pair_threshold`;
        past it the min-label propagation runs in the cluster. A 100-TB
        corpus never silently funnels its pair graph through the driver.
      True / False — force the respective path (tests, known shapes).
    """
    pairs_ds = minhash_dedup_pairs(docs, threshold=threshold, k=k, **kw)
    if distributed_cc is None:
        pairs_ds = pairs_ds.materialize()
        distributed_cc = pairs_ds.count() > cc_pair_threshold
    if distributed_cc:
        roots_ds = connected_components_distributed(pairs_ds)

        def non_roots(batch: pd.DataFrame) -> pd.DataFrame:
            b = batch[batch["doc_id"] != batch["root"]]
            return pd.DataFrame({"doc_id": b["doc_id"].astype("int64")})

        roots_df = roots_ds.map_batches(
            non_roots, batch_format="pandas"
        ).to_pandas()
        # zero components => column-less frame from Ray's to_pandas()
        drop = (set() if roots_df.empty or "doc_id" not in roots_df.columns
                else set(roots_df["doc_id"]))
        # NOTE: the drop set is (dup members - roots), bounded by real
        # dup density like the pairs; broadcast once. A corpus where even
        # THIS exceeds memory wants an anti-join on doc_id instead.
    else:
        drop = drop_set_from_pairs(pairs_ds.to_pandas())
    return drop_non_roots(docs, drop, id_col="doc_id")


# --- exact n-gram Jaccard (inverted index, no sketch) -----------------------


def ngram_jaccard_pairs(
    docs: rd.Dataset,
    threshold: float = 0.3,
    k: int = 3,
    num_parts: int = 16,
    pair_parts: int = 16,
    max_df: int | None = None,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """EXACT all-pairs word-k-gram Jaccard >= threshold — no sketching.

    The complete-recall complement to MinHash-LSH: LSH can miss a pair
    (probabilistically); this cannot. Classic inverted-index all-pairs
    shape (reference's scan-everything consistency pass is the analog,
    src/service/check_service.go; here it is three bounded exchanges):

      1. shingle per batch (vectorized, memoized word hashes) and explode
         to (shingle, doc, n_shingles) postings, routed by
         shingle % num_parts — each distinct shingle lands in exactly ONE
         partition, so per-partition co-occurrence counts sum to the
         exact intersection size;
      2. one task per shingle-partition: drop df==1 postings (most of
         the index; they cannot produce a pair), emit per-shingle pairs
         (triu of the posting list), pre-combine locally to
         (doc_a, doc_b, i_partial, na, nb);
      3. route partials by pair-hash % pair_parts, sum i, and score
         jaccard = i / (na + nb - i) — na/nb ride the postings so no
         fourth exchange is needed to attach sizes.

    Cost is sum(df^2) over shingles — exact by construction, quadratic
    in a shingle's document frequency. `max_df` (default None = exact)
    drops postings of shingles with df > max_df inside a partition:
    standard stop-shingle pruning for web-scale corpora where a boilerplate
    shingle would otherwise emit billions of pairs; it only LOWERS
    intersection counts (never invents a pair), so precision survives.
    Docs shorter than k words have no shingles and never pair (same
    convention as MinHash and the SQL oracles)."""

    def postings(batch: pd.DataFrame) -> pd.DataFrame:
        shs = batch["text"].map(
            lambda t: (_shingle_hashes(t, k) >> np.uint64(1)).astype(
                np.int64
            )
        )
        lens = shs.map(len).to_numpy(dtype=np.int64)
        keep = lens > 0
        shs, lens = shs[keep], lens[keep]
        ids = batch.loc[keep, id_col].to_numpy(dtype=np.int64)
        if lens.size == 0:
            return pd.DataFrame(
                {"shingle": pd.Series([], dtype="int64"),
                 "doc": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64"),
                 "_part": pd.Series([], dtype="int64")}
            )
        flat = np.concatenate(list(shs))
        return pd.DataFrame(
            {
                "shingle": flat,
                "doc": np.repeat(ids, lens),
                "n": np.repeat(lens, lens),
                "_part": (
                    flat.astype(np.uint64) % np.uint64(num_parts)
                ).astype(np.int64),
            }
        )

    def _pair_route(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        # deterministic pair -> partition hash (splitmix-style mix so
        # sequential ids don't all land in one bucket); internal routing
        # only — both sides of a pair always agree
        h = a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        h = (h + b.astype(np.uint64)) * np.uint64(0xBF58476D1CE4E5B9)
        return ((h >> np.uint64(33)) % np.uint64(pair_parts)).astype(
            np.int64
        )

    def _pair_boundaries(a: np.ndarray, b: np.ndarray):
        # rows sorted by (a, b) -> index of each distinct pair's first
        # row + per-pair run length
        new = np.empty(a.size, dtype=bool)
        new[0] = True
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        idx = np.flatnonzero(new)
        runs = np.diff(np.append(idx, a.size)).astype(np.int64)
        return idx, runs

    _EMPTY_PAIRS = pd.DataFrame(
        {"doc_a": pd.Series([], dtype="int64"),
         "doc_b": pd.Series([], dtype="int64"),
         "i": pd.Series([], dtype="int64"),
         "na": pd.Series([], dtype="int64"),
         "nb": pd.Series([], dtype="int64"),
         "_ppart": pd.Series([], dtype="int64")}
    )

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return _EMPTY_PAIRS
        s = g["shingle"].to_numpy()
        d = g["doc"].to_numpy()
        n = g["n"].to_numpy()
        order = np.lexsort((d, s))  # doc-sorted within each shingle run
        s, d, n = s[order], d[order], n[order]
        _, counts = np.unique(s, return_counts=True)
        # df==1 shingles (the long tail of the index) cannot form a pair
        keep_g = counts >= 2
        if max_df is not None:
            keep_g &= counts <= max_df
        if not keep_g.any():
            return _EMPTY_PAIRS
        keepmask = np.repeat(keep_g, counts)
        d, n = d[keepmask], n[keepmask]
        m = counts[keep_g]
        # vectorized per-group triu: every shingle run's doc pairs in one
        # construction (shared with _bucket_pairs)
        ia, ib = _triu_by_runs(m)
        a, b, na, nb = d[ia], d[ib], n[ia], n[ib]
        # local pre-combine: one (pair, i_partial) row per pair per
        # partition — the cross-partition exchange moves combined rows,
        # not one row per co-occurring shingle
        o = np.lexsort((b, a))
        a, b, na, nb = a[o], b[o], na[o], nb[o]
        idx, runs = _pair_boundaries(a, b)
        a, b, na, nb = a[idx], b[idx], na[idx], nb[idx]
        return pd.DataFrame(
            {"doc_a": a, "doc_b": b, "i": runs, "na": na, "nb": nb,
             "_ppart": _pair_route(a, b)}
        )

    def score(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return _EMPTY_PAIRS[["doc_a", "doc_b"]].assign(
                jaccard=pd.Series([], dtype="float64")
            )
        a = g["doc_a"].to_numpy()
        b = g["doc_b"].to_numpy()
        o = np.lexsort((b, a))
        a, b = a[o], b[o]
        i_sorted = g["i"].to_numpy()[o]
        idx, _ = _pair_boundaries(a, b)
        i = np.add.reduceat(i_sorted, idx)
        a, b = a[idx], b[idx]
        na = g["na"].to_numpy()[o][idx]
        nb = g["nb"].to_numpy()[o][idx]
        ja = i / (na + nb - i)
        keep = ja >= threshold
        return pd.DataFrame(
            {"doc_a": a[keep].astype(np.int64),
             "doc_b": b[keep].astype(np.int64),
             "jaccard": ja[keep].astype(np.float64)}
        )

    return (
        docs.map_batches(postings, batch_format="pandas", batch_size=4096)
        .sort("_part")
        .map_batches(per_group(part_pairs, "_part"),
                     batch_size=None, batch_format="pyarrow")
        # coalesce the shuffle's ~200 mostly-empty output blocks before
        # the second exchange (each block otherwise costs one Sort task —
        # the measured pitfall in BASELINE.md; same fix as MinHash)
        .map_batches(lambda b: b, batch_format="pyarrow", batch_size=65536)
        .sort("_ppart")
        .map_batches(per_group(score, "_ppart"),
                     batch_size=None, batch_format="pyarrow")
    )


def ngram_jaccard_dedup_keep_first(
    docs: rd.Dataset,
    threshold: float = 0.3,
    k: int = 3,
    id_col: str = "doc_id",
    **kw,
) -> rd.Dataset:
    """Near-dup REMOVAL on the exact inverted-index pair graph: complete
    recall (no sketch), components keep-first. The guaranteed-complete
    complement of minhash_dedup_keep_first for thresholds below LSH's
    recall floor."""
    pairs = ngram_jaccard_pairs(
        docs, threshold=threshold, k=k, id_col=id_col, **kw
    ).to_pandas()
    return drop_non_roots(docs, drop_set_from_pairs(pairs), id_col=id_col)


# --- SimHash ----------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word hashes (count-weighted sign sum).

    Batch-vectorized: all docs' words flatten to one hash array (per-word
    blake2b memoized in the shared process-level _WORD_CACHE — the
    natural-text vocabulary is tiny relative to the token stream), the ±1
    bit contributions expand once, and per-doc sums come from one
    np.add.reduceat over doc boundaries. Count-weighting falls out of
    summing every occurrence. Identical signatures to the original
    per-doc implementation (pinned by the sf0.01 fixture oracle)."""

    #: cap the flattened words-per-chunk so the (words x 64) expansion
    #: stays ~tens of MB regardless of batch shape
    _CHUNK_WORDS = 1 << 20

    def _word_hashes(self, words: list[str]) -> np.ndarray:
        return _word_hash_arr(words)  # shared memo with the shingle path

    def _pack(self, vals: np.ndarray, lens: np.ndarray) -> np.ndarray:
        """(flat word hashes, words-per-doc) -> per-doc simhash uint64.
        Empty docs hash to 0 and are excluded up front (np.add.reduceat
        misreads zero-length runs)."""
        sig = np.zeros(lens.size, dtype=np.uint64)
        nz = np.flatnonzero(lens)
        if nz.size == 0:
            return sig
        lens_nz = lens[nz]
        starts = np.concatenate([[0], np.cumsum(lens_nz)[:-1]])
        shifts = np.arange(64, dtype=np.uint64)
        acc = np.zeros((nz.size, 64), dtype=np.int64)
        lo = 0
        while lo < nz.size:
            w0 = starts[lo]
            hi = lo + 1
            while (
                hi < nz.size
                and starts[hi] + lens_nz[hi] - w0 <= self._CHUNK_WORDS
            ):
                hi += 1
            w1 = starts[hi - 1] + lens_nz[hi - 1]
            chunk = vals[w0:w1]
            # bit-expand once per UNIQUE hash (natural-text vocabulary is
            # tiny), then gather int8 rows — the naive per-word expansion
            # materializes a (words, 64) uint64 scratch 8x this size
            uniq, inv = np.unique(chunk, return_inverse=True)
            table = (
                ((uniq[:, None] >> shifts) & np.uint64(1)).astype(np.int8)
                * 2 - 1
            )
            acc[lo:hi] = np.add.reduceat(
                table[inv], starts[lo:hi] - w0, axis=0, dtype=np.int32
            )
            lo = hi
        sig[nz] = np.bitwise_or.reduce(
            (acc > 0).astype(np.uint64) << shifts[None, :], axis=1
        )
        return sig

    def signature(self, text: str) -> int:
        words = text.split()
        if not words:
            return 0
        return int(
            self._pack(
                self._word_hashes(words),
                np.array([len(words)], dtype=np.int64),
            )[0]
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        word_lists = [t.split() for t in batch["text"]]
        lens = np.fromiter(
            (len(w) for w in word_lists), dtype=np.int64,
            count=len(word_lists),
        )
        flat = [w for ws in word_lists for w in ws]
        batch["simhash"] = self._pack(self._word_hashes(flat), lens)
        return batch


def simhash_dup_pairs(
    docs: rd.Dataset,
    max_hamming: int = 3,
    concurrency: int | None = None,
    max_bucket: int | None = 2000,
) -> rd.Dataset:
    """Near-dup pairs by SimHash: 4x16-bit band buckets -> exact Hamming.
    Same exchange shape as MinHash-LSH: explode vectorized, route buckets
    into a small int partition, pair up inside one task per partition.
    With max_hamming <= 3 the 4-band split is COMPLETE (pigeonhole: 3
    flipped bits leave >= 1 band untouched) — unless `max_bucket`
    truncates a degenerate bucket (boilerplate-heavy corpora); pass
    max_bucket=None for guaranteed-complete output (cost grows with the
    largest bucket's pair count, vectorized xor+popcount per bucket)."""
    num_parts = 16
    # bound-method task stage: SimHasher state is a compiled constant
    # (word memo is module-level), so an actor pool would only add its
    # per-execution startup; concurrency is honored if a caller insists
    sigs = (
        docs.map_batches(
            SimHasher, batch_format="pandas", concurrency=concurrency
        )
        if concurrency
        else docs.map_batches(SimHasher().__call__, batch_format="pandas")
    ).select_columns(["doc_id", "simhash"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        s = batch["simhash"].to_numpy().astype(np.uint64)
        bh = np.stack(
            [(s >> np.uint64(16 * b)) & np.uint64(0xFFFF) for b in range(4)],
            axis=1,
        )  # (n, 4)
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(4, dtype=np.int64), n),
                "band_hash": bh.astype(np.int64).ravel(),
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), 4),
                "simhash": np.repeat(s, 4),
                "_part": (
                    (bh.ravel() * np.uint64(4) + np.tile(
                        np.arange(4, dtype=np.uint64), n))
                    % np.uint64(num_parts)
                ).astype(np.int64),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_h = [], [], []
        for _, sub in g.groupby(["band", "band_hash"], sort=False):
            sub = sub.drop_duplicates("doc_id").sort_values("doc_id")
            if max_bucket is not None:
                sub = sub.head(max_bucket)
            n = len(sub)
            if n < 2:
                continue
            ids = sub["doc_id"].to_numpy(dtype=np.int64)
            sig = sub["simhash"].to_numpy().astype(np.uint64)
            ia, ib = np.triu_indices(n, k=1)
            x = sig[ia] ^ sig[ib]
            # vectorized popcount: uint64 -> 8 bytes -> unpacked bits
            ham = np.unpackbits(
                x.view(np.uint8).reshape(x.size, 8), axis=1
            ).sum(axis=1)
            keep = ham <= max_hamming
            out_a.append(ids[ia[keep]])
            out_b.append(ids[ib[keep]])
            out_h.append(ham[keep].astype(np.int64))
        if not out_a:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64"),
                 "hamming": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a),
             "doc_b": np.concatenate(out_b),
             "hamming": np.concatenate(out_h).astype("int64")}
        )

    cand = (
        sigs.map_batches(explode, batch_format="pandas", batch_size=65536)
        .sort("_part")
        .map_batches(per_group(pairs, "_part"),
                     batch_size=None, batch_format="pyarrow")
    )
    return dedup_pair_rows(cand)


def duplicated_ngram_spans(
    docs: rd.Dataset,
    n: int = 8,
    k: int = 100,
    num_parts: int = 16,
) -> pd.DataFrame:
    """Exact duplicated-span detection: every n-word window that occurs
    more than once in the corpus (the question suffix-array substring
    dedup answers — Lee et al. 2022's ExactSubstr — asked at fixed
    window length so it distributes as a grouped count instead of a
    global suffix sort).

    Per batch: explode words, build each doc's n-word windows with ONE
    vectorized shifted-concat over the flattened word stream (windows
    crossing a doc boundary are masked out), then pre-combine per span.
    Each document is exactly one input row, so its windows live in
    exactly one batch — per-batch n_docs/first_doc partials are over
    DISJOINT doc sets and merge by plain sum/min. Spans hash-partition
    into num_parts int buckets (never one group per span); per-part
    tasks sum, filter to n_occurrences > 1, and keep a local top-k, so
    the driver merges <= num_parts*k rows. At 100 TB the span strings
    themselves are the payload (~n x corpus inflation before the
    combiner); production would roll 64-bit window hashes here and
    re-verify the survivors — the exchange shape is identical.

    Returns the top-k duplicated spans as a pandas DataFrame
    (span, n_occurrences, n_docs, first_doc), ties broken
    (n_occurrences DESC, span ASC) — stated identically in the oracle.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"span": pd.Series([], dtype="object"),
             "n_occurrences": pd.Series([], dtype="int64"),
             "n_docs": pd.Series([], dtype="int64"),
             "first_doc": pd.Series([], dtype="int64"),
             "_part": pd.Series([], dtype="int64")}
        )
        if not len(batch):
            return empty
        words = [t.split() for t in batch["text"]]
        lens = np.array([len(w) for w in words], dtype=np.int64)
        flat = np.array(
            [w for lst in words for w in lst], dtype=object
        )
        doc_rep = np.repeat(batch["doc_id"].to_numpy(np.int64), lens)
        m = len(flat) - n + 1
        if m <= 0:
            return empty
        span = flat[:m]
        for j in range(1, n):
            span = span + " "  # elementwise on object arrays
            span = span + flat[j:j + m]
        valid = doc_rep[:m] == doc_rep[n - 1:n - 1 + m]
        df = pd.DataFrame(
            {"span": span[valid], "doc_id": doc_rep[:m][valid]}
        )
        if not len(df):
            return empty
        g = (
            df.groupby("span", sort=False)
            .agg(
                n_occurrences=("doc_id", "size"),
                n_docs=("doc_id", "nunique"),
                first_doc=("doc_id", "min"),
            )
            .reset_index()
        )
        for c in ("n_occurrences", "n_docs", "first_doc"):
            g[c] = g[c].astype("int64")
        g["_part"] = (
            pd.util.hash_pandas_object(g["span"], index=False)
            .to_numpy() % num_parts
        ).astype(np.int64)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("span", sort=False)
            .agg(
                n_occurrences=("n_occurrences", "sum"),
                n_docs=("n_docs", "sum"),
                first_doc=("first_doc", "min"),
            )
            .reset_index()
        )
        out = out[out["n_occurrences"] > 1]
        for c in ("n_occurrences", "n_docs", "first_doc"):
            out[c] = out[c].astype("int64")
        return out.sort_values(
            ["n_occurrences", "span"], ascending=[False, True]
        ).head(k)

    cand = (
        docs.map_batches(partial, batch_format="pandas")
        .sort("_part")
        .map_batches(per_group(combine, "_part"),
                     batch_size=None, batch_format="pyarrow")
        .to_pandas()  # <= num_parts * k rows by construction
    )
    return (
        cand.sort_values(
            ["n_occurrences", "span"], ascending=[False, True]
        )
        .head(k)
        .reset_index(drop=True)
    )


# --- benchmark decontamination ----------------------------------------------


def decontaminate(
    docs: rd.Dataset,
    benchmark: rd.Dataset,
    k: int = 8,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Remove every doc sharing ANY word-k-gram with a benchmark corpus —
    test-set decontamination, the standard pre-training hygiene step
    (the n-gram-overlap method of GPT-3 appendix C / PaLM; window
    machinery shared with duplicated_ngram_spans).

    Shape: the benchmark is the SMALL side by contract (eval suites are
    MBs; the corpus is the 100-TB side). Its distinct shingle hashes
    reduce per batch (bounded partial rows), union once on the driver,
    broadcast via ray.put; the corpus then filters STATELESSLY — no
    shuffle, no driver pass over the big side, resumable per block.
    Docs shorter than k words have no k-grams and are never contaminated
    (same convention as the SQL oracle). Hash membership stands in for
    string membership at the usual 2^-64 collision tolerance."""

    def bench_partial(batch: pd.DataFrame) -> pd.DataFrame:
        hs = [_shingle_hashes(t, k) for t in batch["text"]]
        u = (
            np.unique(np.concatenate(hs))
            if hs else np.empty(0, dtype=np.uint64)
        )
        return pd.DataFrame({"sh": u})

    parts = benchmark.map_batches(
        bench_partial, batch_format="pandas", batch_size=65536
    ).to_pandas()
    contaminated = np.unique(parts["sh"].to_numpy().astype(np.uint64)) \
        if len(parts) else np.empty(0, dtype=np.uint64)
    set_ref = ray.put(contaminated)  # sorted -> np.isin merge path

    def clean(batch: pd.DataFrame) -> pd.DataFrame:
        bad = ray.get(set_ref)
        if not len(batch):
            return batch
        hs = [_shingle_hashes(t, k) for t in batch["text"]]
        lens = np.array([h.size for h in hs], dtype=np.int64)
        keep = np.ones(len(batch), dtype=bool)
        nz = np.flatnonzero(lens)
        if nz.size and bad.size:
            flat = np.concatenate([hs[i] for i in nz])
            hit = np.isin(flat, bad)
            starts = np.cumsum(lens[nz]) - lens[nz]
            # a doc is contaminated iff ANY of its shingles hits
            keep[nz] = np.add.reduceat(hit, starts) == 0
        return batch[keep]

    return docs.map_batches(clean, batch_format="pandas", batch_size=4096)


def repetition_stats(
    docs: rd.Dataset,
    n: int = 2,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Per-doc duplicate-n-gram accounting — the Gopher/C4 repetition
    quality rule, kept integer-exact so thresholds compare as BIGINT
    arithmetic on both engines: a doc is repetitious when
    (n_ngrams - n_distinct) * 1000 > threshold_millis * n_ngrams.
    Stateless per-batch map; emits (doc_id, n_ngrams, n_distinct) for
    docs with at least one n-gram."""

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        hs = [_shingle_hashes(t, n, unique=False) for t in batch["text"]]
        total = np.array([h.size for h in hs], dtype=np.int64)
        distinct = np.array(
            [np.unique(h).size for h in hs], dtype=np.int64
        )
        keep = total > 0
        return pd.DataFrame(
            {
                "doc_id": batch[id_col].to_numpy()[keep].astype(np.int64),
                "n_ngrams": total[keep],
                "n_distinct": distinct[keep],
            }
        )

    return docs.map_batches(stats, batch_format="pandas", batch_size=4096)


def line_dedup_rewrite(
    docs: rd.Dataset,
    chunk_words: int = 8,
    num_parts: int = 32,
    batch_size: int = 4096,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """C4/RefinedWeb-style duplicated-line removal with text REWRITE:
    split each doc into consecutive `chunk_words`-word lines, keep only
    the globally FIRST occurrence (min (doc_id, idx)) of each line, and
    reassemble every doc from its kept lines — the cross-document
    "remove duplicated lines, keeping one copy" prep rule (C4 does this
    at newline granularity, src: arXiv 1910.10683 §2.2; the synthetic
    corpus has no newlines so lines are fixed word windows).

    Unlike the keep-first dedup family this REWRITES content rather than
    dropping whole docs, so the pipeline round-trips: two fixed-int
    exchanges — (1) line-hash bucket -> keep-first per md5(line) (the
    md5 is ALSO the group identity in the SQL oracle, so a collision
    cannot diverge the check), (2) doc bucket -> kept lines sorted by
    idx, space-joined. Docs whose every line duplicates an earlier one
    drop out entirely. Per-row split loop is intrinsic (ragged text),
    like the other text kernels; everything after the split is columnar.
    """

    def split_lines(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(dtype=np.int64)
        out_doc: list[int] = []
        out_idx: list[int] = []
        out_line: list[str] = []
        for d, t in zip(ids, batch["text"].tolist()):
            ws = t.split(" ")
            for i in range(0, len(ws), chunk_words):
                out_doc.append(int(d))
                out_idx.append(i // chunk_words)
                out_line.append(" ".join(ws[i : i + chunk_words]))
        h = [hashlib.md5(s.encode()).hexdigest() for s in out_line]
        part = np.fromiter(
            (int(x[:8], 16) % num_parts for x in h),
            dtype=np.int64, count=len(h),
        )
        return pd.DataFrame(
            {"_part": part, "h": h,
             "doc_id": np.array(out_doc, dtype=np.int64),
             "idx": np.array(out_idx, dtype=np.int64),
             "line": out_line}
        )

    def bucket_first(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:  # empty groups arrive COLUMN-LESS (CLAUDE.md)
            return pd.DataFrame(
                {"_dpart": pd.Series([], dtype="int64"),
                 "doc_id": pd.Series([], dtype="int64"),
                 "idx": pd.Series([], dtype="int64"),
                 "line": pd.Series([], dtype="object")}
            )
        k = g.sort_values(["doc_id", "idx"]).drop_duplicates(
            "h", keep="first"
        )
        return pd.DataFrame(
            {"_dpart": k["doc_id"].to_numpy(np.int64) % num_parts,
             "doc_id": k["doc_id"].to_numpy(np.int64),
             "idx": k["idx"].to_numpy(np.int64),
             "line": k["line"].to_numpy(dtype=object)}
        )

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "text": pd.Series([], dtype="object"),
                 "n_kept_lines": pd.Series([], dtype="int64")}
            )
        g = g.sort_values(["doc_id", "idx"])
        agg = g.groupby("doc_id", sort=True)["line"].agg(" ".join)
        n = g.groupby("doc_id", sort=True).size()
        return pd.DataFrame(
            {"doc_id": agg.index.to_numpy(np.int64),
             "text": agg.to_numpy(dtype=object),
             "n_kept_lines": n.to_numpy(np.int64)}
        )

    return (
        docs.map_batches(split_lines, batch_format="pandas",
                         batch_size=batch_size)
        .sort("_part")
        .map_batches(per_group(bucket_first, "_part"),
                     batch_size=None, batch_format="pyarrow")
        .sort("_dpart")
        .map_batches(per_group(rebuild, "_dpart"),
                     batch_size=None, batch_format="pyarrow")
    )
