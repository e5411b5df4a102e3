"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (100 TB design):
- exact dedup: hash-partition on the content hash => per-group first. One
  all-to-all exchange on a 16-byte key, combiner-reduced per batch first.
- MinHash-LSH: shingle->minhash per batch (stateless, vectorized) ->
  explode to (band, band_hash, doc_id) rows -> groupby on the band key
  (the only shuffle; band rows are tiny) -> candidate pairs -> exact-Jaccard
  verify. Verification here broadcasts the candidate docs' shingle sets
  (ray.put once); at petabyte scale you would co-partition candidates and
  docs by doc_id instead — the band-bucket stage is unchanged.
- SimHash: 64-bit signature per doc; candidates via 4x16-bit band buckets
  (Hamming<=3-ish recall), verified by exact Hamming distance.
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

_MERSENNE = np.uint64((1 << 61) - 1)


def _hash64(s: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(s.encode(), digest_size=8).digest(), "little"
    )


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Word k-gram shingles -> uint64 hashes. Docs shorter than k words
    have no shingles (excluded from near-dup, both here and in oracles)."""
    w = text.split()
    if len(w) < k:
        return np.empty(0, dtype=np.uint64)
    return np.unique(
        np.fromiter(
            (_hash64(" ".join(w[i : i + k])) for i in range(len(w) - k + 1)),
            dtype=np.uint64,
            count=len(w) - k + 1,
        )
    )


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
    concurrency: int = 2,
) -> rd.Dataset:
    """Keep the first (min id) row per identical text: hash -> per-batch
    combiner (keep local min) -> hash-partitioned group -> global min."""

    def local_first(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(id_col).drop_duplicates(
            "content_hash", keep="first"
        )

    def group_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(1, id_col)

    return (
        ds.map_batches(ContentHasher().__call__, batch_format="pandas",
                       batch_size=batch_size)
        .map_batches(local_first, batch_format="pandas", batch_size=batch_size)
        .groupby("content_hash")
        .map_groups(group_first, batch_format="pandas")
    )


# --- MinHash + LSH ----------------------------------------------------------


class MinHasher:
    """Per-doc MinHash signature over word-k-gram shingles.

    Hash family a_i*x + b_i mod 2^61-1 with seeded coefficients, built once
    per actor. Inner loop is numpy (H x S) — vectorized per doc."""

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
        sigs = batch["text"].map(self.signature)
        keep = sigs.notna()
        batch = batch.loc[keep, ["doc_id"]].copy()
        batch["sig"] = sigs[keep]
        return batch


class BandExploder:
    """Signature -> one row per LSH band: (band, band_hash, doc_id)."""

    def __init__(self, bands: int = 32, rows: int = 4):
        self.bands = bands
        self.rows = rows

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_band, out_hash = [], [], []
        for doc_id, sig in zip(batch["doc_id"], batch["sig"]):
            sig = np.asarray(sig, dtype=np.uint64)
            for b in range(self.bands):
                chunk = sig[b * self.rows : (b + 1) * self.rows]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                out_doc.append(doc_id)
                out_band.append(b)
                out_hash.append(int.from_bytes(h, "little") >> 1)
        return pd.DataFrame(
            {"band": out_band, "band_hash": out_hash, "doc_id": out_doc}
        )


def _bucket_pairs(g: pd.DataFrame, max_bucket: int = 200) -> pd.DataFrame:
    """Candidate pairs within one (band, band_hash) bucket. Buckets larger
    than max_bucket are truncated (logged via the `truncated` flag) — a
    degenerate bucket would otherwise emit O(n^2) pairs."""
    ids = sorted(g["doc_id"].unique())
    truncated = len(ids) > max_bucket
    ids = ids[:max_bucket]
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "truncated": []})
    pairs = list(itertools.combinations(ids, 2))
    return pd.DataFrame(
        {
            "doc_a": [a for a, _ in pairs],
            "doc_b": [b for _, b in pairs],
            "truncated": [truncated] * len(pairs),
        }
    )


def minhash_lsh_candidates(
    docs: rd.Dataset,
    k: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    rows: int = 4,
    concurrency: int = 4,
) -> rd.Dataset:
    """docs(text, doc_id) -> distinct candidate pairs (doc_a < doc_b)."""
    assert bands * rows == num_hashes
    # cheap per-call state (seeded coefficients) => task-based map_batches.
    # Actor pools here would RESERVE CPUs per stage; two chained pools can
    # starve the read/shuffle tasks and stall the streaming executor.
    mh = MinHasher(k=k, num_hashes=num_hashes)
    be = BandExploder(bands=bands, rows=rows)
    sig = docs.map_batches(mh.__call__, batch_format="pandas")
    band_rows = sig.map_batches(be.__call__, batch_format="pandas")
    pairs = band_rows.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )
    # distinct pairs (a pair can match in many bands)
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1)[["doc_a", "doc_b"]], batch_format="pandas"
    )


def verify_jaccard(
    pairs: rd.Dataset,
    docs: rd.Dataset,
    threshold: float,
    k: int = 3,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Exact word-k-gram Jaccard on candidate pairs. Broadcasts the
    candidate docs' shingle sets via ray.put (small by construction: LSH
    already pruned the universe); tasks look up per batch."""
    pair_tbl = pairs.to_pandas()
    if pair_tbl.empty:
        return rd.from_arrow(
            pa.table(
                {"doc_a": pa.array([], pa.int64()),
                 "doc_b": pa.array([], pa.int64()),
                 "jaccard": pa.array([], pa.float64())}
            )
        )
    cand_ids = set(pair_tbl["doc_a"]) | set(pair_tbl["doc_b"])

    def shingles_of(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[batch[id_col].isin(cand_ids)]
        # lists, not ndarrays: Ray's block size estimator chokes on
        # object columns of numpy arrays (noisy vectorize warnings)
        return pd.DataFrame(
            {
                id_col: m[id_col],
                "sh": m["text"].map(
                    lambda t: _shingle_hashes(t, k).tolist()
                ),
            }
        )

    sh_tbl = docs.map_batches(
        shingles_of, batch_format="pandas"
    ).to_pandas()
    lookup_ref = ray.put(dict(zip(sh_tbl[id_col], sh_tbl["sh"])))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(lookup_ref)
        ja = []
        for a, b in zip(batch["doc_a"], batch["doc_b"]):
            sa, sb = lookup.get(a), lookup.get(b)
            if not sa or not sb:
                ja.append(0.0)
                continue
            sa = np.asarray(sa, dtype=np.uint64)
            sb = np.asarray(sb, dtype=np.uint64)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            ja.append(inter / (sa.size + sb.size - inter))
        batch["jaccard"] = ja
        return batch[batch["jaccard"] >= threshold]

    return rd.from_pandas(pair_tbl).map_batches(score, batch_format="pandas")


def minhash_dedup_pairs(
    docs: rd.Dataset, threshold: float = 0.5, k: int = 3, **kw
) -> rd.Dataset:
    """End-to-end near-dup pairs: LSH candidates -> exact-Jaccard verify."""
    cands = minhash_lsh_candidates(docs, k=k, **kw)
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


def minhash_dedup_keep_first(
    docs: rd.Dataset, threshold: float = 0.5, k: int = 3, **kw
) -> rd.Dataset:
    """End-to-end near-dup REMOVAL: LSH candidates -> exact-Jaccard verify
    -> connected components -> keep the min-doc_id member of each dup
    group, drop the rest. Returns the surviving docs Dataset."""
    pairs = minhash_dedup_pairs(docs, threshold=threshold, k=k, **kw).to_pandas()
    roots = connected_components(pairs)
    drop = {d for d, r in roots.items() if r != d}
    drop_ref = ray.put(drop)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        ds_ = ray.get(drop_ref)
        return batch[~batch["doc_id"].isin(ds_)]

    return docs.map_batches(keep, batch_format="pandas")


# --- SimHash ----------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word hashes (count-weighted sign sum)."""

    def signature(self, text: str) -> int:
        words = text.split()
        if not words:
            return 0
        vals, counts = np.unique(
            np.fromiter((_hash64(w) for w in words), dtype=np.uint64,
                        count=len(words)),
            return_counts=True,
        )
        bits = ((vals[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
            np.int64
        )
        acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
        return int(
            np.bitwise_or.reduce(
                (acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
            )
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["simhash"] = (
            batch["text"].map(self.signature).astype("uint64")
        )
        return batch


def simhash_dup_pairs(
    docs: rd.Dataset, max_hamming: int = 3, concurrency: int = 4
) -> rd.Dataset:
    """Near-dup pairs by SimHash: 4x16-bit band buckets -> exact Hamming."""
    sigs = docs.map_batches(
        SimHasher().__call__, batch_format="pandas"
    ).select_columns(["doc_id", "simhash"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d, s in zip(batch["doc_id"], batch["simhash"]):
            s = int(s)
            for b in range(4):
                rows.append((b, (s >> (16 * b)) & 0xFFFF, d, s))
        return pd.DataFrame(
            rows, columns=["band", "band_hash", "doc_id", "simhash"]
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        recs = sorted(set(zip(g["doc_id"], g["simhash"])))[:200]
        out = []
        for (da, sa), (db, sb) in itertools.combinations(recs, 2):
            ham = bin(int(sa) ^ int(sb)).count("1")
            if ham <= max_hamming:
                out.append((da, db, ham))
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"])

    cand = (
        sigs.map_batches(explode, batch_format="pandas")
        .groupby(["band", "band_hash"])
        .map_groups(pairs, batch_format="pandas")
    )
    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
