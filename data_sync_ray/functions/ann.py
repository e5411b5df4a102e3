"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: numpy matmul per batch against a broadcast
  (ray.put once) query matrix — the exact baseline. Per-batch local top-k
  is the combiner; a tiny final reduce merges per-batch candidates.
- LSH-bucketed ANN: seeded random-hyperplane signatures bucket the corpus;
  a query probes its own bucket (+ multiprobe neighbors). The scale path:
  the bucket stage is a hash shuffle; per-bucket search is local.
- Embedding-cosine near-dup: exact block-pair sweep (raw Ray task per
  materialized block pair — no corpus broadcast), plus the linear-cost
  hyperplane-band LSH variant for high thresholds (the 100 TB path).
- Distributed k-means: full-corpus Lloyd over cached block refs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.groupmap import per_group


def _stack(col) -> np.ndarray:
    return np.vstack([np.asarray(v, dtype=np.float64) for v in col])


def _flatten_matrix(col: pa.ChunkedArray | pa.Array, n: int) -> np.ndarray:
    """Arrow list<float> column -> (n, dim) float64 matrix via one
    list_flatten + reshape — no per-row Python object round-trip.
    Requires uniform list lengths (embedding columns are)."""
    import pyarrow.compute as pc

    flat = pc.list_flatten(col).to_numpy()
    if n == 0:
        return flat.reshape(0, 0).astype(np.float64)
    return flat.reshape(n, flat.size // n).astype(np.float64)


def _uniform_list_array(m: np.ndarray) -> pa.ListArray:
    """(n, dim) matrix -> Arrow list<double> rows without a Python list
    of per-row arrays (offsets are arithmetic for uniform lengths)."""
    n, dim = m.shape
    offsets = pa.array(
        np.arange(0, (n + 1) * dim, dim, dtype=np.int32), pa.int32()
    )
    return pa.ListArray.from_arrays(
        offsets, pa.array(np.ascontiguousarray(m).ravel(), pa.float64())
    )


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _topk_merge(local: rd.Dataset, k: int) -> pd.DataFrame:
    """Bounded driver merge of per-batch top-k candidates: blocks x
    n_query x k rows total, so gathering them is O(parallelism), never
    O(corpus) — the same bounded-merge tail every top-k here shares.
    An exchange for a frame this small costs a full sort barrier."""
    df = local.to_pandas()
    if df.empty:
        return pd.DataFrame(columns=["query_id", "vec_id", "score"])
    return (
        df.sort_values(["query_id", "score", "vec_id"],
                       ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )


def brute_force_topk(
    emb: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    batch_size: int = 4096,
) -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns a small pandas frame
    (query_id, vec_id, score) — n_query*k rows. Task-based stage: the
    broadcast query matrix is a cheap local plasma get per task, and an
    actor pool would pay its per-execution startup (BASELINE.md)."""
    q_ref = ray.put(_normalize(np.asarray(queries, dtype=np.float64)))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        Q = ray.get(q_ref)  # (n_query, dim), normalized
        E = _normalize(_stack(batch["embedding"]))
        S = E @ Q.T  # (batch, n_query)
        out = []
        kk = min(k, S.shape[0])
        for qi in range(S.shape[1]):
            idx = np.argpartition(-S[:, qi], kk - 1)[:kk]
            for i in idx:
                out.append((qi, int(batch["vec_id"].iloc[i]), float(S[i, qi])))
        return pd.DataFrame(out, columns=["query_id", "vec_id", "score"])

    local = emb.map_batches(
        score, batch_format="pandas", batch_size=batch_size
    )
    return _topk_merge(local, k)


# --- int8 scalar quantization ------------------------------------------------


def quantized_topk(
    emb: rd.Dataset,
    query_vec: np.ndarray,
    query_id: int = 0,
    k: int = 10,
    batch_size: int = 4096,
) -> pd.DataFrame:
    """ANN top-k over SCALAR-QUANTIZED (8-bit) codes — the memory-scale
    path: a 100 TB float64 embedding column is 8x smaller as uint8 codes,
    and the similarity becomes an INTEGER dot product, so the whole
    operator is bit-exact across engines (the SQL oracle restates the
    identical floor arithmetic — no float-sum hash hazard).

    Two streaming passes over a pruned, materialized corpus:
      1. per-batch per-dimension min/max partials -> tiny driver merge
         (one D-vector per batch) -> broadcast (mn, range);
      2. quantize per batch with code = clip(floor((x-mn)/range*255+0.5))
         (zero-range dims -> 0), integer dot against the broadcast query
         codes, per-batch top-k, bounded driver merge.
    Scores stay exact in float64 matmul up to 2^53 (255^2 * D < 2^53 for
    any realistic D), cast back to int64.
    """
    pruned = emb.select_columns(["vec_id", "embedding"]).materialize()

    def mm_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"mn": pa.array([], _LIST_F64),
                             "mx": pa.array([], _LIST_F64)})
        M = _flatten_matrix(t.column("embedding"), t.num_rows)
        return pa.table(
            {"mn": _uniform_list_array(M.min(axis=0)[None, :]),
             "mx": _uniform_list_array(M.max(axis=0)[None, :])}
        )

    parts = pruned.map_batches(
        mm_partial, batch_format="pyarrow", batch_size=65536
    ).take_all()  # one (mn, mx) D-vector pair per 64k rows — the
    # driver merge is O(corpus/65536) tiny vectors, not O(corpus)
    if not parts:  # empty corpus: no partials to quantize against
        return pd.DataFrame(
            {"vec_id": pd.Series([], dtype="int64"),
             "score": pd.Series([], dtype="int64")}
        )
    mn = np.min(np.vstack([np.asarray(r["mn"]) for r in parts]), axis=0)
    mx = np.max(np.vstack([np.asarray(r["mx"]) for r in parts]), axis=0)
    rng = mx - mn
    safe = np.where(rng == 0.0, 1.0, rng)

    def codes_of(M: np.ndarray) -> np.ndarray:
        # same expression, same operation order, as the SQL oracle:
        # floor((x - mn) / (mx - mn) * 255.0 + 0.5), zero-range dims -> 0
        c = np.clip(np.floor((M - mn) / safe * 255.0 + 0.5), 0.0, 255.0)
        c[:, rng == 0.0] = 0.0
        return c

    qcode = codes_of(np.asarray(query_vec, dtype=np.float64)[None, :])[0]
    b_ref = ray.put((mn, safe, rng == 0.0, qcode))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        bmn, bsafe, bzero, bq = ray.get(b_ref)
        keep = batch["vec_id"].to_numpy() != query_id
        batch = batch.loc[keep]
        if len(batch) == 0:
            return pd.DataFrame(
                {"vec_id": pd.Series([], dtype="int64"),
                 "score": pd.Series([], dtype="int64")}
            )
        M = _stack(batch["embedding"])
        c = np.clip(np.floor((M - bmn) / bsafe * 255.0 + 0.5), 0.0, 255.0)
        c[:, bzero] = 0.0
        s = (c @ bq).astype(np.int64)  # exact: integer values < 2^53
        kk = min(k, len(s))
        # integer scores TIE for real (unlike cosine floats) — per-batch
        # selection must use the oracle's exact (score DESC, vec_id ASC)
        # order, or a boundary tie's required vec_id can be dropped
        # before the driver merge
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        idx = np.lexsort((ids, -s))[:kk]
        return pd.DataFrame({"vec_id": ids[idx], "score": s[idx]})

    cand = pruned.map_batches(
        score, batch_format="pandas", batch_size=batch_size
    ).to_pandas()
    if cand.empty:  # zero-row to_pandas is COLUMN-LESS (CLAUDE.md)
        return pd.DataFrame(
            {"vec_id": pd.Series([], dtype="int64"),
             "score": pd.Series([], dtype="int64")}
        )
    return (
        cand.sort_values(["score", "vec_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


_LIST_F64 = pa.list_(pa.float64())


# --- LSH-bucketed ANN -------------------------------------------------------


class HyperplaneHasher:
    """Seeded random-hyperplane signature -> int bucket id."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 5):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))
        self.pows = (1 << np.arange(n_planes)).astype(np.int64)

    def bucket_of(self, M: np.ndarray) -> np.ndarray:
        return ((M @ self.planes.T) > 0).astype(np.int64) @ self.pows

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        E = _stack(batch["embedding"])
        batch["bucket"] = self.bucket_of(E)
        return batch


def lsh_topk(
    emb: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 5,
    concurrency: int = 4,
    n_probes: int = 1,
) -> pd.DataFrame:
    """Approximate top-k: search the corpus buckets matching each query's
    hyperplane signature. n_probes=1 probes only the exact-signature
    bucket; n_probes=P additionally probes the P-1 neighbor buckets whose
    signatures differ in the single least-confident plane bits (standard
    multiprobe: flipping the planes with the smallest |margin| first),
    trading P x candidates for recall. Recall < 1 by design; tests
    measure it against brute force."""
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    hasher = HyperplaneHasher(Q.shape[1], n_planes, seed)
    q_buckets = hasher.bucket_of(Q)
    # plane confidence = DISTANCE to the hyperplane = |dot| / plane norm
    # (planes are unnormalized gaussians; raw |dot| would bias probing
    # toward low-norm planes regardless of the query's true margin)
    plane_norms = np.linalg.norm(hasher.planes, axis=1)
    probe_arrs: list[np.ndarray] = []
    for qi in range(Q.shape[0]):
        probes = {int(q_buckets[qi])}
        if n_probes > 1:
            margins = np.abs(Q[qi] @ hasher.planes.T) / plane_norms
            for plane in np.argsort(margins)[: n_probes - 1]:
                probes.add(int(q_buckets[qi]) ^ (1 << int(plane)))
        # materialize once per query, not per batch in the score loop
        probe_arrs.append(np.fromiter(probes, dtype=np.int64))
    wanted = {int(b) for arr in probe_arrs for b in arr}
    q_ref = ray.put(Q)
    bucket_arr = pa.array(sorted(wanted), pa.int64())

    # cheap state => task-based stages (an actor pool per stage would
    # reserve CPUs and can starve the rest of the pipeline)
    bucketed = emb.map_batches(
        hasher.__call__, batch_format="pandas"
    ).map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t.column("bucket"), value_set=bucket_arr)
        ),
        batch_format="pyarrow",
    )

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        Qm = ray.get(q_ref)
        E = _normalize(_stack(batch["embedding"]))
        S = E @ Qm.T
        out = []
        for qi in range(S.shape[1]):
            mask = np.isin(batch["bucket"].to_numpy(), probe_arrs[qi])
            if not mask.any():
                continue
            scores = S[mask, qi]
            ids = batch["vec_id"].to_numpy()[mask]
            kk = min(k, scores.size)
            idx = np.argpartition(-scores, kk - 1)[:kk]
            out.extend((qi, int(ids[i]), float(scores[i])) for i in idx)
        return pd.DataFrame(out, columns=["query_id", "vec_id", "score"])

    return _topk_merge(
        bucketed.map_batches(score, batch_format="pandas"), k
    )


# --- IVF (inverted-file) ANN ------------------------------------------------


def _kmeans(sample: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Seeded lightweight k-means on normalized vectors (cosine ≙ L2 on
    the unit sphere). Deterministic; empty clusters re-seed from the
    farthest points."""
    rng = np.random.default_rng(seed)
    C = sample[rng.choice(sample.shape[0], size=k, replace=False)]
    for _ in range(iters):
        S = sample @ C.T
        assign = S.argmax(axis=1)
        for j in range(k):
            members = sample[assign == j]
            if len(members):
                c = members.sum(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    C[j] = c / n
            else:  # empty cluster: grab the worst-served point
                C[j] = sample[S.max(axis=1).argmin()]
    return C


def ivf_topk(
    emb: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 2,
    train_sample: int = 2048,
    kmeans_iters: int = 10,
    seed: int = 11,
) -> pd.DataFrame:
    """IVF approximate top-k — the coarse-quantizer scale path the LSH
    variant trades against (data-adaptive cells vs oblivious hyperplanes).

    Train: seeded k-means over a bounded corpus sample (driver-side —
    train_sample rows, never the corpus). Assign: per-batch argmax against
    the broadcast centroids. Search: each query probes its n_probe nearest
    cells; only member vectors score. Recall < 1 by design (tests measure
    vs brute force); raise n_probe toward n_lists for exact."""
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    sample_tbl = emb.limit(train_sample).to_pandas()  # bounded, not corpus
    sample = _normalize(_stack(sample_tbl["embedding"]))
    n_lists = min(n_lists, sample.shape[0])
    C = _kmeans(sample, n_lists, kmeans_iters, seed)
    c_ref = ray.put(C)
    q_ref = ray.put(Q)
    # each query's probe cells
    probes = np.argsort(-(Q @ C.T), axis=1)[:, : max(1, n_probe)]
    wanted = pa.array(sorted({int(c) for row in probes for c in row}),
                      pa.int64())

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        Cm = ray.get(c_ref)
        E = _normalize(_stack(batch["embedding"]))
        batch = batch[["vec_id", "embedding"]].copy()
        batch["cell"] = (E @ Cm.T).argmax(axis=1).astype(np.int64)
        return batch

    member = emb.map_batches(assign, batch_format="pandas").map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t.column("cell"), value_set=wanted)
        ),
        batch_format="pyarrow",
    )

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        Qm = ray.get(q_ref)
        E = _normalize(_stack(batch["embedding"]))
        S = E @ Qm.T
        cells = batch["cell"].to_numpy()
        ids = batch["vec_id"].to_numpy()
        out = []
        for qi in range(S.shape[1]):
            mask = np.isin(cells, probes[qi])
            if not mask.any():
                continue
            scores = S[mask, qi]
            kk = min(k, scores.size)
            idx = np.argpartition(-scores, kk - 1)[:kk]
            out.extend(
                (qi, int(ids[mask][i]), float(scores[i])) for i in idx
            )
        return pd.DataFrame(out, columns=["query_id", "vec_id", "score"])

    return _topk_merge(member.map_batches(score, batch_format="pandas"), k)


# --- distributed k-means clustering -----------------------------------------


def _as_table(block) -> pa.Table:
    """Blocks from parquet reads are pa.Table; from_pandas datasets hand
    out pandas blocks — normalize for the block-ref kernels."""
    if isinstance(block, pa.Table):
        return block
    return pa.Table.from_pandas(block, preserve_index=False)


@ray.remote
def _km_block_min_k(t, k: int) -> pd.DataFrame:
    """Per-block k smallest vec_ids (seed-candidate combiner)."""
    t = _as_table(t)
    if t.num_rows == 0 or "vec_id" not in t.column_names:
        # empty blocks after repartition may arrive COLUMN-LESS
        return pd.DataFrame({"vec_id": [], "embedding": []})
    ids = t.column("vec_id").to_numpy()
    take = np.argsort(ids, kind="stable")[:k]
    return t.take(pa.array(take)).to_pandas()


@ray.remote
def _km_block_partials(
    t, Cm: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One Lloyd pass over one cached block: squared-L2 argmin assignment
    (ties -> lowest cluster id) and per-cluster (count, sum_vec_id,
    d-dim sum) partials."""
    t = _as_table(t)
    n = t.num_rows
    if n == 0 or "vec_id" not in t.column_names:
        # empty blocks after repartition may arrive COLUMN-LESS
        k = Cm.shape[0]
        return (
            np.zeros(k, dtype=np.int64),
            np.zeros(k, dtype=np.int64),
            np.zeros_like(Cm),
        )
    X = _flatten_matrix(t.column("embedding"), n)
    ids = t.column("vec_id").to_numpy()
    d2 = np.empty((n, Cm.shape[0]), dtype=np.float64)
    for j in range(Cm.shape[0]):
        diff = X - Cm[j]  # (n, d) scratch stays cache-sized
        d2[:, j] = np.einsum("ij,ij->i", diff, diff)
    a = d2.argmin(axis=1)
    counts = np.bincount(a, minlength=Cm.shape[0]).astype(np.int64)
    sum_id = np.rint(
        np.bincount(
            a, weights=ids.astype(np.float64), minlength=Cm.shape[0]
        )
    ).astype(np.int64)  # vec_ids << 2^53: exact in float64
    sums = np.zeros_like(Cm)
    for j in range(Cm.shape[0]):
        if counts[j]:
            sums[j] = X[a == j].sum(axis=0)
    return counts, sum_id, sums


def kmeans_embeddings(
    emb: rd.Dataset,
    k: int = 8,
    iters: int = 3,
    batch_size: int = 4096,
) -> pd.DataFrame:
    """Full-corpus Lloyd's k-means: iterative refinement over cached blocks.

    Unlike `_kmeans` (driver-side, bounded sample — the IVF trainer), this
    clusters EVERY vector. The pruned corpus is materialized ONCE into the
    object store (the standard iterative-ML cache: blocks stay distributed
    in plasma and spill to disk under pressure — NOT a driver gather);
    iterations then run as plain Ray tasks over the cached block refs —
    the one place here the Dataset API is deliberately bypassed, because
    an iterative algorithm pays the streaming executor's per-execution
    startup (a measured Ray 2.49 pitfall, see BASELINE.md) once per pass
    while a block-ref task costs milliseconds. Per pass: centroids are
    broadcast once (`ray.put`), each block task computes squared-L2
    assignments plus per-cluster partial sums in one vectorized kernel,
    and the driver combines the tiny partials (blocks x k rows of
    (count, sum_id, d-dim sum) — O(parallelism), never O(corpus), the
    same bounded-merge tail `_topk_merge` uses). No shuffle at any step.

    Deterministic and SQL-restatable: seeds are the k vectors with the
    smallest vec_ids (cluster j = j-th smallest), distances and means in
    float64, argmin ties break toward the lower cluster id, and a cluster
    left empty keeps its previous centroid. `iters` counts assignment
    passes; centroids update after each pass but the last. Returns integer
    per-cluster stats of the final assignment (cluster, n_vecs, sum_vec_id)
    — integer-exact, so the DuckDB-oracle hash cannot hinge on float
    summation order. Residual cross-engine risk: centroid means are
    float64 sums whose accumulation ORDER differs between engines, so a
    vector within ulps of equidistant from two centroids could in
    principle be assigned differently (same hazard class as any float
    argmin oracle; with real-valued embeddings the min-distance gap is
    ~1e-1 vs ~1e-15 noise). `batch_size` is accepted for API symmetry; blocks
    are the work unit (size them upstream via override_num_blocks /
    repartition if a block's (n, d) kernel scratch would outgrow memory).
    """
    del batch_size  # blocks are the work unit (see docstring)
    if k < 1 or iters < 1:
        raise ValueError("k and iters must be >= 1")
    emb = emb.select_columns(["vec_id", "embedding"]).materialize()
    block_refs = [
        br
        for bundle in emb.iter_internal_ref_bundles()
        for br in bundle.block_refs
    ]
    if not block_refs:
        return pd.DataFrame(
            {
                "cluster": pd.Series([], dtype=np.int64),
                "n_vecs": pd.Series([], dtype=np.int64),
                "sum_vec_id": pd.Series([], dtype=np.int64),
            }
        )

    fit = _kmeans_fit(block_refs, k, iters)
    if fit is None:  # zero-row corpus can still materialize to blocks
        return pd.DataFrame(
            {
                "cluster": pd.Series([], dtype=np.int64),
                "n_vecs": pd.Series([], dtype=np.int64),
                "sum_vec_id": pd.Series([], dtype=np.int64),
            }
        )
    _, stats = fit
    return (
        stats[stats["n_vecs"] > 0]
        .sort_values("cluster")
        .reset_index(drop=True)
    )


def _kmeans_fit(
    block_refs: list, k: int, iters: int
) -> tuple[np.ndarray, pd.DataFrame] | None:
    """The seeding + Lloyd loop of `kmeans_embeddings`, shared with
    `semantic_dedup_keep_first` so the two can never diverge from the
    SQL oracle's unrolled iterations. Returns (C, stats) where C is the
    centroid matrix the LAST assignment pass used (centroids update
    after each pass but the last) and stats the final per-cluster
    integer partials; None for a zero-row corpus."""
    seed_parts = [
        p
        for p in ray.get(
            [_km_block_min_k.remote(br, k) for br in block_refs]
        )
        if len(p)
    ]
    if not seed_parts:
        return None
    seeds = (
        pd.concat(seed_parts, ignore_index=True)
        .sort_values("vec_id")
        .head(k)
    )
    C = _stack(seeds["embedding"])
    kk = C.shape[0]  # corpus may hold fewer than k vectors
    stats: pd.DataFrame | None = None

    for it in range(iters):
        c_ref = ray.put(C)
        parts = ray.get(
            [_km_block_partials.remote(br, c_ref) for br in block_refs]
        )
        counts = np.zeros(kk, dtype=np.int64)
        sum_id = np.zeros(kk, dtype=np.int64)
        sums = np.zeros_like(C)
        for pc_, ps_, pm_ in parts:
            counts += pc_
            sum_id += ps_
            sums += pm_
        if it == iters - 1:
            stats = pd.DataFrame(
                {
                    "cluster": np.arange(kk, dtype=np.int64),
                    "n_vecs": counts,
                    "sum_vec_id": sum_id,
                }
            )
        else:
            nonempty = counts > 0
            C = np.where(
                nonempty[:, None], sums / np.maximum(counts, 1)[:, None], C
            )
    assert stats is not None
    return C, stats


# --- semantic dedup (SemDeDup-style) ----------------------------------------


@ray.remote
def _km_block_route(t, Cm: np.ndarray, kk: int) -> tuple:
    """Assign one cached block to its final k-means clusters (identical
    squared-L2 argmin + lowest-cluster tie-break as `_km_block_partials`)
    and return kk per-cluster (vec_id, embedding) shards — so each
    downstream cluster task reads only its own O(corpus/k) slice from
    the object store, never the whole corpus."""
    t = _as_table(t)
    empty = pa.table(
        {"vec_id": pa.array([], pa.int64()),
         "embedding": pa.array([], pa.list_(pa.float64()))}
    )
    if t.num_rows == 0 or "vec_id" not in t.column_names:
        return tuple(empty for _ in range(kk))
    t = t.select(["vec_id", "embedding"])
    X = _flatten_matrix(t.column("embedding"), t.num_rows)
    d2 = np.empty((t.num_rows, kk), dtype=np.float64)
    for j in range(kk):
        diff = X - Cm[j]
        d2[:, j] = np.einsum("ij,ij->i", diff, diff)
    a = d2.argmin(axis=1)
    return tuple(
        t.filter(pa.array(a == j)) if (a == j).any() else empty
        for j in range(kk)
    )


@ray.remote
def _cluster_keep_first(threshold: float, *shards) -> np.ndarray:
    """Within one cluster: drop every vector with ANY earlier (lower
    vec_id) member at cosine >= threshold; return kept vec_ids. The
    earlier member need not itself be kept (matches the SQL NOT-EXISTS
    restatement — no transitive closure). Pairwise sims run as chunked
    (n x 256) matmuls so the scratch stays cache-sized (the measured
    whole-corpus-scratch pitfall, BASELINE.md)."""
    tables = [t for t in map(_as_table, shards) if t.num_rows]
    if not tables:
        return np.array([], dtype=np.int64)
    t = pa.concat_tables(tables)
    ids = t.column("vec_id").to_numpy()
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    X = _normalize(_flatten_matrix(t.column("embedding"), t.num_rows))
    X = np.ascontiguousarray(X[order])
    n = len(ids)
    drop = np.zeros(n, dtype=bool)
    CH = 256
    rows = np.arange(n)
    for s in range(1, n, CH):
        e = min(s + CH, n)
        S = X[:e] @ X[s:e].T  # (e, e-s): bounded scratch
        earlier = rows[:e, None] < np.arange(s, e)[None, :]
        drop[s:e] = ((S >= threshold) & earlier).any(axis=0)
    return ids[~drop].astype(np.int64)


def semantic_dedup_keep_first(
    emb: rd.Dataset,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.4,
) -> pd.DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv
    2303.09540): k-means-cluster the embedding corpus, then drop, within
    each cluster, every vector that has an earlier (lower vec_id) member
    above the cosine threshold. Clustering bounds the pair cost — the
    within-cluster sweep is O(sum n_c^2), not O(n^2), and each cluster
    task reads only its own routed shards.

    Shares `_kmeans_fit` with `kmeans_embeddings` (same deterministic
    seeds, tie-breaks, empty-cluster carry-forward), so the SQL oracle
    reuses the identical unrolled-iteration CTEs. Partitioning
    assumption at scale: a cluster's members fit one task (true when k
    scales with corpus size, the SemDeDup regime of k ~ sqrt(n) or
    larger; route_part-style salting would shard a degenerate megacluster).
    Returns the kept vec_ids, ascending."""
    if k < 1 or iters < 1:
        raise ValueError("k and iters must be >= 1")
    emb = emb.select_columns(["vec_id", "embedding"]).materialize()
    block_refs = [
        br
        for bundle in emb.iter_internal_ref_bundles()
        for br in bundle.block_refs
    ]
    empty = pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64)})
    if not block_refs:
        return empty
    fit = _kmeans_fit(block_refs, k, iters)
    if fit is None:
        return empty
    C, _ = fit
    kk = C.shape[0]
    if kk == 1:
        # one cluster holds everything — skip the routing pass and feed
        # the cached blocks straight in (num_returns=1 would also NOT
        # unpack a 1-tuple, so this path is required, not an optimization)
        kept = ray.get([_cluster_keep_first.remote(threshold, *block_refs)])
    else:
        c_ref = ray.put(C)
        shard_lists = [
            _km_block_route.options(num_returns=kk).remote(br, c_ref, kk)
            for br in block_refs
        ]
        kept = ray.get(
            [
                _cluster_keep_first.remote(
                    threshold, *[shards[j] for shards in shard_lists]
                )
                for j in range(kk)
            ]
        )
    out = np.sort(np.concatenate(kept)) if kept else np.array(
        [], dtype=np.int64
    )
    return pd.DataFrame({"vec_id": out.astype(np.int64)})


# --- embedding near-dup -----------------------------------------------------


@ray.remote
def _block_pair_scores(
    ta: pa.Table, tb: pa.Table, threshold: float, same: bool
) -> pa.Table:
    """Exact cosine pairs >= threshold between two corpus blocks (blocks
    arrive by object ref — shared-memory reads, shipped at most once per
    consumer node)."""
    empty = pa.table(
        {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()),
         "cosine": pa.array([], pa.float64())}
    )
    if ta.num_rows == 0 or (not same and tb.num_rows == 0):
        return empty  # repartition can hand out empty blocks
    A = _flatten_matrix(ta.column("embedding"), ta.num_rows)
    ids_a = ta.column("vec_id").to_numpy()
    if same:
        S = A @ A.T
        iu, ju = np.triu_indices(S.shape[0], k=1)
        m = S[iu, ju] >= threshold
        a, b, c = ids_a[iu[m]], ids_a[ju[m]], S[iu, ju][m]
    else:
        B = _flatten_matrix(tb.column("embedding"), tb.num_rows)
        ids_b = tb.column("vec_id").to_numpy()
        S = A @ B.T
        ai, bj = np.nonzero(S >= threshold)
        a, b, c = ids_a[ai], ids_b[bj], S[ai, bj]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return pa.table(
        {"vec_a": pa.array(lo, pa.int64()), "vec_b": pa.array(hi, pa.int64()),
         "cosine": pa.array(c, pa.float64())}
    )


def cosine_near_dup_pairs(
    emb: rd.Dataset, threshold: float = 0.4, num_blocks: int | None = None
) -> rd.Dataset:
    """All pairs (a < b) with cosine >= threshold — EXACT, distributed.

    Block-pair sweep: normalize + materialize the corpus as num_blocks
    object-store blocks (spillable — never driver memory), then one raw
    Ray task per block pair (i <= j) does an (n/B x n/B) matmul. Raw
    tasks because a block cartesian product is the one shape the Dataset
    API can't express (SURVEY §2 custom-operator rule c). Exact all-pairs
    is inherently O(N^2) compute — spread over B(B+1)/2 tasks, with each
    block shipped to at most B consumers; at low thresholds (wide angles)
    no LSH scheme can prune without losing recall, which the exact SQL
    oracle would catch. For HIGH thresholds use
    cosine_near_dup_pairs_lsh — same answer where it prunes, linear cost.
    """

    def pack(t: pa.Table) -> pa.Table:
        M = _normalize(_flatten_matrix(t.column("embedding"), t.num_rows))
        return pa.table(
            {
                "vec_id": t.column("vec_id").combine_chunks().cast(pa.int64()),
                "embedding": _uniform_list_array(M),
            }
        )

    pre = (
        emb.select_columns(["vec_id", "embedding"])
        .map_batches(pack, batch_format="pyarrow")
        .materialize()
    )
    if num_blocks is None:
        # ~250k vectors per block: B(B+1)/2 tasks stay proportionate to
        # the corpus, and a small corpus runs as ONE task instead of
        # paying a repartition execution + 36 trivial tasks
        num_blocks = max(1, min(64, -(-pre.count() // 250_000)))
    if pre.num_blocks() != num_blocks:
        pre = pre.repartition(num_blocks).materialize()
    refs = [
        r
        for bundle in pre.iter_internal_ref_bundles()
        for r in bundle.block_refs
    ]
    outs = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            outs.append(
                _block_pair_scores.remote(
                    refs[i], refs[j], threshold, i == j
                )
            )
    tables = [t for t in ray.get(outs) if t.num_rows]
    if not tables:
        return rd.from_arrow(
            pa.table(
                {"vec_a": pa.array([], pa.int64()),
                 "vec_b": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        )
    # pair output is tiny (bounded by real near-dup density)
    return rd.from_arrow(pa.concat_tables(tables))


def cosine_near_dup_pairs_lsh(
    emb: rd.Dataset,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_bands: int = 16,
    seed: int = 5,
    num_parts: int = 16,
    max_bucket: int = 2000,
) -> rd.Dataset:
    """Approximate near-dup pairs — the 100 TB scale path for HIGH
    thresholds. n_bands independent hyperplane signatures bucket the
    corpus; only same-(band, bucket) vectors are compared (exact cosine
    verify inside the bucket task, so false candidates never surface).
    Per-pair miss probability is (1 - (1-theta/pi)^n_planes)^n_bands —
    ~0.4% at cosine 0.9 with the defaults, unbounded for wide angles
    (use the exact sweep there). One shuffle on a small int partition of
    buckets; embeddings travel n_bands times.

    Cost note: expected per-band bucket size is n/2^n_planes, so total
    comparisons ~ n_bands * n^2 / 2^n_planes — the defaults (8 planes,
    16 bands) are ~8x cheaper than the exact sweep; FEWER planes raise
    recall for wide angles but can cost MORE than exact (2 planes = 4
    buckets/band). Buckets beyond max_bucket are truncated (sorted by
    vec_id, deterministic) — a degenerate bucket must not do unbounded
    O(n^2) work in one task.
    """
    empty_routed = pa.schema(
        [("band", pa.int64()), ("bucket", pa.int64()),
         ("vec_id", pa.int64()),
         ("embedding", pa.list_(pa.float64())), ("_part", pa.int64())]
    ).empty_table()

    def route(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_routed
        E = _normalize(_flatten_matrix(t.column("embedding"), t.num_rows))
        # planes derive from the seed only — identical in every task
        planes = np.random.default_rng(seed).standard_normal(
            (n_bands * n_planes, E.shape[1])
        )
        bits = (E @ planes.T) > 0  # (n, bands*planes)
        bits = bits.reshape(len(E), n_bands, n_planes)
        pows = (1 << np.arange(n_planes)).astype(np.int64)
        buckets = bits.astype(np.int64) @ pows  # (n, bands)
        band_idx = np.tile(np.arange(n_bands, dtype=np.int64), len(E))
        bucket_flat = buckets.ravel()
        return pa.table(
            {
                "band": pa.array(band_idx),
                "bucket": pa.array(bucket_flat),
                "vec_id": pa.array(
                    np.repeat(t.column("vec_id").to_numpy(), n_bands),
                    pa.int64(),
                ),
                "embedding": _uniform_list_array(
                    np.repeat(E, n_bands, axis=0)
                ),
                "_part": pa.array(
                    (band_idx * 1315423911 + bucket_flat) % num_parts
                ),
            }
        )

    def bucket_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"vec_a": pa.array([], pa.int64()),
             "vec_b": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}
        )
        if t.num_rows == 0:
            return empty
        band = t.column("band").to_numpy()
        bucket = t.column("bucket").to_numpy()
        ids = t.column("vec_id").to_numpy()
        E = _flatten_matrix(t.column("embedding").combine_chunks(),
                            t.num_rows)
        # one lexsort lays the partition out as (band, bucket) runs; each
        # bucket is then a contiguous matrix slice for ONE BLAS matmul —
        # no per-bucket frame assembly from Python object rows
        order = np.lexsort((ids, bucket, band))
        band, bucket, ids, E = (
            band[order], bucket[order], ids[order], E[order]
        )
        bstart = np.empty(ids.size, dtype=bool)
        bstart[0] = True
        bstart[1:] = (band[1:] != band[:-1]) | (bucket[1:] != bucket[:-1])
        starts = np.flatnonzero(bstart)
        runs = np.diff(np.append(starts, ids.size))
        out_a, out_b, out_c = [], [], []
        for s, m in zip(starts.tolist(), runs.tolist()):
            if m < 2:
                continue
            m = min(m, max_bucket)  # id-sorted: truncation deterministic
            bids = ids[s:s + m]
            S = E[s:s + m] @ E[s:s + m].T
            iu, ju = np.triu_indices(m, k=1)
            hit = S[iu, ju] >= threshold
            a, b = bids[iu[hit]], bids[ju[hit]]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_c.append(S[iu, ju][hit])
        if not out_a:
            return empty
        return pa.table(
            {
                "vec_a": pa.array(np.concatenate(out_a), pa.int64()),
                "vec_b": pa.array(np.concatenate(out_b), pa.int64()),
                "cosine": pa.array(np.concatenate(out_c), pa.float64()),
            }
        )

    cand = (
        emb.select_columns(["vec_id", "embedding"])
        .map_batches(route, batch_format="pyarrow")
        .sort("_part")
        .map_batches(per_group(bucket_pairs, "_part", "pyarrow"),
                     batch_size=None, batch_format="pyarrow")
    )
    # a pair can collide in many bands: distinct on (vec_a, vec_b)
    from .dedup import dedup_pair_rows

    return dedup_pair_rows(cand, cols=("vec_a", "vec_b"))


def cosine_dedup_keep_first(
    emb: rd.Dataset,
    threshold: float = 0.4,
    use_lsh: bool = False,
    **kw,
) -> rd.Dataset:
    """Embedding near-dup REMOVAL: cosine pairs -> connected components
    -> keep each component's min vec_id, drop the rest (the embedding
    analog of minhash_dedup_keep_first; same union-find-on-driver
    justification — the pair set is bounded by real dup density, tiny
    relative to the corpus). use_lsh selects the linear-cost bucketed
    pair path for high thresholds; default is the exact block sweep."""
    from .dedup import drop_non_roots, drop_set_from_pairs

    pair_fn = cosine_near_dup_pairs_lsh if use_lsh else cosine_near_dup_pairs
    pairs = pair_fn(emb, threshold=threshold, **kw).to_pandas()
    drop = drop_set_from_pairs(
        pairs.rename(columns={"vec_a": "doc_a", "vec_b": "doc_b"})
    )
    return drop_non_roots(emb, drop, id_col="vec_id")


# --- distributed PCA (power iteration) ---------------------------------------


@ray.remote
def _pca_block_moments(t) -> tuple[int, np.ndarray]:
    """Per-block (row count, d-dim column sum) — the mean's combiner."""
    t = _as_table(t)
    if t.num_rows == 0 or "embedding" not in t.column_names:
        # empty blocks after materialize may arrive COLUMN-LESS
        return 0, np.zeros(0, dtype=np.float64)
    X = _flatten_matrix(t.column("embedding"), t.num_rows)
    return t.num_rows, X.sum(axis=0)


@ray.remote
def _pca_block_matvec(t, mv) -> np.ndarray:
    """One power-iteration partial over one cached block:
    w_partial = Xc.T @ (Xc @ v) where Xc = X - mu, i.e. the centered
    covariance times v WITHOUT materializing the (d, d) covariance —
    two (n, d)-cost matmuls, O(d) output per block."""
    mu, v = mv
    t = _as_table(t)
    if t.num_rows == 0 or "embedding" not in t.column_names:
        return np.zeros_like(v)
    Xc = _flatten_matrix(t.column("embedding"), t.num_rows) - mu
    return Xc.T @ (Xc @ v)


@ray.remote
def _pca_block_label_stats(t, mv) -> pd.DataFrame:
    """Final-pass partials: project each centered row on the fitted
    component and reduce per label to integer stats (n_pos, n_nonpos,
    sum_vec_id_pos) — bounded by label cardinality, never O(rows)."""
    mu, v = mv
    t = _as_table(t)
    cols = ["label", "n_pos", "n_nonpos", "sum_vec_id_pos"]
    if t.num_rows == 0 or "vec_id" not in t.column_names:
        return pd.DataFrame(columns=cols)
    Xc = _flatten_matrix(t.column("embedding"), t.num_rows) - mu
    pos = (Xc @ v) > 0.0
    lab = t.column("label").to_numpy().astype(np.int64)
    vid = t.column("vec_id").to_numpy().astype(np.int64)
    ulab, inv = np.unique(lab, return_inverse=True)
    n_pos = np.bincount(inv, weights=pos).astype(np.int64)
    n_tot = np.bincount(inv)
    # vec_ids << 2^53: the float64 weighted bincount is exact (the
    # _km_block_partials sum_id trick)
    s_pos = np.rint(
        np.bincount(inv, weights=np.where(pos, vid, 0).astype(np.float64))
    ).astype(np.int64)
    return pd.DataFrame(
        {
            "label": ulab,
            "n_pos": n_pos,
            "n_nonpos": n_tot - n_pos,
            "sum_vec_id_pos": s_pos,
        }
    )[cols]


def pca_power_iter_embeddings(
    emb: rd.Dataset, iters: int = 4
) -> pd.DataFrame:
    """Distributed top-principal-component fit by POWER ITERATION over
    cached block refs — the covariance is never materialized: each pass
    computes w = sum_i (x_i - mu) ((x_i - mu) . v) as two tall-matrix
    products per block and an O(d) driver combine, so a pass costs one
    read of the corpus and ships d floats per block (the
    kmeans_embeddings iterative pattern; see its docstring for why
    block-ref tasks beat re-running the streaming executor per pass).

    Deterministic and SQL-restatable: inputs widen to float64 (exact),
    the seed direction is the centered embedding of the smallest vec_id,
    each iterate is L2-normalized, and because the covariance is PSD the
    seed's orientation is preserved — no per-iteration sign fixups for
    the oracle to mirror. Output is integer-only per-label stats of the
    final projection signs (n_pos / n_nonpos / sum_vec_id_pos), so the
    oracle hash cannot hinge on float summation order; the residual
    knife-edge (a projection within accumulation ulps of 0.0) is the
    same documented hazard class as the k-means argmin.

    100 TB: blocks stay in plasma (spillable), per-pass traffic is
    O(blocks * d) to the driver, label reduce is bounded by label
    cardinality. No shuffle at any step."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    empty = pd.DataFrame(
        {
            "label": pd.Series([], dtype=np.int64),
            "n_pos": pd.Series([], dtype=np.int64),
            "n_nonpos": pd.Series([], dtype=np.int64),
            "sum_vec_id_pos": pd.Series([], dtype=np.int64),
        }
    )
    emb = emb.select_columns(["vec_id", "embedding", "label"]).materialize()
    block_refs = [
        br
        for bundle in emb.iter_internal_ref_bundles()
        for br in bundle.block_refs
    ]
    if not block_refs:
        return empty

    moments = ray.get(
        [_pca_block_moments.remote(br) for br in block_refs]
    )
    n = sum(c for c, _ in moments)
    if n == 0:
        return empty
    mu = sum(s for c, s in moments if c) / n

    seeds = [
        p
        for p in ray.get(
            [_km_block_min_k.remote(br, 1) for br in block_refs]
        )
        if len(p)
    ]
    seed_row = (
        pd.concat(seeds, ignore_index=True).sort_values("vec_id").iloc[0]
    )
    v = np.asarray(seed_row["embedding"], dtype=np.float64) - mu
    nv = np.linalg.norm(v)
    if nv == 0:  # degenerate seed (== mean): fall back to e_0
        v = np.zeros_like(mu)
        v[0] = 1.0
    else:
        v = v / nv

    for _ in range(iters):
        mv_ref = ray.put((mu, v))
        w = np.zeros_like(v)
        for part in ray.get(
            [_pca_block_matvec.remote(br, mv_ref) for br in block_refs]
        ):
            w += part
        nw = np.linalg.norm(w)
        if nw == 0:  # zero-variance corpus: component undefined, keep v
            break
        v = w / nw

    mv_ref = ray.put((mu, v))
    parts = [
        p
        for p in ray.get(
            [_pca_block_label_stats.remote(br, mv_ref) for br in block_refs]
        )
        if len(p)
    ]
    if not parts:
        return empty
    out = (
        pd.concat(parts, ignore_index=True)
        .groupby("label", sort=True, as_index=False)
        .sum()
    )
    for c in ("label", "n_pos", "n_nonpos", "sum_vec_id_pos"):
        out[c] = out[c].astype(np.int64)
    return out


# --- greedy k-center subset selection ----------------------------------------

_KC_SCALE = 1048576.0  # 2^20 fixed-point quantization (embeddings are O(1))


def _kc_quantize(X: np.ndarray) -> np.ndarray:
    """float32 embedding -> int64 fixed-point at 2^20 (floor(x*s + 0.5),
    widened to float64 first so the SQL restatement is bit-identical).
    All downstream distances are integer-exact: |q| < 2^21 bounds a
    squared diff at 2^44, x d=O(100) dims stays far inside int64."""
    return np.floor(
        X.astype(np.float64) * _KC_SCALE + 0.5
    ).astype(np.int64)


@ray.remote
def _kc_block_best(t, sel) -> tuple:
    """Per-block farthest-point candidate: among this block's
    UNSELECTED points, the max over points of the min squared-L2
    distance to the selected set (ties -> min vec_id). Returns
    (min_dist, vec_id, qvec) or (None, None, None) when every point is
    already selected. Integer-exact throughout."""
    t = _as_table(t)
    if t.num_rows == 0 or "vec_id" not in t.column_names:
        return (None, None, None)  # column-less empty block (CLAUDE.md)
    S, sel_ids = sel
    ids = t.column("vec_id").to_numpy()
    keep = ~np.isin(ids, sel_ids)
    if not keep.any():
        return (None, None, None)
    Q = _kc_quantize(_flatten_matrix(t.column("embedding"), t.num_rows))
    Q, ids = Q[keep], ids[keep]
    mind = np.full(len(ids), np.iinfo(np.int64).max, dtype=np.int64)
    for j in range(S.shape[0]):
        diff = Q - S[j]  # (n, d) int64 scratch stays cache-sized
        np.minimum(mind, np.einsum("ij,ij->i", diff, diff), out=mind)
    best = mind.max()
    cand = ids[mind == best]
    vid = int(cand.min())
    qvec = Q[ids == vid][0]
    return (int(best), vid, qvec)


def kcenter_select_embeddings(
    emb: rd.Dataset, k: int = 8
) -> pd.DataFrame:
    """Greedy k-center (farthest-point) diverse-subset selection — the
    coverage-based data-selection primitive ("pick k maximally spread
    exemplars"): seed with the min vec_id, then k-1 times add the point
    whose min distance to the selected set is largest (ties -> min
    vec_id). Distances are squared L2 over 2^20 fixed-point integer
    codes, so every comparison — and therefore the selected set — is
    exact and restatable in SQL (the quantized_topk discipline; a
    float distance would put the argmax at the mercy of summation
    order).

    Shape: the kmeans_embeddings iterative pattern — ONE materialization
    of (vec_id, embedding), then k-1 task waves over cached block refs;
    each wave broadcasts the selected codes once (ray.put) and reduces
    one (dist, id, d-dim code) candidate per block on the driver. Per
    wave traffic is O(blocks * d); no shuffle at any step. 2-approx of
    the optimal k-center cover (Gonzalez 1985).

    Returns (sel_rank, vec_id, min_dist): min_dist is the point's
    distance to the set at selection time (0 for the seed). Stops early
    if the corpus has fewer than k points."""
    if k < 1:
        raise ValueError("k must be >= 1")
    emb = emb.select_columns(["vec_id", "embedding"]).materialize()
    block_refs = [
        br
        for bundle in emb.iter_internal_ref_bundles()
        for br in bundle.block_refs
    ]
    empty = pd.DataFrame(
        {
            "sel_rank": pd.Series([], dtype=np.int64),
            "vec_id": pd.Series([], dtype=np.int64),
            "min_dist": pd.Series([], dtype=np.int64),
        }
    )
    if not block_refs:
        return empty
    seeds = [
        p
        for p in ray.get(
            [_km_block_min_k.remote(br, 1) for br in block_refs]
        )
        if len(p)
    ]
    if not seeds:
        return empty
    seed_row = (
        pd.concat(seeds, ignore_index=True).sort_values("vec_id").iloc[0]
    )
    seed_q = _kc_quantize(
        np.asarray(seed_row["embedding"], dtype=np.float32)[None, :]
    )[0]
    sel_ids = [int(seed_row["vec_id"])]
    sel_q = [seed_q]
    dists = [0]
    while len(sel_ids) < k:
        sel_ref = ray.put(
            (np.stack(sel_q), np.asarray(sel_ids, dtype=np.int64))
        )
        cands = [
            c
            for c in ray.get(
                [_kc_block_best.remote(br, sel_ref) for br in block_refs]
            )
            if c[0] is not None
        ]
        if not cands:
            break  # fewer than k points in the corpus
        best = min(cands, key=lambda c: (-c[0], c[1]))
        dists.append(best[0])
        sel_ids.append(best[1])
        sel_q.append(best[2])
    return pd.DataFrame(
        {
            "sel_rank": np.arange(len(sel_ids), dtype=np.int64),
            "vec_id": np.asarray(sel_ids, dtype=np.int64),
            "min_dist": np.asarray(dists, dtype=np.int64),
        }
    )


# --- semantic decontamination -------------------------------------------------


def semantic_decontaminate(
    emb: rd.Dataset,
    bench_mod: int = 50,
    tau_sq_bp: int = 1225,
    batch_size: int = 4096,
) -> pd.DataFrame:
    """Embedding-space decontamination — the semantic sibling of the
    n-gram `decontaminate_docs` (functions/dedup.py): flag every corpus
    vector whose CENTERED 8-bit-quantized cosine against ANY benchmark
    vector reaches tau, entirely in integer arithmetic so both engines
    hash identically (cos >= tau  <=>  dot > 0 AND
    dot^2 * 10000 >= tau_sq_bp * |a|^2 * |b|^2, with tau_sq_bp =
    floor(tau^2 * 10000) exact by construction — no sqrt, no float
    division anywhere). Benchmark membership is deterministic
    (vec_id % bench_mod == 0), standing in for the eval-set embedding
    table a production run would broadcast.

    Scale shape: one min/max partial pass (tiny driver merge of
    per-64k-row D-vectors), benchmark codes broadcast ONCE via ray.put
    (the small side — real benchmark sets are thousands of rows, never
    a corpus fraction), then a single streamed map_batches with one
    (B x D) @ (D x K) integer matmul per batch and bounded rows out
    (contaminated only). No shuffle, no driver materialization.

    Bounds (D <= ~2000 dims): |cc| <= 128, |dot| <= 128^2 * D;
    dot^2 * 10000 <= 2.7e18 * (D/2000)^2 and tau_sq_bp * n2a * n2b
    likewise stay inside int64 for any realistic D.

    Reference analog: none — training-data operator family on top of
    the reference's sync surface.
    """
    pruned = emb.select_columns(["vec_id", "embedding"]).materialize()

    def mm_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"mn": pa.array([], _LIST_F64),
                             "mx": pa.array([], _LIST_F64)})
        M = _flatten_matrix(t.column("embedding"), t.num_rows)
        return pa.table(
            {"mn": _uniform_list_array(M.min(axis=0)[None, :]),
             "mx": _uniform_list_array(M.max(axis=0)[None, :])}
        )

    _EMPTY = pd.DataFrame(
        {"vec_id": pd.Series([], dtype="int64"),
         "hits": pd.Series([], dtype="int64"),
         "best_dot": pd.Series([], dtype="int64")}
    )
    parts = pruned.map_batches(
        mm_partial, batch_format="pyarrow", batch_size=65536
    ).take_all()
    if not parts:
        return _EMPTY
    mn = np.min(np.vstack([np.asarray(r["mn"]) for r in parts]), axis=0)
    mx = np.max(np.vstack([np.asarray(r["mx"]) for r in parts]), axis=0)
    rng = mx - mn
    safe = np.where(rng == 0.0, 1.0, rng)
    zero = rng == 0.0

    def codes_c(M: np.ndarray) -> np.ndarray:
        # identical expression + operation order as the SQL oracle:
        # (least(255, greatest(0, floor((x-mn)/(mx-mn)*255+0.5))) - 128;
        # zero-range dims quantize to 0 - 128 = -128 on both sides
        c = np.clip(np.floor((M - mn) / safe * 255.0 + 0.5), 0.0, 255.0)
        c[:, zero] = 0.0
        return (c - 128.0).astype(np.int64)

    def bench_rows(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch["vec_id"].to_numpy(np.int64) % bench_mod == 0
        return batch.loc[keep]

    bench = pruned.map_batches(
        bench_rows, batch_format="pandas", batch_size=batch_size
    ).to_pandas()
    if bench.empty:  # zero-row to_pandas is COLUMN-LESS (CLAUDE.md)
        return _EMPTY
    bq = codes_c(_stack(bench["embedding"]))
    b_ref = ray.put(
        (bq, (bq * bq).sum(axis=1), mn, safe, zero)
    )

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        bcodes, bn2, bmn, bsafe, bzero = ray.get(b_ref)
        ids = batch["vec_id"].to_numpy(np.int64)
        cand = ids % bench_mod != 0
        if not cand.any():
            return _EMPTY
        ids = ids[cand]
        M = _stack(batch["embedding"].iloc[np.flatnonzero(cand)])
        c = np.clip(np.floor((M - bmn) / bsafe * 255.0 + 0.5), 0.0, 255.0)
        c[:, bzero] = 0.0
        ccf = c - 128.0
        # float64 BLAS matmul, then cast: exact — |cc| <= 128, so
        # |dot| <= 128^2 * D << 2^53; the int64-overflow-prone products
        # below run in int64
        dot = (ccf @ bcodes.T.astype(np.float64)).astype(np.int64)
        n2 = (ccf * ccf).sum(axis=1).astype(np.int64)
        hit = (dot > 0) & (
            dot * dot * 10000 >= tau_sq_bp * n2[:, None] * bn2[None, :]
        )
        nh = hit.sum(axis=1).astype(np.int64)
        flag = nh > 0
        if not flag.any():
            return _EMPTY
        best = np.where(hit, dot, np.iinfo(np.int64).min).max(axis=1)
        return pd.DataFrame(
            {"vec_id": ids[flag], "hits": nh[flag],
             "best_dot": best[flag].astype(np.int64)}
        )

    out = pruned.map_batches(
        score, batch_format="pandas", batch_size=batch_size
    ).to_pandas()
    if out.empty:
        return _EMPTY
    return out.sort_values("vec_id").reset_index(drop=True)
