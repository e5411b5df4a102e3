"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: numpy matmul per batch against a broadcast
  (ray.put once) query matrix — the exact baseline. Per-batch local top-k
  is the combiner; a tiny final reduce merges per-batch candidates.
- LSH-bucketed ANN: seeded random-hyperplane signatures bucket the corpus;
  a query probes its own bucket (+ multiprobe neighbors). The scale path:
  the bucket stage is a hash shuffle; per-bucket search is local.
- Embedding-cosine near-dup: block x corpus matmul, emit pairs over a
  threshold (broadcast corpus here; IVF/LSH blocking is the 100 TB path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _stack(col) -> np.ndarray:
    return np.vstack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _BruteScore:
    """Per-batch exact cosine vs the broadcast query matrix, local top-k."""

    def __init__(self, q_ref, k: int):
        self.Q = ray.get(q_ref)  # (n_query, dim), normalized — once per actor
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        E = _normalize(_stack(batch["embedding"]))
        S = E @ self.Q.T  # (batch, n_query)
        out = []
        k = min(self.k, S.shape[0])
        for qi in range(S.shape[1]):
            idx = np.argpartition(-S[:, qi], k - 1)[:k]
            for i in idx:
                out.append((qi, int(batch["vec_id"].iloc[i]), float(S[i, qi])))
        return pd.DataFrame(out, columns=["query_id", "vec_id", "score"])


def brute_force_topk(
    emb: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 4096,
) -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns a small pandas frame
    (query_id, vec_id, score) — n_query*k rows."""
    q_ref = ray.put(_normalize(np.asarray(queries, dtype=np.float64)))
    local = emb.map_batches(
        _BruteScore,
        fn_constructor_args=(q_ref, k),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["score", "vec_id"], ascending=[False, True]
        ).head(k)

    top = local.groupby("query_id").map_groups(final, batch_format="pandas")
    return top.to_pandas().sort_values(
        ["query_id", "score", "vec_id"], ascending=[True, False, True]
    ).reset_index(drop=True)


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
) -> pd.DataFrame:
    """Approximate top-k: search only the corpus bucket matching each
    query's hyperplane signature (single-probe). Recall < 1 by design;
    tests measure it against brute force."""
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    hasher = HyperplaneHasher(Q.shape[1], n_planes, seed)
    q_buckets = hasher.bucket_of(Q)
    wanted = set(int(b) for b in q_buckets)
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
            mask = batch["bucket"].to_numpy() == q_buckets[qi]
            if not mask.any():
                continue
            scores = S[mask, qi]
            ids = batch["vec_id"].to_numpy()[mask]
            kk = min(k, scores.size)
            idx = np.argpartition(-scores, kk - 1)[:kk]
            out.extend((qi, int(ids[i]), float(scores[i])) for i in idx)
        return pd.DataFrame(out, columns=["query_id", "vec_id", "score"])

    local = bucketed.map_batches(score, batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["score", "vec_id"], ascending=[False, True]
        ).head(k)

    return (
        local.groupby("query_id")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "score"], ascending=[True, False])
        .reset_index(drop=True)
    )


# --- embedding near-dup -----------------------------------------------------


def cosine_near_dup_pairs(
    emb: rd.Dataset, threshold: float = 0.4, concurrency: int = 4
) -> rd.Dataset:
    """All pairs (a < b) with cosine >= threshold. Corpus is broadcast
    (ray.put once, read per actor); each batch does one (block x corpus)
    matmul. 100 TB path: LSH-bucket both sides first, same per-bucket body."""
    all_tbl = emb.select_columns(["vec_id", "embedding"]).to_pandas()
    M = _normalize(_stack(all_tbl["embedding"]))
    ids = all_tbl["vec_id"].to_numpy()
    ref = ray.put((M, ids))

    class PairFinder:
        def __init__(self):
            self.M, self.ids = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            E = _normalize(_stack(batch["embedding"]))
            bids = batch["vec_id"].to_numpy()
            S = E @ self.M.T
            ai, bj = np.nonzero(S >= threshold)
            a, b = bids[ai], self.ids[bj]
            keep = a < b  # dedupe the symmetric pair + self-match
            return pd.DataFrame(
                {
                    "vec_a": a[keep],
                    "vec_b": b[keep],
                    "cosine": S[ai[keep], bj[keep]],
                }
            )

    return emb.map_batches(
        PairFinder, batch_format="pandas", concurrency=concurrency
    )
