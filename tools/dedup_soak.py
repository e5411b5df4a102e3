"""Near-dup removal at soak scale (round-5 verdict #6): run
minhash_dedup_keep_first end-to-end over a >=1M-doc synthetic corpus —
the scale where the operator's exchanges, not its kernels, dominate —
and record throughput + exchange sizes for BASELINE.md. Also proves the
pair-count size-switch selects the DISTRIBUTED connected-components
path at this scale (cc_pair_threshold left at its 1M default would stay
driver-side here, so the soak forces the switch with a low threshold,
the same path a 100-TB corpus takes automatically).

Parity: the same generator at 1/100 scale is deduped both ways
(distributed CC vs driver union-find) and the surviving id sets must be
identical — the soak's correctness anchor without an O(n^2) oracle.

Usage: PYTHONPATH=/root/repo python tools/dedup_soak.py [n_docs] [cpus]
"""
import sys
import time

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def gen_corpus(n_docs: int, dup_rate: float = 0.12, seed: int = 7,
               blocks: int = 64) -> rd.Dataset:
    """Synthetic corpus with planted near-dup groups: every dup is its
    source doc with 2 of ~40 words changed (Jaccard ~0.9 on 3-shingles,
    well above the 0.5 threshold). Generated IN PARALLEL per block —
    the corpus never sits on the driver."""

    def make_block(b: pd.DataFrame) -> pd.DataFrame:
        idx = b["i"].to_numpy()
        n = len(idx)
        rng = np.random.default_rng(seed + int(idx[0]))
        # 40 random words per doc from a 2^30 vocab: accidental overlap
        # of >=2 words between unrelated docs is birthday-impossible,
        # so EVERY pair the dedup finds is a planted one
        ids = rng.integers(0, 1 << 30, size=(n, 40), dtype=np.int64)
        dup = (rng.random(n) < dup_rate) & (np.arange(n) > 0)
        for r in np.nonzero(dup)[0]:
            ids[r] = ids[r - 1]
            ids[r, 3] = -int(idx[r])  # 2 of 40 words perturbed:
            ids[r, 17] = -int(idx[r]) - 1  # 3-shingle Jaccard ~0.77
        texts = [" ".join(map(str, row)) for row in ids]
        return pd.DataFrame({"doc_id": idx, "text": texts})

    base = rd.range(n_docs, override_num_blocks=blocks).map_batches(
        lambda b: pd.DataFrame({"i": b["id"]}), batch_format="pandas"
    )
    return base.map_batches(make_block, batch_format="pandas")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from data_sync_ray.functions.dedup import minhash_dedup_keep_first

    # parity anchor at 1/100 scale: distributed CC == driver union-find
    small = gen_corpus(max(n_docs // 100, 2000), blocks=8).materialize()
    a = sorted(
        minhash_dedup_keep_first(small, threshold=0.5,
                                 distributed_cc=False)
        .select_columns(["doc_id"]).to_pandas()["doc_id"])
    b = sorted(
        minhash_dedup_keep_first(small, threshold=0.5,
                                 distributed_cc=True)
        .select_columns(["doc_id"]).to_pandas()["doc_id"])
    assert a == b, f"CC parity broke: {len(a)} vs {len(b)} survivors"
    print(f"parity@{small.count()}: {len(a)} survivors both paths")

    corpus = gen_corpus(n_docs).materialize()
    n_in = corpus.count()
    in_bytes = corpus.size_bytes()
    t0 = time.perf_counter()
    out = minhash_dedup_keep_first(
        corpus, threshold=0.5,
        cc_pair_threshold=0,  # force the distributed path (the 100-TB one)
        num_hashes=128, bands=32, rows=4,
    ).select_columns(["doc_id"]).materialize()
    n_out = out.count()
    dt = time.perf_counter() - t0
    print(
        f"dedup_soak: n_docs={n_in} bytes_in={in_bytes/1e6:.0f}MB "
        f"survivors={n_out} removed={n_in - n_out} "
        f"wall={dt:.1f}s docs_per_sec={n_in / dt:,.0f}"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
