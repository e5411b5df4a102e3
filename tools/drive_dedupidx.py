"""Resumable multi-epoch DedupIndex drive for the chaos harness:
ingest 5 deterministic epochs (20k docs each, 20% planted cross-epoch
dups) into a persistent index under the given workdir, compacting all
partitions after epochs 1 and 3 so kills can land mid-compaction, then
compare the FULL survivor id set against a pandas keep-first oracle.

Re-running the same workdir after a SIGKILL must resume exactly: done
epochs replay their recorded survivor files, a partially-committed
epoch finishes its uncommitted partitions, and the final set is
id-for-id what a clean run produces (printed as
exact_token_equality= for tools/chaos_kill.py's grep).

Usage: PYTHONPATH=/root/repo python tools/drive_dedupidx.py <workdir>
           [ignored] [dedupidx|dedupidx:objstore]
"""
import os
import sys

import pandas as pd
import ray
import ray.data as rd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from dedupindex_soak import gen_epoch  # noqa: E402

N_PER_EPOCH = 20_000
N_EPOCHS = 5
N_PARTS = 8
COMPACT_AFTER = {1, 3}


def _neardup_oracle(allf: pd.DataFrame) -> list[int]:
    """Seen-rule reference for the neardup mode, independent of the
    engine's exchange: SimHash every doc, explode 4x16 bands in pandas,
    self-merge on band equality (complete at Hamming<=3 by pigeonhole),
    drop every doc with an EARLIER (epoch, doc_id) partner within 3."""
    import numpy as np

    from data_sync_ray.functions.dedup import SimHasher

    h = SimHasher()
    df = allf.copy()
    df["sig"] = (
        h(pd.DataFrame({"text": df["text"].tolist()}))["simhash"]
        .to_numpy()
        .astype(np.uint64)
    )
    rows = []
    for b in range(4):
        rows.append(pd.DataFrame({
            "band": b,
            "bh": ((df["sig"].to_numpy() >> np.uint64(16 * b))
                   & np.uint64(0xFFFF)).astype(np.int64),
            "doc_id": df["doc_id"].to_numpy(),
            "epoch": df["epoch"].to_numpy(),
            "sig": df["sig"].to_numpy(),
        }))
    fb = pd.concat(rows, ignore_index=True)
    m = fb.merge(fb, on=["band", "bh"], suffixes=("_a", "_b"))
    earlier = (m["epoch_b"] < m["epoch_a"]) | (
        (m["epoch_b"] == m["epoch_a"]) & (m["doc_id_b"] < m["doc_id_a"])
    )
    m = m[earlier]
    x = m["sig_a"].to_numpy() ^ m["sig_b"].to_numpy()
    ham = np.unpackbits(
        x.view(np.uint8).reshape(x.size, 8), axis=1
    ).sum(axis=1)
    dropped = set(m.loc[ham <= 3, "doc_id_a"].tolist())
    return sorted(
        int(i) for i in allf["doc_id"] if int(i) not in dropped
    )


def main() -> None:
    wd = sys.argv[1]
    mode = sys.argv[3] if len(sys.argv) > 3 else "dedupidx"
    backend = "objstore" if mode.endswith(":objstore") else None
    neardup = mode.startswith("neardup")
    os.makedirs(wd, exist_ok=True)
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    if neardup:
        # SimHash near-dup variant: same drive shape; with this
        # generator's unique-token texts the only Hamming<=3 pairs are
        # the planted exact dups (random 64-bit signatures collide at
        # <=3 with p ~ 2.4e-12/pair), but the ORACLE below brute-forces
        # the true seen-rule, so even an accidental near pair is
        # checked identically on both sides.
        from data_sync_ray.state.neardupindex import NearDupIndex as IDX
    else:
        from data_sync_ray.state.dedupindex import DedupIndex as IDX

    idx = IDX.create(
        os.path.join(wd, "idx"), num_partitions=N_PARTS, backend=backend
    )
    n_per = N_PER_EPOCH // 4 if neardup else N_PER_EPOCH
    got: list[int] = []
    for e in range(N_EPOCHS):
        surv = idx.ingest_epoch(gen_epoch(n_per, e, blocks=16), e)
        df = surv.to_pandas()
        n = 0 if len(df) == 0 else len(df)
        if n:
            got.extend(int(i) for i in df["doc_id"])
        print(f"epoch {e}: survivors={n}", flush=True)
        if e in COMPACT_AFTER:
            for p in range(N_PARTS):
                idx.compact(p)
            print(f"compacted after epoch {e}", flush=True)

    frames = [
        gen_epoch(n_per, e, blocks=16).to_pandas().assign(epoch=e)
        for e in range(N_EPOCHS)
    ]
    allf = pd.concat(frames, ignore_index=True)
    if neardup:
        want = _neardup_oracle(allf)
    else:
        # sequential oracle: keep-first over (epoch, doc_id) per text
        want = sorted(
            int(i)
            for i in allf.sort_values(["epoch", "doc_id"])
            .drop_duplicates("text")["doc_id"]
        )
    ok = sorted(got) == want
    print(f"survivors={len(got)} oracle={len(want)}")
    print(f"exact_token_equality={ok}")
    ray.shutdown()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
