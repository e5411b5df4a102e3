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


def main() -> None:
    wd = sys.argv[1]
    mode = sys.argv[3] if len(sys.argv) > 3 else "dedupidx"
    backend = "objstore" if mode.endswith(":objstore") else None
    os.makedirs(wd, exist_ok=True)
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from data_sync_ray.state.dedupindex import DedupIndex

    idx = DedupIndex.create(
        os.path.join(wd, "idx"), num_partitions=N_PARTS, backend=backend
    )
    got: list[int] = []
    for e in range(N_EPOCHS):
        surv = idx.ingest_epoch(gen_epoch(N_PER_EPOCH, e, blocks=16), e)
        df = surv.to_pandas()
        n = 0 if len(df) == 0 else len(df)
        if n:
            got.extend(int(i) for i in df["doc_id"])
        print(f"epoch {e}: survivors={n}", flush=True)
        if e in COMPACT_AFTER:
            for p in range(N_PARTS):
                idx.compact(p)
            print(f"compacted after epoch {e}", flush=True)

    # sequential oracle: keep-first over (epoch, doc_id) per text
    frames = [
        gen_epoch(N_PER_EPOCH, e, blocks=16).to_pandas().assign(epoch=e)
        for e in range(N_EPOCHS)
    ]
    allf = pd.concat(frames, ignore_index=True)
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
