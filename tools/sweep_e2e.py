"""Extended randomized e2e sweep: varied specs x exchange modes x catch-up,
exact-equality vs the sequential oracle each time."""
import os, shutil, sys, ray
ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import pyarrow as pa
from data_sync_ray import (ReplayJob, StreamSpec, SyncConfig, gen_base_table,
                           gen_change_stream, replay_oracle, write_event_log)

def equal(got, want):
    got = got.sort_by("doc_id"); want = want.sort_by("doc_id")
    if got.num_rows != want.num_rows: return False
    if set(got.column_names) != set(want.column_names): return False
    got = got.select(want.column_names)
    for c in want.column_names:
        g = got.column(c); w = want.column(c)
        if g.type != w.type: g = g.cast(w.type)
        if not pa.chunked_array([g.combine_chunks()]).equals(pa.chunked_array([w.combine_chunks()])):
            return False
    return True

fails = 0
# optional seed offset: each sweep invocation can explore fresh space
OFF = int(sys.argv[1]) if len(sys.argv) > 1 else 0
cases = []
for seed in range(100 + OFF, 110 + OFF):
    cases.append(dict(seed=seed, mode="spill", catch=True))
for seed in range(200 + OFF, 205 + OFF):
    cases.append(dict(seed=seed, mode="sort", catch=True))
for seed in range(300 + OFF, 305 + OFF):
    cases.append(dict(seed=seed, mode="spill", catch=False))
import numpy as np
rng = np.random.default_rng(9 + OFF)
for i, c in enumerate(cases):
    wd = f"/tmp/sweep/{i}"
    shutil.rmtree(wd, ignore_errors=True)
    n_docs = int(rng.integers(50, 400))
    spec = StreamSpec(
        n_events=int(rng.integers(500, 6000)), n_docs=n_docs,
        n_epochs=int(rng.integers(1, 6)), seed=c["seed"],
        op_mix=tuple((lambda p: p/p.sum())(rng.random(3) + 0.1)),
        hot_frac=float(rng.uniform(0.005, 0.1)),
        hot_weight=float(rng.uniform(0.1, 0.9)),
        decoy_table_frac=float(rng.uniform(0, 0.4)),
        evolve_from_epoch=(None if rng.random() < 0.5 else int(rng.integers(0, 3))),
    )
    base = gen_base_table(n_docs, seed=c["seed"])
    epochs = gen_change_stream(spec)
    ev = os.path.join(wd, "events"); write_event_log(ev, epochs)
    job = ReplayJob(SyncConfig(lake_root=os.path.join(wd, "lake"),
                               num_partitions=int(rng.choice([2, 4, 8, 16])),
                               exchange_mode=c["mode"],
                               spill_groups=int(rng.choice([2, 4, 8])),
                               fold_chunk_rows=int(rng.choice([64, 2048, 2_000_000]))))
    job.replay(ev, bootstrap=base, catch_up=c["catch"])
    ok = equal(job.lake.read_all(), replay_oracle(base, epochs))
    if not ok:
        fails += 1
        print(f"FAIL case {i}: {c} spec={spec}")
    shutil.rmtree(wd, ignore_errors=True)
print(f"SWEEP done: {len(cases)} cases, {fails} failures")
ray.shutdown()
sys.exit(1 if fails else 0)
