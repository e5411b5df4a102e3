"""Soak: the bench replay at 25M raw events (1M-doc bootstrap + 24M
events, 4 epochs, 128 partitions) — the sustained-throughput evidence in
BASELINE.md, checked in so it reruns identically.

Usage: python tools/soak.py [n_events] [n_docs] [n_epochs]
The fixture is seeded and cached under /tmp (first run pays generation).
"""
import os
import sys
import tempfile
import shutil
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
N_EPOCHS = int(sys.argv[3]) if len(sys.argv) > 3 else 4

import ray  # noqa: E402

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

import bench  # noqa: E402
from data_sync_ray import ReplayJob, SyncConfig, gen_base_table  # noqa: E402

bench.WORKLOADS["soak"] = (N_DOCS, N_EVENTS, N_EPOCHS)
fx = bench.fixture_dir("soak", N_DOCS, N_EVENTS, N_EPOCHS)
bench.warm_up_workers(32)
lake_root = tempfile.mkdtemp(prefix="soak_lake_")
job = ReplayJob(SyncConfig(lake_root=lake_root, num_partitions=128,
                           spill_groups=32, batch_size=65_536))
base = gen_base_table(N_DOCS, seed=42)
t0 = time.perf_counter()
summary = job.replay(os.path.join(fx, "events"), bootstrap=base)
dt = time.perf_counter() - t0
rows = job.lake.read_all().num_rows
raw = N_EVENTS + N_DOCS
print(f"SOAK: {raw} raw events in {dt:.1f}s = "
      f"{raw / dt:,.0f} events/s sustained; final rows {rows}")
shutil.rmtree(lake_root, ignore_errors=True)
ray.shutdown()
