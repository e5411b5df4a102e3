"""Host memory-bandwidth scaling probe — separates ENGINE scaling from
HARDWARE scaling on a single box.

Runs two synthetic Ray workloads at a given CPU count, each with the
same tasks-per-CPU ratio, so perfect hardware would give equal wall
time at any CPU count:

  cpu  — pure ALU loop, ~no memory traffic (the engine-overhead bound)
  mem  — 320 MB ndarray streaming per task (the DRAM-bandwidth bound)

Usage: python tools/membw_probe.py [ncpu ...]    (default: 2 8)

Interpretation: replay is a mix of the two; its measured 2->8 scaling
efficiency lands between the cpu and mem probes. On a ballooned VM the
mem probe collapses (~0.35 measured on this sandbox's worse boots)
because every worker shares ONE memory bus — a real 4x-node cluster
brings 4 buses, which is exactly what the single-box stand-in cannot
reproduce. See BASELINE.md "scaling evidence" for recorded numbers.
"""

import sys
import time

import numpy as np
import ray


@ray.remote
def _cpu_task(_):
    x = 1.0
    for _ in range(4_000_000):
        x = x * 1.0000001 + 0.1
    return x


@ray.remote
def _mem_task(_):
    a = np.ones(40_000_000)  # 320 MB stream
    for _ in range(4):
        a = a * 1.0001
    return a[0]


def probe(n: int) -> dict:
    ray.init(address="local", num_cpus=n, include_dashboard=False,
             logging_level="ERROR")
    out = {"ncpu": n}
    for name, f, per_cpu in (("cpu", _cpu_task, 4), ("mem", _mem_task, 2)):
        t0 = time.perf_counter()
        ray.get([f.remote(i) for i in range(n * per_cpu)])
        out[name] = round(time.perf_counter() - t0, 2)
    ray.shutdown()
    return out


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [2, 8]
    rows = [probe(n) for n in ns]
    for r in rows:
        print(r)
    if len(rows) == 2:
        a, b = rows
        for k in ("cpu", "mem"):
            # same tasks/cpu at both sizes: perfect hardware => ratio 1.0
            print(f"{k} scaling efficiency {a['ncpu']}->{b['ncpu']}: "
                  f"{a[k] / b[k]:.2f}")
