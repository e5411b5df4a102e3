"""Multi-table sync: one ReplayJob (and one lake) per logical table — the
analog of the reference syncing every table of a task under its
include/exclude rules (/root/reference/src/application/mysql_handler.go:
483-525 iterates the source∩target table intersection).

Each table gets `lake_root/<table>/` and an include filter of exactly that
table; the event log is shared. Replay performs one pass per table (the
transform prunes foreign-table rows in its first vectorized filter); for
wide many-table tasks, run tables concurrently from the driver or shard
the event log by table upstream.
"""

from __future__ import annotations

import dataclasses
import os

import pyarrow as pa
import ray.data as rd

from ..config import SyncConfig
from .replay import ReplayJob


class MultiTableReplay:
    def __init__(self, base_cfg: SyncConfig, tables: list[str]):
        self.tables = list(tables)
        self.jobs: dict[str, ReplayJob] = {}
        for t in self.tables:
            cfg = dataclasses.replace(
                base_cfg,
                lake_root=os.path.join(base_cfg.lake_root, t),
                include_tables=(t,),
            )
            self.jobs[t] = ReplayJob(cfg)

    def replay(
        self,
        events_root: str,
        bootstraps: dict[str, pa.Table | rd.Dataset] | None = None,
    ) -> dict[str, dict]:
        out = {}
        for t in self.tables:
            boot = (bootstraps or {}).get(t)
            out[t] = self.jobs[t].replay(events_root, bootstrap=boot)
        return out

    def read_table(self, table: str) -> pa.Table:
        return self.jobs[table].lake.read_all()

    def inspect(self, events_root: str) -> dict[str, dict]:
        return {t: self.jobs[t].inspect(events_root) for t in self.tables}
