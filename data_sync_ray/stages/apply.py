"""Stateful apply stage: the per-partition LWW upsert writer, run as a Ray
actor pool via ``groupby("partition").map_groups(PartitionApplier, ...)``.

The reference serializes every apply through one goroutine + one SQL
round-trip per event (/root/reference/src/application/strategy/syncmq/
sync_mq.go:30,74-94, mysql_handler.go:296-311). Here each hash partition of
doc_id is owned by exactly one group-task per epoch, giving the same per-key
serial-apply guarantee N-way parallel, and the actor pool amortizes state
setup across batches (the actor-state analog of the reference's metadata LRU,
mysql_handler.go:45-53).
"""

from __future__ import annotations

import pyarrow as pa

from ..config import SyncConfig
from ..state.lake import Lake
from .merge import events_to_delta, lww_winners

METRICS_SCHEMA = pa.schema(
    [
        ("partition", pa.int32()),
        ("epoch", pa.int64()),
        ("events_in", pa.int64()),
        ("rows_written", pa.int64()),
        ("replayed", pa.bool_()),
        ("watermark_log_pos", pa.int64()),
        ("apply_sec", pa.float64()),
        # skew lineage: events landing on the hottest key of this group —
        # post-combine this is bounded by the upstream batch count, proving
        # the two-phase LWW keeps hot keys harmless (SURVEY §4.2 salting)
        ("max_key_events", pa.int64()),
    ]
)


class PartitionApplier:
    """Callable class for map_groups: one group = one (partition, epoch).

    __init__ runs once per actor (lake handle, config parse — ref: schema
    LRU T1); __call__ runs per partition-group: final LWW reduce ->
    delta normalize -> exactly-once commit via the lake's commit log.
    """

    def __init__(self, lake_root: str, epoch: int | None, cfg_json: str):
        """epoch=None (catch-up mode): each group carries its own epoch
        column; the group key is (partition, epoch)."""
        # one Arrow thread per task: N concurrent tasks each spinning up
        # pyarrow's default per-process pool (=all cores) oversubscribes the
        # node ~Nx and quadruples per-task latency at high concurrency
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
        self.lake = Lake(lake_root)
        self.epoch = epoch
        self.cfg = SyncConfig.from_json(cfg_json)

    def __call__(self, group: pa.Table, n_in: int | None = None) -> pa.Table:
        """n_in: raw (pre-combine) event count override — the chunked fold
        reduces fragments before calling, so group.num_rows undercounts."""
        if group.num_rows == 0:
            return METRICS_SCHEMA.empty_table()
        partition = group.column("partition")[0].as_py()
        epoch = self.epoch
        if epoch is None:
            epoch = group.column("epoch")[0].as_py()
            group = group.drop_columns(["epoch"])
        if n_in is None:
            n_in = group.num_rows
        vc = pa.compute.value_counts(group.column(self.cfg.key_column))
        max_key = (
            pa.compute.max(vc.field("counts")).as_py() if len(vc) else 0
        )
        try:
            winners = lww_winners(
                group, key=self.cfg.key_column, order=self.cfg.order_column
            )
            delta = events_to_delta(winners)
            # deterministic file content under task retries: sort by key
            delta = delta.sort_by(self.cfg.key_column)
            m = self.lake.commit_delta(partition, epoch, delta, n_in)
        except Exception as e:  # count, then let Ray retry the task (T4)
            try:
                self.lake.record_failure(partition, repr(e))
            except Exception:
                pass
            raise
        return pa.Table.from_pylist(
            [
                {
                    "partition": m["partition"],
                    "epoch": m["epoch"],
                    "events_in": m["events_in"],
                    "rows_written": m["rows_written"],
                    "replayed": m["replayed"],
                    "watermark_log_pos": m["watermark_log_pos"],
                    "apply_sec": m["apply_sec"],
                    "max_key_events": int(max_key),
                }
            ],
            schema=METRICS_SCHEMA,
        )
