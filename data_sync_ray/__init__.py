"""data_sync_ray — a Ray-Data-native CDC / incremental-ingest engine.

From-scratch reimplementation of the *capabilities* of yushaolong10/data-sync
(MySQL binlog CDC replication) as an idiomatic Ray Data pipeline: ordered
change events (insert/update/delete on doc_id) hash-partitioned and applied
via zero-copy Arrow map_batches on stateful actor pools performing
last-writer-wins merge-on-read upsert into a copy-on-write Parquet lake,
with exactly-once commit logs, checkpoint-resumable replay, schema
evolution by Arrow unification, and per-partition lineage metrics.
"""

from .config import SyncConfig, table_passes
from .datamodel import (
    CHANGE_EVENT_SCHEMA,
    LAKE_SCHEMA,
    StreamSpec,
    gen_base_table,
    gen_change_stream,
    list_epoch_dirs,
    replay_oracle,
    write_event_log,
)
from .pipelines.multi import MultiTableReplay
from .pipelines.replay import ReplayJob, export_lake, read_lake
from .sources.producer import EventLogProducer
from .stages.merge import events_to_delta, fold_state, lww_winners, unify_concat
from .stages.transform import (
    assign_partition,
    clear_custom_filters,
    key_histogram,
    make_transform,
    register_custom_filter,
)
from .state.lake import Lake

__all__ = [
    "CHANGE_EVENT_SCHEMA",
    "EventLogProducer",
    "LAKE_SCHEMA",
    "Lake",
    "MultiTableReplay",
    "ReplayJob",
    "StreamSpec",
    "SyncConfig",
    "assign_partition",
    "clear_custom_filters",
    "events_to_delta",
    "export_lake",
    "fold_state",
    "gen_base_table",
    "gen_change_stream",
    "key_histogram",
    "list_epoch_dirs",
    "lww_winners",
    "make_transform",
    "read_lake",
    "register_custom_filter",
    "replay_oracle",
    "table_passes",
    "unify_concat",
    "write_event_log",
]
