"""CLI entry points — the reference's strategy modes (sync_mq / sync_direct
/ inspect, src/application/strategy/facade.go:13-17) as subcommands.

    python -m data_sync_ray.cli replay  --config job.toml --events DIR
    python -m data_sync_ray.cli repair  --config job.toml --snapshot PATH
    python -m data_sync_ray.cli inspect --config job.toml --events DIR
    python -m data_sync_ray.cli compact --config job.toml
    python -m data_sync_ray.cli export  --config job.toml --out DIR
    python -m data_sync_ray.cli lookup  --config job.toml --key doc00000042

Owns a Ray session (guarded init; the driver contract in __ray_entry__.py
never goes through here).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="data-sync-ray")
    p.add_argument("command",
                   choices=["replay", "tail", "bootstrap", "repair",
                            "inspect", "compact", "export", "control",
                            "status", "ingest", "view", "lookup"])
    p.add_argument("--config", required=True, help="TOML job config")
    p.add_argument("--events", help="event-log root (epoch=K dirs)")
    p.add_argument("--snapshot", help="parquet snapshot path (bootstrap/repair)")
    p.add_argument("--out", help="output dir (export; optional for tail: "
                                  "incremental per-round mirror)")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--no-catch-up", action="store_true")
    p.add_argument("--poll-interval", type=float, default=5.0)
    p.add_argument("--max-rounds", type=int, default=None)
    p.add_argument("--mode", choices=["run", "pause", "stop"],
                   help="strategy mode (control)")
    p.add_argument("--format", choices=["json", "prom"], default="json",
                   help="status output format (prom = Prometheus text)")
    p.add_argument("--partition-by", default="",
                   help="export: comma-separated columns for hive-style "
                        "output layout (out/col=value/...)")
    p.add_argument("--compact-over", type=int, default=0,
                   help="tail: compact partitions exceeding this many "
                        "live fragments between rounds (0 = off)")
    p.add_argument("--set", action="append", default=[],
                   metavar="KEY=JSON",
                   help="mutable config override for a running tail job")
    p.add_argument("--epoch", type=int, default=0,
                   help="ingest: epoch number to commit the batch under")
    p.add_argument("--source-format", default="maxwell",
                   choices=["maxwell", "debezium", "canal", "dms"],
                   help="ingest: CDC envelope of the JSON-lines input")
    p.add_argument("--key", help="lookup: primary-key value to read")
    p.add_argument("--as-of-epoch", type=int, default=None,
                   help="export: time-travel snapshot after this epoch "
                        "(bootstrap = -1)")
    p.add_argument("--manifest-version", type=int, default=None,
                   help="export: pin the read to a published manifest "
                        "version for snapshot consistency under a "
                        "concurrent tail (-1 = latest at export start)")
    p.add_argument("--name", default="source_stats",
                   help="view: materialized-view name to refresh/print")
    p.add_argument("--refresh-views", default="",
                   help="tail: comma-separated view names refreshed "
                        "incrementally after every round")
    p.add_argument("--http-port", type=int, default=None,
                   help="tail: serve the HTTP control/metrics endpoints "
                        "on this port (0 = pick a free one; omit = off)")
    args = p.parse_args(argv)

    # fail fast on missing per-command inputs — before paying ray.init
    required = {"replay": "events", "tail": "events", "inspect": "events",
                "ingest": "events", "bootstrap": "snapshot",
                "repair": "snapshot", "export": "out"}
    need = required.get(args.command)
    if need and not getattr(args, need):
        p.error(f"{args.command} requires --{need}")

    if args.command == "lookup":
        # point read: hash-route to the owning partition, zone-map skip
        # its fragments — driver-side file IO only, no Ray session
        if not args.key:
            p.error("lookup requires --key")
        from .config import SyncConfig
        from .state.lake import Lake

        lake = Lake(SyncConfig.from_toml(args.config).lake_root)
        t = lake.lookup(args.key)
        print(json.dumps(
            {"key": args.key, "found": t.num_rows > 0,
             "rows": t.to_pylist()}, default=str))
        return 0

    if args.command in ("control", "status"):
        # control-plane file ops need no Ray session (server.go analog)
        from .config import SyncConfig
        from .control import ControlPlane

        cp = ControlPlane(SyncConfig.from_toml(args.config).lake_root)
        if args.command == "control":
            overrides = {}
            for kv in args.set:
                k, _, v = kv.partition("=")
                overrides[k] = json.loads(v)
            # --set without --mode must not silently un-pause the job:
            # keep whatever mode the control file already holds
            mode = args.mode or cp.read_control()["strategy_mode"]
            cp.set_strategy_mode(mode, overrides)
            out = {"strategy_mode": mode, "overrides": overrides}
        else:
            out = cp.get_status() or {"status": "no status written yet"}
            if args.format == "prom":
                from .control import status_to_prometheus

                print(status_to_prometheus(out), end="")
                return 0
        print(json.dumps(out, default=str))
        return 0

    import ray

    if not ray.is_initialized():
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR", **kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from .config import SyncConfig
    from .pipelines.replay import ReplayJob, export_lake

    cfg = SyncConfig.from_toml(args.config)
    job = ReplayJob(cfg)
    if args.command == "replay":
        out = job.replay(args.events, catch_up=not args.no_catch_up)
        out.pop("metrics", None)
    elif args.command == "tail":
        views = tuple(v for v in args.refresh_views.split(",") if v)
        out = job.tail(args.events, poll_interval=args.poll_interval,
                       max_rounds=args.max_rounds, inspect_every=1,
                       compact_over_fragments=args.compact_over,
                       refresh_views=views, export_dir=args.out,
                       http_port=args.http_port)
    elif args.command == "bootstrap":
        out = {"partitions": len(job.bootstrap(rd.read_parquet(args.snapshot)))}
    elif args.command == "repair":
        out = {"partitions": len(job.repair(rd.read_parquet(args.snapshot)))}
    elif args.command == "inspect":
        out = job.inspect(args.events)
    elif args.command == "compact":
        out = {"compacted": sum(r["compacted"] for r in job.compact())}
    elif args.command == "ingest":
        # one JSON-lines CDC batch (any supported envelope) -> one epoch
        from .sources.canal import read_canal_json
        from .sources.debezium import read_debezium_json
        from .sources.dms import read_dms_json
        from .sources.maxwell import read_maxwell_json

        reader = {"maxwell": read_maxwell_json,
                  "debezium": read_debezium_json,
                  "canal": read_canal_json,
                  "dms": read_dms_json}[args.source_format]
        rows = job.apply_epoch(args.epoch, reader(args.events))
        out = {"epoch": args.epoch, "format": args.source_format,
               "events_applied": sum(r.get("events_in", 0) for r in rows),
               "partitions_committed": len(rows)}
    elif args.command == "view":
        from .state.views import REGISTRY

        df, n = REGISTRY[args.name](cfg.lake_root)
        out = {"view": args.name, "partitions_recomputed": n,
               "rows": df.to_dict(orient="records")}
    else:  # export
        mv = args.manifest_version
        if mv is not None and mv < 0:  # -1 = pin to CURRENT at start
            mv = job.lake.manifest_version()
            if mv is None:
                p.error("lake has no published manifest to pin")
        pb = [c for c in (args.partition_by or "").split(",") if c] or None
        export_lake(cfg.lake_root, args.out, as_of_epoch=args.as_of_epoch,
                    manifest_version=mv, partition_by=pb)
        out = {"exported_to": args.out, "as_of_epoch": args.as_of_epoch,
               "manifest_version": mv, "partition_by": pb}
    print(json.dumps(out, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
