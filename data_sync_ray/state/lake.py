"""Copy-on-write Parquet lake: versioned manifest, per-partition checkpoints
with idempotent commit logs, merge-on-read fold, and compaction.

Replaces target MySQL + the reference's plain-text watermark files
(/root/reference/src/application/mysql_handler.go:421-453) with a
principled exactly-once protocol the reference lacks (its delivery is
at-most-once — offsets marked before apply, mq_consumer.go:202-216; apply
errors swallowed after 3 retries, sync_mq.go:96-113).

Layout (resumable: one directory per hash partition, never one giant file):

    lake/
      CONFIG.json                      # SyncConfig used to create the lake
      data/part=00007/
        delta-e0000003.parquet         # LWW winners of epoch 3 for part 7
        delta-s4_9.parquet             # span delta: epochs 4..9 committed
                                       # together (rows carry `_epoch`)
        base-c0000002.parquet          # compaction output (generation 2)
      checkpoints/part-00007.json      # watermark, commit log, file list,
                                       # metrics, lineage
      manifest/v0000012.json           # driver-published union snapshot
      manifest/CURRENT                 # text: latest version number

Commit protocol per (partition, epoch):
  1. write delta parquet under a DETERMINISTIC name (epoch id in the name);
  2. atomically replace the partition checkpoint recording the epoch in
     `applied_epochs` (the commit log) + new watermark + file list.
A Ray task retry that re-runs step 1 rewrites the same bytes to the same
name (sorted deterministic content); a replay of an already-committed epoch
is detected from the commit log and becomes a no-op => exactly-once effect.
The checkpoint document commit is the single atomic commit point.

HOW that commit happens is delegated to a pluggable storage backend
(state/storage.py): `posix` (default — fsync + atomic rename + flock,
the pre-round-4 layout unchanged) or `objstore` (S3-semantics:
version-checked conditional puts, no rename/flock). Everything in this
file speaks only the backend interface; the exactly-once reasoning
above holds under both because the commit point is "the new checkpoint
version becomes the readable head atomically".
"""

from __future__ import annotations

import json
import os
import re
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import SyncConfig
from ..stages.merge import fold_state
from .storage import make_storage, sniff_backend

BOOTSTRAP_EPOCH = -1

#: committed checkpoint files only — a crash mid-atomic_write_json can leave
#: a partial "part-NNNNN.json.tmp.<pid>"; matching it would make resume fail
#: on JSONDecodeError, so listings must match the exact committed name
_CKPT_RE = re.compile(r"^part-(\d+)\.json$")


def atomic_write_json(path: str, obj) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _row_groups_for_range(md, key: str, key_range) -> list[int] | None:
    """Row-group ordinals whose key statistics can intersect [lo, hi]
    (None = all groups must be read — key absent from the file or no
    usable stats). Deltas are committed key-sorted, so group stats are
    tight. Groups without min/max are always kept; parquet truncated
    string bounds are written as true lower/upper bounds, so the skip
    test stays sound for long keys."""
    if md.num_row_groups == 0:
        return []
    try:
        names = [
            md.row_group(0).column(i).path_in_schema
            for i in range(md.num_columns)
        ]
        ki = names.index(key)
    except ValueError:
        return None
    lo, hi = key_range
    out = []
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(ki).statistics
        if st is None or not st.has_min_max:
            out.append(g)
            continue
        if (hi is not None and st.min > hi) or (
            lo is not None and st.max < lo
        ):
            continue
        out.append(g)
    return out


def _zorder_indices(state: pa.Table, cols: list[str]) -> np.ndarray:
    """Row order clustering `state` on the interleaved-bit Z-curve of
    the columns' dense value RANKS. Rank normalization (a monotone,
    scale-free transform) sidesteps the classic z-order pitfalls —
    mixed dtypes, signed values, wildly different ranges — while
    preserving exactly the locality the curve needs: nearby ranks in
    every dimension -> nearby z-values -> same output file, so each
    file's per-column min/max zone map covers a tight hyper-rectangle.
    Deterministic: stable argsorts throughout, and the input row order
    (a fold_state output) is itself deterministic."""
    n = state.num_rows
    ranks = []
    for c in cols:
        v = state.column(c).to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        r = np.empty(n, dtype=np.uint64)
        r[order] = np.arange(n, dtype=np.uint64)
        ranks.append(r)
    rank_bits = max(1, int(np.ceil(np.log2(max(n, 2)))))
    # The interleaved word is uint64: with k columns only 64 // k bit
    # positions exist per column. Past that the << count reaches 64 and
    # numpy silently wraps to 0, dropping the HIGH-order rank bits — the
    # ones that carry locality — so clustering would quietly collapse at
    # ~2M rows/partition for 3 columns (65k for 4). Cap bits per column
    # and keep each rank's MOST-significant bits (truncate low-order
    # detail, never the coarse position on the curve).
    bits = min(rank_bits, 64 // max(1, len(ranks)))
    if bits < rank_bits:
        drop = np.uint64(rank_bits - bits)
        ranks = [r >> drop for r in ranks]
    z = np.zeros(n, dtype=np.uint64)
    one = np.uint64(1)
    for b in range(bits):
        for j, r in enumerate(ranks):
            z |= ((r >> np.uint64(b)) & one) << np.uint64(
                b * len(ranks) + j
            )
    return np.argsort(z, kind="stable")


def _range_mask(col, key_range):
    """Boolean mask for lo <= col <= hi (None bound = unbounded)."""
    lo, hi = key_range
    mask = None
    if lo is not None:
        mask = pa.compute.greater_equal(col, lo)
    if hi is not None:
        le = pa.compute.less_equal(col, hi)
        mask = le if mask is None else pa.compute.and_(mask, le)
    if mask is None:
        mask = pa.array([True] * len(col))
    return mask


def _read_fragment(
    storage, key_path: str, columns: list[str] | None, key, key_range
) -> pa.Table:
    """Read one lake fragment, pruning parquet ROW GROUPS whose key
    stats fall outside key_range — the in-file complement of the
    per-file zone map (a point lookup in a compacted multi-GB partition
    decodes one row group, not the file)."""
    if key_range is None:
        return storage.obj_read_table(key_path, columns=columns)
    f = storage.obj_open(key_path)
    try:
        groups = _row_groups_for_range(f.metadata, key, key_range)
        if groups is None:
            return f.read(columns=columns)
        if not groups:
            schema = f.schema_arrow
            if columns is not None:
                schema = pa.schema(
                    [schema.field(c) for c in columns if c in schema.names]
                )
            return schema.empty_table()
        return f.read_row_groups(groups, columns=columns)
    finally:
        f.close()


class Lake:
    """Driver-side and task-side handle to the lake directory tree.

    Instances are cheap (paths only); partition state lives in the
    checkpoint JSONs so any task/actor can operate on its own partition
    without coordination (single-owner-per-partition discipline).
    """

    def __init__(self, root: str, backend: str | None = None):
        """backend=None sniffs an existing lake's storage layout (the
        objstore staging marker vs a plain CONFIG.json) so task-side
        `Lake(lake_root)` constructions need no extra plumbing; fresh
        roots default to posix."""
        self.root = root
        self.storage = make_storage(root, backend)
        # path attributes kept for posix-backend tooling/tests that
        # inspect the layout directly; engine code goes via storage
        self.data_dir = os.path.join(root, "data")
        self.ckpt_dir = os.path.join(root, "checkpoints")
        self.manifest_dir = os.path.join(root, "manifest")

    # --- creation / discovery ---------------------------------------------

    #: lake-identity fields: changing any of these on an existing lake
    #: re-routes keys to different partitions / reorders the LWW fold,
    #: leaving stale winners the per-partition fold can never supersede
    #: (storage_backend re-layouts the commit documents themselves)
    IMMUTABLE_FIELDS = (
        "num_partitions", "key_column", "order_column", "storage_backend"
    )

    @staticmethod
    def create(cfg: SyncConfig) -> "Lake":
        existing = sniff_backend(cfg.lake_root)
        if existing is not None and existing != cfg.storage_backend:
            raise ValueError(
                f"lake {cfg.lake_root} exists with storage_backend="
                f"{existing!r}; requested {cfg.storage_backend!r} "
                "(create a new lake_root to change the backend)"
            )
        lake = Lake(cfg.lake_root, backend=cfg.storage_backend)
        lake.storage.ensure_layout()
        if lake.storage.doc_exists("CONFIG.json"):
            # reopening an existing lake: immutable fields must match the
            # config it was created with (silent re-route otherwise)
            old = lake.config()
            diffs = [
                f
                for f in Lake.IMMUTABLE_FIELDS
                if getattr(old, f) != getattr(cfg, f)
            ]
            if diffs:
                raise ValueError(
                    f"lake {lake.root} exists with different immutable "
                    f"config fields {diffs}: "
                    + ", ".join(
                        f"{f}={getattr(old, f)!r} -> {getattr(cfg, f)!r}"
                        for f in diffs
                    )
                    + " (create a new lake_root to change these)"
                )
            if old == cfg:
                return lake  # identical: no write, no crash window at all
        # atomic commit: every ReplayJob run reopens the lake, and a torn
        # plain write here would brick the one file that identifies it
        lake.storage.doc_write_json("CONFIG.json", json.loads(cfg.to_json()))
        return lake

    def job_lock(self):
        """Advisory single-writer lock for the lake (backend-specific:
        flock on posix, a stealable CAS lease on objstore).

        The commit protocol assumes one replay job writes a lake at a
        time (per-partition checkpoints are read-modify-write)."""
        return self.storage.job_lock()

    def config(self) -> SyncConfig:
        b = self.storage.doc_read_bytes("CONFIG.json")
        if b is None:
            raise FileNotFoundError(
                f"lake {self.root} has no CONFIG.json (never created?)"
            )
        return SyncConfig.from_json(b.decode())

    def exists(self) -> bool:
        return self.storage.layout_exists()

    # --- partition checkpoints (commit log + watermark + lineage) ----------

    def _ckpt_key(self, partition: int) -> str:
        return f"checkpoints/part-{partition:05d}.json"

    def part_dir(self, partition: int) -> str:
        return os.path.join(self.data_dir, f"part={partition:05d}")

    def read_checkpoint(self, partition: int) -> dict:
        ck = self.storage.doc_read_json(self._ckpt_key(partition))
        if ck is None:
            return {
                "partition": partition,
                "watermark_log_pos": -1,
                "applied_epochs": [],
                "files": [],
                "events_applied": 0,
                "batches": 0,
                "failures": 0,
                "lineage": [],
            }
        return ck

    def write_checkpoint(self, ckpt: dict) -> None:
        self.storage.doc_write_json(self._ckpt_key(ckpt["partition"]), ckpt)

    def _ckpt_names(self) -> list[str]:
        """Committed checkpoint documents only (exact part-NNNNN.json
        names — never in-flight/orphaned partials from a crash
        mid-write; the backend's doc_list already excludes those)."""
        return sorted(
            n for n in self.storage.doc_list("checkpoints")
            if _CKPT_RE.match(n)
        )

    def sweep_stale_tmp(self) -> int:
        """Reclaim orphaned in-flight write artifacts (posix: *.tmp.*
        from a crash before replace; objstore: unlinked staging files).
        Safe under the job lock: no writer is mid-commit."""
        return self.storage.sweep_stale_tmp()

    def committed_partitions(self, epoch: int) -> set[int]:
        """Partitions whose commit log already contains `epoch`."""
        out = set()
        for name in self._ckpt_names():
            ck = self.storage.doc_read_json(f"checkpoints/{name}")
            if ck and epoch in ck.get("applied_epochs", []):
                out.add(ck["partition"])
        return out

    def watermarks(self) -> dict[int, int]:
        out = {}
        for name in self._ckpt_names():
            ck = self.storage.doc_read_json(f"checkpoints/{name}")
            if ck:
                out[ck["partition"]] = ck.get("watermark_log_pos", -1)
        return out

    # --- epoch-level commit markers (driver-level resume) -------------------

    _EPOCH_LOG_KEY = "checkpoints/_epochs.json"

    def epochs_done(self) -> set[int]:
        doc = self.storage.doc_read_json(self._EPOCH_LOG_KEY)
        return set() if doc is None else set(doc["done"])

    def mark_epoch_done(self, epoch: int) -> None:
        """Written by the driver only AFTER every partition group of the
        epoch has committed. Crash before this marker => the epoch re-runs;
        committed partitions no-op via their commit logs (exactly-once)."""
        done = self.epochs_done() | {epoch}
        self.storage.doc_write_json(self._EPOCH_LOG_KEY, {"done": sorted(done)})

    # --- the per-(partition, epoch) commit ---------------------------------

    def commit_delta(
        self, partition: int, epoch: int, delta: pa.Table, n_events_in: int
    ) -> dict:
        """Exactly-once append of one epoch's LWW winners for one partition.

        Returns the metrics record. No-op (replayed=True) when the commit
        log already holds this epoch — Ray task retries and duplicated
        delivery land here.
        """
        t0 = time.perf_counter()
        ckpt = self.read_checkpoint(partition)
        if epoch in ckpt["applied_epochs"]:
            return {
                "partition": partition,
                "epoch": epoch,
                "events_in": n_events_in,
                "rows_written": 0,
                "replayed": True,
                "watermark_log_pos": ckpt["watermark_log_pos"],
                "apply_sec": time.perf_counter() - t0,
            }
        tag = f"e{epoch:07d}" if epoch >= 0 else "bootstrap"
        fname = f"delta-{tag}.parquet"
        rel = os.path.join(f"part={partition:05d}", fname)
        if delta.num_rows:
            # deterministic content: sorted by key upstream; same retry =>
            # same bytes => idempotent under partial-crash rewrite (and
            # under the objstore backend's already-exists-means-done put).
            # key-sorted + bounded row groups = tight row-group zone maps
            # for _read_fragment's in-file pruning
            rg = self.config().row_group_rows
            self.storage.obj_put_table(
                f"data/{rel}", delta, row_group_size=rg
            )
            self._record_file_stats(ckpt, rel, delta)
        wm = ckpt["watermark_log_pos"]
        if delta.num_rows and "log_pos" in delta.column_names:
            mx = pa.compute.max(delta.column("log_pos")).as_py()
            if mx is not None:
                wm = max(wm, mx)
        ckpt["applied_epochs"] = sorted(set(ckpt["applied_epochs"]) | {epoch})
        ckpt["watermark_log_pos"] = wm
        if delta.num_rows:
            ckpt["files"] = sorted(set(ckpt["files"]) | {rel})
        ckpt["events_applied"] += n_events_in
        ckpt["batches"] += 1
        dt = time.perf_counter() - t0
        lineage = ckpt.setdefault("lineage", [])
        lineage.append(
            {
                "epoch": epoch,
                "events_in": n_events_in,
                "rows_written": delta.num_rows,
                "watermark_log_pos": wm,
                "apply_sec": round(dt, 6),
            }
        )
        # bounded lineage: keep the most recent entries only (aggregate
        # counters above carry the totals) — a long-lived partition would
        # otherwise grow its checkpoint without bound
        if len(lineage) > 200:
            del lineage[: len(lineage) - 200]
        self.write_checkpoint(ckpt)  # atomic commit point
        return {
            "partition": partition,
            "epoch": epoch,
            "events_in": n_events_in,
            "rows_written": delta.num_rows,
            "replayed": False,
            "watermark_log_pos": wm,
            "apply_sec": dt,
        }

    def commit_delta_span(
        self, partition: int, deltas: list[tuple[int, pa.Table, int]]
    ) -> list[dict]:
        """Exactly-once append of SEVERAL epochs' winners for one
        partition: ONE span delta file + ONE checkpoint commit.

        The round-4 batched-catch-up amortization: at equal volume a
        10-epoch backlog measured ~2.9x slower than a 4-epoch one purely
        from per-(partition, epoch) commit overhead (profiled: parquet
        writer setup + checkpoint RMW dominate). Per-epoch history stays
        time-travelable — every row carries its epoch in a private
        `_epoch` column and `delta-s{lo}_{hi}.parquet` holds exactly the
        concatenation of the per-epoch files it replaces, so
        files_as_of + read_partition's `_epoch` row filter reconstruct
        any horizon inside the span.

        deltas: (epoch, key-sorted normalized winners, n_events_in) in
        ascending epoch order. Epochs already in the commit log no-op
        (replayed=True) and are EXCLUDED from the span file, so a retry
        after a partial crash writes a differently-named (smaller) span
        and never clobbers a committed one. Same determinism contract as
        commit_delta: identical inputs => identical bytes."""
        import numpy as np

        from ..stages.merge import unify_concat

        t0 = time.perf_counter()
        ckpt = self.read_checkpoint(partition)
        out: list[dict] = []
        fresh: list[tuple[int, pa.Table, int]] = []
        for e, tbl, n_in in deltas:
            if e in ckpt["applied_epochs"]:
                out.append({
                    "partition": partition, "epoch": e,
                    "events_in": n_in, "rows_written": 0,
                    "replayed": True,
                    "watermark_log_pos": ckpt["watermark_log_pos"],
                    "apply_sec": 0.0,
                })
            else:
                fresh.append((e, tbl, n_in))
        if not fresh:
            return out
        tagged = [
            t.append_column(
                "_epoch",
                pa.array(np.full(t.num_rows, e, dtype=np.int64)),
            )
            for e, t, _ in fresh
            if t.num_rows
        ]
        combined = unify_concat(tagged) if tagged else None
        wm = ckpt["watermark_log_pos"]
        if combined is not None and combined.num_rows:
            lo, hi = fresh[0][0], fresh[-1][0]
            rel = os.path.join(
                f"part={partition:05d}", f"delta-s{lo}_{hi}.parquet"
            )
            self.storage.obj_put_table(
                f"data/{rel}", combined,
                row_group_size=self.config().row_group_rows,
            )
            self._record_file_stats(ckpt, rel, combined)
            ckpt["files"] = sorted(set(ckpt["files"]) | {rel})
            if "log_pos" in combined.column_names:
                mx = pa.compute.max(combined.column("log_pos")).as_py()
                if mx is not None:
                    wm = max(wm, mx)
        ckpt["applied_epochs"] = sorted(
            set(ckpt["applied_epochs"]) | {e for e, _, _ in fresh}
        )
        ckpt["watermark_log_pos"] = wm
        ckpt["events_applied"] += sum(n for _, _, n in fresh)
        ckpt["batches"] += 1
        dt = time.perf_counter() - t0
        lineage = ckpt.setdefault("lineage", [])
        for e, t, n_in in fresh:
            lineage.append({
                "epoch": e, "events_in": n_in,
                "rows_written": t.num_rows,
                "watermark_log_pos": wm, "apply_sec": round(dt, 6),
            })
            out.append({
                "partition": partition, "epoch": e, "events_in": n_in,
                "rows_written": t.num_rows, "replayed": False,
                "watermark_log_pos": wm, "apply_sec": dt,
            })
        if len(lineage) > 200:
            del lineage[: len(lineage) - 200]
        self.write_checkpoint(ckpt)  # the single atomic commit point
        return out

    # --- zone maps (per-file key min/max for data skipping) -----------------

    def _record_file_stats(self, ckpt: dict, rel: str, table: pa.Table) -> None:
        """Record the fragment's key-column zone map in the checkpoint it
        is committed under (same atomic replace — no extra crash window).
        CDC deltas cluster naturally on an auto-increment PK (inserts of
        an epoch occupy a fresh key band), which is exactly when zone
        maps prune; random-update-heavy fragments just won't skip."""
        cfg = self.config()
        key = cfg.key_column
        if key not in table.column_names or not table.num_rows:
            return
        mm = pa.compute.min_max(table.column(key))
        st = {
            "rows": table.num_rows,
            "key_min": mm["min"].as_py(),
            "key_max": mm["max"].as_py(),
        }
        # secondary-column zone maps (cfg.stats_columns): JSON-safe
        # scalar types only — a non-JSON min/max (timestamp, binary)
        # must never brick the checkpoint write it rides in
        cols = {}
        for c in cfg.stats_columns:
            if c == key or c not in table.column_names:
                continue
            cm = pa.compute.min_max(table.column(c))
            lo, hi = cm["min"].as_py(), cm["max"].as_py()
            if lo is None or not isinstance(lo, (int, float, str)):
                continue
            cols[c] = [lo, hi]
        if cols:
            st["cols"] = cols
        ckpt.setdefault("file_stats", {})[rel] = st

    @staticmethod
    def files_for_range(ckpt: dict, key_range) -> list[str]:
        """The subset of a checkpoint's files whose key zone map
        intersects [lo, hi] (either bound None = unbounded). Files with
        no recorded stats (pre-zone-map commits) are always included —
        skipping is an optimization, never a correctness gamble. Sound
        for the LWW fold: every fragment that can contain a key in the
        range intersects it, so in-range keys see all their versions
        (including tombstones)."""
        lo, hi = key_range
        out = []
        stats = ckpt.get("file_stats", {})
        for rel in ckpt["files"]:
            st = stats.get(rel)
            if st is None or st.get("key_min") is None:
                out.append(rel)
                continue
            if (hi is not None and st["key_min"] > hi) or (
                lo is not None and st["key_max"] < lo
            ):
                continue
            out.append(rel)
        return out

    @staticmethod
    def files_for_predicate(ckpt: dict, preds: dict) -> list[str]:
        """Prune by SECONDARY-column zone maps (cfg.stats_columns,
        recorded per fragment). preds: {col: (lo, hi)}, inclusive,
        None bound = unbounded, conjunctive.

        Soundness under LWW is STRICTER than the key's: a key's
        versions can carry different secondary values, so skipping a
        fragment by a secondary range can hide a version that would
        have WON the fold (e.g. a base row outranking a stale delta
        row). Secondary pruning therefore applies only when every live
        fragment is a compaction base — then each key exists in exactly
        ONE fragment and skipping it can only drop rows the post-fold
        filter would drop anyway. Any delta/span/unknown fragment in
        the list disables pruning entirely (the read stays correct,
        just unskipped) — the Delta-Lake-style OPTIMIZE-then-read flow,
        where clustering pays after compaction. Stat-less files and
        stat-less columns are always read."""
        files = list(ckpt["files"])
        if not preds:
            return files
        if any(Lake._frag_epoch(r)[0] != "base" for r in files):
            return files
        stats = ckpt.get("file_stats", {})
        out = []
        for rel in files:
            cols = (stats.get(rel) or {}).get("cols", {})
            keep = True
            for c, (lo, hi) in preds.items():
                st = cols.get(c)
                if st is None:
                    continue  # unprunable on this column
                if (hi is not None and st[0] > hi) or (
                    lo is not None and st[1] < lo
                ):
                    keep = False
                    break
            if keep:
                out.append(rel)
        return out

    _FRAG_RE = re.compile(
        r"(?:^|/)(?:delta-(?:bootstrap|e(?P<e>\d+))"
        r"|delta-s(?P<lo>-?\d+)_(?P<hi>-?\d+)"
        r"|base-c(?P<c>\d+)(?:-\d+)?)\.parquet$"
    )

    @classmethod
    def _frag_epoch(cls, rel: str):
        """(kind, epoch) of a fragment path: ('delta', e) with bootstrap
        as epoch -1, ('span', (lo, hi)) for a multi-epoch span delta
        (commit_delta_span; rows carry `_epoch`), or ('base', None) for
        a compaction output."""
        m = cls._FRAG_RE.search(rel)
        if m is None:
            return ("unknown", None)
        if m.group("c") is not None:
            return ("base", None)
        if m.group("lo") is not None:
            return ("span", (int(m.group("lo")), int(m.group("hi"))))
        e = m.group("e")
        return ("delta", -1 if e is None else int(e))

    @staticmethod
    def files_as_of(ckpt: dict, as_of_epoch: int) -> list[str]:
        """The fragment subset representing the partition's state after
        all epochs <= as_of_epoch (bootstrap = -1). Time travel rides
        the commit protocol for free: deltas are immutable and named by
        epoch, so an older state is just a shorter file list. Compaction
        DESTROYS history below its fold point — asking below
        compacted_through_epoch raises instead of answering wrong."""
        comp = ckpt.get("compacted_through_epoch")
        if comp is not None and as_of_epoch < comp:
            raise ValueError(
                f"partition {ckpt.get('partition')}: epochs <= {comp} were "
                f"compacted away; as_of_epoch={as_of_epoch} is unreadable "
                "(disable/auto-compaction retention if time travel is needed)"
            )
        out = []
        for rel in ckpt["files"]:
            kind, e = Lake._frag_epoch(rel)
            if kind == "delta" and e is not None and e > as_of_epoch:
                continue
            if kind == "span" and e[0] > as_of_epoch:
                continue  # span entirely after the horizon
            # a span STRADDLING the horizon (lo <= as_of < hi) is kept:
            # read_partition row-filters its `_epoch` column
            out.append(rel)  # bases (fold <= comp <= as_of) + old deltas
        return out

    def route_partition(self, key_value, key_type=None) -> int:
        """The hash partition owning `key_value` — the SAME hash and type
        the write path used (assign_partition), so point reads go to one
        partition. The probe is cast to the lake key column's type first:
        the hash is type-sensitive and a mistyped probe would silently
        route to a wrong (empty) partition. key_type: pass a
        pre-resolved _key_type() to skip the footer metadata read
        (lookup() already resolved it for its own cast)."""
        from ..stages.transform import stable_hash_strings

        cfg = self.config()
        arr = pa.array([key_value])
        kt = key_type if key_type is not None else self._key_type(
            cfg.key_column
        )
        if kt is not None:
            arr = arr.cast(kt)
        # int() BEFORE the modulo: np.uint64 % python-int promotes to
        # float64 and silently corrupts the partition id
        h = stable_hash_strings(arr)
        return int(h[0]) % cfg.num_partitions

    def _key_type(self, key: str):
        """Arrow type of the key column, from ONE fragment's footer —
        union_schema() reads every fragment's metadata, which would make
        a point lookup O(lake files) instead of O(1). Key type never
        varies across fragments (it routes partitioning)."""
        for p in self.partitions():
            for rel in self.read_checkpoint(p)["files"]:
                if self.storage.obj_exists(f"data/{rel}"):
                    s = self.storage.obj_read_schema(f"data/{rel}")
                    if key in s.names:
                        return s.field(key).type
                    return None
        return None

    def lookup(self, key_value) -> pa.Table:
        """Point read of one key's current row (empty table if absent or
        deleted): hash-route to the owning partition, zone-map skip its
        fragments, fold only what intersects. The CDC analog of the
        reference's per-row SELECT-before-apply, served from the lake."""
        kt = self._key_type(self.config().key_column)
        if kt is not None:
            # same cast route_partition applies: a type-mismatched probe
            # (int vs string key column) must behave consistently in BOTH
            # the hash route and the zone-map range compare, not route
            # correctly and then TypeError inside files_for_range
            key_value = pa.array([key_value]).cast(kt)[0].as_py()
        part = self.route_partition(key_value, key_type=kt)
        t = self.read_partition(part, key_range=(key_value, key_value))
        if t is None:
            schema = self.union_schema()
            if schema is None:
                from ..datamodel import LAKE_SCHEMA

                schema = LAKE_SCHEMA
            return schema.empty_table()
        return t

    def record_failure(self, partition: int, err: str = "") -> None:
        """Bump the partition's failure counter before the apply task
        re-raises (ref T4: fail counters, src/infrastructure/monitor/
        monitor.go:44-108). Safe RMW: the failing task is the partition's
        single owner in this execution, and the commit it was attempting
        did not happen (checkpoint replace is the commit point)."""
        ckpt = self.read_checkpoint(partition)
        ckpt["failures"] = ckpt.get("failures", 0) + 1
        if err:
            ckpt["last_error"] = err[:500]
        self.write_checkpoint(ckpt)

    # --- merge-on-read ------------------------------------------------------

    def partitions(self) -> list[int]:
        return sorted(
            int(_CKPT_RE.match(n).group(1)) for n in self._ckpt_names()
        )

    def read_partition(
        self,
        partition: int,
        drop_tombstones: bool = True,
        columns: list[str] | None = None,
        key_range=None,
        as_of_epoch: int | None = None,
        files_override: list[str] | None = None,
        where: dict | None = None,
    ) -> pa.Table:
        """Fold one partition's fragments into its current state (LWW,
        tombstones dropped). Fragment read order is irrelevant.
        drop_tombstones=False is the compaction path — see fold_state.

        as_of_epoch: time travel — fold only fragments from epochs
        <= this (see files_as_of; raises below the compaction horizon).
        Composes with key_range and columns.

        files_override: fold exactly these fragments (a pinned
        manifest's file list — snapshot-consistent reads while a writer
        commits). A referenced file that no longer exists RAISES
        (compaction removed it) instead of silently dropping rows.

        columns: projection pushdown — only the requested columns (plus
        the key/order/tombstone columns the fold itself needs, dropped
        again afterward) are READ from each parquet fragment, so a
        2-column scan of a wide lake never decodes the other columns.

        key_range: (lo, hi) inclusive bounds on the key column (either
        None = unbounded) — fragments whose zone map cannot intersect
        the range are skipped entirely (files_for_range), and the folded
        result is filtered to the range.

        where: {col: (lo, hi)} inclusive bounds on SECONDARY columns —
        the folded result is row-filtered to the conjunction, and on an
        all-base checkpoint (post-compaction, ideally z-ordered)
        fragments whose secondary zone maps cannot intersect are
        skipped first (files_for_predicate explains why all-base is the
        soundness boundary). Composes with key_range / columns /
        as_of_epoch."""
        ckpt = self.read_checkpoint(partition)
        needed = None
        key = order = None
        if columns is not None or key_range is not None:
            cfg = self.config()
            key, order = cfg.key_column, cfg.order_column
        if columns is not None:
            from ..stages.merge import DELETED_COL

            # `_epoch` must survive projection: span fragments need it
            # for as-of row filtering below (dropped again before return)
            needed = set(columns) | {key, order, DELETED_COL, "_epoch"}
            if where:
                needed |= set(where)  # pred columns survive to the filter
        if files_override is not None:
            # zone-map stats for still-live files remain usable
            ckpt = dict(ckpt, files=list(files_override))
        if as_of_epoch is not None:
            ckpt = dict(ckpt, files=self.files_as_of(ckpt, as_of_epoch))
        if where:
            ckpt = dict(ckpt, files=self.files_for_predicate(ckpt, where))
        files = (
            ckpt["files"]
            if key_range is None
            else self.files_for_range(ckpt, key_range)
        )
        frags = []
        for rel in files:
            kp = f"data/{rel}"
            if not self.storage.obj_exists(kp):
                if files_override is not None:
                    raise FileNotFoundError(
                        f"manifest-pinned fragment {rel} is gone "
                        "(compacted away); republish or read live state"
                    )
                continue
            cols = None
            if needed is not None:
                cols = [
                    c
                    for c in self.storage.obj_read_schema(kp).names
                    if c in needed
                ]
            frag = _read_fragment(self.storage, kp, cols, key, key_range)
            # restrict BEFORE the fold: per-key LWW commutes with key
            # filtering, and decoded-but-out-of-range rows (row-group
            # granularity) would otherwise ride through the whole fold
            if key_range is not None and key in frag.column_names:
                frag = frag.filter(_range_mask(frag.column(key), key_range))
            if "_epoch" in frag.column_names:
                # span fragment: a time-travel read keeps only rows at or
                # below the horizon; the column itself never leaves the
                # lake layer (per-row provenance, not payload)
                if as_of_epoch is not None:
                    frag = frag.filter(
                        pa.compute.less_equal(
                            frag.column("_epoch"), as_of_epoch
                        )
                    )
                frag = frag.drop_columns(["_epoch"])
            frags.append(frag)
        if not frags:
            return None
        if columns is not None or key_range is not None:
            t = fold_state(
                frags, key=key, order=order, drop_tombstones=drop_tombstones
            )
        else:
            t = fold_state(frags, drop_tombstones=drop_tombstones)
        if key_range is not None and key in t.column_names:
            # belt-and-braces: fragments were pre-filtered above, but a
            # fragment missing the key column rides through unfiltered
            t = t.filter(_range_mask(t.column(key), key_range))
        if where:
            # the actual predicate — zone maps above only SKIPPED files
            for c, rng in where.items():
                if c in t.column_names:
                    t = t.filter(_range_mask(t.column(c), rng))
        if drop_tombstones and "partition" in t.column_names:
            t = t.drop_columns(["partition"])
        if columns is not None:
            t = t.select([c for c in columns if c in t.column_names])
        return t

    def read_all(self) -> pa.Table:
        """Driver-side full fold — tests/small lakes only. Use
        pipelines.replay.read_lake() for the distributed path."""
        parts = [self.read_partition(p) for p in self.partitions()]
        parts = [p for p in parts if p is not None and p.num_rows]
        if not parts:
            from ..datamodel import LAKE_SCHEMA

            return LAKE_SCHEMA.empty_table()
        from ..stages.merge import unify_concat

        return unify_concat(parts).sort_by("doc_id")

    def metrics_dataset(self):
        """Per-partition lineage/metrics as a Dataset (the A4 metrics
        surface — ref: Prometheus counters, src/infrastructure/monitor/
        monitor.go:44-108). One row per (partition, applied epoch)."""
        import ray.data as rd

        rows = []
        for p in self.partitions():
            ck = self.read_checkpoint(p)
            for ln in ck.get("lineage", []):
                rows.append(
                    {
                        "partition": p,
                        "epoch": ln["epoch"],
                        "events_in": ln["events_in"],
                        "rows_written": ln["rows_written"],
                        "watermark_log_pos": ln["watermark_log_pos"],
                        "apply_sec": ln["apply_sec"],
                    }
                )
        if not rows:
            return rd.from_arrow(
                pa.schema(
                    [("partition", pa.int64()), ("epoch", pa.int64()),
                     ("events_in", pa.int64()), ("rows_written", pa.int64()),
                     ("watermark_log_pos", pa.int64()),
                     ("apply_sec", pa.float64())]
                ).empty_table()
            )
        return rd.from_items(rows)

    def union_schema(self) -> pa.Schema | None:
        """Unified schema across all live fragments (metadata-only reads) —
        the evolved lake schema (pa.unify_schemas: column add / widen)."""
        schemas = []
        for p in self.partitions():
            for rel in self.read_checkpoint(p)["files"]:
                if self.storage.obj_exists(f"data/{rel}"):
                    schemas.append(self.storage.obj_read_schema(f"data/{rel}"))
        if not schemas:
            return None
        s = pa.unify_schemas(schemas, promote_options="permissive")
        drop = [n for n in ("_deleted", "partition", "_epoch") if n in s.names]
        for n in drop:
            s = s.remove(s.get_field_index(n))
        return s

    # --- compaction ---------------------------------------------------------

    def compact_partition(
        self,
        partition: int,
        zorder_by: list[str] | None = None,
        max_rows_per_file: int | None = None,
        up_to_epoch: int | None = None,
    ) -> dict:
        """Rewrite a partition's fragments into base file(s) and truncate
        the fragment list (copy-on-write: new files written+committed
        before old files are deleted; crash in between leaves harmless
        orphans that a later compaction removes).

        zorder_by: cluster the folded state on the Z-curve of these
        columns before writing (see _zorder_indices), so the per-file
        secondary zone maps (cfg.stats_columns) become selective and
        files_for_predicate can skip whole fragments on multi-column
        range reads — the Delta OPTIMIZE ZORDER BY analog. Pair with
        max_rows_per_file (one base file per chunk, `base-cNNNNNNN-MMM`)
        or the clustering has a single file to prune. Trade-off stated:
        a z-ordered base is no longer key-sorted, so in-FILE row-group
        key pruning loosens; whole-file key min/max still prune between
        bases.

        up_to_epoch: PARTIAL fold — only the existing base plus deltas
        from epochs <= this fold into the new base; later deltas stay
        live, so time travel above the horizon keeps working while
        history at/below it is destroyed (compacted_through_epoch
        advances to the max folded epoch, not to max(applied)). This is
        vacuum()'s mechanism: retention as a stated policy. A span
        delta STRADDLING the horizon is kept whole, never split — its
        below-horizon rows simply remain readable a little longer
        (retention is a minimum guarantee, and duplicating them into
        the base would double-count rows in later folds)."""
        ckpt = self.read_checkpoint(partition)
        if not ckpt["files"]:
            # empty partition: nothing to fold, and bumping gen /
            # compacted_through_epoch here would make a later as_of read
            # below max(applied_epochs) spuriously raise even though no
            # history was destroyed
            return {"partition": partition, "compacted": False}
        if up_to_epoch is None:
            fold_files = list(ckpt["files"])
        else:
            # a horizon below an earlier compaction's fold point is not
            # an error: everything <= it is already destroyed, so the
            # fold set naturally reduces to the base(s) and the
            # fixed-point guard below no-ops (vacuum over mixed-history
            # partitions must not abort on the deepest-compacted one)
            fold_files = []
            for rel in ckpt["files"]:
                kind, e = Lake._frag_epoch(rel)
                if (
                    kind == "base"
                    or (kind == "delta" and e <= up_to_epoch)
                    or (kind == "span" and e[1] <= up_to_epoch)
                ):
                    fold_files.append(rel)
        keep_files = [f for f in ckpt["files"] if f not in fold_files]
        if len(fold_files) <= 1 and not zorder_by:
            return {"partition": partition, "compacted": False}
        if (
            up_to_epoch is not None
            and all(
                Lake._frag_epoch(f)[0] == "base" for f in fold_files
            )
            and list(zorder_by or []) == ckpt.get("zorder_by", [])
        ):
            # vacuum fixed point: nothing at/below the horizon but the
            # existing (possibly multi-chunk) base — repeated vacuums
            # must not rewrite it every call
            return {"partition": partition, "compacted": False}
        if (
            len(fold_files) == 1
            and Lake._frag_epoch(fold_files[0])[0] == "base"
            and list(zorder_by or []) == ckpt.get("zorder_by", [])
        ):
            # a lone base with no foldable deltas and an unchanged
            # clustering spec is already the compaction fixed point —
            # rewriting it every call (drive_verify's zorder mode
            # compacts each epoch) would churn gen/files (invalidating
            # views) for zero data change. Changing zorder_by still
            # re-clusters.
            return {"partition": partition, "compacted": False}
        # the new time-travel horizon: the max epoch whose delta is
        # being destroyed (span = its upper bound; bootstrap = -1)
        folded_epochs = [
            (e if kind == "delta" else e[1])
            for kind, e in map(Lake._frag_epoch, fold_files)
            if kind in ("delta", "span")
        ]
        # tombstones retained: a compacted base must keep winning deletes
        # or a stale event below the delete's log_pos could resurrect keys
        state = self.read_partition(
            partition, drop_tombstones=False, files_override=fold_files
        )
        gen = ckpt.get("compaction_gen", 0) + 1
        # pre-sweep uncommitted leftovers of THIS gen from a torn earlier
        # attempt: gen = committed_gen + 1, so any base-c{gen} fragment on
        # disk is garbage no checkpoint references. Without this, a retry
        # that chunks differently (max_rows_per_file changed / state
        # shrank) would leak higher-numbered orphan chunks forever — and
        # on the object-store backend obj_put_table's idempotent
        # put-if-absent would silently KEEP the torn attempt's bytes for
        # overlapping names while file_stats describe the new fold.
        part_dir = f"data/part={partition:05d}"
        stale_prefix = f"base-c{gen:07d}"
        for name in self.storage.obj_list(part_dir):
            # boundary check: gen widens past 7 digits eventually, and a
            # shorter gen must never prefix-match a longer one's files
            if name.startswith(stale_prefix) and name[
                len(stale_prefix) : len(stale_prefix) + 1
            ] in (".", "-"):
                self.storage.obj_delete(f"{part_dir}/{name}")
        old = list(fold_files)
        kept_stats = {
            k: v
            for k, v in ckpt.get("file_stats", {}).items()
            if k in keep_files
        }
        ckpt["file_stats"] = kept_stats
        ckpt["files"] = []
        if state is not None and state.num_rows:
            if zorder_by:
                missing = [
                    c for c in zorder_by if c not in state.column_names
                ]
                if missing:
                    raise ValueError(
                        f"zorder_by columns {missing} not in partition "
                        f"{partition}'s state"
                    )
                state = state.take(
                    pa.array(_zorder_indices(state, list(zorder_by)))
                )
            n = state.num_rows
            per = max_rows_per_file or n
            rg = self.config().row_group_rows
            starts = list(range(0, n, per))
            for j, s in enumerate(starts):
                fname = (
                    f"base-c{gen:07d}.parquet"
                    if len(starts) == 1
                    else f"base-c{gen:07d}-{j:03d}.parquet"
                )
                rel = os.path.join(f"part={partition:05d}", fname)
                chunk = state.slice(s, per)
                self.storage.obj_put_table(
                    f"data/{rel}", chunk, row_group_size=rg
                )
                ckpt["files"].append(rel)
                self._record_file_stats(ckpt, rel, chunk)
        ckpt["files"] = sorted(set(ckpt["files"]) | set(keep_files))
        ckpt["compaction_gen"] = gen
        ckpt["zorder_by"] = list(zorder_by or [])
        # time-travel horizon: states at/below this epoch are no longer
        # reconstructable from this partition (their deltas are folded).
        # Partial folds advance it only to the max DESTROYED epoch, so
        # as-of reads above the vacuum horizon keep working.
        prev_cte = ckpt.get("compacted_through_epoch")
        if folded_epochs:
            ckpt["compacted_through_epoch"] = max(
                [*folded_epochs]
                + ([prev_cte] if prev_cte is not None else [])
            )
        self.write_checkpoint(ckpt)  # commit point
        for r in old:
            self.storage.obj_delete(f"data/{r}")
        return {
            "partition": partition,
            "compacted": True,
            "rows": 0 if state is None else state.num_rows,
            "files_removed": len(old),
        }

    def vacuum(
        self,
        retain_epochs: int,
        zorder_by: list[str] | None = None,
        max_rows_per_file: int | None = None,
    ) -> dict:
        """Retention as a STATED POLICY instead of a compaction side
        effect: fold every partition's deltas from epochs <=
        latest - retain_epochs into its base, keeping the most recent
        `retain_epochs` epochs time-travelable. Reads inside the horizon
        stay exact (their deltas are untouched); as-of reads at/below
        the horizon raise, as all destroyed history does.
        retain_epochs=0 folds everything (full compaction of the lake).

        `latest` is max(epochs_done()) — the driver's global epoch
        marker — falling back to the max applied epoch across
        partitions for lakes driven without epoch markers. Partitions
        with nothing old enough to fold no-op (no gen churn, views keep
        their fingerprints). At object-store scale this is the
        metadata-relief knob: a long-running lake's per-partition file
        count stays O(retain_epochs), not O(all epochs ever)."""
        if retain_epochs < 0:
            raise ValueError("retain_epochs must be >= 0")
        done = self.epochs_done()
        if done:
            latest = max(done)
        else:
            applied = [
                e
                for p in self.partitions()
                for e in self.read_checkpoint(p)["applied_epochs"]
            ]
            if not applied:
                return {"horizon": None, "results": []}
            latest = max(applied)
        horizon = latest - retain_epochs
        results = [
            self.compact_partition(
                p,
                zorder_by=zorder_by,
                max_rows_per_file=max_rows_per_file,
                up_to_epoch=horizon,
            )
            for p in self.partitions()
        ]
        return {"horizon": horizon, "results": results}

    # --- manifest (driver-published union snapshot) -------------------------

    def manifest_version(self) -> int | None:
        """Latest published manifest version (None if never published)."""
        b = self.storage.doc_read_bytes("manifest/CURRENT")
        return None if b is None else int(b.decode().strip())

    def read_manifest(self, version: int | None = None) -> dict:
        """Load manifest vN (None = CURRENT). Raises FileNotFoundError
        if that version was never published."""
        if version is None:
            version = self.manifest_version()
            if version is None:
                raise FileNotFoundError(
                    f"lake {self.root} has no published manifest"
                )
        doc = self.storage.doc_read_json(f"manifest/v{version:07d}.json")
        if doc is None:
            raise FileNotFoundError(
                f"lake {self.root} has no manifest v{version}"
            )
        return doc

    def publish_manifest(self, note: str = "") -> int:
        version = (self.manifest_version() or 0) + 1
        parts = {}
        schema_names: set[str] = set()
        for p in self.partitions():
            ck = self.read_checkpoint(p)
            parts[str(p)] = {
                "watermark_log_pos": ck["watermark_log_pos"],
                "applied_epochs": ck["applied_epochs"],
                "files": ck["files"],
                "events_applied": ck["events_applied"],
            }
            for rel in ck["files"]:
                if self.storage.obj_exists(f"data/{rel}"):
                    schema_names.update(
                        self.storage.obj_read_schema(f"data/{rel}").names
                    )
        self.storage.doc_write_json(
            f"manifest/v{version:07d}.json",
            {
                "version": version,
                "note": note,
                "columns": sorted(schema_names),
                "partitions": parts,
            },
        )
        # pointer swap AFTER the manifest body lands; on objstore this is
        # the version-checked CAS (a concurrent publisher conflicts here)
        self.storage.doc_write_bytes("manifest/CURRENT", str(version).encode())
        return version
