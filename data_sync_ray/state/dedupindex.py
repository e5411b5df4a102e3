"""Persistent cross-epoch exact-dedup index — dedup a NEW epoch of
documents against ALL previously-ingested history without reprocessing
that history.

The in-corpus dedup family (`functions/dedup.py`) answers "which rows
of THIS dataset are duplicates of each other". A 100-TB ingest is not
one dataset: it is a stream of crawl epochs, and the question becomes
"which rows of the NEW epoch were already seen in ANY earlier epoch"
(the FineWeb / CCNet "dedup each dump against the previous dumps"
pattern). Re-running a whole-corpus dedup per epoch is O(history) per
epoch — quadratic over the life of the pipeline. This module keeps a
persistent, hash-partitioned index of every content hash ever admitted
so each epoch costs O(epoch + touched index partitions) instead.

Layout (same storage abstraction as the lake — posix or the S3-style
conditional-put backend, `state/storage.py`):

    <root>/CONFIG.json                      {"kind","num_partitions"}
    <root>/checkpoints/part-NNNNN.json      {"partition","epochs":
                                             {"<e>": rel_or_null},
                                             "files":[...],"max_epoch"}
    <root>/checkpoints/_epochs.json         {"done":[...]} driver marker
    <root>/data/part=NNNNN/seen-eNNNNNNN.parquet
                                            (content_hash, doc_id)

Commit protocol (mirrors `Lake.commit_delta`, state/lake.py:348):
exactly ONE task commits a partition within an ingest (the
single-committer-per-partition invariant — `per_group` over a sort on
the routed partition id guarantees co-location); the data file is
written first, then the checkpoint JSON replaces atomically. A crash
between the two leaves an orphan fragment that the deterministic retry
overwrites byte-identically. A replayed (partition, epoch) no-ops and
returns the survivors recorded in its own epoch file, so crash/resume
yields the identical survivor set (exactly-once, same discipline as
the lake's commit log).

Epoch ordering IS the dedup semantics (first epoch wins, then min
doc_id): epochs must be ingested in increasing order, and a torn epoch
must be resumed before a later one starts — `ingest_epoch` enforces
both from the checkpoints (`pending` scan) and the driver-side done
marker, the lake's `mark_epoch_done` pattern.

100 TB: rows route to a fixed int partition by hash prefix (never one
group per distinct hash); each committer reads only its OWN partition's
seen-hash column (column-pruned parquet reads, bounded by 1/P of
history); survivors ship as (doc_id, content_hash) — 48 B/row, text
never enters the exchange (the `exact_dedup` payload_cols discipline).
`compact()` folds a partition's epoch files into one base so the
per-epoch read does not degrade to O(epochs) file opens.

Reference analog: none — the reference syncs row images keyed by PK
(`/root/reference/src/service/sync/strategy/impl/sync_mq.go`) and has
no content-identity dedup; this is part of the training-data operator
family the build brief adds on top.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .storage import make_storage
from ..stages.groupmap import per_group

_FRAG_RE = re.compile(r"^(seen-e\d{7}|base-c\d+)\.parquet$")

_SCHEMA = pa.schema(
    [("content_hash", pa.string()), ("doc_id", pa.int64())]
)


def _empty_survivors() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype=np.int64),
            "content_hash": pd.Series([], dtype=object),
        }
    )


class DedupIndex:
    """Handle to a dedup-index directory tree. Instances are cheap
    (paths only) — tasks construct their own from the root string, the
    same pattern as `Lake`."""

    _EPOCH_LOG_KEY = "checkpoints/_epochs.json"

    def __init__(self, root: str, backend: str | None = None):
        self.root = root
        self.storage = make_storage(root, backend)

    # --- creation -----------------------------------------------------------

    @staticmethod
    def create(
        root: str, num_partitions: int = 16, backend: str | None = None
    ) -> "DedupIndex":
        if num_partitions < 1:
            raise ValueError("num_partitions must be >= 1")
        idx = DedupIndex(root, backend)
        idx.storage.ensure_layout(dirs=("data", "checkpoints"))
        cfg = idx.storage.doc_read_json("CONFIG.json")
        if cfg is not None:
            # num_partitions is identity: changing it re-routes hashes to
            # different partitions, splitting a hash's history from its
            # new rows — the same immutability rule as the lake's
            if cfg["num_partitions"] != num_partitions:
                raise ValueError(
                    f"dedup index {root} exists with num_partitions="
                    f"{cfg['num_partitions']}; requested {num_partitions}"
                )
            return idx
        idx.storage.doc_write_json(
            "CONFIG.json",
            {"kind": "dedup_index", "num_partitions": num_partitions},
        )
        return idx

    def num_partitions(self) -> int:
        cfg = self.storage.doc_read_json("CONFIG.json")
        if cfg is None:
            raise FileNotFoundError(
                f"dedup index {self.root} has no CONFIG.json"
            )
        return int(cfg["num_partitions"])

    # --- checkpoints --------------------------------------------------------

    def _ckpt_key(self, partition: int) -> str:
        return f"checkpoints/part-{partition:05d}.json"

    def read_checkpoint(self, partition: int) -> dict:
        ck = self.storage.doc_read_json(self._ckpt_key(partition))
        if ck is None:
            return {
                "partition": partition,
                "epochs": {},
                "files": [],
                "max_epoch": -1,
            }
        return ck

    def write_checkpoint(self, ckpt: dict) -> None:
        self.storage.doc_write_json(self._ckpt_key(ckpt["partition"]), ckpt)

    def epochs_done(self) -> set[int]:
        doc = self.storage.doc_read_json(self._EPOCH_LOG_KEY)
        return set() if doc is None else set(doc["done"])

    def mark_epoch_done(self, epoch: int) -> None:
        done = self.epochs_done() | {epoch}
        self.storage.doc_write_json(
            self._EPOCH_LOG_KEY, {"done": sorted(done)}
        )

    def pending_epochs(self) -> set[int]:
        """Epochs some partition committed but the driver never marked
        done (a torn ingest). Must be resumed before any later epoch."""
        done = self.epochs_done()
        pend: set[int] = set()
        for name in self.storage.doc_list("checkpoints"):
            m = re.match(r"^part-(\d{5})\.json$", name)
            if not m:
                continue
            ck = self.read_checkpoint(int(m.group(1)))
            pend.update(int(e) for e in ck["epochs"] if int(e) not in done)
        return pend

    # --- the per-(partition, epoch) commit -----------------------------------

    def seen_hashes(self, partition: int, ckpt: dict | None = None):
        """The partition's full seen-hash set as a pandas Index (column-
        pruned read of 1/P of history — the only history this epoch's
        rows can collide with, by routing)."""
        ckpt = ckpt or self.read_checkpoint(partition)
        cols = []
        for rel in ckpt["files"]:
            t = self.storage.obj_read_table(
                f"data/{rel}", columns=["content_hash"]
            )
            if t.num_rows:
                cols.append(t.column("content_hash").to_pandas())
        if not cols:
            return pd.Index([], dtype=object)
        return pd.Index(pd.concat(cols, ignore_index=True))

    def commit_epoch_partition(
        self, partition: int, epoch: int, g: pd.DataFrame
    ) -> pd.DataFrame:
        """Exactly-once admit of one epoch's rows for one partition;
        returns the surviving (doc_id, content_hash) rows. `g` must be
        the COMPLETE set of this epoch's rows routing to `partition`
        (the single-committer invariant — checkpoints are
        read-modify-write)."""
        ckpt = self.read_checkpoint(partition)
        key = str(epoch)
        if key in ckpt["epochs"]:
            # replayed delivery (task retry / crash-resume): the epoch
            # file IS the recorded survivor set
            rel = ckpt["epochs"][key]
            if rel is None:
                return _empty_survivors()
            df = self.storage.obj_read_table(f"data/{rel}").to_pandas()
            if "epoch" in df.columns:  # compacted base holds all epochs
                df = df[df["epoch"] == epoch]
            return df[["doc_id", "content_hash"]].reset_index(drop=True)
        if epoch <= ckpt["max_epoch"]:
            raise ValueError(
                f"partition {partition} already past epoch {epoch} "
                f"(max committed {ckpt['max_epoch']}); epochs must be "
                "ingested in increasing order"
            )
        # within-epoch keep-first (min doc_id), then drop anything any
        # earlier epoch admitted
        g = g.sort_values("doc_id").drop_duplicates(
            "content_hash", keep="first"
        )
        novel = g[~g["content_hash"].isin(self.seen_hashes(partition, ckpt))]
        rel = None
        if len(novel):
            rel = os.path.join(
                f"part={partition:05d}", f"seen-e{epoch:07d}.parquet"
            )
            # deterministic content (sorted by doc_id): a retry after a
            # crash between data write and checkpoint write rewrites the
            # same bytes to the same name
            self.storage.obj_put_table(
                f"data/{rel}",
                pa.Table.from_pydict(
                    {
                        "content_hash": novel["content_hash"].to_numpy(),
                        "doc_id": novel["doc_id"].to_numpy(np.int64),
                    },
                    schema=_SCHEMA,
                ),
            )
            ckpt["files"] = sorted(set(ckpt["files"]) | {rel})
        ckpt["epochs"][key] = rel
        ckpt["max_epoch"] = epoch
        self.write_checkpoint(ckpt)  # atomic commit point
        out = novel[["doc_id", "content_hash"]].reset_index(drop=True)
        return out if len(out) else _empty_survivors()

    # --- the driver-side ingest ----------------------------------------------

    def ingest_epoch(
        self,
        ds: rd.Dataset,
        epoch: int,
        id_col: str = "doc_id",
        text_col: str = "text",
        batch_size: int = 4096,
    ) -> rd.Dataset:
        """Admit one epoch: keep-first within the epoch (min id), drop
        everything an earlier epoch admitted, record the survivors in
        the index. Returns the MATERIALIZED survivor dataset
        (`doc_id`, `content_hash`) — materialization is the commit
        barrier: when this returns, every partition's checkpoint holds
        the epoch and the driver marker is written. Survivors are the
        dedup DECISION only (48 B/row); callers needing full rows
        re-attach by id against their own epoch data, so text never
        enters the exchange."""
        done = self.epochs_done()
        if epoch in done:
            return self._replay_epoch(epoch)
        if done and epoch <= max(done):
            raise ValueError(
                f"epoch {epoch} is below the done watermark "
                f"{max(done)}; epochs must be ingested in increasing "
                "order"
            )
        pend = self.pending_epochs()
        if pend and epoch not in pend:
            raise ValueError(
                f"epoch(s) {sorted(pend)} are partially committed; "
                f"resume them before ingesting epoch {epoch}"
            )
        P = self.num_partitions()
        root = self.root

        def local_first(batch: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "doc_id": batch[id_col].to_numpy(np.int64),
                    "content_hash": [
                        hashlib.md5(t.encode()).hexdigest()
                        for t in batch[text_col]
                    ],
                }
            )
            out = out.sort_values("doc_id").drop_duplicates(
                "content_hash", keep="first"
            )
            # int() before %: numpy uint64 % python-int promotes to
            # float64 (CLAUDE.md route_partition regression)
            out["_part"] = (
                out["content_hash"].str.slice(0, 8)
                .apply(lambda s: int(s, 16) % P)
                .astype("int64")
            )
            return out

        def commit_group(g: pd.DataFrame) -> pd.DataFrame:
            p = int(g["_part"].iloc[0])
            idx = DedupIndex(root)
            return idx.commit_epoch_partition(
                p, epoch, g.drop(columns=["_part"])
            )

        survivors = (
            ds.map_batches(
                local_first, batch_format="pandas", batch_size=batch_size
            )
            .sort("_part")
            .map_batches(
                per_group(commit_group, "_part"),
                batch_size=None,
                batch_format="pyarrow",
            )
            .materialize()  # the commit barrier (this stage IS the sink)
        )
        self.mark_epoch_done(epoch)
        return survivors

    def _replay_epoch(self, epoch: int) -> rd.Dataset:
        """Idempotent re-ingest of a done epoch: the recorded survivor
        files are the answer. Distributed read — one task per recorded
        fragment, never a driver concat."""
        keys = []
        for p in range(self.num_partitions()):
            rel = self.read_checkpoint(p)["epochs"].get(str(epoch))
            if rel is not None:
                keys.append({"key": f"data/{rel}"})
        if not keys:
            return rd.from_arrow(
                pa.Table.from_pydict(
                    {"doc_id": [], "content_hash": []}, schema=_SCHEMA
                ).select(["doc_id", "content_hash"])
            )
        root = self.root

        def read_frag(batch: pd.DataFrame) -> pd.DataFrame:
            st = make_storage(root)
            outs = []
            for k in batch["key"]:
                df = st.obj_read_table(k).to_pandas()
                if "epoch" in df.columns:  # compacted base: all epochs
                    df = df[df["epoch"] == epoch]
                outs.append(df[["doc_id", "content_hash"]])
            return pd.concat(outs, ignore_index=True)

        return (
            rd.from_items(keys)
            .map_batches(read_frag, batch_format="pandas", batch_size=1)
            .materialize()
        )

    # --- maintenance ----------------------------------------------------------

    def compact(self, partition: int) -> dict:
        """Fold a partition's epoch files into one base so `seen_hashes`
        stays O(1) file opens as epochs accumulate. The base carries an
        `epoch` column so replayed ingests of old epochs still recover
        their exact survivor sets. Atomic: base written first, then the
        checkpoint swap; old fragments deleted only after the swap (a
        crash between leaves readable-but-unlisted orphans the next
        compaction's sweep removes — the lake's torn-retry discipline,
        state/lake.py compact_partition)."""
        ckpt = self.read_checkpoint(partition)
        gen = ckpt.get("compaction_gen", 0) + 1
        if len(ckpt["files"]) <= 1:
            return {"partition": partition, "compacted": False}
        parts = []
        for rel in ckpt["files"]:
            t = self.storage.obj_read_table(f"data/{rel}")
            df = t.to_pandas()
            if "epoch" not in df.columns:
                m = re.search(r"seen-e(\d{7})\.parquet$", rel)
                df["epoch"] = int(m.group(1)) if m else -1
            parts.append(df)
        folded = pd.concat(parts, ignore_index=True).sort_values(
            ["epoch", "doc_id"]
        )
        folded["epoch"] = folded["epoch"].astype(np.int64)
        folded["doc_id"] = folded["doc_id"].astype(np.int64)
        rel = os.path.join(
            f"part={partition:05d}", f"base-c{gen}.parquet"
        )
        # schema-agnostic fold (subclasses carry different row shapes);
        # deterministic column order + sort => idempotent retry bytes
        self.storage.obj_put_table(
            f"data/{rel}",
            pa.Table.from_pandas(
                folded.reset_index(drop=True), preserve_index=False
            ),
        )
        old = [f for f in ckpt["files"] if f != rel]
        ckpt["files"] = [rel]
        # every recorded epoch's survivors now live in the base
        ckpt["epochs"] = {
            k: (rel if v is not None else None)
            for k, v in ckpt["epochs"].items()
        }
        ckpt["compaction_gen"] = gen
        self.write_checkpoint(ckpt)  # atomic swap
        for f in old:
            self.storage.obj_delete(f"data/{f}")
        # sweep unlisted orphans from torn earlier compactions
        part_dir = f"data/part={partition:05d}"
        for name in self.storage.obj_list(part_dir):
            frag_rel = os.path.join(f"part={partition:05d}", name)
            if _FRAG_RE.match(name) and frag_rel != rel:
                self.storage.obj_delete(f"data/{frag_rel}")
        return {
            "partition": partition,
            "compacted": True,
            "rows": int(len(folded)),
        }
