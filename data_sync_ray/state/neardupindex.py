"""Persistent cross-epoch NEAR-dup index — SimHash companion to
`DedupIndex` (state/dedupindex.py): admit a new epoch's documents
against ALL previously-seen history at Hamming distance <= 3 over
64-bit SimHash signatures, without reprocessing that history.

Admit rule (the streaming semantics, stated once): a document is
DROPPED iff some EARLIER-SEEN document — earlier epoch, or same epoch
with a smaller doc_id — has a signature within `max_hamming`. "Seen",
not "admitted": the index stores every document's band rows, so the
rule is locally decidable per band bucket (an admitted-only index
would make each decision depend on the transitive fate of its
neighbors — the component-closure semantics the in-corpus
`simhash_dedup_keep_first` computes, which cannot be maintained
incrementally without rewriting history). This is the conservative
variant: anything near anything ever seen goes.

Completeness: signatures split into 4 x 16-bit bands; at
max_hamming <= 3 a near pair agrees on >= 1 band (pigeonhole), and a
document's 4 band rows land in the 4 partitions owning those band
buckets — so comparing each new row only against its own (band,
band_hash) bucket still sees every near pair, exactly the
`simhash_dup_pairs` argument (functions/dedup.py).

Layout, commit protocol, epoch ordering, torn-epoch resume and
compaction are inherited from DedupIndex verbatim (one committer task
per partition, data file then atomic checkpoint, replayed
(partition, epoch) answers from its recorded file). Band rows are
(band, band_hash, simhash_int, doc_id, matched) — simhash stored as
the two's-complement int64 view (the fixture convention), ~40 B/row,
4 rows/doc: at 100 TB (~10^11 docs) the index is ~16 TB of hash-
partitioned parquet, read one partition-slice per committer.

Reference analog: none — part of the training-data operator family
added on top of the reference's PK-keyed sync surface.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .dedupindex import DedupIndex, _empty_survivors  # noqa: F401
from ..stages.groupmap import per_group

_BANDS = 4
_BAND_BITS = 16

_ROW_SCHEMA = pa.schema(
    [
        ("band", pa.int64()),
        ("band_hash", pa.int64()),
        ("simhash_int", pa.int64()),
        ("doc_id", pa.int64()),
        ("matched", pa.int8()),
    ]
)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over a uint64 array (the simhash_dup_pairs
    byte-unpack trick)."""
    return np.unpackbits(
        x.view(np.uint8).reshape(x.size, 8), axis=1
    ).sum(axis=1)


def _explode_bands(sig: np.ndarray, doc_ids: np.ndarray, P: int
                   ) -> pd.DataFrame:
    """(n,) uint64 signatures -> (4n,) band rows routed to fixed int
    partitions by (band_hash, band)."""
    n = sig.size
    bh = np.stack(
        [
            (sig >> np.uint64(_BAND_BITS * b)) & np.uint64(0xFFFF)
            for b in range(_BANDS)
        ],
        axis=1,
    )  # (n, 4)
    band = np.tile(np.arange(_BANDS, dtype=np.int64), n)
    bh_flat = bh.astype(np.int64).ravel()
    return pd.DataFrame(
        {
            "band": band,
            "band_hash": bh_flat,
            "simhash_int": np.repeat(sig.view(np.int64), _BANDS),
            "doc_id": np.repeat(doc_ids.astype(np.int64), _BANDS),
            # int() route discipline not needed: all-int64 numpy here
            "_part": (bh_flat * _BANDS + band) % P,
        }
    )


class NearDupIndex(DedupIndex):
    """Cross-epoch SimHash near-dup index. See module docstring."""

    _KIND = "neardup_index"

    @staticmethod
    def create(
        root: str, num_partitions: int = 16, backend: str | None = None
    ) -> "NearDupIndex":
        if num_partitions < 1:
            raise ValueError("num_partitions must be >= 1")
        idx = NearDupIndex(root, backend)
        idx.storage.ensure_layout(dirs=("data", "checkpoints"))
        cfg = idx.storage.doc_read_json("CONFIG.json")
        if cfg is not None:
            if cfg["num_partitions"] != num_partitions:
                raise ValueError(
                    f"near-dup index {root} exists with num_partitions="
                    f"{cfg['num_partitions']}; requested {num_partitions}"
                )
            return idx
        idx.storage.doc_write_json(
            "CONFIG.json",
            {"kind": NearDupIndex._KIND,
             "num_partitions": num_partitions},
        )
        return idx

    # --- per-(partition, epoch) commit -----------------------------------

    def commit_epoch_partition(
        self, partition: int, epoch: int, g: pd.DataFrame,
        max_hamming: int = 3,
    ) -> pd.DataFrame:
        """Exactly-once admit of one epoch's band rows for one
        partition; returns (doc_id, matched) for every row. `g` must be
        the COMPLETE set of this epoch's rows routing here."""
        ckpt = self.read_checkpoint(partition)
        key = str(epoch)
        if key in ckpt["epochs"]:
            rel = ckpt["epochs"][key]
            if rel is None:
                return pd.DataFrame(
                    {"doc_id": pd.Series([], dtype=np.int64),
                     "matched": pd.Series([], dtype=np.int8)}
                )
            df = self.storage.obj_read_table(f"data/{rel}").to_pandas()
            if "epoch" in df.columns:  # compacted base holds all epochs
                df = df[df["epoch"] == epoch]
            return df[["doc_id", "matched"]].reset_index(drop=True)
        if epoch <= ckpt["max_epoch"]:
            raise ValueError(
                f"partition {partition} already past epoch {epoch} "
                f"(max committed {ckpt['max_epoch']}); epochs must be "
                "ingested in increasing order"
            )
        g = g.sort_values("doc_id").reset_index(drop=True)
        matched = np.zeros(len(g), dtype=bool)
        jk = ["band", "band_hash"]
        probe = g[jk].assign(
            _row=np.arange(len(g), dtype=np.int64),
            _sig=g["simhash_int"].to_numpy(),
            _did=g["doc_id"].to_numpy(np.int64),
        )
        # vs stored history: one equi-join on the bucket key per file
        # wave (vectorized; join size = sum of bucket cross-products —
        # tiny for hash-random signatures; a boilerplate-degenerate
        # bucket grows it, the simhash_dup_pairs max_bucket hazard, but
        # an index can't truncate without losing completeness)
        for rel in ckpt["files"]:
            t = self.storage.obj_read_table(
                f"data/{rel}",
                columns=["band", "band_hash", "simhash_int"],
            )
            if not t.num_rows:
                continue
            m = probe.merge(t.to_pandas(), on=jk)
            if not len(m):
                continue
            ham = _popcount64(
                m["_sig"].to_numpy().view(np.uint64)
                ^ m["simhash_int"].to_numpy().view(np.uint64)
            )
            matched[np.unique(m["_row"].to_numpy()[ham <= max_hamming])] \
                = True
        # vs earlier-seen rows of the SAME epoch (smaller doc_id,
        # regardless of their own matched state — the seen rule):
        # self-join, keep strictly-later side
        m = probe.merge(probe, on=jk, suffixes=("_a", "_b"))
        m = m[m["_did_b"] < m["_did_a"]]
        if len(m):
            ham = _popcount64(
                m["_sig_a"].to_numpy().view(np.uint64)
                ^ m["_sig_b"].to_numpy().view(np.uint64)
            )
            matched[
                np.unique(m["_row_a"].to_numpy()[ham <= max_hamming])
            ] = True
        g["matched"] = matched.astype(np.int8)
        rel = None
        if len(g):
            rel = os.path.join(
                f"part={partition:05d}", f"seen-e{epoch:07d}.parquet"
            )
            self.storage.obj_put_table(
                f"data/{rel}",
                pa.Table.from_pydict(
                    {c: g[c].to_numpy() for c in _ROW_SCHEMA.names},
                    schema=_ROW_SCHEMA,
                ),
            )
            ckpt["files"] = sorted(set(ckpt["files"]) | {rel})
        ckpt["epochs"][key] = rel
        ckpt["max_epoch"] = epoch
        self.write_checkpoint(ckpt)  # atomic commit point
        return g[["doc_id", "matched"]]

    # --- driver-side ingest ------------------------------------------------

    def ingest_epoch(
        self,
        ds: rd.Dataset,
        epoch: int,
        id_col: str = "doc_id",
        text_col: str = "text",
        batch_size: int = 4096,
        max_hamming: int = 3,
    ) -> rd.Dataset:
        """Admit one epoch: SimHash every doc, band-route, drop anything
        within max_hamming of an earlier-seen doc, record every row.
        Returns the MATERIALIZED survivor dataset (`doc_id`) —
        materialization is the commit barrier. Two exchanges: band rows
        to their bucket partitions, then the per-doc OR of the 4 band
        verdicts on a doc_id bucket."""
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
        from ..functions.dedup import SimHasher

        hasher = SimHasher()

        def sig_and_explode(batch: pd.DataFrame) -> pd.DataFrame:
            b = pd.DataFrame(
                {"doc_id": batch[id_col].to_numpy(np.int64),
                 "text": batch[text_col]}
            )
            b = hasher(b)
            return _explode_bands(
                b["simhash"].to_numpy().astype(np.uint64),
                b["doc_id"].to_numpy(),
                P,
            )

        def commit_group(g: pd.DataFrame) -> pd.DataFrame:
            p = int(g["_part"].iloc[0])
            idx = NearDupIndex(root)
            return idx.commit_epoch_partition(
                p, epoch, g.drop(columns=["_part"]),
                max_hamming=max_hamming,
            )

        verdicts = (
            ds.map_batches(
                sig_and_explode, batch_format="pandas",
                batch_size=batch_size,
            )
            .sort("_part")
            .map_batches(
                per_group(commit_group, "_part"),
                batch_size=None,
                batch_format="pyarrow",
            )
        )
        survivors = _or_reduce_survivors(verdicts, P).materialize()
        self.mark_epoch_done(epoch)
        return survivors

    def _replay_epoch(self, epoch: int) -> rd.Dataset:
        """Idempotent re-ingest of a done epoch: recorded band rows ->
        per-doc OR -> survivors. Distributed reads, one doc-bucket
        exchange."""
        from .storage import make_storage

        keys = []
        for p in range(self.num_partitions()):
            rel = self.read_checkpoint(p)["epochs"].get(str(epoch))
            if rel is not None:
                keys.append({"key": f"data/{rel}"})
        if not keys:
            return rd.from_arrow(
                pa.Table.from_pydict(
                    {"doc_id": pa.array([], pa.int64())}
                )
            )
        root = self.root
        P = self.num_partitions()

        def read_frag(batch: pd.DataFrame) -> pd.DataFrame:
            st = make_storage(root)
            outs = []
            for k in batch["key"]:
                df = st.obj_read_table(k).to_pandas()
                if "epoch" in df.columns:  # compacted base
                    df = df[df["epoch"] == epoch]
                outs.append(df[["doc_id", "matched"]])
            return pd.concat(outs, ignore_index=True)

        verdicts = rd.from_items(keys).map_batches(
            read_frag, batch_format="pandas", batch_size=1
        )
        return _or_reduce_survivors(verdicts, P).materialize()


def _or_reduce_survivors(verdicts: rd.Dataset, P: int) -> rd.Dataset:
    """(doc_id, matched) band verdicts -> docs whose EVERY row is
    unmatched. One fixed-int-bucket exchange, per-batch pre-combine
    first (the tree_sum discipline: collapse the 4 rows/doc before the
    sort ships them)."""

    def pre(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("doc_id", as_index=False)["matched"].max()
        g["_db"] = (g["doc_id"] % P).astype(np.int64)
        return g

    def fin(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("doc_id", as_index=False)["matched"].max()
        out = m.loc[m["matched"] == 0, ["doc_id"]].reset_index(drop=True)
        out["doc_id"] = out["doc_id"].astype(np.int64)
        return out

    return (
        verdicts.map_batches(pre, batch_format="pandas")
        .sort("_db")
        .map_batches(
            per_group(fin, "_db"), batch_size=None,
            batch_format="pyarrow",
        )
    )
