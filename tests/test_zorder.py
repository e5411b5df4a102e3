"""Secondary-column zone maps + Z-order compaction.

Correctness bar: a where-read must equal the full fold filtered — with
version churn moving a key's secondary value ACROSS predicate ranges
(the exact hazard that makes secondary pruning unsound on deltas), and
pruning must provably engage only on all-base checkpoints. Efficacy
bar: on a z-ordered multi-file base, a small 2-D box must skip most
fragments; on the same data compacted without z-order it mustn't be
assumed to."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from data_sync_ray import Lake, SyncConfig
from data_sync_ray.state.lake import _zorder_indices
from data_sync_ray.stages.transform import assign_partition

P = 2


def _mk_lake(tmp_path, **kw) -> Lake:
    cfg = SyncConfig(
        lake_root=str(tmp_path / "lake"),
        num_partitions=P,
        stats_columns=("x", "y"),
        **kw,
    )
    return Lake.create(cfg)


def _delta(ids, log_pos, x, y, deleted=None):
    n = len(ids)
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "log_pos": pa.array(log_pos, pa.int64()),
            "_deleted": pa.array(deleted or [False] * n),
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
        }
    )
    return assign_partition(t, P)


def _commit(lake: Lake, epoch: int, t: pa.Table):
    part = t.column("partition").to_numpy()
    for p in np.unique(part):
        sub = t.filter(pa.compute.equal(t.column("partition"), int(p)))
        lake.commit_delta(int(p), epoch, sub, sub.num_rows)


def _where_oracle(lake: Lake, partition: int, preds) -> pd.DataFrame:
    """Full unpruned fold, then pandas-filter — the answer any where
    read must reproduce."""
    t = lake.read_partition(partition)
    if t is None:
        return pd.DataFrame()
    df = t.to_pandas()
    for c, (lo, hi) in preds.items():
        if lo is not None:
            df = df[df[c] >= lo]
        if hi is not None:
            df = df[df[c] <= hi]
    return df.sort_values("doc_id").reset_index(drop=True)


def _where_read(lake: Lake, partition: int, preds) -> pd.DataFrame:
    t = lake.read_partition(partition, where=preds)
    if t is None or t.num_rows == 0:
        return pd.DataFrame()
    return t.to_pandas().sort_values("doc_id").reset_index(drop=True)


class TestSecondaryStats:
    def test_cols_recorded_at_commit(self, tmp_path):
        lake = _mk_lake(tmp_path)
        ids = list(range(40))
        _commit(lake, 0, _delta(ids, ids, ids, [i * 3 for i in ids]))
        seen = 0
        for p in lake.partitions():
            ck = lake.read_checkpoint(p)
            for rel in ck["files"]:
                cols = ck["file_stats"][rel]["cols"]
                assert cols["x"][0] <= cols["x"][1]
                assert cols["y"][0] <= cols["y"][1]
                seen += 1
        assert seen >= 1

    def test_frag_regex_accepts_chunked_bases(self):
        assert Lake._frag_epoch("part=00001/base-c0000002.parquet") == (
            "base", None)
        assert Lake._frag_epoch(
            "part=00001/base-c0000002-003.parquet") == ("base", None)

    def test_where_exact_with_live_deltas_and_no_pruning(self, tmp_path):
        """Version churn moves keys' x ACROSS the predicate boundary;
        with deltas live, files_for_predicate must return everything
        and the where-read must still be exact."""
        lake = _mk_lake(tmp_path)
        ids = list(range(30))
        _commit(lake, 0, _delta(ids, ids, [5] * 30, [5] * 30))
        # epoch 1: even keys move to x=500 (out of the box below);
        # key 3 is deleted
        movers = [i for i in ids if i % 2 == 0] + [3]
        _commit(lake, 1, _delta(
            movers,
            [100 + i for i in movers],
            [500] * len(movers),
            [5] * len(movers),
            deleted=[False] * (len(movers) - 1) + [True],
        ))
        preds = {"x": (0, 10)}
        for p in lake.partitions():
            ck = lake.read_checkpoint(p)
            assert Lake.files_for_predicate(ck, preds) == ck["files"]
            got = _where_read(lake, p, preds)
            want = _where_oracle(lake, p, preds)
            pd.testing.assert_frame_equal(got, want)
            if len(want):
                assert (want["x"] <= 10).all()

    def test_where_composes_with_columns_projection(self, tmp_path):
        lake = _mk_lake(tmp_path)
        ids = list(range(20))
        _commit(lake, 0, _delta(ids, ids, ids, ids))
        t = lake.read_partition(
            lake.partitions()[0], columns=["doc_id", "y"],
            where={"x": (5, 12)},
        )
        df = t.to_pandas()
        assert list(df.columns) == ["doc_id", "y"]
        # filter applied even though x was not a requested column
        assert set(df["doc_id"]).issubset(set(range(5, 13)))


class TestZorderCompaction:
    def _grid_lake(self, tmp_path):
        """400 keys in random order with independent random x/y — fold
        order (key-sorted) does NOT cluster x/y, so any pruning a
        z-ordered layout shows is earned by the curve."""
        lake = _mk_lake(tmp_path)
        rng = np.random.default_rng(23)
        n = 400
        ids = list(range(n))
        x = rng.integers(0, 1000, size=n).tolist()
        y = rng.integers(0, 1000, size=n).tolist()
        _commit(lake, 0, _delta(ids, ids, x, y))
        # churn: re-commit a third with new coordinates + 10 deletes
        sub = ids[::3]
        _commit(lake, 1, _delta(
            sub, [1000 + i for i in sub],
            rng.integers(0, 1000, size=len(sub)).tolist(),
            rng.integers(0, 1000, size=len(sub)).tolist(),
        ))
        dels = ids[::40]
        _commit(lake, 2, _delta(
            dels, [2000 + i for i in dels],
            [0] * len(dels), [0] * len(dels),
            deleted=[True] * len(dels),
        ))
        return lake

    def test_zorder_exact_and_prunes(self, tmp_path):
        lake = self._grid_lake(tmp_path)
        full_before = {
            p: lake.read_partition(p) for p in lake.partitions()
        }
        for p in lake.partitions():
            r = lake.compact_partition(
                p, zorder_by=["x", "y"], max_rows_per_file=25
            )
            assert r["compacted"]
        preds = {"x": (100, 220), "y": (600, 720)}
        pruned_any = False
        for p in lake.partitions():
            ck = lake.read_checkpoint(p)
            # stats rewritten for every chunk, names match files exactly
            assert set(ck["file_stats"]) == set(ck["files"])
            assert len(ck["files"]) > 2
            kept = Lake.files_for_predicate(ck, preds)
            if len(kept) < len(ck["files"]):
                pruned_any = True
            # compaction itself preserved the state
            after = lake.read_partition(p)
            pd.testing.assert_frame_equal(
                full_before[p].to_pandas().sort_values("doc_id")
                .reset_index(drop=True),
                after.to_pandas().sort_values("doc_id")
                .reset_index(drop=True),
            )
            # pruned read == unpruned filtered
            pd.testing.assert_frame_equal(
                _where_read(lake, p, preds), _where_oracle(lake, p, preds)
            )
        assert pruned_any
        # a small box on a z-ordered 16-file base should skip MOST files
        total = sum(
            len(lake.read_checkpoint(p)["files"])
            for p in lake.partitions()
        )
        kept = sum(
            len(Lake.files_for_predicate(lake.read_checkpoint(p), preds))
            for p in lake.partitions()
        )
        assert kept <= total // 2, (kept, total)

    def test_new_delta_disables_pruning_until_recompacted(self, tmp_path):
        lake = self._grid_lake(tmp_path)
        for p in lake.partitions():
            lake.compact_partition(
                p, zorder_by=["x", "y"], max_rows_per_file=25
            )
        # a key with x inside the box gets UPDATED to x far outside —
        # if base pruning stayed on, the stale base row could shadow it
        _commit(lake, 3, _delta([7], [9999], [5000], [5000]))
        preds = {"x": (0, 1000)}
        for p in lake.partitions():
            ck = lake.read_checkpoint(p)
            if any("delta-" in f for f in ck["files"]):
                assert Lake.files_for_predicate(ck, preds) == ck["files"]
            pd.testing.assert_frame_equal(
                _where_read(lake, p, preds), _where_oracle(lake, p, preds)
            )

    def test_crash_before_checkpoint_leaves_old_state(self, tmp_path):
        """Copy-on-write: new z-ordered chunks written but the
        checkpoint write dies -> the old fragment list (and the data it
        points to) still serves reads; the orphans are invisible."""
        lake = self._grid_lake(tmp_path)
        p = lake.partitions()[0]
        before = lake.read_partition(p).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        files_before = list(lake.read_checkpoint(p)["files"])

        real = lake.write_checkpoint

        def boom(ckpt):
            raise OSError("simulated crash at the commit point")

        lake.write_checkpoint = boom
        with pytest.raises(OSError):
            lake.compact_partition(
                p, zorder_by=["x", "y"], max_rows_per_file=25
            )
        lake.write_checkpoint = real
        fresh = Lake(lake.root)
        assert fresh.read_checkpoint(p)["files"] == files_before
        after = fresh.read_partition(p).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(before, after)
        # and a later compaction still succeeds over the orphans
        r = fresh.compact_partition(
            p, zorder_by=["x", "y"], max_rows_per_file=25
        )
        assert r["compacted"]

    def test_zorder_indices_locality(self):
        """On a 16x16 grid split into 16 chunks, every 4x4 box query
        must intersect exactly ONE z-ordered chunk (the curve nests
        perfectly on power-of-two grids) vs 4 row-major chunks — the
        whole point of clustering for zone-map pruning. (A bbox-AREA
        metric is degenerate here: row-major chunks are full rows,
        whose boxes are also tight — box-INTERSECTION counts are what
        pruning actually pays for.)"""
        n = 16
        xs, ys = np.meshgrid(np.arange(n), np.arange(n))
        t = pa.table({
            "x": pa.array(xs.ravel(), pa.int64()),
            "y": pa.array(ys.ravel(), pa.int64()),
        })

        def hits(order):
            tx = t.column("x").to_numpy()[order]
            ty = t.column("y").to_numpy()[order]
            per = len(order) // 16
            total = 0
            for bx in range(0, n, 4):
                for by in range(0, n, 4):
                    for i in range(0, len(order), per):
                        cx, cy = tx[i:i + per], ty[i:i + per]
                        if (cx.max() >= bx and cx.min() <= bx + 3
                                and cy.max() >= by
                                and cy.min() <= by + 3):
                            total += 1
            return total

        z = hits(_zorder_indices(t, ["x", "y"]))
        rowmajor = hits(np.arange(n * n))
        assert z == 16  # one chunk per box: perfect nesting
        assert rowmajor == 64


class TestCompactionHardening:
    """Round-5 hardening: the uint64 bit-budget cap in _zorder_indices,
    empty/fixed-point compaction no-ops, and the torn-retry orphan
    sweep."""

    def test_zorder_bit_cap_keeps_high_bits(self):
        """With 4 columns only 64 // 4 = 16 interleaved bit positions
        exist per column; at n = 2^17 ranks need 17 bits. The unpatched
        interleave shifted past 63 (numpy silently yields 0), DROPPING
        each rank's most-significant bit — the coarse position on the
        curve — so opposite corners of the hypercube interleaved. The
        cap keeps the HIGH bits: every all-low-corner point must sort
        strictly before every all-high-corner point."""
        n = 1 << 17
        rng = np.random.default_rng(7)
        cols = {}
        for name in ("a", "b", "c", "d"):
            cols[name] = pa.array(rng.permutation(n), pa.int64())
        t = pa.table(cols)
        order = _zorder_indices(t, ["a", "b", "c", "d"])
        pos = np.empty(n, dtype=np.int64)
        pos[order] = np.arange(n)
        vals = {k: t.column(k).to_numpy() for k in cols}
        low = np.ones(n, dtype=bool)
        high = np.ones(n, dtype=bool)
        for v in vals.values():
            low &= v < n // 2
            high &= v >= n // 2
        assert low.sum() > 0 and high.sum() > 0
        # top interleaved nibble is 0000 for the low corner, 1111 for
        # the high corner -> strict separation in the output order
        assert pos[low].max() < pos[high].min()

    def test_empty_partition_compaction_is_noop(self, tmp_path):
        """Zero-row epochs record applied_epochs without writing files.
        Compacting such a partition (even with zorder_by, which used to
        bypass the <=1-files early return) must not bump the gen or set
        compacted_through_epoch — an as-of read below max(applied)
        would spuriously raise though no history was destroyed."""
        lake = _mk_lake(tmp_path)
        empty = _delta([], [], [], [])
        for e in (0, 1, 2):
            lake.commit_delta(1, e, empty, 0)
        before = lake.read_checkpoint(1)
        r = lake.compact_partition(1, zorder_by=["x", "y"])
        assert r["compacted"] is False
        after = lake.read_checkpoint(1)
        assert after.get("compaction_gen", 0) == before.get(
            "compaction_gen", 0)
        assert "compacted_through_epoch" not in after or (
            after["compacted_through_epoch"]
            == before.get("compacted_through_epoch"))
        # the as-of read that used to raise: returns the (empty) state
        t = lake.read_partition(1, as_of_epoch=0)
        assert t is None or t.num_rows == 0

    def test_single_base_same_spec_is_fixed_point(self, tmp_path):
        """A lone base with an unchanged zorder spec is the compaction
        fixed point: recompacting must be a no-op (no gen churn — views
        fingerprint on the files list), while CHANGING zorder_by still
        re-clusters."""
        lake = _mk_lake(tmp_path)
        _commit(lake, 0, _delta(
            list(range(50)), list(range(50)),
            list(range(50)), list(range(49, -1, -1))))
        r1 = lake.compact_partition(0, zorder_by=["x", "y"])
        assert r1["compacted"]
        ck1 = lake.read_checkpoint(0)
        r2 = lake.compact_partition(0, zorder_by=["x", "y"])
        assert r2["compacted"] is False
        ck2 = lake.read_checkpoint(0)
        assert ck2["compaction_gen"] == ck1["compaction_gen"]
        assert ck2["files"] == ck1["files"]
        # different clustering spec -> real work again
        r3 = lake.compact_partition(0, zorder_by=["y"])
        assert r3["compacted"]
        assert lake.read_checkpoint(0)["compaction_gen"] \
            == ck1["compaction_gen"] + 1
        # plain (non-zorder) recompaction of a lone base stays a no-op
        # via the pre-existing <=1-files return
        assert lake.compact_partition(0)["compacted"] is False

    def test_torn_retry_with_fewer_chunks_sweeps_orphans(self, tmp_path):
        """Torn multi-chunk compaction at gen g leaves base-c{g}-000..k;
        a retry at the same gen that produces FEWER chunks must sweep
        the stale higher-numbered names BEFORE writing (also the
        objstore-correctness fix: put-if-absent would otherwise keep
        the torn attempt's bytes under the reused names). After the
        retry, disk holds exactly the checkpoint's files."""
        lake = _mk_lake(tmp_path)
        n = 200
        rng = np.random.default_rng(3)
        _commit(lake, 0, _delta(
            list(range(n)), list(range(n)),
            rng.integers(0, 1000, size=n).tolist(),
            rng.integers(0, 1000, size=n).tolist()))
        _commit(lake, 1, _delta(
            [0], [5000], [1], [1]))  # second fragment so compaction runs
        real = lake.write_checkpoint

        def boom(ckpt):
            raise OSError("simulated crash at the commit point")

        lake.write_checkpoint = boom
        with pytest.raises(OSError):
            lake.compact_partition(
                0, zorder_by=["x", "y"], max_rows_per_file=25)
        lake.write_checkpoint = real
        part_dir = tmp_path / "lake" / "data" / "part=00000"
        torn = sorted(
            f.name for f in part_dir.iterdir() if "base-c" in f.name)
        assert len(torn) >= 2  # multi-chunk torn attempt on disk
        # retry with ONE chunk (fewer than the torn attempt wrote)
        fresh = Lake(lake.root)
        r = fresh.compact_partition(0, zorder_by=["x", "y"])
        assert r["compacted"]
        ckpt = fresh.read_checkpoint(0)
        on_disk = sorted(
            f"part=00000/{f.name}" for f in part_dir.iterdir())
        assert on_disk == sorted(ckpt["files"])
        # single-chunk retry: stale -001..-00k names must be gone
        assert len(ckpt["files"]) < len(torn)
        # and the surviving state is exact (every key once, LWW winner)
        import pandas as _pd

        parts = [fresh.read_partition(p) for p in fresh.partitions()]
        df = _pd.concat(
            [t.to_pandas() for t in parts if t is not None])
        assert df["doc_id"].is_unique and len(df) == n
        assert int(df.loc[df.doc_id == 0, "x"].iloc[0]) == 1


class TestVacuum:
    """vacuum(retain_epochs=N): retention as a stated policy — fold
    history at/below latest-N, keep the last N epochs time-travelable."""

    def _history_lake(self, tmp_path):
        lake = _mk_lake(tmp_path)
        rng = np.random.default_rng(11)
        n = 60
        for e in range(10):
            ids = list(range(e * 3, e * 3 + 30))  # overlapping key churn
            _commit(lake, e, _delta(
                ids, [e * 1000 + i for i in ids],
                rng.integers(0, 100, size=len(ids)).tolist(),
                rng.integers(0, 100, size=len(ids)).tolist(),
                deleted=[(e + i) % 17 == 0 for i in ids]))
            lake.mark_epoch_done(e)
        return lake

    @staticmethod
    def _snap(lake, as_of=None):
        parts = [
            lake.read_partition(p, as_of_epoch=as_of)
            for p in lake.partitions()
        ]
        df = pd.concat(
            [t.to_pandas() for t in parts if t is not None and t.num_rows]
        )
        return df.sort_values("doc_id").reset_index(drop=True)

    def test_vacuum_keeps_horizon_exact_destroys_below(self, tmp_path):
        lake = self._history_lake(tmp_path)
        before_now = self._snap(lake)
        before_e8 = self._snap(lake, as_of=8)
        before_e7 = self._snap(lake, as_of=7)
        before_e6 = self._snap(lake, as_of=6)

        r = lake.vacuum(retain_epochs=3)
        assert r["horizon"] == 6
        assert all(x["compacted"] for x in r["results"])
        for p in lake.partitions():
            ck = lake.read_checkpoint(p)
            assert ck["compacted_through_epoch"] == 6
            kinds = [lake._frag_epoch(f) for f in ck["files"]]
            assert sum(1 for k, _ in kinds if k == "base") >= 1
            live = sorted(e for k, e in kinds if k == "delta")
            assert live == [7, 8, 9]  # only the retained epochs' deltas

        # current state exact, in-horizon time travel exact
        pd.testing.assert_frame_equal(self._snap(lake), before_now)
        pd.testing.assert_frame_equal(self._snap(lake, as_of=8), before_e8)
        pd.testing.assert_frame_equal(self._snap(lake, as_of=7), before_e7)
        # AT the horizon the base IS the fold-through-6 state: readable
        pd.testing.assert_frame_equal(self._snap(lake, as_of=6), before_e6)
        # destroyed history below it raises
        for bad in (5, 3, 0):
            with pytest.raises(ValueError):
                lake.read_partition(0, as_of_epoch=bad)

    def test_vacuum_is_idempotent_and_tightens(self, tmp_path):
        lake = self._history_lake(tmp_path)
        before_now = self._snap(lake)
        lake.vacuum(retain_epochs=3)
        gens = {
            p: lake.read_checkpoint(p)["compaction_gen"]
            for p in lake.partitions()
        }
        r2 = lake.vacuum(retain_epochs=3)
        assert not any(x["compacted"] for x in r2["results"])  # fixed point
        for p in lake.partitions():
            assert lake.read_checkpoint(p)["compaction_gen"] == gens[p]
        # retain_epochs=0: full fold; current state still exact
        r3 = lake.vacuum(retain_epochs=0)
        assert r3["horizon"] == 9
        pd.testing.assert_frame_equal(self._snap(lake), before_now)
        for p in lake.partitions():
            ck = lake.read_checkpoint(p)
            assert all(
                lake._frag_epoch(f)[0] == "base" for f in ck["files"])
            assert ck["compacted_through_epoch"] == 9
        with pytest.raises(ValueError):
            lake.read_partition(0, as_of_epoch=8)

    def test_vacuum_composes_with_zorder(self, tmp_path):
        lake = self._history_lake(tmp_path)
        before = self._snap(lake)
        r = lake.vacuum(retain_epochs=2, zorder_by=["x", "y"],
                        max_rows_per_file=16)
        assert r["horizon"] == 7
        pd.testing.assert_frame_equal(self._snap(lake), before)
        ok = self._snap(lake, as_of=8)
        assert len(ok) > 0
        for p in lake.partitions():
            ck = lake.read_checkpoint(p)
            assert ck["zorder_by"] == ["x", "y"]
            # stats rewritten for the new base chunks AND kept deltas
            assert set(ck["file_stats"]) == set(ck["files"])
