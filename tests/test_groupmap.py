"""Pin stages/groupmap.per_group — the engine-owned map_groups stand-in.

The contract under test (groupmap.py docstring): fn is applied once per
key group of an already-sorted block, key column included, groups in
order; an empty input block passes through unchanged (Ray's own map
operator forwards empties around every UDF, plan_udf_map_op.py:456, so
this is the mirror of runtime behavior); when every group returns zero
rows the output is the kernel's OWN typed empty, never a column-less
block manufactured here."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from data_sync_ray.stages.groupmap import per_group


class TestPerGroupKernel:
    """Direct kernel tests — no Ray session needed."""

    def test_one_call_per_group_key_included_in_order(self):
        t = pa.table(
            {"k": pa.array([1, 1, 3, 3, 3, 7], pa.int64()),
             "v": pa.array([10, 11, 12, 13, 14, 15], pa.int64())}
        )
        seen = []

        def fn(g: pd.DataFrame) -> pd.DataFrame:
            seen.append((g["k"].tolist(), g["v"].tolist()))
            return pd.DataFrame(
                {"k": [g["k"].iloc[0]], "n": [len(g)]}
            )

        out = per_group(fn, "k")(t)
        assert seen == [([1, 1], [10, 11]), ([3, 3, 3], [12, 13, 14]),
                        ([7], [15])]
        assert out["k"].tolist() == [1, 3, 7]
        assert out["n"].tolist() == [2, 3, 1]

    def test_empty_block_passes_through_without_calling_fn(self):
        t = pa.table({"k": pa.array([], pa.int64())})

        def fn(g):  # pragma: no cover - must not run
            raise AssertionError("fn called on empty block")

        out = per_group(fn, "k")(t)
        assert out is t  # schema-preserving pass-through, Ray's mirror

    def test_all_groups_empty_output_returns_kernels_typed_empty(self):
        t = pa.table({"k": pa.array([1, 2], pa.int64())})

        def fn(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"kept": pd.Series([], dtype="int64")})

        out = per_group(fn, "k")(t)
        assert list(out.columns) == ["kept"] and len(out) == 0
        assert out["kept"].dtype == np.dtype("int64")

    def test_pyarrow_format_and_mixed_empty_groups(self):
        t = pa.table({"k": pa.array([5, 6], pa.int64()),
                      "v": pa.array([9, 0], pa.int64())})

        def fn(g: pa.Table) -> pa.Table:
            assert isinstance(g, pa.Table)
            # drop the v==0 group entirely
            import pyarrow.compute as pc
            return g.filter(pc.not_equal(g.column("v"), 0))

        out = per_group(fn, "k", "pyarrow")(t)
        assert out.num_rows == 1 and out.column("k")[0].as_py() == 5

    def test_multi_key_boundaries(self):
        t = pa.table(
            {"a": pa.array([1, 1, 1, 2], pa.int64()),
             "b": pa.array([0, 0, 1, 1], pa.int64())}
        )
        sizes = []

        def fn(g: pd.DataFrame) -> pd.DataFrame:
            sizes.append(len(g))
            return g

        per_group(fn, ["a", "b"])(t)
        assert sizes == [2, 1, 1]

    def test_chunked_key_column(self):
        # sort outputs are often multi-chunk; boundaries must span chunks
        t = pa.concat_tables(
            [pa.table({"k": pa.array([1, 1], pa.int64())}),
             pa.table({"k": pa.array([1, 2], pa.int64())})]
        )
        sizes = []

        def fn(g: pd.DataFrame) -> pd.DataFrame:
            sizes.append(len(g))
            return g

        per_group(fn, "k")(t)
        assert sizes == [3, 1]


class TestPerGroupPipeline:
    """End-to-end through Ray sort: values match a driver-side groupby,
    and every block our stage PRODUCES is typed (the only column-less
    blocks in the stream are the ones Ray's sort manufactures and Ray's
    map operator forwards around the UDF — zero-row by construction)."""

    @pytest.mark.usefixtures("ray_session")
    def test_sorted_exchange_with_empty_ranges(self):
        import ray
        import ray.data as rd

        rng = np.random.default_rng(3)
        n = 4000
        t = pa.table(
            {"_part": pa.array(rng.integers(0, 4, n), pa.int64()),
             "x": pa.array(np.arange(n, dtype=np.int64))}
        )
        # many input blocks + few distinct keys -> sort emits empty ranges
        ds = rd.from_arrow([t.slice(i * 250, 250) for i in range(16)])

        def part_sum(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"part": [int(g["_part"].iloc[0])],
                 "s": [int(g["x"].sum())]}
            )

        out = ds.sort("_part").map_batches(
            per_group(part_sum, "_part"),
            batch_size=None, batch_format="pyarrow",
        )
        mat = out.materialize()
        for b in mat.iter_internal_ref_bundles():
            for ref, _meta in b.blocks:
                blk = ray.get(ref)
                if isinstance(blk, pd.DataFrame):
                    nrows, cols = len(blk), tuple(blk.columns)
                else:
                    nrows, cols = blk.num_rows, tuple(blk.schema.names)
                # nonempty -> typed by our kernel; column-less -> must be
                # a zero-row Ray-forwarded empty, never data-bearing
                if nrows:
                    assert cols == ("part", "s")
                else:
                    assert cols in ((), ("part", "s"))
        got = mat.to_pandas().sort_values("part").reset_index(drop=True)
        want = (
            t.to_pandas().groupby("_part", as_index=False)["x"].sum()
            .rename(columns={"_part": "part", "x": "s"})
        )
        pd.testing.assert_frame_equal(
            got.astype("int64"), want.astype("int64")
        )
