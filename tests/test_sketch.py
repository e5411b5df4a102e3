"""Tests for the mergeable sketches (functions/sketch.py) and
duplicated-span detection — properties the SQL oracle can't state
(merge-order invariance, batching invariance, CMS/bloom guarantees)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _ds(df: pd.DataFrame, blocks: int = 1) -> rd.Dataset:
    ds = rd.from_pandas(df)
    return ds.repartition(blocks) if blocks > 1 else ds


@pytest.mark.usefixtures("ray_session")
class TestHll:
    def test_estimate_tracks_exact(self):
        from data_sync_ray.functions.sketch import hll_distinct

        n = 5000
        df = pd.DataFrame({"k": np.arange(n, dtype=np.int64)})
        out = hll_distinct(_ds(df, blocks=4), "k")
        est = out["est_distinct"].iloc[0]
        # m=256 -> relative error ~1.04/sqrt(256) = 6.5%; allow 4 sigma
        assert abs(est - n) / n < 0.26
        assert out["m"].iloc[0] == 256

    def test_batching_invariant(self):
        from data_sync_ray.functions.sketch import hll_distinct

        df = pd.DataFrame(
            {"k": np.random.default_rng(7).integers(0, 900, 4000)}
        )
        a = hll_distinct(_ds(df, blocks=1), "k")
        b = hll_distinct(_ds(df.sample(frac=1, random_state=3), blocks=7),
                         "k")
        # registers are merge-order- and duplication-insensitive
        pd.testing.assert_frame_equal(a, b)

    def test_linear_counting_small_range(self):
        from data_sync_ray.functions.sketch import hll_distinct

        df = pd.DataFrame({"k": np.arange(10, dtype=np.int64)})
        out = hll_distinct(_ds(df), "k")
        # 10 distinct -> small-range correction; still close
        assert 5 <= out["est_distinct"].iloc[0] <= 20


@pytest.mark.usefixtures("ray_session")
class TestCms:
    def test_never_undercounts_and_is_batching_invariant(self):
        from data_sync_ray.functions.sketch import cms_token_counts

        rng = np.random.default_rng(11)
        vocab = [f"w{i}" for i in range(300)]
        docs = pd.DataFrame(
            {"text": [" ".join(rng.choice(vocab, 40)) for _ in range(200)]}
        )
        true = (
            pd.Series(
                [w for t in docs["text"] for w in t.split()]
            ).value_counts()
        )
        cand = pd.DataFrame(
            {"token": true.index[:10].to_numpy(dtype=object),
             "cnt": true.to_numpy()[:10].astype(np.int64)}
        )
        a = cms_token_counts(_ds(docs, blocks=1), cand)
        b = cms_token_counts(_ds(docs.sample(frac=1, random_state=5),
                                 blocks=6), cand)
        assert (a["est_cnt"] >= a["true_cnt"]).all()  # CMS guarantee
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )


@pytest.mark.usefixtures("ray_session")
class TestBloom:
    def test_no_false_negatives(self):
        from data_sync_ray.functions.sketch import bloom_semijoin_stats

        build = pd.DataFrame({"k": np.arange(0, 3000, 3, dtype=np.int64)})
        probe = pd.DataFrame(
            {"k": np.random.default_rng(2).integers(0, 200000, 5000)}
        )
        out = bloom_semijoin_stats(
            _ds(probe, blocks=4), "k", _ds(build, blocks=3), "k"
        )
        truth = int(probe["k"].isin(set(build["k"])).sum())
        assert out["n_true_match"].iloc[0] == truth
        # a bloom filter must never miss a real member
        assert out["n_pass_bloom"].iloc[0] >= truth
        assert (
            out["n_false_pos"].iloc[0]
            == out["n_pass_bloom"].iloc[0] - truth
        )
        assert out["n_probe"].iloc[0] == len(probe)


@pytest.mark.usefixtures("ray_session")
class TestSpans:
    def test_matches_brute_force(self):
        from data_sync_ray.functions.dedup import duplicated_ngram_spans

        rng = np.random.default_rng(3)
        base = " ".join(rng.choice([f"t{i}" for i in range(50)], 30))
        docs = pd.DataFrame(
            {
                "doc_id": np.arange(6, dtype=np.int64),
                "text": [
                    base,                         # 0: shares all spans w/ 1
                    base + " extra tail words",   # 1
                    "completely different words here " * 5,  # 2,3 identical
                    "completely different words here " * 5,
                    " ".join(f"u{i}" for i in range(20)),  # 4: unique
                    "short doc",                  # 5: < n words
                ],
            }
        )
        n = 5
        # brute force
        occ = {}
        for did, t in zip(docs["doc_id"], docs["text"]):
            ws = t.split()
            for i in range(len(ws) - n + 1):
                span = " ".join(ws[i:i + n])
                occ.setdefault(span, []).append(did)
        want = pd.DataFrame(
            [
                (s, len(ds_), len(set(ds_)), min(ds_))
                for s, ds_ in occ.items() if len(ds_) > 1
            ],
            columns=["span", "n_occurrences", "n_docs", "first_doc"],
        ).sort_values(
            ["n_occurrences", "span"], ascending=[False, True]
        ).reset_index(drop=True)
        got = duplicated_ngram_spans(
            _ds(docs, blocks=4), n=n, k=len(want) + 10
        )
        for c in ("n_occurrences", "n_docs", "first_doc"):
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(got.head(len(want)), want)
