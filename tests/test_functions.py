"""Tests for text analysis, dedup, ANN, and multimodal operators."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _docs(rows):
    return rd.from_pandas(pd.DataFrame(rows))


@pytest.mark.usefixtures("ray_session")
class TestText:
    def test_token_counter(self):
        from data_sync_ray.functions.text import TokenCounter

        b = pd.DataFrame({"text": ["hello world", "  a  b c ", ""]})
        out = TokenCounter()(b)
        assert out["n_words"].tolist() == [2, 3, 0]

    def test_quality_scorer(self):
        from data_sync_ray.functions.text import QualityScorer

        b = pd.DataFrame({"text": ["the cat sat, on the mat!"]})
        out = QualityScorer()(b)
        assert out["n_words"].iloc[0] == 6
        assert 0 < out["stopword_ratio"].iloc[0] <= 1
        assert out["punct_ratio"].iloc[0] > 0

    def test_lang_id_heuristic(self):
        from data_sync_ray.functions.text import LangId

        b = pd.DataFrame(
            {
                "text": [
                    "the cat and the dog sat on it for a while that day",
                    "le chat est dans la maison avec les enfants et le chien",
                    "der Hund ist nicht mit der Katze und das ist ein Problem",
                    "这是一段中文文本",
                ]
            }
        )
        out = LangId()(b)
        assert out["pred_lang"].tolist() == ["en", "fr", "de", "zh"]

    def test_fingerprint_deterministic(self):
        from data_sync_ray.functions.text import Fingerprinter

        b1 = Fingerprinter()(pd.DataFrame({"text": ["a b c", "a b d"]}))
        b2 = Fingerprinter()(pd.DataFrame({"text": ["a b c", "a b d"]}))
        assert b1["fp_md5"].tolist() == b2["fp_md5"].tolist()
        assert b1["fp_rolling"].tolist() == b2["fp_rolling"].tolist()
        assert b1["fp_rolling"][0] != b1["fp_rolling"][1]


    def test_top_tokens_exact_with_ties(self):
        from data_sync_ray.functions.text import top_tokens

        docs = [
            "b b b a a c",      # b:3 a:2 c:1
            "a c d d",          # ties: a vs d at 3 after both docs
            "e",
        ]
        ds = rd.from_pandas(
            pd.DataFrame({"text": docs, "doc_id": range(len(docs))})
        )
        out = top_tokens(ds, k=3, num_parts=4, batch_size=1)
        # counts: a=3 b=3 c=2 d=2 e=1; ties break (cnt DESC, token ASC)
        assert list(out["token"]) == ["a", "b", "c"]
        assert list(out["cnt"]) == [3, 3, 2]


@pytest.mark.usefixtures("ray_session")
class TestDedup:
    def test_exact_dedup(self):
        from data_sync_ray.functions.dedup import exact_dedup

        ds = _docs(
            [
                {"doc_id": 3, "text": "same text"},
                {"doc_id": 1, "text": "same text"},
                {"doc_id": 2, "text": "different"},
            ]
        )
        out = exact_dedup(ds).to_pandas()
        assert sorted(out["doc_id"]) == [1, 2]  # min id kept per dup group

    def test_exact_dedup_slim_payload_same_decision(self):
        """payload_cols=[] ships only (id, hash) through the exchange
        — the surviving id set must be identical to the full-payload
        run, and extra payload columns carry the winner's own values."""
        from data_sync_ray.functions.dedup import exact_dedup

        rows = [
            {"doc_id": i, "text": f"body {i % 7}", "extra": i * 10}
            for i in range(40)
        ]
        full = exact_dedup(_docs(rows)).to_pandas()
        slim = exact_dedup(_docs(rows), payload_cols=[]).to_pandas()
        assert sorted(slim.columns) == ["content_hash", "doc_id"]
        assert sorted(slim["doc_id"]) == sorted(full["doc_id"])
        keep = exact_dedup(
            _docs(rows), payload_cols=["extra"]
        ).to_pandas()
        assert sorted(keep.columns) == ["content_hash", "doc_id", "extra"]
        m = keep.sort_values("doc_id").reset_index(drop=True)
        assert (m["extra"] == m["doc_id"] * 10).all()
        assert sorted(m["doc_id"]) == sorted(full["doc_id"])

    def test_line_dedup_rewrite_semantics(self):
        """Global first occurrence (min (doc_id, idx)) of each 2-word
        line survives; later copies are cut out of their docs' text; a
        doc whose every line is a duplicate drops out entirely; a
        partial tail chunk is its own line."""
        from data_sync_ray.functions.dedup import line_dedup_rewrite

        ds = _docs(
            [
                # lines (2 words): "a b", "c d", "e f"
                {"doc_id": 1, "text": "a b c d e f"},
                # "a b" dups doc1 idx0 -> cut; "x y" and tail "z" kept
                {"doc_id": 2, "text": "a b x y z"},
                # both lines duplicate earlier ones -> doc drops out
                {"doc_id": 3, "text": "c d x y"},
                # same line twice WITHIN one doc: first kept, second cut
                {"doc_id": 4, "text": "p q p q"},
            ]
        )
        out = (
            line_dedup_rewrite(ds, chunk_words=2, num_parts=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [1, 2, 4]
        assert out["text"].tolist() == ["a b c d e f", "x y z", "p q"]
        assert out["n_kept_lines"].tolist() == [3, 2, 1]

    def test_minhash_finds_planted_near_dups(self):
        from data_sync_ray.functions.dedup import minhash_dedup_pairs

        words = [f"w{i}" for i in range(50)]
        a = " ".join(words)
        b = " ".join(words[:45] + ["x1", "x2", "x3", "x4", "x5"])
        c = " ".join(f"z{i}" for i in range(50))
        ds = _docs(
            [{"doc_id": 1, "text": a}, {"doc_id": 2, "text": b},
             {"doc_id": 3, "text": c}]
        )
        out = minhash_dedup_pairs(ds, threshold=0.5, k=3).to_pandas()
        pairs = set(zip(out["doc_a"], out["doc_b"]))
        assert (1, 2) in pairs
        assert all(3 not in p for p in pairs)

    def test_verify_jaccard_partition_count_invariant(self):
        # the attach exchange auto-sizes num_partitions from materialized
        # counts; the answer must not depend on the sizing
        from data_sync_ray.functions.dedup import (
            minhash_lsh_candidates,
            verify_jaccard,
        )

        rng = np.random.default_rng(7)
        base = [f"w{i}" for i in range(60)]
        rows = []
        for i in range(30):
            w = list(base)
            for j in rng.integers(0, 60, size=int(rng.integers(0, 25))):
                w[j] = f"r{i}_{j}"
            rows.append({"doc_id": i, "text": " ".join(w)})
        docs = _docs(rows)
        cands = minhash_lsh_candidates(docs, k=3, distinct=False).materialize()

        def run(np_):
            out = verify_jaccard(
                cands, docs, threshold=0.4, k=3, num_partitions=np_
            ).to_pandas()
            return sorted(
                zip(out["doc_a"], out["doc_b"], out["jaccard"].round(12))
            )

        auto = run(None)
        assert len(auto) > 0
        assert auto == run(2) == run(16)

    def test_ngram_jaccard_exact_vs_brute_force(self):
        from data_sync_ray.functions.dedup import ngram_jaccard_pairs

        # mutated copies of base docs => a real spectrum of Jaccard values
        rng = np.random.default_rng(11)
        vocab = [f"w{i}" for i in range(60)]
        rows = []
        for i in range(8):
            base = list(rng.choice(vocab, size=25))
            rows.append({"doc_id": 10 * i, "text": " ".join(base)})
            for v in range(1, int(rng.integers(2, 5))):
                mut = list(base)
                for _ in range(int(rng.integers(1, 8))):
                    mut[int(rng.integers(len(mut)))] = str(
                        rng.choice(vocab)
                    )
                rows.append({"doc_id": 10 * i + v, "text": " ".join(mut)})
        rows.append({"doc_id": 100, "text": "too short"})  # < k words
        ds = _docs(rows)
        out = ngram_jaccard_pairs(ds, threshold=0.2, k=3).to_pandas()
        got = {
            (a, b): round(j, 9)
            for a, b, j in zip(out["doc_a"], out["doc_b"], out["jaccard"])
        }

        def shingles(t):
            w = t.split()
            return {
                " ".join(w[i:i + 3]) for i in range(len(w) - 2)
            } if len(w) >= 3 else set()

        want = {}
        sh = {r["doc_id"]: shingles(r["text"]) for r in rows}
        ids = sorted(sh)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = ids[x], ids[y]
                if not sh[a] or not sh[b]:
                    continue
                i = len(sh[a] & sh[b])
                u = len(sh[a] | sh[b])
                if u and i / u >= 0.2:
                    want[(a, b)] = round(i / u, 9)
        assert want  # the corpus actually exercises the operator
        assert got == want
        assert all(100 not in p for p in got)  # short doc never pairs

    def test_ngram_jaccard_max_df_only_prunes(self):
        from data_sync_ray.functions.dedup import ngram_jaccard_pairs

        words = [f"w{i}" for i in range(30)]
        rows = [
            {"doc_id": i, "text": " ".join(words)} for i in range(6)
        ]  # every shingle has df=6 > max_df
        ds = _docs(rows)
        exact = ngram_jaccard_pairs(ds, threshold=0.5, k=3).to_pandas()
        assert len(exact) == 15  # all identical pairs at jaccard 1.0
        pruned = ngram_jaccard_pairs(
            ds, threshold=0.5, k=3, max_df=2
        ).to_pandas()
        assert len(pruned) == 0  # pruning removes, never invents, pairs

    def test_distributed_cc_matches_union_find(self):
        from data_sync_ray.functions.dedup import (
            connected_components,
            connected_components_distributed,
        )

        rng = np.random.default_rng(17)
        # several clusters + a long chain (worst case for propagation)
        edges = []
        for c in range(6):
            nodes = rng.choice(np.arange(c * 100, c * 100 + 40),
                               size=25, replace=False)
            for i in range(len(nodes) - 1):
                edges.append((int(nodes[i]), int(nodes[i + 1])))
        chain = list(range(1000, 1012))
        edges += list(zip(chain[:-1], chain[1:]))
        # negative ids are legal keys: the label/edge discrimination must
        # use the explicit marker, not a label>=0 sentinel
        edges += [(-5, -9), (-9, 2000)]
        pairs = pd.DataFrame(edges, columns=["doc_a", "doc_b"])
        want = connected_components(pairs)
        got = (
            connected_components_distributed(
                rd.from_pandas(pairs), num_parts=4
            )
            .to_pandas()
            .set_index("doc_id")["root"]
            .to_dict()
        )
        assert got == {int(k): int(v) for k, v in want.items()}

    def test_keep_first_dup_free_corpus_is_identity(self):
        """A corpus with NO near-dups (the common clean case) must pass
        through unchanged — regression for a KeyError on the column-less
        frame Ray returns for zero pairs, in all three keep-first paths."""
        from data_sync_ray.functions.ann import cosine_dedup_keep_first
        from data_sync_ray.functions.dedup import minhash_dedup_keep_first

        docs = _docs(
            [{"doc_id": i, "text": " ".join(f"u{i}w{j}" for j in range(30))}
             for i in range(4)]
        )
        for kw in ({}, {"distributed_cc": True}):
            out = minhash_dedup_keep_first(docs, threshold=0.5, **kw)
            assert sorted(out.to_pandas()["doc_id"]) == [0, 1, 2, 3], kw

        rng = np.random.default_rng(2)
        emb = rd.from_pandas(pd.DataFrame(
            {"vec_id": range(6),
             "embedding": [rng.normal(size=16).tolist() for _ in range(6)]}
        ))
        for kw in ({}, {"use_lsh": True}):
            out = cosine_dedup_keep_first(emb, threshold=0.9999, **kw)
            assert sorted(out.to_pandas()["vec_id"]) == list(range(6)), kw

    def test_keep_first_distributed_cc_parity(self):
        from data_sync_ray.functions.dedup import minhash_dedup_keep_first

        words = [f"w{i}" for i in range(50)]
        docs = [
            {"doc_id": 1, "text": " ".join(words)},
            {"doc_id": 2, "text": " ".join(words[:48] + ["x", "y"])},
            {"doc_id": 3, "text": " ".join(f"z{i}" for i in range(50))},
            {"doc_id": 4, "text": " ".join(words[:47] + ["p", "q", "r"])},
        ]
        ds = _docs(docs)
        a = sorted(
            minhash_dedup_keep_first(ds, threshold=0.5)
            .to_pandas()["doc_id"]
        )
        b = sorted(
            minhash_dedup_keep_first(ds, threshold=0.5,
                                     distributed_cc=True)
            .to_pandas()["doc_id"]
        )
        assert a == b == [1, 3]

    def test_keep_first_auto_cc_size_switch(self, monkeypatch):
        """Default (distributed_cc=None) size-switches on the verified
        pair count: under cc_pair_threshold the driver union-find runs;
        past it the distributed min-label path runs — pinned by
        poisoning the other path, with identical survivors."""
        from data_sync_ray.functions import dedup as D

        words = [f"w{i}" for i in range(50)]
        docs = [
            {"doc_id": 1, "text": " ".join(words)},
            {"doc_id": 2, "text": " ".join(words[:48] + ["x", "y"])},
            {"doc_id": 3, "text": " ".join(f"z{i}" for i in range(50))},
            {"doc_id": 4, "text": " ".join(words[:47] + ["p", "q", "r"])},
        ]
        ds = _docs(docs)

        def boom(*a, **k):
            raise AssertionError("wrong CC path selected")

        # tiny pair set + huge threshold -> driver path (distributed
        # poisoned)
        monkeypatch.setattr(D, "connected_components_distributed", boom)
        small = D.minhash_dedup_keep_first(ds, threshold=0.5)
        assert sorted(small.to_pandas()["doc_id"]) == [1, 3]
        monkeypatch.undo()

        # threshold 0 -> any pair at all must take the distributed path
        # (driver union-find poisoned)
        monkeypatch.setattr(D, "drop_set_from_pairs", boom)
        big = D.minhash_dedup_keep_first(
            ds, threshold=0.5, cc_pair_threshold=0
        )
        assert sorted(big.to_pandas()["doc_id"]) == [1, 3]

    def test_simhash_near_dup(self):
        from data_sync_ray.functions.dedup import simhash_dup_pairs

        words = [f"w{i}" for i in range(100)]
        ds = _docs(
            [
                {"doc_id": 1, "text": " ".join(words)},
                {"doc_id": 2, "text": " ".join(words[:99] + ["other"])},
                {"doc_id": 3, "text": " ".join(f"q{i}" for i in range(100))},
            ]
        )
        out = simhash_dup_pairs(ds, max_hamming=8).to_pandas()
        pairs = set(zip(out["doc_a"], out["doc_b"]))
        assert (1, 2) in pairs


@pytest.mark.usefixtures("ray_session")
class TestAgg:
    def test_grouped_percentiles_match_naive_rank(self):
        from data_sync_ray.functions.agg import grouped_exact_percentiles

        rng = np.random.default_rng(5)
        n = 5000
        df = pd.DataFrame(
            {
                "k": rng.choice(["a", "b", "c"], size=n),
                "v": np.round(rng.normal(50, 20, size=n), 3),
            }
        )
        # deliberately awkward batch boundaries: the histogram reduce
        # must be batching-invariant
        ds = rd.from_pandas([df.iloc[i:i + 701] for i in range(0, n, 701)])
        out = (
            grouped_exact_percentiles(ds, "k", "v", batch_size=337)
            .to_pandas()
            .set_index("k")
            .sort_index()
        )

        for k, sub in df.groupby("k"):
            cents = np.sort(
                np.floor(sub["v"].to_numpy() * 100 + 0.5).astype(np.int64)
            )
            m = len(cents)
            assert out.loc[k, "n"] == m
            for p, col in ((50, "p50_cents"), (90, "p90_cents"),
                           (99, "p99_cents")):
                rank = max(1, (p * m + 99) // 100)
                assert out.loc[k, col] == cents[rank - 1], (k, col)


@pytest.mark.usefixtures("ray_session")
class TestAnn:
    def test_bpe_encode_applies_merges_in_rank_order(self):
        from data_sync_ray.functions.text import bpe_encode

        # merges: (a,b)->ab rank 0, then (ab,c)->abc rank 1; "abc abc x"
        docs = _docs([{"doc_id": 1, "text": "abc abc x"},
                      {"doc_id": 2, "text": ""}])
        out = (
            bpe_encode(docs, [("a", "b"), ("ab", "c")])
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        # "abc" -> a b c </w> -> ab c </w> -> abc </w> = 2 pieces;
        # "x" -> x </w> = 2 pieces; total 2+2+2 = 6
        assert out.loc[0, "n_pieces"] == 6
        assert out.loc[1, "n_pieces"] == 0
        import hashlib as _h
        want = " ".join(["abc", "</w>", "abc", "</w>", "x", "</w>"])
        assert out.loc[0, "pieces_fp"] == _h.md5(want.encode()).hexdigest()

    def test_bigram_lm_matches_bruteforce(self):
        from collections import Counter

        from data_sync_ray.functions.text import bigram_lm

        rng = np.random.default_rng(11)
        vocab = [f"w{i}" for i in range(12)]
        rows = [
            {"doc_id": i,
             "text": " ".join(rng.choice(vocab, size=int(rng.integers(2, 40))))}
            for i in range(60)
        ] + [{"doc_id": 60, "text": "solo"}]  # <2 words -> no bigrams
        got = bigram_lm(_docs(rows), k=20, num_parts=4)

        bc, lc = Counter(), Counter()
        for r in rows:
            ws = r["text"].split(" ")
            for a, b in zip(ws, ws[1:]):
                bc[(a, b)] += 1
                lc[a] += 1
        want = sorted(
            ((c, a, b) for (a, b), c in bc.items()),
            key=lambda t: (-t[0], t[1], t[2]),
        )[:20]
        assert list(zip(got["cnt"], got["w1"], got["w2"])) == want
        for _, r in got.iterrows():
            assert r["left_cnt"] == lc[r["w1"]]
            assert r["cond_ppm"] == r["cnt"] * 1_000_000 // r["left_cnt"]

    def test_quantized_topk_matches_local_quantizer(self):
        from data_sync_ray.functions.ann import quantized_topk

        rng = np.random.default_rng(2)
        M = rng.standard_normal((200, 8))
        M[:, 3] = 7.0  # a zero-range dimension must code to 0, not NaN
        rows = [{"vec_id": i, "embedding": M[i].tolist()} for i in range(200)]
        got = quantized_topk(_docs(rows), M[0], query_id=0, k=10)

        mn, mx = M.min(axis=0), M.max(axis=0)
        safe = np.where(mx == mn, 1.0, mx - mn)
        C = np.clip(np.floor((M - mn) / safe * 255.0 + 0.5), 0, 255)
        C[:, mx == mn] = 0
        s = (C @ C[0]).astype(np.int64)
        order = sorted(range(1, 200), key=lambda i: (-s[i], i))[:10]
        assert list(got["vec_id"]) == order
        assert list(got["score"]) == [int(s[i]) for i in order]

    def test_quantized_topk_empty_corpus(self):
        """An empty embeddings table must return the typed empty frame,
        not ValueError from np.vstack([]) (ADVICE r3)."""
        from data_sync_ray.functions.ann import quantized_topk

        t = pa.table(
            {"vec_id": pa.array([], pa.int64()),
             "embedding": pa.array([], pa.list_(pa.float64()))}
        )
        got = quantized_topk(rd.from_arrow(t), np.zeros(8), k=5)
        assert got.empty
        assert list(got.columns) == ["vec_id", "score"]
        assert str(got["vec_id"].dtype) == "int64"

    def test_brute_force_topk_exact(self):
        from data_sync_ray.functions.ann import brute_force_topk

        rng = np.random.default_rng(0)
        M = rng.standard_normal((100, 16))
        ds = rd.from_pandas(
            pd.DataFrame(
                {"vec_id": range(100), "embedding": [v.tolist() for v in M]}
            )
        )
        q = M[7][None, :]
        out = brute_force_topk(ds, q, k=5)
        assert out.iloc[0]["vec_id"] == 7  # self is nearest
        assert abs(out.iloc[0]["score"] - 1.0) < 1e-9
        # verify against numpy ground truth
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        sims = Mn @ (q[0] / np.linalg.norm(q[0]))
        want = set(np.argsort(-sims)[:5])
        assert set(out["vec_id"]) == want

    def test_lsh_topk_recall(self):
        from data_sync_ray.functions.ann import brute_force_topk, lsh_topk

        rng = np.random.default_rng(1)
        M = rng.standard_normal((500, 32))
        ds = rd.from_pandas(
            pd.DataFrame(
                {"vec_id": range(500), "embedding": [v.tolist() for v in M]}
            )
        )
        q = M[3][None, :]
        exact = set(brute_force_topk(ds, q, k=10)["vec_id"])
        approx = set(lsh_topk(ds, q, k=10, n_planes=4)["vec_id"])
        # single-probe LSH: self-bucket must contain the query itself and
        # recall some true neighbors
        assert 3 in approx
        assert len(exact & approx) >= 2
        # multiprobe searches a superset of buckets => recall never drops
        multi = set(lsh_topk(ds, q, k=10, n_planes=4, n_probes=3)["vec_id"])
        assert len(exact & multi) >= len(exact & approx)

    def test_ivf_topk_recall_and_full_probe_exact(self):
        from data_sync_ray.functions.ann import brute_force_topk, ivf_topk

        rng = np.random.default_rng(6)
        M = rng.standard_normal((400, 32))
        ds = rd.from_pandas(
            pd.DataFrame(
                {"vec_id": range(400), "embedding": [v.tolist() for v in M]}
            )
        )
        q = M[12][None, :]
        exact = brute_force_topk(ds, q, k=10)
        # full probe (n_probe = n_lists) prunes nothing => exact
        full = ivf_topk(ds, q, k=10, n_lists=8, n_probe=8)
        assert list(full["vec_id"]) == list(exact["vec_id"])
        # partial probe: self must survive, recall reasonable
        approx = ivf_topk(ds, q, k=10, n_lists=8, n_probe=2)
        assert 12 in set(approx["vec_id"])
        assert len(set(exact["vec_id"]) & set(approx["vec_id"])) >= 3

    def test_block_sweep_near_dup_exact(self):
        """The distributed block-pair sweep equals numpy ground truth —
        every pair, every block split, including cross-block pairs."""
        from data_sync_ray.functions.ann import cosine_near_dup_pairs

        rng = np.random.default_rng(2)
        M = rng.standard_normal((120, 16))
        M[11] = M[3] + 0.05 * rng.standard_normal(16)  # planted near-dup
        M[77] = M[40] + 0.05 * rng.standard_normal(16)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        S = Mn @ Mn.T
        iu, ju = np.triu_indices(120, k=1)
        keep = S[iu, ju] >= 0.5
        want = set(zip(iu[keep], ju[keep]))
        ds = rd.from_pandas(
            pd.DataFrame(
                {"vec_id": range(120), "embedding": [v.tolist() for v in M]}
            )
        )
        out = cosine_near_dup_pairs(ds, threshold=0.5, num_blocks=5).to_pandas()
        got = set(zip(out["vec_a"], out["vec_b"]))
        assert got == want
        assert {(3, 11), (40, 77)} <= got

    def test_lsh_near_dup_high_threshold_recall(self):
        """Bucketed LSH pairs = exact pairs at a near-duplicate threshold
        (plus never emits a false pair — cosine verified in-bucket)."""
        from data_sync_ray.functions.ann import (
            cosine_near_dup_pairs,
            cosine_near_dup_pairs_lsh,
        )

        rng = np.random.default_rng(4)
        M = rng.standard_normal((200, 32))
        for a, b in [(5, 150), (9, 60), (100, 101)]:
            M[b] = M[a] + 0.1 * rng.standard_normal(32)
        ds = rd.from_pandas(
            pd.DataFrame(
                {"vec_id": range(200), "embedding": [v.tolist() for v in M]}
            )
        )
        exact = cosine_near_dup_pairs(ds, threshold=0.9).to_pandas()
        approx = cosine_near_dup_pairs_lsh(
            ds, threshold=0.9, n_planes=2, n_bands=16
        ).to_pandas()
        want = set(zip(exact["vec_a"], exact["vec_b"]))
        got = set(zip(approx["vec_a"], approx["vec_b"]))
        assert want  # the planted dups qualify
        assert got == want


    def test_cosine_dedup_keep_first(self):
        from data_sync_ray.functions.ann import cosine_dedup_keep_first

        rng = np.random.default_rng(3)
        base = rng.normal(size=(10, 16))
        rows = []
        vid = 0
        for i in range(10):
            for _ in range(3 if i < 2 else 1):  # vecs 0-1 have 2 dups each
                v = base[i] + rng.normal(scale=1e-4, size=16)
                rows.append({"vec_id": vid, "embedding": v.tolist()})
                vid += 1
        ds = rd.from_pandas(pd.DataFrame(rows))
        out = cosine_dedup_keep_first(ds, threshold=0.99).to_pandas()
        kept = sorted(out["vec_id"])
        # components {0,1,2} and {3,4,5} collapse to their min ids
        assert kept == [0, 3] + list(range(6, vid))
        out_lsh = cosine_dedup_keep_first(
            ds, threshold=0.99, use_lsh=True, n_planes=4, n_bands=16
        ).to_pandas()
        assert sorted(out_lsh["vec_id"]) == kept

    def test_kmeans_embeddings_matches_local_lloyd(self):
        """Distributed Lloyd == a straight local reference implementation
        (same seeds, tie-break, empty-cluster carry-forward), and the
        output is deterministic across runs and batch sizes."""
        from data_sync_ray.functions.ann import kmeans_embeddings

        rng = np.random.default_rng(5)
        # 3 well-separated blobs so assignments are stable, plus shuffled
        # vec_ids so "smallest vec_ids" != "first rows"
        centers = np.array([[6.0, 0, 0, 0], [0, 6.0, 0, 0], [0, 0, 6.0, 0]])
        X = np.vstack(
            [c + rng.normal(scale=0.3, size=(40, 4)) for c in centers]
        ).astype(np.float32)
        ids = rng.permutation(len(X)).astype(np.int64)
        ds = rd.from_pandas(
            pd.DataFrame(
                {"vec_id": ids, "embedding": [v.tolist() for v in X]}
            )
        )
        k, iters = 4, 3
        out = kmeans_embeddings(ds, k=k, iters=iters, batch_size=32)

        # local reference on the identical float64 math
        order = np.argsort(ids)
        Xs, idss = X[order].astype(np.float64), ids[order]
        C = Xs[:k].copy()
        for it in range(iters):
            d2 = ((Xs[:, None, :] - C[None]) ** 2).sum(-1)
            a = d2.argmin(1)
            if it < iters - 1:
                for j in range(k):
                    if (a == j).any():
                        C[j] = Xs[a == j].mean(axis=0)
        want = (
            pd.DataFrame({"cluster": a, "vec_id": idss})
            .groupby("cluster")
            .agg(n_vecs=("vec_id", "size"), sum_vec_id=("vec_id", "sum"))
            .reset_index()
        )
        got = out.astype({"cluster": int, "n_vecs": int, "sum_vec_id": int})
        pd.testing.assert_frame_equal(
            got, want.astype(got.dtypes.to_dict()), check_dtype=False
        )
        assert got["n_vecs"].sum() == len(X)
        again = kmeans_embeddings(ds, k=k, iters=iters, batch_size=17)
        pd.testing.assert_frame_equal(out, again)
        # empty blocks (over-repartitioned tiny corpus) must be no-ops
        sparse = kmeans_embeddings(
            ds.repartition(200), k=k, iters=iters
        )
        pd.testing.assert_frame_equal(out, sparse)

    def test_semantic_dedup_matches_bruteforce(self):
        """semantic_dedup_keep_first (k-means route + per-cluster
        chunked-matmul keep-first over shard refs) must equal a
        sequential numpy restatement of the same deterministic spec:
        k-smallest-vec_id seeds, squared-L2 argmin with lowest-cluster
        ties, empty-cluster carry-forward, drop-if-ANY-earlier-member
        >= threshold (no transitive closure)."""
        from data_sync_ray.functions.ann import semantic_dedup_keep_first

        rng = np.random.default_rng(7)
        n, d, thr = 60, 8, 0.95
        X = rng.normal(size=(n, d))
        # plant near-duplicates: every 5th vector is a jittered copy of
        # its predecessor, so clusters hold real >=thr pairs
        for i in range(5, n, 5):
            X[i] = X[i - 1] + rng.normal(scale=1e-3, size=d)
        ids = np.arange(n)

        def ref(k, iters):
            order = np.argsort(ids)
            C = X[order[:k]].astype(np.float64).copy()
            kk = C.shape[0]
            a = None
            for it in range(iters):
                d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
                a = d2.argmin(1)  # numpy argmin ties -> lowest index
                if it < iters - 1:
                    for j in range(kk):
                        if (a == j).any():
                            C[j] = X[a == j].mean(0)
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            kept = []
            for j in range(kk):
                mem = np.sort(ids[a == j])
                for pos, i in enumerate(mem):
                    if not any(
                        Xn[i] @ Xn[p] >= thr for p in mem[:pos]
                    ):
                        kept.append(int(i))
            return sorted(kept)

        emb = rd.from_pandas(pd.DataFrame(
            {"vec_id": ids, "embedding": [r.tolist() for r in X]}
        )).repartition(4)  # multi-block: shard routing + empty shards
        for k, iters in ((3, 2), (1, 1), (8, 3)):
            got = semantic_dedup_keep_first(
                emb, k=k, iters=iters, threshold=thr
            )
            assert got["vec_id"].tolist() == ref(k, iters), (k, iters)
        assert len(got) < n  # the planted dups actually dropped

        empty = rd.from_pandas(pd.DataFrame(
            {"vec_id": pd.Series([], dtype="int64"),
             "embedding": pd.Series([], dtype="object")}
        ))
        out = semantic_dedup_keep_first(empty, k=4, iters=2)
        assert out.empty and list(out.columns) == ["vec_id"]

    def test_pca_power_iter_matches_local(self):
        """Distributed power iteration == a straight local numpy
        restatement of the pinned spec (float64 widening, seed =
        centered min-vec_id embedding, L2 normalization per pass,
        integer per-label sign stats), deterministic across block
        layouts, and no-op-safe on empty / over-partitioned inputs."""
        from data_sync_ray.functions.ann import pca_power_iter_embeddings

        rng = np.random.default_rng(11)
        n, d, iters = 80, 12, 4
        # anisotropic cloud so the top PC is well-separated (power
        # iteration converges fast; no knife-edge projections at 0)
        scales = np.array([9.0, 3.0] + [1.0] * (d - 2))
        X = rng.normal(size=(n, d)) * scales
        ids = rng.permutation(n).astype(np.int64)
        labels = (ids % 5).astype(np.int64)
        ds = rd.from_pandas(pd.DataFrame({
            "vec_id": ids,
            "embedding": [r.tolist() for r in X],
            "label": labels,
        }))
        out = pca_power_iter_embeddings(ds, iters=iters)

        Xd = X.astype(np.float64)
        mu = Xd.mean(axis=0)
        Xc = Xd - mu
        v = Xc[np.argmin(ids)]
        v = v / np.linalg.norm(v)
        for _ in range(iters):
            w = Xc.T @ (Xc @ v)
            v = w / np.linalg.norm(w)
        pos = (Xc @ v) > 0.0
        want = (
            pd.DataFrame({"label": labels, "pos": pos, "vec_id": ids})
            .groupby("label", as_index=False)
            .agg(
                n_pos=("pos", "sum"),
                n_nonpos=("pos", lambda s: int((~s).sum())),
                sum_vec_id_pos=(
                    "vec_id",
                    lambda s: int(s[pos[s.index]].sum()),
                ),
            )
        )
        want["sum_vec_id_pos"] = [
            int(ids[(labels == lb) & pos].sum()) for lb in want["label"]
        ]
        got = out.astype(
            {c: np.int64 for c in out.columns}
        ).reset_index(drop=True)
        want = want.astype({c: np.int64 for c in want.columns})
        pd.testing.assert_frame_equal(got, want)
        assert (got["n_pos"] + got["n_nonpos"]).sum() == n

        # block-layout invariance incl. empty blocks from over-partition
        sparse = pca_power_iter_embeddings(ds.repartition(64), iters=iters)
        pd.testing.assert_frame_equal(out, sparse)

        empty = rd.from_pandas(pd.DataFrame({
            "vec_id": pd.Series([], dtype="int64"),
            "embedding": pd.Series([], dtype="object"),
            "label": pd.Series([], dtype="int64"),
        }))
        e = pca_power_iter_embeddings(empty, iters=2)
        assert e.empty and list(e.columns) == [
            "label", "n_pos", "n_nonpos", "sum_vec_id_pos"
        ]

    def test_pagerank_trade_graph_matches_local(self):
        """Distributed integer PageRank == a straight local restatement
        of the pinned spec (bidirectional distinct-pair edges, 1e9
        init, 15e7 + 85*inbound//100 update, all floors in int64),
        with hub structure so ranks actually differentiate."""
        import tempfile

        import pyarrow.parquet as _pq

        from data_sync_ray.pipelines.queries import pagerank_trade_graph

        rng = np.random.default_rng(17)
        # 12 customers x 6 suppliers; supplier 0 is a hub (everyone
        # buys from it), customer 0 buys from everyone
        rows = []
        ok = 0
        for c in range(1, 13):
            supps = {1} | set(
                int(s) for s in rng.integers(1, 7, size=3)
            )
            if c == 1:
                supps = set(range(1, 7))
            for s in supps:
                ok += 1
                rows.append((ok, c, s))
        orders = pd.DataFrame({
            "o_orderkey": [r[0] for r in rows],
            "o_custkey": [r[1] for r in rows],
        })
        line = pd.DataFrame({
            "l_orderkey": [r[0] for r in rows],
            "l_suppkey": [r[2] for r in rows],
        })
        # duplicated trades must collapse: repeat every pair once
        orders = pd.concat([orders, orders.assign(
            o_orderkey=orders["o_orderkey"] + 1000)], ignore_index=True)
        line = pd.concat([line, line.assign(
            l_orderkey=line["l_orderkey"] + 1000)], ignore_index=True)

        with tempfile.TemporaryDirectory() as d:
            _pq.write_table(
                pa.Table.from_pandas(orders), d + "/orders.parquet")
            _pq.write_table(
                pa.Table.from_pandas(line), d + "/lineitem.parquet")
            got = pagerank_trade_graph(d, iters=3, top_n=25)

        pairs = sorted({(c, s) for _, c, s in rows})
        edges = [(c * 2, s * 2 + 1) for c, s in pairs] + [
            (s * 2 + 1, c * 2) for c, s in pairs
        ]
        nodes = sorted({e[0] for e in edges})
        size = max(nodes) + 1
        outdeg = np.zeros(size, dtype=np.int64)
        for s, _ in edges:
            outdeg[s] += 1
        rank = np.zeros(size, dtype=np.int64)
        rank[nodes] = 1_000_000_000
        for _ in range(3):
            acc = np.zeros(size, dtype=np.int64)
            for s, t in edges:
                acc[t] += rank[s] // outdeg[s]
            nxt = np.zeros(size, dtype=np.int64)
            for v in nodes:
                nxt[v] = 150_000_000 + (85 * acc[v]) // 100
            rank = nxt
        na = np.array(nodes)
        order = np.lexsort((na, -rank[na]))[:25]
        top = na[order]
        want = pd.DataFrame({
            "node_type": np.where(top % 2 == 0, "c", "s"),
            "key": (top // 2).astype(np.int64),
            "pr": rank[top],
        })
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
        # the hubs rose to the top
        assert got.iloc[0]["node_type"] == "s" and got.iloc[0]["key"] == 1

    def test_dsir_resample_matches_bruteforce(self):
        """dsir_resample_docs (hashed-bigram importance weights +
        boundary-bucket top-K walk) must equal a sequential restatement
        of the pinned spec, INCLUDING the tie path: duplicated texts
        give identical scores, so the boundary bin holds many equal
        scores and the in-bin (score DESC, doc_id ASC) pick is
        exercised, not just the clean histogram split."""
        import hashlib as _hl
        import re

        import pyarrow.parquet as _pq

        from data_sync_ray.pipelines.queries import dsir_resample_docs

        rng = np.random.default_rng(13)
        vocab = [f"w{i}" for i in range(40)]
        texts, langs = [], []
        for i in range(120):
            k = int(rng.integers(3, 12))
            ws = rng.choice(vocab, size=k)
            # duplicate every 4th text exactly -> planted score ties
            if i % 4 == 0 and i > 0:
                texts.append(texts[i - 1])
            else:
                texts.append(" ".join(ws))
            langs.append("en" if i % 3 == 0 else "de")
        df = pd.DataFrame({
            "doc_id": np.arange(120, dtype=np.int64),
            "text": texts,
            "lang": langs,
            "source": "src1",
            "n_chars": [len(t) for t in texts],
        })
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            _pq.write_table(pa.Table.from_pandas(df), d + "/documents.parquet")
            got = dsir_resample_docs(d, frac_bp=2500)

        B = 1024

        def buckets(t):
            ws = re.findall(r"[A-Za-z]+", t)
            return [
                int(_hl.md5(f"{a} {b}".encode()).hexdigest()[:15], 16) % B
                for a, b in zip(ws, ws[1:])
            ]

        ct = np.zeros(B, np.int64)
        ca = np.zeros(B, np.int64)
        for t, lg in zip(df["text"], df["lang"]):
            for b in buckets(t):
                ca[b] += 1
                if lg == "en":
                    ct[b] += 1
        W = (ct + 1) * 1_000_000 // (ca + 1)
        sc = np.array(
            [sum(int(W[b]) for b in buckets(t)) for t in df["text"]],
            dtype=np.int64,
        )
        k = (120 * 2500 + 9999) // 10000
        order = np.lexsort((df["doc_id"].to_numpy(), -sc))
        keep = np.sort(df["doc_id"].to_numpy()[order[:k]])
        want = pd.DataFrame({
            "doc_id": keep,
            "score": sc[keep],
        })
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
        # the tie path actually fired: the K-th score is shared
        boundary_score = sc[order[k - 1]]
        assert (sc == boundary_score).sum() >= 2

    def test_mixture_resample_matches_bruteforce(self):
        """Histogram-walk + boundary-bucket selection must equal the
        brute-force 'needed_s smallest (md5, doc_id) per source' rule,
        with quotas from the integer mixing formulas."""
        import hashlib

        import pyarrow.parquet as pq

        from data_sync_ray.pipelines.queries import mixture_resample_docs

        got = mixture_resample_docs(SF)
        t = pq.read_table(
            SF + "/documents.parquet", columns=["doc_id", "source"]
        ).to_pandas()
        t["h"] = t["doc_id"].map(
            lambda i: hashlib.md5(f"mix:{int(i)}".encode()).hexdigest()[:16]
        )
        wt = {s: 2 if int(s[3:]) % 2 == 0 else 1
              for s in t["source"].unique()}
        sw = sum(wt.values())
        m = t.groupby("source").size()
        total = min(int(m[s]) * sw // wt[s] for s in m.index)
        want_ids: list[int] = []
        for s, g in t.groupby("source"):
            need = total * wt[s] // sw
            assert need >= 1
            want_ids.extend(
                g.sort_values(["h", "doc_id"])["doc_id"].head(need)
            )
        assert sorted(got["doc_id"]) == sorted(want_ids)

    def test_pack_sequences_invariants(self):
        """Concat-and-chunk packing: every doc lands in exactly one bin,
        bins are contiguous doc_id ranges per partition, and each bin's
        start offset is below the budget boundary its id names."""
        from data_sync_ray.pipelines.queries import pack_sequences_docs

        out = pack_sequences_docs(SF)
        assert out["n_docs"].sum() == 500
        budget = 512
        for part, g in out.groupby("part"):
            g = g.sort_values("bin")
            # contiguous non-overlapping doc ranges
            assert (g["first_doc"].to_numpy()[1:]
                    > g["last_doc"].to_numpy()[:-1]).all()
            # bin ids strictly increase and match the cumulative offsets
            cum = np.concatenate(
                ([0], np.cumsum(g["sum_tokens"].to_numpy())[:-1])
            )
            assert (g["bin"].to_numpy() == cum // budget).all()


@pytest.mark.usefixtures("ray_session")
class TestMultimodal:
    def test_compressed_decode_still_raises(self):
        """Formats with no decoder in this container must stay an honest
        NotImplementedError, never a silent fake. (PNG moved OFF this
        list in round 4, baseline JPEG in round 5 — see
        test_png_roundtrip_all_filters / test_jpeg_* — so the registry
        gap is now exercised with webp, and the in-family gap with a
        progressive-JPEG stream.)"""
        from data_sync_ray.functions.multimodal import DecodeImage

        webp = pa.table(
            {"media_id": pa.array(["a"]),
             "media_type": pa.array(["image/webp"]),
             "payload": pa.array([b"RIFF....WEBP"], pa.binary()),
             "meta_json": pa.array(["{}"])}
        )
        with pytest.raises(NotImplementedError):
            DecodeImage(fake=False)(webp)

    def test_png_roundtrip_all_filters(self):
        """encode_png/decode_png are exact inverses for gray/RGB/RGBA
        under every scanline filter type (incl. the mixed cycle)."""
        from data_sync_ray.functions.multimodal import (
            decode_png, encode_png,
        )

        rng = np.random.default_rng(11)
        # gradients make the predictive filters nontrivial (noise makes
        # every predictor residual ~uniform, hiding sign errors)
        grad = (
            np.add.outer(np.arange(20), np.arange(13))[:, :, None]
            * np.array([2, 3, 5]) % 256
        ).astype(np.uint8)
        noise = rng.integers(0, 256, size=(20, 13, 3), dtype=np.uint8)
        gray = rng.integers(0, 256, size=(8, 31), dtype=np.uint8)
        rgba = rng.integers(0, 256, size=(6, 6, 4), dtype=np.uint8)
        for img in (grad, noise, gray, rgba):
            for ft in (0, 1, 2, 3, 4, "mixed"):
                assert np.array_equal(
                    decode_png(encode_png(img, filter_type=ft)), img
                ), (img.shape, ft)

    def test_png_decode_known_bytes(self):
        """Decoder vs HAND-BUILT PNG bytes with hand-computed expected
        pixels (independent of encode_png, so a symmetric encoder+decoder
        bug can't cancel out): 2x2 gray exercising Up, and a 2-pixel RGB
        row pair exercising Sub then Paeth."""
        import struct
        import zlib

        from data_sync_ray.functions.multimodal import decode_png

        def chunk(tag, data):
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data)))

        def png(w, h, ct, raw):
            return (b"\x89PNG\r\n\x1a\n"
                    + chunk(b"IHDR",
                            struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0))
                    + chunk(b"IDAT", zlib.compress(raw))
                    + chunk(b"IEND", b""))

        # gray 2x2: row0 None [10, 20]; row1 Up [5, 250]
        #   -> row1 recon = [15, (20+250)%256=14]
        g = decode_png(png(2, 2, 0, bytes([0, 10, 20, 2, 5, 250])))
        assert g.tolist() == [[10, 20], [15, 14]]
        # RGB 2x2: row0 Sub [1,2,3, 10,20,30] -> [(1,2,3), (11,22,33)]
        #   row1 Paeth [1,1,1, 2,2,2]: px0 pred=up=(1,2,3) -> (2,3,4);
        #   px1: a=(2,3,4) b=(11,22,33) c=(1,2,3); p=a+b-c=(12,23,34);
        #   pa=|p-a|=(10,20,30) pb=|p-b|=(1,1,1) pc=(11,21,31) -> pred=b
        #   -> px1=(13,24,35)
        rgb = decode_png(
            png(2, 2, 2, bytes([1, 1, 2, 3, 10, 20, 30,
                                4, 1, 1, 1, 2, 2, 2]))
        )
        assert rgb.tolist() == [[[1, 2, 3], [11, 22, 33]],
                                [[2, 3, 4], [13, 24, 35]]]

    def test_png_unsupported_variants_raise(self):
        """Honest gaps stay honest: interlace, 16-bit, palette raise."""
        import struct
        import zlib

        from data_sync_ray.functions.multimodal import decode_png

        def hdr(depth, ct, interlace):
            data = struct.pack(">IIBBBBB", 1, 1, depth, ct, 0, 0, interlace)
            return (b"\x89PNG\r\n\x1a\n"
                    + struct.pack(">I", len(data)) + b"IHDR" + data
                    + struct.pack(">I", zlib.crc32(b"IHDR" + data)))

        for depth, ct, il in ((16, 0, 0), (8, 3, 0), (8, 0, 1)):
            with pytest.raises(NotImplementedError):
                decode_png(hdr(depth, ct, il))
        with pytest.raises(ValueError):
            decode_png(b"\x89PNG...")

    def test_jpeg_constant_block_exact(self):
        """A constant image at quality 100 (all-ones quant) has only a
        DC coefficient, which quantizes and reconstructs EXACTLY — a
        byte-level correctness anchor that needs no external codec."""
        from data_sync_ray.functions.multimodal import (
            decode_jpeg, encode_jpeg,
        )

        for v in (0, 64, 137, 255):
            img = np.full((16, 16, 3), v, dtype=np.uint8)
            out = decode_jpeg(encode_jpeg(img, quality=100))
            assert out.shape == (16, 16, 3)
            assert int(np.abs(out.astype(int) - v).max()) == 0, v
        g = np.full((8, 8), 200, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(g, quality=100))
        assert out.shape == (8, 8) and (out == 200).all()

    def test_jpeg_roundtrip_tolerance_and_determinism(self):
        """Lossy but bounded: q100 4:4:4 roundtrip of random pixels is
        within DCT-rounding error (<=3); smooth content at q90 stays
        <=4 per channel; 4:2:0 handles non-multiple-of-16 dims; bytes
        are deterministic."""
        from data_sync_ray.functions.multimodal import (
            decode_jpeg, encode_jpeg,
        )

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=100))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 3

        xx, yy = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 32))
        smooth = np.stack(
            [xx * 200 + 20, yy * 180 + 30, (xx + yy) * 100 + 20], axis=2
        ).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(smooth, quality=90))
        assert np.abs(out.astype(int) - smooth.astype(int)).max() <= 4

        odd = rng.integers(0, 256, size=(13, 21, 3), dtype=np.uint8)
        o420 = decode_jpeg(encode_jpeg(odd, quality=75, subsampling="420"))
        assert o420.shape == (13, 21, 3)

        a = encode_jpeg(smooth, quality=80)
        assert a == encode_jpeg(smooth, quality=80)
        gray = rng.integers(0, 256, size=(19, 23), dtype=np.uint8)
        og = decode_jpeg(encode_jpeg(gray, quality=100))
        assert og.shape == (19, 23)
        assert np.abs(og.astype(int) - gray.astype(int)).max() <= 2

    def test_jpeg_unsupported_variants_raise(self):
        """Honest gaps stay honest: progressive (SOF2), restart
        intervals, 16-bit quant tables, >2 sampling factors, garbage."""
        import struct

        from data_sync_ray.functions.multimodal import (
            decode_jpeg, encode_jpeg,
        )

        def seg(marker, body):
            return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

        base = np.zeros((8, 8, 3), dtype=np.uint8)
        good = encode_jpeg(base, quality=90)
        # progressive: swap the SOF0 marker byte for SOF2
        prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
        with pytest.raises(NotImplementedError):
            decode_jpeg(prog)
        # nonzero restart interval injected after SOI
        dri = good[:2] + seg(0xDD, struct.pack(">H", 4)) + good[2:]
        with pytest.raises(NotImplementedError):
            decode_jpeg(dri)
        # 16-bit quant table
        q16 = b"\xff\xd8" + seg(0xDB, bytes([0x10]) + bytes(128))
        with pytest.raises(NotImplementedError):
            decode_jpeg(q16 + good[2:])
        # 4x4 sampling factors in SOF
        sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x44, 0])
        with pytest.raises(NotImplementedError):
            decode_jpeg(b"\xff\xd8" + seg(0xC0, sof))
        with pytest.raises(ValueError):
            decode_jpeg(b"not a jpeg")

    def test_jpeg_in_decode_image_stage(self):
        """image/jpeg flows through the DecodeImage actor stage like the
        other REAL_IMAGE_TYPES members."""
        from data_sync_ray.functions.multimodal import (
            DecodeImage, MEDIA_SCHEMA, encode_jpeg,
        )

        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        t = pa.table(
            {
                "media_id": pa.array(["j0"]),
                "media_type": pa.array(["image/jpeg"]),
                "payload": pa.array([encode_jpeg(img)], pa.binary()),
                "meta_json": pa.array(["{}"]),
            },
            schema=MEDIA_SCHEMA,
        )
        out = DecodeImage(feature_dim=8)(t)
        feats = out.column("features")[0].as_py()
        assert len(feats) == 8
        assert all(0.0 <= f <= 1.0 for f in feats)

    def test_ppm_bmp_wav_roundtrip(self):
        """The codec-free encoders/decoders are exact inverses."""
        from data_sync_ray.functions.multimodal import (
            decode_bmp, decode_ppm, decode_wav,
            encode_bmp, encode_ppm, encode_wav,
        )

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)
        gray = rng.integers(0, 256, size=(6, 9), dtype=np.uint8)
        assert np.array_equal(decode_ppm(encode_ppm(gray)), gray)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)
        # header comments per netpbm spec
        commented = encode_ppm(img).replace(b"\n", b"\n# c\n", 1)
        assert np.array_equal(decode_ppm(commented), img)
        samples = rng.integers(-30000, 30000, size=300).astype(np.int16)
        got, rate = decode_wav(encode_wav(samples, 8000))
        assert rate == 8000
        assert np.array_equal(got[:, 0], samples)

    def test_real_decode_pipeline(self):
        """Real payload bytes -> actor-pool decode -> features, for both
        the image stage and the audio stage."""
        from data_sync_ray.functions.multimodal import (
            DecodeAudio, decode_features, gen_real_media,
        )

        media = gen_real_media(30, seed=5)
        imgs = media.filter(
            pa.compute.equal(
                media.column("media_type"), "image/x-portable-pixmap"
            )
        )
        out = decode_features(
            rd.from_arrow(imgs), feature_dim=8, fake=False
        ).to_pandas()
        assert len(out) == imgs.num_rows
        f = np.vstack(out["features"].to_numpy())
        assert f.shape[1] == 8 and (f >= 0).all() and (f <= 1).all()
        assert f.std() > 0  # real pixels, not a constant stub

        wavs = media.filter(
            pa.compute.equal(media.column("media_type"), "audio/wav")
        )
        au = (
            rd.from_arrow(wavs)
            .map_batches(
                DecodeAudio, fn_constructor_kwargs={"feature_dim": 4},
                batch_format="pyarrow", batch_size=64, concurrency=1,
            )
            .to_pandas()
        )
        assert (au["sample_rate"] == 16000).all()
        assert (au["n_samples"] == 2048).all()
        rms = np.vstack(au["features"].to_numpy())
        assert rms.shape[1] == 4 and (rms > 0).all()

    def test_real_media_planted_dups_surface(self):
        """gen_real_media plants exact-duplicate payloads; the real decode
        path must score them at cosine ~1.0 through media_near_dup."""
        from data_sync_ray.functions.multimodal import (
            decode_features, gen_real_media,
        )
        from data_sync_ray.functions.ann import cosine_near_dup_pairs

        media = gen_real_media(12, seed=7)
        imgs = media.filter(
            pa.compute.equal(
                media.column("media_type"), "image/x-portable-pixmap"
            )
        )
        feats = decode_features(
            rd.from_arrow(imgs), feature_dim=8, fake=False
        )

        def to_vec(t: pa.Table) -> pa.Table:
            ids = [int(m[1:]) for m in t.column("media_id").to_pylist()]
            return pa.table(
                {"vec_id": pa.array(ids, pa.int64()),
                 "embedding": pa.array(
                     [[float(x) for x in v]
                      for v in t.column("features").to_pylist()],
                     pa.list_(pa.float64()))}
            )

        pairs = cosine_near_dup_pairs(
            feats.map_batches(to_vec, batch_format="pyarrow"),
            threshold=0.9999,
        ).to_pandas()
        dup_ids = set()
        mt = media.column("media_type").to_pylist()
        pl = media.column("payload").to_pylist()
        for i in range(1, len(pl)):
            if pl[i] == pl[i - 1] and mt[i] == "image/x-portable-pixmap":
                dup_ids.add((i - 1, i))
        got = set(zip(pairs["vec_a"], pairs["vec_b"]))
        assert dup_ids and dup_ids <= got

    def test_decode_plumbing_deterministic(self):
        from data_sync_ray.functions.multimodal import (
            decode_features,
            gen_fake_media,
        )

        media = gen_fake_media(50, seed=9)
        ds = rd.from_arrow(media)
        out = decode_features(ds, feature_dim=8).to_pandas()
        assert len(out) == 50
        assert all(len(f) == 8 for f in out["features"])
        out2 = decode_features(rd.from_arrow(media), feature_dim=8).to_pandas()
        a = np.vstack(out.sort_values("media_id")["features"].to_numpy())
        b = np.vstack(out2.sort_values("media_id")["features"].to_numpy())
        assert np.array_equal(a, b)

    def test_media_decode_to_near_dup_pipeline(self):
        from data_sync_ray.functions.multimodal import (
            gen_fake_media,
            media_near_dup,
        )

        t = gen_fake_media(30, seed=1)
        pay = t.column("payload").to_pylist()
        pay[1] = pay[0]  # plant payload dups: 0 == 1 == 2
        pay[2] = pay[0]
        t = t.set_column(
            t.schema.get_field_index("payload"), "payload",
            pa.array(pay, pa.binary()),
        )
        pairs = media_near_dup(
            rd.from_arrow(t), threshold=0.999
        ).to_pandas()
        ps = set(zip(pairs["vec_a"], pairs["vec_b"]))
        assert {(0, 1), (0, 2), (1, 2)} <= ps
        # distinct random payloads decode to uncorrelated vectors: no
        # false pair should reach ~1.0 cosine
        assert all(a in (0, 1, 2) and b in (0, 1, 2) for a, b in ps)

    def test_frame_sampler(self):
        from data_sync_ray.functions.multimodal import gen_fake_media, sample_frames

        ds = rd.from_arrow(gen_fake_media(10, seed=3))
        out = sample_frames(ds, stride=2).to_pandas()
        assert (out["frame_index"] % 2 == 0).all()
        assert out["media_id"].nunique() == 10

    def test_y4m_roundtrip_and_real_frame_sampler(self):
        """Y4M encode->decode is bit-exact; the REAL FrameSampler path
        (fake=False) parses the stream through the Ray actor stage and
        keeps exactly every stride-th frame with its true geometry; a
        compressed container still raises the honest stub error."""
        from data_sync_ray.functions.multimodal import (
            decode_y4m, encode_y4m, gen_real_video, sample_frames,
            FrameSampler,
        )

        f = np.arange(3 * 4 * 6, dtype=np.uint8).reshape(3, 4, 6)
        back, fps = decode_y4m(encode_y4m(f, fps=(30, 1)))
        assert np.array_equal(back, f) and fps == (30, 1)

        vids = gen_real_video(6, seed=11, size=8)
        out = sample_frames(
            rd.from_arrow(vids), stride=3, fake=False
        ).to_pandas()
        assert (out["frame_index"] % 3 == 0).all()
        assert (out["height"] == 8).all() and (out["width"] == 8).all()
        # per-clip kept count == ceil(frames/3), recomputed from meta
        import json as _json
        want = {
            m: (_json.loads(j)["frames"] + 2) // 3
            for m, j in zip(
                vids.column("media_id").to_pylist(),
                vids.column("meta_json").to_pylist(),
            )
        }
        got = out.groupby("media_id").size().to_dict()
        assert got == want
        # frame bytes round-trip: sampled plane equals the decoded one
        first = out.iloc[0]
        planes, _ = decode_y4m(vids.column("payload")[0].as_py())
        assert first["frame"] == planes[int(first["frame_index"])].tobytes()

        mp4 = pa.table(
            {"media_id": pa.array(["x"]),
             "media_type": pa.array(["video/mp4"]),
             "payload": pa.array([b"\x00\x00mp4"], pa.binary())}
        )
        with pytest.raises(NotImplementedError):
            FrameSampler(stride=2)(mp4)

    def test_resize_box_integer_exact(self):
        from data_sync_ray.functions.multimodal import resize_box

        img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
        r = resize_box(img, 2, 2)
        assert r.shape == (2, 2, 3)
        # floor of the box mean, per channel, pure-python cross-check
        for oy in range(2):
            for ox in range(2):
                for c in range(3):
                    box = img[oy * 4:(oy + 1) * 4, ox * 4:(ox + 1) * 4, c]
                    assert r[oy, ox, c] == int(box.astype(int).sum()) // 16
        mono = resize_box(np.full((6, 6), 9, np.uint8), 3, 3)
        assert mono.shape == (3, 3) and (mono == 9).all()
        with pytest.raises(ValueError):
            resize_box(img, 3, 3)  # 8 % 3 != 0: no exact boxes


@pytest.mark.usefixtures("ray_session")
class TestTfidfAndWindows:
    def test_tfidf_top_term_brute_force(self):
        from data_sync_ray.functions.text import tfidf_top_term

        docs = pd.DataFrame(
            {
                "doc_id": np.arange(5, dtype=np.int64),
                "text": [
                    "apple banana apple cherry",
                    "banana banana date",
                    "cherry elder cherry elder fig",
                    "",  # no tokens -> no output row
                    "apple grape",
                ],
            }
        )
        # brute force: score = tf * 1_000_000 // df, top by (score desc, term asc)
        toks = [
            (d, w)
            for d, t in zip(docs["doc_id"], docs["text"])
            for w in t.split()
        ]
        tf = {}
        for d, w in toks:
            tf[(d, w)] = tf.get((d, w), 0) + 1
        df = {}
        for d, w in {(d, w) for d, w in toks}:
            df[w] = df.get(w, 0) + 1
        want = {}
        for (d, w), f in tf.items():
            s = f * 1_000_000 // df[w]
            cur = want.get(d)
            if cur is None or (-s, w) < (-cur[1], cur[0]):
                want[d] = (w, s)
        got = tfidf_top_term(rd.from_pandas(docs).repartition(3))
        assert len(got) == 4  # empty doc emits nothing
        for _, r in got.iterrows():
            w, s = want[r["doc_id"]]
            assert (r["term"], r["score"]) == (w, s)
            assert r["score"] == r["tf"] * 1_000_000 // r["df"]

    def test_tfidf_batching_invariant(self):
        from data_sync_ray.functions.text import tfidf_top_term

        rng = np.random.default_rng(9)
        vocab = [f"w{i}" for i in range(60)]
        docs = pd.DataFrame(
            {
                "doc_id": np.arange(40, dtype=np.int64),
                "text": [
                    " ".join(rng.choice(vocab, 25)) for _ in range(40)
                ],
            }
        )
        a = tfidf_top_term(rd.from_pandas(docs))
        b = tfidf_top_term(
            rd.from_pandas(docs.sample(frac=1, random_state=1)).repartition(7)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_sliding_window_fanout_is_exactly_three(self):
        from data_sync_ray.pipelines.queries import sliding_window_stats

        # every event contributes to exactly 3 windows regardless of
        # where it falls inside its slide
        import pandas as pd_
        import tempfile, os

        rng = np.random.default_rng(4)
        n = 500
        ts = pd_.to_datetime("2024-03-01") + pd_.to_timedelta(
            rng.integers(0, 86400, n), unit="s"
        )
        ev = pd_.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "ts": ts,
                "user_id": np.zeros(n, dtype=np.int64),
                "event_type": ["view"] * n,
                "value": rng.uniform(0, 10, n),
                "props": ["{}"] * n,
            }
        )
        with tempfile.TemporaryDirectory() as d:
            ev.to_parquet(os.path.join(d, "events.parquet"), index=False)
            out = sliding_window_stats(d)
        assert int(out["n_events"].sum()) == 3 * n
        cents = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        assert abs(out["sum_value"].sum() - 3 * cents.sum() / 100.0) < 1e-6


@pytest.mark.usefixtures("ray_session")
class TestDecontaminationAndHygiene:
    def test_decontaminate_removes_span_sharers(self):
        from data_sync_ray.functions.dedup import decontaminate

        span = "q w e r t y u i"  # 8 shared words
        docs = _docs(
            [
                {"doc_id": 1, "text": f"prefix words {span} suffix words"},
                {"doc_id": 2, "text": "completely unrelated text body here"},
                {"doc_id": 3, "text": "short"},  # < k words: never removed
            ]
        )
        bench = _docs([{"doc_id": 99, "text": f"bench has {span} inside"}])
        kept = sorted(
            decontaminate(docs, bench, k=8).to_pandas()["doc_id"]
        )
        assert kept == [2, 3]

    def test_decontaminate_clean_benchmark_removes_nothing(self):
        from data_sync_ray.functions.dedup import decontaminate

        docs = _docs(
            [{"doc_id": i, "text": f"doc {i} body with words a b c d e f"}
             for i in range(5)]
        )
        bench = _docs(
            [{"doc_id": 99, "text": "x y z p q r s t u v w entirely new"}]
        )
        assert decontaminate(docs, bench, k=8).count() == 5

    def test_repetition_stats_matches_bruteforce(self):
        from data_sync_ray.functions.dedup import repetition_stats

        rows = [
            {"doc_id": 1, "text": "a b a b a b a b"},      # heavy repeat
            {"doc_id": 2, "text": "a b c d e f g h"},      # all distinct
            {"doc_id": 3, "text": "x"},                    # no 2-grams
        ]
        out = (
            repetition_stats(_docs(rows), n=2)
            .to_pandas()
            .set_index("doc_id")
        )
        assert 3 not in out.index
        for r in rows[:2]:
            ws = r["text"].split()
            grams = [tuple(ws[i:i + 2]) for i in range(len(ws) - 1)]
            assert out.loc[r["doc_id"], "n_ngrams"] == len(grams)
            assert out.loc[r["doc_id"], "n_distinct"] == len(set(grams))

    def test_pii_redactor(self):
        from data_sync_ray.functions.text import PIIRedactor

        b = pd.DataFrame(
            {
                "text": [
                    "mail a@b.com and c.d+x@e-f.org now",
                    "call +1-555-0199 or +1-800-1234",
                    "nothing sensitive here",
                ]
            }
        )
        out = PIIRedactor()(b)
        assert out["n_emails"].tolist() == [2, 0, 0]
        assert out["n_phones"].tolist() == [0, 2, 0]
        assert out["redacted"].tolist() == [
            "mail [EMAIL] and [EMAIL] now",
            "call [PHONE] or [PHONE]",
            "nothing sensitive here",
        ]


@pytest.mark.usefixtures("ray_session")
class TestBpe:
    def test_bpe_merges_match_independent_reference(self):
        """Engine BPE (distributed counts + in-place list merges) must
        equal tools/gen_fixtures.bpe_ref (Counter + re.sub strings) on a
        corpus with known structure, including the greedy left-to-right
        overlap rule ('aaaa') and the (count DESC, pair ASC) tie rule."""
        import sys

        sys.path.insert(0, "/root/repo/tools")
        import importlib

        gen_fixtures = importlib.import_module("gen_fixtures")

        from data_sync_ray.functions.text import bpe_merges

        rows = [
            {"doc_id": 0, "text": "low low low lower lowest aaaa"},
            {"doc_id": 1, "text": "new newer newest low aaaa aaaa"},
            {"doc_id": 2, "text": "wider wide widest new low"},
        ]
        ds = _docs(rows)
        got = bpe_merges(ds, n_merges=25, vocab_words=100)

        import os
        import tempfile

        import pyarrow as pa
        import pyarrow.parquet as pq

        with tempfile.TemporaryDirectory() as d:
            t = pa.table({
                "doc_id": pa.array([r["doc_id"] for r in rows],
                                   pa.int64()),
                "text": pa.array([r["text"] for r in rows]),
            })
            pq.write_table(t, os.path.join(d, "documents.parquet"))
            want = gen_fixtures.bpe_ref(d, n_merges=25, vocab_words=100)
        assert [tuple(r) for r in got.itertuples(index=False)] == want


@pytest.mark.usefixtures("ray_session")
def test_asof_strategies_agree():
    """The broadcast and co-partitioned as-of join paths must produce
    identical matches (same dedup rule, same backward-inclusive
    semantics)."""
    from data_sync_ray.pipelines.queries import asof_latest_order

    a = asof_latest_order(SF, strategy="broadcast")
    b = asof_latest_order(SF, strategy="copartition")
    key = ["event_id", "user_id", "o_orderkey"]
    a = a[key].sort_values(key).reset_index(drop=True)
    b = b[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_semi_anti_join_strategies_agree():
    """Broadcast key set vs co-partitioned membership — same answer."""
    from data_sync_ray.pipelines.queries import semi_anti_join_orders

    a = semi_anti_join_orders(SF, strategy="broadcast")
    b = semi_anti_join_orders(SF, strategy="copartition")
    a = a.sort_values("c_custkey").reset_index(drop=True)
    b = b.sort_values("c_custkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_top_revenue_strategies_agree():
    """Exact-key-set broadcast vs bloom prefilter + co-partitioned exact
    membership — bloom false positives must all die at the membership
    check, leaving identical top-10s."""
    from data_sync_ray.pipelines.queries import top_customer_revenue

    a = top_customer_revenue(SF, strategy="broadcast")
    b = top_customer_revenue(SF, strategy="bloom")
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_top_revenue_bloom_empty_customer(tmp_path):
    """Explicit strategy='bloom' on an EMPTY customer table must yield
    the typed empty answer, not OverflowError from ceil(log2(0))
    (ADVICE r3)."""
    import pyarrow.parquet as _pq

    from data_sync_ray.pipelines.queries import top_customer_revenue

    _pq.write_table(
        pa.table({"c_custkey": pa.array([], pa.int64()),
                  "c_mktsegment": pa.array([], pa.string())}),
        str(tmp_path / "customer.parquet"),
    )
    _pq.write_table(
        pa.table({"o_orderkey": pa.array([1], pa.int64()),
                  "o_custkey": pa.array([7], pa.int64())}),
        str(tmp_path / "orders.parquet"),
    )
    _pq.write_table(
        pa.table({"l_orderkey": pa.array([1], pa.int64()),
                  "l_extendedprice": pa.array([10.0], pa.float64()),
                  "l_discount": pa.array([0.0], pa.float64())}),
        str(tmp_path / "lineitem.parquet"),
    )
    out = top_customer_revenue(str(tmp_path), strategy="bloom")
    assert out.empty
    assert list(out.columns) == ["o_custkey", "revenue_cents"]


@pytest.mark.usefixtures("ray_session")
def test_local_supplier_volume_strategies_agree():
    """Broadcast custkey→nationkey map vs co-partitioned orders⋈customer
    exchange — identical per-nation revenue, and a non-empty answer so
    the equality isn't vacuous."""
    from data_sync_ray.pipelines.queries import local_supplier_volume

    a = local_supplier_volume(SF, strategy="broadcast")
    b = local_supplier_volume(SF, strategy="copartition")
    assert len(a) > 0
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_global_sales_opportunity_nonempty(tmp_path):
    """The generated sf tables leave the anti-join nearly empty (almost
    every customer has orders), so pin the NON-empty path on synthetic
    tables: orderless above-average customers must group per nation with
    exact cent sums, checked against the registered SQL oracle."""
    import duckdb
    import pyarrow.parquet as pq_

    from data_sync_ray.pipelines.queries import (
        SALES_OPPORTUNITY_SQL,
        global_sales_opportunity,
    )

    rng = np.random.default_rng(7)
    n = 400
    cust = pa.table({
        "c_custkey": pa.array(np.arange(n), type=pa.int64()),
        "c_nationkey": pa.array(rng.integers(0, 5, n), type=pa.int32()),
        "c_acctbal": pa.array(
            np.round(rng.uniform(-100, 1000, n), 2), type=pa.float64()),
    })
    # only even custkeys ever order -> every odd candidate is orderless
    okeys = np.repeat(np.arange(0, n, 2), 3)
    orders = pa.table({
        "o_custkey": pa.array(okeys, type=pa.int64()),
        "o_orderkey": pa.array(np.arange(len(okeys)), type=pa.int64()),
    })
    pq_.write_table(cust, str(tmp_path / "customer.parquet"))
    pq_.write_table(orders, str(tmp_path / "orders.parquet"))

    got = global_sales_opportunity(str(tmp_path))
    assert len(got) > 1 and got["n_cust"].sum() > 10  # non-vacuous

    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')")
    want = con.execute(SALES_OPPORTUNITY_SQL).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_props_json_stats_messy_payloads_agree(tmp_path):
    """The generated events fixtures only carry clean '{"k": int}'
    payloads, so pin the MESSY-payload agreement on synthetic data:
    numeric strings, floats, bools, nulls, arrays, beyond-int64 ints,
    empty strings and invalid JSON must all be dropped-row AGREEMENTS
    between the engine and the oracle SQL — never a crash (the
    beyond-int64 case used to OverflowError in the worker) and never a
    divergence (floats/strings used to be dropped by the engine but
    cast by the oracle)."""
    import duckdb
    import pyarrow.parquet as pq_

    from data_sync_ray.pipelines.queries import (
        PROPS_JSON_SQL,
        props_json_stats,
    )

    props = [
        '{"k": 5}', '{"k": 7}', '{"k": 5}',          # kept
        '{"k": -3}',                                  # kept (negative)
        '{"k": "12"}', '{"k": 2.5}', '{"k": 2.0}',    # dropped: not int
        '{"k": true}', '{"k": null}', '{"k": [1]}',   # dropped
        '{"k": 99999999999999999999}',                # dropped: > uint64
        '{"k": 9223372036854775808}',                 # dropped: int64max+1
        '{"k": 4611686018427387904}',                 # kept: 2^62 (sum
                                                      # stays in int64 —
                                                      # the convention
                                                      # everywhere)
        '{"j": 1}', "", "{not json", "5",             # dropped
    ]
    tbl = pa.table({
        "event_type": pa.array(["a"] * len(props)),
        "props": pa.array(props)})
    pq_.write_table(tbl, str(tmp_path / "events.parquet"))

    got = props_json_stats(str(tmp_path))
    assert got["n_events"].tolist() == [5]  # the five kept rows
    assert got["n_distinct_k"].tolist() == [4]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')")
    want = con.execute(PROPS_JSON_SQL).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_promo_share_strategies_agree():
    """Broadcast partkey→promo-flag frame vs co-partitioned
    lineitem ⋈ part exchange — identical monthly basis points."""
    from data_sync_ray.pipelines.queries import promo_revenue_share

    a = promo_revenue_share(SF, strategy="broadcast")
    b = promo_revenue_share(SF, strategy="copartition")
    assert len(a) > 0
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_range_join_strategies_agree():
    from data_sync_ray.pipelines.queries import range_join_orders

    a = range_join_orders(SF, strategy="broadcast")
    b = range_join_orders(SF, strategy="copartition")
    key = ["event_id", "n_orders_30d"]
    a = a[key].sort_values("event_id").reset_index(drop=True)
    b = b[key].sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_source_drift_empty_and_single_source(tmp_path):
    """source_drift_docs edge paths: an empty corpus returns the typed
    empty frame (no div-by-zero on the ppm basis), and a single-source
    corpus has src_ppm == corp_ppm exactly (same integer basis on both
    sides), so drift is 0 everywhere and the top-k falls back to the
    alphabetical tie-break."""
    import pyarrow.parquet as _pq

    from data_sync_ray.pipelines.queries import source_drift_docs

    empty = pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "text": pd.Series([], dtype="object"),
        "lang": pd.Series([], dtype="object"),
        "source": pd.Series([], dtype="object"),
        "n_chars": pd.Series([], dtype="int64"),
    })
    d1 = tmp_path / "empty"
    d1.mkdir()
    _pq.write_table(pa.Table.from_pandas(empty), str(d1 / "documents.parquet"))
    got = source_drift_docs(str(d1))
    assert got.empty
    assert list(got.columns) == [
        "source", "token", "src_ppm", "corp_ppm", "drift"]
    assert str(got["src_ppm"].dtype) == "int64"

    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["b a a", "c b a", "d", "a b", "c c", "e a"],
        "lang": "en",
        "source": "only",
        "n_chars": 5,
    })
    d2 = tmp_path / "single"
    d2.mkdir()
    _pq.write_table(pa.Table.from_pandas(df), str(d2 / "documents.parquet"))
    got = source_drift_docs(str(d2), k=3)
    assert (got["drift"] == 0).all()
    assert (got["src_ppm"] == got["corp_ppm"]).all()
    # 13 tokens total: a=5 b=3 c=3 d=1 e=1 -> top-3 by token asc
    assert list(got["token"]) == ["a", "b", "c"]
    assert list(got["src_ppm"]) == [
        5 * 1_000_000 // 13, 3 * 1_000_000 // 13, 3 * 1_000_000 // 13]


def test_kcenter_select_matches_local_greedy():
    """Distributed greedy k-center == a straight local reference (same
    2^20 quantizer, same max-dist / min-vec_id tie rule), deterministic
    across block layouts, early-stops when n < k, typed-empty on an
    empty corpus."""
    from data_sync_ray.functions.ann import kcenter_select_embeddings

    rng = np.random.default_rng(11)
    X = rng.normal(scale=0.3, size=(60, 6)).astype(np.float32)
    ids = rng.permutation(60).astype(np.int64)
    ds = rd.from_pandas(
        pd.DataFrame(
            {"vec_id": ids, "embedding": [v.tolist() for v in X]}
        )
    )
    k = 5
    out = kcenter_select_embeddings(ds, k=k)

    # local reference on the identical integer math
    Q = np.floor(X.astype(np.float64) * 1048576.0 + 0.5).astype(np.int64)
    order = np.argsort(ids)
    Qs, idss = Q[order], ids[order]
    sel = [0]  # min vec_id is 0 after the sort
    dists = [0]
    for _ in range(k - 1):
        mind = np.full(len(idss), np.iinfo(np.int64).max, dtype=np.int64)
        for s in sel:
            diff = Qs - Qs[s]
            np.minimum(mind, (diff * diff).sum(axis=1), out=mind)
        mask = np.ones(len(idss), dtype=bool)
        mask[sel] = False
        best = mind[mask].max()
        cand = idss[mask & (mind == best)]
        nxt = int(np.flatnonzero(idss == cand.min())[0])
        sel.append(nxt)
        dists.append(int(best))
    assert list(out["vec_id"]) == [int(idss[s]) for s in sel]
    assert list(out["min_dist"]) == dists
    assert list(out["sel_rank"]) == list(range(k))

    # block-layout independence
    again = kcenter_select_embeddings(ds.repartition(16), k=k)
    pd.testing.assert_frame_equal(out, again)

    # n < k: early stop with every point selected exactly once
    small = rd.from_pandas(
        pd.DataFrame(
            {"vec_id": ids[:3], "embedding": [v.tolist() for v in X[:3]]}
        )
    )
    got = kcenter_select_embeddings(small, k=10)
    assert len(got) == 3
    assert sorted(got["vec_id"]) == sorted(int(i) for i in ids[:3])

    # empty corpus: typed empty
    empty = rd.from_pandas(
        pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                      "embedding": pd.Series([], dtype=object)})
    )
    e = kcenter_select_embeddings(empty, k=3)
    assert len(e) == 0 and list(e.columns) == [
        "sel_rank", "vec_id", "min_dist"]


def test_semantic_decontaminate_matches_bruteforce():
    """Distributed embedding decontamination == a local reference on
    the identical centered-8-bit quantizer and integer threshold;
    layout-independent; typed-empty on empty / no-benchmark corpora."""
    from data_sync_ray.functions.ann import semantic_decontaminate

    rng = np.random.default_rng(7)
    X = rng.normal(size=(80, 8)).astype(np.float32)
    # plant near-dups of benchmark rows (ids 0, 10, 20, ... are bench
    # at bench_mod=10)
    X[3] = X[0] + rng.normal(scale=0.01, size=8).astype(np.float32)
    X[27] = X[20] * 1.02
    ids = np.arange(80, dtype=np.int64)
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": ids,
                      "embedding": [v.tolist() for v in X]})
    )
    tau_sq_bp = 8100  # tau = 0.9
    out = semantic_decontaminate(ds, bench_mod=10, tau_sq_bp=tau_sq_bp)

    # local reference, same arithmetic
    M = X.astype(np.float64)
    mn, mx = M.min(0), M.max(0)
    rngd = mx - mn
    safe = np.where(rngd == 0, 1, rngd)
    c = np.clip(np.floor((M - mn) / safe * 255.0 + 0.5), 0, 255)
    c[:, rngd == 0] = 0
    cc = (c - 128.0).astype(np.int64)
    bench = ids % 10 == 0
    dot = cc[~bench] @ cc[bench].T
    n2 = (cc * cc).sum(1)
    hit = (dot > 0) & (
        dot * dot * 10000
        >= tau_sq_bp * n2[~bench][:, None] * n2[bench][None, :]
    )
    exp_ids = ids[~bench][hit.any(1)]
    assert list(out["vec_id"]) == sorted(int(i) for i in exp_ids)
    assert {3, 27} <= set(out["vec_id"])
    for _, r in out.iterrows():
        i = int(np.flatnonzero(ids[~bench] == r["vec_id"])[0])
        assert r["hits"] == int(hit[i].sum())
        assert r["best_dot"] == int(dot[i][hit[i]].max())

    again = semantic_decontaminate(
        ds.repartition(16), bench_mod=10, tau_sq_bp=tau_sq_bp
    )
    pd.testing.assert_frame_equal(out, again)

    # empty corpus -> typed empty
    empty = rd.from_pandas(
        pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                      "embedding": pd.Series([], dtype=object)})
    )
    e = semantic_decontaminate(empty)
    assert len(e) == 0 and list(e.columns) == [
        "vec_id", "hits", "best_dot"]

    # corpus with no benchmark member -> typed empty (nothing to hit)
    nob = rd.from_pandas(
        pd.DataFrame({"vec_id": ids[1:9],
                      "embedding": [v.tolist() for v in X[1:9]]})
    )
    nb = semantic_decontaminate(nob, bench_mod=1000)
    # 0 % 1000 == 0 is absent: no bench rows at all
    assert len(nb) == 0 and list(nb.columns) == [
        "vec_id", "hits", "best_dot"]


def test_export_shuffle_deterministic_and_complete():
    """Shard assignment + in-shard rank is a pure function of the ids:
    layout-independent, every doc exactly once, positions are dense
    0..n_s-1 per shard, and the order matches the md5-prefix sort."""
    import hashlib as _hl

    from data_sync_ray.pipelines.queries import export_shuffled_docs

    out = export_shuffled_docs("/root/testdata/sf0.001", shards=8)
    n = len(out)
    assert sorted(out["doc_id"]) == sorted(set(out["doc_id"]))
    for s, g in out.groupby("shard"):
        assert list(g["pos"]) == list(range(len(g)))
        hv = [
            int(_hl.md5(f"shuf:{int(i)}".encode()).hexdigest()[:12], 16)
            for i in g["doc_id"]
        ]
        assert all(h % 8 == s for h in hv)
        assert hv == sorted(hv) or list(
            zip(hv, g["doc_id"])
        ) == sorted(zip(hv, g["doc_id"]))
    again = export_shuffled_docs("/root/testdata/sf0.001", shards=8)
    pd.testing.assert_frame_equal(out, again)
    assert n > 0


def _write_docs_dir(tmp_path, texts, sources=None):
    """Write a minimal sf-dir-shaped documents.parquet for query-level
    operators that take sf_dir."""
    import os

    import pyarrow.parquet as _pq

    n = len(texts)
    t = pa.table(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * n),
            "source": pa.array(
                sources if sources is not None
                else [f"s{i % 3}" for i in range(n)]
            ),
            "n_chars": np.array([len(s) for s in texts], dtype=np.int64),
        }
    )
    d = tmp_path / "sfdocs"
    os.makedirs(d, exist_ok=True)
    _pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestDupClusterProfile:
    def test_profile_matches_bruteforce_cc(self, tmp_path):
        """Engine CC profile (distributed min-label over SimHash
        Hamming<=3 pairs) == local union-find over the brute-force
        all-pairs Hamming closure of the SAME signatures: identical
        cluster-size histogram AND sum-of-roots per size (pins the root
        assignment, not just sizes), singletons included."""
        from data_sync_ray.functions.dedup import SimHasher
        from data_sync_ray.pipelines.queries import (
            dup_cluster_profile_docs,
        )

        rng = np.random.default_rng(19)
        vocab = [f"w{i}" for i in range(40)]
        texts = []
        for i in range(60):
            texts.append(
                " ".join(rng.choice(vocab, size=25).tolist())
            )
        # planted exact-copy chains -> guaranteed Hamming-0 clusters of
        # size 3, 2, 2 (plus whatever random collisions arise)
        texts[10] = texts[11] = texts[12]
        texts[30] = texts[31]
        texts[50] = texts[51]
        sf = _write_docs_dir(tmp_path, texts)

        got = dup_cluster_profile_docs(sf)

        sig = SimHasher()(
            pd.DataFrame(
                {"doc_id": np.arange(len(texts), dtype=np.int64),
                 "text": texts}
            )
        )["simhash"].to_numpy().astype(np.uint64)
        n = len(sig)
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in range(n):
            for j in range(i + 1, n):
                if bin(int(sig[i]) ^ int(sig[j])).count("1") <= 3:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
        roots = {}
        for i in range(n):
            roots.setdefault(find(i), []).append(i)
        hist = {}
        for r, mem in roots.items():
            sz = len(mem)
            c, s = hist.get(sz, (0, 0))
            hist[sz] = (c + 1, s + min(mem))
        exp = (
            pd.DataFrame(
                {
                    "cluster_size": sorted(hist),
                    "n_clusters": [hist[s][0] for s in sorted(hist)],
                    "sum_root": [hist[s][1] for s in sorted(hist)],
                }
            ).astype(np.int64)
        )
        pd.testing.assert_frame_equal(got, exp)
        # the planted chains produced real multi-doc clusters
        assert (got["cluster_size"] >= 2).any()
        assert int((got["cluster_size"] * got["n_clusters"]).sum()) == n

    def test_dup_free_corpus_is_all_singletons(self, tmp_path):
        from data_sync_ray.pipelines.queries import (
            dup_cluster_profile_docs,
        )

        # unique single-token texts: random 64-bit signatures, a
        # Hamming<=3 collision has p ~ 2.4e-12 per pair
        texts = [f"uniqtok{i}" for i in range(30)]
        sf = _write_docs_dir(tmp_path, texts)
        got = dup_cluster_profile_docs(sf)
        assert got["cluster_size"].tolist() == [1]
        assert got["n_clusters"].tolist() == [30]
        assert got["sum_root"].tolist() == [sum(range(30))]


@pytest.mark.usefixtures("ray_session")
class TestCollocation:
    def test_topk_matches_bruteforce(self, tmp_path):
        """Engine top-k == pure-Python counting + exact big-int
        fixed-point scoring, including the (score, tok_a, tok_b) tie
        order across the k boundary."""
        from data_sync_ray.pipelines.queries import collocation_topk_docs

        rng = np.random.default_rng(23)
        filler = [f"f{i}" for i in range(12)]
        texts = []
        for i in range(40):
            words = rng.choice(filler, size=30).tolist()
            if i % 3 == 0:  # plant a strong collocation
                words[5:5] = ["new", "york"]
            if i % 5 == 0:
                words[20:20] = ["hong", "kong"]
            texts.append(" ".join(words))
        sf = _write_docs_dir(tmp_path, texts)
        min_count, k, delta = 3, 10, 1
        got = collocation_topk_docs(
            sf, min_count=min_count, k=k, delta=delta
        )

        uni, bi = {}, {}
        nt = 0
        for t in texts:
            w = t.split()
            nt += len(w)
            for x in w:
                uni[x] = uni.get(x, 0) + 1
            for a, b in zip(w, w[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
        cand = []
        for (a, b), c in bi.items():
            if c >= min_count:
                score = ((c - delta) * nt * 1_000_000) // (
                    uni[a] * uni[b]
                )
                cand.append((a, b, c, uni[a], uni[b], score))
        cand.sort(key=lambda r: (-r[5], r[0], r[1]))
        exp = pd.DataFrame(
            cand[:k],
            columns=["tok_a", "tok_b", "pair_cnt", "cnt_a", "cnt_b",
                     "score_fp"],
        ).astype({"pair_cnt": np.int64, "cnt_a": np.int64,
                  "cnt_b": np.int64, "score_fp": np.int64})
        pd.testing.assert_frame_equal(got, exp)
        # the planted phrases dominate the ranking
        assert got.iloc[0][["tok_a", "tok_b"]].tolist() in (
            ["new", "york"], ["hong", "kong"])

    def test_empty_and_short_docs(self, tmp_path):
        from data_sync_ray.pipelines.queries import collocation_topk_docs

        sf = _write_docs_dir(tmp_path, ["solo", "alone", "single"])
        got = collocation_topk_docs(sf)  # no adjacent pairs at all
        assert got.empty
        assert list(got.columns) == [
            "tok_a", "tok_b", "pair_cnt", "cnt_a", "cnt_b", "score_fp"]


@pytest.mark.usefixtures("ray_session")
class TestSourceRoundtrips:
    def _expected(self, sf):
        import pyarrow.parquet as _pq

        df = _pq.read_table(
            sf + "/documents.parquet",
            columns=["doc_id", "source", "text"],
        ).to_pandas()
        df["_len"] = df["text"].str.len().astype(np.int64)
        g = df.groupby("source")
        return (
            pd.DataFrame(
                {
                    "source": g.size().index.to_numpy(dtype=object),
                    "n_docs": g.size().to_numpy(np.int64),
                    "sum_doc_id": g["doc_id"].sum().to_numpy(np.int64),
                    "sum_text_len": g["_len"].sum().to_numpy(np.int64),
                }
            )
            .sort_values("source")
            .reset_index(drop=True)
        )

    def test_jsonl_roundtrip_fidelity(self):
        from data_sync_ray.pipelines.queries import jsonl_roundtrip_docs

        got = jsonl_roundtrip_docs(SF)
        pd.testing.assert_frame_equal(got, self._expected(SF))

    def test_csv_roundtrip_fidelity(self):
        from data_sync_ray.pipelines.queries import csv_roundtrip_docs

        got = csv_roundtrip_docs(SF)
        pd.testing.assert_frame_equal(got, self._expected(SF))
