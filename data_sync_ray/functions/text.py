"""Text analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language ID, document fingerprinting.

Each operator is a callable CLASS (actor-pool stage: compiled regexes /
profiles built once per actor in __init__, work per batch in __call__) plus
a driver helper that wires it into a Dataset. Hot paths are pandas/numpy
vectorized — no Python loop over rows except where a per-doc set is
intrinsic (and then over a batch-local comprehension, never the driver).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

from ..stages.groupmap import per_group

WORD_RE = r"\s+"
# BPE-ish pre-tokenizer: words, numbers, punctuation runs (GPT-2 style,
# simplified to stdlib `re`)
BPE_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+"

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been on at by for with as "
    "it this that from".split()
)

#: tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES = {
    "en": frozenset("the and of to in is you that it for was with as his on".split()),
    "fr": frozenset("le la les de des un une et est dans que pour sur avec ne".split()),
    "de": frozenset("der die das und ist ein eine nicht mit von zu auf für den".split()),
    "es": frozenset("el la los las de un una y es en que por con para no se".split()),
}


class TokenCounter:
    """n_words (whitespace tokens) + n_bpe (BPE-ish regex pre-tokens)."""

    def __init__(self):
        self.ws = re.compile(WORD_RE)
        self.bpe = re.compile(BPE_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"]
        batch["n_words"] = (
            texts.str.split(self.ws).map(lambda ws: sum(1 for w in ws if w))
            .astype("int64")
        )
        batch["n_bpe"] = texts.str.count(self.bpe).astype("int64")
        return batch


class QualityScorer:
    """Heuristic doc-quality signals: length, punctuation ratio, stopword
    ratio, mean word length — the usual pre-training corpus filters."""

    def __init__(self):
        self.word = re.compile(r"[A-Za-z]+")
        self.punct = re.compile(r"[^\w\s]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"]
        n_chars = texts.str.len().astype("int64")
        words = texts.str.findall(self.word)
        n_words = words.map(len).astype("int64")
        total_wlen = words.map(lambda ws: sum(len(w) for w in ws))
        n_stop = words.map(
            lambda ws: sum(1 for w in ws if w.lower() in STOPWORDS)
        )
        batch["n_chars_m"] = n_chars
        batch["n_words"] = n_words
        batch["punct_ratio"] = (
            texts.str.count(self.punct) / n_chars.clip(lower=1)
        ).round(6)
        batch["stopword_ratio"] = (n_stop / n_words.clip(lower=1)).round(6)
        batch["mean_word_len"] = (total_wlen / n_words.clip(lower=1)).round(6)
        return batch


class LangId:
    """Stopword/char-class language heuristic (en/fr/de/es + CJK => zh).

    Deterministic, dependency-free; intended as the stand-in for a real
    fastText-style model loaded once per actor."""

    def __init__(self):
        self.word = re.compile(r"[a-zA-ZÀ-ÿäöüßñ]+")
        self.cjk = re.compile(r"[一-鿿]")

    def _predict(self, text: str) -> str:
        if self.cjk.search(text):
            return "zh"
        words = [w.lower() for w in self.word.findall(text)]
        if not words:
            return "unknown"
        best, best_hits = "unknown", 0
        for lang, prof in LANG_PROFILES.items():
            hits = sum(1 for w in words if w in prof)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["pred_lang"] = batch["text"].map(self._predict)
        return batch


class Fingerprinter:
    """Deterministic document fingerprints: md5 of the text (exact-dup key,
    the Md5 util analog — /root/reference/src/lib/util/util.go:62-67) and a
    64-bit rolling (Rabin-Karp-style polynomial) hash over words."""

    B = np.uint64(1_000_003)
    MASK = np.uint64(0xFFFFFFFFFFFFFFFF)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["fp_md5"] = batch["text"].map(
            lambda t: hashlib.md5(t.encode()).hexdigest()
        )
        def roll(t: str) -> np.uint64:
            h = np.uint64(0)
            for w in t.split():
                wh = np.uint64(
                    int.from_bytes(
                        hashlib.blake2b(w.encode(), digest_size=8).digest(),
                        "little",
                    )
                )
                h = (h * Fingerprinter.B + wh) & Fingerprinter.MASK
            return h
        batch["fp_rolling"] = batch["text"].map(roll).astype("uint64")
        return batch


#: process-level singletons for the task-mode stages below: setup (regex
#: compile, profile tables) still runs once per WORKER PROCESS, but the
#: stage schedules as plain tasks — an actor pool pays a measured ~1-2s
#: startup per execution (BASELINE.md), absurd for millisecond-cheap
#: state. Pass concurrency=N to get a real actor pool back — that is the
#: right shape once __init__ loads an actual model.
_STAGE_CACHE: dict = {}


def _task_stage(cls):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        inst = _STAGE_CACHE.get(cls)
        if inst is None:
            inst = _STAGE_CACHE[cls] = cls()
        return inst(batch)

    fn.__name__ = cls.__name__
    return fn


def _text_stage(ds, cls, concurrency, batch_size):
    if concurrency is not None:
        return ds.map_batches(
            cls, batch_format="pandas", batch_size=batch_size,
            concurrency=concurrency,
        )
    return ds.map_batches(
        _task_stage(cls), batch_format="pandas", batch_size=batch_size
    )


def with_token_counts(ds, concurrency: int | None = None,
                      batch_size: int = 2048):
    return _text_stage(ds, TokenCounter, concurrency, batch_size)


def with_quality(ds, concurrency: int | None = None,
                 batch_size: int = 2048):
    return _text_stage(ds, QualityScorer, concurrency, batch_size)


def with_lang_id(ds, concurrency: int | None = None,
                 batch_size: int = 2048):
    return _text_stage(ds, LangId, concurrency, batch_size)


def with_fingerprints(ds, concurrency: int | None = None,
                      batch_size: int = 2048):
    return _text_stage(ds, Fingerprinter, concurrency, batch_size)


def top_tokens(
    docs, k: int = 50, num_parts: int = 32, batch_size: int = 4096
):
    """Exact global top-k most frequent whitespace tokens.

    Heavy-hitters at scale without a vocabulary-sized sort: per-batch
    token counts (the combiner — rows out are bounded by the batch's
    DISTINCT tokens), one exchange on token-hash % num_parts, per-part
    final sums. A token lives in exactly one partition, so each part's
    top-k candidate list is globally complete for its tokens and the
    union of candidates (<= num_parts * k tiny rows) provably contains
    the global top-k; the final merge-sort of that bounded set runs on
    the driver. Ties break (count DESC, token ASC) — stated identically
    in the SQL oracle so result hashes match bitwise.

    Returns a pandas DataFrame (token, cnt) — already a top-k, i.e. a
    small result by contract."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = [w for t in batch["text"] for w in t.split()]
        if not toks:
            return pd.DataFrame(
                {"token": pd.Series([], dtype="object"),
                 "cnt": pd.Series([], dtype="int64"),
                 "_part": pd.Series([], dtype="int64")}
            )
        vc = pd.Series(toks, dtype="object").value_counts()
        out = pd.DataFrame(
            {"token": vc.index.to_numpy(dtype=object),
             "cnt": vc.to_numpy(dtype=np.int64)}
        )
        h = pd.util.hash_pandas_object(out["token"], index=False)
        out["_part"] = (h.to_numpy() % num_parts).astype(np.int64)
        return out

    def part_top(g: pd.DataFrame) -> pd.DataFrame:
        s = (
            g.groupby("token", sort=False)["cnt"].sum()
            .reset_index()
            .sort_values(["cnt", "token"], ascending=[False, True])
            .head(k)
        )
        s["cnt"] = s["cnt"].astype("int64")
        return s

    cand = (
        docs.map_batches(
            partial, batch_format="pandas", batch_size=batch_size
        )
        .sort("_part")
        .map_batches(per_group(part_top, "_part"),
                     batch_size=None, batch_format="pyarrow")
        .to_pandas()
    )
    return (
        cand.sort_values(["cnt", "token"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


#: process-level word -> piece-list memo for bpe_encode: words recur in
#: every batch, so the merge scan runs once per DISTINCT word per worker
#: (same trick as _WORD_CACHE). Keyed by (merges fingerprint, word) so a
#: retrained merge table never serves stale pieces.
_BPE_ENC_CACHE: dict = {}


def bpe_encode(docs, merges, batch_size: int = 4096):
    """Apply a trained BPE merge list to the corpus — the tokenize step
    that follows bpe_merges' training step. Per doc returns doc_id,
    n_pieces and pieces_fp (md5 of the space-joined piece stream), so
    the full encoding is value-checked without shipping every piece row.

    Task-mode map_batches (merge table is tiny and closes over the task);
    per-word encoding is the classic greedy merge-by-rank scan, memoized
    per distinct word at the process level. The pinned oracle fixture
    re-encodes with the paper's space-joined-string re.sub formulation
    (tools/gen_fixtures.py), sharing no scan code with this path."""
    pairs = [(str(l), str(r)) for l, r in merges]
    mtag = hashlib.md5(repr(pairs).encode()).hexdigest()[:12]

    def encode_word(w: str) -> list[str]:
        key = (mtag, w)
        got = _BPE_ENC_CACHE.get(key)
        if got is None:
            syms = list(w) + ["</w>"]
            for left, right in pairs:
                i, out = 0, []
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            if len(_BPE_ENC_CACHE) > 1_000_000:  # bound worker memory
                _BPE_ENC_CACHE.clear()
            _BPE_ENC_CACHE[key] = syms
            got = syms
        return got

    def stage(batch: pd.DataFrame) -> pd.DataFrame:
        ids, n_pieces, fps = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            pieces: list[str] = []
            for w in text.split():
                pieces.extend(encode_word(w))
            ids.append(doc_id)
            n_pieces.append(len(pieces))
            fps.append(hashlib.md5(" ".join(pieces).encode()).hexdigest())
        return pd.DataFrame(
            {"doc_id": pd.Series(ids, dtype="int64"),
             "n_pieces": pd.Series(n_pieces, dtype="int64"),
             "pieces_fp": pd.Series(fps, dtype="object")}
        )

    return docs.map_batches(
        stage, batch_format="pandas", batch_size=batch_size
    )


def bigram_lm(
    docs, k: int = 50, num_parts: int = 32, batch_size: int = 4096
):
    """Distributed bigram language-model training: global bigram counts
    plus the conditional probability P(w2|w1) in exact integer ppm
    (cnt * 1e6 // left-context count), top-k by count.

    Scale shape: per-batch bigram counting (the combiner — rows out are
    bounded by the batch's DISTINCT bigrams), one exchange routed by the
    LEFT word's hash, so each partition holds EVERY bigram of its left
    words and computes the left-context totals locally — the conditional
    probability needs no second exchange. Per-part top-k candidates
    union into a bounded driver merge (<= num_parts * k rows; complete
    because a bigram lives in exactly one partition). Ties break
    (cnt DESC, w1 ASC, w2 ASC), stated identically in the SQL oracle."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        pairs = []
        for t in batch["text"]:
            ws = t.split(" ")
            pairs.extend(zip(ws, ws[1:]))
        if not pairs:
            return pd.DataFrame(
                {"w1": pd.Series([], dtype="object"),
                 "w2": pd.Series([], dtype="object"),
                 "cnt": pd.Series([], dtype="int64"),
                 "_part": pd.Series([], dtype="int64")}
            )
        df = pd.DataFrame(pairs, columns=["w1", "w2"])
        out = (
            df.groupby(["w1", "w2"], sort=False).size()
            .rename("cnt").reset_index()
        )
        out["cnt"] = out["cnt"].astype("int64")
        h = pd.util.hash_pandas_object(out["w1"], index=False)
        out["_part"] = (h.to_numpy() % num_parts).astype(np.int64)
        return out

    def part_top(g: pd.DataFrame) -> pd.DataFrame:
        s = (
            g.groupby(["w1", "w2"], sort=False)["cnt"].sum().reset_index()
        )
        left = s.groupby("w1", sort=False)["cnt"].sum().rename("left_cnt")
        s = s.merge(left, on="w1")
        s["cond_ppm"] = (
            s["cnt"].to_numpy(dtype=np.int64) * 1_000_000
            // s["left_cnt"].to_numpy(dtype=np.int64)
        )
        s = s.sort_values(["cnt", "w1", "w2"],
                          ascending=[False, True, True]).head(k)
        for c in ("cnt", "left_cnt", "cond_ppm"):
            s[c] = s[c].astype("int64")
        return s

    cand = (
        docs.map_batches(
            partial, batch_format="pandas", batch_size=batch_size
        )
        .sort("_part")
        .map_batches(per_group(part_top, "_part"),
                     batch_size=None, batch_format="pyarrow")
        .to_pandas()
    )
    if cand.empty:  # zero-row to_pandas is COLUMN-LESS (CLAUDE.md)
        return pd.DataFrame(
            {"w1": pd.Series([], dtype="object"),
             "w2": pd.Series([], dtype="object"),
             "cnt": pd.Series([], dtype="int64"),
             "left_cnt": pd.Series([], dtype="int64"),
             "cond_ppm": pd.Series([], dtype="int64")}
        )
    return (
        cand.sort_values(["cnt", "w1", "w2"],
                         ascending=[False, True, True])
        .head(k)
        .reset_index(drop=True)
    )


def tfidf_top_term(docs, num_parts: int = 32, batch_size: int = 4096):
    """Most-distinctive term per document by an integer-exact TF-IDF:
    score = tf * 1_000_000 // df (log-free inverse-document-frequency
    weighting, kept in integer arithmetic so both engines floor the
    SAME division — no float log whose last ulp could flip a rank).

    Two passes over the corpus:

    1. DF: each document is exactly one input row, so per-batch
       distinct-(doc, token) counts are over DISJOINT doc sets and
       df = plain sum of partials. Partials exchange once on
       token-hash %% num_parts (never one Ray group per token) and the
       driver keeps only the VOCABULARY-sized (token, df) table —
       sublinear in corpus size (Heaps' law), the standard broadcast
       side of a TF-IDF job.
    2. Winners: the df table is ray.put ONCE and read per task; each
       batch builds its (doc, token, tf) long frame vectorized, maps
       df by a single pd merge, scores, and keeps each doc's top term
       (score DESC, term ASC) — complete within the batch because a
       doc never spans batches. No shuffle: output is one row per doc.

    Returns pandas (doc_id, term, tf, df, score), one row per doc with
    >= 1 token, sorted by doc_id.
    """
    import ray as _ray

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        pairs = {
            (int(d), w)
            for d, t in zip(batch["doc_id"], batch["text"])
            for w in set(t.split())
        }
        if not pairs:
            return pd.DataFrame(
                {"token": pd.Series([], dtype="object"),
                 "df": pd.Series([], dtype="int64"),
                 "_part": pd.Series([], dtype="int64")}
            )
        vc = pd.Series(
            [w for _, w in pairs], dtype="object"
        ).value_counts()
        out = pd.DataFrame(
            {"token": vc.index.to_numpy(dtype=object),
             "df": vc.to_numpy(dtype=np.int64)}
        )
        h = pd.util.hash_pandas_object(out["token"], index=False)
        out["_part"] = (h.to_numpy() % num_parts).astype(np.int64)
        return out

    def df_sum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", sort=False)["df"].sum().reset_index()
        s["df"] = s["df"].astype("int64")
        return s

    df_tbl = (
        docs.map_batches(
            df_partial, batch_format="pandas", batch_size=batch_size
        )
        .sort("_part")
        .map_batches(per_group(df_sum, "_part"),
                     batch_size=None, batch_format="pyarrow")
        .to_pandas()  # vocabulary-sized by construction
    )
    df_ref = _ray.put(df_tbl)

    def winners(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "term": pd.Series([], dtype="object"),
             "tf": pd.Series([], dtype="int64"),
             "df": pd.Series([], dtype="int64"),
             "score": pd.Series([], dtype="int64")}
        )
        if not len(batch):
            return empty
        words = [t.split() for t in batch["text"]]
        lens = np.array([len(w) for w in words], dtype=np.int64)
        long = pd.DataFrame(
            {
                "doc_id": np.repeat(
                    batch["doc_id"].to_numpy(np.int64), lens
                ),
                "term": np.array(
                    [w for ws in words for w in ws], dtype=object
                ),
            }
        )
        if not len(long):
            return empty
        tf = (
            long.groupby(["doc_id", "term"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        dfs = _ray.get(df_ref)
        m = tf.merge(dfs, left_on="term", right_on="token", how="left")
        m["tf"] = m["tf"].astype("int64")
        m["df"] = m["df"].astype("int64")
        m["score"] = (m["tf"] * 1_000_000 // m["df"]).astype("int64")
        top = (
            m.sort_values(
                ["doc_id", "score", "term"],
                ascending=[True, False, True],
            )
            .drop_duplicates("doc_id")
        )
        return top[["doc_id", "term", "tf", "df", "score"]]

    out = docs.map_batches(
        winners, batch_format="pandas", batch_size=batch_size
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# --- PII redaction ----------------------------------------------------------

#: RE2-compatible patterns (no lookaround/backrefs) so the DuckDB oracle
#: applies the literally identical regex
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+1-[0-9]{3}-[0-9]{4}"


class PIIRedactor:
    """Masks emails/NANP-style phone numbers with [EMAIL]/[PHONE] tokens
    and counts the matches — the scrubbing step a training-data pipeline
    runs before anything leaves the raw zone. Vectorized pandas str ops;
    counts come from the ORIGINAL text (counting after the email pass
    would miss a phone inside a replaced span)."""

    def __init__(self):
        self.email = re.compile(PII_EMAIL_RE)
        self.phone = re.compile(PII_PHONE_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"]
        batch["n_emails"] = texts.str.count(self.email).astype("int64")
        batch["n_phones"] = texts.str.count(self.phone).astype("int64")
        batch["redacted"] = (
            texts.str.replace(self.email, "[EMAIL]", regex=True)
            .str.replace(self.phone, "[PHONE]", regex=True)
        )
        return batch


def redact_pii(ds, concurrency: int | None = None, batch_size: int = 2048):
    return _text_stage(ds, PIIRedactor, concurrency, batch_size)


def bpe_merges(docs, n_merges: int = 40, vocab_words: int = 2000):
    """Byte-pair-encoding merge training — the tokenizer-training step of
    an LLM data pipeline.

    Scale split is the standard one (SentencePiece/subword-nmt): the
    corpus-scale work is EXACT word counting, which runs distributed
    (top_tokens' hash-partition heavy-hitters — per-batch combiners, one
    bounded exchange); the merge loop then trains on the bounded
    (word, count) table driver-side, because pair statistics over a
    capped vocabulary are O(vocab x word_len) per merge, independent of
    corpus size. vocab_words caps the table with the deterministic
    (count DESC, token ASC) tie rule — stated identically in the pinned
    reference (tools/gen_fixtures.py bpe_ref), which shares no code with
    this implementation.

    Classic Sennrich formulation: each word is a symbol sequence of its
    characters plus a terminal '</w>'; each round merges the most
    frequent adjacent pair (count DESC, then lexicographically smallest
    (left, right)) and records (rank, left, right, freq). Stops early
    when no adjacent pair remains. Returns a pandas DataFrame — a small
    result by contract (n_merges rows).
    """
    import pandas as pd

    vocab = top_tokens(docs, k=vocab_words)
    words = [
        (list(w) + ["</w>"], int(c))
        for w, c in zip(vocab["token"], vocab["cnt"])
    ]
    out = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, cnt in words:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        (left, right), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        out.append((rank, left, right, freq))
        merged = left + right
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == left and syms[i + 1] == right:
                    syms[i : i + 2] = [merged]
                else:
                    i += 1
    return pd.DataFrame(
        out, columns=["rank", "left", "right", "freq"]
    ).astype({"rank": "int64", "freq": "int64"})
