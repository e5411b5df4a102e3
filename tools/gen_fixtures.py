"""Generate pinned oracle fixtures for queries whose semantics SQL can't
restate (SURVEY §5 test strategy: independent-implementation oracles).

The simhash fixture is computed by a PURE-PYTHON reference implementation
(Counter + per-bit loop — deliberately sharing no code with the vectorized
``SimHasher``), so the CORRECTNESS comparison is a genuine cross-check of
the numpy bit-packing path, not a self-comparison.

Usage: python tools/gen_fixtures.py [out_dir]
Generates fixtures for EVERY scale in SF_DIRS (sf0.001/0.01/0.1) into
out_dir (default: fixtures/, committed). Each fixture carries a
content-hash tag of its source corpus so the static oracle SQL
self-selects the right one at query time.
"""

import hashlib
import os
import sys
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq


def simhash_ref(text: str) -> int:
    """Reference SimHash: count-weighted sign sum of per-word blake2b-64."""
    words = text.split()
    if not words:
        return 0
    acc = [0] * 64
    for w, cnt in Counter(words).items():
        h = int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=8).digest(), "little"
        )
        for i in range(64):
            acc[i] += cnt if (h >> i) & 1 else -cnt
    return sum(1 << i for i in range(64) if acc[i] > 0)


def lsh_topk_ref(sf_dir: str, k: int = 10, n_planes: int = 8, seed: int = 5):
    """Reference single-probe LSH top-k (query = vec_id 0), recomputed
    from first principles with plain numpy — mirrors the published
    random-hyperplane construction, independent of functions/ann.py's
    Ray pipeline staging."""
    import numpy as np

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = t.column("vec_id").to_numpy()
    M = np.vstack(
        [np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()]
    )
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    q = M[list(ids).index(0)]
    planes = np.random.default_rng(seed).standard_normal((n_planes, M.shape[1]))
    pows = (1 << np.arange(n_planes)).astype(np.int64)
    buckets = ((M @ planes.T) > 0).astype(np.int64) @ pows
    qb = int(((q @ planes.T) > 0).astype(np.int64) @ pows)
    mask = buckets == qb
    scores = M[mask] @ q
    bids = ids[mask]
    order = np.lexsort((bids, -scores))[:k]
    return [
        (0, int(bids[i]), round(float(scores[i]), 4)) for i in order
    ]


#: Each fixture carries a constant `tag` column = a content hash of its
#: source corpus, computed IN DuckDB so the oracle SQL can recompute the
#: identical tag from the registered view and self-select the matching
#: fixture via a glob — the pinned oracle is then valid at every test
#: scale (corpus row counts collide across sf dirs; content does not).
SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1")

DOCS_TAG_SQL = """
SELECT md5(text) FROM read_parquet('{p}')
WHERE doc_id = (SELECT min(doc_id) FROM read_parquet('{p}'))
"""
EMB_TAG_SQL = """
SELECT md5(embedding::VARCHAR) FROM read_parquet('{p}') WHERE vec_id = 0
"""


def bpe_ref(sf_dir: str, n_merges: int = 40, vocab_words: int = 2000):
    """Reference BPE merge training (Sennrich formulation), written from
    first principles with Counter + the paper's space-joined-string
    re.sub merge — deliberately sharing no code with
    functions/text.bpe_merges. Word table: whitespace tokens, top
    vocab_words by (count DESC, token ASC). Merge rule per round: most
    frequent adjacent symbol pair, ties to the lexicographically
    smallest (left, right); words start as chars + '</w>'."""
    import re

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["text"])
    counts = Counter()
    for text in t.column("text").to_pylist():
        counts.update(text.split())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    top = top[:vocab_words]
    table = {" ".join(list(w) + ["</w>"]): c for w, c in top}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for word, c in table.items():
            syms = word.split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (left, right), freq = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        merges.append((rank, left, right, freq))
        pat = re.compile(
            r"(?<!\S)" + re.escape(left + " " + right) + r"(?!\S)"
        )
        table = {
            pat.sub(left + right, word): c for word, c in table.items()
        }
    return merges


def bpe_apply_ref(sf_dir: str, merges) -> list[tuple]:
    """Reference BPE APPLY using the paper's space-joined-string re.sub
    per merge (the same formulation bpe_ref trains with) — deliberately
    sharing no code with functions/text.bpe_encode's list-scan path.
    Returns (doc_id, n_pieces, md5-of-piece-stream) per doc."""
    import re

    pats = [
        (re.compile(r"(?<!\S)" + re.escape(l + " " + r) + r"(?!\S)"),
         l + r)
        for _, l, r, _ in merges
    ]
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    cache: dict[str, list[str]] = {}
    rows = []
    for doc_id, text in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
        pieces: list[str] = []
        for w in text.split():
            got = cache.get(w)
            if got is None:
                s = " ".join(list(w) + ["</w>"])
                for pat, rep in pats:
                    s = pat.sub(rep, s)
                got = s.split(" ")
                cache[w] = got
            pieces.extend(got)
        rows.append(
            (doc_id, len(pieces),
             hashlib.md5(" ".join(pieces).encode()).hexdigest())
        )
    return rows


def gen_one(sf_dir: str, out_dir: str) -> None:
    import duckdb

    con = duckdb.connect()
    doc_path = os.path.join(sf_dir, "documents.parquet")
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    doc_tag = con.execute(DOCS_TAG_SQL.format(p=doc_path)).fetchone()[0]
    emb_tag = con.execute(EMB_TAG_SQL.format(p=emb_path)).fetchone()[0]

    docs = pq.read_table(doc_path, columns=["doc_id", "text"])
    sigs = [simhash_ref(t) for t in docs.column("text").to_pylist()]
    out = pa.table(
        {
            "tag": pa.array([doc_tag] * docs.num_rows),
            "doc_id": docs.column("doc_id"),
            "simhash_hex": pa.array([f"{s:016x}" for s in sigs]),
            # two's-complement int64 view so SQL can xor/bit_count it
            # (the Hamming-closure oracle for simhash_dedup_keep_first)
            "simhash_int": pa.array(
                [s - (1 << 64) if s >= (1 << 63) else s for s in sigs],
                pa.int64(),
            ),
        }
    )
    path = os.path.join(out_dir, f"simhash_{doc_tag[:12]}.parquet")
    pq.write_table(out, path)
    print(f"wrote {path}: {out.num_rows} rows")

    rows = lsh_topk_ref(sf_dir)
    out2 = pa.table(
        {
            "tag": pa.array([emb_tag] * len(rows)),
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "vec_id": pa.array([r[1] for r in rows], pa.int64()),
            "score": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    path2 = os.path.join(out_dir, f"lsh_topk_{emb_tag[:12]}.parquet")
    pq.write_table(out2, path2)
    print(f"wrote {path2}: {out2.num_rows} rows")

    merges = bpe_ref(sf_dir)
    out3 = pa.table(
        {
            "tag": pa.array([doc_tag] * len(merges)),
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges]),
            "right": pa.array([m[2] for m in merges]),
            "freq": pa.array([m[3] for m in merges], pa.int64()),
        }
    )
    path3 = os.path.join(out_dir, f"bpe_{doc_tag[:12]}.parquet")
    pq.write_table(out3, path3)
    print(f"wrote {path3}: {out3.num_rows} rows")

    enc = bpe_apply_ref(sf_dir, merges)
    out4 = pa.table(
        {
            "tag": pa.array([doc_tag] * len(enc)),
            "doc_id": pa.array([r[0] for r in enc], pa.int64()),
            "n_pieces": pa.array([r[1] for r in enc], pa.int64()),
            "pieces_fp": pa.array([r[2] for r in enc]),
        }
    )
    path4 = os.path.join(out_dir, f"bpeapply_{doc_tag[:12]}.parquet")
    pq.write_table(out4, path4)
    print(f"wrote {path4}: {out4.num_rows} rows")


def _cdc_oracle_state(epochs_upto: int | None):
    """Sequential replay_oracle fold of the ONE pinned CDC fixture spec,
    optionally truncated to the first `epochs_upto` epoch tables —
    shared by gen_cdc_replay (final state) and gen_cdc_asof (epochs 0..1)
    so the two fixtures cdc_epoch_diff's oracle joins can never
    desynchronize in spec, schema, or tag rule. Returns (want, out, tag):
    the full oracle table, the canonical 4-column cast, and the spec
    hash."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from data_sync_ray import (
        StreamSpec, gen_base_table, gen_change_stream, replay_oracle,
    )

    spec = StreamSpec(n_events=5000, n_docs=500, n_epochs=3, seed=42,
                      evolve_from_epoch=2)
    tag = hashlib.md5(repr(spec).encode()).hexdigest()
    base = gen_base_table(500, seed=42)
    epochs = gen_change_stream(spec)
    if epochs_upto is not None:
        epochs = epochs[:epochs_upto]
    want = replay_oracle(base, epochs)
    out = want.select(["doc_id", "n_tok", "source", "log_pos"]).cast(
        pa.schema(
            [("doc_id", pa.string()), ("n_tok", pa.int64()),
             ("source", pa.string()), ("log_pos", pa.int64())]
        )
    )
    return want, out, tag


def gen_cdc_replay(out_dir: str) -> None:
    """Pinned expected final lake state for the `cdc_replay_lake` query:
    computed by `replay_oracle` — the SEQUENTIAL single-process reference
    (an in-order dict fold, datamodel.py) that shares none of the
    distributed spill/fold/commit machinery it checks. The query's
    fixture spec is constant (sf-independent), so one fixture file
    serves every scale; the tag pins the spec so a spec change without
    `gen_fixtures.py` rerun turns the oracle red instead of silently
    passing."""
    want, out, tag = _cdc_oracle_state(None)
    # oracle-reproducible content key: the ','-joined token string, so
    # SQL can rebuild the content-HLL of cdc_lake_dup_gauge from
    # md5(content_key) without list serialization on the SQL side
    content_key = [
        ",".join(map(str, r or []))
        for r in want.column("tokens").to_pylist()
    ]
    out = out.append_column("content_key", pa.array(content_key, pa.string()))
    out = out.append_column("tag", pa.array([tag] * out.num_rows))
    path = os.path.join(out_dir, f"cdc_replay_{tag[:12]}.parquet")
    pq.write_table(out, path)
    print(f"wrote {path}: {out.num_rows} rows")


def gen_cdc_asof(out_dir: str) -> None:
    """Pinned expected AS-OF-EPOCH-1 lake state for the `cdc_epoch_diff`
    query: the same sequential replay_oracle reference and the same
    StreamSpec constants as gen_cdc_replay, but folding only the
    bootstrap + epochs 0..1 slice — the diff oracle full-outer-joins
    this against the final-state fixture. File prefix `cdcasof_` is
    deliberately NOT matched by the `cdc_replay_*` glob (the bpe/bpeapply
    collision lesson)."""
    _, out, tag = _cdc_oracle_state(2)  # epochs 0..1
    out = out.append_column("tag", pa.array([tag] * out.num_rows))
    path = os.path.join(out_dir, f"cdcasof_{tag[:12]}.parquet")
    pq.write_table(out, path)
    print(f"wrote {path}: {out.num_rows} rows")


def _ref_ppm_raster(payload: bytes) -> tuple[int, int, bytes]:
    """Byte-level PPM reference decode -> (w, h, raster bytes).

    Exact header grammar of encode_ppm ("P6\n{w} {h}\n255\n"): a
    bytes.split(maxsplit=3) here would also consume leading
    WHITESPACE-CLASS RASTER BYTES (0x09-0x0D, 0x20) as header delimiter
    — ~2.3% of images start with one — shifting the reference raster and
    pinning a WRONG oracle checksum."""
    import re as _re

    m = _re.match(rb"P6\n(\d+) (\d+)\n255\n", payload)
    assert m, "unexpected PPM header"
    w, h = int(m.group(1)), int(m.group(2))
    raster = payload[m.end() : m.end() + w * h * 3]
    assert len(raster) == w * h * 3
    return w, h, raster


def _ref_png_raster(payload: bytes) -> tuple[int, int, bytes]:
    """Independent PNG reference decode -> (w, h, raster bytes): chunk
    walk by struct, stdlib inflate, then a PER-BYTE pure-Python unfilter
    (spec 9.2/9.4 recurrences verbatim) — no numpy, nothing shared with
    multimodal.decode_png's vectorized path. Also validates the CRCs the
    engine skips."""
    import struct
    import zlib as _zlib

    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    j, w, h = 8, None, None
    idat = b""
    while j + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, j)
        tag_ = payload[j + 4 : j + 8]
        body = payload[j + 8 : j + 8 + ln]
        crc = struct.unpack_from(">I", payload, j + 8 + ln)[0]
        assert crc == _zlib.crc32(tag_ + body) & 0xFFFFFFFF
        if tag_ == b"IHDR":
            w, h, depth, ct = struct.unpack_from(">IIBB", body)
            assert depth == 8 and ct == 2, "fixture expects RGB8"
        elif tag_ == b"IDAT":
            idat += body
        j += 12 + ln
    raw = _zlib.decompress(idat)
    bpp, stride = 3, w * 3 + 1
    recon = bytearray()
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        f, cur = line[0], bytearray(line[1:])
        for x in range(len(cur)):
            a = cur[x - bpp] if x >= bpp else 0  # left
            b = recon[(y - 1) * w * 3 + x] if y else 0  # up
            c = (
                recon[(y - 1) * w * 3 + x - bpp]
                if (y and x >= bpp) else 0
            )  # up-left
            if f == 1:
                cur[x] = (cur[x] + a) & 0xFF
            elif f == 2:
                cur[x] = (cur[x] + b) & 0xFF
            elif f == 3:
                cur[x] = (cur[x] + (a + b) // 2) & 0xFF
            elif f == 4:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = (
                    a if pa_ <= pb_ and pa_ <= pc_
                    else b if pb_ <= pc_ else c
                )
                cur[x] = (cur[x] + pred) & 0xFF
        recon += cur
    return w, h, bytes(recon)


def _ref_jpeg_pixels(payload: bytes):
    """Independent baseline-JPEG reference decode -> (w, h, pixel int
    list, n_components): marker walk with int.from_bytes, its own
    canonical-Huffman builder and MSB bit reader over hand-destuffed
    scan bytes, a math.cos TRIPLE-LOOP IDCT straight from T.81 A.3.3,
    and scalar float color conversion with round() — no numpy, nothing
    shared with multimodal.decode_jpeg's einsum path. Pixel values and
    rounding must agree bit-for-bit with the engine (gen_media asserts
    so at generation time; a knife-edge half would fail THERE, loudly,
    not in CI)."""
    import math

    assert payload[:2] == b"\xff\xd8"
    ZZ = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    qts, huffs = {}, {}
    comps, w, h = None, 0, 0
    scan, scan_comps = None, None
    j = 2
    while j < len(payload):
        assert payload[j] == 0xFF, "marker desync"
        m = payload[j + 1]
        if m == 0xD9:
            break
        ln = int.from_bytes(payload[j + 2 : j + 4], "big")
        body = payload[j + 4 : j + 2 + ln]
        if m == 0xDB:
            k = 0
            while k < len(body):
                assert body[k] >> 4 == 0
                tq = body[k] & 0xF
                tbl = [0] * 64
                for z in range(64):
                    tbl[ZZ[z]] = body[k + 1 + z]
                qts[tq] = tbl
                k += 65
        elif m == 0xC4:
            k = 0
            while k < len(body):
                tc, th = body[k] >> 4, body[k] & 0xF
                bits = list(body[k + 1 : k + 17])
                nv = sum(bits)
                vals = list(body[k + 17 : k + 17 + nv])
                code, idx, tab = 0, 0, {}
                for L in range(1, 17):
                    for _ in range(bits[L - 1]):
                        tab[(L, code)] = vals[idx]
                        code += 1
                        idx += 1
                    code <<= 1
                huffs[(tc, th)] = tab
                k += 17 + nv
        elif m == 0xC0:
            assert body[0] == 8
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for k in range(nc):
                cid, hv, tq = body[6 + 3 * k : 9 + 3 * k]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif m == 0xDA:
            ns = body[0]
            scan_comps = []
            for k in range(ns):
                cs, tt = body[1 + 2 * k : 3 + 2 * k]
                scan_comps.append((cs, tt >> 4, tt & 0xF))
            k = j + 2 + ln
            raw = []
            while k < len(payload):
                b = payload[k]
                if b == 0xFF:
                    if k + 1 < len(payload) and payload[k + 1] == 0:
                        raw.append(0xFF)
                        k += 2
                        continue
                    break
                raw.append(b)
                k += 1
            scan = raw
            j = k
            continue
        j += 2 + ln
    assert comps is not None and scan is not None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))

    state = {"p": 0, "n": 0, "acc": 0}

    def bit():
        if state["n"] == 0:
            state["acc"] = scan[state["p"]]
            state["p"] += 1
            state["n"] = 8
        state["n"] -= 1
        return (state["acc"] >> state["n"]) & 1

    def bits_(k):
        v = 0
        for _ in range(k):
            v = (v << 1) | bit()
        return v

    def huff(tab):
        code = 0
        for L in range(1, 17):
            code = (code << 1) | bit()
            if (L, code) in tab:
                return tab[(L, code)]
        raise ValueError("bad huffman code")

    def extend(v, s):
        if s == 0:
            return 0
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    cosv = [
        [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
        for x in range(8)
    ]

    def a(u):
        return (1.0 / math.sqrt(2.0)) if u == 0 else 1.0

    pred = {c[0]: 0 for c in comps}
    blocks = {
        c[0]: [[None] * (mcx * c[1]) for _ in range(mcy * c[2])]
        for c in comps
    }
    for my in range(mcy):
        for mx in range(mcx):
            for cs, td, ta in scan_comps:
                cid, sh, sv, tq = next(c for c in comps if c[0] == cs)
                for by in range(sv):
                    for bx in range(sh):
                        zz = [0] * 64
                        s = huff(huffs[(0, td)])
                        pred[cid] += extend(bits_(s), s)
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = huff(huffs[(1, ta)])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break
                            k += r
                            zz[k] = extend(bits_(s), s)
                            k += 1
                        # dequantize + inverse zigzag + T.81 A.3.3 IDCT
                        F = [0.0] * 64
                        q = qts[tq]
                        for z in range(64):
                            F[ZZ[z]] = zz[z] * q[ZZ[z]]
                        pix = [[0.0] * 8 for _ in range(8)]
                        for y in range(8):
                            for x in range(8):
                                sacc = 0.0
                                for u in range(8):
                                    for v in range(8):
                                        sacc += (
                                            a(u) * a(v)
                                            * F[u * 8 + v]
                                            * cosv[y][u] * cosv[x][v]
                                        )
                                pix[y][x] = sacc / 4.0 + 128.0
                        blocks[cid][my * sv + by][mx * sh + bx] = pix
    planes = []
    for cid, sh, sv, tq in comps:
        ph, pw = mcy * sv * 8, mcx * sh * 8
        plane = [[0.0] * pw for _ in range(ph)]
        for byi, row in enumerate(blocks[cid]):
            for bxi, blk in enumerate(row):
                for y in range(8):
                    for x in range(8):
                        plane[byi * 8 + y][bxi * 8 + x] = blk[y][x]
        ry, rx = vmax // sv, hmax // sh
        up = [
            [plane[y // ry][x // rx] for x in range(w)] for y in range(h)
        ]
        planes.append(up)
    out = []
    if len(planes) == 1:
        for y in range(h):
            for x in range(w):
                v = round(planes[0][y][x])
                out.append(min(255, max(0, v)))
        return w, h, out, 1
    for y in range(h):
        for x in range(w):
            Y = planes[0][y][x]
            cb = planes[1][y][x] - 128.0
            cr = planes[2][y][x] - 128.0
            for val in (
                Y + 1.402 * cr,
                Y - 0.344136 * cb - 0.714136 * cr,
                Y + 1.772 * cb,
            ):
                out.append(min(255, max(0, round(val))))
    return w, h, out, 3


def gen_media(out_dir: str) -> None:
    """Pinned expected stats for `media_decode_stats`: the same seeded
    media table decoded by a BYTE-LEVEL pure-Python reference — header
    parsing with split/int, raster checksums with struct loops over the
    raw bytes — sharing no numpy reshaping with the engine's decoders
    (functions/multimodal.py). Integer-exact, so the driver hash is a
    bit-for-bit cross-check of the real decode path."""
    import struct

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from data_sync_ray.functions.multimodal import gen_real_media
    from data_sync_ray.pipelines.queries import (
        _MEDIA_N, _MEDIA_SEED, _MEDIA_SIZE,
    )

    media = gen_real_media(_MEDIA_N, seed=_MEDIA_SEED, size=_MEDIA_SIZE)
    rows = []
    for mid, mt, payload in zip(
        media.column("media_id").to_pylist(),
        media.column("media_type").to_pylist(),
        media.column("payload").to_pylist(),
    ):
        if mt == "image/x-portable-pixmap":
            w, h, raster = _ref_ppm_raster(payload)
            rows.append((mid, mt, h, w, sum(raster)))
        elif mt == "image/png":
            w, h, recon = _ref_png_raster(payload)
            rows.append((mid, mt, h, w, sum(recon)))
        elif mt == "image/jpeg":
            w, h, pix, nc = _ref_jpeg_pixels(payload)
            # knife-edge guard: the reference's scalar math and the
            # engine's einsum path must agree BIT-FOR-BIT here, at
            # generation time, or the fixture is not a valid oracle
            from data_sync_ray.functions.multimodal import decode_jpeg

            eng = decode_jpeg(payload)
            assert eng.shape[:2] == (h, w) and (
                (eng.ndim == 2) == (nc == 1)
            ), f"{mid}: shape mismatch {eng.shape} vs {(h, w, nc)}"
            assert eng.reshape(-1).tolist() == pix, (
                f"{mid}: engine/reference JPEG pixel mismatch"
            )
            rows.append((mid, mt, h, w, sum(pix)))
        else:
            assert mt == "audio/wav" and payload[:4] == b"RIFF"
            # walk RIFF chunks by hand: fmt -> sample rate, data -> PCM
            i, rate, data = 12, None, b""
            while i + 8 <= len(payload):
                cid, sz = payload[i : i + 4], struct.unpack_from(
                    "<I", payload, i + 4
                )[0]
                body = payload[i + 8 : i + 8 + sz]
                if cid == b"fmt ":
                    rate = struct.unpack_from("<I", body, 4)[0]
                elif cid == b"data":
                    data = body
                i += 8 + sz + (sz & 1)
            n = len(data) // 2
            sq = 0
            for (s,) in struct.iter_unpack("<h", data[: n * 2]):
                sq += s * s
            rows.append((mid, mt, n, rate, sq))
    tag = hashlib.md5(
        b"".join(media.column("payload").to_pylist())
    ).hexdigest()
    out = pa.table(
        {
            "media_id": pa.array([r[0] for r in rows]),
            "media_type": pa.array([r[1] for r in rows]),
            "dim1": pa.array([r[2] for r in rows], pa.int64()),
            "dim2": pa.array([r[3] for r in rows], pa.int64()),
            "checksum": pa.array([r[4] for r in rows], pa.int64()),
            "tag": pa.array([tag] * len(rows)),
        }
    )
    path = os.path.join(out_dir, f"media_stats_{tag[:12]}.parquet")
    pq.write_table(out, path)
    print(f"wrote {path}: {out.num_rows} rows")


def gen_resize(out_dir: str) -> None:
    """Pinned expected stats for `media_resize_stats`: each reference
    raster (byte-level decode above) box-mean downsampled to 4x4 with
    pure-Python double loops — floor(sum(box)/box_size) per channel,
    integer-exact — then summed. Shares the payload tag with gen_media
    (same media spec)."""
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from data_sync_ray.functions.multimodal import gen_real_media
    from data_sync_ray.pipelines.queries import (
        _MEDIA_N, _MEDIA_SEED, _MEDIA_SIZE,
    )

    media = gen_real_media(_MEDIA_N, seed=_MEDIA_SEED, size=_MEDIA_SIZE)
    out_h = out_w = 4
    rows = []
    for mid, mt, payload in zip(
        media.column("media_id").to_pylist(),
        media.column("media_type").to_pylist(),
        media.column("payload").to_pylist(),
    ):
        if mt == "image/x-portable-pixmap":
            w, h, raster = _ref_ppm_raster(payload)
        elif mt == "image/png":
            w, h, raster = _ref_png_raster(payload)
        elif mt == "image/jpeg":
            w, h, raster, nc = _ref_jpeg_pixels(payload)
            if nc != 3:
                continue  # grayscale: no 3-channel raster to resize
        else:
            continue
        fh, fw = h // out_h, w // out_w
        assert fh * out_h == h and fw * out_w == w
        total = 0
        for oy in range(out_h):
            for ox in range(out_w):
                for ch in range(3):
                    s = 0
                    for y in range(oy * fh, (oy + 1) * fh):
                        for x in range(ox * fw, (ox + 1) * fw):
                            s += raster[(y * w + x) * 3 + ch]
                    total += s // (fh * fw)  # floor of the box mean
        rows.append((mid, mt, total))
    tag = hashlib.md5(
        b"".join(media.column("payload").to_pylist())
    ).hexdigest()
    out = pa.table(
        {
            "media_id": pa.array([r[0] for r in rows]),
            "media_type": pa.array([r[1] for r in rows]),
            "out_h": pa.array([out_h] * len(rows), pa.int64()),
            "out_w": pa.array([out_w] * len(rows), pa.int64()),
            "resized_sum": pa.array([r[2] for r in rows], pa.int64()),
            "tag": pa.array([tag] * len(rows)),
        }
    )
    path = os.path.join(out_dir, f"resize_stats_{tag[:12]}.parquet")
    pq.write_table(out, path)
    print(f"wrote {path}: {out.num_rows} rows")


def gen_video_frames(out_dir: str) -> None:
    """Pinned expected rows for `video_frame_sample_stats`: an
    independent pure-Python Y4M walk (text header split, index()-based
    FRAME scans, per-byte sum loops — no numpy, nothing shared with
    multimodal.decode_y4m) re-derives every 3rd frame's geometry and
    luma byte sum."""
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from data_sync_ray.functions.multimodal import gen_real_video
    from data_sync_ray.pipelines.queries import (
        _VIDEO_N, _VIDEO_SEED, _VIDEO_SIZE, _VIDEO_STRIDE,
    )

    vids = gen_real_video(_VIDEO_N, seed=_VIDEO_SEED, size=_VIDEO_SIZE)
    rows = []
    for mid, payload in zip(
        vids.column("media_id").to_pylist(),
        vids.column("payload").to_pylist(),
    ):
        nl = payload.index(b"\n")
        fields = payload[:nl].decode().split(" ")
        assert fields[0] == "YUV4MPEG2"
        w = h = None
        for f in fields[1:]:
            if f[0] == "W":
                w = int(f[1:])
            elif f[0] == "H":
                h = int(f[1:])
            elif f[0] == "C":
                assert f[1:] == "mono"
        pos, idx = nl + 1, 0
        while pos < len(payload):
            assert payload.index(b"FRAME\n", pos) == pos
            plane = payload[pos + 6 : pos + 6 + w * h]
            assert len(plane) == w * h
            if idx % _VIDEO_STRIDE == 0:
                rows.append((mid, idx, h, w, sum(plane)))
            pos += 6 + w * h
            idx += 1
    tag = hashlib.md5(
        b"".join(vids.column("payload").to_pylist())
    ).hexdigest()
    out = pa.table(
        {
            "media_id": pa.array([r[0] for r in rows]),
            "frame_index": pa.array([r[1] for r in rows], pa.int64()),
            "height": pa.array([r[2] for r in rows], pa.int64()),
            "width": pa.array([r[3] for r in rows], pa.int64()),
            "luma_sum": pa.array([r[4] for r in rows], pa.int64()),
            "tag": pa.array([tag] * len(rows)),
        }
    )
    path = os.path.join(out_dir, f"video_frames_{tag[:12]}.parquet")
    pq.write_table(out, path)
    print(f"wrote {path}: {out.num_rows} rows")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
    )
    os.makedirs(out_dir, exist_ok=True)
    for sf_dir in SF_DIRS:
        gen_one(sf_dir, out_dir)
    gen_cdc_replay(out_dir)
    gen_cdc_asof(out_dir)
    gen_media(out_dir)
    gen_resize(out_dir)
    gen_video_frames(out_dir)


if __name__ == "__main__":
    main()
