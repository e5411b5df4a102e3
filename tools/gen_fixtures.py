"""Generate pinned oracle fixtures for queries whose semantics SQL can't
restate (SURVEY §5 test strategy: independent-implementation oracles).

The simhash fixture is computed by a PURE-PYTHON reference implementation
(Counter + per-bit loop — deliberately sharing no code with the vectorized
``SimHasher``), so the CORRECTNESS comparison is a genuine cross-check of
the numpy bit-packing path, not a self-comparison.

Usage: python tools/gen_fixtures.py [sf_dir] [out_dir]
Defaults: /root/testdata/sf0.01 -> fixtures/ (committed; the driver's
correctness gate runs at sf0.01).
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
    )
    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    hexes = [
        f"{simhash_ref(t):016x}" for t in docs.column("text").to_pylist()
    ]
    out = pa.table(
        {"doc_id": docs.column("doc_id"), "simhash_hex": pa.array(hexes)}
    )
    path = os.path.join(out_dir, "simhash_sf001.parquet")
    pq.write_table(out, path)
    print(f"wrote {path}: {out.num_rows} rows")


if __name__ == "__main__":
    main()
