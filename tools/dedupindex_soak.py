"""Cross-epoch incremental dedup at soak scale: ingest E epochs of
n docs each through a persistent DedupIndex (state/dedupindex.py) and
record the per-epoch wall-time curve — the operator's claim is that
epoch N costs O(epoch + history/P per touched partition), NOT
O(total corpus), so the curve must stay near-flat as admitted history
grows. Compaction halfway through pins the other half of the claim:
folding per-epoch index files into one base per partition keeps the
seen-set read at O(1) file opens.

Planted structure makes expected survivor counts EXACT: every non-dup
text is globally unique by construction ("e{e}_d{i}" token streams)
and every planted dup copies a uniformly-chosen EARLIER doc's text, so
epoch e admits exactly its non-dup count (a dup-of-a-dup still traces
to an admitted original). A 1/100-scale parity anchor replays the same
generator against a pandas keep-first-over-(epoch, doc_id) oracle and
must match id-for-id.

Usage: PYTHONPATH=/root/repo python tools/dedupindex_soak.py
           [n_per_epoch] [n_epochs] [cpus] [exact|neardup]

neardup mode runs the same planted corpus through the SimHash
NearDupIndex (state/neardupindex.py): with unique-token texts the only
Hamming<=3 pairs are the planted exact dups (random 64-bit signatures
collide at <=3 with p ~ 2.4e-12/pair), so the exact expected survivor
counts carry over — what changes is the measured cost (SimHash + 4x
band-row exchange + the per-doc OR exchange vs one md5 exchange).
"""
import shutil
import sys
import tempfile
import time

import numpy as np
import pandas as pd
import ray
import ray.data as rd

DUP_RATE = 0.2
SEED = 13


_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)


def _splitmix(x: np.ndarray) -> np.ndarray:
    """Counter-based 64-bit mix (splitmix64 finalizer) — per-doc
    decisions are pure functions of (epoch, i), so expected counts are
    exact regardless of how Ray batches the generator."""
    x = (x + _MIX1).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _MIX2
    x ^= x >> np.uint64(27)
    x *= _MIX3
    x ^= x >> np.uint64(31)
    return x


def _dup_mask(epoch: int, idx: np.ndarray) -> np.ndarray:
    if epoch == 0:
        return np.zeros(len(idx), dtype=bool)
    h = _splitmix(
        idx.astype(np.uint64)
        + np.uint64(SEED + epoch) * np.uint64(0x100000001)
    )
    return (h >> np.uint64(11)) < np.uint64(int(DUP_RATE * (1 << 53)))


def gen_epoch(n: int, epoch: int, blocks: int = 64) -> rd.Dataset:
    """One ingest epoch, generated in parallel per block (the corpus
    never sits on the driver). doc_id is globally unique and increasing
    with epoch; a DUP_RATE fraction of docs (none in epoch 0) copy the
    text of a deterministically-chosen earlier doc."""

    def _src(e: int, i: int) -> int:
        return int(
            _splitmix(
                np.asarray([i], dtype=np.uint64)
                + np.uint64(SEED * 7 + e * 31)
            )[0]
            % np.uint64(e * n)
        )

    def _resolve(e: int, i: int) -> tuple[int, int]:
        """Follow dup references to the true original: a dup may point
        at a doc that was itself a dup, whose _text never entered the
        corpus. Chains are finite (src is always a strictly earlier
        epoch) and short (geometric in DUP_RATE)."""
        while _dup_mask(e, np.asarray([i]))[0]:
            e, i = divmod(_src(e, i), n)
        return e, i

    def make_block(b: pd.DataFrame) -> pd.DataFrame:
        idx = b["i"].to_numpy()
        doc_ids = epoch * n + idx
        dup = _dup_mask(epoch, idx)
        texts = []
        for j, i in enumerate(idx):
            if dup[j]:
                se, si = _resolve(*divmod(_src(epoch, int(i)), n))
                texts.append(_text(se, si))
            else:
                texts.append(_text(epoch, int(i)))
        return pd.DataFrame({"doc_id": doc_ids, "text": texts})

    base = rd.range(n, override_num_blocks=blocks).map_batches(
        lambda b: pd.DataFrame({"i": b["id"]}), batch_format="pandas"
    )
    return base.map_batches(make_block, batch_format="pandas")


def _text(epoch: int, i: int) -> str:
    """Globally-unique deterministic 16-token text for original
    (epoch, i) — reconstructible from any dup reference."""
    toks = _splitmix(
        np.arange(15, dtype=np.uint64)
        + np.uint64(((epoch << 32) | i) * 1_000_003)
    )
    return f"e{epoch}_d{i} " + " ".join(map(str, toks))


def expected_survivors(n: int, epoch: int) -> int:
    """Exact planted-original count for one epoch (the dup decision is
    a pure per-doc function, so this is just its complement count)."""
    return int((~_dup_mask(epoch, np.arange(n))).sum())


def _index_cls(mode: str):
    if mode == "neardup":
        from data_sync_ray.state.neardupindex import NearDupIndex

        return NearDupIndex
    from data_sync_ray.state.dedupindex import DedupIndex

    return DedupIndex


def run(n: int, epochs: int, workdir: str, compact_at: int | None,
        num_partitions: int = 32, mode: str = "exact") -> list[dict]:
    idx = _index_cls(mode).create(
        f"{workdir}/idx", num_partitions=num_partitions
    )
    out = []
    for e in range(epochs):
        t0 = time.perf_counter()
        surv = idx.ingest_epoch(gen_epoch(n, e), e)
        n_surv = surv.count()
        dt = time.perf_counter() - t0
        want = expected_survivors(n, e)
        ok = n_surv == want
        out.append(
            {"epoch": e, "survivors": n_surv, "expected": want,
             "ok": ok, "wall_s": round(dt, 2),
             "docs_per_s": int(n / dt)}
        )
        print(out[-1], flush=True)
        assert ok, f"epoch {e}: {n_surv} != {want}"
        if compact_at is not None and e == compact_at:
            t0 = time.perf_counter()
            for p in range(num_partitions):
                idx.compact(p)
            print({"compact_all_s": round(time.perf_counter() - t0, 2)},
                  flush=True)
    return out


def parity_anchor(n: int, epochs: int, workdir: str,
                  mode: str = "exact") -> None:
    """1/100-scale run vs the pandas keep-first oracle, id-for-id
    (valid for BOTH modes on this corpus: see the module docstring's
    collision argument)."""
    idx = _index_cls(mode).create(
        f"{workdir}/anchor_idx", num_partitions=8
    )
    got = []
    frames = []
    for e in range(epochs):
        df = gen_epoch(n, e).to_pandas()
        frames.append(df.assign(epoch=e))
        surv = idx.ingest_epoch(rd.from_pandas(df), e).to_pandas()
        if len(surv):
            got.extend(int(i) for i in surv["doc_id"])
    allf = pd.concat(frames, ignore_index=True)
    want = (
        allf.sort_values(["epoch", "doc_id"])
        .drop_duplicates("text")["doc_id"]
        .astype(int)
        .tolist()
    )
    assert sorted(got) == sorted(want), (
        f"parity anchor mismatch: {len(got)} vs {len(want)}"
    )
    print(f"parity anchor: {len(want)} survivors, exact id match",
          flush=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    mode = sys.argv[4] if len(sys.argv) > 4 else "exact"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    work = tempfile.mkdtemp(prefix="dedupindex_soak_")
    try:
        parity_anchor(max(n // 100, 500), epochs, work, mode=mode)
        rows = run(n, epochs, work, compact_at=epochs // 2 - 1,
                   mode=mode)
        total = sum(r["wall_s"] for r in rows)
        first, last = rows[0]["wall_s"], rows[-1]["wall_s"]
        print(
            {
                "mode": mode,
                "n_per_epoch": n, "epochs": epochs, "cpus": cpus,
                "total_wall_s": round(total, 2),
                "docs_per_s_overall": int(n * epochs / total),
                "epoch0_s": first, "last_epoch_s": last,
                "last_over_first": round(last / first, 2),
            },
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    main()
