"""Group application owned by this engine — a stand-in for Ray's
``groupby(key).map_groups(fn)`` with pinned, schema-safe semantics.

Ray's map_groups is sort + map_batches(batch_size=None) with a wrapper
that slices the sorted block at group boundaries and yields ``fn`` per
group (ray/data/grouped_data.py:543, ``_apply_udf_to_groups``).
``per_group(fn, key)`` keeps the exact co-location guarantee (we sort on
the same key, and Ray's range partitioner never splits equal keys across
partitions — that is what makes map_groups itself correct) but applies
the UDF ourselves, under this engine's control.

What the round-4 ground-truthing of the "RefBundle with a different
schema" warnings established (probes in BASELINE.md):

- Ray's SORT manufactures zero-column blocks for empty key ranges
  (measured: 2 of 16 output blocks column-less on a 16-part exchange).
- Ray's MAP operator then forwards empty blocks AROUND every UDF
  (ray/data/_internal/planner/plan_udf_map_op.py:456 — an acknowledged
  "TODO(hchen)" workaround, added *because* all-to-all ops emit
  schema-less empties). No user-land map stage can retype them; they
  flow column-less until a guarded consumer, and the executor's warning
  is attributable to Ray internals, not to these kernels.
- A no-yield generator UDF does NOT drop a block either: the task still
  emits a zero-column block (measured).

So per_group's pinned semantics are:

- one ``fn`` call per key group, key column included, groups in sorted
  order, pandas or pyarrow batch format (same as map_groups);
- an empty input block passes through unchanged (mirroring Ray's own
  forwarding — unreachable in practice on Ray 2.49, see above);
- when EVERY group returns zero rows, the output is the kernel's own
  typed empty (map_groups parity: its block builder also kept the typed
  empties), so this stage never degrades a schema itself.

Downstream of any exchange, the engine's column-less-block guards
(CLAUDE.md invariant) remain the defense for the blocks Ray forwards.

Usage — mechanical swap, chain-preserving::

    ds.groupby("_part").map_groups(fn, batch_format="pandas")
    # becomes
    ds.sort("_part").map_batches(per_group(fn, "_part"),
                                 batch_size=None, batch_format="pyarrow")

Cost parity: one sort exchange either way; the per-group format
conversion is the same ``Table.to_pandas()`` Ray's wrapper performs.

Reference analog: none — this is Ray-runtime plumbing (the reference's
Go engine routes rows with channels and never has schema-less batches).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa


def per_group(
    fn: Callable,
    key: str | list[str],
    batch_format: str = "pandas",
):
    """Return a whole-block kernel applying ``fn`` once per ``key``
    group. Pass to ``map_batches(..., batch_size=None,
    batch_format="pyarrow")`` on a dataset ALREADY sorted by ``key``
    (equal keys must be co-located in one block — Ray's sort guarantees
    it)."""
    keys = [key] if isinstance(key, str) else list(key)

    def _to_fmt(t: pa.Table):
        return t.to_pandas() if batch_format == "pandas" else t

    def apply_block(t: pa.Table):
        if t.num_rows == 0:
            # Unreachable on Ray 2.49 (the map operator forwards empty
            # blocks around every UDF, plan_udf_map_op.py:456); if a
            # future Ray delivers one, pass it through unchanged.
            return t
        cols = [
            t.column(k).to_numpy(zero_copy_only=False) for k in keys
        ]
        if t.num_rows == 1:
            starts, ends = [0], [1]
        else:
            change = np.zeros(t.num_rows - 1, dtype=bool)
            for c in cols:
                change |= c[1:] != c[:-1]
            bnd = np.flatnonzero(change) + 1
            starts = np.concatenate(([0], bnd)).tolist()
            ends = np.concatenate((bnd, [t.num_rows])).tolist()
        outs = []
        first_empty = None
        for s, e in zip(starts, ends):
            out = fn(_to_fmt(t.slice(s, e - s)))
            if len(out):
                outs.append(out)
            elif first_empty is None:
                first_empty = out
        if not outs:
            # every group filtered out: the kernel's OWN typed empty
            return first_empty
        if len(outs) == 1:
            return outs[0]
        if isinstance(outs[0], pd.DataFrame):
            return pd.concat(outs, ignore_index=True)
        return pa.concat_tables(outs)

    # progress bars should show the kernel, not the adapter
    apply_block.__name__ = getattr(fn, "__name__", "per_group")
    return apply_block
