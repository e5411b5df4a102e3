"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in data_sync_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline on sf0.001: the full CDC replay engine —
    bootstrap + multi-epoch LWW upsert replay with schema evolution —
    returning the final lake state."""
    from data_sync_ray.pipelines.queries import cdc_replay_lake

    return cdc_replay_lake("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from data_sync_ray.pipelines.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from data_sync_ray.pipelines.queries import build_oracle_sql

    return build_oracle_sql()
