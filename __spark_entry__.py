"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`etl_spark_eks_spark`: the engine's query registry
(one entry per SURVEY.md §2 operator) provides ``queries()`` and
``oracle_sql()``; ``entry()`` runs the flagship pricing-summary query
(TPC-H-Q1 shape — the reference job's scan->transform->aggregate path,
reference workflow-examples/pyspark-taxi-trip.py:37-51) at sf0.001.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from etl_spark_eks_spark import registry  # noqa: E402
from etl_spark_eks_spark.session import apply_engine_conf  # noqa: E402

registry.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_engine_conf(spark)
    return registry.QUERIES["q_b17_pricing_summary"](spark, SMOKE_SF_DIR)


# The round driver caps each CORRECTNESS run at the FIRST 50 keys of the
# dict this module returns, in order — registry insertion order is
# therefore a measurement decision, not cosmetics. Rounds 1-7 hand-curated
# a _PRIORITY tuple here; per the round-7 verdict (task 5) the ordering is
# now COMPUTED, staleness-strict, from the official evidence itself:
#   (1) keys with NO official driver row in any CORRECTNESS_r*.json lead
#       (registry order within the group — for round 8 that is the 36
#       round-7 additions q_b154-q_b175, q_c110-q_c123, q_m17-q_m18);
#   (2) the rest follow sorted by last-official-round ASCENDING (oldest
#       evidence first; registry order breaks ties), so the stale backlog
#       (b38/b39/b40/b58/b59 from r1, then the r2 cohort) drains
#       automatically at (50 - new_keys) per round and max staleness is
#       monotonically non-increasing from r8 on.
# No hand edit is needed in future rounds: each new CORRECTNESS_r{N}.json
# the driver writes feeds the next round's ordering. Every key remains
# present and runnable regardless of order; tools/verify_driver.py checks
# all of them.


def _last_official_round() -> dict[str, int]:
    """Map query key -> latest round with an official driver row."""
    import json

    last: dict[str, int] = {}
    for path in sorted(Path(_REPO).glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(path.stem.split("_r")[-1])
            rows = json.loads(path.read_text())
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        if isinstance(rows, dict):
            for key in rows:
                last[key] = max(rnd, last.get(key, 0))
    return last


def _priority(keys: list[str]) -> list[str]:
    """Staleness-strict official-evidence rotation (see note above)."""
    last = _last_official_round()
    order = {k: i for i, k in enumerate(keys)}
    return sorted(keys, key=lambda k: (last.get(k, -1), order[k]))


def _ordered(mapping: dict) -> dict:
    out = {k: mapping[k] for k in _priority(list(mapping))}
    out.update((k, v) for k, v in mapping.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted => rows-only)."""
    return _ordered(dict(registry.ORACLES))
