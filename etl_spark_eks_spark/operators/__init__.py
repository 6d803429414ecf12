"""Operator families (SURVEY.md §2). Importing a module registers its
queries into :mod:`etl_spark_eks_spark.registry`."""

from __future__ import annotations

import importlib

_FAMILIES = (
    "tier_a",
    "filters",
    "joins",
    "aggregates",
    "windows",
    "sorts_sets",
    "scalar_funcs",
    "subqueries",
    "time_windows",
    "udfs",
    "dedup",
    "graph",
    "similarity",
    "text_analysis",
    "multimodal",
    "stream_queries",
    "pipeline",
    "sampling",
    "catalog_queries",
    "layout",
    "tpch",
)


def load_all() -> None:
    for mod in _FAMILIES:
        importlib.import_module(f"{__name__}.{mod}")
