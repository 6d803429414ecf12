"""Order-insensitive result comparison mirroring the driver's t2 check:
row count + column-name schema + value equality after sorting columns by
name and rows by stringified values.

Strictness: values must match EXACTLY after normalization (floats via
repr, timestamps via isoformat) — the driver hashes values, so a 1-ulp
float difference is a failure there and must be a failure here. Queries
are responsible for rounding nondeterministic float aggregates.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import pandas as pd


def _norm_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        # 17 significant digits: exact double round-trip
        return repr(v)
    if isinstance(v, (pd.Timestamp, datetime)):
        if pd.isna(v):
            return "<null>"
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    if v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
        return "<null>"
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return str(v)
    return str(v)


def normalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    rows.sort()
    return rows


def assert_driver_canonicalizable(df: pd.DataFrame, name: str, side: str):
    """The round driver canonicalizes with pandas ``sort_values`` over
    RAW cells, which raises ``TypeError: unhashable type`` on list/dict
    columns — a shape this repo's stringify-first comparator would
    otherwise tolerate (the exact gap that shipped q_c42/q_c43 broken
    in round 3). Fail locally on any shape the driver can't hash.

    sort_values alone is NOT a sufficient gate: a SINGLE list-valued
    column sorts fine in pandas (lexicographic list compare never needs
    a hash), yet the driver's canonicalizer still chokes downstream —
    so first reject any container-typed cell explicitly."""
    import numpy as np

    for col in df.columns:
        # scan the column's non-null cells for container types the
        # driver can't canonicalize; sample-free because fixture-scale
        # results are small and a single bad cell is disqualifying
        for v in df[col]:
            if isinstance(v, (list, tuple, set, dict, np.ndarray)):
                raise AssertionError(
                    f"{name}: {side} result column {col!r} holds a "
                    f"{type(v).__name__} cell — not driver-"
                    "canonicalizable; emit scalar columns (posexplode "
                    "rows or array_join strings), not arrays/maps"
                )
    try:
        cols = sorted(df.columns)
        df[cols].sort_values(by=cols)
    except TypeError as e:
        raise AssertionError(
            f"{name}: {side} result not driver-canonicalizable "
            f"(pandas sort_values: {e}) — emit scalar columns "
            "(posexplode rows or array_join strings), not arrays/maps"
        ) from None


def assert_results_equal(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert_driver_canonicalizable(spark_pdf, name, "spark")
    assert_driver_canonicalizable(oracle_pdf, name, "oracle")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    assert s_cols == o_cols, f"{name}: schema mismatch spark={s_cols} oracle={o_cols}"
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count mismatch spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows, o_rows = normalize(spark_pdf), normalize(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch ({len(diffs)}+ differing sorted rows); "
            f"first diffs (spark vs oracle): {diffs}; columns={s_cols}"
        )
