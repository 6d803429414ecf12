"""Engine-independent exact aggregation helpers.

``ROUND(SUM(double), 6)`` is not cross-engine deterministic: a parallel
SUM's addition ORDER differs between Spark's partial-sum tree and
DuckDB's sequential accumulation, leaving ~1 ulp (~2e-16 relative) of
noise. On a ~6e8-magnitude revenue sum the 6th decimal needs ~15
significant digits — right where that noise lives — so the two engines
can round to different 6th decimals (measured: q_b60 in
CORRECTNESS_r01 failed exactly this way, 606789540.2805 vs
606789540.280498).

Fix class, applied uniformly to every large-magnitude float SUM oracle
pair: accumulate in DECIMAL(38,6). Decimal addition is exact and
associative (integer arithmetic under the hood), so any summation order
— Spark map-side partials, AQE-coalesced reducers, DuckDB sequential —
produces the identical decimal. Casting that one exact decimal back to
double is the same nearest-double on both engines, and the driver's
repr-based value hash matches bit-for-bit.

The per-row double -> DECIMAL(38,6) cast itself is safe: fixture
monetary values carry <= 6 decimal digits, so the double is within
~1e-10 of a 6-dp value and both engines' nearest-rounding recovers the
same decimal (no representable tie at the 6th decimal for these
magnitudes).

Measured cost (sf0.1, 600k rows, 4 sums, warm JVM): decimal
accumulation is ~1.3 s slower than the double sum it replaces (~5x on
the agg operator alone; double 0.27 s vs decimal 1.5 s). decimal(18,6)
is NOT faster (1.5 s — the per-row double->decimal cast dominates, not
the add). This is the accepted price of a deterministic oracle gate on
the handful of large-magnitude-SUM queries; the per-row cast pipelines
into the scan and scales linearly like any projection.

AVG stays as ROUND(AVG(double), 6): averages here are small-magnitude
(<= 1e5), where 1-ulp noise is ~1e-11 — far below the 6-dp rounding —
and Spark/DuckDB type AVG-of-decimal differently, so decimal would
*create* a schema mismatch rather than remove one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str) -> Column:
    """Exact SUM of a double expression via DECIMAL(38,6) accumulation,
    returned as double. Pair with :func:`dsum_sql` on the oracle side."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.sum(c.cast("decimal(38,6)")).cast("double")


def dsum_sql(expr: str) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"
