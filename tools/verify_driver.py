"""Driver simulation: exercises __spark_entry__.py exactly like the
round driver — a plain SparkSession (no engine conf), entry() smoke at
sf0.001, then every queries()[k] vs oracle_sql()[k] on DuckDB at sf0.01
with an order-insensitive value comparison.

Usage: python tools/verify_driver.py [--sf-dir /root/testdata/sf0.01] [--only k1,k2]
"""

from __future__ import annotations

import argparse
import importlib.util
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tests"))
from compare import assert_results_equal  # noqa: E402


def driver_canon_check(pdf, name: str, side: str) -> None:
    """Replicate the round driver's canonicalizer: pandas
    ``sort_values`` over the RAW (un-normalized) columns. This is
    STRICTER than tests/compare.py, which stringifies cells before
    sorting and therefore tolerates list/dict cells the driver cannot
    hash (`TypeError: unhashable type: 'list'` — exactly how
    q_c42/q_c43 shipped green locally and ERR'd officially in r3).
    Any oracle-bearing query whose output the driver can't sort must
    fail HERE first."""
    try:
        cols = sorted(pdf.columns)
        pdf[cols].sort_values(by=cols)
    except TypeError as e:
        raise AssertionError(
            f"{name}: {side} result is not driver-canonicalizable "
            f"(pandas sort_values failed: {e}) — reshape array/map "
            "columns to scalar rows (posexplode) or joined strings "
            "(array_join)"
        ) from None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument(
        "--master",
        default="local[8]",
        help="hostile-config runs: e.g. local[3]",
    )
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        metavar="K=V",
        help="extra session conf, repeatable (e.g. "
        "--conf spark.sql.adaptive.enabled=false) — used by the "
        "SCALE.md invariance runs",
    )
    args = ap.parse_args()

    # Import __spark_entry__ the way the driver does: by file path.
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # Driver-like session: defaults, NOT our engine factory.
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master(args.master)
        .appName("verify-driver")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for pair in args.conf:
        k, _, v = pair.partition("=")
        builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()

    print("== entry() smoke ==")
    t0 = time.time()
    edf = mod.entry(spark)
    rows = edf.collect()
    print(f"entry(): {len(rows)} rows, schema={[f.name for f in edf.schema.fields]}, "
          f"{time.time()-t0:.1f}s")
    assert len(rows) > 0, "entry() returned 0 rows"

    qs = mod.queries()
    oracles = mod.oracle_sql()
    only = {k for k in args.only.split(",") if k}

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    print(f"== {len(qs)} queries at {args.sf_dir} "
          f"({len(oracles)} with oracle) ==")
    n_pass = n_fail = 0
    failures: list[str] = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir)
            spdf = sdf.toPandas()
            if name in oracles:
                opdf = con.execute(oracles[name]).fetchdf()
                driver_canon_check(spdf, name, "spark")
                driver_canon_check(opdf, name, "oracle")
                assert_results_equal(spdf, opdf, name)
                status = f"OK    ({len(spdf)} rows match oracle)"
            else:
                assert len(spdf.columns) > 0
                status = f"OK-rows ({len(spdf)} rows, no oracle)"
            n_pass += 1
        except Exception as e:
            status = f"FAIL  {type(e).__name__}: {str(e)[:300]}"
            failures.append(name)
            n_fail += 1
        print(f"  {name:32s} {status}  [{time.time()-t0:.1f}s]")

    print(f"== {n_pass} pass, {n_fail} fail ==")
    if failures:
        print("failed:", ", ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
