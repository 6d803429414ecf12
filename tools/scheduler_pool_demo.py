"""Fair-scheduler pool demo — the in-engine analogue of the reference's
YuniKorn queue multi-tenancy (reference helm-values/yunikorn-values.yaml:89-127
defines weighted `root.test/dev/prod` queues; gang scheduling in
workflow-examples/sensor-sqs-sparkjobs.yaml:161-192).

On EKS the reference isolates tenants at the POD level (YuniKorn queues
decide which executor pods start). Inside one Spark application the same
concern — two workloads sharing a fixed executor fleet without the
FIFO head-of-line blocking of one giant job — is `spark.scheduler.mode=FAIR`
plus per-thread `spark.scheduler.pool` local properties: each pool gets a
weighted share of task slots, so an ad-hoc query makes progress while a
backfill saturates the rest. Queue weights in yunikorn-values.yaml map
1:1 onto pool weights in the allocation XML.

Run standalone (prints one JSON line) or via tests/test_scheduler.py.
A fresh SparkContext is required because scheduler mode is a static
conf — hence a subprocess, not the shared test session.
"""

from __future__ import annotations

import json
import sys
import tempfile
import threading
from pathlib import Path

ALLOCATION_XML = """<?xml version="1.0"?>
<allocations>
  <pool name="etl">
    <schedulingMode>FAIR</schedulingMode>
    <weight>3</weight>
    <minShare>1</minShare>
  </pool>
  <pool name="adhoc">
    <schedulingMode>FAIR</schedulingMode>
    <weight>1</weight>
    <minShare>1</minShare>
  </pool>
</allocations>
"""


def main() -> dict:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    alloc = Path(tempfile.mkdtemp(prefix="fairsched")) / "fairscheduler.xml"
    alloc.write_text(ALLOCATION_XML)
    spark = (
        SparkSession.builder.appName("scheduler-pool-demo")
        .master("local[4]")
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.scheduler.allocation.file", str(alloc))
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sc = spark.sparkContext
    results: dict[str, int] = {}

    def run_in_pool(pool: str, lo: int, hi: int) -> None:
        # Pool assignment is a THREAD-local property: concurrent
        # actions from different threads land in different pools.
        sc.setLocalProperty("spark.scheduler.pool", pool)
        try:
            results[pool] = (
                spark.range(lo, hi)
                .select(F.sum("id").alias("s"))
                .first()["s"]
            )
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    t1 = threading.Thread(target=run_in_pool, args=("etl", 0, 1_000_000))
    t2 = threading.Thread(target=run_in_pool, args=("adhoc", 0, 1_000))
    t1.start(), t2.start()
    t1.join(), t2.join()

    jsc = sc._jsc.sc()  # scheduler API: assert the pools exist with
    pools = {}  # the weights the allocation file declared
    for name in ("etl", "adhoc"):
        p = jsc.getPoolForName(name)
        pools[name] = (
            {"weight": p.get().weight(), "minShare": p.get().minShare()}
            if p.isDefined()
            else None
        )
    out = {
        "scheduler_mode": sc.getConf().get("spark.scheduler.mode"),
        "pools": pools,
        "sum_etl": results.get("etl"),
        "sum_adhoc": results.get("adhoc"),
    }
    spark.stop()
    return out


if __name__ == "__main__":
    out = main()
    print(json.dumps(out))
    ok = (
        out["scheduler_mode"] == "FAIR"
        and out["pools"]["etl"] == {"weight": 3, "minShare": 1}
        and out["pools"]["adhoc"] == {"weight": 1, "minShare": 1}
        and out["sum_etl"] == 499999500000
        and out["sum_adhoc"] == 499500
    )
    sys.exit(0 if ok else 1)
