"""SparkSession factory.

The reference tunes its physical layer purely via SparkConf on a
Spark 3.2.1 image (reference: workflow-examples/spark-operator-taxi.yaml:17-31);
we do the same for local/cluster Spark 4.x: AQE on (join-strategy switch,
skew split, partition coalesce at runtime), Arrow on (vectorized
Python<->JVM transfer for pandas UDFs), UTC session timezone so
timestamp semantics are deterministic and oracle-comparable.

At 100 TB the only numbers that change are ``spark.sql.shuffle.partitions``
(set ~2-3x total executor cores; AQE coalesces down) and
``spark.sql.files.maxPartitionBytes`` — both exposed here as arguments so a
cluster deployment can size them without code changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configuration profile applied to every session this engine creates.
# Mirrors the *semantic* knobs of the reference's sparkConf; object-store
# tuning (s3a fadvise/readahead/committers, reference
# spark-operator-taxi.yaml:20-31) applies only on a real cluster and is
# documented in README instead of hard-coded here.
ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # InferFiltersFromGenerate synthesizes `size(arr)>0 AND isnotnull(arr)`
    # below every explode; filter pushdown then substitutes the FULL
    # generator-input expression through the projections, so an expensive
    # array (e.g. 32-seed MinHash bands over tokenized text) is evaluated
    # a second time per join side in a scan-adjacent Filter. Higher-order
    # lambdas are interpreted (no codegen CSE), so this is pure overhead:
    # measured 4x on q_c8_minhash_bands at sf0.1. The rule only ever ADDS
    # redundant filters — excluding it never changes results.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
    # Parquet: keep footer-based schema + vectorized reader defaults.
    "spark.sql.parquet.compression.codec": "snappy",
    # Deterministic float formatting across runs.
    "spark.sql.legacy.allowUntypedScalaUDF": "false",
    # Streaming micro-batch: keep state store files local & small in tests.
    "spark.sql.streaming.stateStore.compression.codec": "lz4",
}


def get_spark(
    app_name: str = "etl-spark-eks-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    max_partition_bytes: str = "128m",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with the engine profile applied.

    Defaults come from env: ``SPARK_GRAFT_CPUS`` (local parallelism) and
    ``SPARK_GRAFT_SHUFFLE_PARTITIONS``.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    # In local mode the driver JVM is the whole cluster; Spark's 1g
    # default is sized for a thin cluster driver, not 32 executor threads
    # sharing one heap. On a real cluster this maps to executor memory
    # (reference sizes 4g+4g per 1-core executor,
    # spark-operator-taxi.yaml:120-124).
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
        )

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(ENGINE_CONF)
    conf["spark.driver.memory"] = driver_mem
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    conf["spark.sql.files.maxPartitionBytes"] = max_partition_bytes
    if extra_conf:
        conf.update(extra_conf)
    # Deployment escape hatch: ';'-separated key=value pairs applied
    # LAST — after programmatic extra_conf — so a cluster (or a
    # robustness run, e.g. AQE off) can override any engine or
    # call-site default without code changes.
    extra_env = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for pair in filter(None, (p.strip() for p in extra_env.split(";"))):
        k, _, v = pair.partition("=")
        conf[k.strip()] = v.strip()
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def apply_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable subset of the engine profile to an
    externally-created session (e.g. the driver's)."""
    for k, v in ENGINE_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a running session — keep going
    return spark
