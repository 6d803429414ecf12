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


def _derived_shuffle_partitions(cpus: int) -> int:
    """Size-derived shuffle-partition default (round 13, guide §2.2).

    The default used to be a constant (= cpus). At bench scale that
    constant dominates the suite: sf0.1 is ~17 MB of parquet, so every
    exchange fanned KB-scale data out to 32 sub-MB partitions whose
    per-task scheduling latency was ~40% of total bench seconds — and
    streaming state stores (which AQE never coalesces) paid it per
    micro-batch. Derive the default from the INPUT size instead:

        partitions = clamp(input_bytes / 2 MiB, 4, 2 * parallelism)

    2 MiB of compressed input per partition is the smallest slice
    whose task outlives its scheduling overhead (compressed shuffle
    bytes are the same ballpark as compressed parquet input; AQE's own
    useful-partition floor, ``coalescePartitions.minPartitionSize``,
    is 1 MiB). The rule is scale-adaptive, not local tuning: at sf0.1
    it derives ~9, at 10x probe scale ~64+, and on any real corpus it
    saturates the cap immediately — at which point the deployment sets
    ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` (the documented knob, ~2-3x
    total executor cores, partitions sized 100 MB-1 GB per guide §2.2)
    and this default never engages. AQE coalescing stays on above it.

    Reads ``$SPARK_GRAFT_SF_DIR`` (the same contract bench.py and the
    driver use); unreadable/absent dir falls back to the legacy
    constant (= cpus) so nothing breaks off-bench.
    """
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    total = 0
    try:
        for root, _dirs, files in os.walk(sf_dir):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    except OSError:
        pass
    if total <= 0:
        return cpus
    return max(4, min(2 * cpus, -(-total // (2 << 20))))


def get_spark(
    app_name: str = "etl-spark-eks-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    max_partition_bytes: str = "128m",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with the engine profile applied.

    Defaults come from env: ``SPARK_GRAFT_CPUS`` (local parallelism) and
    ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` (explicit deployment override;
    otherwise derived from the input size — see
    :func:`_derived_shuffle_partitions`).
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
        env_p = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        shuffle_partitions = (
            int(env_p) if env_p else _derived_shuffle_partitions(cpus)
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
