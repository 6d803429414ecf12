"""etl_spark_eks_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference system ``ovaleanu/etl-spark-eks`` (an
event-driven Spark-on-EKS ETL blueprint; see SURVEY.md), built
Spark-first: DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for the event-driven path, and pandas-UDF-backed operators
only where built-ins cannot express the semantics.

Layout:
- ``session``   — SparkSession factory tuned for this engine.
- ``catalog``   — table loading / temp-view registration (star schema).
- ``registry``  — query registry powering the ``__spark_entry__`` driver
  contract (name -> (spark fn, oracle SQL)).
- ``operators`` — relational + extension operators (Tier A/B/C of
  SURVEY.md §2), each a reusable DataFrame->DataFrame function.
- ``sources``   — batch/stream source & sink helpers (parquet, JSON-in-string).
- ``functions`` — scalar/vector/text helper column functions.
- ``streaming`` — Structured Streaming re-expression of the reference's
  SQS->Argo->Spark event-driven trigger chain.
- ``plans``     — small declarative Pipeline (source -> transforms -> sink)
  mirroring the reference's job shape.
"""

__version__ = "0.1.0"
