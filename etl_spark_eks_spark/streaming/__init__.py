"""Structured Streaming re-expression of the reference's event-driven
trigger chain (SQS -> Argo Events -> Argo Workflows -> SparkApplication;
reference: sensor-sqs-sparkjobs.yaml:6-61).

The Spark-native equivalent collapses that whole control plane into:
``readStream`` over an arriving-files source + ``trigger(availableNow)``
+ checkpointing — at-least-once event delivery becomes exactly-once
processing because the checkpoint, not the queue, is the source of
truth for what has been processed.
"""

from etl_spark_eks_spark.streaming.stream_ops import (  # noqa: F401
    events_stream,
    run_available_now,
)

__all__ = ["events_stream", "run_available_now"]
