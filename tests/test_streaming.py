"""Streaming invariants (SURVEY §5.2 #4): stream results vs the batch
computation on the same input."""

from __future__ import annotations

from etl_spark_eks_spark import registry

registry.load_all()


def test_watermark_stream_subset_of_batch(spark, sf_dir):
    """B48 append-mode result must be a subset of the batch tumbling agg
    (open windows withheld at end of input), and every emitted window
    must match the batch value exactly."""
    stream = registry.QUERIES["q_b48_watermark_stream"](spark, sf_dir).collect()
    batch = {
        r["win_start"]: (r["n_events"], r["total_value"])
        for r in registry.QUERIES["q_b45_tumbling"](spark, sf_dir).collect()
    }
    assert 0 < len(stream) <= len(batch)
    for r in stream:
        assert batch[r["win_start"]] == (r["n_events"], r["total_value"])


def test_stream_dedup_restores_cardinality(spark, sf_dir):
    """B49: doubling every event then deduping within the watermark must
    restore the original event_id cardinality exactly."""
    deduped = registry.QUERIES["q_b49_stream_dedup"](spark, sf_dir)
    from etl_spark_eks_spark.catalog import load_table

    n_events = load_table(spark, sf_dir, "events").count()
    assert deduped.count() == n_events
    assert deduped.select("event_id").distinct().count() == n_events


def test_exactly_once_rerun_stable(spark, sf_dir):
    """B50: a third run over the same checkpoint must also add nothing."""
    first = registry.QUERIES["q_b50_exactly_once_rerun"](spark, sf_dir).count()
    again = registry.QUERIES["q_b50_exactly_once_rerun"](spark, sf_dir).count()
    assert first == again
