"""Structured Streaming surface: replay the events table with availableNow
and assert equivalence with the batch catalog queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dampr_spark import streaming
from dampr_spark.plans import all_queries


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir, tmp_path_factory):
    # The file streaming source requires a *directory* to watch.
    import shutil

    d = tmp_path_factory.mktemp("events_stream_in")
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return streaming.read_events_stream(spark, str(d))


def test_hourly_aggregate_matches_batch(spark, sf_dir, events_stream):
    stream_res = streaming.run_to_memory(
        streaming.hourly_aggregate(events_stream), "hourly_test"
    )
    batch_res = all_queries()["events_hourly"].builder(spark, sf_dir)
    s = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in stream_res.collect()
    }
    b = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in batch_res.collect()
    }
    assert s == b


def test_session_counts_matches_batch(spark, sf_dir, events_stream):
    stream_res = streaming.run_to_memory(
        streaming.session_counts(events_stream), "sessions_test"
    )
    per_user = (
        stream_res.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .collect()
    )
    s = {r.user_id: (r.n_sessions, r.n_events) for r in per_user}
    batch = all_queries()["sessionization"].builder(spark, sf_dir).collect()
    b = {r.user_id: (r.n_sessions, r.n_events) for r in batch}
    assert s == b


def test_streaming_dedup(spark, sf_dir, tmp_path_factory):
    # Land the same file twice -> every event_id duplicated across batches;
    # dedup keeps exactly one copy.
    import shutil

    d = tmp_path_factory.mktemp("stream_in")
    src = f"{sf_dir}/events.parquet"
    shutil.copy(src, d / "batch1.parquet")
    shutil.copy(src, d / "batch2.parquet")
    stream = streaming.read_events_stream(spark, str(d))
    deduped = streaming.streaming_dedup(stream, ["event_id"], watermark="10 hours")
    res = streaming.run_to_memory(
        deduped.select("event_id"), "dedup_test", mode="append"
    )
    n_unique = res.select("event_id").distinct().count()
    n_total = res.count()
    batch_n = spark.read.parquet(src).count()
    assert n_total == n_unique == batch_n


def test_running_user_totals_matches_batch(spark, sf_dir, events_stream):
    """applyInPandasWithState running totals: after replaying the whole
    table, each user's latest emitted row must equal the batch aggregate."""
    stream_res = streaming.run_to_memory(
        streaming.running_user_totals(events_stream), "running_totals_test",
        mode="update",
    ).toPandas()
    # update mode emits one row per user per micro-batch; the final state is
    # the row with the largest n_events per user.
    final = stream_res.sort_values("n_events").groupby("user_id").last()

    from dampr_spark.sources.readers import read_table

    batch = (
        read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(batch)
    joined = final.join(batch, lsuffix="_s")
    assert (joined["n_events_s"] == joined["n_events"]).all()
    assert (abs(joined["total_value_s"] - joined["total_value"]) < 0.05).all()


def test_stream_click_attribution_matches_batch(spark, sf_dir, events_stream):
    stream_res = {
        (r.purchase_id, r.click_id)
        for r in streaming.run_to_memory(
            streaming.stream_click_attribution(events_stream),
            "attribution_test",
            mode="append",
        ).collect()
    }
    batch = {
        (r.purchase_id, r.click_id)
        for r in all_queries()["range_join_attribution"].builder(spark, sf_dir).collect()
    }
    assert stream_res == batch and batch
