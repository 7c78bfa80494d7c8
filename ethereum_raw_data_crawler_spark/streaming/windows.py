"""Streaming windowed aggregations (SURVEY.md §2.8).

The reference computes crawl-rate metrics on a 30 s wall-clock ticker
over in-memory counters (reference: crawler_service.go:645-724
metricsWorker — blocks/s, tx/s snapshots). The streaming recast: a
watermarked tumbling-window aggregation over the pages stream — late
pages (the reference's WS-outage recovery re-scan,
scheduler_service.go:427-519) are absorbed by the watermark instead of a
fallback poller, and the result is a table, not a log line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

PAGE_EVENTS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("fetch_ts", T.TimestampType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def windowed_fetch_rates(
    spark: SparkSession,
    events_dir: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    query_name: str = "fetch_rates",
):
    """Per-(window, host) fetch counts + bytes over a stream of fetch
    events, watermarked for late arrivals. Returns the started query;
    read results from the ``query_name`` in-memory table (smoke/test) —
    production would writeStream to the metrics table instead."""
    stream = (
        spark.readStream.schema(PAGE_EVENTS)
        .option("maxFilesPerTrigger", 4)
        .json(events_dir)
    )
    agg = (
        stream.withWatermark("fetch_ts", watermark)
        .groupBy(F.window("fetch_ts", window), "host")
        .agg(
            F.count("*").alias("fetched"),
            F.sum("n_bytes").alias("bytes"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "host",
            "fetched",
            "bytes",
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def batch_fetch_rates(
    spark: SparkSession, events: DataFrame, window: str = "1 minute"
) -> DataFrame:
    """The batch twin of ``windowed_fetch_rates`` — same result schema, so
    tests can assert stream == batch for fully-arrived data."""
    return (
        events.groupBy(F.window("fetch_ts", window), "host")
        .agg(F.count("*").alias("fetched"), F.sum("n_bytes").alias("bytes"))
        .select(
            F.col("window.start").alias("win_start"), "host", "fetched", "bytes"
        )
    )
