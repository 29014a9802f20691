"""Structured Streaming ingestion of crawl telemetry.

The reference's "streaming" is RabbitMQ plumbing, which the engine
deliberately replaces with batch BFS rounds (SURVEY.md §1.4). What a
deployment still wants streamed is the *telemetry*: page-event files land
per round (or from a parallel fleet) and operators watch rolling
throughput. This module is that path — `readStream` over the event-log
directory → watermarked tumbling-window aggregates → any sink.

Kept deliberately small: one source schema, one windowed aggregation,
`availableNow` processing for deterministic tests. The pattern (file
source → watermark → window → sink) is the same one a Kafka-fed
deployment would use with only the source swapped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# fetch-outcome telemetry row (a projection of frontier.py's page events)
EVENT_DDL = (
    "url string, host string, last_crawl_status string, "
    "last_crawled_at timestamp"
)


def read_event_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over the landed event files (one dir, schema
    fixed — new files picked up incrementally)."""
    return (
        spark.readStream.schema(EVENT_DDL)
        .option("maxFilesPerTrigger", 16)
        .parquet(events_dir)
    )


def windowed_host_throughput(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Per-host fetch throughput in tumbling windows.

    The watermark bounds state: late events beyond it are dropped and
    closed windows are evicted — the standard knob that keeps a perpetual
    crawl's streaming state finite."""
    return (
        events.withWatermark("last_crawled_at", watermark)
        .groupBy(
            F.window("last_crawled_at", window).alias("win"),
            F.col("host"),
        )
        .agg(
            F.count("*").alias("n_fetched"),
            F.sum(
                (F.col("last_crawl_status") == "SUCCESS").cast("long")
            ).alias("n_success"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "host",
            "n_fetched",
            "n_success",
        )
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, checkpoint_dir: str
) -> None:
    """Drain everything currently in the source into the in-memory sink
    `query_name`, then stop — deterministic batch-over-stream execution
    (tests, catch-up processing)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        # update mode, NOT complete: complete retains every window's state
        # forever and re-emits the full result each trigger, which would
        # nullify the watermark eviction windowed_host_throughput relies on
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
