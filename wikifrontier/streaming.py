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


HOST_RATE_OUTPUT_DDL = (
    "host string, batch_n long, n_total long, last_fetch_at timestamp, "
    "over_limit boolean"
)
# STATE-FORMAT v2 (ADVICE r3 #3): v1 stored `last_fetch_epoch double`
# (float seconds); v2 stores exact integer microseconds. A checkpoint
# written by v1 is NOT resumable under this DDL — Spark rejects the state
# schema change at restore. Callers must derive the checkpoint location
# with `host_rate_checkpoint_dir()` so each state version gets its own
# directory and a version bump re-bootstraps state instead of corrupting
# or failing a v1 restore mid-crawl.
HOST_RATE_STATE_VERSION = 2
HOST_RATE_STATE_DDL = "n_total long, last_fetch_us long"


def host_rate_checkpoint_dir(base_dir: str) -> str:
    """Version-suffixed checkpoint location for stateful_host_rate.

    The state row format is part of the checkpoint contract; suffixing
    the directory with the state version keeps an old-format checkpoint
    from being fed to a new operator (restore would fail or misread)."""
    import os

    return os.path.join(base_dir, f"host_rate_v{HOST_RATE_STATE_VERSION}")


def stateful_host_rate(
    events: DataFrame,
    rate_limit_per_sec: float = 1.0,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful streaming operator (`applyInPandasWithState`): a
    per-host fetch clock maintained in GroupState across micro-batches —
    the streaming analogue of the reference's per-worker politeness rate
    limiter (@limits 1 req/s, components/crawler/core/http_fetcher.py:
    29-41). State per host = cumulative fetch count + last-fetch clock;
    each batch emits the host's cumulative totals and whether the batch's
    observed rate exceeded the politeness budget.

    The clock is integer MICROSECONDS (timestamps are μs-exact in both
    Spark and parquet), so the rate test
    ``n / span > limit  ⟺  n * 1e6 > limit * span_us`` is exact integer
    arithmetic — deterministic and replayable by an external oracle, no
    float-division ulp hazards.

    State is keyed by host (bounded by the registered-domain count, not
    the URL count) and survives restarts through the checkpoint — the
    same mechanism that makes any custom stateful operator feasible at
    perpetual-crawl lifetimes."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n_prev, last_prev_us = state.get if state.exists else (0, None)
        n_batch = 0
        t_min_us = None
        t_max_us = last_prev_us if last_prev_us is not None else None
        for pdf in pdfs:
            ts = pdf["last_crawled_at"]
            n_batch += len(pdf)
            if len(pdf):
                us = ts.astype("int64") // 1000
                mn, mx = int(us.min()), int(us.max())
                t_min_us = mn if t_min_us is None else min(t_min_us, mn)
                t_max_us = mx if t_max_us is None else max(t_max_us, mx)
        n_total = n_prev + n_batch
        state.update((n_total, int(t_max_us)))
        span_us = t_max_us - t_min_us if t_min_us is not None else 0
        # a batch of n>1 fetches inside span seconds violates the budget
        # when n/span > limit; span 0 (same-instant fetches) always does
        over = n_batch > 1 and n_batch * 1_000_000 > rate_limit_per_sec * span_us
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "batch_n": [n_batch],
                "n_total": [n_total],
                "last_fetch_at": [pd.Timestamp(int(t_max_us), unit="us")],
                "over_limit": [bool(over)],
            }
        )

    return (
        events.withWatermark("last_crawled_at", watermark)
        .groupBy("host")
        .applyInPandasWithState(
            update,
            HOST_RATE_OUTPUT_DDL,
            HOST_RATE_STATE_DDL,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def run_available_now_collect(
    stream_df: DataFrame, checkpoint_dir: str, output_mode: str = "update"
) -> list:
    """Drain the source through a `foreachBatch` collector and return the
    emitted rows. Unlike the memory sink, foreachBatch supports resuming
    from the checkpoint — the restart path stateful operators need.
    Session-window aggregations reject update mode; pass "append" (and
    make sure something pushes the watermark past the windows you want
    emitted — append only releases watermark-closed windows)."""
    rows: list = []

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        rows.extend(batch_df.collect())

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


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


# --- event sessionization (batch twin) ------------------------------------------
SESSION_GAP_SEC = 21600  # 6 h of inactivity closes a session


def sessionize_events(
    events: DataFrame, gap_sec: int = SESSION_GAP_SEC
) -> DataFrame:
    """Gaps-and-islands sessionization of the user event log → one row
    per (user, session): event count, first/last event id, duration,
    value total. A session ends after ``gap_sec`` of inactivity — the
    batch twin of a streaming session window (at ingest time the same
    cut rule runs as `F.session_window` / `applyInPandasWithState`; this
    operator is the replayable batch form the oracle can check).

    Determinism: events order by (epoch micros, event_id) inside each
    user — a total order — so session boundaries are engine-independent;
    the value total uses the q11 DECIMAL(18,2) trick (exact decimal sum,
    order-independent) and duration is a single integer-micros
    subtraction.

    Scale shape: ONE shuffle — the hashpartitioning on user_id that
    both windows and the rollup groupBy share (groupBy keys ⊇ the
    partition key, so Catalyst adds no second exchange). Per-user
    partitions are bounded by per-user event counts; a user whose
    history outgrows a task is the streaming path's problem (state
    store), not this batch replay's.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap_us = int(gap_sec) * 1_000_000
    # ts is TIMESTAMP_NTZ (naive wall clock, as DuckDB reads the same
    # parquet): micros via a pure wall-clock diff from the NTZ epoch —
    # no session-TZ/DST dependence, identical to epoch_us() in the oracle.
    # TIMESTAMP inputs become session-TZ wall clock (deterministic: the
    # engine pins the session TZ); NTZ inputs pass through unchanged.
    us = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col("ts").cast("timestamp_ntz"),
    )
    base = events.select("user_id", "event_id", us.alias("us"), "value")
    marked = base.withColumn(
        "ns",
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) > gap_us),
            1,
        ).otherwise(0),
    ).withColumn(
        "session_idx",
        F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return marked.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
        F.round((F.max("us") - F.min("us")) / F.lit(1000000.0), 6).alias(
            "duration_sec"
        ),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
    )


def streaming_sessionize(
    events: DataFrame,
    gap_sec: int = SESSION_GAP_SEC,
    watermark: str = "1 day",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """The STREAMING twin of ``sessionize_events``: `F.session_window`
    merges events within ``gap_sec`` of each other into one growing
    window per user; the watermark closes sessions (and bounds state)
    once event time passes session end + watermark — the same cut rule
    the batch operator replays, so on a fully drained bounded source
    the two agree on session membership (asserted by
    ``tests/test_streaming.py``).

    Scale shape: session-window state is per (user, open session) and
    watermark-evicted — the state store holds only live sessions, never
    history, which is what lets a perpetual telemetry stream run
    forever. Output rows mirror the batch rollup (minus the ordinal
    index, which only a total replay can assign).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{int(gap_sec)} seconds"),
            F.col(user_col),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col(user_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "first_event",
            "last_event",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# Streaming twin of politeness.host_ewma: the same recency-weighted host
# health, maintained incrementally across micro-batches. State per host
# is a bounded ring of the last EWMA_WINDOW (ts, seq, latency, fail)
# events — O(1) per host regardless of crawl lifetime, which is exactly
# why the batch operator was designed around a capped window: the batch
# fold and this GroupState ring are the SAME accumulator, so a perpetual
# crawl can hand the telemetry off to Structured Streaming without
# changing semantics. Versioned checkpoint dir per the host_rate rule.
# --------------------------------------------------------------------------
HOST_EWMA_STATE_VERSION = 1
HOST_EWMA_STATE_DDL = (
    "n_total long, tss array<long>, seqs array<long>, "
    "lats array<double>, fails array<double>"
)
HOST_EWMA_OUTPUT_DDL = (
    "host string, n_events long, n_window int, "
    "ewma_latency_ms double, ewma_fail_rate double, verdict string"
)


def host_ewma_checkpoint_dir(base_dir: str) -> str:
    import os

    return os.path.join(base_dir, f"host_ewma_v{HOST_EWMA_STATE_VERSION}")


def stateful_host_ewma(
    fetches: DataFrame,
    watermark: str = "10 minutes",
) -> DataFrame:
    """(host, ts, seq, latency_ms, failed) stream → per-batch EWMA health
    rows, numerically identical to `politeness.host_ewma` over the same
    events: weights 2^-j newest-first (exact dyadic scaling), left-fold
    summation in the same order, denom 2 − 2^-(n−1)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from wikifrontier.politeness import EWMA_FAIL_OPEN, EWMA_SLOW_MS, EWMA_WINDOW

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n_total, tss, seqs, lats, fails = state.get
            ring = list(zip(tss, seqs, lats, fails))
        else:
            n_total, ring = 0, []
        n_batch = 0
        for pdf in pdfs:
            n_batch += len(pdf)
            if len(pdf):
                us = pdf["ts"].astype("int64") // 1000
                ring.extend(
                    zip(
                        (int(v) for v in us),
                        (int(v) for v in pdf["seq"]),
                        (float(v) for v in pdf["latency_ms"]),
                        (1.0 if bool(v) else 0.0 for v in pdf["failed"]),
                    )
                )
        # newest first, ties on seq — the batch twin's recency order
        ring.sort(key=lambda r: (r[0], r[1]), reverse=True)
        ring = ring[:EWMA_WINDOW]
        n_total += n_batch
        state.update((
            n_total,
            [r[0] for r in ring],
            [r[1] for r in ring],
            [r[2] for r in ring],
            [r[3] for r in ring],
        ))
        nw = len(ring)
        denom = 2.0 - 0.5 ** (nw - 1)
        lat_acc = 0.0
        fail_acc = 0.0
        for j, (_, _, lat, fail) in enumerate(ring):  # left fold, j=0 newest
            w = 0.5 ** j
            lat_acc += lat * w
            fail_acc += fail * w
        ewma_lat = lat_acc / denom
        ewma_fail = fail_acc / denom
        verdict = (
            "failing" if ewma_fail > EWMA_FAIL_OPEN
            else "slow" if ewma_lat > EWMA_SLOW_MS
            else "healthy"
        )
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "n_events": [n_total],
                "n_window": [nw],
                "ewma_latency_ms": [ewma_lat],
                "ewma_fail_rate": [ewma_fail],
                "verdict": [verdict],
            }
        )

    return (
        fetches.withWatermark("ts", watermark)
        .groupBy("host")
        .applyInPandasWithState(
            update,
            HOST_EWMA_OUTPUT_DDL,
            HOST_EWMA_STATE_DDL,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
