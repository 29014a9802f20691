"""Structured Streaming telemetry path: file source → watermark →
tumbling-window agg → memory sink, drained with availableNow."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from wikifrontier import streaming


def _write_events(spark, path, start, n, host, status="SUCCESS"):
    rows = [
        (f"https://{host}/p{i}", host, status, start + timedelta(seconds=20 * i))
        for i in range(n)
    ]
    spark.createDataFrame(rows, streaming.EVENT_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_windowed_host_throughput(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    t0 = datetime(2025, 8, 15, 12, 0, 0)
    # two hosts; h1 spans two 1-minute windows (3 events / 20s apart)
    _write_events(spark, events_dir, t0, 6, "h1.example.org")
    _write_events(spark, events_dir, t0, 3, "h2.example.org", status="FAILED")

    stream = streaming.read_event_stream(spark, events_dir)
    agg = streaming.windowed_host_throughput(stream, window="1 minute")
    streaming.run_available_now(agg, "host_tp", ckpt)

    rows = {
        (r["host"], r["window_start"].minute): (r["n_fetched"], r["n_success"])
        for r in spark.sql("select * from host_tp").collect()
    }
    assert rows[("h1.example.org", 0)] == (3, 3)   # :00, :20, :40
    assert rows[("h1.example.org", 1)] == (3, 3)   # 1:00, 1:20, 1:40
    assert rows[("h2.example.org", 0)] == (3, 0)   # FAILED events count 0 success


def test_stateful_host_rate_across_restarts(spark, tmp_path):
    """applyInPandasWithState: per-host cumulative counters survive a
    stream restart through the checkpoint (GroupState), and the rate
    flag fires for a host fetching faster than the politeness budget."""
    events_dir = str(tmp_path / "ev2")
    # version-suffixed location: a HOST_RATE_STATE_DDL format bump changes
    # the dir instead of feeding an old-format checkpoint to the operator
    ckpt = streaming.host_rate_checkpoint_dir(str(tmp_path / "ckpt2"))
    assert ckpt.endswith(f"host_rate_v{streaming.HOST_RATE_STATE_VERSION}")
    t0 = datetime(2025, 8, 15, 12, 0, 0)

    # h1: 4 fetches 20s apart (0.05/s, polite); h3: 5 fetches in the same
    # second via 0-gap timestamps? use 6 events 0.1s apart -> 10/s
    _write_events(spark, events_dir, t0, 4, "h1.example.org")
    rows = [
        (f"https://h3.example.org/p{i}", "h3.example.org", "SUCCESS",
         t0 + timedelta(milliseconds=100 * i))
        for i in range(6)
    ]
    spark.createDataFrame(rows, streaming.EVENT_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(events_dir)

    out = streaming.stateful_host_rate(
        streaming.read_event_stream(spark, events_dir), rate_limit_per_sec=1.0
    )
    first = {r["host"]: r for r in streaming.run_available_now_collect(out, ckpt)}
    assert first["h1.example.org"]["n_total"] == 4
    assert first["h1.example.org"]["over_limit"] is False
    assert first["h3.example.org"]["n_total"] == 6
    assert first["h3.example.org"]["over_limit"] is True

    # land more h1 events, restart from the same checkpoint: cumulative
    # count proves the GroupState survived the restart
    _write_events(spark, events_dir, t0 + timedelta(minutes=5), 3, "h1.example.org")
    out2 = streaming.stateful_host_rate(
        streaming.read_event_stream(spark, events_dir), rate_limit_per_sec=1.0
    )
    second = {r["host"]: r for r in streaming.run_available_now_collect(out2, ckpt)}
    assert second["h1.example.org"]["n_total"] == 7
    assert second["h1.example.org"]["batch_n"] == 3


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """F.session_window stream (drained with availableNow) must agree
    with the batch gaps-and-islands replay (sessionize_events) on
    session membership and per-session aggregates for the same gap."""
    events_dir = str(tmp_path / "sess_ev")
    ckpt = str(tmp_path / "sess_ckpt")
    t0 = datetime(2025, 8, 15, 12, 0, 0)
    gap = 600  # 10 min
    rows = [
        # user 1: two events 30 s apart, then one 2 h later
        (1, 0, t0, 1.5),
        (1, 1, t0 + timedelta(seconds=30), 2.25),
        (1, 2, t0 + timedelta(hours=2), 3.0),
        # user 2: one lone event
        (2, 3, t0 + timedelta(seconds=5), 0.1),
    ]
    ddl = "user_id long, event_id long, ts timestamp, value double"
    spark.createDataFrame(rows, ddl).coalesce(1).write.parquet(events_dir)
    # session windows emit in APPEND mode only once the watermark passes
    # their end — a later sentinel batch (user 99, +3 days) pushes it
    sentinel = [(99, 999, t0 + timedelta(days=3), 0.0)]
    spark.createDataFrame(sentinel, ddl).coalesce(1).write.mode(
        "append"
    ).parquet(events_dir)

    stream = (
        spark.readStream.schema(ddl)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    out = streaming.run_available_now_collect(
        streaming.streaming_sessionize(stream, gap_sec=gap, watermark="1 second"),
        ckpt,
        output_mode="append",
    )
    got = sorted(
        (r["user_id"], r["n_events"], r["first_event"], r["last_event"],
         r["total_value"])
        for r in out
        if r["user_id"] != 99
    )
    batch = streaming.sessionize_events(
        spark.createDataFrame(rows, ddl).withColumn(
            "ts", F.col("ts").cast("timestamp_ntz")
        ),
        gap_sec=gap,
    )
    want = sorted(
        (r["user_id"], r["n_events"], r["first_event"], r["last_event"],
         r["total_value"])
        for r in batch.collect()
    )
    assert got == want == [
        (1, 1, 2, 2, 3.0),
        (1, 2, 0, 1, 3.75),
        (2, 1, 3, 3, 0.1),
    ]


def test_stateful_host_ewma_matches_batch_twin(spark, tmp_path):
    """The GroupState ring-buffer EWMA must agree with the batch
    operator (politeness.host_ewma) over the same events — same window,
    same dyadic weights, same fold order — and the ring must survive a
    stream restart through the checkpoint."""
    from wikifrontier.politeness import host_ewma

    ddl = "host string, ts timestamp, seq long, latency_ms double, failed boolean"
    fdir = str(tmp_path / "fetches")
    ckpt = streaming.host_ewma_checkpoint_dir(str(tmp_path / "ckpt3"))
    assert ckpt.endswith(f"host_ewma_v{streaming.HOST_EWMA_STATE_VERSION}")
    t0 = datetime(2025, 8, 15, 12, 0, 0)
    rows = [
        ("a.com", t0 + timedelta(seconds=i), i, 10.0 + 7 * (i % 5), i % 6 == 0)
        for i in range(20)
    ] + [
        ("b.com", t0 + timedelta(seconds=i), i, 200.0, False) for i in range(5)
    ]
    df = spark.createDataFrame(rows, ddl)
    df.coalesce(1).write.mode("overwrite").parquet(fdir)

    batch = {r["host"]: r for r in host_ewma(df).collect()}
    stream = streaming.stateful_host_ewma(
        spark.readStream.schema(ddl).parquet(fdir)
    )
    got = {r["host"]: r for r in streaming.run_available_now_collect(stream, ckpt)}
    for h in ("a.com", "b.com"):
        assert got[h]["n_events"] == batch[h]["n_events"]
        assert got[h]["n_window"] == batch[h]["n_window"]
        assert abs(got[h]["ewma_latency_ms"] - batch[h]["ewma_latency_ms"]) < 1e-5
        assert abs(got[h]["ewma_fail_rate"] - batch[h]["ewma_fail_rate"]) < 1e-5
        assert got[h]["verdict"] == batch[h]["verdict"]
    assert got["b.com"]["verdict"] == "slow"

    # restart: 10 fresh fast events displace the ring's old entries; the
    # cumulative count proves state survived, the EWMA matches the batch
    # twin over the FULL event set
    rows2 = [
        ("b.com", t0 + timedelta(minutes=2, seconds=i), 100 + i, 1.0, False)
        for i in range(10)
    ]
    spark.createDataFrame(rows2, ddl).coalesce(1).write.mode("append").parquet(fdir)
    stream2 = streaming.stateful_host_ewma(
        spark.readStream.schema(ddl).parquet(fdir)
    )
    got2 = {r["host"]: r for r in streaming.run_available_now_collect(stream2, ckpt)}
    full_batch = {
        r["host"]: r
        for r in host_ewma(spark.read.parquet(fdir)).collect()
    }
    assert got2["b.com"]["n_events"] == 15
    assert abs(
        got2["b.com"]["ewma_latency_ms"] - full_batch["b.com"]["ewma_latency_ms"]
    ) < 1e-5
    assert got2["b.com"]["verdict"] == full_batch["b.com"]["verdict"] == "healthy"
