"""Structured Streaming telemetry path: file source → watermark →
tumbling-window agg → memory sink, drained with availableNow."""

from __future__ import annotations

from datetime import datetime, timedelta

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
