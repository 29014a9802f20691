"""Prometheus exposition-format export of crawl metrics (A6 surface).

The reference exposes live Prometheus counters from every microservice
(components/*/monitoring/metrics.py: crawler, scheduler, parser,
dispatcher, db_reader). A Spark batch job has no long-lived process to
scrape, so the engine's equivalent is the *textfile-collector* pattern:
render the accumulated ``crawl_metrics`` state table into the Prometheus
text exposition format and let node-exporter (or a pushgateway) pick the
file up after each round / at job end. Counter names and label shapes
mirror the reference's so existing dashboards keep working:

  reference counter (file:line)                      ← engine column
  crawl_pages_total{status}                          ← fetch_success/fetch_failed
      (components/crawler/monitoring/metrics.py:22-26)
  pages_parsed_total                                 ← pages_parsed
      (components/parser/monitoring/metrics.py:20-23)
  scheduler_links_received_total                     ← links_extracted
  scheduler_links_deduplicated_total                 ← links_dedup_dropped
  scheduler_links_filtered_total{filter_type}        ← filtered_*
  scheduler_links_scheduled_total                    ← links_claimed
      (components/scheduler/monitoring/metrics.py)
  db_reader_links_popped_total                       ← urls_popped
      (components/db_reader/monitoring/metrics.py)

Latency histograms (PAGE_CRAWL_LATENCY_SECONDS etc.) have no analogue:
per-message latency is a microservice concept; the engine's unit of work
is the round, exported as ``wikifrontier_rounds_total``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FILTER_LABELS = {
    "filtered_depth": "depth",
    "filtered_domain": "domain",
    "filtered_prefix": "prefix",
    "filtered_home_page": "home_page",
    "filtered_robots": "robots_txt",
}


def prometheus_text(metrics: DataFrame) -> str:
    """Render the metrics state table as Prometheus exposition text.

    ONE driver action (a multi-aggregate sum over the tiny per-round
    table); formatting is pure string work."""
    sums = metrics.agg(
        *[
            F.coalesce(F.sum(c), F.lit(0)).alias(c)
            for c in metrics.columns
            if c != "round"
        ],
        F.count("*").alias("_rounds"),
    ).first()

    out: list[str] = []

    def counter(name: str, help_: str, samples: list[tuple[str, int]]):
        out.append(f"# HELP {name} {help_}")
        out.append(f"# TYPE {name} counter")
        for labels, value in samples:
            out.append(f"{name}{labels} {int(value)}")

    counter(
        "crawl_pages_total",
        "Total number of pages crawled by the CrawlerService",
        [
            ('{status="SUCCESS"}', sums["fetch_success"]),
            ('{status="FAILED"}', sums["fetch_failed"]),
        ],
    )
    counter(
        "pages_parsed_total",
        "Total number of parsing tasks received",
        [("", sums["pages_parsed"])],
    )
    counter(
        "scheduler_links_received_total",
        "Total number of links received for scheduling",
        [("", sums["links_extracted"])],
    )
    counter(
        "scheduler_links_deduplicated_total",
        "Number of links skipped due to being seen",
        [("", sums["links_dedup_dropped"])],
    )
    counter(
        "scheduler_links_filtered_total",
        "Links filtered out before scheduling",
        [
            (f'{{filter_type="{label}"}}', sums[col])
            for col, label in _FILTER_LABELS.items()
        ],
    )
    counter(
        "scheduler_links_scheduled_total",
        "Number of links published to the scheduling queue",
        [("", sums["links_claimed"])],
    )
    counter(
        "db_reader_links_popped_total",
        "Total links popped from the frontier",
        [("", sums["urls_popped"])],
    )
    counter(
        "wikifrontier_rounds_total",
        "Crawl rounds completed",
        [("", sums["_rounds"])],
    )
    return "\n".join(out) + "\n"


def write_textfile(metrics: DataFrame, path: str) -> None:
    """Atomically publish the exposition text for a node-exporter
    textfile collector (write-once-safe through the fsio shim)."""
    from wikifrontier import fsio

    fsio.get_io(path).write_bytes(path, prometheus_text(metrics).encode())
