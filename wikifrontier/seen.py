"""URL-seen deduplication (D1) and deterministic claim (D2).

Reference semantics:
* D1 batch seen-check — shared/redis/cache_service.py:53-74 (Redis pipeline
  EXISTS): here a **left-anti join** against the seen state table, hash
  partitioned on url. At 10^10-frontier scale the seen set is far too big to
  broadcast; the anti-join shuffles both sides on url, and Spark's runtime
  Bloom filter (enabled in session.py) pre-prunes candidate partitions.
* D2 atomic claim — cache_service.py:77-96 (SET NX, first claimant wins):
  here a deterministic first-wins window: row_number over
  (partition by url order by source_page_url, in_page_seq) == 1 — one
  admissible linearization of the reference's thread-racy claim order
  (SURVEY.md §3.4). Claim happens AFTER filtering (schedule_service.py:86-96)
  so filtered URLs are never marked seen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def drop_seen(candidates: DataFrame, seen: DataFrame) -> DataFrame:
    """D1: remove candidates whose url is already in the seen set."""
    return candidates.join(seen.select("url"), "url", "left_anti")


def claim_first_wins(candidates: DataFrame) -> DataFrame:
    """D2: exactly one winner per url, deterministic document-order
    tie-break. Partition key is url → the shuffle reuses the anti-join's
    hash partitioning on url (no extra exchange under AQE)."""
    w = Window.partitionBy("url").orderBy("source_page_url", "in_page_seq")
    return (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
