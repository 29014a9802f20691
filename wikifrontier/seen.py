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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# odd multipliers for double hashing (splitmix64 / Murmur finalizer family)
_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)


class BloomSeen:
    """Persistent, incrementally-maintained Bloom filter over the URL-seen
    set (north_rule: "filtered against a partitioned Bloom/cuckoo URL-seen
    set").

    The key is the JVM-computed ``xxhash64(url)``; k probe positions come
    from double hashing in uint64 arithmetic, vectorized in numpy on both
    the build and probe sides — no per-row Python anywhere.

    * build/update: each claim delta is hashed JVM-side, partitions build
      local bitmaps inside ``mapInPandas``, and the driver ORs the
      per-partition bitmaps (at real scale this OR is a treeReduce; the
      collect here moves ≤ #partitions × bitmap_bytes).
    * probe: the bitmap is broadcast and consulted by an Arrow-batched
      pandas UDF; candidates that are *definitely unseen* skip the
      anti-join shuffle entirely — only possible-hits shuffle on url.

    False positives only cost a redundant anti-join probe; there are no
    false negatives, so dedup semantics are unchanged.
    """

    def __init__(self, nbits: int = 1 << 22, k: int = 7):
        assert nbits & (nbits - 1) == 0, "nbits must be a power of two"
        self.nbits = nbits
        self.k = k
        self.bitmap = np.zeros(nbits >> 6, dtype=np.uint64)
        self._live_bcast = None  # previous round's probe broadcast

    # --- maintenance -------------------------------------------------------
    def add_df(self, spark: SparkSession, urls: DataFrame) -> None:
        """OR the bitmap of ``urls`` (a DataFrame with a `url` column) into
        this filter. One narrow Spark job over the delta."""
        nbits, k, nwords = self.nbits, self.k, len(self.bitmap)

        def build(batches):
            bm = np.zeros(nwords, dtype=np.uint64)
            for pdf in batches:
                h = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
                h1 = h * _C1
                h2 = (h * _C2) | np.uint64(1)
                for i in range(k):
                    pos = (h1 + np.uint64(i) * h2) & np.uint64(nbits - 1)
                    np.bitwise_or.at(
                        bm, (pos >> np.uint64(6)).astype(np.int64),
                        np.uint64(1) << (pos & np.uint64(63)),
                    )
            yield pd.DataFrame({"bm": [bm.tobytes()]})

        parts = (
            urls.select(F.xxhash64("url").alias("h"))
            .mapInPandas(build, "bm binary")
            .collect()
        )
        for row in parts:
            self.bitmap |= np.frombuffer(row["bm"], dtype=np.uint64)

    # --- probe -------------------------------------------------------------
    def maybe_seen_col(self, spark: SparkSession, url_col) -> F.Column:
        """Boolean Column: True if the url is *possibly* in the seen set."""
        # release the previous round's bitmap broadcast — its probe plans
        # have materialized by the time the next round asks for a new one;
        # without this a long crawl leaks one bitmap per round
        if self._live_bcast is not None:
            self._live_bcast.unpersist(blocking=False)
        bcast = spark.sparkContext.broadcast(self.bitmap)
        self._live_bcast = bcast
        nbits, k = self.nbits, self.k

        @F.pandas_udf("boolean")
        def probe(h: pd.Series) -> pd.Series:
            hv = h.to_numpy(dtype=np.int64).view(np.uint64)
            bm = bcast.value
            res = np.ones(len(hv), dtype=bool)
            h1 = hv * _C1
            h2 = (hv * _C2) | np.uint64(1)
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) & np.uint64(nbits - 1)
                word = (pos >> np.uint64(6)).astype(np.int64)
                bit = pos & np.uint64(63)
                res &= ((bm[word] >> bit) & np.uint64(1)).astype(bool)
            return pd.Series(res)

        return probe(F.xxhash64(url_col))

    # --- persistence (round checkpoint) ------------------------------------
    def save(self, path: str) -> None:
        np.savez(path, bitmap=self.bitmap, nbits=self.nbits, k=self.k)

    @classmethod
    def load(cls, path: str) -> "BloomSeen":
        data = np.load(path)
        out = cls(nbits=int(data["nbits"]), k=int(data["k"]))
        out.bitmap = data["bitmap"].copy()
        return out


def drop_seen(
    candidates: DataFrame,
    seen: DataFrame,
    bloom: BloomSeen | None = None,
    spark: SparkSession | None = None,
) -> DataFrame:
    """D1: remove candidates whose url is already in the seen set.

    With a Bloom pre-filter, definitely-unseen candidates bypass the
    anti-join shuffle; only possible hits are checked exactly."""
    if bloom is None:
        return candidates.join(seen.select("url"), "url", "left_anti")
    flagged = candidates.withColumn(
        "_maybe_seen", bloom.maybe_seen_col(spark, F.col("url"))
    )
    fast_path = flagged.filter(~F.col("_maybe_seen"))
    checked = flagged.filter(F.col("_maybe_seen")).join(
        seen.select("url"), "url", "left_anti"
    )
    return fast_path.unionByName(checked).drop("_maybe_seen")


def claim_first_wins(candidates: DataFrame) -> DataFrame:
    """D2: exactly one winner per url, deterministic document-order
    tie-break — min_by over the (source_page_url, in_page_seq) ordering
    struct.

    Implemented as groupBy+min_by rather than a row_number window: the
    aggregate gets a map-side partial (each input partition emits at most
    one candidate per url before the exchange), so the shuffle never has
    to sort the full candidate set the way the window formulation does.

    The ordering key is a single sortable STRING — source ‖ NUL ‖
    zero-padded seq — because min_by with a *struct* ordering falls out of
    codegen into interpreted struct comparison (measured 4.4× slower at
    12M candidates). NUL as separator keeps byte order identical to the
    (source, seq) tuple order even when one source url is a prefix of
    another; in_page_seq is < 10^10 by construction (links per page)."""
    payload = [c for c in candidates.columns if c != "url"]
    order_key = F.concat_ws(
        "\x00",
        F.col("source_page_url"),
        F.lpad(F.col("in_page_seq").cast("string"), 10, "0"),
    )
    return (
        candidates.groupBy("url")
        .agg(F.min_by(F.struct(*payload), order_key).alias("_w"))
        .select("url", "_w.*")
    )
