"""BloomSeen: no false negatives, useful selectivity, persistence, and
pre-filtered drop_seen equivalence with the plain anti-join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikifrontier.seen import BloomSeen, drop_seen


@pytest.fixture(scope="module")
def urls(spark):
    return spark.range(2000).select(
        F.concat(F.lit("https://en.wikipedia.org/wiki/U"), F.col("id")).alias("url")
    )


def test_no_false_negatives_and_low_fp(spark, urls):
    bloom = BloomSeen(nbits=1 << 18, k=7)
    seen = urls.filter(F.col("url").substr(-1, 1).isin("0", "2", "4", "6", "8"))
    bloom.add_df(spark, seen)

    flagged = urls.withColumn("m", bloom.maybe_seen_col(spark, F.col("url")))
    # every seen url must flag as maybe-seen
    misses = flagged.join(seen, "url").filter(~F.col("m")).count()
    assert misses == 0
    # unseen urls mostly pass the fast path (fp rate well under 5% here)
    unseen_total = flagged.join(seen, "url", "left_anti")
    fp = unseen_total.filter(F.col("m")).count()
    assert fp / unseen_total.count() < 0.05


def test_drop_seen_with_bloom_equivalent(spark, urls):
    bloom = BloomSeen(nbits=1 << 18, k=7)
    seen = urls.filter(F.xxhash64("url") % 3 == 0).select("url")
    bloom.add_df(spark, seen)
    cands = urls.withColumn("depth", F.lit(1))

    plain = {r["url"] for r in drop_seen(cands, seen).collect()}
    pre = {r["url"] for r in drop_seen(cands, seen, bloom, spark).collect()}
    assert plain == pre


def test_incremental_and_persistence(spark, urls, tmp_path):
    bloom = BloomSeen(nbits=1 << 16, k=5)
    first = urls.limit(100)
    bloom.add_df(spark, first)
    bloom.add_df(spark, urls.limit(300))  # superset — idempotent OR

    path = str(tmp_path / "bloom.npz")
    bloom.save(path)
    loaded = BloomSeen.load(path)
    assert (loaded.bitmap == bloom.bitmap).all()
    assert loaded.nbits == bloom.nbits and loaded.k == bloom.k
