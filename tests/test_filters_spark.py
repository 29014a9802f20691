"""Spark filter_reason (substring-op CASE) must agree with the pure-Python
urlparse-based simulator on every URL shape — including the adversarial
ones that broke the first string-op formulation ('://' inside the path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikifrontier import filters as flt
from wikifrontier.simulator import filter_reason_py

ADVERSARIAL_URLS = [
    "https://en.wikipedia.org/wiki/Page",
    "https://en.wikipedia.org/wiki/Foo://Bar",        # '://' in path
    "https://en.wikipedia.org/x://en.wikipedia.org/y",
    "https://example.com/wiki/Page",
    "https://de.wikipedia.org/wiki/X",
    "https://en.wikipedia.org/wiki/Special:Random",
    "https://en.wikipedia.org/wiki/Main_Page",
    "https://en.wikipedia.org/",
    "https://en.wikipedia.org",
    "https://",
    "mailto:someone@example.org",
    "ftp://en.wikipedia.org/wiki/Page",
    "https://en.wikipedia.org//wiki//Page",
    "https://en.wikipedia.org/w/index.php",
]

ROBOTS_RULES = [("/wiki/Blocked_", False), ("/w/", False)]


def test_spark_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(u, d) for u in ADVERSARIAL_URLS for d in (0, 3, 5)], "url string, depth int"
    )
    got = {
        (r["url"], r["depth"]): r["reason"]
        for r in df.select(
            "url",
            "depth",
            flt.filter_reason(
                F.col("url"), F.col("depth"), robots_rules=ROBOTS_RULES
            ).alias("reason"),
        ).collect()
    }
    for url in ADVERSARIAL_URLS:
        for depth in (0, 3, 5):
            want = filter_reason_py(url, depth, robots_rules=ROBOTS_RULES)
            assert got[(url, depth)] == want, (url, depth, got[(url, depth)], want)


def test_validity_gate_split(spark):
    """S1/P7 gate: reject reasons match the Pydantic HttpUrl semantics
    (scheme http/https + host required) plus the depth >= 0 invariant."""
    from wikifrontier.filters import split_valid

    rows = [
        ("https://en.wikipedia.org/wiki/A", 0, None),
        ("http://example.com/x", 3, None),
        ("not a url", 0, "invalid_scheme"),
        ("ftp://files.example.com/f", 0, "invalid_scheme"),
        ("https:///nohost", 0, "missing_host"),
        ("https://en.wikipedia.org/wiki/B", -2, "invalid_depth"),
        (None, 1, "invalid_scheme"),
    ]
    df = spark.createDataFrame(
        [(u, d) for u, d, _ in rows], "url string, depth int"
    )
    valid, invalid = split_valid(df)
    want_valid = {u for u, _, r in rows if r is None}
    assert {r["url"] for r in valid.collect()} == want_valid
    got = {r["url"]: r["reject_reason"] for r in invalid.collect()}
    assert got == {u: r for u, _, r in rows if r is not None}


def test_salted_repartition_spreads_single_host(spark):
    """North-rule skew handling: a single-registered-domain batch (the
    en.wikipedia case) must spread across many partitions, lose no rows,
    and keep salt deterministic (same url → same partition)."""
    from pyspark.sql import functions as F

    from wikifrontier.politeness import salted_repartition

    batch = spark.range(4000).select(
        F.concat(F.lit("https://en.wikipedia.org/wiki/P"), F.col("id")).alias("url"),
        F.lit(1).alias("depth"),
        F.lit(0).alias("scheduled_round"),
        F.lit("").alias("source_page_url"),
    )
    out = salted_repartition(batch, num_partitions=16)
    sizes = out.rdd.glom().map(len).collect()
    assert sum(sizes) == 4000
    assert len(sizes) == 16
    # one host, but the salt spreads it: no partition holds the batch,
    # and most partitions are non-empty
    assert max(sizes) < 4000 * 0.25
    assert sum(1 for s in sizes if s > 0) >= 12
    # deterministic: repartitioning again yields identical placement
    again = salted_repartition(batch, num_partitions=16).rdd.glom().map(len).collect()
    assert sizes == again


def test_distributed_robots_matches_driver_parser(spark):
    """The relational robots operators must agree with the driver-side
    parse_robots/robots_denied_expr on every path — same star-group
    tracking (a decoy UA group, a UA reset after the star group), same
    comment stripping, same longest-prefix/allow-first precedence,
    same default-allow."""
    from pyspark.sql import functions as F

    from wikifrontier.filters import (
        parse_robots,
        robots_denied_expr,
        robots_gate_distributed,
        robots_rules_table,
    )

    txt = (
        "User-agent: bot-x\n"
        "Disallow: /\n"
        "User-agent: *\n"
        "Disallow: /a/\n"
        "Allow: /a/ok\n"
        "Disallow: /tmp # comment\n"
        "Allow: /tmp/keep\n"
        "User-agent: other\n"
        "Disallow: /after-reset\n"
    )
    paths = [
        "/a/x", "/a/ok", "/a/ok/deeper", "/tmp/cal", "/tmp/keep/y",
        "/after-reset/z", "/free", "/",
    ]
    # driver-side verdicts
    rules_drv = parse_robots(txt)
    pdf = spark.createDataFrame([(p,) for p in paths], "path string")
    drv = {
        r["path"]: not r["denied"]
        for r in pdf.select(
            "path", robots_denied_expr(F.col("path"), rules_drv).alias("denied")
        ).collect()
    }
    # distributed verdicts
    robots = spark.createDataFrame([("h", txt)], "host string, robots_txt string")
    cands = spark.createDataFrame(
        [(f"https://h{p}", "h", p) for p in paths], "url string, host string, path string"
    )
    dist = {
        r["url"].removeprefix("https://h"): r["allowed"]
        for r in robots_gate_distributed(cands, robots_rules_table(robots)).collect()
    }
    assert {p: drv[p] for p in paths} == {p: dist[p] for p in paths}
    # spot-check the semantics themselves, not just parity
    assert drv["/a/x"] is False and drv["/a/ok/deeper"] is True
    assert drv["/tmp/cal"] is False and drv["/tmp/keep/y"] is True
    assert drv["/after-reset/z"] is True  # non-star group ignored
    assert drv["/free"] is True
