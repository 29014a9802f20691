"""Arrow-batched pandas UDFs wrapping extract.py.

The reference's per-message Python callbacks (message_handler.py files)
become exactly one vectorized UDF here — the fused content+link parse
(SURVEY.md §2.8). Everything else in the engine is native Spark SQL
expressions (sha2, parse_url, CASE, joins, windows) that stay inside
whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from wikifrontier import extract
from wikifrontier.schemas import PARSED_DDL

_cached_udf = None
_cached_ctx = None  # the SparkContext the cached udf was built on


def _parse_batches(url: pd.Series, html: pd.Series, depth: pd.Series) -> pd.DataFrame:
    out = {
        "title": [],
        "categories": [],
        "text_content": [],
        "text_content_hash": [],
        "links": [],
    }
    for u, h, d in zip(url, html, depth):
        html_str = (bytes(h) if h is not None else b"").decode("utf-8", errors="replace")
        parsed = extract.parse_page(u, html_str, int(d))
        out["title"].append(parsed["title"])
        out["categories"].append(parsed["categories"])
        out["text_content"].append(parsed["text_content"])
        out["text_content_hash"].append(parsed["text_content_hash"])
        out["links"].append(parsed["links"])
    return pd.DataFrame(out)


def parse_page_udf(url, html, depth):
    """Fused X1–X7: (url, html:binary, depth) → parsed struct column.

    One Python→JVM Arrow round-trip per batch; no per-row Python on the
    Spark side. Reference behavior: wiki_content_extractor.py:30-75 +
    wiki_link_extractor.py:28-107.

    The pandas_udf object is built lazily (its return-type DDL parse needs
    an active SparkSession) and cached for plan reuse. The cache is keyed
    on the active SparkContext's identity — same discipline as the
    session-object memo in queries.py — because the udf object holds py4j
    refs into one JVM: reusing it across a gateway restart (bench tears
    the JVM down between the crawl legs and the query sweep) raises
    ConnectionRefusedError mid-plan.
    """
    global _cached_udf, _cached_ctx
    from pyspark import SparkContext

    ctx = SparkContext._active_spark_context
    if _cached_udf is None or _cached_ctx is not ctx:
        _cached_udf = F.pandas_udf(_parse_batches, PARSED_DDL)
        _cached_ctx = ctx
    return _cached_udf(url, html, depth)
