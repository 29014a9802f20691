"""Sitemap ingestion: XML sitemap parsing + seed-candidate derivation.

The reference discovers URLs exclusively by following links from the seed
(components/dispatcher feeds one seed; every other URL arrives via parsed
outlinks). Real crawls ALSO ingest the sitemaps hosts publish — the
sitemaps.org protocol's `<urlset><url><loc>…</loc><lastmod>…</lastmod>`
documents — which surface pages no inbound link reaches and carry the
host's own change-frequency hints. These operators are that second
discovery channel, batch-shaped:

- ``sitemap_entries`` — explode each sitemap document into (loc, lastmod)
  rows with plain regexp extraction. Deliberately regex, not an XML
  library: sitemap files in the wild are frequently malformed enough to
  kill strict parsers, the two fields sit in a rigid container format,
  and Java-regex ∩ RE2 patterns keep the operation replayable by the
  DuckDB oracle (same rationale as textops.pii_features). Everything is
  codegen'd column expressions — no UDF, no shuffle: parsing is a pure
  map over however many partitions hold the sitemap blobs.
- ``seed_candidates`` — anti-join the extracted locs against the url-seen
  relation and return the unseen ones, newest ``lastmod`` first — the
  rows a scheduler feeds into the next round's frontier alongside
  link-discovered candidates. One keyed shuffle per side (the anti-join);
  the ordering is per-partition at scale (callers pop via the existing
  top-k machinery, politeness.pop_batch, never a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lazy quantifiers only — valid in both Java regex (Spark) and RE2 (DuckDB)
_URL_BLOCK = "<url>(.*?)</url>"
_LOC = "<loc>(.*?)</loc>"
_LASTMOD = "<lastmod>(.*?)</lastmod>"


def sitemap_entries(
    sitemaps: DataFrame,
    xml_col: str = "xml",
    id_col: str = "sitemap_id",
) -> DataFrame:
    """Explode sitemap XML blobs into ``(sitemap_id, loc, lastmod)`` rows.

    ``lastmod`` is NULL when the entry omits it (it is optional in the
    protocol). Entries without a ``<loc>`` are dropped — a loc-less
    ``<url>`` block carries no crawlable fact.
    """
    entries = sitemaps.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK), 1)
        ).alias("entry"),
    )
    loc = F.regexp_extract("entry", _LOC, 1)
    lastmod = F.regexp_extract("entry", _LASTMOD, 1)
    return entries.select(
        id_col,
        loc.alias("loc"),
        F.when(lastmod != "", lastmod).alias("lastmod"),
    ).where(F.col("loc") != "")


def seed_candidates(
    entries: DataFrame,
    seen: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Unseen sitemap locs, newest-lastmod-first: the sitemap-sourced
    frontier feed. ``seen`` is any relation with a ``url`` column (the
    crawl's pages table / seen shards). NULL lastmod sorts last (no
    recency hint = lowest priority), ties break on loc for determinism.
    """
    unseen = entries.join(
        seen.select(F.col(url_col).alias("loc")).distinct(),
        "loc",
        "left_anti",
    )
    return unseen.select("sitemap_id", "loc", "lastmod").orderBy(
        F.col("lastmod").desc_nulls_last(), "loc"
    )
