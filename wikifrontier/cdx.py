"""Crawl-archive indexing: SURT keys, CDX capture index, snapshot diff.

A production crawl's durable output is not just the page store — it is the
capture INDEX over it. Common Crawl publishes exactly this artifact (the
CDXJ index: one record per (url, capture time) with the content digest, so
consumers can find captures and skip unchanged re-fetches). The reference
repo keeps the analogous facts spread across its Postgres tables —
`pages.url_hash` + `pages.last_crawled_at` (database/db_models/models.py,
Pages model) — but never materializes a capture-ordered index or a
revisit flag; these operators are the additive archive layer over the
same data model.

Three operators, all single-shuffle shapes that hold at 10^10 captures:

- ``surt_key`` — SURT (Sort-friendly URI Reordering Transform) canonical
  key: host labels reversed and comma-joined + ')' + lowercased path.
  Pure string expressions (split / reverse / array_join), whole-stage
  codegen, no UDF. SURT ordering clusters captures of one registrable
  domain contiguously — the property that makes a range-partitioned CDX
  index prunable by domain at scale.
- ``cdx_index`` — per-url capture history with revisit detection: one
  window over (url ORDER BY warc_ts) marks captures whose digest equals
  the previous capture's (a WARC `revisit` record — stored as a pointer,
  not a second copy, which is how archives keep re-crawl storage
  sublinear). One hash shuffle on url; within-partition sort only.
- ``snapshot_diff`` — classify every url across two crawl snapshots as
  added / removed / changed / unchanged by digest comparison: one
  full-outer equi-join on url (two keyed shuffles, AQE-coalesced). This
  is the incremental-crawl planning primitive: `changed ∪ added` is the
  next round's priority set, `unchanged` feeds revisit records.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def surt_key(url_col) -> F.Column:
    """SURT canonical sort key for a url column (or column name).

    ``https://en.wikipedia.org/wiki/Doc_1?q=1`` →
    ``org,wikipedia,en)/wiki/doc_1?q=1``. Scheme and port are dropped, the
    host's dot-separated labels are reversed (most-significant first, so
    lexicographic order groups a registrable domain's subdomains), and the
    path+query is lowercased. Pure built-in string functions — stays
    inside whole-stage codegen, no regex engine in the hot path (same
    rationale as the F1-F6 filter chain, filters.py).
    """
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    rest = F.substring_index(url, "://", -1)
    host = F.lower(F.substring_index(rest, "/", 1))
    # strip an explicit port if present; empty-host degenerates to ''
    host = F.substring_index(host, ":", 1)
    path = F.lower(F.substr(rest, F.length(host) + 1))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    rev_host = F.array_join(F.reverse(F.split(host, "\\.")), ",")
    return F.concat(rev_host, F.lit(")"), path)


def cdx_index(captures: DataFrame) -> DataFrame:
    """CDX-style capture index over ``(url, warc_ts, digest, length)``.

    Returns one row per capture:
    ``(surt, url, warc_ts, digest, length, capture_no, is_revisit)`` where
    ``capture_no`` is the 1-based capture ordinal for that url and
    ``is_revisit`` flags a digest identical to the url's previous capture
    (the WARC revisit-record condition). Ties on warc_ts break on digest
    so the ordinal is deterministic.

    Scale shape: exactly one shuffle — the window's hash partition on
    url — then a within-partition sort of that url's captures only (per-url
    capture counts are small and bounded by the recrawl policy, so no
    skew treatment is needed; a url re-captured every 8 days for a decade
    is ~450 rows). The surt column is computed map-side before the
    shuffle so a downstream ``sortWithinPartitions('surt')`` write
    produces the range-prunable index file order without a second pass.
    """
    w = Window.partitionBy("url").orderBy("warc_ts", "digest")
    return captures.select(
        surt_key("url").alias("surt"),
        "url",
        "warc_ts",
        "digest",
        "length",
    ).select(
        "*",
        F.row_number().over(w).alias("capture_no"),
        (F.lag("digest").over(w) == F.col("digest"))
        .cast("boolean")
        .alias("is_revisit"),
    ).fillna({"is_revisit": False})


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Classify urls across two crawl snapshots ``(url, digest)``.

    Returns ``(url, change, old_digest, new_digest)`` with change ∈
    {'added', 'removed', 'changed', 'unchanged'}. Each side is collapsed
    to its latest/only digest by the caller (the operator asserts nothing
    about multiplicity — feed it ``cdx_index`` rows filtered to the
    snapshot's final capture).

    Scale shape: one full-outer sort-merge join keyed on url — both sides
    shuffle once on the same key, no broadcast (both snapshots are
    O(corpus)). The change column is a null-pattern CASE, codegen'd. At
    10^10 urls the join is the floor cost of any diff; everything else is
    map-side.
    """
    o = old.select(F.col("url"), F.col("digest").alias("old_digest"))
    n = new.select(F.col("url"), F.col("digest").alias("new_digest"))
    joined = o.join(n, "url", "full_outer")
    return joined.select(
        "url",
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") == F.col("new_digest"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("change"),
        "old_digest",
        "new_digest",
    )


def warc_layout(captures: DataFrame) -> DataFrame:
    """Archive write plan: assign every capture its WARC file and byte
    offset — ``(warc_file, surt, url, warc_ts, digest, length, offset)``.

    Captures shard across 16 WARC files by an md5-hex-digit of the url
    (md5 is the repo's engine-portable hash — DuckDB replays it
    byte-identically, the same idiom as the q57/q69 sampling keys);
    within a file, records lay out in CDX order (surt, then capture
    time) and ``offset`` is the exclusive prefix sum of record lengths —
    exactly the (filename, offset, length) triple a CDXJ line points at,
    computed BEFORE any bytes are written so the store pass is one
    sequential append per file.

    Scale shape: one keyed shuffle on warc_file; the per-file prefix sum
    is a window WITHIN each file partition. Real archive writers bound
    file size (CC uses ~1 GiB WARCs), so file count — and with it
    partition parallelism — grows linearly with the corpus; no global
    ordering exists or is needed across files.
    """
    w = Window.partitionBy("warc_file").orderBy("surt", "warc_ts", "digest")
    return (
        captures.select(
            F.substring(F.md5(F.col("url")), 1, 1).alias("warc_file"),
            surt_key("url").alias("surt"),
            "url",
            "warc_ts",
            "digest",
            "length",
        )
        .select(
            "*",
            F.coalesce(
                F.sum("length").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("offset"),
        )
    )


# adaptive recrawl ladder: the reference recrawls EVERYTHING at a fixed 8
# days (crawler_prod.yml recrawl_interval: 691200); capture history lets
# the scheduler spend that budget where pages actually change
RECRAWL_BASE_SEC = 691_200  # 8 days — the reference's fixed interval
RECRAWL_FAST_SEC = RECRAWL_BASE_SEC // 4  # 2 days
RECRAWL_MED_SEC = RECRAWL_BASE_SEC // 2  # 4 days


def adaptive_recrawl(captures: DataFrame) -> DataFrame:
    """Per-url change-rate estimate and recommended recrawl interval from
    capture history → ``(url, n_captures, n_changed, change_rate,
    recrawl_secs)``. A recapture COUNTS AS CHANGED when its digest
    differs from the previous capture (the inverse of ``cdx_index``'s
    revisit flag); urls seen once have no evidence and keep the base
    interval. The ladder: ≥½ of recaptures changed → base/4 (2 d), any
    change → base/2 (4 d), never changed → base (8 d) — the
    Cho/Garcia-Molina adaptive-frequency result reduced to a bit-stable
    three-rung CASE over ROUNDED rates.

    Scale shape: rides ``cdx_index``'s single url-keyed window (the lag
    comparison), then ONE counters-only url fold; page bytes never move.
    """
    idx = cdx_index(captures)
    per_url = idx.groupBy("url").agg(
        F.count("*").alias("n_captures"),
        F.sum(
            F.when(
                (F.col("capture_no") > 1) & ~F.col("is_revisit"), 1
            ).otherwise(0)
        ).alias("n_changed"),
    )
    recaps = F.col("n_captures") - 1
    rate = F.when(
        recaps > 0,
        F.round(F.col("n_changed").cast("double") / recaps, 6),
    ).otherwise(F.lit(0.0))
    return per_url.select(
        "url",
        "n_captures",
        "n_changed",
        rate.alias("change_rate"),
        F.when(rate >= 0.5, F.lit(RECRAWL_FAST_SEC))
        .when(rate > 0, F.lit(RECRAWL_MED_SEC))
        .otherwise(F.lit(RECRAWL_BASE_SEC))
        .cast("bigint")
        .alias("recrawl_secs"),
    )
