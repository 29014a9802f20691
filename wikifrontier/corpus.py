"""web_pages corpus derived from the driver's `documents` parquet table.

The engine's input contract (BASELINE.json input_hint) is a table
``web_pages(url, warc_ts, html:binary, text, lang)``. For driver-facing
correctness queries the corpus must be a deterministic function of the
driver's own testdata, so this module renders each `documents` row into a
wiki-shaped HTML page (same template family as synth.py / the reference's
test fixture, /root/reference/tests/data/sample_page.html) with a
closed-form link graph over doc_ids:

    doc i  →  (2i+1) % n,  (3i+7) % n,  (5i+11) % n,  (7i+3) % n (#frag)

plus always-filtered links (Category:/Special: → F3, external → F2) so the
flagship crawl exercises the whole filter chain. Every target is
arithmetic on (doc_id, n) ⇒ the BFS layer assignment is expressible as a
DuckDB recursive CTE — the oracle for the end-to-end crawl.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wikifrontier import schemas

BASE = "https://en.wikipedia.org"
URL_PREFIX = f"{BASE}/wiki/Doc_"
WARC_EPOCH = datetime(2024, 1, 1, 0, 0, 0)

# (multiplier, offset) per out-edge — shared with the oracle SQL
EDGE_PARAMS: tuple[tuple[int, int], ...] = ((2, 1), (3, 7), (5, 11), (7, 3))


def doc_url(i: int) -> str:
    return f"{URL_PREFIX}{i}"


def edge_targets(i: int, n: int) -> list[int]:
    return [(m * i + c) % n for m, c in EDGE_PARAMS]


def render_html(doc_id: int, text: str, lang: str, n: int) -> str:
    t = edge_targets(doc_id, n)
    lines = [
        "<html>",
        f"<head><title>Doc {doc_id} - Wikipedia</title></head>",
        "<body>",
        f'<h1 id="firstHeading">Doc {doc_id}</h1>',
        '<div id="mw-normal-catlinks"><ul>',
        "<li><a>Categories</a></li>",
        f"<li><a>Category:Lang_{lang}</a></li>",
        "</ul></div>",
        '<div id="mw-content-text">',
        f"<p>{text}</p>",
        f'<a href="/wiki/Doc_{t[0]}" id="l0">Link to Doc_{t[0]}</a>',
        f'<a href="/wiki/Doc_{t[1]}" title="Doc {t[1]}">Link to Doc_{t[1]}</a>',
        f'<a href="/wiki/Doc_{t[2]}">Link to Doc_{t[2]}</a>',
        f'<a href="/wiki/Doc_{t[3]}#sec">Fragment link</a>',
        f'<a href="/wiki/Category:Lang_{lang}">Category link</a>',
        '<a href="/wiki/Special:Random">Special link</a>',
        f'<a href="https://example.org/d{doc_id}" rel="nofollow">External</a>',
        "</div>",
        f'<div id="footer">Footer noise {doc_id}.</div>',
        "</body>",
        "</html>",
    ]
    return "\n".join(lines)


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def documents_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → web_pages DataFrame (distributed render).

    The page count n parameterizes the modular link graph; it is the one
    driver-side scalar (a count, not a collect of rows).
    """
    import pandas as pd

    docs = load_documents(spark, sf_dir)
    n = docs.count()

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
                i = int(doc_id)
                rows.append(
                    {
                        "url": doc_url(i),
                        "warc_ts": WARC_EPOCH + timedelta(seconds=i),
                        "html": render_html(i, str(text), str(lang), n).encode(),
                        "text": None,
                        "lang": str(lang),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return docs.select("doc_id", "text", "lang").mapInPandas(
        render, schema=schemas.ddl_to_schema(schemas.WEB_PAGES_DDL)
    )


def _reach_ctes(max_depth: int, src_predicate: str = "") -> str:
    """Shared WITH RECURSIVE fragment: min BFS depth per doc reachable
    from Doc_0 under the closed-form edges. ``src_predicate`` (SQL over
    ``doc_id``) restricts which pages may EXPAND — the retry oracle uses
    it to model planted fetch misses (a FAILED page is claimed but never
    parsed, so its out-edges don't exist)."""
    edge_list = ", ".join(
        f"(({m} * doc_id + {c}) % nn.n)" for m, c in EDGE_PARAMS
    )
    where = f"WHERE {src_predicate}" if src_predicate else ""
    return f"""nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT doc_id AS src, unnest([{edge_list}]) AS dst
  FROM documents, nn {where}
),
reach(id, depth) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, r.depth + 1
  FROM reach r JOIN edges e ON e.src = r.id
  WHERE r.depth < {max_depth}
),
layer AS (SELECT id, CAST(min(depth) AS INT) AS depth FROM reach GROUP BY id)"""


def bfs_layers_oracle_sql(max_depth: int = 4) -> str:
    """DuckDB recursive-CTE ground truth for the flagship crawl: min BFS
    depth per reachable doc from seed Doc_0 under the closed-form edges.
    Matches the engine's pages table on (url, depth, last_crawl_status,
    first_crawled_round)."""
    return f"""
WITH RECURSIVE {_reach_ctes(max_depth)}
SELECT
  '{URL_PREFIX}' || id AS url,
  depth,
  'SUCCESS' AS last_crawl_status,
  depth AS first_crawled_round
FROM layer
"""


def page_content_oracle_sql(max_depth: int = 4) -> str:
    """Ground truth for the parsed-content VALUES of the flagship crawl
    (VERDICT r2 "do this" #1 — A3/X1–X5 value surface): for every
    reachable page, the title / category / clean-text the real parse UDF
    must extract, reconstructed closed-form from the render_html template
    (deterministic arithmetic — reference parity surface:
    components/parser/core/wiki_content_extractor.py:30-75,
    components/db_writer/core/db_writer.py:164-217).

    The expected clean text replays extract._extract_clean_text exactly:
    the content div's text lines (the document text, then the 7 anchor
    texts in template order), each stripped, blanks dropped, joined by
    newline. sha256 of that string is the text_content_hash."""
    anchor_lines = (
        "['Link to Doc_' || ((2 * d.doc_id + 1) % nn.n), "
        "'Link to Doc_' || ((3 * d.doc_id + 7) % nn.n), "
        "'Link to Doc_' || ((5 * d.doc_id + 11) % nn.n), "
        "'Fragment link', 'Category link', 'Special link', 'External']"
    )
    return f"""
WITH RECURSIVE {_reach_ctes(max_depth)},
content AS (
  SELECT d.doc_id,
    'Doc ' || d.doc_id || ' - Wikipedia' AS title,
    'Lang_' || d.lang AS categories_joined,
    array_to_string(
      list_concat(
        list_filter(
          list_transform(string_split(d.text, chr(10)), x -> trim(x)),
          x -> x <> ''),
        {anchor_lines}),
      chr(10)) AS clean_text
  FROM documents d, nn
)
SELECT '{URL_PREFIX}' || l.id AS source_page_url,
  c.title,
  c.categories_joined,
  sha256(c.clean_text) AS text_content_hash,
  CAST(length(c.clean_text) AS BIGINT) AS text_len
FROM layer l JOIN content c ON c.doc_id = l.id
"""


# planted fetch misses for the retry crawl (q39): these doc ids are
# dropped from the corpus, so fetching them FAILs deterministically.
# 0 % 17 != MISS_MOD so the seed always survives.
MISS_DIVISOR, MISS_MOD = 17, 5


def retry_crawl_oracle_sql(max_depth: int = 4, fetch_retries: int = 2) -> str:
    """Ground truth for the bounded-retry crawl (q39): BFS expands only
    through present (fetch-SUCCESS) pages; a missing page is claimed at
    its min present-parent depth, then fetched 1 + fetch_retries times
    (rounds d, d+1, …), every attempt FAILED. Replays the reference's
    attempt arithmetic (insert never counts as failed, every later
    attempt does — db_writer.py:42-102; bounded download_retry —
    crawler_service.py:157-190)."""
    from wikifrontier.frontier import ERROR_TYPES

    miss = f"id % {MISS_DIVISOR} = {MISS_MOD}"
    total = 1 + fetch_retries
    err_list = ", ".join(f"'{t}'" for t in ERROR_TYPES)
    # the deterministic error classifier (frontier.classify_fetch_error)
    # replayed in SQL — same derivation q33 uses
    err = (
        f"([{err_list}])"
        "[((instr('0123456789abcdef', substr(sha256(url), 1, 1)) - 1) % 6) + 1]"
    )
    return f"""
WITH RECURSIVE {_reach_ctes(max_depth, f"doc_id % {MISS_DIVISOR} <> {MISS_MOD}")},
named AS (SELECT '{URL_PREFIX}' || id AS url, id, depth FROM layer)
SELECT url,
  CASE WHEN {miss} THEN 'FAILED' ELSE 'SUCCESS' END AS last_crawl_status,
  CAST(CASE WHEN {miss} THEN {total} ELSE 1 END AS INT) AS total_crawl_attempts,
  CAST(CASE WHEN {miss} THEN {total - 1} ELSE 0 END AS INT) AS failed_crawl_attempts,
  depth,
  depth AS first_crawled_round,
  CASE WHEN {miss} THEN {err} || ': request failed' END AS last_error_seen
FROM named
"""


def recrawl_oracle_sql(
    max_depth: int = 4, max_rounds: int = 10, recrawl_interval_s: int = 3
) -> str:
    """Ground truth for the rescheduler crawl (q40): with the recrawl
    horizon shrunk to ``recrawl_interval_s`` seconds and one round = one
    second of crawl clock, a page first crawled in round d is re-fetched
    every (interval + 1) rounds — strict ``next_crawl_at < now``
    (db_reader.py:109-151 effective predicate, rescheduler loop
    rescheduler_service.py:36-71). Closed form over R = max_rounds:
    attempts = 1 + floor((R - 1 - d) / period), last crawl round =
    d + period * floor((R - 1 - d) / period)."""
    period = recrawl_interval_s + 1
    k = f"(({max_rounds} - 1 - depth) // {period})"
    return f"""
WITH RECURSIVE {_reach_ctes(max_depth)}
SELECT '{URL_PREFIX}' || id AS url,
  depth,
  CAST(1 + {k} AS INT) AS total_crawl_attempts,
  CAST(0 AS INT) AS failed_crawl_attempts,
  CAST(depth + {period} * {k} AS BIGINT) AS last_crawled_round
FROM layer
"""
