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


# adversarial malformation families (q45): doc_id % ADV_FAMILIES selects
# one of 8 templates. Every family is EXTRACTION-INVARIANT by design —
# the recovery rules (extract.py R1–R6) must produce byte-identical
# title/categories/clean-text AND the identical out-edge set as the clean
# template, so the q38 oracle (page_content_oracle_sql) doubles as the
# ground truth for the malformed corpus.
ADV_FAMILIES = 8


def render_html_adversarial(doc_id: int, text: str, lang: str, n: int) -> str:
    """render_html with a doc_id-selected malformation family injected.

    Families: 0 clean · 1 unclosed <p> · 2 stray end tags · 3 doctype +
    comments · 4 <script> with decoy markup · 5 <style> block · 6
    entity-encoded texts · 7 case/quote chaos + duplicate attrs."""
    fam = doc_id % ADV_FAMILIES
    t = edge_targets(doc_id, n)

    title_text = f"Doc {doc_id} - Wikipedia"
    cat_text = f"Category:Lang_{lang}"
    if fam == 6:
        title_text = f"Doc {doc_id} - Wikip&#101;dia"  # decodes to 'Wikipedia'
        cat_text = f"Category&#58;Lang_{lang}"  # decodes to 'Category:...'

    head = f"<head><title>{title_text}</title></head>"
    if fam == 3:
        head = f"<head><!-- head noise --><title>{title_text}</title></head>"

    para = f"<p>{text}</p>"
    if fam == 1:
        para = f"<p>{text}"  # unclosed: R1/R4 must still bound it at </div>

    anchors = [
        f'<a href="/wiki/Doc_{t[0]}" id="l0">Link to Doc_{t[0]}</a>',
        f'<a href="/wiki/Doc_{t[1]}" title="Doc {t[1]}">Link to Doc_{t[1]}</a>',
        f'<a href="/wiki/Doc_{t[2]}">Link to Doc_{t[2]}</a>',
        f'<a href="/wiki/Doc_{t[3]}#sec">Fragment link</a>',
        f'<a href="/wiki/Category:Lang_{lang}">Category link</a>',
        '<a href="/wiki/Special:Random">Special link</a>',
        f'<a href="https://example.org/d{doc_id}" rel="nofollow">External</a>',
    ]
    if fam == 6:
        anchors[3] = f'<a href="/wiki/Doc_{t[3]}#sec">Fragment&#32;link</a>'
        anchors[4] = f'<a href="/wiki/Category:Lang_{lang}">C&#97;tegory link</a>'
    if fam == 7:
        # uppercase + unquoted attrs (R6 lowercasing) and a duplicate
        # href whose decoy second value must LOSE (R3 first-wins)
        anchors[0] = f"<A HREF=/wiki/Doc_{t[0]} ID=l0>Link to Doc_{t[0]}</A>"
        anchors[1] = (
            f'<a href="/wiki/Doc_{t[1]}" href="/wiki/Doc_999999999"'
            f' title="Doc {t[1]}">Link to Doc_{t[1]}</a>'
        )

    content = [para]
    if fam == 2:
        content.append("</span>")  # stray end tags: ignored, no text
    content.extend(anchors)
    if fam == 2:
        content.append("</em>")
    if fam == 3:
        content.append(f"<!-- <p>ghost {doc_id}</p> -->")
    if fam == 4:
        content.append(
            '<script>var s = "</div>"; '
            "document.write('<a href=\"/wiki/Doc_999999999\">fake</a>');</script>"
        )
    if fam == 5:
        content.append("<style>#mw-content-text p { color: red }</style>")

    div_open = '<div id="mw-content-text">'
    catlinks_open = '<div id="mw-normal-catlinks"><ul>'
    if fam == 7:
        div_open = '<DIV ID="mw-content-text">'
        catlinks_open = '<DIV ID="mw-normal-catlinks"><UL>'

    lines = []
    if fam == 3:
        lines.append("<!DOCTYPE html>")
    lines += [
        "<html>",
        head,
        "<body>",
        f'<h1 id="firstHeading">Doc {doc_id}</h1>',
        catlinks_open,
        "<li><a>Categories</a></li>",
        f"<li><a>{cat_text}</a></li>",
        "</ul></div>",
        div_open,
        *content,
        "</div>",
        f'<div id="footer">Footer noise {doc_id}.</div>',
        "</body>",
        "</html>",
    ]
    if fam == 3:
        lines.append("<!-- trailing noise -->")
    return "\n".join(lines)


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the render mapInPandas below amplifies each row ~100×
    # (HTML string build); without it the whole corpus renders in the
    # scan's 1-2 split tasks (session.spread docstring).
    from wikifrontier.session import spread

    return spread(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def documents_corpus(
    spark: SparkSession, sf_dir: str, adversarial: bool = False
) -> DataFrame:
    """documents.parquet → web_pages DataFrame (distributed render).

    The page count n parameterizes the modular link graph; it is the one
    driver-side scalar (a count, not a collect of rows). With
    ``adversarial=True`` each page goes through render_html_adversarial —
    same extracted values and edges, malformed markup (q45)."""
    import pandas as pd

    docs = load_documents(spark, sf_dir)
    n = docs.count()
    render_fn = render_html_adversarial if adversarial else render_html

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
                i = int(doc_id)
                rows.append(
                    {
                        "url": doc_url(i),
                        "warc_ts": WARC_EPOCH + timedelta(seconds=i),
                        "html": render_fn(i, str(text), str(lang), n).encode(),
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


def retry_recrawl_oracle_sql(
    max_depth: int = 4,
    fetch_retries: int = 2,
    max_rounds: int = 10,
    recrawl_interval_s: int = 3,
) -> str:
    """Ground truth for the COMBINED retry × recrawl crawl (q46 — VERDICT
    r3 "do this" #8): planted misses AND the rescheduler in one run, so
    the attempt-counter algebra both paths share is exercised together.

    The interaction is closed-form because the two mechanisms never touch
    the same page on a static corpus: a missing page always FAILs, and a
    FAILED fetch writes next_crawl_at = NULL (frontier.py page event:
    only SUCCESS carries the horizon), so exhausted-retry pages are never
    rescheduled — their arithmetic is exactly q39's (total = 1+retries,
    failed = total-1, last crawl at round d + retries). A present page
    always SUCCEEDs, is never retried, and recrawls on q40's period —
    total = 1 + floor((R-1-d)/period), failed = 0. BFS reach expands
    through present pages only (a FAILED page never parses)."""
    from wikifrontier.frontier import ERROR_TYPES

    miss = f"id % {MISS_DIVISOR} = {MISS_MOD}"
    total_miss = 1 + fetch_retries
    period = recrawl_interval_s + 1
    k = f"(({max_rounds} - 1 - depth) // {period})"
    err_list = ", ".join(f"'{t}'" for t in ERROR_TYPES)
    err = (
        f"([{err_list}])"
        "[((instr('0123456789abcdef', substr(sha256(url), 1, 1)) - 1) % 6) + 1]"
    )
    return f"""
WITH RECURSIVE {_reach_ctes(max_depth, f"doc_id % {MISS_DIVISOR} <> {MISS_MOD}")},
named AS (SELECT '{URL_PREFIX}' || id AS url, id, depth FROM layer)
SELECT url,
  CASE WHEN {miss} THEN 'FAILED' ELSE 'SUCCESS' END AS last_crawl_status,
  CAST(CASE WHEN {miss} THEN {total_miss} ELSE 1 + {k} END AS INT)
    AS total_crawl_attempts,
  CAST(CASE WHEN {miss} THEN {total_miss - 1} ELSE 0 END AS INT)
    AS failed_crawl_attempts,
  depth,
  depth AS first_crawled_round,
  CAST(CASE WHEN {miss} THEN depth + {fetch_retries}
       ELSE depth + {period} * {k} END AS BIGINT) AS last_crawled_round,
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
