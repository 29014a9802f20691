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


def bfs_layers_oracle_sql(max_depth: int = 4) -> str:
    """DuckDB recursive-CTE ground truth for the flagship crawl: min BFS
    depth per reachable doc from seed Doc_0 under the closed-form edges.
    Matches the engine's pages table on (url, depth, last_crawl_status,
    first_crawled_round)."""
    edge_list = ", ".join(
        f"(({m} * doc_id + {c}) % nn.n)" for m, c in EDGE_PARAMS
    )
    return f"""
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT doc_id AS src, unnest([{edge_list}]) AS dst
  FROM documents, nn
),
reach(id, depth) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, r.depth + 1
  FROM reach r JOIN edges e ON e.src = r.id
  WHERE r.depth < {max_depth}
)
SELECT
  '{URL_PREFIX}' || id AS url,
  CAST(min(depth) AS INT) AS depth,
  'SUCCESS' AS last_crawl_status,
  CAST(min(depth) AS INT) AS first_crawled_round
FROM reach GROUP BY id
"""
