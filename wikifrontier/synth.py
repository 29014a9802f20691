"""Deterministic synthetic `web_pages` crawl corpus (FIXTURES.md §1).

Generates the Common-Crawl-style input table mandated by BASELINE.json's
input_hint — ``web_pages(url string, warc_ts timestamp, html binary,
text string, lang string)`` — wiki-shaped HTML whose structure mirrors the
reference's own test fixture (``/root/reference/tests/components/parser/core/
test_wiki_content_extractor.py:8-25`` and ``tests/data/sample_page.html``),
extended to exercise every extraction / filter path of SURVEY.md §2.

Everything is a pure function of ``(i, n)`` — no wall clock, no RNG state —
so the corpus is bit-reproducible at any scale and the DuckDB oracle
(``oracles.py``) can recompute link targets / expected text with closed-form
SQL over ``range(n)``.

The ``text`` column is the generator's own ground-truth rendering of what
the extraction contract (extract.py X4) must produce; the engine never reads
it — tests assert ``extract(html) == text`` byte-for-byte per url.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from zoneinfo import ZoneInfo

# --- shared closed-form corpus parameters (mirrored in oracles.py SQL) -----
BASE_URL = "https://en.wikipedia.org"
SEED_ID = 0
CORNER_MOD = 101
BLANK_R = 7        # i % 101 == 7  -> html = b"" (blank page, X7)
NOTITLE_R = 11     # no <title>    (X1 missing-title sentinel)
NOCONTENT_R = 13   # no mw-content-text div (X3: text NULL, no links)
NOCAT_R = 17       # no mw-normal-catlinks  (X2: categories = [])
BLOCKED_R = 19     # page links to /wiki/Blocked_{i} (robots-denied, F5)
MISSING_R = 23     # page links to /wiki/Missing_{i} (no corpus row -> FAILED fetch)

WARC_EPOCH = datetime(2025, 8, 1, 0, 0, 0, tzinfo=ZoneInfo("America/New_York"))

MAX_EXTRA_DEG = 8  # deg(i) ranges 3..10


def deg(i: int) -> int:
    """Out-degree of page i (3..10) — duplicate-edge-bearing by design."""
    return 3 + i % MAX_EXTRA_DEG


def wlink_target(i: int, k: int, n: int) -> int:
    """k-th wikilink target of page i. Overflow-safe, SQL-expressible."""
    return (i * 31 + k * 17 + 7) % n


def frag_target(i: int, n: int) -> int:
    """Target of the fragment+query link (exercises P4 stripping)."""
    return (i * 13 + 5) % n


def page_url(i: int) -> str:
    return f"{BASE_URL}/wiki/Page_{i:07d}"


def missing_url(i: int) -> str:
    return f"{BASE_URL}/wiki/Missing_{i:07d}"


def blocked_url(i: int) -> str:
    return f"{BASE_URL}/wiki/Blocked_{i:07d}"


def lang_of(i: int) -> str:
    if i % 100 < 97:
        return "en"
    return ("de", "fr", "es")[i % 3]


ROBOTS_TXT = """User-agent: *
Disallow: /wiki/Blocked_
Disallow: /w/
"""


def content_div_lines(i: int, n: int) -> list[str]:
    """HTML lines inside <div id="mw-content-text"> for page i."""
    c = i % 17
    e = i % 7
    lines = [
        f"<p>Deterministic paragraph text for page {i:07d} covering topic {c}.</p>",
        f"<p>   Whitespace-noisy   paragraph for page {i:07d}.   </p>",
    ]
    for k in range(deg(i)):
        j = wlink_target(i, k, n)
        lines.append(
            f'<a href="/wiki/Page_{j:07d}" title="Page {j:07d}" id="l{k}">'
            f"Link to Page_{j:07d}</a>"
        )
    f = frag_target(i, n)
    lines.append(f'<a href="/wiki/Page_{f:07d}#Section?x=1">Fragment link</a>')
    lines.append(f'<a href="/wiki/Category:Topic_{c}">Category link</a>')
    lines.append(f'<a href="/wiki/File:Img_{c}.jpg">File link</a>')
    lines.append('<a href="/wiki/Special:Random">Special link</a>')
    lines.append(f'<a href="https://example-{e}.com/page" rel="nofollow">External nofollow</a>')
    lines.append(f'<a href="https://example-{e}.com/pic.png">External image</a>')
    lines.append("<a>No href anchor</a>")
    if i % CORNER_MOD == BLOCKED_R:
        lines.append(f'<a href="/wiki/Blocked_{i:07d}">Blocked link</a>')
    if i % CORNER_MOD == MISSING_R:
        lines.append(f'<a href="/wiki/Missing_{i:07d}">Missing link</a>')
    return lines


def gen_html(i: int, n: int) -> str:
    """Full HTML of page i ('' for blank pages)."""
    r = i % CORNER_MOD
    if r == BLANK_R:
        return ""
    c = i % 17
    p = i % 5
    lines = ["<html>"]
    if r == NOTITLE_R:
        lines.append("<head></head>")
    else:
        lines.append(f"<head><title>Page {i:07d} - Wikipedia</title></head>")
    lines.append("<body>")
    lines.append(f'<h1 id="firstHeading">Page {i:07d}</h1>')
    if r != NOCAT_R:
        lines.append('<div id="mw-normal-catlinks"><ul>')
        lines.append("<li><a>Categories</a></li>")
        lines.append(f"<li><a>Category:Topic_{c}</a></li>")
        lines.append(f"<li><a>Plain_{p}</a></li>")
        lines.append("</ul></div>")
    if r != NOCONTENT_R:
        lines.append('<div id="mw-content-text">')
        lines.extend(content_div_lines(i, n))
        lines.append("</div>")
    lines.append(f'<div id="footer">Footer noise for page {i:07d}.</div>')
    lines.append("</body>")
    lines.append("</html>")
    return "\n".join(lines)


def gen_text(i: int, n: int) -> str | None:
    """Ground-truth extracted text (the `text` column; extract.py contract)."""
    r = i % CORNER_MOD
    if r in (BLANK_R, NOCONTENT_R):
        return None
    c = i % 17
    out = [
        f"Deterministic paragraph text for page {i:07d} covering topic {c}.",
        f"Whitespace-noisy   paragraph for page {i:07d}.",
    ]
    for k in range(deg(i)):
        out.append(f"Link to Page_{wlink_target(i, k, n):07d}")
    out.extend(
        [
            "Fragment link",
            "Category link",
            "File link",
            "Special link",
            "External nofollow",
            "External image",
            "No href anchor",
        ]
    )
    if r == BLOCKED_R:
        out.append("Blocked link")
    if r == MISSING_R:
        out.append("Missing link")
    return "\n".join(out)


def gen_page_row(i: int, n: int) -> dict:
    """One web_pages row as plain Python values."""
    return {
        "url": page_url(i),
        "warc_ts": WARC_EPOCH + timedelta(seconds=i),
        "html": gen_html(i, n).encode("utf-8"),
        "text": gen_text(i, n),
        "lang": lang_of(i),
    }


def candidate_targets(i: int, n: int) -> list[str]:
    """Canonicalized URLs of page i's links that PASS the filter chain
    (F1 depth aside): wikilinks + fragment link + the Missing_ link.

    Ground truth for BFS-layer parity (used by simulator.py and oracles.py).
    Category/File/Special (F3 prefix), external (F2 domain), and Blocked_
    (F5 robots) targets are excluded. Order = document order; duplicates kept
    (claim D2 dedups).
    """
    r = i % CORNER_MOD
    if r in (BLANK_R, NOCONTENT_R):
        return []
    out = [page_url(wlink_target(i, k, n)) for k in range(deg(i))]
    out.append(page_url(frag_target(i, n)))
    if r == MISSING_R:
        out.append(missing_url(i))
    return out


# --- Spark-side generation --------------------------------------------------
WEB_PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def corpus_df(spark, n: int, partitions: int | None = None):
    """Distributed corpus: spark.range(n) → mapInPandas(gen_page_row batch).

    The generator is a pure function of (i, n), so generation is
    embarrassingly parallel and reproducible at any partition count —
    the same property that lets a real deployment synthesize a 10^10-row
    corpus without a driver-side loop.
    """
    import pandas as pd  # local import: keep module importable without pandas

    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = [gen_page_row(int(i), n) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return base.mapInPandas(gen, schema=WEB_PAGES_DDL)
