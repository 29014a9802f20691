"""X4/X6 byte-parity against the REAL reference extraction stack
(lxml + readability-lxml), gated on availability (VERDICT r4 "do this" #5).

This sandbox cannot install lxml or readability-lxml (no network, not
baked in), so the engine's extractor (`wikifrontier/extract.py`) is a
documented stdlib substitution whose recovery contract is pinned by
`tests/test_extract_adversarial.py` and the q38/q45 oracles. THIS module
is the missing half: on any machine where the reference's actual
dependency pins (components/parser/requirements.txt: lxml,
readability-lxml) import, it replays the reference pipeline semantics
verbatim —

* title:      `//title/text()` → `[0].strip()`
              (wiki_content_extractor.py:84-90, selector
              parser_base_config.yml `title`)
* categories: `.//a/text()` under `//div[@id="mw-normal-catlinks"]`,
              skip the literal 'Categories', strip a 'Category:' prefix
              (wiki_content_extractor.py:109-138)
* clean text: readability `Document(html).summary()` →
              `fromstring(...).text_content().strip()` → stripped
              non-blank lines joined by '\\n'
              (wiki_content_extractor.py:141-159)
* links:      all `.//a` under `//div[@id="mw-content-text"]`, href-less
              dropped, urljoin-normalize, substring internal check,
              attr defaults '' (wiki_link_extractor.py:28-133)

— and asserts byte-equality field by field against extract_content /
extract_links over the clean template AND all 8 adversarial markup
families. Run it on a real cluster with:

    python -m pytest tests/test_lxml_parity.py -x -q

If the readability leg diverges there, the failure localizes exactly
which recovery rule (extract.py R1-R6) or readability cleanup differs —
that is the point: the gap closes (or becomes precise) automatically
wherever the real stack exists.
"""

from __future__ import annotations

import pytest

lxml_html = pytest.importorskip(
    "lxml.html", reason="lxml not installed in this environment"
)

from wikifrontier import corpus, extract, synth  # noqa: E402

# one doc per adversarial family (corpus.ADV_FAMILIES) plus clean pages
N_DOCS = 40
SAMPLE_IDS = list(range(16)) + [23, 31, 39]


def _pages():
    out = []
    for i in SAMPLE_IDS:
        out.append(("clean", corpus.render_html(i, f"Body text {i}.\nLine two {i}.", "en", N_DOCS)))
        out.append(("adv", corpus.render_html_adversarial(i, f"Body text {i}.\nLine two {i}.", "en", N_DOCS)))
    for i in (0, 1, 7, 11, 13, 17, 19, 23):
        out.append(("synth", synth.gen_page_row(i, 30)["html"].decode()))
    return out


def _ref_title(tree):
    title_list = tree.xpath("//title/text()")
    return title_list[0].strip() if title_list else None


def _ref_categories(tree):
    cats = []
    divs = tree.xpath('//div[@id="mw-normal-catlinks"]')
    if divs:
        for link in divs[0].xpath(".//a/text()"):
            if link == "Categories":
                continue
            if link.startswith("Category:"):
                cats.append(link[len("Category:"):])
            else:
                cats.append(link)
    return cats


def _ref_links(tree, source_url, depth):
    main = tree.xpath('//div[@id="mw-content-text"]')
    if not main:
        return []
    rows = []
    for link in main[0].xpath(".//a"):
        href = link.get("href")
        if not href:
            continue
        norm = extract.normalize_url(href)  # pinned urljoin-parity (P4)
        internal = extract.is_internal_link(norm)
        anchor_text = (link.text_content() or "").strip()
        rel = link.get("rel") or ""
        rows.append(
            {
                "url": norm,
                "depth": depth + 1,
                "is_internal": internal,
                "anchor_text": anchor_text,
                "title_attribute": link.get("title") or "",
                "rel_attribute": rel,
                "id_attribute": link.get("id") or "",
                "link_type": extract.determine_link_type(
                    internal, norm, href, anchor_text, rel
                ),
            }
        )
    return rows


@pytest.mark.parametrize("kind,html", _pages())
def test_title_and_categories_byte_parity(kind, html):
    tree = lxml_html.fromstring(html)
    got = extract.extract_content("https://x/wiki/P", html)
    want_title = _ref_title(tree) or "Page is missing title"
    assert got["title"] == want_title, kind
    assert got["categories"] == _ref_categories(tree), kind


@pytest.mark.parametrize("kind,html", _pages())
def test_links_byte_parity(kind, html):
    tree = lxml_html.fromstring(html)
    got = [
        {k: v for k, v in row.items() if k not in ("source_page_url", "in_page_seq")}
        for row in extract.extract_links("https://x/wiki/P", html, 2)
    ]
    assert got == _ref_links(tree, "https://x/wiki/P", 2), kind


@pytest.mark.parametrize("kind,html", _pages())
def test_clean_text_byte_parity_with_readability(kind, html):
    readability = pytest.importorskip(
        "readability", reason="readability-lxml not installed"
    )
    doc = readability.Document(html)
    clean_html = doc.summary()
    want = None
    if clean_html:
        text = lxml_html.fromstring(clean_html).text_content().strip()
        want = "\n".join(
            line.strip() for line in text.splitlines() if line.strip()
        )
    got = extract.extract_content("https://x/wiki/P", html)["text_content"]
    assert got == want, kind
