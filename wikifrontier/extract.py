"""Pure-Python content + link extraction (no Spark imports).

Re-implements, with the standard library only, the per-page extraction
semantics of the reference parser:

* content extraction — reference
  ``components/parser/core/wiki_content_extractor.py:30-159`` (X1–X5, X7 in
  SURVEY.md §2.3)
* link extraction — reference
  ``components/parser/core/wiki_link_extractor.py:28-181`` (X6, P4–P6)

The sandbox has neither ``lxml`` nor ``readability-lxml``, so the clean-text
step (reference ``wiki_content_extractor.py:141-159``: readability summary →
``text_content()`` → line-normalize) is re-specified as: take the main
content container (``<div id="mw-content-text">`` — which is exactly the node
readability selects on wiki-shaped pages), concatenate its text nodes in
document order (lxml ``text_content()`` semantics: no separators inserted)
EXCLUDING ``<script>``/``<style>`` subtrees (readability's cleaner removes
both before ``text_content()`` runs), strip, then ``'\n'.join(line.strip()
for line in text.splitlines() if line.strip())`` — the reference's own
normalization, byte-for-byte.

RECOVERY CONTRACT (the documented libxml2-parity rules for malformed
markup — each is pinned byte-exact by tests/test_extract_adversarial.py):

* R1 — auto-close: opening tag T implicitly closes the element on top of
  the open stack while that element is in ``_CLOSED_BY[T]`` (libxml2's
  ``htmlAutoClose`` against its start-close table): a closes a; p closes
  p; li closes li|p; td/th close td|th|p; tr closes tr|td|th|p; dd/dt
  close dd|dt|p; option closes option; block containers (div, ul, ol,
  table, blockquote, pre, h1–h6, section, article, header, footer, nav,
  aside, form, hr) close an open p. The check is iterative against the
  stack top only, so an intervening container (``<li><ul><li>``) keeps
  nesting, as in libxml2.
* R2 — a self-closing slash on a NON-void element (``<a/>``) is ignored:
  the element opens normally and swallows following content until
  closed (HTML parsers only honor the slash on void elements).
* R3 — duplicate attributes: the FIRST occurrence wins (libxml2 drops
  repeats; ``dict(attrs)`` would keep the last).
* R4 — stray end tags with no matching open element are ignored; an end
  tag closes every element above its match on the stack (both already
  libxml2's recovery).
* R5 — comments, doctypes, and processing instructions contribute no
  text and no elements; ``<script>``/``<style>`` bodies are CDATA (a
  ``<a href>`` inside script source is text, not a link) — identical in
  html.parser and libxml2's HTML mode.
* R6 — selector parity: ``//title/text()`` = first direct text node
  scanning ALL <title> elements in document order;
  ``//div[@id="mw-content-text"]`` / ``//div[@id="mw-normal-catlinks"]``
  match DIV elements only; category ``.//a/text()`` = DIRECT text
  children of each anchor (a ``<b>`` wrapper hides the text; a comment
  splits one anchor into two category entries — exactly lxml's text()
  node list).

URL canonicalization uses the stdlib ``urllib.parse`` exactly as the
reference does (``wiki_link_extractor.py:110-120``): ``urljoin`` against the
configured base URL (NOT the source page), then strip fragment AND query.
This gives bit-parity with the reference for every href shape.

These functions are deliberately Spark-free so they can be unit-tested (and
compared against generator ground truth) without a JVM; ``udfs.py`` wraps
them in Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import hashlib
from html.parser import HTMLParser
from urllib.parse import urljoin, urlparse, urlunparse

# --- constants mirroring the reference configs -----------------------------
# components/parser/configs/parser_base_config.yml:1-3,123-128
BASE_URL = "https://en.wikipedia.org"
DOMAIN_SUBSTR = "wikipedia.org"  # substring check, wiki_link_extractor.py:123-133
IMAGE_EXTENSIONS = (".png", ".jpg", ".jpeg", ".gif", ".svg")

TITLE_BLANK_SENTINEL = "Page is blank - skipped"  # wiki_content_extractor.py:40
TITLE_MISSING_SENTINEL = "Page is missing title"  # wiki_content_extractor.py:51

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# R1 auto-close table (module docstring): opening the KEY tag pops the
# stack top while the top's tag is in the value set — libxml2's
# htmlAutoClose behavior restricted to the start-close pairs the wiki
# page shapes can hit.
_P_CLOSERS = frozenset({"p"})
_CLOSED_BY: dict[str, frozenset] = {
    "a": frozenset({"a"}),
    "p": _P_CLOSERS,
    "li": frozenset({"li", "p"}),
    "dd": frozenset({"dd", "dt", "p"}),
    "dt": frozenset({"dd", "dt", "p"}),
    "td": frozenset({"td", "th", "p"}),
    "th": frozenset({"td", "th", "p"}),
    "tr": frozenset({"tr", "td", "th", "p"}),
    "option": frozenset({"option"}),
    **{
        blk: _P_CLOSERS
        for blk in (
            "div ul ol table blockquote pre h1 h2 h3 h4 h5 h6 "
            "section article header footer nav aside form hr".split()
        )
    },
}


# --- minimal DOM ------------------------------------------------------------
class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str | None]):
        self.tag = tag
        self.attrs = attrs
        self.children: list[object] = []  # _Node | str


def _first_wins(attrs: list[tuple[str, str | None]]) -> dict[str, str | None]:
    """R3: libxml2 keeps the first of duplicate attributes."""
    out: dict[str, str | None] = {}
    for k, v in attrs:
        if k not in out:
            out[k] = v
    return out


class _TreeBuilder(HTMLParser):
    """Tolerant HTML → tiny tree under the R1–R5 recovery contract
    (module docstring). convert_charrefs=True decodes entities."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#document", {})
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        # R1: implied end tags — pop while the open element is closed by
        # this start tag (iterative, top-of-stack only, like libxml2)
        closes = _CLOSED_BY.get(tag)
        if closes is not None:
            while len(self._stack) > 1 and self._stack[-1].tag in closes:
                self._stack.pop()
        node = _Node(tag, _first_wins(attrs))
        self._stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        # R2: "<a/>" is NOT self-closing in HTML — only void elements
        # honor the slash; everything else opens normally
        if tag in VOID_ELEMENTS:
            self._stack[-1].children.append(_Node(tag, _first_wins(attrs)))
        else:
            self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        # R4: pop to the nearest matching open tag; ignore stray end tags
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def parse_html(html: str) -> _Node:
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


def _iter_nodes(node: _Node):
    for child in node.children:
        if isinstance(child, _Node):
            yield child
            yield from _iter_nodes(child)


def _find_first_div_by_id(root: _Node, element_id: str) -> _Node | None:
    """R6: the reference selectors are ``//div[@id=...]`` — DIV only, so
    a same-id span/section is NOT the container."""
    for node in _iter_nodes(root):
        if node.tag == "div" and node.attrs.get("id") == element_id:
            return node
    return None


def _text_nodes(node: _Node, skip: frozenset | None = None):
    """All text chunks under node in document order (lxml text_content()
    semantics); subtrees whose tag is in ``skip`` contribute nothing."""
    for child in node.children:
        if isinstance(child, str):
            yield child
        elif skip is None or child.tag not in skip:
            yield from _text_nodes(child, skip)


def _direct_text_nodes(node: _Node):
    """Only the text children of node itself — XPath ``text()``."""
    for child in node.children:
        if isinstance(child, str):
            yield child


def text_content(node: _Node) -> str:
    """lxml ``.text_content()``: concatenation, no separators inserted."""
    return "".join(_text_nodes(node))


# --- scalar helpers (P1, P4, P5, P6) ---------------------------------------
def sha256_hex(content: str) -> str:
    """P1 — shared/utils.py:6-14 (sha256 of UTF-8, hexdigest)."""
    return hashlib.sha256(content.encode("utf-8")).hexdigest()


def normalize_url(href: str) -> str:
    """P4 — wiki_link_extractor.py:110-120.

    urljoin against the configured base (not the source page!), then strip
    fragment and query. Host case is NOT touched (reference parity).
    """
    full_url = urljoin(BASE_URL, href)
    parsed = urlparse(full_url)
    return urlunparse(parsed._replace(fragment="", query=""))


def is_internal_link(href: str) -> bool:
    """P5 — wiki_link_extractor.py:123-133 (substring netloc check)."""
    parsed = urlparse(href)
    return parsed.scheme in ("http", "https") and DOMAIN_SUBSTR in parsed.netloc


def determine_link_type(
    is_internal: bool, norm_url: str, raw_href: str, text: str, rel: str
) -> str:
    """P6 — wiki_link_extractor.py:136-181."""
    try:
        path = urlparse(norm_url).path.lower()
        raw_href = raw_href.lower()
        text = text.lower()
        rel = rel.lower()

        if is_internal:
            if path.startswith("/wiki/category:"):
                return "category_link"
            if path.startswith("/wiki/file:"):
                return "file_link"
            if path.startswith("/wiki/") and not path.endswith(IMAGE_EXTENSIONS):
                return "wikilink"
            return "internal_other"

        if raw_href.endswith(IMAGE_EXTENSIONS) or text.endswith(IMAGE_EXTENSIONS):
            return "external_image_link"
        if "nofollow" in rel:
            return "external_link_nofollow"
        return "external_link"
    except Exception:
        return "error_determining_type"


# --- content extraction (X1–X5, X7) ----------------------------------------
def _extract_title(root: _Node) -> str | None:
    """X1 — ``//title/text()`` then ``[0].strip()``
    (wiki_content_extractor.py:84-90): the xpath collects the DIRECT text
    nodes of every <title> in document order, so an empty first title
    falls through to a later one (R6)."""
    for node in _iter_nodes(root):
        if node.tag != "title":
            continue
        for chunk in _direct_text_nodes(node):
            return chunk.strip()
    return None


def _extract_categories(root: _Node) -> list[str]:
    """X2 — wiki_content_extractor.py:109-138.

    ``.//a/text()`` under the first div#mw-normal-catlinks — the DIRECT
    text children of each anchor (R6: an element wrapper hides its text;
    a comment inside one anchor yields two separate entries, matching
    lxml's text() node list); skip the literal 'Categories'; strip a
    'Category:' prefix. (Reference compares the raw text node — no
    strip().)
    """
    catlinks = _find_first_div_by_id(root, "mw-normal-catlinks")
    if catlinks is None:
        return []
    categories: list[str] = []
    for node in _iter_nodes(catlinks):
        if node.tag != "a":
            continue
        for text in _direct_text_nodes(node):
            if text == "Categories":
                continue
            if text.startswith("Category:"):
                categories.append(text[len("Category:"):])
            else:
                categories.append(text)
    return categories


_CLEAN_TEXT_SKIP = frozenset({"script", "style"})


def _extract_clean_text(content_div: _Node) -> str | None:
    """X4 — text_content of the main container, line-normalized.

    Reference: readability summary → text_content → '\n'.join(stripped
    non-blank lines) (wiki_content_extractor.py:141-159). Readability's
    DOM cleaner drops <script>/<style> before text_content runs, so
    those subtrees are excluded here too. See module docstring for the
    readability→content-div substitution.
    """
    text = "".join(_text_nodes(content_div, _CLEAN_TEXT_SKIP)).strip()
    return "\n".join(line.strip() for line in text.splitlines() if line.strip())


def extract_content(url: str, html: str) -> dict:
    """Fused X1–X5 + X7. Returns the SaveParsedContent-shaped dict.

    Mirrors wiki_content_extractor.py:30-75 exactly: blank page short-circuit,
    missing-title sentinel, missing-main-content → text_content None.
    """
    if not html.strip():
        return {
            "source_page_url": url,
            "title": TITLE_BLANK_SENTINEL,
            "categories": [],
            "text_content": None,
            "text_content_hash": None,
        }
    root = parse_html(html)

    title = _extract_title(root)
    if not title:
        title = TITLE_MISSING_SENTINEL

    categories = _extract_categories(root)
    content_div = _find_first_div_by_id(root, "mw-content-text")
    if content_div is None:
        return {
            "source_page_url": url,
            "title": title,
            "categories": categories,
            "text_content": None,
            "text_content_hash": None,
        }

    text = _extract_clean_text(content_div)
    return {
        "source_page_url": url,
        "title": title,
        "categories": categories,
        "text_content": text,
        "text_content_hash": sha256_hex(text) if text else None,
    }


# --- link extraction (X6) ---------------------------------------------------
def extract_links(source_page_url: str, html: str, depth: int) -> list[dict]:
    """X6 — wiki_link_extractor.py:28-107.

    All <a> descendants of the first div#mw-content-text, document order;
    href-less anchors dropped; per-link failures dropped; depth = parent + 1.
    """
    if not html.strip():
        return []
    root = parse_html(html)
    content_div = _find_first_div_by_id(root, "mw-content-text")
    if content_div is None:
        return []

    links: list[dict] = []
    seq = 0
    for node in _iter_nodes(content_div):
        if node.tag != "a":
            continue
        href = node.attrs.get("href")
        if not href:
            continue
        try:
            norm = normalize_url(href)
            internal = is_internal_link(norm)
            anchor_text = text_content(node).strip()
            rel_attr = node.attrs.get("rel") or ""
            title_attr = node.attrs.get("title") or ""
            id_attr = node.attrs.get("id") or ""
            link_type = determine_link_type(internal, norm, href, anchor_text, rel_attr)
            links.append(
                {
                    "source_page_url": source_page_url,
                    "url": norm,
                    "depth": depth + 1,
                    "is_internal": internal,
                    "anchor_text": anchor_text,
                    "title_attribute": title_attr,
                    "rel_attribute": rel_attr,
                    "id_attribute": id_attr,
                    "link_type": link_type,
                    "in_page_seq": seq,
                }
            )
            seq += 1
        except Exception:
            continue
    return links


def parse_page(url: str, html: str, depth: int) -> dict:
    """One-pass fused parse: content struct + links array for one page."""
    content = extract_content(url, html)
    content["links"] = extract_links(url, html, depth)
    return content


# --- rel=canonical extraction (column-level) ---------------------------------
# The reference's parser ignores <link rel="canonical"> entirely
# (components/parser/core/wiki_content_extractor.py walks the content div
# only), so syntactically-distinct URLs serving the same canonical page
# enter its corpus as independent pages. At web scale canonical tags are
# the publisher's OWN dedup signal — honoring them collapses print/mobile/
# tracking variants before any content hashing runs.
#
# Unlike the DOM walk above (a per-page Arrow UDF by necessity), canonical
# extraction is a single anchored pattern — it stays a JVM-side regexp
# column expression, never entering Python. Both attribute orders are
# handled (rel-then-href and href-then-rel).
_CANON_REL_HREF = '<link[^>]*rel="canonical"[^>]*href="([^"]*)"'
_CANON_HREF_REL = '<link[^>]*href="([^"]*)"[^>]*rel="canonical"'


def rel_canonical(html_col):
    """Canonical URL declared by the page, or NULL — regexp column
    expression (rel/href in either order), identical in DuckDB."""
    from pyspark.sql import functions as F

    a = F.regexp_extract(html_col, _CANON_REL_HREF, 1)
    b = F.regexp_extract(html_col, _CANON_HREF_REL, 1)
    out = F.when(a != "", a).when(b != "", b)
    return out


def canonical_clusters(df, url_col: str = "url", html_col: str = "html"):
    """Cluster crawled URLs by their effective canonical target →
    ``(canonical_url, n_variants, n_self, keep_url)``. Pages without a
    canonical tag are their own target; keep_url is the deterministic
    min() representative (the same first-wins rule as claim/exact-dedup).

    Scale shape: the regexp runs map-side; ONE keyed groupBy on the
    canonical target (counters + min url — page HTML never shuffles).
    """
    from pyspark.sql import functions as F

    target = F.coalesce(rel_canonical(F.col(html_col)), F.col(url_col))
    return (
        df.select(
            F.col(url_col).alias("url"),
            target.alias("canonical_url"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_variants"),
            F.sum(
                (F.col("url") == F.col("canonical_url")).cast("int")
            ).alias("n_self"),
            F.min("url").alias("keep_url"),
        )
    )


# --- Mercator-style URL normalization (column-level) --------------------------
# The reference's normalize_url (wiki_link_extractor.py:110-120) strips the
# ENTIRE query string — correct for Wikipedia article URLs, destructive for
# the general web where ?id=7 selects the page. A web-scale frontier needs
# the Mercator/Heritrix canonicalization instead: lowercase scheme+host,
# strip default ports, drop fragments, remove tracking parameters, and
# SORT the surviving query parameters so parameter order never creates
# synthetic URL diversity. Pure column expressions — JVM-side, codegen'd,
# identical regexps replay in DuckDB (patterns stay in the Java∩RE2
# dialect intersection, same convention as the PII rules).
URL_TRACKING_PARAM_RE = (
    "(?i)^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_eid|ref)="
)


def url_normalize(url_col):
    """Normalized absolute URL, or NULL when the value has no scheme://host.

    scheme/host lowercase; :80 (http) and :443 (https) stripped; empty
    path becomes "/"; fragment dropped; tracking params removed; the
    remaining query params sorted lexicographically and rejoined.
    """
    from pyspark.sql import functions as F

    scheme = F.lower(
        F.regexp_extract(url_col, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    host = F.lower(
        F.regexp_extract(url_col, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_extract(
        url_col, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url_col, "\\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda x: (x != "") & ~x.rlike(URL_TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(params, "&")
    norm = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when((scheme != "") & (host != ""), norm)


def url_dedup_rollup(df, url_col: str = "url"):
    """Collapse syntactic URL variants → ``(normalized_url, n_variants,
    first_url)``: distinct raw spellings per normalized form plus the
    deterministic min() representative. Rows that fail normalization
    (no scheme://host) are dropped — they never enter a frontier.

    Scale shape: normalization is map-side; ONE keyed groupBy on the
    normalized form (count distinct + min — the claim/dedup first-wins
    idiom). At 10^10 URLs this is the same single exchange the seen-check
    already pays.
    """
    from pyspark.sql import functions as F

    return (
        df.select(
            F.col(url_col).alias("u"),
            url_normalize(F.col(url_col)).alias("normalized_url"),
        )
        .filter(F.col("normalized_url").isNotNull())
        .groupBy("normalized_url")
        .agg(
            F.countDistinct("u").alias("n_variants"),
            F.min("u").alias("first_url"),
        )
    )
