"""Parity tier (SURVEY.md §5.2 tier 1): extraction semantics.

Test vectors vendored from the reference's own parser unit tests
(/root/reference/tests/components/parser/core/test_wiki_content_extractor.py
and test_wiki_link_extractor.py) — inputs and expected values only; the
implementation under test is ours.
"""

from wikifrontier import extract, synth
from wikifrontier.simulator import filter_reason_py

# vendored fixture — reference test_wiki_content_extractor.py:8-25
SAMPLE_HTML = """
<html>
  <head><title>Test Page</title></head>
  <body>
    <h1 id="firstHeading">Sample Article</h1>
    <div id="mw-normal-catlinks">
      <ul>
        <li><a>Category 1</a></li>
        <li><a>Category 2</a></li>
      </ul>
    </div>
    <div id="mw-content-text">
      <p>This is the summary paragraph</p>
      <p>This is the body paragraph</p>
    </div>
  </body>
</html>
"""

TEST_URL = "http://www.example.com"


class TestContentExtraction:
    def test_extract_wiki_page_content(self):
        # reference test_extract_wiki_page_content:45-53
        result = extract.extract_content(TEST_URL, SAMPLE_HTML)
        assert result["title"] == "Test Page"
        assert result["categories"] == ["Category 1", "Category 2"]
        assert (
            result["text_content"]
            == "This is the summary paragraph\nThis is the body paragraph"
        )
        assert result["text_content_hash"] == extract.sha256_hex(result["text_content"])

    def test_extract_missing_title(self):
        html = SAMPLE_HTML.replace("<title>Test Page</title>", "")
        result = extract.extract_content(TEST_URL, html)
        assert result["title"] == "Page is missing title"

    def test_extract_blank_page(self):
        result = extract.extract_content(TEST_URL, "   \n  ")
        assert result["title"] == "Page is blank - skipped"
        assert result["categories"] == []
        assert result["text_content"] is None
        assert result["text_content_hash"] is None

    def test_extract_no_main_content(self):
        html = SAMPLE_HTML.replace('id="mw-content-text"', 'id="other"')
        result = extract.extract_content(TEST_URL, html)
        assert result["title"] == "Test Page"
        assert result["text_content"] is None
        assert result["text_content_hash"] is None

    def test_extract_no_catlinks(self):
        html = SAMPLE_HTML.replace('id="mw-normal-catlinks"', 'id="other"')
        result = extract.extract_content(TEST_URL, html)
        assert result["categories"] == []

    def test_extract_text_cleanup(self):
        # reference test_extract_text_cleanup:102-113
        dirty = SAMPLE_HTML.replace(
            "This is the body paragraph", "   \n   This is the body paragraph\n\n   "
        )
        result = extract.extract_content(TEST_URL, dirty)
        assert (
            result["text_content"]
            == "This is the summary paragraph\nThis is the body paragraph"
        )

    def test_category_prefix_stripping(self):
        # reference test ..._categories:226-244: Categories skipped,
        # Category: prefix stripped, plain names kept
        html = SAMPLE_HTML.replace(
            "<li><a>Category 1</a></li>\n        <li><a>Category 2</a></li>",
            "<li><a>Categories</a></li><li><a>Category:Science</a></li>"
            "<li><a>Category:Technology</a></li><li><a>General</a></li>",
        )
        result = extract.extract_content(TEST_URL, html)
        assert result["categories"] == ["Science", "Technology", "General"]


class TestLinkExtraction:
    def test_link_data_fields_and_depth(self):
        # reference test_wiki_link_extractor.py:31-50
        html = SAMPLE_HTML.replace(
            "<p>This is the body paragraph</p>",
            '<a href="/wiki/Python_(programming_language)" title="Python" '
            'id="pylink" rel="bookmark">Python</a>',
        )
        links = extract.extract_links(TEST_URL, html, depth=2)
        assert len(links) == 1
        link = links[0]
        assert link["source_page_url"] == TEST_URL
        assert link["url"] == "https://en.wikipedia.org/wiki/Python_(programming_language)"
        assert link["depth"] == 3
        assert link["anchor_text"] == "Python"
        assert link["title_attribute"] == "Python"
        assert link["id_attribute"] == "pylink"
        assert link["rel_attribute"] == "bookmark"
        assert link["is_internal"] is True
        assert link["link_type"] == "wikilink"

    def test_no_main_content_no_links(self):
        html = SAMPLE_HTML.replace('id="mw-content-text"', 'id="other"')
        assert extract.extract_links(TEST_URL, html, 0) == []

    def test_href_less_anchor_dropped(self):
        html = SAMPLE_HTML.replace(
            "<p>This is the body paragraph</p>", "<a>no href</a>"
        )
        assert extract.extract_links(TEST_URL, html, 0) == []

    def test_link_type_matrix(self):
        # reference test_wiki_link_extractor.py:136-170
        cases = [
            ("/wiki/Article", "", "wikilink"),
            ("/wiki/Category:Things", "", "category_link"),
            ("/wiki/File:Photo.jpg", "", "file_link"),
            ("/w/index.php?title=X", "", "internal_other"),
            ("https://other.example.com/page", "", "external_link"),
            ("https://other.example.com/pic.png", "", "external_image_link"),
            ("https://other.example.com/page", "nofollow", "external_link_nofollow"),
        ]
        for href, rel, expected in cases:
            rel_attr = f' rel="{rel}"' if rel else ""
            html = SAMPLE_HTML.replace(
                "<p>This is the body paragraph</p>",
                f'<a href="{href}"{rel_attr}>text</a>',
            )
            links = extract.extract_links(TEST_URL, html, 0)
            assert len(links) == 1, href
            assert links[0]["link_type"] == expected, href

    def test_normalize_strips_fragment_and_query(self):
        # reference wiki_link_extractor.py:110-120
        assert (
            extract.normalize_url("/wiki/Page#Section?x=1")
            == "https://en.wikipedia.org/wiki/Page"
        )
        assert (
            extract.normalize_url("https://en.wikipedia.org/wiki/P?q=1#f")
            == "https://en.wikipedia.org/wiki/P"
        )

    def test_is_internal_substring_semantics(self):
        # substring check: ANY netloc containing wikipedia.org is internal
        assert extract.is_internal_link("https://de.wikipedia.org/wiki/X")
        assert extract.is_internal_link("https://notwikipedia.org/x")
        assert not extract.is_internal_link("ftp://en.wikipedia.org/x")
        assert not extract.is_internal_link("https://example.com/x")


class TestFilterMatrix:
    # reference tests/components/scheduler/core/test_filter.py:39-92
    def test_depth_boundary(self):
        url = "https://en.wikipedia.org/wiki/Page"
        assert filter_reason_py(url, 4) is None  # depth == max allowed
        assert filter_reason_py(url, 5) == "depth"

    def test_domain(self):
        assert filter_reason_py("https://example.com/x", 1) == "domain"
        assert filter_reason_py("https://de.wikipedia.org/wiki/X", 1) == "domain"

    def test_prefix(self):
        for ns in ("Special:R", "Help:X", "Category:C", "File:F.jpg", "Talk:T"):
            assert (
                filter_reason_py(f"https://en.wikipedia.org/wiki/{ns}", 1) == "prefix"
            )
        assert filter_reason_py("https://en.wikipedia.org/wiki/Main_Page", 1) == "prefix"

    def test_home_page(self):
        assert filter_reason_py("https://en.wikipedia.org/", 1) == "home_page"
        assert filter_reason_py("https://en.wikipedia.org", 1) == "home_page"

    def test_robots(self):
        rules = [("/wiki/Blocked_", False), ("/w/", False)]
        assert (
            filter_reason_py(
                "https://en.wikipedia.org/wiki/Blocked_1", 1, robots_rules=rules
            )
            == "robots_txt"
        )
        assert (
            filter_reason_py("https://en.wikipedia.org/wiki/Fine", 1, robots_rules=rules)
            is None
        )


class TestGeneratorParity:
    def test_extraction_matches_generator_ground_truth(self):
        """Byte-identical per-url extracted text over the full corpus —
        the input_hint invariant, checked Spark-free here and through the
        pandas UDF in test_spark_pipeline.py."""
        n = 1000
        for i in range(n):
            row = synth.gen_page_row(i, n)
            got = extract.extract_content(row["url"], row["html"].decode("utf-8"))
            assert got["text_content"] == row["text"], i
