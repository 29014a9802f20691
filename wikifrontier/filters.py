"""Scheduler filter chain F1–F6 as native Column expressions.

Reference: /root/reference/components/scheduler/core/filter.py:43-110.
The chain is a short-circuit OR evaluated in this order: depth → domain →
prefix → home_page → robots (``is_filtered``, filter.py:51-57). We encode it
as a single CASE expression yielding the *first matching filter reason*
(NULL = link passes), which reproduces both the pass/drop decision and the
per-filter-type Prometheus counters (FILTERED_LINKS_TOTAL labels) as a
groupBy — all inside whole-stage codegen, no Python per row.

robots.txt rules are parsed once on the driver (the reference also fetches
robots once at service init, filter.py:33-41) and compiled into a broadcast
CASE chain of prefix tests — longest-rule-first, Allow wins ties, default
allow, mirroring urllib.robotparser decision semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheduler_base_config.yml:14-33 / scheduler_prod.yml:9
MAX_DEPTH = 4
ALLOWED_DOMAINS = ("en.wikipedia.org",)
EXCLUDED_PREFIXES = (
    "/wiki/Special:",
    "/wiki/Help:",
    "/wiki/Portal:",
    "/wiki/File:",
    "/wiki/Template:",
    "/wiki/Template_talk:",
    "/wiki/Wikipedia:",
    "/wiki/Talk:",
    "/wiki/Category:",
    "/wiki/Book:",
    "/wiki/User:",
    "/wiki/Module:",
    "/wiki/Project:",
    "/wiki/Main_Page",
)


def parse_robots(robots_txt: str) -> list[tuple[str, bool]]:
    """Compile a robots.txt (User-agent: * section) into (prefix, allow)
    rules ordered longest-first (urllib.robotparser precedence)."""
    rules: list[tuple[str, bool]] = []
    in_star = False
    for raw in robots_txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            in_star = value == "*"
        elif in_star and key in ("allow", "disallow") and value:
            rules.append((value, key == "allow"))
    # longest prefix first; Allow before Disallow on equal length
    rules.sort(key=lambda r: (-len(r[0]), not r[1]))
    return rules


def robots_denied_expr(path: Column, rules: list[tuple[str, bool]]) -> Column:
    """First (longest) matching rule decides; default allow. F5."""
    denied = F.lit(False)
    # build CASE from the *last* (shortest) rule outward so the first rule
    # in precedence order ends up as the outermost WHEN
    expr = F.lit(False)
    for prefix, allow in reversed(rules):
        expr = F.when(path.startswith(prefix), F.lit(not allow)).otherwise(expr)
    return expr if rules else denied


def split_url(url: Column) -> tuple[Column, Column, Column]:
    """(scheme, host, path) via codegen string ops — see filter_reason's
    scheme-boundary note. A url without '://' yields scheme == url and
    host/path ''."""
    scheme = F.substring_index(url, "://", 1)
    after_scheme = F.when(
        F.length(scheme) < F.length(url),
        url.substr(F.length(scheme) + 4, F.greatest(F.length(url), F.lit(1))),
    ).otherwise(F.lit(""))
    host = F.substring_index(after_scheme, "/", 1)
    path = after_scheme.substr(
        F.length(host) + 1, F.greatest(F.length(after_scheme), F.lit(1))
    )
    return scheme, host, path


VALID_SCHEMES = ("http", "https")
VALIDITY_REASONS = ("invalid_scheme", "missing_host", "invalid_depth")


def validity_reason(url: Column, depth: Column) -> Column:
    """P7/S1 — the message validity gate. The reference validates every
    consumed message against a Pydantic schema
    (shared/rabbitmq/schemas/crawling.py:13-35) and rejects failures to a
    per-queue DLQ (message_handler.py:37-41, DLX setup
    shared/rabbitmq/queue_service.py:39-71). Returns the first reject
    reason, NULL for rows that pass — callers route non-NULL rows to the
    ``invalid_rows`` side table (the DLQ analogue) instead of silently
    dropping them.

    INTENTIONALLY STRICTER than the reference validator (ADVICE r2 #2):
    the reference only requires urlparse scheme+netloc to be present, so
    e.g. ``ftp://files.example.com/d`` passes its gate (and then dies at
    fetch time in requests). This gate additionally restricts the scheme
    to http/https — the Pydantic-HttpUrl shape the schema's field name
    implies — because a non-HTTP url can never be fetched by this engine
    and belongs in the DLQ with a reason, not in a fetch-time error
    path. Documented deviation, exercised by q31."""
    scheme, host, _ = split_url(url)
    has_sep = F.length(scheme) < F.length(url)  # '://' present
    return (
        F.when(
            url.isNull() | ~has_sep | ~F.lower(scheme).isin(*VALID_SCHEMES),
            F.lit("invalid_scheme"),
        )
        .when(host == "", F.lit("missing_host"))
        .when(depth.isNull() | (depth < 0), F.lit("invalid_depth"))
    )


def split_valid(df, url_col: str = "url", depth_col: str = "depth"):
    """(valid_rows, invalid_rows) — invalid_rows carries reject_reason.
    Both are filters over the same input scan; keep the input a
    materialized leaf (or accept one rescan) when using both sides."""
    reason = validity_reason(F.col(url_col), F.col(depth_col))
    return (
        df.filter(reason.isNull()),
        df.withColumn("reject_reason", reason).filter(
            F.col("reject_reason").isNotNull()
        ),
    )


def filter_reason(
    url: Column,
    depth: Column,
    max_depth: int = MAX_DEPTH,
    allowed_domains: tuple[str, ...] = ALLOWED_DOMAINS,
    excluded_prefixes: tuple[str, ...] = EXCLUDED_PREFIXES,
    robots_rules: list[tuple[str, bool]] | None = None,
) -> Column:
    """First matching filter reason, NULL if the link passes all filters.

    Reason labels match the reference metric labels
    (filter.py:63,71,100,108,87): depth, domain, prefix, home_page,
    robots_txt.

    host/path come from substring_index string ops rather than parse_url:
    for the canonicalized absolute URLs this chain receives (P4 output:
    scheme://host/path, no query/fragment) the two agree exactly, and the
    string ops stay in whole-stage codegen at ~3× the throughput of
    parse_url's regex machinery — this CASE runs once per candidate link,
    the hottest expression in the crawl after the parse UDF.

    The split anchors on the FIRST '://' (scheme boundary): a '://' later
    in the path (legal, survives canonicalization) must not move the host.
    A url with no '://' at all yields host '' → 'domain'-filtered, the
    same outcome parse_url's NULL host produced.
    """
    scheme = F.substring_index(url, "://", 1)
    after_scheme = F.when(
        F.length(scheme) < F.length(url),
        url.substr(F.length(scheme) + 4, F.greatest(F.length(url), F.lit(1))),
    ).otherwise(F.lit(""))
    host = F.substring_index(after_scheme, "/", 1)
    path = after_scheme.substr(
        F.length(host) + 1, F.greatest(F.length(after_scheme), F.lit(1))
    )

    prefix_hit = F.lit(False)
    for p in excluded_prefixes:
        prefix_hit = prefix_hit | path.startswith(p)

    # F4 — filter.py:105-110: path.strip('/') == '' and netloc in ['', 'en.wikipedia.org']
    home_page = (F.regexp_replace(path, r"^/+|/+$", "") == "") & (
        F.coalesce(host, F.lit("")).isin("", "en.wikipedia.org")
    )

    robots = robots_denied_expr(path, robots_rules or [])

    return (
        F.when(depth > F.lit(max_depth), F.lit("depth"))
        .when(~F.coalesce(host, F.lit("")).isin(*allowed_domains), F.lit("domain"))
        .when(prefix_hit, F.lit("prefix"))
        .when(home_page, F.lit("home_page"))
        .when(robots, F.lit("robots_txt"))
    )
