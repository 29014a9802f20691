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


# --- crawl-trap detection ------------------------------------------------------
# A host is flagged a trap when its URL space amplifies (many URLs under few
# distinct 2-segment path prefixes — infinite calendars, faceted search,
# session-id echoes) AND the URLs are either deep or query-driven. The
# reference's only trap defence is the static max-depth gate
# (components/crawler/core/link_filters.py via MAX_DEPTH above); a frontier at
# 10^10 URLs needs the per-host statistical signal as well, computed from the
# discovered-URL log, fed back as a domain blocklist for the next rounds.
TRAP_AMPLIFICATION = 10.0  # URLs per distinct 2-segment prefix
TRAP_AVG_DEPTH = 4.0       # mean path-segment count
TRAP_PARAM_FRAC = 0.5      # fraction of URLs carrying a query string


def trap_signals(df, url_col: str = "url") -> "DataFrame":
    """Per-host crawl-trap signals over a discovered-URL table.

    Returns (host, n_urls, avg_depth, param_frac, amplification, is_trap).

    Scale shape: two pure column projections (regexp host/path split,
    array ops for depth/prefix — all codegen'd, no UDF) and ONE shuffle
    keyed on host with map-side partial aggregation; the distinct-prefix
    count rides the same aggregate as count_distinct. Averages are
    exact-integer sums divided post-aggregate (never a float `avg`), so
    partial-agg order cannot perturb the oracle comparison.
    """
    url = F.col(url_col)
    host = F.regexp_extract(url, r"^https?://([^/?#]+)", 1)
    path = F.regexp_extract(url, r"^https?://[^/?#]+([^?#]*)", 1)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    depth = F.size(segs)
    prefix2 = F.concat_ws("/", F.slice(segs, 1, 2))
    has_param = (F.instr(url, "?") > 0).cast("int")
    g = (
        df.select(
            host.alias("host"),
            depth.alias("depth"),
            prefix2.alias("prefix2"),
            has_param.alias("has_param"),
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n_urls"),
            F.sum("depth").alias("depth_sum"),
            F.sum("has_param").alias("param_sum"),
            F.count_distinct("prefix2").alias("n_prefix2"),
        )
    )
    n = F.col("n_urls").cast("double")
    avg_depth = F.round(F.col("depth_sum") / n, 6)
    param_frac = F.round(F.col("param_sum") / n, 6)
    amplification = F.round(n / F.greatest(F.col("n_prefix2"), F.lit(1)).cast("double"), 6)
    return g.select(
        "host",
        "n_urls",
        avg_depth.alias("avg_depth"),
        param_frac.alias("param_frac"),
        amplification.alias("amplification"),
        (
            (amplification >= TRAP_AMPLIFICATION)
            & ((avg_depth >= TRAP_AVG_DEPTH) | (param_frac >= TRAP_PARAM_FRAC))
        ).alias("is_trap"),
    )


# --- distributed robots.txt ------------------------------------------------------
# parse_robots/robots_denied_expr above compile ONE robots.txt on the
# driver — correct for the reference-parity single-host crawl (its
# scheduler holds one parsed file, components/scheduler/core/
# link_filters.py robots handling), but a 10^10 frontier spans ~10^8
# hosts and their robots files are DATA, not config. These two operators
# are the same semantics as relational algebra over a (host, robots_txt)
# table: same User-agent:* group tracking (last UA line wins), same
# comment stripping, same longest-prefix precedence with Allow beating
# Disallow on equal length, same default-allow.

# the active group: everything after `User-agent: *` up to the next
# User-agent line (dotall, lazy — Java regex ∩ RE2 so the oracle replays
# it byte-identically)
_STAR_GROUP = r"(?s)[Uu]ser-[Aa]gent:[ \t]*\*[ \t]*\n(.*?)(?:[Uu]ser-[Aa]gent:|$)"


def robots_rules_table(
    robots: "DataFrame",
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> "DataFrame":
    """Explode per-host robots.txt blobs into ``(host, prefix, is_allow)``
    rules — the User-agent:* group only, comments stripped, empty values
    dropped (matching ``parse_robots`` line semantics).

    Scale shape: pure codegen'd string ops (regexp group extraction +
    split + explode) — a map over however many partitions hold the robots
    blobs, then a distinct on rule rows. Robots files are KBs, so the
    explode fan-out is bounded; no shuffle until the distinct, which
    carries (host, prefix, flag) counters only.
    """
    star = F.regexp_extract(F.col(txt_col), _STAR_GROUP, 1)
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(star, "\n")).alias("raw"),
    )
    nc = F.trim(F.substring_index(F.col("raw"), "#", 1))
    key = F.lower(F.trim(F.substring_index(nc, ":", 1)))
    value = F.trim(F.substr(nc, F.instr(nc, ":") + 1))
    return (
        lines.select(
            "host",
            key.alias("key"),
            value.alias("prefix"),
            F.instr(nc, ":").alias("has_colon"),
        )
        .where(
            (F.col("has_colon") > 0)
            & F.col("key").isin("allow", "disallow")
            & (F.col("prefix") != "")
        )
        .select("host", "prefix", (F.col("key") == "allow").alias("is_allow"))
        .distinct()
    )


def robots_gate_distributed(
    candidates: "DataFrame",
    rules: "DataFrame",
) -> "DataFrame":
    """Longest-match robots verdict for ``(url, host, path)`` candidates
    against a ``robots_rules_table`` relation → ``(url, host,
    matched_prefix, allowed)``; default allow when no rule matches.

    Precedence is ``parse_robots``' exactly: longest prefix wins, Allow
    beats Disallow on equal length. File order can never matter — two
    DISTINCT equal-length prefixes cannot both match one path, so the
    (length, is_allow) argmax is total on every match set.

    Scale shape: one host-keyed equi-join (rules per host are small —
    AQE broadcasts the rules side when the host set allows), the
    startswith filter runs inside the join, and the per-url argmax is a
    counters-only ``max_by`` fold. The verdict rides back on a left join
    keyed on url.
    """
    matched = candidates.join(rules, "host").where(
        F.col("path").startswith(F.col("prefix"))
    )
    best = matched.groupBy("url").agg(
        F.max_by(
            F.struct("prefix", "is_allow"),
            F.struct(
                F.length("prefix").alias("l"),
                F.col("is_allow").cast("int").alias("a"),
            ),
        ).alias("rule")
    )
    return (
        candidates.select("url", "host", "path")
        .join(best, "url", "left")
        .select(
            "url",
            "host",
            F.col("rule.prefix").alias("matched_prefix"),
            F.coalesce(F.col("rule.is_allow"), F.lit(True)).alias("allowed"),
        )
    )


def url_templates(
    df: "DataFrame",
    url_col: str = "url",
    top_k: int = 5,
) -> "DataFrame":
    """Top-k URL path templates per host: digit runs collapse to 'N'
    (``/wiki/Doc_123?y=2024`` → ``/wiki/doc_n?y=n`` — lowercased, the
    same canonical casing as the SURT key) and the host's most frequent
    templates surface with counts — the diagnosis view behind
    ``trap_signals``' verdicts (WHICH generated URL family is amplifying)
    and the shape of Common Crawl's published URL-pattern reports.

    Scale shape: template derivation is map-side string ops; the count
    fold shuffles (host, template) counters only; the top-k is a
    row_number window PARTITIONED BY HOST (parallelism = host count, the
    natural key of the report), never a global sort. Ties break on the
    template string for determinism.
    """
    _, host, path = split_url(F.col(url_col))
    tpl = F.lower(F.regexp_replace(path, "[0-9]+", "N"))
    counts = (
        df.select(host.alias("host"), tpl.alias("template"))
        .groupBy("host", "template")
        .agg(F.count("*").alias("n_urls"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(
        F.col("n_urls").desc(), F.col("template")
    )
    return (
        counts.select(
            "*", F.row_number().over(w).cast("int").alias("rank")
        ).where(F.col("rank") <= top_k)
    )


def robots_crawl_delays(
    robots: "DataFrame",
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> "DataFrame":
    """Per-host Crawl-delay from the User-agent:* group →
    ``(host, crawl_delay:double)``; hosts whose robots carry no (numeric)
    delay are absent — the consumer coalesces to its politeness default.
    Multiple delay lines fold to the MINIMUM (deterministic; also the
    conservative-crawler reading). Same star-group extraction and
    comment stripping as ``robots_rules_table``; same scale shape (pure
    string ops, one counters-only host fold).
    """
    star = F.regexp_extract(F.col(txt_col), _STAR_GROUP, 1)
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(star, "\n")).alias("raw"),
    )
    nc = F.trim(F.substring_index(F.col("raw"), "#", 1))
    key = F.lower(F.trim(F.substring_index(nc, ":", 1)))
    value = F.trim(F.substr(nc, F.instr(nc, ":") + 1))
    return (
        # try_cast: non-numeric delay values become NULL (dropped), they
        # must not fail the job under ANSI mode — robots in the wild
        # carry garbage
        lines.select("host", key.alias("key"), value.try_cast("double").alias("delay"))
        .where((F.col("key") == "crawl-delay") & F.col("delay").isNotNull())
        .groupBy("host")
        .agg(F.min("delay").alias("crawl_delay"))
    )


# --------------------------------------------------------------------------
# URL-level quality gate (the FineWeb/RefinedWeb URL-filtering pass):
# before a page is ever fetched, its URL alone carries spam signal —
# over-deep subdomains, digit-stuffed paths, parameter explosions, and
# blocklist words. Filtering at the URL beats filtering at the document:
# the fetch (the expensive step at 10^10 URLs) is what gets skipped. The
# reference gates URLs only by scheme/netloc validity and wiki namespace
# (components/crawler/services/, link_filters.py); this is the
# general-web quality layer beside it. Pure codegen column expressions —
# the gate runs inside the candidate-link projection, before the seen
# anti-join, adding zero exchanges to the round.
# --------------------------------------------------------------------------
URLQ_MAX_LEN = 200
URLQ_MAX_SUBDOMAIN_DEPTH = 3   # dots in host
URLQ_MAX_DIGIT_FRAC = 0.4      # digit chars / path chars
URLQ_MAX_PARAMS = 4
URLQ_BANNED_WORDS = ("casino", "viagra", "warez")
_URLQ_HOST_RE = "^[a-z]+://([^/?#]+)"
_URLQ_PATH_RE = "^[a-z]+://[^/?#]+([^?#]*)"
_URLQ_QUERY_RE = "\\?([^#]*)"


def url_quality(df, url: str = "url"):
    """Per-URL quality features + rule booleans + composite keep.

    Host/path/query are split by the same three regexes in both engines
    (Java ∩ RE2 dialect); character counts use length-after-replace so
    no per-char explode exists anywhere.
    """
    u = F.col(url)
    host = F.regexp_extract(u, _URLQ_HOST_RE, 1)
    path = F.regexp_extract(u, _URLQ_PATH_RE, 1)
    query = F.regexp_extract(u, _URLQ_QUERY_RE, 1)
    url_len = F.length(u)
    subdomain_depth = F.length(host) - F.length(F.replace(host, F.lit("."), F.lit("")))
    path_len = F.length(path)
    digit_chars = path_len - F.length(F.regexp_replace(path, "[0-9]", ""))
    digit_frac = digit_chars.cast("double") / F.greatest(path_len, F.lit(1)).cast(
        "double"
    )
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.length(query) - F.length(F.replace(query, F.lit("&"), F.lit(""))) + 1
    )
    banned = F.lit(False)
    for w in URLQ_BANNED_WORDS:
        banned = banned | u.contains(w)
    r_len = url_len <= URLQ_MAX_LEN
    r_subdomain = subdomain_depth <= URLQ_MAX_SUBDOMAIN_DEPTH
    r_digits = digit_frac <= URLQ_MAX_DIGIT_FRAC
    r_params = n_params <= URLQ_MAX_PARAMS
    r_banned = ~banned
    return df.select(
        u.alias("url"),
        host.alias("host"),
        url_len.alias("url_len"),
        subdomain_depth.alias("subdomain_depth"),
        F.round(digit_frac, 6).alias("digit_frac"),
        n_params.alias("n_params"),
        r_len.alias("r_len"),
        r_subdomain.alias("r_subdomain"),
        r_digits.alias("r_digits"),
        r_params.alias("r_params"),
        r_banned.alias("r_banned"),
        (r_len & r_subdomain & r_digits & r_params & r_banned).alias("keep"),
    )
