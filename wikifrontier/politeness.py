"""Politeness: per-host batch caps + skew-aware pop (SURVEY.md §2.9).

The reference enforces 1 req/s per crawler process via a @limits decorator
(components/crawler/core/http_fetcher.py:29-41) and paces dispatch at
75 URLs/s (dispatcher_prod.yml:6-9). In the batch-rounds model the
equivalent is: each round may fetch at most ``budget`` URLs overall (the
dispatch budget) and at most ``per_host_cap`` URLs per registered host (the
politeness budget).

Scale design: the global pop is a distributed top-k
(``orderBy(...).limit(n)`` → TakeOrderedAndProject: per-partition top-k then
a single merge — NO global sort of 10^10 pending rows). The per-host window
runs only on the already-popped batch (≤ budget rows), so the
single-dominant-host skew of a wiki crawl (en.wikipedia ≫ everything else)
never funnels the full frontier through one partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# deterministic pop order — stands in for the reference's autoincrement id
# FIFO (db_reader.py:53-77): rounds preserve insertion order across rounds,
# (depth, source, url) linearizes the racy within-round order (SURVEY §3.4).
POP_ORDER = ("scheduled_round", "depth", "source_page_url", "url")


def pop_frontier(pending: DataFrame, budget: int | None) -> DataFrame:
    """T1: global FIFO pop of up to ``budget`` URLs."""
    if budget is None:
        return pending
    return pending.orderBy(*POP_ORDER).limit(budget)


def in_degrees(edges: DataFrame) -> DataFrame:
    """(url, in_degree) over a discovered-edge table (one row per distinct
    (source_page_url, url) — frontier.CrawlState.link_graph shape). One
    keyed groupBy with map-side combine. This is the one-shot derivation;
    the round loop maintains the same numbers incrementally
    (CrawlState.in_degrees folds per-round deltas — VERDICT r4 #4)."""
    return edges.groupBy("url").agg(F.count("*").cast("long").alias("in_degree"))


def scored_pop(
    pending: DataFrame, scores: DataFrame, budget: int
) -> DataFrame:
    """Priority pop (north_rule: "priority queue (depth + link-score
    ordering)"): order by (depth asc, score desc, url), ``scores`` a
    (url, <score>) table — in-degree in the discovered link graph (the
    incremental CrawlState.in_degrees fold) or a periodic PageRank
    (linkgraph.pagerank). Popular pages jump the queue within their BFS
    layer. Plan shape: one keyed left join of pending against the score
    state, then the same distributed top-k as the FIFO pop
    (TakeOrderedAndProject — never a global sort). The full edge table
    never enters this plan.

    The FIFO `pop_frontier` stays the parity default (the reference pops
    in insertion order); this is the scored alternative a production
    crawl enables."""
    score_col = [c for c in scores.columns if c != "url"][0]
    s = scores.select("url", F.col(score_col).cast("double").alias("_score"))
    return (
        pending.join(s, "url", "left")
        .withColumn("_score", F.coalesce(F.col("_score"), F.lit(0.0)))
        .orderBy(F.col("depth"), F.col("_score").desc(), F.col("url"))
        .limit(budget)
        .drop("_score")
    )


def cap_per_host(batch: DataFrame, per_host_cap: int | None) -> DataFrame:
    """Keep at most per_host_cap rows per host, FIFO order within host."""
    if per_host_cap is None:
        return batch
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    w = Window.partitionBy(host).orderBy(*POP_ORDER)
    return (
        batch.withColumn("_hrn", F.row_number().over(w))
        .filter(F.col("_hrn") <= per_host_cap)
        .drop("_hrn")
    )


def portable_salt(url_col, salt_buckets: int = 64) -> F.Column:
    """Engine-portable salt key: value of the first two sha256 hex
    nibbles mod salt_buckets (the q33 nibble idiom — replayable verbatim
    in any SQL engine, unlike xxhash64). Marginally more expensive than
    xxhash64, so the default salt stays xxhash64; use this variant where
    an external system must reproduce the bucketing."""
    h = F.sha2(url_col, 256)
    n1 = F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - 1
    n2 = F.instr(F.lit("0123456789abcdef"), F.substring(h, 2, 1)) - 1
    return ((n1 * 16 + n2) % salt_buckets).cast("int")


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    salt_buckets: int = 64,
    salt_col: F.Column | None = None,
) -> DataFrame:
    """Spread a skewed single-host batch across executors:
    repartition on (host, xxhash64(url) % salt) — north_rule skew
    handling. ``salt_col`` overrides the salt expression (e.g.
    portable_salt for oracle-replayable bucketing)."""
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    salt = (
        salt_col
        if salt_col is not None
        else F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets))
    )
    return df.repartition(num_partitions, host, salt)


def host_state(pages: DataFrame, url_col: str = "url", ts_col: str = "last_crawled_at") -> DataFrame:
    """Per-host crawl state (SURVEY.md §1.4): last-fetch timestamp + fetch
    count per registered host — the batch-rounds analogue of the
    reference's per-worker rate-limit clock
    (components/crawler/core/http_fetcher.py:29-41). Derived view over the
    pages table; one shuffle on the host key."""
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    return pages.groupBy(host.alias("host")).agg(
        F.count("*").alias("n_fetched"),
        F.max(F.col(ts_col)).alias("last_fetch_at"),
        F.min(F.col(ts_col)).alias("first_fetch_at"),
    )


DEFAULT_PLAN_CAP = 25  # per-host per-round politeness allocation


def budget_plan(
    pending: DataFrame,
    per_host_cap: int = DEFAULT_PLAN_CAP,
    url_col: str = "url",
) -> DataFrame:
    """Per-host crawl-budget plan over the pending frontier — the
    capacity question a crawl operator asks before a run: with at most
    ``per_host_cap`` fetches per host per round (the politeness budget
    `cap_per_host` enforces), how many rounds until each host's queue
    drains, what does the next round allocate, and which host is the
    critical path (the drain bound for the whole crawl — the reference's
    en.wikipedia single-host skew is exactly a critical-host story,
    README.md:204-207).

    Scale shape: ONE counters-only groupBy on the host (map-side partial
    agg collapses URL rows to per-host counters before the exchange);
    the global drain bound is a 1-row broadcast. URLs never shuffle.
    """
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    per_host = pending.select(host.alias("host")).groupBy("host").agg(
        F.count("*").alias("n_pending")
    )
    plan = per_host.select(
        "host",
        "n_pending",
        F.least(F.col("n_pending"), F.lit(per_host_cap))
        .cast("long")
        .alias("next_round_alloc"),
        F.ceil(F.col("n_pending") / F.lit(float(per_host_cap)))
        .cast("long")
        .alias("rounds_to_drain"),
    )
    bound = plan.agg(F.max("rounds_to_drain").alias("drain_bound"))
    return plan.crossJoin(F.broadcast(bound)).select(
        "host",
        "n_pending",
        "next_round_alloc",
        "rounds_to_drain",
        "drain_bound",
        (F.col("rounds_to_drain") == F.col("drain_bound")).alias("is_critical"),
    )


# --- per-host fetch circuit breaker ---------------------------------------------
# Thresholds follow the standard breaker ladder: trip OPEN when failures
# dominate a host with enough evidence; HALF_OPEN (probe at reduced rate)
# when elevated; CLOSED otherwise. The reference retries per-URL
# (crawler_prod.yml download_retry) but has no host-level view at all — a
# host that 503s every request keeps soaking its politeness budget. At a
# 10^10 frontier, dead/hostile hosts are budget the scheduler must claw
# back between rounds.
BREAKER_OPEN_RATE = 0.5
BREAKER_HALF_RATE = 0.25
BREAKER_MIN_ATTEMPTS = 10


def host_circuit_breaker(
    attempts: DataFrame,
    host_col: str = "host",
    ok_col: str = "ok",
) -> DataFrame:
    """Per-host breaker state from a fetch-attempt relation
    ``(host, ok:boolean)`` → ``(host, n_attempts, n_failures,
    failure_rate, state)`` with state ∈ {'closed','half_open','open'}.

    The rate compares ROUNDED to 6 places (the repo's bit-stability rule
    for cross-engine threshold comparisons, same as
    textops.source_reputation). Hosts below BREAKER_MIN_ATTEMPTS stay
    closed regardless of rate — no tripping on one unlucky fetch.

    Scale shape: ONE counters-only host fold (attempt rows collapse
    map-side); the verdict is a codegen'd CASE over the counters. Feeds
    ``cap_per_host`` upstream: open hosts get cap 0, half-open a probe
    cap.
    """
    agg = attempts.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").alias("n_attempts"),
        F.sum(F.when(F.col(ok_col), 0).otherwise(1)).alias("n_failures"),
    )
    rate = F.round(
        F.col("n_failures").cast("double") / F.col("n_attempts"), 6
    )
    return agg.select(
        "host",
        "n_attempts",
        "n_failures",
        rate.alias("failure_rate"),
        F.when(
            (F.col("n_attempts") >= BREAKER_MIN_ATTEMPTS)
            & (rate >= BREAKER_OPEN_RATE),
            F.lit("open"),
        )
        .when(
            (F.col("n_attempts") >= BREAKER_MIN_ATTEMPTS)
            & (rate >= BREAKER_HALF_RATE),
            F.lit("half_open"),
        )
        .otherwise(F.lit("closed"))
        .alias("state"),
    )


# --- partition-skew planner ------------------------------------------------
SKEW_SALT_CAP = 50  # target max URLs per (host, salt) cell


def _hex1int(col: "F.Column") -> "F.Column":
    """First md5 hex digit of a string column as 0..15 — the
    engine-portable hash this repo uses wherever an oracle must replay a
    bucketing decision (xxhash64 has no DuckDB twin; md5 does)."""
    return F.instr(F.lit("0123456789abcdef"), F.substring(F.md5(col), 1, 1)) - 1


def skew_plan(
    pending: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    cap: int = SKEW_SALT_CAP,
) -> DataFrame:
    """Shard-load planner for the salted repartition (north rule: "domain
    skew handled with salted repartitioning") → one row per shard
    ``(shard, n_before, n_hosts_before, n_after, n_hosts_after)``.

    ``salted_repartition`` (above) APPLIES salting at runtime with
    xxhash64; this planner makes the decision auditable and
    oracle-replayable: per-host pending counts choose a salt factor
    ``greatest(1, ceil(n/cap))`` (capped at the 16 md5 buckets), then
    every URL is assigned a before-shard (hash of host alone — all of a
    dominant host's URLs collapse onto ONE shard) and an after-shard
    (hash of host#salt — the same URLs spread across salt_factor
    shards). The output's max(n_before) vs max(n_after) IS the skew
    story: en.wikipedia-style dominance flattens to ~cap-sized cells.

    Scale shape: one host-keyed count fold, one join of the per-URL set
    against the tiny per-host plan (O(hosts) rows — AQE broadcasts it),
    two O(16)-row shard folds joined full-outer. URLs never self-join;
    text never appears.
    """
    urls = pending.select(
        F.col(url_col).alias("url"), F.col(host_col).alias("host")
    )
    plan = urls.groupBy("host").agg(F.count("*").alias("n_pending")).select(
        "host",
        "n_pending",
        F.least(
            F.greatest(F.ceil(F.col("n_pending") / F.lit(cap)), F.lit(1)),
            F.lit(16),
        ).cast("int").alias("salt_factor"),
    )
    assigned = urls.join(plan, "host").select(
        F.substring(F.md5(F.col("host")), 1, 1).alias("shard_before"),
        F.substring(
            F.md5(
                F.concat_ws(
                    "#",
                    F.col("host"),
                    F.pmod(_hex1int(F.col("url")), F.col("salt_factor")).cast(
                        "string"
                    ),
                )
            ),
            1,
            1,
        ).alias("shard_after"),
    )
    before = assigned.groupBy(F.col("shard_before").alias("shard")).agg(
        F.count("*").alias("n_before"),
    )
    after = assigned.groupBy(F.col("shard_after").alias("shard")).agg(
        F.count("*").alias("n_after"),
    )
    return (
        before.join(after, "shard", "full_outer")
        .select(
            "shard",
            F.coalesce(F.col("n_before"), F.lit(0)).alias("n_before"),
            F.coalesce(F.col("n_after"), F.lit(0)).alias("n_after"),
        )
    )


# --- politeness compliance audit ---------------------------------------------
REQUIRED_GAP_S = 10  # default minimum inter-fetch gap per host (seconds)


def politeness_audit(
    fetch_log: DataFrame,
    required_gap_s: int = REQUIRED_GAP_S,
    host_col: str = "host",
    ts_col: str = "ts",
    url_col: str = "url",
    required_gaps: DataFrame | None = None,
) -> DataFrame:
    """Post-hoc per-host politeness compliance over a fetch log →
    ``(host, n_fetches, min_gap_s, n_violations, compliance_rate)``.

    The runtime side enforces the budget (cap_per_host + the q43
    stateful host-rate clock); this is the AUDIT a crawl operator runs
    over the recorded fetch timestamps afterwards — the evidence that
    the politeness contract actually held, per host, including across
    executor boundaries the runtime caps cannot see.

    ``required_gaps`` (optional): a (host, crawl_delay) table — e.g.
    ``filters.robots_crawl_delays`` output — overriding the flat
    ``required_gap_s`` default per host; hosts absent from it keep the
    default (a host's robots may declare no delay).

    Scale shape: one lag window PARTITIONED BY host ordered by
    (ts, url) — per-host work is independent, parallelism scales with
    host count; a host's own fetch history is politeness-capped so no
    single partition can be unbounded within an audit window. Then one
    counters-only host fold; the per-host requirement join is against
    the O(hosts) delay table (AQE broadcasts it). Timestamps are
    integer seconds (bigint), so gap arithmetic is exact in every
    engine.
    """
    w = Window.partitionBy(host_col).orderBy(ts_col, url_col)
    gaps = fetch_log.select(
        F.col(host_col).alias("host"),
        (F.col(ts_col) - F.lag(F.col(ts_col)).over(w)).alias("gap_s"),
    )
    if required_gaps is not None:
        delay_col = [c for c in required_gaps.columns if c != "host"][0]
        req = required_gaps.select(
            "host", F.col(delay_col).cast("double").alias("_req")
        )
        gaps = gaps.join(req, "host", "left")
        required = F.coalesce(F.col("_req"), F.lit(float(required_gap_s)))
    else:
        required = F.lit(float(required_gap_s))
    viol = F.when(F.col("gap_s") < required, 1).otherwise(0)
    return gaps.groupBy("host").agg(
        F.count("*").alias("n_fetches"),
        F.min("gap_s").alias("min_gap_s"),
        F.sum(viol).cast("int").alias("n_violations"),
        F.round(
            1.0
            - F.sum(viol) / F.greatest(F.count("gap_s"), F.lit(1)).cast("double"),
            6,
        ).alias("compliance_rate"),
    )


# --------------------------------------------------------------------------
# EWMA host health: exponentially-weighted latency and failure rate over
# each host's most recent fetches. The circuit breaker above votes on a
# whole retention window; production schedulers (and the politeness
# literature's adaptive-delay rules) want a RECENCY-weighted view — one
# slow probe an hour ago must not outvote ten fast fetches since. The
# window is capped (EWMA_WINDOW) so per-host state is O(1): exactly the
# bounded per-host accumulator a streaming checkpoint would carry.
#
# Determinism: decay is 1/2 — every weight 2^-j is a dyadic rational, and
# weighting a double by it only shifts the exponent (exact). The weighted
# sums are LEFT FOLDS over recency-ordered arrays (F.aggregate), never
# SUM() over a shuffled partition, so float addition order is fixed and
# the DuckDB oracle (list_reduce over the same ordered list) replays the
# arithmetic bit-for-bit at any parallelism.
# --------------------------------------------------------------------------
EWMA_WINDOW = 16          # most-recent fetches per host that carry weight
EWMA_FAIL_OPEN = 0.4      # recency-weighted failure rate → 'failing'
EWMA_SLOW_MS = 120.0      # recency-weighted latency → 'slow'


def host_ewma(
    fetches: DataFrame,
    host: str = "host",
    ts: str = "ts",
    seq: str = "seq",
    latency: str = "latency_ms",
    failed: str = "failed",
) -> DataFrame:
    """Per-host EWMA health → (host, n_events, n_window, ewma_latency_ms,
    ewma_fail_rate, verdict).

    One keyed window to rank recency (newest rn=1), one keyed fold over
    ≤EWMA_WINDOW rows per host. Weight of the rn-th newest is 2^-(rn-1);
    the mean divides by the closed-form weight total 2 - 2^-(n-1). Shape
    at 10^10 fetch events: a single shuffle on host; the fold state per
    host is 16 structs.
    """
    w_host = Window.partitionBy("host").orderBy(
        F.col("ts").desc(), F.col("seq").desc()
    )
    ranked = fetches.select(
        F.col(host).alias("host"),
        F.col(ts).alias("ts"),
        F.col(seq).alias("seq"),
        F.col(latency).cast("double").alias("lat"),
        F.col(failed).cast("double").alias("fail"),
    ).withColumn("rn", F.row_number().over(w_host))
    per_host = (
        ranked.groupBy("host")
        .agg(
            F.count("*").alias("n_events"),
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("rn") <= EWMA_WINDOW,
                        F.struct("rn", "lat", "fail"),
                    )
                )
            ).alias("win"),
        )
    )
    half = F.lit(0.5)

    def wfold(field):
        return F.aggregate(
            F.col("win"),
            F.lit(0.0),
            lambda acc, s: acc + s.getField(field) * F.pow(half, s.getField("rn") - 1),
        )

    nw = F.size(F.col("win"))
    denom = F.lit(2.0) - F.pow(half, nw - 1)
    ewma_lat = wfold("lat") / denom
    ewma_fail = wfold("fail") / denom
    return per_host.select(
        "host",
        "n_events",
        nw.alias("n_window"),
        F.round(ewma_lat, 6).alias("ewma_latency_ms"),
        F.round(ewma_fail, 6).alias("ewma_fail_rate"),
        F.when(ewma_fail > EWMA_FAIL_OPEN, F.lit("failing"))
        .when(ewma_lat > EWMA_SLOW_MS, F.lit("slow"))
        .otherwise(F.lit("healthy"))
        .alias("verdict"),
    )


# --------------------------------------------------------------------------
# Focused-crawl frontier ordering (Chakrabarti et al. 1999): pop by
# anchor-text topic relevance instead of FIFO — a crawler chasing a topic
# fetches the links whose anchor text matches the topic profile first,
# and expands shallow pages before deep ones at equal relevance. This is
# the third pop strategy beside FIFO (pop_frontier) and link-score
# (scored_pop); like them it is a per-host-capped distributed top-k
# (TakeOrderedAndProject), never a global sort of the frontier.
# --------------------------------------------------------------------------
FOCUS_TOPIC = ("spark", "query", "join", "data")
FOCUS_BUDGET = 100
FOCUS_HOST_CAP = 10


def focused_pop(
    cands: DataFrame,
    topic: tuple[str, ...] = FOCUS_TOPIC,
    budget: int = FOCUS_BUDGET,
    per_host_cap: int = FOCUS_HOST_CAP,
    anchor: str = "anchor_text",
) -> DataFrame:
    """(url, host, depth, anchor_text) candidates → the ≤budget batch a
    focused crawler dispatches this round, per-host-capped.

    relevance = topic-marker hits (with multiplicity) in the tokenized
    anchor text. Order: relevance desc, depth asc, url asc — fully
    deterministic. The host cap is the same keyed window politeness
    already pays; the final cut is orderBy+limit, which Spark executes
    as per-partition top-k.
    """
    from wikifrontier.textops import marker_hits, tokens

    scored = cands.select(
        "url",
        "host",
        "depth",
        marker_hits(tokens(F.col(anchor)), topic).alias("relevance"),
    )
    w_host = Window.partitionBy("host").orderBy(
        F.col("relevance").desc(), F.col("depth").asc(), F.col("url").asc()
    )
    capped = (
        scored.withColumn("host_rank", F.row_number().over(w_host))
        .filter(F.col("host_rank") <= per_host_cap)
        .drop("host_rank")
    )
    return capped.orderBy(
        F.col("relevance").desc(), F.col("depth").asc(), F.col("url").asc()
    ).limit(budget)


# --------------------------------------------------------------------------
# Rendezvous (highest-random-weight) host→shard assignment (Thaler &
# Ravishankar 1998): shard(host) = argmax_s md5(host#s). The property a
# crawl fleet needs: when a fetcher shard is added or removed, ONLY the
# hosts whose argmax involved that shard move — every other host keeps
# its assignment, so per-host politeness state stays where it is.
# Hash-range sharding (hash(host) % k) reshuffles ~every host on any k
# change. Pure column arithmetic: k md5 calls per host, an array_max,
# no shuffle beyond the final rollup.
# --------------------------------------------------------------------------
RENDEZVOUS_K = 8


def rendezvous_shard(host_col, k: int = RENDEZVOUS_K):
    """Column: the HRW shard id for a host."""
    choices = F.array(
        *[
            F.struct(
                F.md5(F.concat(host_col, F.lit(f"#{s}"))).alias("h"),
                F.lit(s).alias("s"),
            )
            for s in range(k)
        ]
    )
    return F.array_max(choices).getField("s")


def rendezvous_plan(
    hosts: DataFrame, host: str = "host", weight: str = "n_urls", k: int = RENDEZVOUS_K
) -> DataFrame:
    """Per-shard load rollup → (shard, n_hosts, n_urls): the capacity
    check an operator runs before (re)sizing the fetcher fleet."""
    return (
        hosts.select(
            rendezvous_shard(F.col(host), k).alias("shard"),
            F.col(weight).alias("w"),
        )
        .groupBy("shard")
        .agg(F.count("*").alias("n_hosts"), F.sum("w").alias("n_urls"))
    )
