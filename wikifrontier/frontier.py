"""The BFS-frontier round loop — SURVEY.md §3 end-to-end.

One reference RabbitMQ hop ≙ one DataFrame-to-DataFrame stage; one round of
this loop is the whole 3.1→3.3 cycle (pop → fetch-join → parse → filter →
dedup → claim → merge state), executed as one Spark job chain and
checkpointed at round end.

Scale design decisions (SURVEY.md §4.2):
* fetch is an equi-join frontier⋈web_pages on url — shuffle hash join; the
  corpus is bucketed by url hash in a real deployment so the frontier side
  is the only shuffle.
* the seen-set anti-join shuffles on url; runtime Bloom filter pre-prunes.
* the global pop is a distributed top-k, never a global sort.
* **state is append-only deltas, folded lazily.** Each round materializes
  only its own O(delta) outputs (claimed links, page events, parsed
  content); the accumulated pages/page_content tables are *views* — an
  aggregation over the event log — evaluated when read or durably
  checkpointed. The alternative (full-outer-merge rewrite of every state
  table per round, as the first cut did) is O(total-crawled) per round —
  quadratic over a crawl and unusable at a 10^10-URL frontier.
* metrics are DataFrame aggregates (accumulators are unreliable), computed
  from cached per-round intermediates — reference A6.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta
from zoneinfo import ZoneInfo

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wikifrontier import filters as flt
from wikifrontier import schemas
from wikifrontier.politeness import cap_per_host, pop_frontier
from wikifrontier.seen import BloomSeen, claim_first_wins, drop_seen
from wikifrontier.udfs import parse_page_udf

RECRAWL_INTERVAL_SECONDS = 691_200  # 8 days — crawler_prod.yml:26

# the reference's 6-way fetch-exception taxonomy, in declaration order
# (components/crawler/types/crawler_types.py:8-40)
ERROR_TYPES = (
    "HTTPError", "Timeout", "ConnectionError",
    "TooManyRedirects", "SSLError", "RequestException",
)
SKIPPED_ERROR_MESSAGE = "SKIPPED: robots.txt disallowed url at fetch time"

_FAILISH = ("FAILED", "SKIPPED")


def classify_fetch_error(url_col) -> F.Column:
    """Deterministic stand-in for the reference's exception classes: the
    failure class of a miss is a stable function of the url (first sha256
    nibble mod 6), so the corpus model exercises every error_type value
    the reference can emit (crawler_types.py:8-40) — and the derivation is
    portable to the DuckDB oracle verbatim."""
    nibble = (
        F.instr(F.lit("0123456789abcdef"), F.substring(F.sha2(url_col, 256), 1, 1))
        - 1
    )
    idx = (nibble % 6).cast("int")
    return F.element_at(F.array(*[F.lit(t) for t in ERROR_TYPES]), idx + 1)


@dataclass(frozen=True)
class CrawlConfig:
    max_depth: int = flt.MAX_DEPTH
    budget_per_round: int | None = None     # dispatch budget (T3); None = unbounded
    per_host_cap: int | None = None         # politeness cap (§2.9); None = unbounded
    max_rounds: int = 32
    robots_txt: str = ""
    allowed_domains: tuple[str, ...] = flt.ALLOWED_DOMAINS
    excluded_prefixes: tuple[str, ...] = flt.EXCLUDED_PREFIXES
    crawl_epoch: datetime = None  # type: ignore[assignment]
    # Durable round snapshots. REQUIRED on multi-executor clusters: without
    # it per-round state rests on localCheckpoint blocks whose lineage is
    # truncated — an executor loss makes them unrecoverable and the
    # accumulated tables grow as O(rounds) union chains. The checkpoint
    # doubles as event-log compaction, bounding both.
    checkpoint_dir: str | None = None
    # write the durable snapshot every K rounds (1 = every round). Larger
    # K amortizes the per-round fixed cost; recovery replays at most K-1
    # rounds. The final round always checkpoints.
    checkpoint_every: int = 1
    # keep the newest K committed round snapshots; older ones are pruned
    # after each commit so an unbounded crawl's checkpoint dir stays
    # O(K × state size), not O(rounds). 0 = never prune.
    checkpoint_keep_last: int = 2
    # every Nth durable snapshot is FULL (rewrites every state table);
    # the ones between are INCREMENTAL — append-only tables (seen, links,
    # link_graph, link_scores, metrics, invalid_rows) write only rows born
    # since the previous snapshot (a filter on their monotone round
    # column), and pages/page_content write only the event log since the
    # previous snapshot (merge-on-read: the loader folds base ⊕ events,
    # exactly Iceberg's MERGE-on-read delete/data-file split). At a 10^10
    # frontier this is THE durability knob: a full snapshot rewrites the
    # whole seen set every K rounds — O(crawl so far) parquet I/O per
    # checkpoint — while a delta writes O(round) rows. 1 = always full
    # (the pre-v3 layout).
    checkpoint_full_every: int = 8
    # in-MEMORY event-log compaction every K rounds (None = off): fold the
    # accumulated page/content events into localCheckpointed base tables.
    # Matters for LONG crawls without a durable checkpoint_dir whose state
    # is re-read every round — with enable_recrawl the rescheduler scans
    # state.pages at round start, so an uncompacted event log makes round
    # r pay an O(r)-deep fold (O(rounds²) overall). The crossover is real
    # but far out: at ≤10 rounds the lazy fold wins (measured 53 s vs
    # 95 s at sf0.1 — each compaction eagerly materializes four state
    # tables), so leave this off except for perpetual-recrawl round
    # counts. Durable checkpoints already compact; this is the lighter
    # knob when durability isn't needed — and it is a NO-OP whenever
    # checkpoint_dir is set, because a delta snapshot persists only the
    # events still in the log: folding them away between snapshots would
    # drop rows from the durable chain. Fold associativity is the same
    # combine_pages/_latest_content algebra the checkpoint path uses.
    compact_every: int | None = None
    collect_metrics: bool = True
    # Bloom pre-filter over the seen set (north_rule). None disables; the
    # default 2^22 bits ≈ 512 KiB holds ~400k URLs at <1% fp — size it to
    # ~10 bits/URL for the target frontier (10^10 URLs → ~12 GiB total).
    bloom_bits: int | None = 1 << 22
    # shard count of the partitioned filter (power of two). The default
    # keeps bitmap bytes off the driver entirely (seen.
    # PartitionedBloomSeen) and bounds add_df's shuffle parallelism, so
    # size it >= the executor-core count; 0/None selects the legacy
    # single driver bitmap — viable only while bloom_bits stays
    # broadcast-small.
    bloom_buckets: int | None = 64
    # shard-file directory of the partitioned filter. REQUIRED on a
    # multi-node cluster (a DFS/NFS/object-store mount visible to every
    # executor — the same contract as any Spark checkpoint location);
    # None falls back to a driver-local tempdir, correct only in
    # local[*] mode (ADVICE r2 #1).
    bloom_storage_dir: str | None = None
    # explicit skew spread of the popped batch across executors
    # (politeness.salted_repartition) — worthwhile when one registered
    # domain dominates the frontier (the wiki-crawl case); None leaves
    # partitioning to AQE.
    salt_partitions: int | None = None
    # rescheduler (S7/A5): re-enqueue pages past next_crawl_at at round
    # start. Off for parity runs — the reference's recrawl horizon is 8
    # days and the test corpus is static. With recrawl on, the loop runs
    # exactly max_rounds rounds (a crawled page always becomes due again
    # after recrawl_interval_s, so "frontier drained" is never terminal —
    # the reference rescheduler likewise loops forever,
    # rescheduler_service.py:36-71).
    enable_recrawl: bool = False
    # recrawl horizon (reference crawler_prod.yml:26 — 8 days). One round
    # advances the crawl clock by 1 s, so a page crawled in round r is
    # due again in round r + recrawl_interval_s + 1.
    recrawl_interval_s: int = RECRAWL_INTERVAL_SECONDS
    # bounded retry of FAILED fetches (reference download_retry, 2 attempts
    # + grace, crawler_service.py:157-190): a miss is re-enqueued for the
    # next round until it has failed 1 + fetch_retries times. 0 = off
    # (reference parity: its retry lives inside the HTTP call, invisible
    # to a deterministic corpus).
    fetch_retries: int = 0
    # fetch-join strategy (SURVEY §4.2):
    #   "broadcast" — always broadcast the popped url batch (fastest while
    #       the batch fits; the round-1 behavior);
    #   "bucketed"  — never broadcast: shuffle-hash join against a corpus
    #       pre-partitioned on url, so only the frontier side moves and
    #       html is neither broadcast, shuffled, nor sorted;
    #   "auto"      — broadcast below `broadcast_row_limit` popped rows,
    #       bucketed above it. This is the size-gated fallback a 10^10-URL
    #       frontier needs: a BFS layer of tens of millions of URLs would
    #       blow the 8 GB broadcast cap (and driver heap first).
    fetch_strategy: str = "auto"
    broadcast_row_limit: int = 4_000_000
    # frontier pop order (north_star: "priority queue (depth + link-score
    # ordering)"):
    #   "fifo"     — insertion order (scheduled_round, depth, source, url);
    #       the parity default — reproduces the reference's autoincrement
    #       FIFO visit order exactly (db_reader.py:53-77).
    #   "scored"   — politeness.scored_pop: (depth asc, in-degree desc,
    #       url), in-degree over the FULL discovered link graph
    #       (state.link_graph — every distinct (source, url) pair, not the
    #       claim tree), maintained incrementally as per-round deltas so
    #       the pop never re-aggregates the whole edge table. Same
    #       distributed top-k plan shape (TakeOrderedAndProject); changes
    #       visit ORDER within a layer, never the crawled SET of an
    #       exhaustive crawl.
    #   "pagerank" — same pop, scored by linkgraph.pagerank over the
    #       discovered graph, recomputed every `score_refresh_every`
    #       rounds (the periodic full-graph refresh a production crawl
    #       runs; Cho/Garcia-Molina/Page URL-ordering).
    # "scored"/"pagerank" REQUIRE budget_per_round: an unbounded pop takes
    # every pending row, so priority ordering would silently be a no-op
    # (validated in run_round — ADVICE r4 #3).
    pop_strategy: str = "fifo"
    # pagerank-score refresh period, in rounds
    score_refresh_every: int = 4
    # partition count of the bucketed corpus layout; None → the session's
    # spark.sql.shuffle.partitions
    corpus_buckets: int | None = None

    def __post_init__(self):
        if self.crawl_epoch is None:
            object.__setattr__(
                self,
                "crawl_epoch",
                datetime(2025, 8, 15, 12, 0, 0, tzinfo=ZoneInfo("America/New_York")),
            )


@dataclass
class CrawlState:
    """Crawl state. `pages` / `page_content` are *views*: the base table
    from the last durable checkpoint (or empty) combined with the
    append-only event log accumulated since (`page_events` /
    `content_events`, both None right after a checkpoint load)."""

    round: int
    pending: DataFrame
    seen: DataFrame
    links: DataFrame
    metrics: DataFrame
    pages_base: DataFrame
    content_base: DataFrame
    invalid_rows: DataFrame = None  # type: ignore[assignment] — set by init/load
    retries: DataFrame = None  # type: ignore[assignment] — set by init/load
    # full discovered link graph: distinct (source_page_url, url) over the
    # validity+filter-passed candidates of every round — INCLUDING edges
    # whose target was already seen, so in-degree is a real signal
    # (ADVICE r4 #1; the claim-tree `links` above has in-degree ≤ 1 by
    # construction). Deltas are lazy localCheckpoints: a FIFO crawl that
    # never reads the graph never computes it.
    link_graph: DataFrame = None  # type: ignore[assignment] — set by init/load
    # incremental priority state: unfolded (url, in_degree) delta rows,
    # one batch per round; `in_degrees` folds them. Compaction/checkpoint
    # collapse to one row per url.
    link_scores: DataFrame = None  # type: ignore[assignment] — set by init/load
    page_events: DataFrame | None = None
    content_events: DataFrame | None = None
    # cached pagerank scores (pop_strategy="pagerank") + the round they
    # were computed at; refreshed every CrawlConfig.score_refresh_every
    rank_scores: DataFrame | None = None
    rank_scored_round: int = -1
    bloom: object | None = None  # BloomSeen | PartitionedBloomSeen
    # True until a durable checkpoint backs the base tables: lets the
    # views skip the full-outer join against a provably-empty base (one
    # whole shuffle+join off the hot fold on never-checkpointed crawls)
    bases_empty: bool = True
    # exact |pending| carried from the previous round when the loop can
    # prove it (unbounded, no recrawl/retry): saves the auto fetch-gate's
    # per-round count() job
    pending_rows_hint: int | None = None

    @property
    def pages(self) -> DataFrame:
        if self.bases_empty and self.page_events is not None:
            return fold_pages_insert(self.page_events)
        return combine_pages(self.pages_base, self.page_events)

    @property
    def page_content(self) -> DataFrame:
        if self.bases_empty and self.content_events is not None:
            return _latest_content(self.content_events)
        return combine_content(self.content_base, self.content_events)

    @property
    def in_degrees(self) -> DataFrame:
        """(url, in_degree) over the discovered link graph — the scored
        pop's priority key, folded from the per-round delta log (never a
        re-aggregation of the full edge table)."""
        return self.link_scores.groupBy("url").agg(
            F.sum("in_degree").cast("long").alias("in_degree")
        )

    def folded_scores(self) -> DataFrame:
        """The score log collapsed to one row per url, stamped with the
        last completed round — the compaction/checkpoint form. The stamp
        keeps the round column monotone: rows folded at round R carry
        R-1, and every later per-round delta carries its own rnd ≥ R, so
        an incremental snapshot's `scored_round >= R` filter never
        re-writes folded history."""
        return self.in_degrees.withColumn(
            "scored_round", F.lit(max(self.round - 1, 0)).cast("int")
        )

    def tables(self) -> dict[str, DataFrame]:
        return {
            "pending": self.pending,
            "seen": self.seen,
            "pages": self.pages,
            "page_content": self.page_content,
            "links": self.links,
            "link_graph": self.link_graph,
            # persist the FOLDED score state (one row per url) — same
            # schema as the delta log it replaces on reload
            "link_scores": self.folded_scores(),
            "metrics": self.metrics,
            "invalid_rows": self.invalid_rows,
            "retries": self.retries,
        }


def init_state(spark: SparkSession, seeds: list[str]) -> CrawlState:
    """S8/S9 — seed the frontier when state is empty
    (dispatcher/services/dispatching_service.py:82-97, depth=0)."""
    pending = spark.createDataFrame(
        [(u, 0, 0, "") for u in seeds],
        schemas.ddl_to_schema(schemas.FRONTIER_DDL),
    )
    return CrawlState(
        round=0,
        pending=pending,
        seen=schemas.empty_df(spark, schemas.SEEN_DDL),
        links=schemas.empty_df(spark, schemas.LINKS_DDL),
        metrics=schemas.empty_df(spark, schemas.METRICS_DDL),
        pages_base=schemas.empty_df(spark, schemas.PAGES_DDL),
        content_base=schemas.empty_df(spark, schemas.PAGE_CONTENT_DDL),
        invalid_rows=schemas.empty_df(spark, schemas.INVALID_DDL),
        retries=schemas.empty_df(spark, schemas.RETRIES_DDL),
        link_graph=schemas.empty_df(spark, schemas.LINK_GRAPH_DDL),
        link_scores=schemas.empty_df(spark, schemas.LINK_SCORES_DDL),
    )


# --------------------------------------------------------------------------
# A1 — page-metadata upsert (db_writer.py:42-102) over the event log.
#
# Exact quirks reproduced: INSERT sets total=1, failed=0 regardless of
# status (the first event never counts as failed); conflict UPDATE
# overwrites status/http/html_hash/timestamps/error (including with NULLs)
# but NOT url_hash / compressed_filepath; failed_attempts += 1 only when
# the update's status ∈ {FAILED, SKIPPED}; depth keeps the minimum.
# --------------------------------------------------------------------------
def _fold_page_events(events: DataFrame) -> DataFrame:
    """Aggregate the per-round event log to one row per url, plus the
    associativity helpers needed to combine with an older base table."""
    failed_cond = F.col("last_crawl_status").isin(*_FAILISH).cast("int")
    return events.groupBy("url").agg(
        F.max_by("last_crawl_status", "_round").alias("last_crawl_status"),
        F.max_by("http_status_code", "_round").alias("http_status_code"),
        F.min_by("url_hash", "_round").alias("url_hash"),
        F.max_by("html_content_hash", "_round").alias("html_content_hash"),
        F.min_by("compressed_filepath", "_round").alias("compressed_filepath"),
        F.max_by("last_crawled_at", "_round").alias("last_crawled_at"),
        F.max_by("next_crawl_at", "_round").alias("next_crawl_at"),
        F.count("*").cast("int").alias("_n_events"),
        F.sum(failed_cond).cast("int").alias("_n_failed_total"),
        F.min_by(failed_cond, "_round").cast("int").alias("_first_failed"),
        F.max_by("last_error_seen", "_round").alias("last_error_seen"),
        F.min("depth").alias("depth"),
        F.min("_round").cast("int").alias("_first_round"),
    )


def fold_pages_insert(events: DataFrame) -> DataFrame:
    """A1 fold when every row is an INSERT (no pre-existing base): the
    same result combine_pages produces against an empty base, without the
    full-outer join — the first event never counts as failed."""
    agg = _fold_page_events(events)
    return agg.select(
        "url",
        "last_crawl_status",
        "http_status_code",
        "url_hash",
        "html_content_hash",
        "compressed_filepath",
        "last_crawled_at",
        "next_crawl_at",
        F.col("_n_events").cast("int").alias("total_crawl_attempts"),
        (F.col("_n_failed_total") - F.col("_first_failed"))
        .cast("int")
        .alias("failed_crawl_attempts"),
        "last_error_seen",
        "depth",
        F.col("_first_round").alias("first_crawled_round"),
    )


def _latest_content(events: DataFrame) -> DataFrame:
    """A3 last-write-wins fold of the content event log."""
    return events.groupBy("source_page_url").agg(
        F.max_by("title", "_round").alias("title"),
        F.max_by("categories", "_round").alias("categories"),
        F.max_by("text_content", "_round").alias("text_content"),
        F.max_by("text_content_hash", "_round").alias("text_content_hash"),
        F.max_by("parsed_at", "_round").alias("parsed_at"),
    )


def combine_pages(base: DataFrame, events: DataFrame | None) -> DataFrame:
    """base pages table ⊕ event log → current pages table (lazy)."""
    if events is None:
        return base
    agg = _fold_page_events(events)
    o, n = base.alias("o"), agg.alias("n")
    o_present = F.col("o.last_crawl_status").isNotNull()
    n_present = F.col("n.last_crawl_status").isNotNull()

    def upd(col):  # last event wins (NULLs overwrite — reference parity)
        return F.when(n_present, F.col(f"n.{col}")).otherwise(F.col(f"o.{col}"))

    def ins_only(col):  # set at first sight, never overwritten
        return F.when(o_present, F.col(f"o.{col}")).otherwise(F.col(f"n.{col}"))

    return o.join(n, F.col("o.url") == F.col("n.url"), "full_outer").select(
        F.coalesce(F.col("o.url"), F.col("n.url")).alias("url"),
        upd("last_crawl_status").alias("last_crawl_status"),
        upd("http_status_code").alias("http_status_code"),
        ins_only("url_hash").alias("url_hash"),
        upd("html_content_hash").alias("html_content_hash"),
        ins_only("compressed_filepath").alias("compressed_filepath"),
        upd("last_crawled_at").alias("last_crawled_at"),
        upd("next_crawl_at").alias("next_crawl_at"),
        (
            F.coalesce(F.col("o.total_crawl_attempts"), F.lit(0))
            + F.coalesce(F.col("n._n_events"), F.lit(0))
        ).cast("int").alias("total_crawl_attempts"),
        (
            F.coalesce(F.col("o.failed_crawl_attempts"), F.lit(0))
            # events merging into an existing row are all "updates";
            # otherwise the first event is the INSERT and never counts
            + F.when(
                o_present, F.coalesce(F.col("n._n_failed_total"), F.lit(0))
            ).otherwise(
                F.coalesce(F.col("n._n_failed_total"), F.lit(0))
                - F.coalesce(F.col("n._first_failed"), F.lit(0))
            )
        ).cast("int").alias("failed_crawl_attempts"),
        upd("last_error_seen").alias("last_error_seen"),
        F.least(F.col("o.depth"), F.col("n.depth")).alias("depth"),
        F.coalesce(F.col("o.first_crawled_round"), F.col("n._first_round")).alias(
            "first_crawled_round"
        ),
    )


def combine_content(base: DataFrame, events: DataFrame | None) -> DataFrame:
    """A3 — db_writer.py:164-217: last-write-wins upsert on
    source_page_url, over the parsed-content event log."""
    if events is None:
        return base
    latest = _latest_content(events)
    kept = base.join(latest.select("source_page_url"), "source_page_url", "left_anti")
    return kept.unionByName(latest)


# legacy name used by driver query q08 — the one-shot merge IS operator A1
def _merge_pages(pages: DataFrame, updates: DataFrame) -> DataFrame:
    """A1 as a single-round full-outer merge (one update row per url)."""
    events = updates.withColumn("_round", F.lit(0))
    return combine_pages(pages, events)


def recrawl_due(state: CrawlState, now: datetime) -> DataFrame:
    """S7/A5 — the rescheduler scan (db_reader.py:109-151, rescheduler
    loop rescheduler_service.py:36-71): pages whose next_crawl_at has
    passed, with depth recovered from the link graph (min per url;
    coalesce 0 for seeds). Replicates the reference's *effective*
    predicate — its `is not None` identity check (db_reader.py:138) is
    always true, so only `next_crawl_at < now` filters.

    Returns rows in frontier schema, ready to union into pending when
    `CrawlConfig.enable_recrawl` is set (off for parity runs — the corpus
    is static)."""
    due = state.pages.filter(F.col("next_crawl_at") < F.lit(now)).select("url")
    depths = state.links.groupBy("url").agg(F.min("depth").alias("link_depth"))
    return (
        due.join(depths, "url", "left")
        .select(
            "url",
            F.coalesce(F.col("link_depth"), F.lit(0)).cast("int").alias("depth"),
            F.lit(state.round).cast("int").alias("scheduled_round"),
            F.lit("").alias("source_page_url"),
        )
    )


def bucket_corpus(corpus: DataFrame, buckets: int) -> DataFrame:
    """The bucketed corpus layout (SURVEY §4.2): hash-partitioned on url.

    Persist the result before a multi-round crawl so the html payload is
    laid out once; every later fetch join then reuses the partitioning —
    EnsureRequirements sees hashpartitioning(url, buckets) on the corpus
    scan and inserts an exchange only on the (url,depth) frontier side.
    On a real deployment this is the Iceberg table's bucket(url) layout;
    localCheckpoint-free `repartition` is its in-session equivalent."""
    return corpus.select("url", "html").repartition(buckets, "url")


def _executor_count(spark: SparkSession) -> int:
    """Executor JVM count for the broadcast-cost gate — PUBLIC API only
    (ADVICE r3 #4 replaced the private `_jsc...getExecutorMemoryStatus()`
    call): `statusTracker().getExecutorInfos()` lists driver + executors.

    Before executors register (dynamic allocation warm-up) the tracker
    reports only the driver; rather than letting the divisor collapse to
    1 — which would let a large batch broadcast cluster-wide — clamp to
    the count implied by the configured `spark.executor.instances` when
    that is set. Any tracker failure degrades to the conservative
    configured value (or 1 in local mode, where broadcast is correct)."""
    configured = 0
    try:
        configured = int(spark.conf.get("spark.executor.instances", "0") or 0)
    except Exception:
        pass
    try:
        # local[*] reports exactly one entry (the driver doubles as the
        # executor) → count 1; cluster mode reports driver + N → N.
        registered = len(spark.sparkContext.statusTracker().getExecutorInfos())
        live = max(1, registered - 1) if registered > 1 else 1
    except Exception:
        live = 1
    return max(live, configured, 1)


def _fetch_join(batch: DataFrame, corpus: DataFrame, use_broadcast: bool):
    """S2 fetch: frontier batch ⋈ corpus on url. Both shapes keep html in
    place — the broadcast shape ships only urls to the corpus, the
    bucketed shape shuffle-hash-joins with the batch as build side (a
    sort-merge join here would SORT the html payload: observed 11×
    blowup at 500k pages)."""
    if use_broadcast:
        return F.broadcast(batch).join(corpus.select("url", "html"), "url", "inner")
    return batch.hint("SHUFFLE_HASH").join(corpus.select("url", "html"), "url", "inner")


def run_round(
    spark: SparkSession,
    state: CrawlState,
    corpus: DataFrame,
    cfg: CrawlConfig,
    corpus_bucketed: DataFrame | None = None,
) -> tuple[CrawlState, dict]:
    """Execute one BFS round; returns (new_state, round_counters).

    Only O(round-delta) data is materialized (localCheckpoint): the fetch
    outcome events, the parsed-content events, and the claimed links. The
    accumulated tables grow as lazy unions over those checkpointed leaves.
    """
    rnd = state.round
    round_ts = cfg.crawl_epoch + timedelta(seconds=rnd)
    next_crawl_ts = round_ts + timedelta(seconds=cfg.recrawl_interval_s)
    robots_rules = flt.parse_robots(cfg.robots_txt)
    unbounded = cfg.budget_per_round is None and cfg.per_host_cap is None

    # --- S7 rescheduler (optional) ----------------------------------------
    pending = state.pending
    if cfg.enable_recrawl:
        due = recrawl_due(state, round_ts).join(
            pending.select("url"), "url", "left_anti"
        )
        pending = pending.unionByName(due)

    # --- T1/T3 pop + §2.9 politeness -------------------------------------
    rank_scores, rank_scored_round = state.rank_scores, state.rank_scored_round
    if cfg.pop_strategy not in ("fifo", "scored", "pagerank"):
        raise ValueError(
            f"unknown pop_strategy {cfg.pop_strategy!r} — expected "
            "'fifo', 'scored' or 'pagerank'"
        )
    if cfg.pop_strategy != "fifo":
        if cfg.budget_per_round is None:
            raise ValueError(
                f"pop_strategy={cfg.pop_strategy!r} requires "
                "budget_per_round: an unbounded pop takes every pending "
                "row, so priority ordering would be a silent no-op"
            )
        from wikifrontier.politeness import scored_pop

        if cfg.pop_strategy == "pagerank":
            if (
                rank_scores is None
                or rnd - rank_scored_round >= cfg.score_refresh_every
            ):
                from wikifrontier.linkgraph import pagerank

                pr = pagerank(
                    state.link_graph.select(
                        F.col("source_page_url").alias("src"),
                        F.col("url").alias("dst"),
                    )
                )
                rank_scores = pr.select(
                    F.col("id").alias("url"), F.col("pr").alias("score")
                ).localCheckpoint(eager=False)
                rank_scored_round = rnd
            batch = scored_pop(pending, rank_scores, cfg.budget_per_round)
        else:
            # incremental in-degree state: the fold below reads the
            # per-round (url, d) delta log, never the edge table itself
            batch = scored_pop(pending, state.in_degrees, cfg.budget_per_round)
    else:
        batch = pop_frontier(pending, cfg.budget_per_round)
    popped = cap_per_host(batch, cfg.per_host_cap)
    if cfg.salt_partitions is not None:
        from wikifrontier.politeness import salted_repartition

        popped = salted_repartition(popped, cfg.salt_partitions)
    if (
        cfg.budget_per_round is not None
        or cfg.per_host_cap is not None
        or cfg.salt_partitions is not None
        or cfg.enable_recrawl
    ):
        # the pop/cap windows (and the recrawl fold over the whole event
        # log) feed both the fetch join and the miss anti-join below —
        # materialize once instead of re-running them per consumer
        popped = popped.localCheckpoint(eager=True)
    batch = popped.select("url", "depth")

    # --- fetch-time robots check → SKIPPED (crawl_status.py:4-7) ----------
    # The scheduler filters robots-denied *links* before they are ever
    # queued, but seeds and recrawls reach the fetcher unfiltered — the
    # reference declines those at fetch time and records SKIPPED. Same
    # here: denied rows bypass the fetch join entirely.
    skipped = None
    if robots_rules:
        _, _, bpath = flt.split_url(F.col("url"))
        denied = flt.robots_denied_expr(bpath, robots_rules)
        skipped = batch.filter(denied).select(
            "url", "depth", F.lit("SKIPPED").alias("_status")
        )
        batch = batch.filter(~denied)

    # --- S2 fetch + X1–X7 parse: ONE pass, html never moves ---------------
    # Strategy gate (ADVICE r1 #1): a plain LEFT JOIN would sort-merge the
    # html payload, and an *unconditional* broadcast of the batch dies at
    # 100 TB scale when a BFS layer outgrows the 8 GB broadcast cap. So:
    # broadcast the url-only batch while it is provably small, otherwise
    # shuffle-hash join against the bucketed corpus layout — either way
    # the corpus html is never broadcast, shuffled, or sorted.
    if cfg.fetch_strategy == "broadcast":
        use_broadcast = True
    elif cfg.fetch_strategy == "bucketed":
        use_broadcast = False
    else:
        # auto: broadcast cost is rows × executors (every executor JVM
        # deserializes its own copy of the batch), so the row limit is
        # scaled down by the executor count — measured on local-cluster
        # 4×8 the broadcast fetch is 26% slower than the bucketed join at
        # 1M popped rows, while single-JVM local[*] prefers broadcast to
        # 4M+ (BASELINE.md round-3 attribution). local[*] → divisor 1.
        limit = cfg.broadcast_row_limit // _executor_count(spark)
        if cfg.budget_per_round is not None and cfg.budget_per_round <= limit:
            # auto, budgeted: the pop caps the batch below the limit a priori
            use_broadcast = True
        elif state.pending_rows_hint is not None:
            # auto, unbounded: last round's claim count IS |pending| (free
            # statistic from the bloom build — no count() job)
            use_broadcast = state.pending_rows_hint <= limit
        else:  # auto: count the popped batch (cheap — popped/pending are
            # materialized leaves) and gate on the configured row limit
            use_broadcast = popped.count() <= limit
    if use_broadcast:
        fetch_corpus = corpus
    elif corpus_bucketed is not None:
        fetch_corpus = corpus_bucketed
    else:
        # caller didn't pre-bucket: correct but re-shuffles html this
        # round — run_crawl always passes a persisted bucketed layout
        fetch_corpus = bucket_corpus(
            corpus, cfg.corpus_buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
        )
    hits = (
        _fetch_join(batch, fetch_corpus, use_broadcast)
        .select(
            "url",
            "depth",
            F.lit("SUCCESS").alias("_status"),
            F.sha2(F.col("html"), 256).alias("_html_hash"),
            parse_page_udf(F.col("url"), F.col("html"), F.col("depth")).alias("p"),
        )
        .localCheckpoint(eager=True)
    )
    miss_probe = (
        F.broadcast(hits.select("url")) if use_broadcast else hits.select("url")
    )
    missed = batch.join(miss_probe, "url", "left_anti").select(
        "url", "depth", F.lit("FAILED").alias("_status")
    )
    if skipped is not None:
        missed = missed.unionByName(skipped)
    p_type = hits.schema["p"].dataType
    round_result = hits.unionByName(
        missed.select(
            "url",
            "depth",
            "_status",
            F.lit(None).cast("string").alias("_html_hash"),
            F.lit(None).cast(p_type).alias("p"),
        )
    )

    # --- A1 page events (delta only; fold happens lazily in .pages) -------
    ok = F.col("_status") == "SUCCESS"
    page_events_delta = round_result.select(
        "url",
        F.col("_status").alias("last_crawl_status"),
        F.when(ok, F.lit(200)).cast("int").alias("http_status_code"),
        F.sha2(F.col("url"), 256).alias("url_hash"),
        F.col("_html_hash").alias("html_content_hash"),
        F.when(
            ok,
            F.concat(F.lit("/data/html/"), F.sha2(F.col("url"), 256), F.lit(".html.gz")),
        ).alias("compressed_filepath"),
        F.lit(round_ts).alias("last_crawled_at"),
        F.when(ok, F.lit(next_crawl_ts)).alias("next_crawl_at"),
        F.when(
            F.col("_status") == "FAILED",
            F.concat(classify_fetch_error(F.col("url")), F.lit(": request failed")),
        )
        .when(F.col("_status") == "SKIPPED", F.lit(SKIPPED_ERROR_MESSAGE))
        .alias("last_error_seen"),
        F.col("depth"),
        F.lit(rnd).cast("int").alias("_round"),
    )

    parsed = round_result.filter(ok)
    content_events_delta = parsed.select(
        F.col("url").alias("source_page_url"),
        F.col("p.title").alias("title"),
        F.col("p.categories").alias("categories"),
        F.col("p.text_content").alias("text_content"),
        F.col("p.text_content_hash").alias("text_content_hash"),
        F.lit(round_ts).alias("parsed_at"),
        F.lit(rnd).cast("int").alias("_round"),
    )

    # --- §3.3 schedule: explode → S1/P7 gate → D1 → F1-F5 → D2 claim ------
    candidates = parsed.select(F.explode("p.links").alias("l")).select("l.*")

    # S1/P7 — message validity gate ahead of dedup/filtering (the
    # reference rejects malformed messages at queue consume, before any
    # scheduler logic). Rejects accumulate in the invalid_rows DLQ table
    # as a *lazy* delta over the checkpointed fetch leaf — zero cost per
    # round until the DLQ is read or durably checkpointed.
    vreason = flt.validity_reason(F.col("url"), F.col("depth"))
    invalid_delta = candidates.filter(vreason.isNotNull()).select(
        "url",
        "depth",
        "source_page_url",
        vreason.alias("reject_reason"),
        F.lit(rnd).cast("int").alias("rejected_round"),
    )
    new_invalid = state.invalid_rows.unionByName(invalid_delta)
    candidates = candidates.filter(vreason.isNull())
    reason_col = flt.filter_reason(
        F.col("url"),
        F.col("depth"),
        max_depth=cfg.max_depth,
        allowed_domains=cfg.allowed_domains,
        excluded_prefixes=cfg.excluded_prefixes,
        robots_rules=robots_rules,
    )

    if cfg.collect_metrics:
        # reference operator order (D1 → F → D2,
        # schedule_service.py:66-112) so per-filter counters attribute
        # exactly as the reference's Prometheus labels do
        candidates = candidates.persist()
        unseen = (
            drop_seen(candidates, state.seen, state.bloom, spark)
            .withColumn("_reason", reason_col)
            .persist()
        )
        claimed = claim_first_wins(
            unseen.filter(F.col("_reason").isNull())
        ).localCheckpoint(eager=True)
        # ONE driver action for all round counters (was 4 jobs: an
        # agg-collect, two counts, and a groupBy-collect): tag each frame
        # with (src, k) and count in a single grouped aggregate. The
        # partial agg collapses every partition to a handful of (src, k)
        # rows before the shuffle. This MUST run here — before
        # bloom.add_df() below mutates the shard files — because a cache
        # miss on `unseen` would recompute drop_seen against the grown
        # bloom and skew the dedup/filter counters (observed as
        # links_dedup_dropped drift when the tally ran post-fold).
        tag = lambda df, src, k: df.select(  # noqa: E731
            F.lit(src).alias("src"), k.alias("k")
        )
        metric_tallies = (
            tag(round_result, "fetch", F.col("_status"))
            .unionByName(tag(candidates, "cand", F.lit(None).cast("string")))
            .unionByName(tag(unseen, "unseen", F.col("_reason")))
            .unionByName(tag(claimed, "claim", F.lit(None).cast("string")))
            .groupBy("src", "k")
            .count()
            .collect()
        )
    else:
        metric_tallies = None
        # fast path: F → D2 → D1. The claimed/link/seen/frontier STATE is
        # identical (seen-dedup removes whole urls; the claim picks
        # within-url winners — the two commute), but the anti-join now
        # probes only ~|winners| rows instead of every candidate, and the
        # claim's url-shuffle is the single wide stage of the phase.
        unseen = None
        winners = claim_first_wins(
            candidates.withColumn("_reason", reason_col)
            .filter(F.col("_reason").isNull())
        ).localCheckpoint(eager=True)  # materialize BEFORE the bloom split —
        # drop_seen's two branches each rescan their input, and rescanning
        # the window subtree would double the round's widest stage
        claimed = drop_seen(
            winners, state.seen, state.bloom, spark
        ).localCheckpoint(eager=True)

    n_claimed_hint = None
    if state.bloom is not None:
        # incrementally fold the round's claims into the persistent filter
        # (probe plans above already materialized against the old snapshot)
        n_claimed_hint = state.bloom.add_df(spark, claimed.select("url"))

    # --- full link-graph delta (ADVICE r4 #1) ------------------------------
    # Every distinct (source, url) pair among the validity+filter-passed
    # candidates — PRE-seen and PRE-claim, so edges into already-crawled
    # pages are kept and in-degree is a real priority signal (the
    # claim-tree `links` table keeps reference parity; this is the edge
    # relation its composite PK was built for, models.py:108-155). Lazy
    # localCheckpoint: nothing is computed until the graph or the score
    # fold is actually read (scored pop / pagerank refresh / checkpoint /
    # linkrank) — a FIFO crawl pays zero for this.
    edge_delta = (
        candidates.filter(reason_col.isNull())
        .select(
            "source_page_url",
            "url",
            "depth",
            F.lit(rnd).cast("int").alias("discovered_round"),
        )
        .dropDuplicates(["source_page_url", "url"])
    )
    # a re-parsed page re-emits its whole edge set (a re-claimed seed
    # parses twice even without recrawl; recrawl re-parses everything):
    # keep only FIRST-parse sources so the accumulated graph stays
    # distinct (matches the reference, whose seen-set drops every
    # re-discovered link — schedule_service.py:66-84). The guard
    # anti-joins against the content-event LEAVES (urls only), never the
    # accumulated edge deltas, so round r's delta does not chain on round
    # r-1's and the plan depth stays flat.
    prev_parsed = []
    if state.content_events is not None:
        prev_parsed.append(state.content_events.select("source_page_url"))
    if not state.bases_empty:
        prev_parsed.append(state.content_base.select("source_page_url"))
    if prev_parsed:
        prev_df = prev_parsed[0]
        for extra in prev_parsed[1:]:
            prev_df = prev_df.unionByName(extra)
        edge_delta = edge_delta.join(prev_df, "source_page_url", "left_anti")
    edge_delta = edge_delta.localCheckpoint(eager=False)
    new_link_graph = state.link_graph.unionByName(edge_delta)
    # pre-aggregated per-round in-degree delta — the scored pop folds SUM
    # over these tiny batches instead of re-aggregating the edge table
    score_delta = (
        edge_delta.groupBy("url")
        .agg(F.count("*").cast("long").alias("in_degree"))
        .withColumn("scored_round", F.lit(rnd).cast("int"))
        .localCheckpoint(eager=False)
    )
    new_link_scores = state.link_scores.unionByName(score_delta)

    new_seen = state.seen.unionByName(
        claimed.select("url", "depth", F.lit(rnd).alias("claimed_round"), "source_page_url")
    )
    new_links = state.links.unionByName(
        claimed.select(
            "source_page_url",
            "url",
            "depth",
            "is_internal",
            "anchor_text",
            "title_attribute",
            "rel_attribute",
            "id_attribute",
            "link_type",
            F.lit(rnd).alias("discovered_round"),
            F.lit(round_ts).alias("discovered_at"),
        )
    )
    schedule_delta = claimed.select(
        "url", "depth", F.lit(rnd + 1).alias("scheduled_round"), "source_page_url"
    )

    # --- bounded fetch retry (download_retry analogue) --------------------
    new_retries = state.retries
    retry_delta = None
    if cfg.fetch_retries > 0:
        failed_now = (
            round_result.filter(F.col("_status") == "FAILED")
            .select("url", "depth")
            .join(state.retries.select("url", "attempts"), "url", "left")
            .select(
                "url",
                "depth",
                (F.coalesce(F.col("attempts"), F.lit(0)) + 1)
                .cast("int")
                .alias("attempts"),
            )
            .localCheckpoint(eager=True)  # misses only — tiny
        )
        retry_delta = failed_now.filter(
            F.col("attempts") <= cfg.fetch_retries
        ).select(
            "url",
            "depth",
            F.lit(rnd + 1).cast("int").alias("scheduled_round"),
            F.lit("").alias("source_page_url"),
        )
        new_retries = state.retries.join(
            failed_now.select("url"), "url", "left_anti"
        ).unionByName(failed_now)

    if unbounded:
        # everything pending was popped — the next frontier is exactly the
        # newly claimed layer; no anti-join over the old pending needed
        new_pending = schedule_delta
    else:
        new_pending = pending.join(
            popped.select("url"), "url", "left_anti"
        ).unionByName(schedule_delta)
    if retry_delta is not None:
        new_pending = new_pending.unionByName(retry_delta)
    if not unbounded:
        new_pending = new_pending.localCheckpoint(eager=True)

    # --- event-log accumulation -------------------------------------------
    new_page_events = (
        page_events_delta
        if state.page_events is None
        else state.page_events.unionByName(page_events_delta)
    )
    new_content_events = (
        content_events_delta
        if state.content_events is None
        else state.content_events.unionByName(content_events_delta)
    )

    # --- A6 metrics -------------------------------------------------------
    counters: dict = {"round": rnd}
    if cfg.collect_metrics:
        by_src: dict = {}
        for r in metric_tallies:
            by_src.setdefault(r["src"], {})[r["k"]] = r["count"]
        fetch_counts = by_src.get("fetch", {})
        n_popped = sum(fetch_counts.values())
        n_ok = fetch_counts.get("SUCCESS", 0)
        reason_counts = by_src.get("unseen", {})
        n_candidates = sum(by_src.get("cand", {}).values())
        n_unseen = sum(reason_counts.values())
        n_claimed = sum(by_src.get("claim", {}).values())
        counters.update(
            urls_popped=n_popped,
            fetch_success=n_ok,
            fetch_failed=n_popped - n_ok,
            pages_parsed=n_ok,
            links_extracted=n_candidates,
            links_dedup_dropped=n_candidates - n_unseen,
            filtered_depth=reason_counts.get("depth", 0),
            filtered_domain=reason_counts.get("domain", 0),
            filtered_prefix=reason_counts.get("prefix", 0),
            filtered_home_page=reason_counts.get("home_page", 0),
            filtered_robots=reason_counts.get("robots_txt", 0),
            links_claimed=n_claimed,
        )
        metrics_row = spark.createDataFrame(
            [tuple(counters.get(f.name) for f in schemas.ddl_to_schema(schemas.METRICS_DDL))],
            schemas.ddl_to_schema(schemas.METRICS_DDL),
        )
        new_metrics = state.metrics.unionByName(metrics_row)
    else:
        new_metrics = state.metrics

    new_state = CrawlState(
        round=rnd + 1,
        pending=new_pending,
        seen=new_seen,
        links=new_links,
        metrics=new_metrics,
        pages_base=state.pages_base,
        content_base=state.content_base,
        invalid_rows=new_invalid,
        retries=new_retries,
        link_graph=new_link_graph,
        link_scores=new_link_scores,
        page_events=new_page_events,
        content_events=new_content_events,
        rank_scores=rank_scores,
        rank_scored_round=rank_scored_round,
        bloom=state.bloom,
        bases_empty=state.bases_empty,
        # hint is only sound when next round's pending is exactly this
        # round's claims (nothing unpopped, no recrawl/retry re-enqueues)
        pending_rows_hint=(
            n_claimed_hint
            if (unbounded and retry_delta is None and not cfg.enable_recrawl)
            else None
        ),
    )

    # --- durable checkpoint (optional; also compacts the event log) -------
    if (
        cfg.checkpoint_dir is not None
        and (rnd + 1) % max(cfg.checkpoint_every, 1) == 0
    ):
        from wikifrontier import state as state_io

        new_state = state_io.write_checkpoint(
            spark,
            new_state,
            cfg.checkpoint_dir,
            keep_last=cfg.checkpoint_keep_last,
            full_every=cfg.checkpoint_full_every,
        )
    elif (
        cfg.compact_every is not None
        # never fold the event log away while a durable checkpoint dir is
        # active: a later DELTA snapshot persists only the events still in
        # the log, so an in-memory fold between snapshots would silently
        # drop those rows from the durable chain. Durable checkpoints
        # already compact on their own cadence.
        and cfg.checkpoint_dir is None
        and (rnd + 1) % max(cfg.compact_every, 1) == 0
        and (new_state.page_events is not None or new_state.content_events is not None)
    ):
        # in-memory compaction: materialize the folded views as the new
        # bases and drop the event log — identical algebra to the durable
        # checkpoint's compaction, minus the parquet round-trip
        new_state = CrawlState(
            round=new_state.round,
            pending=new_state.pending,
            seen=new_state.seen.localCheckpoint(eager=True),
            links=new_state.links.localCheckpoint(eager=True),
            metrics=new_state.metrics,
            pages_base=new_state.pages.localCheckpoint(eager=True),
            content_base=new_state.page_content.localCheckpoint(eager=True),
            invalid_rows=new_state.invalid_rows,
            retries=new_state.retries,
            link_graph=new_state.link_graph.localCheckpoint(eager=True),
            link_scores=new_state.folded_scores().localCheckpoint(eager=True),
            rank_scores=new_state.rank_scores,
            rank_scored_round=new_state.rank_scored_round,
            bloom=new_state.bloom,
            bases_empty=False,
            pending_rows_hint=new_state.pending_rows_hint,
        )

    if cfg.collect_metrics:
        candidates.unpersist()
        unseen.unpersist()
    return new_state, counters


def _new_bloom(cfg: CrawlConfig):
    """Build the configured bloom tier: partitioned shards by default,
    the legacy driver bitmap when bloom_buckets is falsy."""
    from wikifrontier.seen import PartitionedBloomSeen

    if cfg.bloom_buckets:
        return PartitionedBloomSeen(
            storage_dir=cfg.bloom_storage_dir,
            buckets=cfg.bloom_buckets,
            nbits_per_bucket=max(cfg.bloom_bits // cfg.bloom_buckets, 1 << 12),
        )
    return BloomSeen(nbits=cfg.bloom_bits)


def _bloom_mismatch(bloom, cfg: CrawlConfig) -> bool:
    """True when a checkpoint-loaded filter disagrees with the configured
    tier or sizing (it would silently cap the false-positive budget)."""
    from wikifrontier.seen import PartitionedBloomSeen

    if cfg.bloom_buckets:
        return not isinstance(bloom, PartitionedBloomSeen) or (
            bloom.buckets != cfg.bloom_buckets
            or bloom.nbits != max(cfg.bloom_bits // cfg.bloom_buckets, 1 << 12)
        )
    return not isinstance(bloom, BloomSeen) or bloom.nbits != cfg.bloom_bits


def run_crawl(
    spark: SparkSession,
    corpus: DataFrame,
    seeds: list[str],
    cfg: CrawlConfig,
    resume: bool = False,
) -> CrawlState:
    """Run rounds until the frontier drains or max_rounds is hit.

    With ``resume=True`` and a checkpoint_dir, restarts from the latest
    complete round manifest with no URL re-fetches (north_rule).
    """
    state = None
    if resume and cfg.checkpoint_dir is not None:
        from wikifrontier import state as state_io

        state = state_io.load_checkpoint(
            spark, cfg.checkpoint_dir, bloom_storage_dir=cfg.bloom_storage_dir
        )
    if state is None:
        state = init_state(spark, seeds)

    if cfg.bloom_bits is None:
        # explicit opt-out wins even over a checkpoint's persisted bitmap
        # (the escape hatch must work precisely when the bloom path is the
        # thing being worked around)
        state.bloom = None
    else:
        if state.bloom is not None and _bloom_mismatch(state.bloom, cfg):
            # ADVICE r1: a resumed bitmap sized differently from the
            # config (e.g. the frontier outgrew the old filter) must not
            # silently override the requested sizing — rebuild from seen
            state.bloom = None
        if state.bloom is None:
            state.bloom = _new_bloom(cfg)
            if not state.seen.isEmpty():
                # resume path without a usable bitmap: rebuild from seen
                state.bloom.add_df(spark, state.seen.select("url"))

    # prepare the bucketed corpus layout once if any round may need it;
    # persist is lazy, so a crawl whose batches all stay under the
    # broadcast limit never materializes (or pays for) this copy
    corpus_bucketed = None
    if cfg.fetch_strategy != "broadcast":
        buckets = cfg.corpus_buckets or int(
            spark.conf.get("spark.sql.shuffle.partitions")
        )
        corpus_bucketed = bucket_corpus(corpus, buckets).persist()

    try:
        while state.round < cfg.max_rounds:
            # the carried claim count doubles as the drain check — only
            # rounds without a hint pay the isEmpty probe job. With
            # recrawl on there is no drain: crawled pages keep becoming
            # due, so the loop runs to max_rounds (perpetual-crawl model)
            if not cfg.enable_recrawl:
                if state.pending_rows_hint == 0:
                    break
                if state.pending_rows_hint is None and state.pending.isEmpty():
                    break
            state, _ = run_round(spark, state, corpus, cfg, corpus_bucketed)

        if cfg.checkpoint_dir is not None:
            from wikifrontier import state as state_io

            # the final round always checkpoints, whatever
            # checkpoint_every — a resumed job must never replay
            # completed work past the end
            if state_io.latest_round(cfg.checkpoint_dir) != state.round:
                state = state_io.write_checkpoint(
                    spark, state, cfg.checkpoint_dir,
                    keep_last=cfg.checkpoint_keep_last,
                    full_every=cfg.checkpoint_full_every,
                )
    finally:
        if corpus_bucketed is not None:
            # round outputs are localCheckpoint'd leaves — nothing in the
            # returned state depends on the corpus lineage
            corpus_bucketed.unpersist(blocking=False)
        # ADVICE r3 #5: every bloom in this function was materialized
        # here (fresh via _new_bloom or re-opened by load_checkpoint);
        # when it fell back to a driver-local tempdir (no
        # bloom_storage_dir configured), remove it — the checkpoint copy
        # of the shards (written above) is the durable one, and every
        # returned round output is a localCheckpoint'd leaf that never
        # re-reads the working shards. cleanup() is a no-op for
        # caller-provided storage dirs.
        if state.bloom is not None and getattr(state.bloom, "_owns_dir", False):
            state.bloom.cleanup()
            state.bloom = None
    return state


# --- corpus freshness profile ------------------------------------------------
STALE_AFTER_SEC = 250  # capture age beyond which a page counts as stale


def freshness_profile(
    pages: DataFrame,
    ts_col: str = "warc_ts",
    stratum: str = "lang",
    stale_after_sec: int = STALE_AFTER_SEC,
) -> DataFrame:
    """Capture-freshness rollup over the web_pages corpus — the recency
    report a crawl operator reads next to the recrawl queue (S7/q09
    decides WHICH urls to refetch; this reports HOW stale each slice of
    the stored corpus is, per stratum): doc count, capture-time span,
    mean age relative to the newest capture in the corpus, and the
    stale fraction (age > ``stale_after_sec``). The reference stores
    the equivalent `last_crawled_at` per page but never aggregates it.

    Exactness: timestamps reduce to wall-clock integer MICROS scan-side
    (the NTZ diff trick from ``streaming.sessionize_events`` — no
    session-TZ/DST dependence); ages are integer micros, so sums are
    exact and the mean is one rounded division — bit-replayable.

    Scale shape: the corpus-max capture time is a 1-row broadcast; the
    rollup is ONE counters-only groupBy on the stratum with map-side
    partial agg. Timestamps never shuffle as values, only as counters.
    """
    us = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col(ts_col).cast("timestamp_ntz"),
    )
    base = pages.select(F.col(stratum).alias("stratum"), us.alias("us"))
    newest = base.agg(F.max("us").alias("ref_us"))
    aged = base.crossJoin(F.broadcast(newest)).select(
        "stratum", "us", (F.col("ref_us") - F.col("us")).alias("age_us")
    )
    return aged.groupBy("stratum").agg(
        F.count("*").alias("n_docs"),
        F.round(
            (F.max("us") - F.min("us")) / F.lit(1000000.0), 6
        ).alias("span_sec"),
        F.round(
            F.sum("age_us").cast("double")
            / (F.lit(1000000.0) * F.count("*")),
            6,
        ).alias("mean_age_sec"),
        F.sum(
            (F.col("age_us") > F.lit(int(stale_after_sec) * 1_000_000))
            .cast("int")
        ).cast("long").alias("n_stale"),
        F.round(
            F.sum(
                (F.col("age_us") > F.lit(int(stale_after_sec) * 1_000_000))
                .cast("int")
            ).cast("double")
            / F.count("*"),
            6,
        ).alias("stale_frac"),
    )


def frontier_age_profile(
    pending: DataFrame,
    now_round: int,
    starve_after: int = 3,
    depth_col: str = "depth",
    round_col: str = "scheduled_round",
) -> DataFrame:
    """Queue-aging report over the pending frontier: per depth, how many
    urls wait, how long the oldest has waited (in rounds), the exact mean
    wait, and how many are STARVING (waited >= starve_after rounds).
    freshness_profile reports staleness of the STORED corpus; this is the
    twin for the un-crawled side — under a politeness-capped pop, deep or
    unlucky hosts can sit in `pending` for many rounds, and a scheduler
    that never looks loses them silently (the reference has no such
    view; its queue depth is a single RabbitMQ gauge).

    Exactness: ages are integer round counts and the mean is one rounded
    division over exact integer sums — bit-replayable.

    Scale shape: ONE counters-only fold on the (tiny) depth key; url
    strings never shuffle. O(max_depth) output rows.
    """
    age = F.lit(int(now_round)) - F.col(round_col)
    return (
        pending.select(F.col(depth_col).alias("depth"), age.alias("age"))
        .groupBy("depth")
        .agg(
            F.count("*").alias("n_pending"),
            F.max("age").cast("int").alias("oldest_age"),
            F.round(
                F.sum("age").cast("double") / F.count("*"), 6
            ).alias("mean_age"),
            F.sum(
                F.when(F.col("age") >= starve_after, 1).otherwise(0)
            ).alias("n_starving"),
        )
    )


def crawl_velocity(
    metrics: DataFrame,
    x_col: str = "round",
    y_col: str = "pages_parsed",
) -> DataFrame:
    """Closed-form least-squares fit of per-round throughput → ONE row
    ``(n_rounds, slope, intercept, next_round_forecast)`` — the crawl
    operator's "are we speeding up or saturating, and what does the next
    round cost" answer, read next to the q80 drain plan. The reference
    graphs this by eye in Grafana (monitoring/dashboards); here it is a
    query with an exact algebraic answer.

    Exactness: Σx, Σy, Σxy, Σx² fold as exact integer sums (rounds and
    page counts are longs); the two divisions happen once, on the folded
    scalars, rounded to 6 places — bit-replayable at any parallelism.
    Degenerate single-round input (zero variance in x) yields NULL
    slope/forecast rather than a division error.

    Scale shape: ONE single-row aggregate over the metrics relation
    (O(rounds) input — tiny by construction); everything else is scalar
    arithmetic on that row.
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    sums = metrics.agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.max(x).alias("xmax"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        denom != 0,
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / denom.cast("double"),
            6,
        ),
    )
    intercept = F.when(
        denom != 0,
        F.round(
            (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).cast(
                "double"
            )
            / denom.cast("double"),
            6,
        ),
    )
    return sums.select(
        F.col("n").alias("n_rounds"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        F.round(slope * (F.col("xmax") + 1) + intercept, 6).alias(
            "next_round_forecast"
        ),
    )
