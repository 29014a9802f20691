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
* every per-round state table is checkpointed (parquet dir or
  localCheckpoint) to truncate lineage — an iterative loop without this
  re-executes the whole crawl history every round.
* metrics are DataFrame aggregates (accumulators are unreliable), computed
  from cached per-round intermediates — reference A6.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from datetime import datetime, timedelta
from zoneinfo import ZoneInfo

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wikifrontier import filters as flt
from wikifrontier import schemas
from wikifrontier.politeness import cap_per_host, pop_frontier
from wikifrontier.seen import claim_first_wins, drop_seen
from wikifrontier.udfs import parse_page_udf

RECRAWL_INTERVAL_SECONDS = 691_200  # 8 days — crawler_prod.yml:26
FAILED_ERROR_TYPE = "HTTPError"
FAILED_ERROR_MESSAGE = "HTTPError: url not found in corpus"


@dataclass(frozen=True)
class CrawlConfig:
    max_depth: int = flt.MAX_DEPTH
    budget_per_round: int | None = None     # dispatch budget (T3); None = unbounded
    per_host_cap: int | None = None         # politeness cap (§2.9); None = unbounded
    max_rounds: int = 32
    robots_txt: str = ""
    allowed_domains: tuple[str, ...] = flt.ALLOWED_DOMAINS
    excluded_prefixes: tuple[str, ...] = flt.EXCLUDED_PREFIXES
    crawl_epoch: datetime = field(
        default_factory=lambda: datetime(2025, 8, 15, 12, 0, 0, tzinfo=ZoneInfo("America/New_York"))
    )
    checkpoint_dir: str | None = None
    collect_metrics: bool = True


@dataclass
class CrawlState:
    round: int
    pending: DataFrame
    seen: DataFrame
    pages: DataFrame
    page_content: DataFrame
    links: DataFrame
    metrics: DataFrame

    def tables(self) -> dict[str, DataFrame]:
        return {
            "pending": self.pending,
            "seen": self.seen,
            "pages": self.pages,
            "page_content": self.page_content,
            "links": self.links,
            "metrics": self.metrics,
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
        pages=schemas.empty_df(spark, schemas.PAGES_DDL),
        page_content=schemas.empty_df(spark, schemas.PAGE_CONTENT_DDL),
        links=schemas.empty_df(spark, schemas.LINKS_DDL),
        metrics=schemas.empty_df(spark, schemas.METRICS_DDL),
    )


def _merge_pages(pages: DataFrame, updates: DataFrame) -> DataFrame:
    """A1 — db_writer.py:42-102 as a full-outer-join rewrite.

    Exact quirks reproduced: INSERT sets total=1, failed=0 regardless of
    status; conflict UPDATE overwrites status/http/html_hash/timestamps/
    error (including with NULLs) but NOT url_hash / compressed_filepath;
    failed_attempts += 1 only when the new status ∈ {FAILED, SKIPPED}.
    """
    o, n = pages.alias("o"), updates.alias("n")
    n_present = F.col("n.last_crawl_status").isNotNull()
    o_present = F.col("o.last_crawl_status").isNotNull()

    def upd(col):  # overwritten on update (NULLs win)
        return F.when(n_present, F.col(f"n.{col}")).otherwise(F.col(f"o.{col}"))

    def ins_only(col):  # set on insert, kept on update
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
            + F.when(n_present, F.lit(1)).otherwise(F.lit(0))
        ).alias("total_crawl_attempts"),
        (
            F.coalesce(F.col("o.failed_crawl_attempts"), F.lit(0))
            + F.when(
                n_present
                & o_present
                & F.col("n.last_crawl_status").isin("FAILED", "SKIPPED"),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("failed_crawl_attempts"),
        upd("last_error_seen").alias("last_error_seen"),
        F.least(F.col("o.depth"), F.col("n.depth")).alias("depth"),
        F.coalesce(F.col("o.first_crawled_round"), F.col("n.first_crawled_round")).alias(
            "first_crawled_round"
        ),
    )


def _merge_content(page_content: DataFrame, updates: DataFrame) -> DataFrame:
    """A3 — db_writer.py:164-217: last-write-wins upsert on source_page_url."""
    kept = page_content.join(
        updates.select("source_page_url"), "source_page_url", "left_anti"
    )
    return kept.unionByName(updates)


def run_round(
    spark: SparkSession,
    state: CrawlState,
    corpus: DataFrame,
    cfg: CrawlConfig,
) -> tuple[CrawlState, dict]:
    """Execute one BFS round; returns (new_state, round_counters)."""
    rnd = state.round
    round_ts = cfg.crawl_epoch + timedelta(seconds=rnd)
    next_crawl_ts = round_ts + timedelta(seconds=RECRAWL_INTERVAL_SECONDS)
    robots_rules = flt.parse_robots(cfg.robots_txt)

    # --- T1/T3 pop + §2.9 politeness -------------------------------------
    popped = cap_per_host(
        pop_frontier(state.pending, cfg.budget_per_round), cfg.per_host_cap
    )

    # --- S2 fetch: equi-join against the corpus ---------------------------
    fetched = (
        popped.join(corpus.select("url", "html"), "url", "left")
        .withColumn("_found", F.col("html").isNotNull())
        .persist()
    )

    # --- A1 pages merge ---------------------------------------------------
    page_updates = fetched.select(
        "url",
        F.when(F.col("_found"), F.lit("SUCCESS")).otherwise(F.lit("FAILED")).alias(
            "last_crawl_status"
        ),
        F.when(F.col("_found"), F.lit(200)).cast("int").alias("http_status_code"),
        F.sha2(F.col("url"), 256).alias("url_hash"),
        F.when(F.col("_found"), F.sha2(F.col("html"), 256)).alias("html_content_hash"),
        F.when(
            F.col("_found"),
            F.concat(F.lit("/data/html/"), F.sha2(F.col("url"), 256), F.lit(".html.gz")),
        ).alias("compressed_filepath"),
        F.lit(round_ts).alias("last_crawled_at"),
        F.when(F.col("_found"), F.lit(next_crawl_ts)).alias("next_crawl_at"),
        F.when(~F.col("_found"), F.lit(FAILED_ERROR_MESSAGE)).alias("last_error_seen"),
        F.col("depth"),
        F.lit(rnd).alias("first_crawled_round"),
    )
    new_pages = _merge_pages(state.pages, page_updates)

    # --- X1–X7 parse (the one pandas UDF) ---------------------------------
    parsed = (
        fetched.filter(F.col("_found"))
        .withColumn("p", parse_page_udf(F.col("url"), F.col("html"), F.col("depth")))
        .select("url", "depth", "p")
        .persist()
    )
    content_updates = parsed.select(
        F.col("url").alias("source_page_url"),
        F.col("p.title").alias("title"),
        F.col("p.categories").alias("categories"),
        F.col("p.text_content").alias("text_content"),
        F.col("p.text_content_hash").alias("text_content_hash"),
        F.lit(round_ts).alias("parsed_at"),
    )
    new_content = _merge_content(state.page_content, content_updates)

    # --- §3.3 schedule: explode → D1 → F1-F5 → D2 claim -------------------
    candidates = parsed.select(F.explode("p.links").alias("l")).select("l.*").persist()

    unseen = drop_seen(candidates, state.seen).withColumn(
        "_reason",
        flt.filter_reason(
            F.col("url"),
            F.col("depth"),
            max_depth=cfg.max_depth,
            allowed_domains=cfg.allowed_domains,
            excluded_prefixes=cfg.excluded_prefixes,
            robots_rules=robots_rules,
        ),
    ).persist()

    claimed = claim_first_wins(unseen.filter(F.col("_reason").isNull())).persist()

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
    new_pending = state.pending.join(
        popped.select("url"), "url", "left_anti"
    ).unionByName(
        claimed.select(
            "url", "depth", F.lit(rnd + 1).alias("scheduled_round"), "source_page_url"
        )
    )

    # --- A6 metrics -------------------------------------------------------
    counters: dict = {"round": rnd}
    if cfg.collect_metrics:
        fetch_row = fetched.agg(
            F.count("*").alias("popped"),
            F.sum(F.col("_found").cast("long")).alias("ok"),
        ).collect()[0]
        n_candidates = candidates.count()
        reason_counts = {
            r["_reason"]: r["cnt"]
            for r in unseen.groupBy("_reason").agg(F.count("*").alias("cnt")).collect()
        }
        n_unseen = sum(reason_counts.values())
        n_claimed = claimed.count()
        counters.update(
            urls_popped=fetch_row["popped"] or 0,
            fetch_success=fetch_row["ok"] or 0,
            fetch_failed=(fetch_row["popped"] or 0) - (fetch_row["ok"] or 0),
            pages_parsed=fetch_row["ok"] or 0,
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
        pages=new_pages,
        page_content=new_content,
        links=new_links,
        metrics=new_metrics,
    )

    # --- lineage truncation / durable checkpoint --------------------------
    if cfg.checkpoint_dir is not None:
        from wikifrontier import state as state_io

        new_state = state_io.write_checkpoint(spark, new_state, cfg.checkpoint_dir)
    else:
        new_state = CrawlState(
            round=new_state.round,
            **{
                name: df.localCheckpoint(eager=True)
                for name, df in new_state.tables().items()
            },
        )

    for df in (fetched, parsed, candidates, unseen, claimed):
        df.unpersist()
    return new_state, counters


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

        state = state_io.load_checkpoint(spark, cfg.checkpoint_dir)
    if state is None:
        state = init_state(spark, seeds)

    while state.round < cfg.max_rounds:
        if state.pending.isEmpty():
            break
        state, _ = run_round(spark, state, corpus, cfg)
    return state
