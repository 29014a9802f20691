"""Physical-plan invariants (SURVEY §4.2): the properties that make the
engine 100 TB-shaped, asserted on `explain("formatted")` output so a
regression that silently changes the plan shape fails loudly.

* column pruning reaches the parquet scan (ReadSchema carries only used
  columns — a scan reading `text` for a doc_id-only query is wrong);
* predicate pushdown reaches the scan (PushedFilters non-empty);
* similarity pair generation is NEVER a cartesian product;
* the bucketed fetch join is a shuffle-hash join with no sort and no
  exchange on the (html-bearing) corpus side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikifrontier import dedup, frontier, queries, synth

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_chain_prunes_columns(spark):
    plan = plan_of(queries.q02_filter_chain(spark, SF_DIR))
    # q02 touches only doc_id — the documents scan must not read text
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_recrawl_scan_pushes_predicate(spark):
    plan = plan_of(queries.q09_recrawl_due(spark, SF_DIR))
    assert "PushedFilters: [" in plan
    assert "IsNotNull(o_orderdate)" in plan or "LessThan(o_orderdate" in plan


def test_lsh_pairs_no_cartesian(spark):
    docs = queries.neardup_docs(queries.load(spark, SF_DIR, "documents"))
    for df in (
        dedup.minhash_lsh_pairs(docs, threshold=0.5),
        dedup.simhash_pairs(docs, max_hamming=3),
        dedup.jaccard_lsh_verified(docs, threshold=0.5),
    ):
        plan = plan_of(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_containment_no_cartesian(spark):
    docs = queries.neardup_docs(queries.load(spark, SF_DIR, "documents"))
    plan = plan_of(dedup.fingerprint_containment(docs, threshold=0.6))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cluster_round_is_keyed_join(spark):
    """One hash-min round must be an equi-join + keyed aggregate, never a
    nested-loop join — the property that keeps CC linear per round."""
    nodes = spark.range(100).select(F.col("id").alias("doc_id"))
    pairs = spark.range(99).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    plan = plan_of(dedup.dedup_clusters(nodes, pairs, max_iter=1))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_curation_pipeline_shape(spark):
    """The composed curation plan (q50) must stay free of nested-loop
    joins end-to-end — gates, LSH pair gen, clustering, survivor join."""
    plan = plan_of(queries.q50_curation_pipeline(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_fetch_join_shape(spark):
    """No broadcast, no sort, and no exchange on the corpus side: the
    html payload stays exactly where the bucketed layout put it."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        corpus = synth.corpus_df(spark, 200)
        bucketed = frontier.bucket_corpus(corpus, 8).persist()
        bucketed.count()
        batch = corpus.select("url", F.lit(0).alias("depth")).localCheckpoint()
        plan = plan_of(frontier._fetch_join(batch, bucketed, use_broadcast=False))
        assert "ShuffledHashJoin" in plan
        assert "Sort" not in plan
        assert "BroadcastHashJoin" not in plan
        # exactly one exchange above the cache boundary — the frontier
        # side; the InMemoryTableScan of the bucketed corpus feeds the
        # join directly (exchanges *inside* InMemoryRelation are the
        # one-time layout write, not per-join motion)
        body = plan.split("== Physical Plan ==")[1].split("(1) ")[0]
        join_level = body.split("InMemoryTableScan")[0]
        assert join_level.count("Exchange") == 1
        bucketed.unpersist()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_claim_has_partial_aggregation(spark):
    """D2 must keep its map-side combine: two HashAggregates around one
    exchange (the property that makes the claim's shuffle O(distinct)."""
    cands = spark.range(1000).select(
        F.concat(F.lit("https://x/"), (F.col("id") % 100)).alias("url"),
        F.lit("s").alias("source_page_url"),
        F.col("id").cast("int").alias("in_page_seq"),
        F.lit(1).alias("depth"),
    )
    from wikifrontier.seen import claim_first_wins

    plan = plan_of(claim_first_wins(cands))
    body = plan.split("== Physical Plan ==")[1]
    summary = body.split("(1) ")[0]
    # partial aggregate below the exchange, final above it (min_by over a
    # struct payload plans as SortAggregate — the partial still shrinks
    # each partition to one row per url before the shuffle)
    assert summary.count("Aggregate") == 2
    pre_exchange = summary.split("Exchange")[1]
    assert "Aggregate" in pre_exchange
    assert "Window" not in plan  # the slow formulation this replaced


def test_pagerank_loop_shape(spark):
    """Each PageRank iteration must be equi-join + keyed aggregate; the
    only nested-loop join allowed is the 1-row dangling-mass broadcast
    (BroadcastNestedLoopJoin over exactly one row is the intended
    scalar-attach, not a pair explosion). checkpoint=False keeps the full
    loop-body lineage in the plan (a checkpointed frame explains as
    `Scan ExistingRDD`, proving nothing — VERDICT r4 #3), so this
    asserts over BOTH unrolled iterations."""
    from wikifrontier.linkgraph import pagerank

    edges = spark.range(200).select(
        F.col("id").alias("src"), ((F.col("id") * 7 + 3) % 200).alias("dst")
    )
    plan = plan_of(pagerank(edges, iterations=2, checkpoint=False))
    assert "CartesianProduct" not in plan
    # the loop body is really in the plan: per-iteration inflow joins
    assert plan.count("HashAggregate") >= 2 or plan.count("Aggregate") >= 2


def test_scored_pop_is_incremental(spark):
    """VERDICT r4 #4: the scored pop must fold the pre-aggregated
    per-round score deltas — never re-derive or re-aggregate the edge
    table. After a scored crawl, the next pop's plan reads only
    checkpointed leaves (no Generate/explode = no candidate re-derivation,
    the aggregate is sum(in_degree) over delta rows, and the pop itself is
    a distributed top-k)."""
    from wikifrontier.politeness import scored_pop

    corpus = synth.corpus_df(spark, 120)
    cfg = frontier.CrawlConfig(
        robots_txt=synth.ROBOTS_TXT, budget_per_round=20, max_rounds=3,
        pop_strategy="scored", collect_metrics=False,
    )
    state = frontier.run_crawl(spark, corpus, [synth.page_url(synth.SEED_ID)], cfg)
    plan = plan_of(scored_pop(state.pending, state.in_degrees, 20))
    assert "TakeOrderedAndProject" in plan
    assert "sum(in_degree" in plan
    assert "Generate" not in plan  # no edge re-derivation from parses
    assert "CartesianProduct" not in plan


def test_segment_dedup_banned_antijoin(spark):
    """VERDICT r4 #3 (segment dedup): the keep path must be a broadcast
    LEFT ANTI join against the tiny banned-hash set — segment text never
    rides a join shuffle at any corpus size."""
    docs = queries.load(spark, SF_DIR, "documents")
    plan = plan_of(dedup.segment_dedup(docs))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_segment_dedup_shape(spark):
    """Segment frequency must shuffle the 32-char hash, not segment text:
    no sort-merge join (equi-join on the hash may broadcast or
    shuffle-hash), no cartesian, and reassembly must not use a window."""
    docs = queries.load(spark, SF_DIR, "documents")
    plan = plan_of(dedup.segment_dedup(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan


def test_contamination_broadcasts_benchmark(spark):
    # the benchmark gram set is tiny at any corpus scale: the overlap join
    # must be a broadcast hash join — never a sort-merge (which would
    # shuffle every candidate gram) and never a nested loop.
    plan = plan_of(queries.q55_contamination(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_trap_signals_single_keyed_aggregate(spark):
    # per-host signals are one groupBy: no joins at all, and the aggregate
    # carries a map-side partial phase before the host-keyed exchange.
    plan = plan_of(queries.q56_trap_detection(spark, SF_DIR))
    assert "Join" not in plan
    assert "partial_count" in plan or "HashAggregate" in plan


def test_stratified_sample_is_pure_filter(spark):
    # deterministic sampling is scan-side: no join, no aggregate, and the
    # only exchange is the deliberate spread() repartition.
    from wikifrontier import textops

    df = textops.stratified_sample(
        queries.load(spark, SF_DIR, "documents"),
        queries.MIXTURE_RATES,
        "lang",
        "doc_id",
    )
    plan = plan_of(df)
    assert "Join" not in plan
    assert "Exchange" not in plan  # no spread() here: zero shuffles
    assert "HashAggregate" not in plan


def test_training_export_composition_shape(spark):
    # the full ship-the-dataset composition must stay free of nested-loop
    # pair generation end-to-end, and the decontamination stage inside it
    # must keep its broadcast shape (benchmark side never shuffles).
    plan = plan_of(queries.q58_training_export(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_incremental_ingest_broadcasts_batch(spark):
    # steady-state ingestion: the batch (a crawl round) is small relative
    # to the corpus (everything ever crawled) — both probes must broadcast
    # the batch side so the corpus indexes are scanned once, never
    # re-keyed; and band-bucketed candidate generation is never a
    # cartesian / nested-loop pair expansion.
    plan = plan_of(queries.q61_incremental_ingest(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hits_loop_shape(spark):
    # the un-checkpointed loop body (checkpoint=False exposes the real
    # plan) must be keyed joins + aggregates: no cartesian, and the L1
    # totals ride 1-row broadcasts, not sort-merge exchanges of scores.
    from wikifrontier.linkgraph import hits

    edges = spark.range(64).select(
        F.col("id").alias("src"), ((F.col("id") * 7 + 3) % 64).alias("dst")
    )
    plan = plan_of(hits(edges, iterations=2, checkpoint=False))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_bm25_broadcasts_query_side(spark):
    """q70: the query-term set and query map must ride broadcast joins,
    never a cartesian — the corpus-sized shuffles carry counters only."""
    plan = plan_of(queries.q70_bm25_topk(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_source_reputation_two_shuffles(spark):
    """q73: one sha-window shuffle + one source rollup, nothing more."""
    plan = plan_of(queries.q73_source_reputation(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert plan.count("hashpartitioning") <= 2


def test_sessionize_single_shuffle(spark):
    """q74: the lag/prefix windows and the (user, session) rollup must
    share ONE user_id exchange (groupBy keys ⊇ partition key)."""
    plan = plan_of(queries.q74_sessionize_events(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert plan.count("hashpartitioning") <= 1


def test_substring_dup_inverted_keep_join(spark):
    """q75: the >1-doc ban set must come back as a BROADCAST semi-join
    (inverted keep-join) so window text never rides a shuffle."""
    plan = plan_of(queries.q75_substring_dup(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_inverted_index_two_shuffles(spark):
    """q77: (doc,term) tf fold + term fold are the only exchanges."""
    plan = plan_of(queries.q77_inverted_index(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert plan.count("hashpartitioning") <= 2


def test_redirect_doubling_shape(spark):
    """resolve_redirects must be pointer doubling. Two invariants: the
    round count is logarithmic in max_hops (a per-hop walk would be
    linear), and each round's body is a keyed equi-join — never a
    cartesian. The full unrolled plan doubles per round by construction
    (each round composes the state with ITSELF), which is exactly why
    production keeps checkpoint=True; the explainable audit is therefore
    one round (max_hops=2)."""
    from wikifrontier.linkgraph import doubling_rounds, resolve_redirects

    assert doubling_rounds(16) == 4
    assert doubling_rounds(100) == 7
    assert doubling_rounds(1) == 1

    edges = spark.range(1, 200).select(
        F.concat(F.lit("u"), F.col("id")).alias("src"),
        F.concat(F.lit("u"), F.col("id") - 1).alias("dst"),
    )
    plan = plan_of(resolve_redirects(edges, max_hops=2, checkpoint=False))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # 1 doubling round + the final cycle-probe join
    n_joins = sum(plan.count(j) for j in
                  ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
    assert 2 <= n_joins <= 4, plan


def test_cdx_index_single_shuffle(spark):
    """The capture index is ONE hash shuffle (the url window); the SURT
    key is computed map-side with string builtins — no UDF, no second
    exchange."""
    from wikifrontier.cdx import cdx_index
    from wikifrontier.queries import _cdx_captures

    import re

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(cdx_index(_cdx_captures(docs)))
    # one Exchange node (each node appears once in the formatted detail list)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_snapshot_diff_is_single_equijoin(spark):
    """The two-snapshot diff is exactly one full-outer equi-join keyed on
    url — no nested loop, no extra shuffle beyond the two join sides."""
    from wikifrontier import queries

    import re

    plan = plan_of(queries.q85_snapshot_diff(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    n_joins = len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan))
    assert n_joins == 1, plan


def test_video_neardup_equijoin_shape(spark):
    """q115/q116: Y4M decode is one Arrow-batched Python stage; the
    pairing is an equi-join on the exact frame hash — never a cartesian
    or nested-loop over videos."""
    plan = plan_of(queries.q116_video_neardup(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert (
        "ArrowEvalPython" in plan or "MapInPandas" in plan
        or "PythonMapInArrow" in plan
    )


def test_lpa_loop_is_fold_not_window(spark):
    """q117: each LPA round is one edge⋈label equi-join + two keyed
    aggregates; the winner pick is min(struct(-c, label)) — a
    partial-aggregatable FOLD, never a per-node Window sort (a window
    would serialize each node's votes through one task at scale).
    checkpoint=False exposes both unrolled rounds to explain."""
    from wikifrontier.linkgraph import label_propagation

    edges = spark.range(200).select(
        F.concat(F.lit("h"), F.col("id") % 40).alias("src"),
        F.concat(F.lit("h"), (F.col("id") * 7 + 3) % 40).alias("dst"),
    )
    plan = plan_of(label_propagation(edges, iterations=2, checkpoint=False))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2 or plan.count("Aggregate") >= 2


def test_gopher_rules_exchange_free(spark):
    """q125's claim: the whole Gopher rule suite is one codegen
    projection — a direct call on an in-memory frame must plan with NO
    exchange, join, window, or Python UDF anywhere."""
    from wikifrontier.textops import gopher_rules

    df = spark.createDataFrame(
        [(1, "line one here.\n- line two ...")], "doc_id long, text string"
    )
    plan = plan_of(gopher_rules(df))
    for bad in ("Exchange", "PythonUDF", "Window", "Join"):
        assert bad not in plan, f"gopher rules grew a {bad}"


def test_kmv_bottom_k_is_take_ordered(spark):
    """q128's claim: the sketch cut is per-partition bottom-k
    (TakeOrderedAndProject), never a global Sort of the hash column."""
    from wikifrontier.sketch import kmv_sketch

    df = spark.range(1000).select(F.col("id").cast("string").alias("v"))
    plan = plan_of(kmv_sketch(df, "v"))
    assert "TakeOrderedAndProject" in plan


def test_focused_pop_is_take_ordered(spark):
    """q132's budget cut must be TakeOrdered, not a frontier sort."""
    from wikifrontier.politeness import focused_pop

    df = spark.createDataFrame(
        [("u1", "h1", 1, "spark data")], "url string, host string, depth int, anchor_text string"
    )
    plan = plan_of(focused_pop(df))
    assert "TakeOrderedAndProject" in plan


def test_url_quality_exchange_free(spark):
    """q131's claim: the URL gate composes into a projection — zero
    exchanges on a direct call."""
    from wikifrontier.filters import url_quality

    df = spark.createDataFrame([("https://a.org/x",)], "url string")
    plan = plan_of(url_quality(df))
    assert "Exchange" not in plan and "PythonUDF" not in plan


def test_reciprocity_no_cartesian(spark):
    """q137: the reversed-key self-join must be an equi-join."""
    from wikifrontier.linkgraph import reciprocity

    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    plan = plan_of(reciprocity(edges))
    assert "CartesianProduct" not in plan
