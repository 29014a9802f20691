"""End-to-end BFS tier (SURVEY.md §5.2 tier 2): Spark engine vs the
pure-Python reference simulator, plus UDF byte-parity and resume."""

import pytest
from pyspark.sql import functions as F

from wikifrontier import synth
from wikifrontier.frontier import CrawlConfig, run_crawl
from wikifrontier.simulator import simulate_crawl
from wikifrontier.udfs import parse_page_udf

N = 303  # covers all corner-case residues (mod 101) ≥ twice


@pytest.fixture(scope="module")
def corpus(spark):
    df = synth.corpus_df(spark, N, partitions=4).cache()
    df.count()
    return df


def _assert_state_matches(state, sim):
    pages = {r["url"]: r.asDict() for r in state.pages.collect()}
    assert set(pages) == set(sim["pages"])
    for url, want in sim["pages"].items():
        got = pages[url]
        for key in (
            "last_crawl_status",
            "http_status_code",
            "url_hash",
            "html_content_hash",
            "compressed_filepath",
            "total_crawl_attempts",
            "failed_crawl_attempts",
            "depth",
            "first_crawled_round",
        ):
            assert got[key] == want[key], (url, key, got[key], want[key])

    content = {r["source_page_url"]: r.asDict() for r in state.page_content.collect()}
    assert set(content) == set(sim["content"])
    for url, want in sim["content"].items():
        got = content[url]
        assert got["title"] == want["title"], url
        assert got["categories"] == want["categories"], url
        assert got["text_content"] == want["text_content"], url
        assert got["text_content_hash"] == want["text_content_hash"], url

    links = {
        (r["source_page_url"], r["url"]): r.asDict() for r in state.links.collect()
    }
    want_links = {(l["source_page_url"], l["url"]): l for l in sim["links"]}
    assert set(links) == set(want_links)
    for key, want in want_links.items():
        got = links[key]
        for field in (
            "depth",
            "is_internal",
            "anchor_text",
            "title_attribute",
            "rel_attribute",
            "id_attribute",
            "link_type",
            "discovered_round",
        ):
            assert got[field] == want[field], (key, field)

    seen = {r["url"]: r.asDict() for r in state.seen.collect()}
    assert set(seen) == set(sim["seen"])
    for url, want in sim["seen"].items():
        got = seen[url]
        assert got["depth"] == want["depth"], url
        assert got["claimed_round"] == want["claimed_round"], url
        assert got["source_page_url"] == want["source_page_url"], url

    metrics = {r["round"]: r.asDict() for r in state.metrics.collect()}
    assert len(metrics) == len(sim["rounds"])
    for want in sim["rounds"]:
        got = metrics[want["round"]]
        for key, val in want.items():
            assert got[key] == val, (want["round"], key, got[key], val)


class TestCorpusGeneration:
    def test_corpus_matches_python_generator(self, spark, corpus):
        rows = {r["url"]: r for r in corpus.collect()}
        assert len(rows) == N
        for i in (0, 1, 7, 11, 13, 17, 19, 23, 101, 300):
            want = synth.gen_page_row(i, N)
            got = rows[want["url"]]
            assert bytes(got["html"]) == want["html"], i
            assert got["text"] == want["text"], i
            assert got["lang"] == want["lang"], i

    def test_parse_udf_byte_parity_with_ground_truth(self, spark, corpus):
        """input_hint invariant through the Spark path: UDF text_content
        equals the generator's pre-rendered `text` column for every url."""
        parsed = corpus.withColumn(
            "p", parse_page_udf(F.col("url"), F.col("html"), F.lit(0))
        )
        mismatches = parsed.filter(
            ~(
                (F.col("p.text_content") == F.col("text"))
                | (F.col("p.text_content").isNull() & F.col("text").isNull())
            )
        ).count()
        assert mismatches == 0


class TestCrawlVsSimulator:
    def test_unbudgeted_bfs(self, spark, corpus):
        cfg = CrawlConfig(robots_txt=synth.ROBOTS_TXT, max_rounds=10)
        state = run_crawl(spark, corpus, [synth.page_url(synth.SEED_ID)], cfg)
        sim = simulate_crawl(N, max_rounds=10)
        _assert_state_matches(state, sim)

    def test_budgeted_crawl(self, spark, corpus):
        cfg = CrawlConfig(robots_txt=synth.ROBOTS_TXT, budget_per_round=40, max_rounds=8)
        state = run_crawl(spark, corpus, [synth.page_url(synth.SEED_ID)], cfg)
        sim = simulate_crawl(N, budget=40, max_rounds=8)
        _assert_state_matches(state, sim)

    def test_per_host_cap(self, spark, corpus):
        cfg = CrawlConfig(
            robots_txt=synth.ROBOTS_TXT, budget_per_round=50, per_host_cap=25, max_rounds=6
        )
        state = run_crawl(spark, corpus, [synth.page_url(synth.SEED_ID)], cfg)
        sim = simulate_crawl(N, budget=50, per_host_cap=25, max_rounds=6)
        _assert_state_matches(state, sim)

    def test_scored_pop_same_set_different_order(self, spark, corpus):
        """pop_strategy='scored' (north_star depth + link-score priority)
        changes visit ORDER within a layer but an exhaustive crawl still
        reaches exactly the FIFO crawl's page set; rounds-crawled-in
        differ for at least one page (proving the order actually moved),
        and the priority signal is REAL: the discovered link graph holds
        multi-source targets, so in-degrees vary within a pop batch
        (ADVICE r4 #1 — the claim-tree links table has in-degree ≤ 1 by
        construction and would make this ordering vacuous)."""
        fifo_cfg = CrawlConfig(
            robots_txt=synth.ROBOTS_TXT, budget_per_round=40, max_rounds=12
        )
        fifo = run_crawl(spark, corpus, [synth.page_url(synth.SEED_ID)], fifo_cfg)
        scored_cfg = CrawlConfig(
            robots_txt=synth.ROBOTS_TXT, budget_per_round=40, max_rounds=12,
            pop_strategy="scored",
        )
        scored = run_crawl(spark, corpus, [synth.page_url(synth.SEED_ID)], scored_cfg)
        fifo_pages = {r["url"] for r in fifo.pages.select("url").collect()}
        scored_pages = {r["url"] for r in scored.pages.select("url").collect()}
        assert fifo_pages == scored_pages
        fifo_rounds = {
            r["url"]: r["claimed_round"]
            for r in fifo.seen.select("url", "claimed_round").collect()
        }
        scored_rounds = {
            r["url"]: r["claimed_round"]
            for r in scored.seen.select("url", "claimed_round").collect()
        }
        assert fifo_rounds != scored_rounds or len(fifo_pages) < 40
        # the score state carries genuine in-degree variation
        degs = [r["in_degree"] for r in scored.in_degrees.collect()]
        assert degs and max(degs) > 1 and len(set(degs)) > 1

    def test_pop_strategy_validation(self, spark, corpus):
        """ADVICE r4 #3: a pop_strategy typo or scored+unbounded-budget
        must raise, never silently fall back to FIFO."""
        with pytest.raises(ValueError, match="unknown pop_strategy"):
            run_crawl(
                spark, corpus, [synth.page_url(synth.SEED_ID)],
                CrawlConfig(robots_txt=synth.ROBOTS_TXT, max_rounds=1,
                            pop_strategy="priority", budget_per_round=10),
            )
        with pytest.raises(ValueError, match="requires budget_per_round"):
            run_crawl(
                spark, corpus, [synth.page_url(synth.SEED_ID)],
                CrawlConfig(robots_txt=synth.ROBOTS_TXT, max_rounds=1,
                            pop_strategy="scored"),
            )

    def test_pagerank_pop_same_set(self, spark, corpus):
        """pop_strategy='pagerank' (periodic full-graph refresh) reaches
        the same exhaustive page set as FIFO."""
        base = run_crawl(
            spark, corpus, [synth.page_url(synth.SEED_ID)],
            CrawlConfig(robots_txt=synth.ROBOTS_TXT, budget_per_round=40,
                        max_rounds=12),
        )
        pr = run_crawl(
            spark, corpus, [synth.page_url(synth.SEED_ID)],
            CrawlConfig(robots_txt=synth.ROBOTS_TXT, budget_per_round=40,
                        max_rounds=12, pop_strategy="pagerank",
                        score_refresh_every=3),
        )
        assert (
            {r["url"] for r in base.pages.select("url").collect()}
            == {r["url"] for r in pr.pages.select("url").collect()}
        )


class TestLinkGraph:
    """The full discovered edge relation (ADVICE r4 #1) and its
    incremental in-degree state (VERDICT r4 #4)."""

    def test_link_graph_is_distinct_superset_of_claim_tree(self, spark, corpus):
        cfg = CrawlConfig(robots_txt=synth.ROBOTS_TXT, max_rounds=10)
        state = run_crawl(spark, corpus, [synth.page_url(synth.SEED_ID)], cfg)
        edges = [
            (r["source_page_url"], r["url"]) for r in state.link_graph.collect()
        ]
        assert len(edges) == len(set(edges))  # distinct by construction
        claim_pairs = {
            (r["source_page_url"], r["url"]) for r in state.links.collect()
        }
        assert claim_pairs <= set(edges)  # claim tree ⊆ full graph
        assert len(edges) > len(claim_pairs)  # multi-source edges exist

    def test_incremental_fold_equals_one_shot_in_degrees(self, spark, corpus):
        from wikifrontier.politeness import in_degrees

        cfg = CrawlConfig(robots_txt=synth.ROBOTS_TXT, max_rounds=10)
        state = run_crawl(spark, corpus, [synth.page_url(synth.SEED_ID)], cfg)
        folded = {
            r["url"]: r["in_degree"] for r in state.in_degrees.collect()
        }
        one_shot = {
            r["url"]: r["in_degree"]
            for r in in_degrees(state.link_graph).collect()
        }
        assert folded == one_shot

    def test_link_graph_survives_checkpoint(self, spark, corpus, tmp_path):
        from wikifrontier import state as state_io

        ckpt = str(tmp_path / "ckpt_lg")
        cfg = CrawlConfig(
            robots_txt=synth.ROBOTS_TXT, max_rounds=6, checkpoint_dir=ckpt
        )
        state = run_crawl(spark, corpus, [synth.page_url(synth.SEED_ID)], cfg)
        loaded = state_io.load_checkpoint(spark, ckpt)
        assert (
            sorted(map(tuple, state.link_graph.collect()))
            == sorted(map(tuple, loaded.link_graph.collect()))
        )
        assert (
            sorted(map(tuple, state.in_degrees.collect()))
            == sorted(map(tuple, loaded.in_degrees.collect()))
        )

    def test_recrawl_keeps_link_graph_distinct(self, spark, corpus):
        """Re-parsed pages re-emit their edge sets; the first-parse-source
        guard must keep the accumulated graph duplicate-free."""
        cfg = CrawlConfig(
            robots_txt=synth.ROBOTS_TXT, max_rounds=8,
            enable_recrawl=True, recrawl_interval_s=2,
        )
        state = run_crawl(spark, corpus, [synth.page_url(synth.SEED_ID)], cfg)
        n_rows = state.link_graph.count()
        n_distinct = (
            state.link_graph.select("source_page_url", "url").distinct().count()
        )
        assert n_rows == n_distinct and n_rows > 0


class TestCheckpointResume:
    def test_resume_no_refetch(self, spark, corpus, tmp_path):
        """North-rule: kill after round k, resume, identical final state and
        zero re-fetches (attempt counters prove no re-fetch happened)."""
        ckpt = str(tmp_path / "ckpt")
        cfg_partial = CrawlConfig(
            robots_txt=synth.ROBOTS_TXT, max_rounds=2, checkpoint_dir=ckpt
        )
        run_crawl(spark, corpus, [synth.page_url(synth.SEED_ID)], cfg_partial)

        cfg_resume = CrawlConfig(
            robots_txt=synth.ROBOTS_TXT, max_rounds=10, checkpoint_dir=ckpt
        )
        state = run_crawl(
            spark, corpus, [synth.page_url(synth.SEED_ID)], cfg_resume, resume=True
        )
        sim = simulate_crawl(N, max_rounds=10)
        _assert_state_matches(state, sim)

    def test_load_tolerates_missing_side_tables(self, spark, corpus, tmp_path):
        """ADVICE r2: a snapshot written before a state table existed (here
        simulated by deleting its dir) must load with that table empty, not
        raise — schema growth cannot brick existing checkpoints."""
        import os
        import shutil

        from wikifrontier import state as state_io

        ckpt = str(tmp_path / "ckpt_compat")
        cfg = CrawlConfig(
            robots_txt=synth.ROBOTS_TXT, max_rounds=2, checkpoint_dir=ckpt
        )
        run_crawl(spark, corpus, [synth.page_url(synth.SEED_ID)], cfg)
        n = state_io.latest_round(ckpt)
        for table in ("retries", "invalid_rows"):
            shutil.rmtree(os.path.join(ckpt, f"round={n}", table))
        st = state_io.load_checkpoint(spark, ckpt)
        assert st is not None and st.round == n
        assert st.retries.count() == 0 and st.invalid_rows.count() == 0
        assert st.pages.count() > 0  # the surviving tables still load


class TestRecrawl:
    def test_recrawl_due_and_requeue(self, spark, corpus):
        """S7/A5: pages past next_crawl_at re-enter the frontier with
        link-graph depth (coalesce 0 for the seed), and a recrawl bumps
        total_crawl_attempts without changing the page set."""
        from datetime import timedelta

        from wikifrontier.frontier import recrawl_due

        cfg = CrawlConfig(robots_txt=synth.ROBOTS_TXT, max_rounds=10)
        state = run_crawl(spark, corpus, [synth.page_url(synth.SEED_ID)], cfg)
        n_pages = state.pages.count()

        # nothing is due before the 8-day horizon
        assert recrawl_due(state, cfg.crawl_epoch + timedelta(days=1)).count() == 0

        # everything SUCCESS-crawled is due after it; depth is recovered
        # from the link graph (min incoming depth), 0 only for urls with
        # no incoming link rows (A5 — db_reader.py:127-151)
        far = cfg.crawl_epoch + timedelta(days=30)
        due = {r["url"]: r["depth"] for r in recrawl_due(state, far).collect()}
        n_success = state.pages.filter(F.col("last_crawl_status") == "SUCCESS").count()
        assert len(due) == n_success
        link_depths = {
            r["url"]: r["d"]
            for r in state.links.groupBy("url").agg(F.min("depth").alias("d")).collect()
        }
        for url, depth in due.items():
            assert depth == link_depths.get(url, 0), url

        # one more round with recrawl enabled: attempts bump, no new pages
        from dataclasses import replace

        from wikifrontier.frontier import run_round

        cfg2 = replace(
            cfg,
            enable_recrawl=True,
            max_rounds=state.round + 1,
            budget_per_round=25,
            crawl_epoch=far,
        )
        state2, _ = run_round(spark, state, corpus, cfg2)
        assert state2.pages.count() == n_pages
        bumped = state2.pages.filter(F.col("total_crawl_attempts") >= 2).count()
        assert bumped >= 25  # the popped recrawl batch was re-fetched


class TestStatusRetryDlq:
    """Round-2 fidelity additions: SKIPPED status, the 6-way error
    taxonomy, bounded fetch retry, and the invalid-rows DLQ."""

    def test_skipped_for_robots_denied_seed(self, spark, corpus):
        """Seeds bypass the scheduler filter, so a robots-denied seed must
        be declined at fetch time with SKIPPED (crawl_status.py:4-7) and
        never hit the corpus join."""
        cfg = CrawlConfig(robots_txt=synth.ROBOTS_TXT, max_rounds=3)
        state = run_crawl(
            spark, corpus,
            [synth.page_url(synth.SEED_ID), synth.blocked_url(1)], cfg,
        )
        row = state.pages.filter(F.col("url") == synth.blocked_url(1)).collect()
        assert len(row) == 1
        assert row[0]["last_crawl_status"] == "SKIPPED"
        assert row[0]["http_status_code"] is None
        assert row[0]["html_content_hash"] is None
        assert row[0]["failed_crawl_attempts"] == 0  # insert never counts
        assert row[0]["last_error_seen"].startswith("SKIPPED")

    def test_error_taxonomy_deterministic(self, spark, corpus):
        """FAILED pages carry one of the reference's 6 error classes,
        derived reproducibly from the url (crawler_types.py:8-40)."""
        import hashlib

        from wikifrontier.frontier import ERROR_TYPES

        cfg = CrawlConfig(robots_txt=synth.ROBOTS_TXT, max_rounds=10)
        state = run_crawl(spark, corpus, [synth.page_url(synth.SEED_ID)], cfg)
        failed = state.pages.filter(F.col("last_crawl_status") == "FAILED").collect()
        assert failed  # Missing_ links guarantee misses
        for r in failed:
            nib = hashlib.sha256(r["url"].encode()).hexdigest()[0]
            want = ERROR_TYPES[int(nib, 16) % 6]
            assert r["last_error_seen"] == f"{want}: request failed", r["url"]

    def test_fetch_retry_bounded(self, spark, corpus):
        """download_retry analogue: a missing url is re-fetched
        fetch_retries times, attempt counters accumulate, then the
        frontier drains (no infinite retry loop)."""
        cfg = CrawlConfig(
            robots_txt=synth.ROBOTS_TXT, max_rounds=16, fetch_retries=2
        )
        state = run_crawl(spark, corpus, [synth.page_url(synth.SEED_ID)], cfg)
        failed = state.pages.filter(
            F.col("last_crawl_status") == "FAILED"
        ).collect()
        assert failed
        for r in failed:
            assert r["total_crawl_attempts"] == 3, r["url"]  # 1 + 2 retries
            assert r["failed_crawl_attempts"] == 2, r["url"]
        assert all(r["attempts"] == 3 for r in state.retries.collect())
        assert state.pending.isEmpty()
        # retries must not disturb the SUCCESS page set
        base = run_crawl(
            spark, corpus, [synth.page_url(synth.SEED_ID)],
            CrawlConfig(robots_txt=synth.ROBOTS_TXT, max_rounds=16),
        )
        assert (
            state.pages.filter(F.col("last_crawl_status") == "SUCCESS").count()
            == base.pages.filter(F.col("last_crawl_status") == "SUCCESS").count()
        )

    def test_dlq_empty_for_wellformed_corpus(self, spark, corpus):
        """Parsed wiki links are always schema-valid, so the DLQ stays
        empty on the synthetic corpus — and the table exists/loads."""
        cfg = CrawlConfig(robots_txt=synth.ROBOTS_TXT, max_rounds=4)
        state = run_crawl(spark, corpus, [synth.page_url(synth.SEED_ID)], cfg)
        assert state.invalid_rows.count() == 0
        assert state.invalid_rows.columns == [
            "url", "depth", "source_page_url", "reject_reason", "rejected_round"
        ]


class TestInMemoryCompaction:
    def test_compact_every_preserves_state(self, spark, corpus):
        """compact_every folds the event log into localCheckpointed bases
        mid-crawl; the final pages/page_content/links tables must be
        row-identical to the uncompacted crawl (same combine algebra as
        the durable checkpoint, which TestCheckpointResume pins)."""
        from dataclasses import replace

        cfg = CrawlConfig(robots_txt=synth.ROBOTS_TXT, max_rounds=6)
        plain = run_crawl(spark, corpus, [synth.page_url(synth.SEED_ID)], cfg)
        compacted = run_crawl(
            spark, corpus, [synth.page_url(synth.SEED_ID)],
            replace(cfg, compact_every=2),
        )
        for table in ("pages", "page_content", "links"):
            a = sorted(map(tuple, getattr(plain, table).collect()))
            b = sorted(map(tuple, getattr(compacted, table).collect()))
            assert a == b, table


class TestCheckpointEvery:
    def test_amortized_checkpoint_resume(self, spark, corpus, tmp_path):
        """checkpoint_every=3 writes rounds 3,6,… plus the final round;
        resume from the amortized snapshots reproduces the full crawl."""
        import os

        ckpt = str(tmp_path / "ckpt_k3")
        cfg = CrawlConfig(
            robots_txt=synth.ROBOTS_TXT, max_rounds=5,
            checkpoint_dir=ckpt, checkpoint_every=3,
        )
        run_crawl(spark, corpus, [synth.page_url(synth.SEED_ID)], cfg)
        rounds = sorted(
            int(e.split("=")[1])
            for e in os.listdir(ckpt)
            if e.startswith("round=")
            and os.path.exists(os.path.join(ckpt, e, "_MANIFEST.json"))
        )
        assert 3 in rounds and max(rounds) == 5 and 4 not in rounds

        cfg_resume = CrawlConfig(
            robots_txt=synth.ROBOTS_TXT, max_rounds=10,
            checkpoint_dir=ckpt, checkpoint_every=3,
        )
        state = run_crawl(
            spark, corpus, [synth.page_url(synth.SEED_ID)], cfg_resume, resume=True
        )
        sim = simulate_crawl(N, max_rounds=10)
        _assert_state_matches(state, sim)
