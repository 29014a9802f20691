"""spark-submit entrypoint e2e: crawl → checkpoint → report (JSON and
Prometheus). Runs in-process — ``get_spark`` getOrCreate's the suite's
session, so this exercises argument plumbing + output contracts, not JVM
spin-up."""

from __future__ import annotations

import json

from wikifrontier import cli


def test_crawl_report_roundtrip(spark, tmp_path, capsys):
    ckpt = str(tmp_path / "cli_ckpt")
    rc = cli.main([
        "crawl", "--pages", "300", "--rounds", "4", "--budget", "60",
        "--checkpoint", ckpt, "--checkpoint-keep-last", "2",
    ])
    assert rc == 0
    crawl_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert crawl_out["pages"] > 0
    assert crawl_out["rounds"] == 4

    rc = cli.main(["report", "--checkpoint", ckpt])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["round"] == 4
    assert report["pages"] == crawl_out["pages"]
    assert report["pending"] == crawl_out["pending"]

    prom_file = tmp_path / "wikifrontier.prom"
    rc = cli.main([
        "report", "--checkpoint", ckpt, "--prometheus",
        "--textfile", str(prom_file),
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "# TYPE crawl_pages_total counter" in text
    assert 'crawl_pages_total{status="SUCCESS"}' in text
    # the counter agrees with the state table the JSON report exposed
    success = int(
        next(
            line.rsplit(" ", 1)[1]
            for line in text.splitlines()
            if line.startswith('crawl_pages_total{status="SUCCESS"}')
        )
    )
    assert success > 0
    assert prom_file.read_text() == text

    # linkrank over the same checkpoint: scores the crawled link graph
    out_pq = str(tmp_path / "linkrank.parquet")
    rc = cli.main([
        "linkrank", "--checkpoint", ckpt, "--top", "5", "--out", out_pq,
    ])
    assert rc == 0
    lr = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert lr["nodes"] > 0
    assert len(lr["top"]) == 5
    # scores descending, mass conserved to ~1 (dangling redistribution)
    prs = [t["pr"] for t in lr["top"]]
    assert prs == sorted(prs, reverse=True)
    import pyspark.sql.functions as F
    full = spark.read.parquet(out_pq)
    assert full.count() == lr["nodes"]
    total = full.agg(F.sum("pr")).first()[0]
    assert abs(total - 1.0) < 1e-6

    # linkrank --algo hits: hub/authority split over the same graph
    hits_pq = str(tmp_path / "hits.parquet")
    rc = cli.main([
        "linkrank", "--checkpoint", ckpt, "--algo", "hits",
        "--top", "5", "--out", hits_pq,
    ])
    assert rc == 0
    hr = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert hr["nodes"] == lr["nodes"]  # same node set as pagerank
    auths = [t["auth"] for t in hr["top"]]
    assert auths == sorted(auths, reverse=True)
    hfull = spark.read.parquet(hits_pq)
    assert hfull.count() == hr["nodes"]
    # both L1-normalized score vectors sum to 1
    sums = hfull.agg(F.sum("hub"), F.sum("auth")).first()
    assert abs(sums[0] - 1.0) < 1e-6 and abs(sums[1] - 1.0) < 1e-6


def test_report_missing_checkpoint(spark, tmp_path, capsys):
    rc = cli.main(["report", "--checkpoint", str(tmp_path / "nope")])
    assert rc == 1
    assert "error" in json.loads(capsys.readouterr().out.strip())


def test_plan_over_checkpoint(spark, tmp_path, capsys):
    """crawl → checkpoint → plan: the budget planner reads the pending
    frontier (single-host synthetic corpus ⇒ en.wikipedia.org is the
    critical host) and its arithmetic matches the report's pending count."""
    ckpt = str(tmp_path / "plan_ckpt")
    rc = cli.main([
        "crawl", "--pages", "300", "--rounds", "4", "--budget", "60",
        "--checkpoint", ckpt,
    ])
    assert rc == 0
    crawl_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    rc = cli.main(["plan", "--checkpoint", ckpt, "--per-host-cap", "10"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    summary, hosts = lines[-1], lines[:-1]
    assert summary["per_host_cap"] == 10
    assert summary["n_hosts"] == len(hosts) == 1
    h = hosts[0]
    assert h["host"] == "en.wikipedia.org" and h["is_critical"]
    assert h["n_pending"] == crawl_out["pending"]
    assert h["next_round_alloc"] == min(10, h["n_pending"])
    assert h["rounds_to_drain"] == -(-h["n_pending"] // 10)
    assert summary["drain_bound_rounds"] == h["rounds_to_drain"]


def test_diff_between_checkpoints(spark, tmp_path, capsys):
    """crawl shallow → checkpoint A; crawl deeper → checkpoint B; `diff`
    must classify B-only urls as added, none removed, and every shared
    url unchanged (the synthetic corpus is static between runs)."""
    ckpt_a = str(tmp_path / "ckpt_a")
    ckpt_b = str(tmp_path / "ckpt_b")
    rc = cli.main([
        "crawl", "--pages", "300", "--rounds", "2", "--budget", "60",
        "--checkpoint", ckpt_a,
    ])
    assert rc == 0
    a_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rc = cli.main([
        "crawl", "--pages", "300", "--rounds", "4", "--budget", "60",
        "--checkpoint", ckpt_b,
    ])
    assert rc == 0
    b_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert b_out["pages"] > a_out["pages"]

    rc = cli.main(["diff", "--old", ckpt_a, "--new", ckpt_b, "--sample", "3"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(lines[0])
    assert summary["removed"] == 0
    assert summary["changed"] == 0
    assert summary["added"] > 0
    assert summary["added"] + summary["unchanged"] >= b_out["pages"] - 5
    samples = [json.loads(line) for line in lines[1:]]
    assert samples and all(s["change"] == "added" for s in samples)


def test_diff_missing_checkpoint(spark, tmp_path, capsys):
    rc = cli.main([
        "diff", "--old", str(tmp_path / "nope"), "--new", str(tmp_path / "nope2"),
    ])
    assert rc == 1
    assert "error" in json.loads(capsys.readouterr().out.strip())


def test_health_over_checkpoint(spark, tmp_path, capsys):
    """crawl → checkpoint → health: the breaker reads page statuses (the
    synthetic corpus's Missing_ links fail, but never >=10 per host so
    everything stays closed), the aging profile reads the pending
    frontier, and the summary line reconciles with the state tables."""
    ckpt = str(tmp_path / "health_ckpt")
    rc = cli.main([
        "crawl", "--pages", "300", "--rounds", "3", "--budget", "40",
        "--checkpoint", ckpt,
    ])
    assert rc == 0
    crawl_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    rc = cli.main(["health", "--checkpoint", ckpt, "--starve-after", "1"])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    summary = lines[-1]
    assert summary["round"] == 3
    assert summary["pending_total"] == crawl_out["pending"]
    assert summary["hosts_total"] >= 1
    depth_rows = [x for x in lines[:-1] if "depth" in x]
    assert depth_rows and all(r["n_pending"] > 0 for r in depth_rows)
    # budget 40 over 3 rounds leaves older-than-1-round pending urls
    assert summary["starving_total"] >= 0


def test_health_missing_checkpoint(spark, tmp_path, capsys):
    rc = cli.main(["health", "--checkpoint", str(tmp_path / "nope")])
    assert rc == 1
    assert "error" in json.loads(capsys.readouterr().out.strip())


def test_graph_over_checkpoint(spark, tmp_path, capsys):
    """crawl → checkpoint → graph: the host rollup reads the discovered
    link graph, the stats line reconciles (single-host synthetic corpus
    → 1 host, all pairs internal), and the rank list sums to ~1."""
    ckpt = str(tmp_path / "graph_ckpt")
    rc = cli.main([
        "crawl", "--pages", "300", "--rounds", "3", "--budget", "40",
        "--checkpoint", ckpt,
    ])
    assert rc == 0
    capsys.readouterr()

    rc = cli.main(["graph", "--checkpoint", ckpt, "--top", "5"])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    stats, ranks = lines[0], lines[1:]
    assert stats["round"] == 3
    assert stats["n_hosts"] >= 1
    assert stats["n_page_edges"] >= stats["n_host_pairs"]
    # synthetic corpus is single-host → every pair internal, reciprocal
    assert stats["n_self_pairs"] == stats["n_host_pairs"]
    assert ranks and abs(sum(r["host_rank"] for r in ranks) - 1.0) < 1e-6


def test_graph_missing_checkpoint(spark, tmp_path, capsys):
    rc = cli.main(["graph", "--checkpoint", str(tmp_path / "nope")])
    assert rc == 1
    assert "error" in json.loads(capsys.readouterr().out.strip())


def test_sketches_over_checkpoint(spark, tmp_path, capsys):
    """crawl → checkpoint → sketches: one HLL line per state table with
    the exact distinct-host count riding along (single-host synthetic
    corpus ⇒ exact = 1, and the small-range HLL branch must land on it
    exactly), then count-min heavy-hitter lines whose estimates respect
    the overestimate-only guarantee."""
    ckpt = str(tmp_path / "sk_ckpt")
    rc = cli.main([
        "crawl", "--pages", "300", "--rounds", "3", "--budget", "60",
        "--checkpoint", ckpt,
    ])
    assert rc == 0
    capsys.readouterr()

    rc = cli.main(["sketches", "--checkpoint", ckpt, "--top", "5"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    tables = {l["table"]: l for l in lines if "table" in l}
    assert set(tables) == {"pages", "pending"}
    for t in tables.values():
        if t.get("empty"):
            continue
        assert t["distinct_hosts_exact"] == 1  # single-host corpus
        # small-range branch: 64*ln(64/63) = 1.0079
        assert abs(t["hll_estimate"] - 1.0) < 0.05
        assert t["rel_err"] <= 0.05
    hh = [l for l in lines if "cms_estimate" in l]
    if not tables["pending"].get("empty"):
        assert hh and hh[0]["host"] == "en.wikipedia.org"
        for l in hh:
            assert l["overcount"] >= 0


def test_qa_over_checkpoint(spark, tmp_path, capsys):
    """crawl → checkpoint → qa: the corpus-quality audit reads the
    parsed text and emits one Gopher and one C4 rollup line."""
    ckpt = str(tmp_path / "qa_ckpt")
    rc = cli.main([
        "crawl", "--pages", "300", "--rounds", "3", "--budget", "60",
        "--checkpoint", ckpt,
    ])
    assert rc == 0
    capsys.readouterr()
    rc = cli.main(["qa", "--checkpoint", ckpt])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    gopher = next(l for l in lines if l["report"] == "gopher")
    c4 = next(l for l in lines if l["report"] == "c4_lines")
    assert gopher["n_docs"] > 0
    assert 0 <= gopher["n_keep"] <= gopher["n_docs"]
    assert gopher["keep_rate"] is not None
    # per-rule fail counts present and sane
    for k in ("fail_wordcount", "fail_stop", "fail_alpha"):
        assert 0 <= gopher[k] <= gopher["n_docs"]
    assert c4["n_docs"] == gopher["n_docs"]
    assert c4["n_lines"] >= c4["n_kept"]
    assert (
        c4["n_kept"] + c4["n_short"] + c4["n_nopunct"]
        + c4["n_banned"] + c4["n_dupline"] == c4["n_lines"]
    )


def test_qa_missing_checkpoint(spark, tmp_path, capsys):
    rc = cli.main(["qa", "--checkpoint", str(tmp_path / "nope")])
    assert rc == 1
    assert "error" in json.loads(capsys.readouterr().out.strip())


def test_linkrank_opic_and_trustrank(spark, tmp_path, capsys):
    """linkrank --algo opic / trustrank over a real crawl checkpoint:
    both score the full discovered link graph; trustrank seeds from the
    crawl's depth-0 pages and conserves trust mass."""
    ckpt = str(tmp_path / "lr_ckpt")
    rc = cli.main([
        "crawl", "--pages", "300", "--rounds", "3", "--budget", "60",
        "--checkpoint", ckpt,
    ])
    assert rc == 0
    capsys.readouterr()

    rc = cli.main(["linkrank", "--checkpoint", ckpt, "--algo", "opic", "--top", "5"])
    assert rc == 0
    op = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert op["algo"] == "opic" and op["nodes"] > 0
    scores = [t["importance"] for t in op["top"]]
    assert scores == sorted(scores, reverse=True) and scores[0] > 0

    out_pq = str(tmp_path / "tr.parquet")
    rc = cli.main([
        "linkrank", "--checkpoint", ckpt, "--algo", "trustrank",
        "--top", "5", "--out", out_pq,
    ])
    assert rc == 0
    tr = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert tr["algo"] == "trustrank" and tr["nodes"] == op["nodes"]
    import pyspark.sql.functions as F
    full = spark.read.parquet(out_pq)
    total = full.agg(F.sum("tr")).first()[0]
    assert abs(total - 1.0) < 1e-6  # trust mass conserved
