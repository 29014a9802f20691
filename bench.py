"""Benchmark harness.

Default mode: runs the headline crawl (synthetic corpus sized to the sf of
$SPARK_GRAFT_SF_DIR) plus every driver query at that sf, on
local[$SPARK_GRAFT_CPUS], and prints ONE JSON line to stdout:

    {"metric": "crawl_pages_per_sec", "value": N, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": 0.1, ...}

`--scaling` mode: re-runs the crawl benchmark at two parallelism levels
(local[8] vs local[32] — the sandbox stand-in for N vs 4N executors,
BASELINE.json north_rule) in fresh subprocesses and reports throughput at
both plus scaling efficiency. Results land in BENCH_scaling.json and are
summarized in BASELINE.md.

Everything chatty goes to stderr; stdout carries exactly the JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEFAULT_SF_DIR = "/root/testdata/sf0.1"
# synthetic crawl corpus: pages per unit sf (sf0.1 → 20k pages)
CRAWL_PAGES_PER_SF = 200_000


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def get_session(cpus: int):
    from wikifrontier.session import get_spark

    return get_spark(
        master=f"local[{cpus}]",
        app_name="wikifrontier-bench",
        shuffle_partitions=max(cpus, 8),
    )


def bench_crawl(spark, n_pages: int) -> dict:
    """Headline: URLs fetched+parsed per second over the synthetic corpus
    (unbudgeted BFS, generous depth so most of the corpus is visited)."""
    from wikifrontier import synth
    from wikifrontier.frontier import CrawlConfig, run_crawl

    corpus = synth.corpus_df(spark, n_pages).cache()
    corpus.count()  # materialize outside the timed section
    cfg = CrawlConfig(
        max_depth=8,
        budget_per_round=None,
        per_host_cap=None,
        max_rounds=12,
        robots_txt=synth.ROBOTS_TXT,
        collect_metrics=False,
    )
    t0 = time.time()
    state = run_crawl(spark, corpus, [synth.page_url(0)], cfg)
    crawled = state.pages.count()
    parsed = state.page_content.count()
    edges = state.links.count()
    elapsed = time.time() - t0
    corpus.unpersist()
    return {
        "crawl_sec": round(elapsed, 3),
        "pages_crawled": crawled,
        "pages_parsed": parsed,
        "link_edges": edges,
        "pages_per_sec": round(crawled / elapsed, 2),
    }


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    timings: dict[str, float] = {}
    for name, fn in sorted(entrymod.queries().items()):
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        log(f"  {name}: {timings[name]}s")
    return timings


def run_bench(crawl_only: bool = False) -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_of(sf_dir)
    n_pages = max(int(CRAWL_PAGES_PER_SF * sf), 200)

    spark = get_session(cpus)
    log(f"bench: sf={sf} sf_dir={sf_dir} cpus={cpus} crawl_pages={n_pages}")

    crawl = bench_crawl(spark, n_pages)
    log(f"  crawl: {crawl}")
    queries = {} if crawl_only else bench_queries(spark, sf_dir)

    total = crawl["crawl_sec"] + sum(queries.values())
    result = {
        "metric": "crawl_pages_per_sec",
        "value": crawl["pages_per_sec"],
        "unit": "sec",
        "queries": {"crawl": crawl["crawl_sec"], **queries},
        "sf": sf,
        "cpus": cpus,
        "crawl": crawl,
        "total_sec": round(total, 3),
    }
    spark.stop()
    return result


def run_scaling() -> dict:
    """Same crawl at local[8] and local[32] (fresh JVM each) → throughput
    at both + scaling efficiency = (T8/T32) / (32/8)."""
    out = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--crawl-only"],
            capture_output=True,
            text=True,
            env=env,
            timeout=3600,
        )
        line = proc.stdout.strip().splitlines()[-1]
        out[cpus] = json.loads(line)
        log(f"local[{cpus}]: {out[cpus]['crawl']}")
    t8 = out[8]["crawl"]["pages_per_sec"]
    t32 = out[32]["crawl"]["pages_per_sec"]
    eff = (t32 / t8) / (32 / 8)
    return {
        "metric": "scaling_efficiency_8_to_32_cores",
        "value": round(eff, 3),
        "unit": "ratio",
        "throughput_local8": t8,
        "throughput_local32": t32,
        "speedup": round(t32 / t8, 3),
        "ideal_speedup": 4.0,
        "sf": out[32]["sf"],
        "queries": {},
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        result = run_scaling()
        with open(os.path.join(REPO, "BENCH_scaling.json"), "w") as f:
            json.dump(result, f, indent=1)
    else:
        result = run_bench(crawl_only="--crawl-only" in sys.argv)
    print(json.dumps(result))
