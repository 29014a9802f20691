"""Prometheus exposition export: reference-parity counter names, correct
sums over rounds, parseable text format."""

from __future__ import annotations

import re

from wikifrontier import metrics_export, schemas


def _metrics_df(spark, rows):
    schema = schemas.ddl_to_schema(schemas.METRICS_DDL)
    return spark.createDataFrame(rows, schema)


def _parse(text: str) -> dict[str, int]:
    """{'name{labels}': value} for every sample line."""
    out = {}
    for line in text.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        key, value = line.rsplit(" ", 1)
        out[key] = int(value)
    return out


def test_counters_sum_rounds_and_match_reference_names(spark):
    cols = [f.name for f in schemas.ddl_to_schema(schemas.METRICS_DDL)]
    r0 = dict.fromkeys(cols, 0) | {
        "round": 0, "urls_popped": 10, "fetch_success": 9, "fetch_failed": 1,
        "pages_parsed": 9, "links_extracted": 90, "links_dedup_dropped": 5,
        "filtered_depth": 2, "filtered_domain": 3, "filtered_robots": 1,
        "links_claimed": 79,
    }
    r1 = dict.fromkeys(cols, 0) | {
        "round": 1, "urls_popped": 79, "fetch_success": 70, "fetch_failed": 9,
        "pages_parsed": 70, "links_extracted": 700, "links_dedup_dropped": 100,
        "filtered_prefix": 11, "filtered_home_page": 4, "links_claimed": 585,
    }
    df = _metrics_df(
        spark, [tuple(r[c] for c in cols) for r in (r0, r1)]
    )
    text = metrics_export.prometheus_text(df)
    samples = _parse(text)

    # reference counter names, per components/*/monitoring/metrics.py
    assert samples['crawl_pages_total{status="SUCCESS"}'] == 79
    assert samples['crawl_pages_total{status="FAILED"}'] == 10
    assert samples["pages_parsed_total"] == 79
    assert samples["scheduler_links_received_total"] == 790
    assert samples["scheduler_links_deduplicated_total"] == 105
    assert samples['scheduler_links_filtered_total{filter_type="depth"}'] == 2
    assert samples['scheduler_links_filtered_total{filter_type="domain"}'] == 3
    assert samples['scheduler_links_filtered_total{filter_type="prefix"}'] == 11
    assert (
        samples['scheduler_links_filtered_total{filter_type="home_page"}'] == 4
    )
    assert (
        samples['scheduler_links_filtered_total{filter_type="robots_txt"}'] == 1
    )
    assert samples["scheduler_links_scheduled_total"] == 664
    assert samples["db_reader_links_popped_total"] == 89
    assert samples["wikifrontier_rounds_total"] == 2

    # exposition hygiene: every sample has HELP+TYPE, counters only
    names = {k.split("{")[0] for k in samples}
    for n in names:
        assert f"# TYPE {n} counter" in text
        assert re.search(rf"^# HELP {n} ", text, re.M)


def test_empty_metrics_render_zero(spark):
    df = _metrics_df(spark, [])
    samples = _parse(metrics_export.prometheus_text(df))
    assert samples["wikifrontier_rounds_total"] == 0
    assert samples['crawl_pages_total{status="SUCCESS"}'] == 0


def test_textfile_write(spark, tmp_path):
    cols = [f.name for f in schemas.ddl_to_schema(schemas.METRICS_DDL)]
    row = dict.fromkeys(cols, 0) | {"round": 0, "urls_popped": 5}
    df = _metrics_df(spark, [tuple(row[c] for c in cols)])
    out = tmp_path / "wikifrontier.prom"
    metrics_export.write_textfile(df, str(out))
    assert "db_reader_links_popped_total 5" in out.read_text()
