"""wikifrontier — a PySpark-native BFS-frontier crawl/parse engine.

A from-scratch reimplementation (NOT a port) of the query/data-processing
capabilities of ThatDudeAlex/Wiki-Distributed-Crawler-And-Parser as an
iterative Spark DataFrame job over a Common-Crawl-style `web_pages` table
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

Layout (see SURVEY.md §7):
  schemas.py      StructTypes for all state tables
  synth.py        deterministic synthetic corpus generator (FIXTURES.md)
  extract.py      pure-Python content/link extraction (importable w/o Spark)
  udfs.py         Arrow-batched pandas UDFs wrapping extract.py
  filters.py      scheduler filter chain F1–F6 as Column expressions
  seen.py         URL-seen dedup (D1) + deterministic claim (D2)
  politeness.py   per-host batch caps / skew salting (§2.9)
  frontier.py     the BFS round loop (§3)
  state.py        parquet checkpoint/resume with round manifests
  simulator.py    pure-Python reference simulator (test oracle)
  oracles.py      DuckDB SQL builders sharing constants with synth.py
  functions/      training-data pipeline ops (dedup, similarity, text, multimodal)
"""

__version__ = "0.1.0"
