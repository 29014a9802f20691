"""Gzip HTML file store — reference S3 (sink) + S4 (scan) for real.

The reference crawler writes each fetched page as an individual
``{url_hash}.html.gz`` file (components/crawler/core/downloader.py:8-44)
and the parser re-reads it by path (components/parser/services/
parser_service.py gzip open). The engine's primary design keeps html as a
``binary`` column (SURVEY.md §1.1), but a migration from the reference
needs to READ its existing gz store — and occasionally to WRITE one for
tools that expect the file layout. Both directions here are distributed:

* ``write_gzip_store`` — one ``.html.gz`` file per page, written from
  executor tasks via ``mapInPandas`` (no driver collect); file name =
  sha256(url) exactly like the reference's ``compressed_filepath``.
* ``read_gzip_store`` — Spark's ``binaryFile`` source over the directory
  → gunzip per Arrow batch. Pushdown: ``pathGlobFilter`` prunes at the
  file listing; the binaryFile reader parallelizes over files.

``storage_dir`` must be executor-visible (same contract as any Spark
checkpoint location).
"""

from __future__ import annotations

import gzip
import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wikifrontier import fsio


def write_gzip_store(pages: DataFrame, storage_dir: str) -> DataFrame:
    """S3: write each (url, html) row as ``{sha256(url)}.html.gz`` under
    ``storage_dir``; returns (url, filepath) rows. Executor-side writes
    through the ``fsio`` shim (tmp+rename on POSIX so concurrent
    re-reads never see a torn file; direct single-object PUT on
    rename-less object stores — the name is a pure function of the url,
    so retries/speculation overwrite with identical bytes), gzip mtime
    pinned to 0 so output bytes are deterministic."""
    import pandas as pd

    fsio.get_io(storage_dir).makedirs(storage_dir)

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        io_ = fsio.get_io(storage_dir)
        for pdf in batches:
            out = {"url": [], "filepath": []}
            for url, html in zip(pdf["url"], pdf["html"]):
                name = hashlib.sha256(str(url).encode()).hexdigest()
                path = io_.join(storage_dir, f"{name}.html.gz")
                raw = bytes(html) if html is not None else b""
                io_.write_bytes(path, gzip.compress(raw, mtime=0))
                out["url"].append(url)
                out["filepath"].append(path)
            yield pd.DataFrame(out)

    return pages.select("url", "html").mapInPandas(
        write, schema="url string, filepath string"
    )


def read_gzip_store(spark: SparkSession, storage_dir: str) -> DataFrame:
    """S4: scan a gz-per-page store into (filepath, html) rows.

    binaryFile source (file listing parallelized, pathGlobFilter pruning)
    → gunzip inside Arrow batches. Join the result back on the sha256
    name (or carry a url manifest) to recover the url key."""
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.html.gz")
        # strip_scheme: the test-only writeonce+file:// fake-object-store
        # scheme is ours, not Hadoop's — Spark reads the underlying dir.
        # Real object-store URIs (s3a://...) pass through to Hadoop.
        .load(fsio.strip_scheme(storage_dir))
        .select("path", "content")
    )

    def gunzip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "filepath": pdf["path"],
                    "html": [
                        gzip.decompress(bytes(b)) if b is not None else b""
                        for b in pdf["content"]
                    ],
                }
            )

    return files.mapInPandas(gunzip, schema="filepath string, html binary")


def roundtrip_check(pages: DataFrame, read_back: DataFrame) -> DataFrame:
    """(url, ok) — does the store round-trip byte-identically? Joins the
    original corpus to the re-read rows on the sha256(url) file name."""
    name = F.concat(F.sha2(F.col("url"), 256), F.lit(".html.gz"))
    orig = pages.select(
        "url", name.alias("fname"), F.sha2(F.col("html"), 256).alias("h_orig")
    )
    got = read_back.select(
        F.element_at(F.split(F.col("filepath"), "/"), -1).alias("fname"),
        F.sha2(F.col("html"), 256).alias("h_read"),
    )
    return orig.join(got, "fname", "left").select(
        "url",
        (F.col("h_read").isNotNull() & (F.col("h_read") == F.col("h_orig"))).alias("ok"),
    )
