"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns plus a typed metadata struct —
the same bytes-in-a-column decision the engine already made for crawled
HTML (SURVEY.md §1.1: the reference's gzip-file-per-page store,
components/crawler/core/downloader.py:8-44, becomes an `html:binary`
column). Decode / feature-extract runs as Arrow-batched ``mapInPandas`` so
each Python worker sees a columnar batch, never a row.

The actual codec step is STUBBED: this container has no image/audio
libraries, so ``decode_media`` raises ``NotImplementedError`` unless the
deterministic fake decoder is requested. Everything Spark-side — schema,
partitioning, UDF signature, batch shape — is real and tested.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_DDL = (
    "media_id long, kind string, byte_len long, content_sha string, "
    "format string"
)

FEATURE_DDL = (
    "media_id long, kind string, n_frames int, width int, height int, "
    "feat_checksum string"
)

# deterministic fake media header: first byte of the payload selects the
# container format, mirroring real magic-number sniffing.
FORMATS = ("riff", "png", "jpeg", "mp4")


def attach_media(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque media payload column from text bytes (the
    sandbox stand-in for reading real blobs) + its typed metadata.

    Column semantics (not the synthesis) are the operator contract:
    `payload binary`, `kind string`, and metadata derived purely from the
    payload bytes.
    """
    payload = F.encode(F.col(text), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(*[F.lit(k) for k in ("image", "audio", "video")]),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("kind"),
        payload.alias("payload"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata from the opaque payload — pure column expressions
    (length, content hash, magic-byte format sniff). No decode needed."""
    first_byte = F.expr("CAST(substring(payload, 1, 1) AS STRING)")
    fmt = F.element_at(
        F.array(*[F.lit(f) for f in FORMATS]),
        (F.ascii(first_byte) % len(FORMATS) + 1).cast("int"),
    )
    return media.select(
        "media_id",
        "kind",
        F.length(F.col("payload")).cast("long").alias("byte_len"),
        F.sha2(F.col("payload"), 256).alias("content_sha"),
        fmt.alias("format"),
    )


def decode_media(payload: bytes, kind: str, fake: bool = False) -> dict:
    """Decode one payload to (frames, width, height). REAL decode is
    unavailable in this container — PIL/ffmpeg/soundfile are not installed —
    so callers must opt into the deterministic fake."""
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio codecs not present in this "
            "environment; pass fake=True for the deterministic stand-in"
        )
    n = len(payload)
    return {
        "n_frames": 1 if kind == "image" else (n % 240) + 1,
        "width": 16 * ((n % 64) + 1),
        "height": 9 * ((n % 64) + 1),
    }


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    The per-batch function is the real plumbing a codec-backed deployment
    would use: columnar in, columnar out, one Python process per task, no
    driver collect. Only `decode_media(fake=True)` inside is a stand-in.
    """
    import hashlib

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "kind": [],
                "n_frames": [],
                "width": [],
                "height": [],
                "feat_checksum": [],
            }
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                raw = bytes(payload) if payload is not None else b""
                meta = decode_media(raw, kind, fake=True)
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_frames"].append(meta["n_frames"])
                out["width"].append(meta["width"])
                out["height"].append(meta["height"])
                out["feat_checksum"].append(
                    hashlib.sha256(raw[:64]).hexdigest()[:16]
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURE_DDL)
