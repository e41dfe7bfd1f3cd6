"""Multimodal queries: binary payload columns with Arrow-batched
feature extraction (the one place a pandas stage is the right tool —
opaque bytes cannot be processed by relational builtins).

The corpus has no real media, so `documents.text` bytes stand in for
payloads; the decode is a deterministic stub (see
operators/multimodal.py).  Because the fake features are pure byte
arithmetic over ASCII text, the DuckDB oracle can replicate them —
giving a REAL correctness check on the mapInPandas plumbing (schema,
batching, row alignment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.multimodal import (
    as_media_table,
    chunk_payload,
    extract_features,
    frame_offsets,
    resize_stub,
)
from . import query

# checksum16 = sum of the first 16 payload bytes.  The corpus text is
# ASCII, so byte values == character codes — expressible in SQL.
_FEATURES_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(list_sum(list_transform(
              generate_series(1, least(16, length(text))),
              i -> ascii(substr(text, i, 1)))) AS BIGINT) AS checksum16,
       'stubbed' AS decode_status
FROM documents
"""


@query("multimodal_features", oracle=_FEATURES_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → mapInPandas feature extraction (stub decode).

    Oracle-checked end-to-end: any batching/alignment bug in the
    Arrow exchange shows up as a value mismatch."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(as_media_table(docs))


# The offsets array is serialized to a comma-joined string at the
# query boundary: the driver's order-insensitive hash canonicalizer
# (pandas sort_values) cannot sort/hash list-valued cells, so both
# sides emit the same scalar encoding.  `frame_offsets` itself still
# returns the real array column for downstream use.
_OFFSETS_ORACLE = """
WITH m AS (
  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents
)
SELECT doc_id, n_bytes,
       array_to_string(
         CASE WHEN n_bytes >= 4
              THEN generate_series(0, n_bytes - 1, greatest(n_bytes // 4, 1))
              ELSE [0] END, ',') AS offsets_csv
FROM m
"""


_CHUNKS_ORACLE = """
WITH m AS (
  SELECT doc_id, text,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents
),
c AS (
  SELECT doc_id, text, n_bytes,
         unnest(generate_series(0, CAST((n_bytes - 1) // 256 AS BIGINT))) AS i
  FROM m WHERE n_bytes > 0
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_idx,
       CAST(least(256, n_bytes - i * 256) AS BIGINT) AS chunk_len,
       CAST(ascii(substr(text, CAST(i * 256 + 1 AS INT), 1)) AS BIGINT) AS first_byte
FROM c
"""


@query("multimodal_chunks", oracle=_CHUNKS_ORACLE)
def multimodal_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size payload chunking: each media row fans out to N chunk
    rows inside one mapInPandas pass (the audio-segmentation shape).
    The ASCII corpus lets the oracle recompute chunk length and first
    byte in SQL — a real check on the fan-out row alignment."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_payload(as_media_table(docs))


_RESIZE_ORACLE = """
WITH m AS (
  SELECT doc_id, text,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         greatest(CAST(octet_length(encode(text)) AS BIGINT) // 64, 1) AS k
  FROM documents
)
SELECT doc_id,
       CAST(8 AS INT) AS out_w,
       CAST(8 AS INT) AS out_h,
       CAST(list_sum(list_transform(
              generate_series(0, (n_bytes - 1) // k),
              i -> ascii(substr(text, CAST(i * k + 1 AS INT), 1)))) AS BIGINT)
         AS sample_checksum
FROM m WHERE n_bytes > 0
"""


@query("multimodal_resize_stub", oracle=_RESIZE_ORACLE)
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Resize' plumbing: strided byte downsample per payload inside
    mapInPandas (target dims + sample checksum).  The ASCII corpus
    lets the oracle recompute the stride walk in SQL, checking the
    batch/stride arithmetic exactly; the codec itself stays stubbed
    (no imaging libs in this environment)."""
    docs = load_table(spark, sf_dir, "documents")
    return resize_stub(as_media_table(docs))


@query("multimodal_frame_offsets", oracle=_OFFSETS_ORACLE)
def multimodal_frame_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Frame sampling' offsets into the payload — array-typed output
    (sequence with stride), the plumbing under video frame extraction.

    The array is emitted comma-joined (`offsets_csv`) so the oracle
    hash gate can canonicalize it; see module comment above."""
    docs = load_table(spark, sf_dir, "documents")
    return frame_offsets(as_media_table(docs)).select(
        "doc_id",
        "n_bytes",
        F.array_join(F.col("offsets").cast("array<string>"), ",").alias("offsets_csv"),
    )


# ---------------------------------------------------------------------------
# E186 — REAL image decode: P6 PPM payloads synthesized from the text
# bytes, parsed byte-for-byte by the stdlib decoder (header tokenizer
# + raster channel sums), features extracted in an Arrow-batched
# mapInPandas.  The oracle recomputes every decoded value from the
# text column — so a decode bug (header arithmetic, channel phase,
# truncation) fails the hash gate, which a metadata-passthrough stub
# never could.
# ---------------------------------------------------------------------------

_PPM_DECODE_ORACLE = """
WITH d AS (
  SELECT doc_id, text,
         CAST(length(text) // 24 AS BIGINT) AS h
  FROM documents
  WHERE strlen(text) = length(text) AND length(text) >= 24
),
px AS (
  SELECT doc_id, h, p,
         ascii(substr(text, CAST(p AS INTEGER), 1)) AS v
  FROM (
    SELECT doc_id, text, h, unnest(range(1, 24*h + 1)) AS p FROM d
  )
)
SELECT doc_id,
       CAST(8 AS INTEGER) AS width,
       CAST(max(h) AS INTEGER) AS height,
       CAST(SUM(CASE WHEN (p-1) % 3 = 0 THEN v END) AS BIGINT) AS sum_r,
       CAST(SUM(CASE WHEN (p-1) % 3 = 1 THEN v END) AS BIGINT) AS sum_g,
       CAST(SUM(CASE WHEN (p-1) % 3 = 2 THEN v END) AS BIGINT) AS sum_b,
       CAST(SUM(v) AS DOUBLE) / (24 * max(h)) AS mean_byte
FROM px GROUP BY doc_id
"""


@query("multimodal_image_decode", oracle=_PPM_DECODE_ORACLE)
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode over a binary column: each ASCII document's
    bytes become the RGB raster of an 8-wide P6 PPM (a real, if
    synthetic, image file), and an Arrow-batched ``mapInPandas``
    stage parses the binary — header tokenizer (width/height/maxval,
    comments allowed), raster extraction with truncation checks,
    exact per-channel byte sums.  Width and height in the output come
    from the DECODED HEADER, never from metadata carried beside the
    payload, so the oracle's recomputation from the text column
    verifies the decoder itself (channel phase, header arithmetic)
    bit-for-bit.  Compressed formats stay import-gated on PIL
    (operators/multimodal.py decode_image) — the honest boundary in
    this container.

    Scale shape: synthesis is a zero-shuffle projection; decode is
    Arrow-batched (bounded memory, no per-row Python call overhead at
    the batch level); the output is one typed row per image —
    downstream relational ops never touch the binary again.
    """
    from ..operators.multimodal import decode_ppm_features, synth_ppm

    docs = load_table(spark, sf_dir, "documents")
    feats = decode_ppm_features(synth_ppm(docs))
    return feats.select(
        "doc_id",
        "width",
        "height",
        "sum_r",
        "sum_g",
        "sum_b",
        (
            (F.col("sum_r") + F.col("sum_g") + F.col("sum_b")).cast("double")
            / (F.lit(3) * F.col("width") * F.col("height")).cast("double")
        ).alias("mean_byte"),
    )


# ---------------------------------------------------------------------------
# E187 — REAL audio decode: RIFF/WAV PCM payloads synthesized
# JVM-side (little-endian sizes via hex byte-swap — zero Python in
# synthesis), chunk-walked by the stdlib decoder.  A second genuinely
# parsed binary grammar after E186's PPM: sized LE chunks with
# word-alignment instead of a text header.
# ---------------------------------------------------------------------------

_WAV_DECODE_ORACLE = """
WITH d AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
  FROM documents
  WHERE strlen(text) = length(text) AND length(text) >= 1
),
px AS (
  SELECT doc_id, n, ascii(substr(text, CAST(p AS INTEGER), 1)) AS v
  FROM (SELECT doc_id, text, n, unnest(range(1, n + 1)) AS p FROM d)
)
SELECT doc_id,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST(max(n) AS BIGINT) AS n_samples,
       CAST(SUM(v) AS BIGINT) AS sum_samples,
       CAST(MAX(v) AS INTEGER) AS max_sample,
       CAST(max(n) * 125 AS BIGINT) AS duration_us,
       CAST(SUM(v) AS DOUBLE) / max(n) AS mean_amplitude
FROM px GROUP BY doc_id
"""


@query("multimodal_audio_decode", oracle=_WAV_DECODE_ORACLE)
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode over a binary column: each ASCII document's
    bytes become the 8-bit PCM stream of an 8 kHz mono RIFF/WAV file
    (synthesized entirely JVM-side, little-endian chunk sizes via a
    hex byte-swap), and an Arrow-batched ``mapInPandas`` stage walks
    the chunk list for real — unknown chunks skipped by declared
    size with word alignment, fmt fields taken from the DECODED fmt
    chunk, samples from the data chunk.  duration_us = n·10⁶/rate is
    exact (125 µs per sample at 8 kHz); mean amplitude is the one
    double division.  The oracle recomputes everything from the text
    bytes, so chunk-walk or fmt-parse bugs fail the hash gate.

    Scale shape: synthesis is a zero-shuffle, zero-Python projection;
    decode is Arrow-batched with bounded memory; output is one typed
    row per clip.
    """
    from ..operators.multimodal import (
        WAV_SAMPLE_RATE,
        decode_wav_features,
        synth_wav,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = decode_wav_features(synth_wav(docs))
    return feats.select(
        "doc_id",
        "sample_rate",
        "n_samples",
        "sum_samples",
        "max_sample",
        F.expr(f"CAST(n_samples * 1000000 div {WAV_SAMPLE_RATE} AS BIGINT)").alias(
            "duration_us"
        ),
        (F.col("sum_samples").cast("double") / F.col("n_samples").cast("double")).alias(
            "mean_amplitude"
        ),
    )


# ---------------------------------------------------------------------------
# E188 — REAL video decode: Cmono Y4M streams synthesized JVM-side,
# frame-walked by the stdlib decoder; frame sampling (every 2nd
# frame) happens on DECODED frame boundaries, not byte offsets —
# completing the image (E186) / audio (E187) / video triad.
# ---------------------------------------------------------------------------

_Y4M_DECODE_ORACLE = """
WITH d AS (
  SELECT doc_id, text, CAST(length(text) // 16 AS BIGINT) AS nf
  FROM documents
  WHERE strlen(text) = length(text) AND length(text) >= 16
),
px AS (
  SELECT doc_id, nf, p,
         (CAST(p - 1 AS BIGINT) // 16) AS frame,
         ascii(substr(text, CAST(p AS INTEGER), 1)) AS v
  FROM (SELECT doc_id, text, nf, unnest(range(1, 16*nf + 1)) AS p FROM d)
)
SELECT doc_id,
       CAST(8 AS INTEGER) AS width,
       CAST(2 AS INTEGER) AS height,
       CAST(25 AS INTEGER) AS fps_num,
       CAST(max(nf) AS BIGINT) AS n_frames,
       CAST(SUM(v) AS BIGINT) AS sum_luma,
       CAST(SUM(CASE WHEN frame % 2 = 0 THEN v END) AS BIGINT)
         AS sum_luma_sampled,
       CAST(max(nf) * 40000 AS BIGINT) AS duration_us
FROM px GROUP BY doc_id
"""


@query("multimodal_video_decode", oracle=_Y4M_DECODE_ORACLE)
def multimodal_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode over a binary column: each ASCII document's
    bytes become consecutive 8×2 Cmono luma frames of a YUV4MPEG2
    stream (JVM-side synthesis), and an Arrow-batched ``mapInPandas``
    stage parses it for real — ASCII parameter header (W/H/F/C tags),
    per-frame FRAME markers with optional parameters, fixed-size
    plane extraction with truncation checks.  Geometry and frame rate
    come from the DECODED header; frame sampling (every 2nd frame)
    operates on decoded frame boundaries, the thing byte-offset
    striding cannot do once markers vary in length.  duration_us =
    frames·40000 exactly at 25 fps.  The oracle recomputes everything
    from the text bytes, so header, marker-walk, or sampling-phase
    bugs fail the hash gate.

    Scale shape: synthesis and decode as in E186/E187 — zero-shuffle
    projection in, Arrow-batched bounded-memory decode, one typed row
    per clip out.
    """
    from ..operators.multimodal import decode_y4m_features, synth_y4m

    docs = load_table(spark, sf_dir, "documents")
    feats = decode_y4m_features(synth_y4m(docs))
    return feats.select(
        "doc_id",
        "width",
        "height",
        "fps_num",
        "n_frames",
        "sum_luma",
        "sum_luma_sampled",
        F.expr("CAST(n_frames * 1000000 div 25 AS BIGINT)").alias("duration_us"),
    )
