"""Multimodal column plumbing: opaque binary payloads + typed
metadata, with decode/feature-extraction as Arrow-batched pandas
stages over ``mapInPandas``.

The image/audio decode libraries are not in this container, so the
actual decode is STUBBED (``decode_image_stub`` raises
``NotImplementedError`` unless ``fake=True``); everything around it —
schema, batch iteration, partitioning, deterministic fake features —
is real and tested.  At 100 TB the pattern is: binary column stays
opaque through the scan, ``mapInPandas`` processes Arrow batches with
bounded memory (no per-row Python), and extracted features land in
typed columns for downstream relational ops.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum16", T.LongType(), True),
        T.StructField("decode_status", T.StringType(), True),
    ]
)


def decode_image_stub(payload: bytes, fake: bool = False) -> dict:
    """Placeholder for a real image decode (PIL/libvips not in this
    container).  With ``fake=True`` returns deterministic pseudo
    features derived from the bytes; otherwise raises."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this "
            "environment; run with fake=True for the deterministic stub"
        )
    return {
        "n_bytes": len(payload),
        "checksum16": int(sum(payload[:16])),
    }


def as_media_table(docs: DataFrame) -> DataFrame:
    """Re-shape the documents table into a media table: the utf-8
    bytes of the text stand in for an opaque image/audio payload."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("fake/utf8").alias("media_type"),
        F.octet_length(F.encode(F.col("text"), "utf-8")).cast("bigint").alias("n_bytes"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    ``mapInPandas``: each partition arrives as an iterator of pandas
    batches; output is a typed feature row per media row.  The decode
    itself is the stub (deterministic fake), the batch plumbing is the
    real pattern.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload (failed fetch, missing blob) → NULL features,
            # one row per input — the oracle's encode(NULL) semantics
            feats = [
                decode_image_stub(bytes(p), fake=True) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pd.Series(
                        [f["n_bytes"] if f else None for f in feats],
                        dtype="Int64",
                    ),
                    "checksum16": pd.Series(
                        [f["checksum16"] if f else None for f in feats],
                        dtype="Int64",
                    ),
                    "decode_status": "stubbed",
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("chunk_idx", T.IntegerType(), False),
        T.StructField("chunk_len", T.LongType(), True),
        T.StructField("first_byte", T.LongType(), True),
    ]
)


def chunk_payload(media: DataFrame, chunk_size: int = 256) -> DataFrame:
    """Fixed-size payload chunking — the audio-segmentation /
    shard-for-embedding shape: one input row fans out to N chunk rows
    inside the SAME ``mapInPandas`` pass (Arrow batch in, longer
    batch out; no explode of a materialized array column, so a huge
    payload never exists as a single array cell).

    Empty payloads produce no chunks.  The chunk content here is
    summarized (length + first byte) instead of decoded — the codec
    is the stubbed part, the fan-out plumbing is real.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            lens: list[int] = []
            firsts: list[int] = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # NULL payload: no chunks (oracle: n_bytes NULL)
                b = bytes(payload)
                for i in range((len(b) + chunk_size - 1) // chunk_size):
                    chunk = b[i * chunk_size : (i + 1) * chunk_size]
                    ids.append(int(did))
                    idxs.append(i)
                    lens.append(len(chunk))
                    firsts.append(chunk[0])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "chunk_len": pd.Series(lens, dtype="int64"),
                    "first_byte": pd.Series(firsts, dtype="int64"),
                }
            )

    return media.mapInPandas(op, schema=CHUNK_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("sample_checksum", T.LongType(), True),
    ]
)

RESIZE_TARGET = 8  # "thumbnail" is RESIZE_TARGET × RESIZE_TARGET


def resize_stub(media: DataFrame) -> DataFrame:
    """'Image resize' plumbing: per payload, emit the target dims and
    a deterministic downsample checksum — every k-th byte where
    ``k = max(n_bytes // 64, 1)`` (the stride a 64-pixel thumbnail
    would sample).  The real codec is the stubbed part; the Arrow
    batch shape, stride arithmetic, and row alignment are real and
    oracle-checked.  Empty payloads produce no row (nothing to
    sample)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            sums: list[int] = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # NULL payload: no sample row (oracle WHERE n_bytes > 0)
                b = bytes(payload)
                if not b:
                    continue
                k = max(len(b) // 64, 1)
                ids.append(int(did))
                sums.append(sum(b[0 : len(b) : k]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "out_w": pd.Series([RESIZE_TARGET] * len(ids), dtype="int32"),
                    "out_h": pd.Series([RESIZE_TARGET] * len(ids), dtype="int32"),
                    "sample_checksum": pd.Series(sums, dtype="int64"),
                }
            )

    return media.mapInPandas(op, schema=RESIZE_SCHEMA)


def frame_offsets(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """'Video frame sampling' shape: evenly-spaced byte offsets into
    the payload — the partition/batch pattern for frame extraction,
    minus the actual codec."""
    step = (F.col("n_bytes") / n_frames).cast("bigint")
    return media.select(
        "doc_id",
        "n_bytes",
        F.when(
            F.col("n_bytes") >= n_frames,
            F.sequence(F.lit(0), F.col("n_bytes") - 1, F.greatest(step, F.lit(1))),
        )
        .otherwise(F.array(F.lit(0)))
        .alias("offsets"),
    )


# ---------------------------------------------------------------------------
# REAL image decode — P6 PPM, parsed byte-for-byte with the stdlib.
# The container has no PIL/libvips, so compressed formats (JPEG/PNG)
# stay import-gated; an uncompressed raster format needs no library,
# which makes the decode stage genuinely real: header tokenizer,
# raster extraction, per-channel statistics.
# ---------------------------------------------------------------------------

PPM_WIDTH = 8  # synth raster width (pixels); 3 bytes/pixel


def decode_ppm(buf: bytes) -> dict:
    """Decode a binary P6 PPM: returns width/height/maxval from the
    REAL header parse plus exact per-channel byte sums of the raster.

    Full P6 grammar: 'P6', then three whitespace-separated integers
    (width, height, maxval) with '#' comments allowed between tokens,
    then ONE whitespace byte, then width*height*3 raw RGB bytes."""
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(buf[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = vals
    n = w * h * 3
    raster = buf[pos : pos + n]
    if len(raster) != n:
        raise ValueError(f"raster truncated: {len(raster)} of {n} bytes")
    return {
        "width": w,
        "height": h,
        "maxval": maxval,
        "sum_r": sum(raster[0::3]),
        "sum_g": sum(raster[1::3]),
        "sum_b": sum(raster[2::3]),
    }


def decode_image(payload: bytes) -> dict:
    """Dispatch decode: P6 PPM decodes for real with the stdlib;
    anything else needs PIL (import-gated — raises NotImplementedError
    in this container, with the stub documented)."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    try:
        from PIL import Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "compressed image decode requires PIL, not present here; "
            "P6 PPM payloads decode natively"
        ) from None
    raise NotImplementedError("PIL path not exercised in this container")


def synth_ppm(docs: DataFrame, width: int = PPM_WIDTH) -> DataFrame:
    """Deterministic P6 payloads from the documents table: the text's
    ASCII bytes become the RGB raster (truncated to whole rows), so an
    exact SQL twin can recompute every decoded feature from the text
    column.  ASCII-only docs (byte length == char length) keep char
    and byte positions identical across engines."""
    bpr = 3 * width  # bytes per raster row
    return (
        docs.filter(
            (F.octet_length(F.encode(F.col("text"), "utf-8")) == F.length("text"))
            & (F.length("text") >= bpr)
        )
        .withColumn("h", F.expr(f"CAST(length(text) div {bpr} AS INT)"))
        .select(
            "doc_id",
            F.concat(
                F.encode(
                    F.format_string("P6\n%d %d\n255\n", F.lit(width), F.col("h")),
                    "utf-8",
                ),
                F.encode(F.expr(f"substring(text, 1, {bpr} * h)"), "utf-8"),
            ).alias("payload"),
        )
    )


PPM_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
    ]
)


def decode_ppm_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode over the payload column: every value
    in the output comes from parsing the binary, never from metadata
    carried alongside it."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_ppm(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series(
                        [f["width"] for f in feats], dtype="int32"
                    ),
                    "height": pd.Series(
                        [f["height"] for f in feats], dtype="int32"
                    ),
                    "sum_r": pd.Series(
                        [f["sum_r"] for f in feats], dtype="int64"
                    ),
                    "sum_g": pd.Series(
                        [f["sum_g"] for f in feats], dtype="int64"
                    ),
                    "sum_b": pd.Series(
                        [f["sum_b"] for f in feats], dtype="int64"
                    ),
                }
            )

    return media.mapInPandas(op, schema=PPM_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL audio decode — RIFF/WAV PCM, chunk-walked with the stdlib.
# A second genuinely-parsed binary grammar (little-endian sized
# chunks, unlike PPM's text header): fmt fields come from the decoded
# chunk, samples from the data chunk, nothing from sidecar metadata.
# ---------------------------------------------------------------------------

WAV_SAMPLE_RATE = 8000  # synth: 8 kHz mono 8-bit PCM


def _le(v: int, n: int) -> bytes:
    return v.to_bytes(n, "little")


#: Constant header pieces for the synth (mono, 8-bit PCM, 8 kHz).
_WAV_FMT_CHUNK = (
    b"fmt " + _le(16, 4)
    + _le(1, 2)                    # PCM
    + _le(1, 2)                    # channels
    + _le(WAV_SAMPLE_RATE, 4)      # sample rate
    + _le(WAV_SAMPLE_RATE, 4)      # byte rate (1 ch × 1 byte)
    + _le(1, 2)                    # block align
    + _le(8, 2)                    # bits per sample
)


def decode_wav(buf: bytes) -> dict:
    """Decode a RIFF/WAV file: walk the chunk list (arbitrary order,
    unknown chunks skipped by their declared size, word-aligned),
    parse the PCM fmt chunk, and fold exact statistics over the
    8-bit data samples."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    riff_size = int.from_bytes(buf[4:8], "little")
    if riff_size != len(buf) - 8:
        raise ValueError(f"RIFF size {riff_size} != {len(buf) - 8}")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        sz = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + sz]
        if len(body) != sz:
            raise ValueError(f"chunk {cid!r} truncated: {len(body)} of {sz}")
        if cid == b"fmt ":
            fmt = {
                "audio_format": int.from_bytes(body[0:2], "little"),
                "channels": int.from_bytes(body[2:4], "little"),
                "sample_rate": int.from_bytes(body[4:8], "little"),
                "bits": int.from_bytes(body[14:16], "little"),
            }
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if fmt["audio_format"] != 1 or fmt["bits"] != 8 or fmt["channels"] != 1:
        raise ValueError(f"unsupported PCM layout: {fmt}")
    return {
        "sample_rate": fmt["sample_rate"],
        "n_samples": len(data),
        "sum_samples": sum(data),
        "max_sample": max(data) if data else None,
    }


def synth_wav(docs: DataFrame) -> DataFrame:
    """Deterministic WAV payloads: each ASCII document's bytes become
    the 8-bit PCM sample stream of an 8 kHz mono file.  The RIFF and
    data sizes are the only per-row fields — built JVM-side as
    little-endian uint32 via a hex byte-swap, so synthesis stays a
    zero-shuffle, zero-Python projection."""

    def le32(expr: str) -> str:
        # little-endian 4-byte encoding of a non-negative int expr
        h = f"lpad(hex({expr}), 8, '0')"
        return (
            f"unhex(concat(substring({h},7,2), substring({h},5,2),"
            f" substring({h},3,2), substring({h},1,2)))"
        )

    n = "length(text)"
    return (
        docs.filter(
            (F.octet_length(F.encode(F.col("text"), "utf-8")) == F.length("text"))
            & (F.length("text") >= 1)
        )
        .select(
            "doc_id",
            F.concat(
                F.lit(b"RIFF"),
                F.expr(le32(f"36 + {n}")),
                F.lit(b"WAVE" + _WAV_FMT_CHUNK + b"data"),
                F.expr(le32(n)),
                F.encode(F.col("text"), "utf-8"),
            ).alias("payload"),
        )
    )


WAV_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("sum_samples", T.LongType(), True),
        T.StructField("max_sample", T.IntegerType(), True),
    ]
)


def decode_wav_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL WAV decode over the payload column."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_wav(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "sample_rate": pd.Series(
                        [f["sample_rate"] for f in feats], dtype="int32"
                    ),
                    "n_samples": pd.Series(
                        [f["n_samples"] for f in feats], dtype="int64"
                    ),
                    "sum_samples": pd.Series(
                        [f["sum_samples"] for f in feats], dtype="int64"
                    ),
                    "max_sample": pd.Series(
                        [f["max_sample"] for f in feats], dtype="int32"
                    ),
                }
            )

    return media.mapInPandas(op, schema=WAV_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL video decode — YUV4MPEG2 (Y4M), mono chroma, stdlib-parsed.
# The third binary grammar of the multimodal family: an ASCII
# parameter header, then per-frame FRAME markers (with optional
# parameters) delimiting fixed-size raster planes.  Frame sampling
# operates on DECODED frame boundaries, not byte offsets.
# ---------------------------------------------------------------------------

Y4M_WIDTH = 8
Y4M_HEIGHT = 2  # frame = 16 luma bytes at Cmono


def decode_y4m(buf: bytes, sample_stride: int = 2) -> dict:
    """Decode a Cmono Y4M stream: parse the parameter header (W/H/F
    tags), then walk FRAME markers extracting w·h-byte luma planes.
    Returns frame geometry/rate from the DECODED header, the exact
    luma sum over all frames, and the sum over every
    ``sample_stride``-th frame (frame sampling on real boundaries)."""
    nl = buf.find(b"\n")
    if nl < 0 or not buf.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps_num = fps_den = None
    for tok in buf[9:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            fps_num, fps_den = int(num), int(den)
        elif tag == b"C" and val != b"mono":
            raise ValueError(f"unsupported chroma {val!r} (Cmono only)")
    if w is None or h is None:
        raise ValueError("header missing W or H")
    if fps_num is None:
        # F is mandatory per the y4m spec; without this check a
        # missing tag surfaces later as an opaque pandas int32
        # conversion error instead of a decode diagnostic.
        raise ValueError("header missing F")
    frame_bytes = w * h  # Cmono: luma plane only
    pos, n_frames, total, sampled = nl + 1, 0, 0, 0
    while pos < len(buf):
        if buf[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        end = buf.find(b"\n", pos)
        if end < 0:
            raise ValueError("unterminated FRAME marker")
        plane = buf[end + 1 : end + 1 + frame_bytes]
        if len(plane) != frame_bytes:
            raise ValueError(
                f"frame {n_frames} truncated: {len(plane)} of {frame_bytes}"
            )
        s = sum(plane)
        total += s
        if n_frames % sample_stride == 0:
            sampled += s
        n_frames += 1
        pos = end + 1 + frame_bytes
    return {
        "width": w,
        "height": h,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "n_frames": n_frames,
        "sum_luma": total,
        "sum_luma_sampled": sampled,
    }


def synth_y4m(docs: DataFrame, width: int = Y4M_WIDTH, height: int = Y4M_HEIGHT) -> DataFrame:
    """Deterministic Y4M payloads: each ASCII document's bytes become
    consecutive Cmono luma frames (whole frames only).  Synthesis is
    a zero-shuffle JVM projection — the frame stream is assembled
    with transform+concat over the char domain."""
    fb = width * height
    header = f"YUV4MPEG2 W{width} H{height} F25:1 Cmono\n"
    return (
        docs.filter(
            (F.octet_length(F.encode(F.col("text"), "utf-8")) == F.length("text"))
            & (F.length("text") >= fb)
        )
        .withColumn("nf", F.expr(f"CAST(length(text) div {fb} AS INT)"))
        .select(
            "doc_id",
            F.encode(
                F.concat(
                    F.lit(header),
                    F.expr(
                        "concat_ws('', transform(sequence(1, nf),"
                        f" i -> concat('FRAME\\n', substring(text, (i-1)*{fb}+1, {fb}))))"
                    ),
                ),
                "utf-8",
            ).alias("payload"),
        )
    )


Y4M_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("fps_num", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("sum_luma", T.LongType(), True),
        T.StructField("sum_luma_sampled", T.LongType(), True),
    ]
)


def decode_y4m_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL Y4M decode over the payload column."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_y4m(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series([f["width"] for f in feats], dtype="int32"),
                    "height": pd.Series([f["height"] for f in feats], dtype="int32"),
                    "fps_num": pd.Series([f["fps_num"] for f in feats], dtype="int32"),
                    "n_frames": pd.Series([f["n_frames"] for f in feats], dtype="int64"),
                    "sum_luma": pd.Series([f["sum_luma"] for f in feats], dtype="int64"),
                    "sum_luma_sampled": pd.Series(
                        [f["sum_luma_sampled"] for f in feats], dtype="int64"
                    ),
                }
            )

    return media.mapInPandas(op, schema=Y4M_FEATURE_SCHEMA)
