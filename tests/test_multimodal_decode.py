"""The REAL P6 decoder (operators/multimodal.py): header grammar,
channel phase, and failure modes — unit-level, no Spark needed."""

from __future__ import annotations

import pytest

from aiesec_guc_spark.operators.multimodal import decode_image, decode_ppm


def _ppm(w: int, h: int, raster: bytes, header: bytes | None = None) -> bytes:
    head = header if header is not None else f"P6\n{w} {h}\n255\n".encode()
    return head + raster


def test_decode_ppm_channel_sums_and_header():
    raster = bytes(range(48))  # 8x2 pixels
    d = decode_ppm(_ppm(8, 2, raster))
    assert (d["width"], d["height"], d["maxval"]) == (8, 2, 255)
    assert d["sum_r"] == sum(raster[0::3])
    assert d["sum_g"] == sum(raster[1::3])
    assert d["sum_b"] == sum(raster[2::3])


def test_decode_ppm_allows_header_comments():
    raster = bytes(48)
    buf = _ppm(8, 2, raster, header=b"P6\n# made by a test\n8 2\n# c2\n255\n")
    d = decode_ppm(buf)
    assert (d["width"], d["height"]) == (8, 2)


def test_decode_ppm_raster_may_contain_newlines_and_hashes():
    # raster bytes are raw — '\n' and '#' inside must NOT confuse the
    # parser, which switches out of token mode after maxval
    raster = (b"\n#" * 24)[:48]
    d = decode_ppm(_ppm(8, 2, raster))
    assert d["sum_r"] == sum(raster[0::3])


def test_decode_ppm_truncated_raster_fails_loudly():
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(_ppm(8, 2, bytes(47)))


def test_decode_ppm_rejects_other_magic():
    with pytest.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n8 2\n255\n" + bytes(16))


def test_decode_image_gates_compressed_formats():
    # JPEG magic: with no PIL in this container the dispatch must
    # raise NotImplementedError SPECIFICALLY (a TypeError/AttributeError
    # regression would mean broken dispatch, not an honest gate) —
    # and never silently fake features
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0" + bytes(16))


# --- RIFF/WAV -------------------------------------------------------------

from aiesec_guc_spark.operators.multimodal import _WAV_FMT_CHUNK, decode_wav


def _wav(samples: bytes, extra: bytes = b"") -> bytes:
    body = _WAV_FMT_CHUNK + extra + b"data" + len(samples).to_bytes(4, "little") + samples
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


def test_decode_wav_fields_from_decoded_fmt_chunk():
    d = decode_wav(_wav(bytes([0, 128, 255])))
    assert d == {
        "sample_rate": 8000,
        "n_samples": 3,
        "sum_samples": 383,
        "max_sample": 255,
    }


def test_decode_wav_skips_unknown_chunks_with_word_alignment():
    # odd-sized LIST chunk before data: the walker must skip its pad byte
    extra = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    d = decode_wav(_wav(bytes(range(7)), extra=extra))
    assert d["n_samples"] == 7 and d["sum_samples"] == 21


def test_decode_wav_rejects_bad_riff_size():
    buf = _wav(bytes(4))
    broken = buf[:4] + (99).to_bytes(4, "little") + buf[8:]
    with pytest.raises(ValueError, match="RIFF size"):
        decode_wav(broken)


def test_decode_wav_rejects_truncated_chunk():
    buf = _wav(bytes(8))[:-3]
    with pytest.raises(ValueError):
        decode_wav(buf)


def test_decode_wav_rejects_non_wave():
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"OggS" + bytes(20))


# --- Y4M ------------------------------------------------------------------

from aiesec_guc_spark.operators.multimodal import decode_y4m


def _y4m(*frames: bytes, header: bytes = b"YUV4MPEG2 W8 H2 F25:1 Cmono\n") -> bytes:
    return header + b"".join(b"FRAME\n" + f for f in frames)


def test_decode_y4m_header_and_frame_walk():
    f0, f1 = bytes(range(16)), bytes(range(16, 32))
    d = decode_y4m(_y4m(f0, f1))
    assert (d["width"], d["height"], d["fps_num"], d["fps_den"]) == (8, 2, 25, 1)
    assert d["n_frames"] == 2 and d["sum_luma"] == sum(range(32))


def test_decode_y4m_frame_markers_may_carry_parameters():
    f0, f1, f2 = bytes(16), bytes([1] * 16), bytes([2] * 16)
    buf = (b"YUV4MPEG2 W8 H2 F25:1 Cmono\n"
           + b"FRAME\n" + f0 + b"FRAMEXparam\n" + f1 + b"FRAME\n" + f2)
    d = decode_y4m(buf)
    assert d["n_frames"] == 3
    # sampling every 2nd frame = frames 0 and 2 on DECODED boundaries
    assert d["sum_luma_sampled"] == sum(f0) + sum(f2)


def test_decode_y4m_rejects_truncated_frame():
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(_y4m(bytes(15)))


def test_decode_y4m_rejects_unsupported_chroma():
    with pytest.raises(ValueError, match="chroma"):
        decode_y4m(b"YUV4MPEG2 W8 H2 F25:1 C420\n" + b"FRAME\n" + bytes(24))


def test_decode_y4m_rejects_garbage_between_frames():
    buf = _y4m(bytes(16)) + b"JUNK" + bytes(16)
    with pytest.raises(ValueError, match="FRAME marker"):
        decode_y4m(buf)


def test_decode_y4m_rejects_missing_frame_rate():
    # F is mandatory per the y4m spec; without the early check a
    # missing tag surfaced later as an opaque pandas int32 error.
    with pytest.raises(ValueError, match="missing F"):
        decode_y4m(_y4m(bytes(16), header=b"YUV4MPEG2 W8 H2 Cmono\n"))
