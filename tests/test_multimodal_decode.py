"""Unit tests for the WAV/RIFF and image codecs behind decode_media
(pure stdlib+numpy; only video stays gated on codec libs)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from open_molecule_data_pipeline_spark.operators.multimodal import (
    decode_bmp,
    decode_media,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav_pcm16,
)


def test_roundtrip_exact_samples():
    samples = np.array([0, 1, -1, 32767, -32768, 12345], dtype=np.int16)
    blob = encode_wav_pcm16(samples, sample_rate=44100)
    dec = decode_wav(blob)
    assert dec["sample_rate"] == 44100
    assert dec["n_channels"] == 1
    assert dec["bits_per_sample"] == 16
    assert dec["n_samples"] == len(samples)
    assert np.array_equal(dec["frames"], samples)


def test_stereo_frame_count():
    samples = np.arange(10, dtype=np.int16)  # 5 stereo frames
    blob = encode_wav_pcm16(samples, sample_rate=8000, n_channels=2)
    dec = decode_wav(blob)
    assert dec["n_channels"] == 2
    assert dec["n_samples"] == 5


def test_tolerates_extra_chunks():
    samples = np.array([7, -7], dtype=np.int16)
    blob = bytearray(encode_wav_pcm16(samples))
    # splice a LIST chunk (odd-sized body -> exercises word-align padding)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    blob = blob[:12] + extra + blob[12:]
    blob[4:8] = struct.pack("<I", len(blob) - 8)
    dec = decode_wav(bytes(blob))
    assert np.array_equal(dec["frames"], samples)


def test_rejects_non_riff():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x89PNG\r\n\x1a\nnot audio at all....")


def test_rejects_missing_data_chunk():
    blob = b"RIFF" + struct.pack("<I", 4) + b"WAVE"
    with pytest.raises(ValueError, match="fmt/data"):
        decode_wav(blob)


def test_rejects_non_pcm16():
    samples = np.array([1, 2], dtype=np.int16)
    blob = bytearray(encode_wav_pcm16(samples))
    blob[20:22] = struct.pack("<H", 3)  # IEEE float format tag
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(blob))


def test_decode_media_dispatch():
    samples = np.array([5], dtype=np.int16)
    blob = encode_wav_pcm16(samples)
    assert decode_media(blob, "audio/wav")["n_samples"] == 1
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    assert decode_media(encode_png(img), "image/png")["width"] == 2
    assert decode_media(encode_bmp(img), "image/bmp")["height"] == 2
    # r12: image/jpeg now dispatches to the real baseline codec
    from open_molecule_data_pipeline_spark.operators.jpeg import (
        encode_jpeg_baseline,
    )

    blk = [0] * 64
    blk[0] = 2
    jp = decode_media(encode_jpeg_baseline([blk], 1, 1), "image/jpeg")
    assert jp["width"] == 8 and (jp["pixels"] == 128 + 8).all()
    with pytest.raises(Exception):  # truncated JPEG fails loudly
        decode_media(b"\xff\xd8\xff", "image/jpeg")
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00", "video/mp4")


@pytest.mark.parametrize(
    "shape", [(5, 9, 3), (1, 1, 3), (16, 3, 3), (7, 8, 1), (4, 6, 4)]
)
@pytest.mark.parametrize(
    "filters", [None, [1], [2], [3], [4], [0, 1, 2, 3, 4], [4, 3, 2, 1, 0]]
)
def test_png_roundtrip_all_filters(shape, filters):
    rng = np.random.default_rng(sum(shape) + (0 if filters is None else sum(filters)))
    img = rng.integers(0, 256, size=shape if shape[2] > 1 else shape[:2], dtype=np.uint8)
    dec = decode_png(encode_png(img, filters=filters))
    ref = img if img.ndim == 3 else img[:, :, None]
    assert dec["width"] == shape[1] and dec["height"] == shape[0]
    assert dec["channels"] == shape[2]
    assert np.array_equal(dec["pixels"], ref)


def test_png_rejects_corrupt_crc():
    blob = bytearray(encode_png(np.zeros((2, 2, 3), dtype=np.uint8)))
    blob[20] ^= 0xFF  # flip a bit inside IHDR
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))


def test_png_rejects_non_png():
    with pytest.raises(ValueError, match="PNG"):
        decode_png(b"RIFF....WAVE")


def test_bmp_roundtrip_with_padding():
    # width 5 -> 15-byte rows padded to 16: exercises stride handling
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    dec = decode_bmp(encode_bmp(img))
    assert dec["width"] == 5 and dec["height"] == 6
    assert np.array_equal(dec["pixels"], img)


def test_avi_roundtrip_and_word_alignment():
    from open_molecule_data_pipeline_spark.operators.multimodal import (
        decode_avi,
        encode_avi,
    )

    frames = [b"abc", b"defgh", bytes(range(33))]  # odd sizes -> pad bytes
    dec = decode_avi(encode_avi(frames, width=32, height=24))
    assert dec["n_frames"] == 3
    assert dec["width"] == 32 and dec["height"] == 24
    assert dec["frames"] == frames


def test_avi_rejects_frame_count_mismatch():
    import struct

    from open_molecule_data_pipeline_spark.operators.multimodal import (
        decode_avi,
        encode_avi,
    )

    blob = bytearray(encode_avi([b"aa", b"bb"]))
    # corrupt dwTotalFrames (offset: RIFF12 + LIST8 + 'hdrl'4 + avih hdr8 + 16)
    struct.pack_into("<I", blob, 12 + 8 + 4 + 8 + 16, 9)
    with pytest.raises(ValueError, match="declares"):
        decode_avi(bytes(blob))


def test_avi_rejects_non_avi():
    from open_molecule_data_pipeline_spark.operators.multimodal import decode_avi

    with pytest.raises(ValueError, match="AVI"):
        decode_avi(b"RIFFxxxxWAVEdata")


def test_ppm_decode_with_comment():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    payload = b"P6\n# a comment\n5 6\n255\n" + img.tobytes()
    dec = decode_ppm(payload)
    assert np.array_equal(dec["pixels"], img)
