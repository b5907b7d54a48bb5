"""Unit tests for the WAV/RIFF codec behind decode_media (the one real
media decoder in this runtime; image/video stay gated on codec libs)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from open_molecule_data_pipeline_spark.operators.multimodal import (
    decode_media,
    decode_wav,
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
    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff", "image/jpeg")
