"""Golden-value tests for the L0 constant tables."""

import numpy as np
import pytest

from swiftmp3_tpu.tables import (
    ALIASING_CA,
    ALIASING_CS,
    ANALYSIS_MATRIX,
    HUFFMAN_TABLES,
    ISO_WINDOW,
    LONG_BANDS,
    LONG_MDCT_MATRIX,
    LONG_WINDOW,
    SHORT_BANDS_44100,
    SHORT_MDCT_MATRIX,
    SHORT_WINDOW,
    TABLE15_CODE,
    TABLE15_LEN,
    band_count,
    band_table,
    bitrate_index,
    bitrate_value,
    mode_bits,
    sample_rate_index,
)


def test_iso_window_golden_values():
    # Spot values from ISO Table C.1 (MP3Encoder.swift:1209-1354)
    assert ISO_WINDOW.shape == (512,)
    assert ISO_WINDOW[0] == np.float32(0.0)
    assert ISO_WINDOW[1] == np.float32(-0.000000477)
    assert ISO_WINDOW[256] == np.float32(0.035780907)  # symmetric center
    assert ISO_WINDOW[255] == np.float32(-0.035758972)
    assert ISO_WINDOW[511] == np.float32(0.000000477)
    # Center region holds the window's peak magnitude
    assert np.argmax(np.abs(ISO_WINDOW)) == 256


def test_analysis_matrix():
    assert ANALYSIS_MATRIX.shape == (32, 64)
    # M[k][n] = cos((2k+1)(n-16) pi/64)
    assert ANALYSIS_MATRIX[0, 16] == np.float32(1.0)
    assert np.isclose(ANALYSIS_MATRIX[3, 5], np.cos(np.pi / 64 * 7 * (5 - 16)), atol=1e-7)
    # Rows have norm sqrt(32) (orthogonality of the cosine basis over 64 points)
    norms = np.linalg.norm(ANALYSIS_MATRIX.astype(np.float64), axis=1)
    assert np.allclose(norms, np.sqrt(32.0), atol=1e-4)


def test_mdct_matrices_and_windows():
    assert LONG_MDCT_MATRIX.shape == (18, 36)
    assert SHORT_MDCT_MATRIX.shape == (6, 12)
    assert np.isclose(
        LONG_MDCT_MATRIX[2, 7],
        np.cos(np.pi / 72 * (2 * 7 + 1 + 18) * (2 * 2 + 1)),
        atol=1e-7,
    )
    assert LONG_WINDOW.shape == (36,)
    assert SHORT_WINDOW.shape == (12,)
    assert np.isclose(LONG_WINDOW[0], np.sin(np.pi / 36 * 0.5), atol=1e-7)
    # Sine windows are symmetric
    assert np.allclose(LONG_WINDOW, LONG_WINDOW[::-1], atol=1e-7)
    assert np.allclose(SHORT_WINDOW, SHORT_WINDOW[::-1], atol=1e-7)


def test_aliasing_coefficients_unit_norm():
    # ISO Table B.9: cs^2 + ca^2 == 1
    assert np.allclose(ALIASING_CS**2 + ALIASING_CA**2, 1.0, atol=1e-6)
    assert ALIASING_CS[0] == np.float32(0.857492926)
    assert ALIASING_CA[0] == np.float32(-0.514495755)


def test_scalefactor_bands():
    for sr, total in [(44100, 418), (48000, 384), (32000, 550)]:
        bands = band_table(sr)
        assert len(bands) == 21
        assert int(bands.sum()) == total
    assert band_table(12345).tolist() == LONG_BANDS[44100].tolist()  # fallback
    assert SHORT_BANDS_44100.sum() == 136
    assert band_count(44100, is_short=False) == 21
    assert band_count(44100, is_short=True) == 12


def test_bitrate_index_lookup():
    assert bitrate_index(128, 44100) == 9
    assert bitrate_index(320, 44100) == 14
    assert bitrate_index(32, 44100) == 1
    # Closest-match fallback (MP3Encoder.swift:2519-2521); ties keep earlier
    assert bitrate_index(130, 44100) == 9
    assert bitrate_index(1000, 44100) == 14
    assert bitrate_value(9) == 128
    assert bitrate_value(99) == 128  # out of range -> 128


def test_sample_rate_and_mode():
    assert sample_rate_index(44100) == 0
    assert sample_rate_index(48000) == 1
    assert sample_rate_index(32000) == 2
    assert sample_rate_index(22050) == 0  # silent coercion
    assert mode_bits("mono") == (0b11, 0)
    assert mode_bits("joint_stereo") == (0b01, 0b10)
    assert mode_bits("stereo") == (0b00, 0)


def test_huffman_tables():
    t15 = HUFFMAN_TABLES[15]
    assert t15.lengths.shape == (16, 16)
    # Spot values (ISO Table B.7, table 15)
    assert t15.lengths[0, 0] == 3 and t15.codes[0, 0] == 7
    assert t15.lengths[15, 15] == 13 and t15.codes[15, 15] == 0
    assert TABLE15_LEN[0] == 3 and TABLE15_CODE[0] == 7
    # Kraft inequality: a valid prefix code satisfies sum(2^-len) <= 1
    kraft = np.sum(2.0 ** (-t15.lengths.astype(np.float64)))
    assert kraft <= 1.0 + 1e-12
    # All tables present
    # reference tables 1-15 plus the round-3 linbits family pair
    # tables (16/24, extracted from libavcodec; options.linbits_tables)
    assert sorted(HUFFMAN_TABLES) == [1, 2, 3, 5, 6, 7, 8, 9, 10, 13, 15, 16, 24]
    assert HUFFMAN_TABLES[1].lengths[0, 0] == 1
    assert HUFFMAN_TABLES[13].lengths.shape == (16, 16)


def test_huffman_table15_is_prefix_free():
    t15 = HUFFMAN_TABLES[15]
    words = [
        format(int(t15.codes[x, y]), f"0{int(t15.lengths[x, y])}b")
        for x in range(16)
        for y in range(16)
    ]
    assert len(set(words)) == 256
    ws = sorted(words)
    for a, b in zip(ws, ws[1:]):
        assert not b.startswith(a), (a, b)
