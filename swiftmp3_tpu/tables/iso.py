"""ISO/IEC 11172-3 lookup tables: scalefactor bands, bitrates, modes, aliasing.

Parity references: MP3Encoder.swift:1809-1897 (scalefactor bands),
:2509-2556 (bitrate/samplerate/mode), :1568-1575 (Table B.9 aliasing coefficients).
"""

from __future__ import annotations

import numpy as np

# --- Scale factor bands (ISO Table B.8, long-block widths, 21 bands) ---------
LONG_BANDS = {
    44100: np.array(
        [4, 4, 4, 4, 4, 4, 6, 6, 8, 8, 10, 12, 16, 20, 24, 28, 34, 42, 50, 54, 76],
        dtype=np.int32,
    ),
    48000: np.array(
        [4, 4, 4, 4, 4, 4, 6, 6, 6, 8, 10, 12, 16, 18, 22, 28, 34, 40, 46, 54, 54],
        dtype=np.int32,
    ),
    32000: np.array(
        [4, 4, 4, 4, 4, 4, 6, 6, 8, 10, 12, 16, 20, 24, 30, 38, 46, 56, 68, 84, 102],
        dtype=np.int32,
    ),
}

# Short block band widths for 44100 Hz (12 bands, applied 3 times).
SHORT_BANDS_44100 = np.array([4, 4, 4, 4, 6, 8, 10, 12, 14, 18, 22, 30], dtype=np.int32)


def band_table(sample_rate: int) -> np.ndarray:
    """Long-block band width table; any unknown rate falls back to 44100.

    Matches MP3Encoder.swift:1879-1888 (default branch -> 44100 table).
    """
    return LONG_BANDS.get(sample_rate, LONG_BANDS[44100])


def band_count(sample_rate: int, is_short: bool) -> int:
    """Number of scale factor bands (MP3Encoder.swift:1891-1896)."""
    if is_short:
        return 12
    return len(band_table(sample_rate))


# --- Bitrate / samplerate / mode tables --------------------------------------
# MPEG-1 Layer III bitrate index table (kbps), index 0 = free, 15 = bad.
BITRATE_TABLE_V1 = np.array(
    [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0],
    dtype=np.int32,
)
# MPEG-2 Layer III table — used by the reference only for sampleRate < 32000
# in bitrateIndex lookup (MP3Encoder.swift:2511-2515).
BITRATE_TABLE_V2 = np.array(
    [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0],
    dtype=np.int32,
)


def bitrate_index(bitrate_kbps: int, sample_rate: int) -> int:
    """Bitrate index with closest-match fallback (MP3Encoder.swift:2509-2523).

    Exact match wins; otherwise the first entry with minimal absolute distance
    (ties keep the earlier index, matching Swift's `min(by:)` semantics).
    """
    table = BITRATE_TABLE_V1 if sample_rate >= 32000 else BITRATE_TABLE_V2
    exact = np.nonzero(table == bitrate_kbps)[0]
    if exact.size:
        return int(exact[0])
    dist = np.abs(table - bitrate_kbps)
    return int(np.argmin(dist))  # argmin keeps the first minimal entry


def bitrate_value(index: int) -> int:
    """Bitrate in kbps for an MPEG-1 index (MP3Encoder.swift:2526-2530)."""
    if 0 <= index < len(BITRATE_TABLE_V1):
        return int(BITRATE_TABLE_V1[index])
    return 128


def sample_rate_index(sample_rate: int) -> int:
    """MPEG-1 sample rate index; unknown rates map to 44100's index 0
    (MP3Encoder.swift:2533-2544)."""
    return {44100: 0, 48000: 1, 32000: 2}.get(sample_rate, 0)


def mode_bits(mode: str) -> tuple[int, int]:
    """(mode, mode_extension) header bits (MP3Encoder.swift:2547-2556).

    Note the reference always sets mode_extension=0b10 (M/S on) for joint
    stereo regardless of the per-frame M/S decision; reproduced here.
    """
    return {
        "mono": (0b11, 0),
        "joint_stereo": (0b01, 0b10),
        "stereo": (0b00, 0),
    }[mode]


# --- Aliasing reduction coefficients (ISO Table B.9) -------------------------
# cs[i]^2 + ca[i]^2 == 1; applied across the 31 subband boundaries for long
# blocks (MP3Encoder.swift:1568-1575).
ALIASING_CS = np.array(
    [0.857492926, 0.881741997, 0.949628649, 0.983314592,
     0.995517816, 0.999160558, 0.999899195, 0.999993155],
    dtype=np.float32,
)
ALIASING_CA = np.array(
    [-0.514495755, -0.471731969, -0.313377454, -0.181913200,
     -0.094574193, -0.040965583, -0.014198569, -0.003699975],
    dtype=np.float32,
)
