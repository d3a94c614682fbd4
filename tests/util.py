"""Shared test helpers: MP3 frame walker and signal generators.

The frame walker mirrors the reference tests' hand-rolled sync-scan parser
(SwiftMP3Tests.swift:330-358 etc.): it validates encoder internals from the
outside via header arithmetic.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0]
SAMPLE_RATES = [44100, 48000, 32000, 0]


@dataclass
class ParsedFrame:
    offset: int
    size: int
    bitrate_kbps: int
    sample_rate: int
    padding: int
    crc_protected: bool
    mode: int
    mode_extension: int
    main_data_begin: int
    channels: int


def parse_frames(data: bytes) -> list[ParsedFrame]:
    """Walk contiguous MP3 frames; raises on malformed headers or gaps."""
    frames = []
    i = 0
    while i + 4 <= len(data):
        b = data[i : i + 4]
        assert b[0] == 0xFF and (b[1] & 0xE0) == 0xE0, f"bad sync at {i}"
        assert (b[1] >> 3) & 0x3 == 0b11, "not MPEG-1"
        assert (b[1] >> 1) & 0x3 == 0b01, "not Layer III"
        crc_protected = (b[1] & 1) == 0
        bitrate = BITRATES[(b[2] >> 4) & 0xF]
        sample_rate = SAMPLE_RATES[(b[2] >> 2) & 0x3]
        padding = (b[2] >> 1) & 1
        mode = (b[3] >> 6) & 0x3
        mode_ext = (b[3] >> 4) & 0x3
        channels = 1 if mode == 0b11 else 2
        size = (144 * bitrate * 1000) // sample_rate + padding
        side_off = i + 4 + (2 if crc_protected else 0)
        mdb = (data[side_off] << 1) | (data[side_off + 1] >> 7)
        frames.append(
            ParsedFrame(
                offset=i,
                size=size,
                bitrate_kbps=bitrate,
                sample_rate=sample_rate,
                padding=padding,
                crc_protected=crc_protected,
                mode=mode,
                mode_extension=mode_ext,
                main_data_begin=mdb,
                channels=channels,
            )
        )
        i += size
    assert i == len(data), f"trailing bytes: parsed {i} of {len(data)}"
    return frames


def sine(seconds: float, freq: float = 440.0, sample_rate: int = 44100, channels: int = 1, amp: float = 0.5):
    n = int(seconds * sample_rate)
    t = np.arange(n, dtype=np.float32) / np.float32(sample_rate)
    mono = (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    if channels == 1:
        return mono
    return np.repeat(mono, channels)  # identical L/R interleaved


def silence(seconds: float, sample_rate: int = 44100, channels: int = 1):
    return np.zeros(int(seconds * sample_rate) * channels, dtype=np.float32)
