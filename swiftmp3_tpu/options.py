"""Public configuration types: MP3EncoderOptions, Mode, ID3Tag.

API parity with the reference public surface (MP3Encoder.swift:8-116):
same fields, same defaults, same clamping behavior (quality clamped to 0-9,
out-of-range bitrates/sample rates silently coerced downstream).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field, replace
from typing import Optional


class Mode(str, enum.Enum):
    """Channel mode (MP3Encoder.swift:59-63)."""

    MONO = "mono"
    STEREO = "stereo"
    JOINT_STEREO = "joint_stereo"

    @property
    def channels(self) -> int:
        return 1 if self is Mode.MONO else 2


@dataclass(frozen=True)
class ID3Tag:
    """ID3v2.3 metadata (MP3Encoder.swift:8-54)."""

    title: Optional[str] = None
    artist: Optional[str] = None
    album: Optional[str] = None
    track: Optional[int] = None
    track_total: Optional[int] = None
    year: Optional[int] = None
    genre: Optional[str] = None
    comment: Optional[str] = None
    album_art: Optional[bytes] = None
    album_art_mime_type: str = "image/jpeg"


@dataclass(frozen=True)
class MP3EncoderOptions:
    """Encoder configuration (MP3Encoder.swift:57-116).

    Defaults match the reference: 44100 Hz, 128 kbps, CBR, stereo, quality 5,
    no CRC, original=True, copyright=False, no ID3 tag.
    """

    sample_rate: int = 44100
    bitrate_kbps: int = 128
    vbr: bool = False
    mode: Mode = Mode.STEREO
    quality: int = 5
    crc_protected: bool = False
    original: bool = True
    copyright: bool = False
    id3_tag: Optional[ID3Tag] = None
    # Bit-reservoir placement:
    #   "compat"  — byte-for-byte reference behavior. QUIRK: the reference's
    #     one-frame delay zero-pads underfull slots at the END and snapshots
    #     main_data_begin BEFORE appending the frame's data, so ISO decoders
    #     read each frame's side info against the NEXT frame's Huffman data
    #     whenever slots underfill (verified against the decoder oracle:
    #     sine SNR collapses from ~20 dB to ~4 dB).
    #   "aligned" — same budgets and bit counts, but slots pad at the FRONT
    #     and main_data_begin is snapshotted after append, which places
    #     main_data exactly where ISO 11172-3 decoders look for it.
    reservoir_mode: str = "compat"

    def __post_init__(self):
        # Quality is clamped, not rejected (MP3Encoder.swift:110).
        object.__setattr__(self, "quality", max(0, min(int(self.quality), 9)))
        if isinstance(self.mode, str) and not isinstance(self.mode, Mode):
            object.__setattr__(self, "mode", Mode(self.mode))
        if self.reservoir_mode not in ("compat", "aligned"):
            raise ValueError(
                f"reservoir_mode must be 'compat' or 'aligned', got "
                f"{self.reservoir_mode!r}"
            )

    @property
    def channels(self) -> int:
        return self.mode.channels

    def replace(self, **kwargs) -> "MP3EncoderOptions":
        return replace(self, **kwargs)


SAMPLES_PER_FRAME = 1152
SAMPLES_PER_GRANULE = 576
SUBBANDS = 32
GRANULES_PER_FRAME = 2
RESERVOIR_MAX_BYTES = 511
