"""Xing/Info header frame + 100-byte seek TOC.

Parity with the reference generateXingHeader/generateTOC
(MP3Encoder.swift:367-449): full MP3 frame with no-CRC/no-padding header,
zeroed side info, "Xing" (VBR) or "Info" (CBR) tag, flags 0x07
(frames+bytes+TOC), totalFrames = frame_count + 1, byte count including the
header frame itself, TOC from cumulative frame sizes, zero-padded to the
frame size. Header hardcodes copyright=0/original=1 regardless of options.
"""

from __future__ import annotations

from ..options import MP3EncoderOptions
from ..tables import bitrate_index, bitrate_value, mode_bits, sample_rate_index
from .bitwriter import BitstreamWriter


def generate_toc(frame_sizes) -> bytes:
    """100-byte TOC from per-frame byte sizes (MP3Encoder.swift:423-449)."""
    if not frame_sizes:
        return bytes((i * 255) // 99 for i in range(100))

    cumulative = []
    total = 0
    for size in frame_sizes:
        total += size
        cumulative.append(total)
    if total <= 0:
        return bytes((i * 255) // 99 for i in range(100))

    toc = bytearray()
    n = len(frame_sizes)
    for percent in range(100):
        target_frame = (percent * n) // 100
        byte_position = cumulative[target_frame - 1] if target_frame > 0 else 0
        toc.append(min((byte_position * 255) // total, 255))
    return bytes(toc)


def build_xing_header(
    options: MP3EncoderOptions,
    frame_count: int,
    total_bytes: int,
    frame_sizes,
) -> bytes:
    channels = options.channels
    side_info_size = 17 if channels == 1 else 32

    br_index = bitrate_index(options.bitrate_kbps, options.sample_rate)
    sr_index = sample_rate_index(options.sample_rate)
    br_value = bitrate_value(br_index)
    frame_size = (144 * br_value * 1000) // options.sample_rate

    mode, mode_ext = mode_bits(options.mode.value)

    h = BitstreamWriter()
    h.write(0x7FF, 11)  # sync
    h.write(0b11, 2)  # MPEG-1
    h.write(0b01, 2)  # Layer III
    h.write(1, 1)  # no CRC
    h.write(br_index, 4)
    h.write(sr_index, 2)
    h.write(0, 1)  # no padding
    h.write(0, 1)  # private
    h.write(mode, 2)
    h.write(mode_ext, 2)
    h.write(0, 1)  # not copyrighted
    h.write(1, 1)  # original
    h.write(0, 2)  # no emphasis

    frame = bytearray(h.data)
    frame += bytes(side_info_size)
    frame += (b"Xing" if options.vbr else b"Info")
    frame += (0x07).to_bytes(4, "big")  # flags: frames + bytes + TOC
    frame += (frame_count + 1).to_bytes(4, "big")
    frame += ((total_bytes + frame_size) & 0xFFFFFFFF).to_bytes(4, "big")
    frame += generate_toc(frame_sizes)

    if len(frame) < frame_size:
        frame += bytes(frame_size - len(frame))
    return bytes(frame)
