"""Unit tests for the host bitstream layer: writer, CRC, pack, side info, ID3, Xing."""

import numpy as np

from swiftmp3_tpu.io import (
    BitstreamWriter,
    GranuleInfo,
    build_id3_tag,
    build_side_info,
    build_xing_header,
    crc16_mpeg,
    generate_toc,
    pack_frame_main_data,
)
from swiftmp3_tpu.io.huffman_pack import pack_chunks, pair_chunks_table15
from swiftmp3_tpu.options import ID3Tag, MP3EncoderOptions, Mode
from swiftmp3_tpu.tables import HUFFMAN_TABLES


def test_bitwriter_msb_first():
    w = BitstreamWriter()
    w.write(0b101, 3)
    w.write(0b01, 2)
    w.write(0b111, 3)
    assert w.data == bytes([0b10101111])
    assert w.bit_count == 8


def test_bitwriter_pad_and_masking():
    w = BitstreamWriter()
    w.write(0xFFFF, 4)  # masked to low 4 bits
    w.pad_to_byte()
    assert w.data == bytes([0xF0])
    w2 = BitstreamWriter()
    w2.write(0x7FF, 11)
    assert w2.bit_count == 11
    w2.pad_to_byte()
    assert w2.data == bytes([0xFF, 0xE0])


def test_crc16_mpeg():
    # CRC-16/BUY-PASS-like check with init 0xFFFF poly 0x8005:
    # independently computed bit-by-bit implementation
    def crc_ref(data):
        crc = 0xFFFF
        for byte in data:
            crc ^= byte << 8
            for _ in range(8):
                crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
        return crc

    for blob in [b"", b"\x00", b"123456789", bytes([0xFF, 0xFB, 0x90, 0x64])]:
        assert crc16_mpeg(blob) == crc_ref(blob)


def test_pair_chunks_encode_roundtrip():
    # Chunks must reproduce codeword+sign layout; decode them back via the table
    t15 = HUFFMAN_TABLES[15]
    values = np.array([3, -5, 0, 7, -15, 0, 0, 0, 1, -1], dtype=np.int64)
    chunks, nbits = pair_chunks_table15(values)
    assert len(chunks) == 5
    # pair (3, -5): code for (3,5), then sign(x)=0, sign(y)=1
    code, ln = int(t15.codes[3, 5]), int(t15.lengths[3, 5])
    assert nbits[0] == ln + 2
    assert chunks[0] == (code << 2) | 0b01
    # pair (0, 7): only y sign
    code, ln = int(t15.codes[0, 7]), int(t15.lengths[0, 7])
    assert nbits[1] == ln + 1
    assert chunks[1] == (code << 1) | 0
    # pair (0, 0): no signs
    assert nbits[3] == int(t15.lengths[0, 0])


def test_pack_chunks_bit_layout():
    data, total = pack_chunks(np.array([0b101, 0b1], dtype=np.int64), np.array([3, 1]))
    assert total == 4
    assert data == bytes([0b10110000])


def test_pack_frame_main_data_bit_counts():
    rng = np.random.default_rng(0)
    q = rng.integers(-15, 16, size=(4, 576)).astype(np.int32)
    bv = np.array([288, 100, 0, 7])
    data, part_bits = pack_frame_main_data(q, bv)
    assert part_bits[2] == 0
    total = int(part_bits.sum())
    assert len(data) == (total + 7) // 8


def test_side_info_sizes():
    gi = [[GranuleInfo() for _ in range(1)] for _ in range(2)]
    scfsi = [[0, 0, 0, 0]]
    si = build_side_info(1, gi, scfsi, main_data_begin=0)
    assert len(si) == 17
    gi2 = [[GranuleInfo() for _ in range(2)] for _ in range(2)]
    scfsi2 = [[0] * 4, [0] * 4]
    si2 = build_side_info(2, gi2, scfsi2, main_data_begin=511)
    assert len(si2) == 32
    # main_data_begin occupies the first 9 bits
    assert si2[0] == 0xFF and (si2[1] >> 7) == 1


def test_side_info_window_switching_layout():
    gi = GranuleInfo(
        part23_length=100,
        big_values=10,
        global_gain=200,
        window_switching=1,
        block_type=2,
        mixed_block_flag=0,
        table_select=(15, 15, 15),
        subblock_gain=(1, 2, 3),
    )
    si = build_side_info(1, [[gi], [GranuleInfo()]], [[0] * 4], 0)
    assert len(si) == 17


def test_id3_tag_structure():
    tag = ID3Tag(title="Hello", artist="World", album="Disc", year=2024,
                 track=3, track_total=12, genre="Pod", comment="hi",
                 album_art=b"\x89PNG123", album_art_mime_type="image/png")
    data = build_id3_tag(tag)
    assert data[:3] == b"ID3"
    assert data[3:5] == b"\x03\x00"
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    assert size == len(data) - 10
    for fid in [b"TIT2", b"TPE1", b"TALB", b"TCON", b"TYER", b"TRCK", b"COMM", b"APIC"]:
        assert fid in data
    # Frame order: title before artist before album (reference emission order)
    assert data.index(b"TIT2") < data.index(b"TPE1") < data.index(b"TALB")
    assert b"3/12" in data
    assert b"image/png" in data
    assert build_id3_tag(ID3Tag()) == b""


def test_xing_header():
    opts = MP3EncoderOptions(mode=Mode.MONO)
    frame_sizes = [417, 418] * 10
    xing = build_xing_header(opts, 20, sum(frame_sizes), frame_sizes)
    assert len(xing) == 417  # full frame size at 128k/44.1
    assert xing[0] == 0xFF and (xing[1] & 0xE0) == 0xE0
    assert b"Info" in xing[:40]
    opts_vbr = opts.replace(vbr=True)
    assert b"Xing" in build_xing_header(opts_vbr, 20, 1000, frame_sizes)[:40]
    tag_off = xing.index(b"Info")
    flags = int.from_bytes(xing[tag_off + 4 : tag_off + 8], "big")
    assert flags == 0x07
    frames = int.from_bytes(xing[tag_off + 8 : tag_off + 12], "big")
    assert frames == 21  # frame_count + 1 (header frame included)
    toc = xing[tag_off + 16 : tag_off + 116]
    assert len(toc) == 100 and toc[0] == 0
    assert list(toc) == sorted(toc)  # monotone seek table


def test_toc_empty():
    toc = generate_toc([])
    assert len(toc) == 100
    assert toc[0] == 0 and toc[99] == 255
