"""ISO Table B.7 Huffman code tables as numpy arrays.

The encoder's hot path uses table 15 only (16x16, values 0-15, no linbits),
matching the reference (table_select=[15,15,15], MP3Encoder.swift:717, :791).
All other tables present in the reference (1,2,3,5,6,7,8,9,10,13) are exposed
for the generic encoder path and the decoder oracle.
Parity reference: MP3Encoder.swift:2277-2504.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ._huffman_data import (
    SMALL_TABLES,
    TABLE13_CODES,
    TABLE13_LENGTHS,
    TABLE15_CODES,
    TABLE15_LENGTHS,
)


@dataclass(frozen=True)
class HuffmanTable:
    """A Huffman pair-code table: codeword lengths and bits indexed [x, y]."""

    table_id: int
    max_value: int
    lengths: np.ndarray  # [max_value+1, max_value+1] int32
    codes: np.ndarray    # [max_value+1, max_value+1] int32


def _small(table_id: int) -> HuffmanTable:
    max_value, rows = SMALL_TABLES[table_id]
    n = max_value + 1
    lengths = np.zeros((n, n), dtype=np.int32)
    codes = np.zeros((n, n), dtype=np.int32)
    for x in range(n):
        for y in range(n):
            lengths[x, y], codes[x, y] = rows[x][y]
    return HuffmanTable(table_id, max_value, lengths, codes)


def _big(table_id: int, lengths_flat, codes_flat) -> HuffmanTable:
    lengths = np.asarray(lengths_flat, dtype=np.int32).reshape(16, 16)
    codes = np.asarray(codes_flat, dtype=np.int32).reshape(16, 16)
    return HuffmanTable(table_id, 15, lengths, codes)


HUFFMAN_TABLES: dict[int, HuffmanTable] = {
    **{tid: _small(tid) for tid in SMALL_TABLES},
    13: _big(13, TABLE13_LENGTHS, TABLE13_CODES),
    15: _big(15, TABLE15_LENGTHS, TABLE15_CODES),
}

# Hot-path constants: table 15 lengths/codes, flat [256] for device gathers
# (index = x * 16 + y).
TABLE15_LEN = HUFFMAN_TABLES[15].lengths.reshape(-1).copy()
TABLE15_CODE = HUFFMAN_TABLES[15].codes.reshape(-1).copy()
