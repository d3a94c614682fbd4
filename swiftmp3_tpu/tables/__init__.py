"""L0: ISO/IEC 11172-3 constant tables for MPEG-1 Layer III encoding.

All tables are exposed as numpy arrays (host) and are converted to jnp constants
by the ops layer. Parity notes cite the reference implementation
(/root/reference/Sources/SwiftMP3/MP3Encoder.swift).
"""

from .iso import (
    ALIASING_CA,
    ALIASING_CS,
    BITRATE_TABLE_V1,
    BITRATE_TABLE_V2,
    LONG_BANDS,
    SHORT_BANDS,
    SHORT_BANDS_44100,
    band_table,
    band_count,
    mixed_reorder_src,
    short_band_bounds,
    short_band_table,
    short_reorder_src,
    bitrate_index,
    bitrate_value,
    mode_bits,
    sample_rate_index,
)
from .filterbank import ANALYSIS_MATRIX, ISO_WINDOW
from .mdct import (
    LONG_MDCT_MATRIX,
    LONG_WINDOW,
    SHORT_MDCT_MATRIX,
    SHORT_WINDOW,
    START_WINDOW,
    STOP_WINDOW,
)
from .huffman import (
    COUNT1A_CODE,
    COUNT1A_LEN,
    HUFFMAN_TABLES,
    LINBITS_24,
    QCAP_LINBITS,
    SELECT_TABLE_IDS,
    TABLE15_CODE,
    TABLE15_LEN,
    TABLE24_CODE,
    TABLE24_LEN,
    HuffmanTable,
    linbits_table_for_max,
    table_for_max,
)

__all__ = [
    "ALIASING_CA",
    "ALIASING_CS",
    "ANALYSIS_MATRIX",
    "BITRATE_TABLE_V1",
    "BITRATE_TABLE_V2",
    "HUFFMAN_TABLES",
    "HuffmanTable",
    "ISO_WINDOW",
    "LONG_BANDS",
    "LONG_MDCT_MATRIX",
    "LONG_WINDOW",
    "SHORT_BANDS_44100",
    "SHORT_MDCT_MATRIX",
    "SHORT_WINDOW",
    "START_WINDOW",
    "STOP_WINDOW",
    "COUNT1A_CODE",
    "COUNT1A_LEN",
    "SELECT_TABLE_IDS",
    "TABLE15_CODE",
    "TABLE15_LEN",
    "table_for_max",
    "linbits_table_for_max",
    "LINBITS_24",
    "QCAP_LINBITS",
    "TABLE24_CODE",
    "TABLE24_LEN",
    "band_count",
    "band_table",
    "bitrate_index",
    "bitrate_value",
    "mode_bits",
    "sample_rate_index",
]
