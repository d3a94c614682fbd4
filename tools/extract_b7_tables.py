"""Extract the complete ISO 11172-3 Table B.7 Huffman tables from the
system libavcodec static archive and emit `swiftmp3_tpu/decoder/_b7_data.py`.

Provenance / independence: the decoder oracle's original tables
(`decoder/_spec_data.py`) were transcribed from the ISO text and cover only
the table ids this framework's encoder emits. To decode arbitrary
conforming streams (e.g. libmp3lame's, used as external validation
stimulus) the oracle needs every B.7 table including the linbits (ESC)
families 16-23/24-31 — ~1400 entries, too error-prone to transcribe by
hand. ffmpeg's `mpegaudiodec_common.o` carries the full set as
canonical-code (length, symbol) lists (`mpa_hufflens`/`mpa_huffsymbols`,
built with ff_vlc_init_from_lengths): a SECOND external decoder's copy of
the spec data, machine-readable. This script reconstructs the (length,
codeword) tables exactly as ffmpeg's VLC builder does and dumps them as
Python constants.

The generated data is cross-checked by tests three ways:
- equality with `_spec_data.py` for every table id both sources carry
  (two independent transcriptions of B.7);
- Kraft-sum completeness / prefix-freeness per table;
- behavioral agreement with libmpg123 on streams that exercise the tables
  (a THIRD independent copy of the spec data).

Run from the repo root:  python tools/extract_b7_tables.py
"""

from __future__ import annotations

import subprocess
import tempfile
from pathlib import Path

ARCHIVE = "/usr/lib/x86_64-linux-gnu/libavcodec.a"
MEMBER = "mpegaudiodec_common.o"
OUT = Path(__file__).resolve().parent.parent / "swiftmp3_tpu" / "decoder" / "_b7_data.py"

# The 15 (lens, symbols) blocks correspond, in order, to these B.7 pair
# tables (ffmpeg's huff_vlc indices 1..15):
BLOCK_TABLE_IDS = [1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15, 16, 24]


def _symbol_bytes(obj: Path, name: str) -> tuple[int, int]:
    """(section_offset, size) of a local .rodata symbol."""
    out = subprocess.run(
        ["objdump", "-t", str(obj)], capture_output=True, text=True, check=True
    ).stdout
    for line in out.splitlines():
        parts = line.split()
        if parts and parts[-1] == name and ".rodata" in line:
            return int(parts[0], 16), int(parts[-2], 16)
    raise KeyError(name)


def extract() -> dict:
    with tempfile.TemporaryDirectory() as td:
        tdp = Path(td)
        subprocess.run(["ar", "x", ARCHIVE, MEMBER], cwd=td, check=True)
        obj = tdp / MEMBER
        subprocess.run(
            [
                "objcopy",
                "-O",
                "binary",
                "--only-section=.rodata",
                str(obj),
                str(tdp / "rodata.bin"),
            ],
            check=True,
        )
        rodata = (tdp / "rodata.bin").read_bytes()
        syms = {
            n: _symbol_bytes(obj, n)
            for n in (
                "mpa_hufflens",
                "mpa_huffsymbols",
                "mpa_huff_sizes_minus_one",
                "mpa_quad_bits",
                "mpa_quad_codes",
            )
        }
        # ff_mpa_huff_data is global; objdump prints it the same way
        syms["ff_mpa_huff_data"] = _symbol_bytes(obj, "ff_mpa_huff_data")

    def blob(name):
        off, size = syms[name]
        return rodata[off : off + size]

    sizes = [b + 1 for b in blob("mpa_huff_sizes_minus_one")]
    lens = blob("mpa_hufflens")
    symbols = blob("mpa_huffsymbols")
    assert len(sizes) == 15 and sum(sizes) == len(lens) == len(symbols), (
        sizes,
        len(lens),
        len(symbols),
    )

    tables = {}
    pos = 0
    for tid, n in zip(BLOCK_TABLE_IDS, sizes):
        entries = {}
        acc = 0  # 32-bit canonical code accumulator (ff_vlc_init_from_lengths)
        for i in range(n):
            length = lens[pos + i]
            assert 0 < length <= 24, (tid, i, length)
            code = acc >> (32 - length)
            acc = (acc + (1 << (32 - length))) & 0xFFFFFFFF
            s = symbols[pos + i]
            x, y = s >> 4, s & 0xF
            assert (x, y) not in entries
            entries[(x, y)] = (length, code)
        side = {16: 16, 15: 16, 13: 16, 24: 16}.get(tid)
        if side is None:
            side = {4: 2, 9: 3, 16: 4, 36: 6, 64: 8, 256: 16}[n]
        assert len(entries) == n and all(
            0 <= x < side and 0 <= y < side for (x, y) in entries
        ), (tid, n)
        tables[tid] = (side, entries)
        pos += n

    hd = blob("ff_mpa_huff_data")
    select = {}  # table_select -> (pair_table_id or None, linbits)
    for t in range(32):
        vlc_idx, linbits = hd[2 * t], hd[2 * t + 1]
        pair_tid = None if vlc_idx == 0 else BLOCK_TABLE_IDS[vlc_idx - 1]
        select[t] = (pair_tid, linbits)

    qb, qc = blob("mpa_quad_bits"), blob("mpa_quad_codes")
    count1 = {
        0: [(qb[i], qc[i]) for i in range(16)],
        1: [(qb[16 + i], qc[16 + i]) for i in range(16)],
    }
    return {"tables": tables, "select": select, "count1": count1}


def emit(data: dict) -> str:
    lines = [
        '"""ISO 11172-3 Table B.7 Huffman data, complete (GENERATED FILE).',
        "",
        "Generated by tools/extract_b7_tables.py from the system libavcodec",
        "(ffmpeg) mpegaudio decoder tables — an external, conformance-grade",
        "copy of the spec data, independent of both this repo's encoder",
        "tables (tables/huffman.py) and the oracle's hand transcription",
        "(_spec_data.py). Cross-checked by tests/test_table_independence.py",
        "and behaviorally against libmpg123. Do not edit by hand.",
        '"""',
        "",
        "# table_select -> (pair_table_id, linbits); pair_table_id None = all-zero",
        f"B7_SELECT = {data['select']!r}",
        "",
        "# count1table_select -> [(length, code)] for quadruple index v<<3|w<<2|x<<1|y",
        f"B7_COUNT1 = {data['count1']!r}",
        "",
        "# pair_table_id -> (side, {(x, y): (length, code)})",
        "B7_TABLES = {",
    ]
    for tid, (side, entries) in sorted(data["tables"].items()):
        lines.append(f"    {tid}: ({side}, {{")
        items = sorted(entries.items())
        for (x, y), (length, code) in items:
            lines.append(f"        ({x}, {y}): ({length}, {code}),")
        lines.append("    }),")
    lines.append("}")
    lines.append("")
    return "\n".join(lines)


ENC_OUT = (
    Path(__file__).resolve().parent.parent
    / "swiftmp3_tpu"
    / "tables"
    / "_linbits_data.py"
)


def emit_encoder_linbits(data: dict) -> str:
    """Encoder-side copy of the two linbits pair tables (16 and 24) as flat
    16x16 (lengths, codes) row-major tuples — the format tables/huffman.py
    uses. The encoder's classic tables (1-15) come from the reference
    transcription; 16/24 do not exist in the reference at all, so this
    extraction is their only in-repo source. Circularity with the decoder's
    copy (decoder/_b7_data.py, same extraction) is broken EXTERNALLY: both
    are validated behaviorally against libmpg123 (tests/test_external.py),
    and entry-for-entry against each other + Kraft/prefix-freeness in
    tests/test_table_independence.py."""
    lines = [
        '"""ISO 11172-3 B.7 linbits pair tables 16/24 (GENERATED FILE).',
        "",
        "Generated by tools/extract_b7_tables.py from the system libavcodec",
        "mpegaudio tables. See that tool for provenance + cross-checks.",
        "Do not edit by hand.",
        '"""',
        "",
    ]
    for tid in (16, 24):
        side, entries = data["tables"][tid]
        assert side == 16
        lens = [0] * 256
        codes = [0] * 256
        for (x, y), (length, code) in entries.items():
            lens[x * 16 + y] = length
            codes[x * 16 + y] = code
        lines.append(f"TABLE{tid}_LENGTHS = (")
        for r in range(16):
            lines.append("    " + ", ".join(str(v) for v in lens[r * 16 : r * 16 + 16]) + ",")
        lines.append(")")
        lines.append(f"TABLE{tid}_CODES = (")
        for r in range(16):
            lines.append("    " + ", ".join(str(v) for v in codes[r * 16 : r * 16 + 16]) + ",")
        lines.append(")")
        lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    data = extract()
    OUT.write_text(emit(data))
    ENC_OUT.write_text(emit_encoder_linbits(data))
    n = sum(len(e) for _, e in data["tables"].values())
    print(f"wrote {OUT} ({len(data['tables'])} tables, {n} entries)")
    print(f"wrote {ENC_OUT} (tables 16/24)")
