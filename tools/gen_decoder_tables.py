"""One-time generator for swiftmp3_tpu/decoder/_spec_data.py.

Writes a PHYSICALLY SEPARATE copy of the two large ISO constant blocks the
decode oracle needs (Table C.1 analysis window; Table B.7 table-15 Huffman
lengths/codes) so the decoder imports nothing from the encoder's table
modules. Correctness of the copies is anchored by spec cross-check tests,
not by provenance: the window must satisfy the filterbank
perfect-reconstruction property, and table 15 must be Kraft-complete,
prefix-free, and match independent spot literals
(tests/test_table_independence.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftmp3_tpu.tables import ISO_WINDOW  # noqa: E402
from swiftmp3_tpu.tables._huffman_data import (  # noqa: E402
    TABLE15_CODES,
    TABLE15_LENGTHS,
)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "swiftmp3_tpu",
    "decoder",
    "_spec_data.py",
)


def fmt_floats(values, per_line=4):
    lines = []
    for i in range(0, len(values), per_line):
        row = ", ".join(f"{v!r}" for v in values[i : i + per_line])
        lines.append(f"    {row},")
    return "\n".join(lines)


def fmt_ints(values, per_line=16):
    lines = []
    for i in range(0, len(values), per_line):
        row = ", ".join(str(int(v)) for v in values[i : i + per_line])
        lines.append(f"    {row},")
    return "\n".join(lines)


def main() -> None:
    body = f'''"""ISO/IEC 11172-3 spec constants for the decode oracle (generated once
by tools/gen_decoder_tables.py; deliberately a separate physical copy so the
decoder shares no table module with the encoder — a transcription error in
either copy now fails the cross-check and spec-property tests loudly instead
of passing round-trips silently).

ISO_ANALYSIS_WINDOW: Table C.1 (512 coefficients). Validated by the
filterbank perfect-reconstruction test (any wrong coefficient breaks PR).
TABLE15_*: Table B.7 table 15 (16x16). Validated by Kraft-completeness,
prefix-freeness, and independent spot literals.
"""

ISO_ANALYSIS_WINDOW = (
{fmt_floats([float(x) for x in ISO_WINDOW])}
)

TABLE15_LENGTHS = (
{fmt_ints(TABLE15_LENGTHS)}
)

TABLE15_CODES = (
{fmt_ints(TABLE15_CODES)}
)
'''
    with open(OUT, "w") as f:
        f.write(body)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
