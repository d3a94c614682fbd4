"""Real-chip byte parity: encode every frozen fixture config on the actual
TPU (jax backend, no platform override) and compare byte-for-byte against
the committed fixture files.

Run after any hot-path change that is wired to the TPU platform only
(Pallas kernels, TPU-gated branches) — the CPU test suite cannot see those.
Round-1 finding: real-chip streams equal the frozen CPU fixtures
byte-for-byte on these deterministic signals (ULP-boundary rate-loop flips
need noise-like content AND luck; the fixtures have been stable).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + "/tests")


def main() -> int:
    import jax

    from swiftmp3_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print(f"platform={jax.devices()[0].platform}")

    import fixture_lib

    failures = 0
    for name, *_ in fixture_lib.FIXTURES:
        with open(fixture_lib.fixture_path(name, "tpu"), "rb") as f:
            frozen = f.read()
        got = fixture_lib.encode_fixture(name, "tpu")
        ok = got == frozen
        failures += 0 if ok else 1
        print(f"{name:42s} {'OK' if ok else 'MISMATCH'} ({len(got)} B)")
    print("all OK" if failures == 0 else f"{failures} MISMATCHES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
