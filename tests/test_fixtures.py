"""Frozen byte fixtures: every backend must reproduce its committed bytes
exactly (drift guard for perf work on the hot path; the analogue of the
reference's determinism test, SwiftMP3Tests.swift:775-799).

Regenerate deliberately with tools/gen_fixtures.py when a byte-level change
is intended.
"""

import pytest

from . import fixture_lib
from .util import parse_frames


@pytest.mark.parametrize("name", [f[0] for f in fixture_lib.FIXTURES])
@pytest.mark.parametrize("backend", fixture_lib.BACKENDS)
def test_fixture_bytes(name, backend):
    with open(fixture_lib.fixture_path(name, backend), "rb") as f:
        frozen = f.read()
    got = fixture_lib.encode_fixture(name, backend)
    assert got == frozen, (
        f"{name} [{backend}]: encoder bytes drifted from the frozen fixture "
        f"({len(got)} vs {len(frozen)} bytes). If the change is intentional, "
        "regenerate with tools/gen_fixtures.py and explain in the commit."
    )


@pytest.mark.parametrize("name", [f[0] for f in fixture_lib.FIXTURES])
def test_fixture_structure(name):
    """The frozen bytes themselves stay a well-formed contiguous frame walk."""
    with open(fixture_lib.fixture_path(name, "numpy"), "rb") as f:
        frames = parse_frames(f.read())
    assert len(frames) >= 10
