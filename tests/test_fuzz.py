"""Seeded fuzz: random configs x random signals, numpy vs TPU backend.

Checks the full contract on each draw: identical frame structure across
backends, valid bitstream, decoder-oracle acceptance, and exact counter
agreement. Trial count is kept small (each distinct option set costs a jit
compile in CI); the seed makes failures reproducible.
"""

import numpy as np
import pytest

from swiftmp3_tpu import MP3Encoder, MP3EncoderOptions, Mode
from swiftmp3_tpu.decoder import decode_mp3

from .util import parse_frames

N_TRIALS = 4


def _random_signal(rng, n, kind):
    if kind == 0:
        return np.zeros(n, dtype=np.float32)
    if kind == 1:
        t = np.arange(n) / 44100
        f = rng.uniform(80, 8000)
        return (rng.uniform(0.05, 0.9) * np.sin(2 * np.pi * f * t)).astype(np.float32)
    if kind == 2:
        return (rng.standard_normal(n) * rng.uniform(0.01, 0.8)).astype(np.float32)
    # bursty: silence with loud attacks (forces short blocks)
    x = np.zeros(n, dtype=np.float32)
    for _ in range(max(1, n // 4000)):
        p = rng.integers(0, max(n - 200, 1))
        x[p : p + 200] = (rng.standard_normal(min(200, n - p)) * 0.9).astype(np.float32)
    return x


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_fuzz_backend_equivalence(trial):
    rng = np.random.default_rng(1000 + trial)
    mode = [Mode.MONO, Mode.STEREO, Mode.JOINT_STEREO][int(rng.integers(0, 3))]
    sr = [44100, 48000, 32000][int(rng.integers(0, 3))]
    kbps = [64, 96, 128, 192][int(rng.integers(0, 4))]
    vbr = bool(rng.integers(0, 2))
    quality = int(rng.integers(0, 10))
    crc = bool(rng.integers(0, 2))
    ch = mode.channels

    n_frames = int(rng.integers(2, 7))
    extra = int(rng.integers(0, 1152))  # partial final frame sometimes
    n = (n_frames * 1152 + extra) * ch
    kind = int(rng.integers(0, 4))
    pcm = _random_signal(rng, n, kind)

    opts = dict(
        mode=mode, sample_rate=sr, bitrate_kbps=kbps, vbr=vbr,
        quality=quality, crc_protected=crc,
    )
    outs = {}
    counts = {}
    for be in ["numpy", "tpu"]:
        s = MP3Encoder(MP3EncoderOptions(**opts), backend=be).new_session()
        outs[be] = s.encode(pcm) + s.flush()
        counts[be] = (s.encoded_frame_count, s.encoded_byte_count)

    fa = parse_frames(outs["numpy"])
    fb = parse_frames(outs["tpu"])
    assert len(fa) == len(fb), opts
    for a, b in zip(fa, fb):
        assert (a.size, a.bitrate_kbps, a.padding, a.mode, a.crc_protected) == (
            b.size, b.bitrate_kbps, b.padding, b.mode, b.crc_protected,
        ), opts
    assert counts["numpy"][0] == counts["tpu"][0]
    assert counts["numpy"][1] == counts["tpu"][1]

    dec = decode_mp3(outs["tpu"])
    assert dec.frame_count == len(fb)
    assert dec.sample_rate == sr and dec.channels == ch


@pytest.mark.parametrize("trial", range(2))
def test_fuzz_aligned_decodes(trial):
    """Aligned mode: random configs must produce streams the oracle decodes
    with matching frame counts (granule-exact decode is covered in
    test_aligned_reservoir)."""
    rng = np.random.default_rng(2000 + trial)
    mode = [Mode.MONO, Mode.STEREO][int(rng.integers(0, 2))]
    sr = [44100, 48000][int(rng.integers(0, 2))]
    kbps = [64, 128][int(rng.integers(0, 2))]
    ch = mode.channels
    n = (int(rng.integers(3, 7)) * 1152 + int(rng.integers(0, 1152))) * ch
    pcm = _random_signal(rng, n, int(rng.integers(1, 4)))
    opts = MP3EncoderOptions(
        mode=mode, sample_rate=sr, bitrate_kbps=kbps, reservoir_mode="aligned"
    )
    s = MP3Encoder(opts, backend="tpu").new_session()
    data = s.encode(pcm) + s.flush()
    frames = parse_frames(data)
    dec = decode_mp3(data)
    assert dec.frame_count == len(frames) == s.encoded_frame_count
