"""Spec-strict mode flags (VERDICT round-1 task 4): each flag independent,
off by default (compat bytes pinned by tests/test_fixtures.py), verified
against the independent decoder oracle.
"""

import numpy as np
import pytest

from swiftmp3_tpu import MP3Encoder, MP3EncoderOptions, Mode
from swiftmp3_tpu.decoder import decode_mp3
from swiftmp3_tpu.decoder.decoder import verify_frame_crcs
from swiftmp3_tpu.utils.quality import encode_decode_quality

from .util import parse_frames


def _sine(seconds=1.0, sr=44100, freq=440.0, amp=0.5):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _encode(opts, pcm, backend="tpu"):
    s = MP3Encoder(opts, backend=backend).new_session()
    return s.encode(pcm) + s.flush()


# --- iso_quantization ----------------------------------------------------------


def test_iso_quantization_unit_gain_and_snr():
    """The corrected law makes ISO decode unit-gain (the reference law
    needs a ~gain-0.36 compensation) and lifts SNR."""
    pcm = _sine(2.0)
    base = MP3EncoderOptions(mode=Mode.MONO, reservoir_mode="aligned")
    q_ref = encode_decode_quality(base, pcm)
    q_iso = encode_decode_quality(base.replace(iso_quantization=True), pcm)
    assert abs(q_iso.gain - 1.0) < 0.05, q_iso
    assert q_iso.snr_db > q_ref.snr_db + 3.0, (q_ref, q_iso)


@pytest.mark.parametrize("backend", ["numpy", "tpu"])
def test_iso_quantization_backends_agree(backend):
    rng = np.random.default_rng(3)
    x = rng.standard_normal(1152 * 5).astype(np.float32) * 0.3
    opts = MP3EncoderOptions(mode=Mode.MONO, iso_quantization=True)
    a = _encode(opts, x, "numpy")
    b = _encode(opts, x, "tpu")
    fa, fb = parse_frames(a), parse_frames(b)
    assert len(fa) == len(fb)
    assert a == b  # byte parity holds on this signal


def test_iso_quantization_stream_still_valid():
    pcm = _sine(0.5)
    opts = MP3EncoderOptions(mode=Mode.STEREO, iso_quantization=True)
    data = _encode(opts, pcm)
    frames = parse_frames(data)
    dec = decode_mp3(data)
    assert dec.frame_count == len(frames)


# --- iso_crc -------------------------------------------------------------------


def test_iso_crc_validates_and_reference_quirk_fails():
    pcm = _sine(0.5)
    compat = MP3EncoderOptions(mode=Mode.MONO, crc_protected=True)
    strict = compat.replace(iso_crc=True)
    r_compat = verify_frame_crcs(_encode(compat, pcm))
    r_strict = verify_frame_crcs(_encode(strict, pcm))
    assert r_compat and not any(r_compat)  # reference quirk: never ISO-valid
    assert r_strict and all(r_strict)


@pytest.mark.parametrize("backend", ["numpy", "tpu"])
def test_iso_crc_backends_agree(backend):
    pcm = _sine(0.4, freq=523.0)
    opts = MP3EncoderOptions(
        mode=Mode.STEREO, crc_protected=True, iso_crc=True, reservoir_mode="aligned"
    )
    a = _encode(opts, pcm, "numpy")
    b = _encode(opts, pcm, "tpu")
    assert a == b
    assert all(verify_frame_crcs(a))


def test_iso_crc_native_renderer_matches():
    from swiftmp3_tpu.parallel import encode_batch

    pcm = _sine(0.6, freq=330.0)
    opts = MP3EncoderOptions(mode=Mode.MONO, crc_protected=True, iso_crc=True)
    want = _encode(opts, pcm, "tpu")
    got = encode_batch(opts, [pcm], frames_per_step=4)[0]
    assert got == want
    assert all(verify_frame_crcs(got))


# --- spec_strict preset ----------------------------------------------------------


def test_spec_strict_preset_roundtrip():
    pcm = _sine(1.0)
    opts = MP3EncoderOptions.spec_strict(mode=Mode.MONO)
    assert opts.iso_quantization and opts.iso_crc and opts.reservoir_mode == "aligned"
    opts = opts.replace(crc_protected=True)
    data = _encode(opts, pcm)
    frames = parse_frames(data)
    assert all(verify_frame_crcs(data))
    q = encode_decode_quality(opts, pcm)
    assert abs(q.gain - 1.0) < 0.05 and q.snr_db > 15.0, q
    assert len(frames) > 30
