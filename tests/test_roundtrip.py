"""Round-trip decode-oracle tests (reference strategy #3,
SwiftMP3Tests.swift:653-771): encode -> independent ISO decode -> audio
sanity. The decoder implements ISO 11172-3 semantics; note the reference
encoder's quantization law decodes over-amplified on ISO decoders (documented
in decoder.py), so shape checks use scale-invariant correlation and level
checks use the reference's one-sided thresholds.
"""

import numpy as np
import pytest

from swiftmp3_tpu import MP3Encoder, MP3EncoderOptions, Mode
from swiftmp3_tpu.decoder import decode_mp3

from .util import silence, sine

BACKEND = "numpy"


def encode(pcm, **kwargs) -> tuple[bytes, int]:
    backend = kwargs.pop("backend", BACKEND)
    s = MP3Encoder(MP3EncoderOptions(**kwargs), backend=backend).new_session()
    data = s.encode(pcm) + s.flush()
    return data, s.encoded_frame_count


def test_sine_survives():
    sr = 44100
    pcm = sine(1.0, freq=440.0, sample_rate=sr)
    data, n_frames = encode(pcm, mode=Mode.MONO)
    dec = decode_mp3(data)
    assert dec.sample_rate == sr and dec.channels == 1
    x = dec.pcm[:, 0]
    # Reference thresholds (SwiftMP3Tests.swift:676-694)
    assert np.abs(x).max() > 0.05
    assert np.sqrt(np.mean(x**2)) > 0.01
    # Scale-invariant shape check: decoded audio correlates with a 440 Hz
    # sine (allowing codec delay); much stronger than the level thresholds.
    seg = x[8192 : 8192 + 8192].astype(np.float64)
    t = np.arange(len(seg)) / sr
    basis = np.stack([np.sin(2 * np.pi * 440 * t), np.cos(2 * np.pi * 440 * t)]).T
    fit = basis @ np.linalg.lstsq(basis, seg, rcond=None)[0]
    corr = np.sqrt(np.sum(fit**2) / np.sum(seg**2))
    assert corr > 0.9, corr


def test_silence_stays_quiet():
    data, _ = encode(silence(0.5), mode=Mode.MONO)
    x = decode_mp3(data).pcm
    assert x.size == 0 or np.abs(x).max() < 0.05


def test_duration_contract():
    pcm = sine(0.7)
    data, n_frames = encode(pcm, mode=Mode.MONO)
    dec = decode_mp3(data)
    # Reference: decoded duration within +-2400 samples of (frames+1)*1152
    assert abs(len(dec.pcm) - (n_frames + 1) * 1152) <= 2400


@pytest.mark.parametrize(
    "sr,kbps,mode",
    [
        (44100, 128, Mode.MONO),
        (44100, 64, Mode.STEREO),
        (48000, 192, Mode.JOINT_STEREO),
        (32000, 96, Mode.STEREO),
        (48000, 128, Mode.MONO),
    ],
)
def test_config_matrix_decodes(sr, kbps, mode):
    ch = 1 if mode is Mode.MONO else 2
    pcm = sine(0.4, sample_rate=sr, channels=ch)
    data, n_frames = encode(pcm, sample_rate=sr, bitrate_kbps=kbps, mode=mode)
    dec = decode_mp3(data)
    assert dec.sample_rate == sr
    assert dec.channels == ch
    assert dec.frame_count == n_frames
    assert np.abs(dec.pcm).max() > 0.01  # audio survived


def test_mono_channel_count():
    data, _ = encode(sine(0.3), mode=Mode.MONO)
    assert decode_mp3(data).channels == 1


def test_crc_frames_decode():
    data, n = encode(sine(0.3), mode=Mode.MONO, crc_protected=True)
    dec = decode_mp3(data)
    assert dec.frame_count == n
    assert np.abs(dec.pcm).max() > 0.05


def test_vbr_stream_decodes():
    rng = np.random.default_rng(5)
    pcm = (rng.standard_normal(1152 * 20) * 0.4).astype(np.float32)
    pcm[: 1152 * 7] *= 0.02
    data, n = encode(pcm, mode=Mode.MONO, vbr=True, quality=3)
    dec = decode_mp3(data)
    assert dec.frame_count == n


def test_xing_frame_skipped():
    s = MP3Encoder(MP3EncoderOptions(mode=Mode.MONO), backend=BACKEND).new_session()
    data = s.encode(sine(0.3)) + s.flush()
    full = s.generate_xing_header() + data
    dec = decode_mp3(full)
    assert dec.frame_count == s.encoded_frame_count  # metadata frame excluded


def test_id3_prefix_skipped():
    from swiftmp3_tpu import ID3Tag

    s = MP3Encoder(
        MP3EncoderOptions(mode=Mode.MONO, id3_tag=ID3Tag(title="x" * 100)),
        backend=BACKEND,
    ).new_session()
    data = s.encode(sine(0.2)) + s.flush()
    full = s.generate_id3_tag() + data
    dec = decode_mp3(full)
    assert dec.frame_count == s.encoded_frame_count


def test_sine_sweep_wav_roundtrip(tmp_path):
    """BASELINE config 1: CBR 128kbps mono 44.1kHz sine-sweep via WAV."""
    from swiftmp3_tpu.utils import read_wav, write_wav

    sr = 44100
    n = sr  # 1 second
    t = np.arange(n) / sr
    freq = 100 + (4000 - 100) * t  # linear sweep
    phase = 2 * np.pi * np.cumsum(freq) / sr
    pcm = (0.5 * np.sin(phase)).astype(np.float32)

    wav_path = tmp_path / "sweep.wav"
    write_wav(wav_path, pcm, sr, channels=1)
    loaded, got_sr, got_ch = read_wav(wav_path)
    assert got_sr == sr and got_ch == 1
    assert np.abs(loaded - pcm).max() < 1e-4  # PCM16 quantization

    data, n_frames = encode(loaded, mode=Mode.MONO)
    dec = decode_mp3(data)
    assert dec.frame_count == n_frames
    x = dec.pcm[:, 0]
    assert np.abs(x).max() > 0.05 and np.sqrt(np.mean(x**2)) > 0.01


def test_transient_short_blocks_decode():
    """Sharp attacks force short/mixed blocks; the stream must stay
    parseable and decodable (window_switching side info path)."""
    from swiftmp3_tpu.io.framing import FrameResult  # noqa: F401
    from .util import parse_frames

    rng = np.random.default_rng(9)
    pcm = np.zeros(1152 * 10, dtype=np.float32)
    # silence -> loud burst within a granule (max/min energy ratio > 6)
    for k in range(1, 10, 2):
        start = k * 1152 + 400
        pcm[start : start + 150] = (rng.standard_normal(150) * 0.9).astype(np.float32)
    data, n_frames = encode(pcm, mode=Mode.MONO)
    parse_frames(data)
    dec = decode_mp3(data)
    assert dec.frame_count == n_frames

    # confirm short/mixed blocks actually occurred
    from swiftmp3_tpu.decoder.decoder import _iter_frames

    ws = [
        g.window_switching
        for fi in _iter_frames(data)
        for gr in fi.granules
        for g in gr
    ]
    assert any(ws), "expected at least one window-switching granule"


def test_decoder_tolerates_truncation_and_garbage():
    pcm = sine(0.3)
    data, n = encode(pcm, mode=Mode.MONO)
    # truncate mid-frame: decoder stops at the cut, no exception
    cut = decode_mp3(data[: len(data) - 200])
    assert 0 < cut.frame_count < n
    # garbage tail after valid frames
    tail = decode_mp3(data + b"\x12\x34garbage")
    assert tail.frame_count >= cut.frame_count
    # pure garbage: empty result, no exception
    empty = decode_mp3(b"\x00" * 64)
    assert empty.frame_count == 0
