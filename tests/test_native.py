"""Native C++ renderer tests: build + byte equality vs the Python assembler."""

import numpy as np
import pytest

from swiftmp3_tpu import MP3Encoder, MP3EncoderOptions, Mode
from swiftmp3_tpu.native import native_available
from swiftmp3_tpu.parallel import encode_batch

from .util import parse_frames, sine

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native renderer build failed"
)


def _encode_both(streams, **kwargs):
    from swiftmp3_tpu.parallel.batch import BatchEncoder  # noqa: F401

    opts = MP3EncoderOptions(**kwargs)
    native = encode_batch(opts, streams, frames_per_step=4)
    # Python-assembler path
    import swiftmp3_tpu.parallel.batch as batch_mod

    class _PB(batch_mod.BatchEncoder):
        def __init__(self, *a, **kw):
            kw["use_native"] = False
            super().__init__(*a, **kw)

    orig = batch_mod.BatchEncoder
    batch_mod.BatchEncoder = _PB
    try:
        python = encode_batch(opts, streams, frames_per_step=4)
    finally:
        batch_mod.BatchEncoder = orig
    return native, python


def test_native_builds():
    assert native_available()


def test_native_matches_python_mono():
    rng = np.random.default_rng(0)
    streams = [
        (rng.standard_normal(1152 * 4 + 333) * 0.5).astype(np.float32),
        sine(0.2),
    ]
    native, python = _encode_both(streams, mode=Mode.MONO)
    for i, (a, b) in enumerate(zip(native, python)):
        assert a == b, f"stream {i}: {len(a)} vs {len(b)} bytes"
        parse_frames(a)


def test_native_matches_python_stereo_crc():
    rng = np.random.default_rng(1)
    streams = [(rng.standard_normal(2 * 1152 * 5) * 0.6).astype(np.float32)]
    native, python = _encode_both(
        streams, mode=Mode.JOINT_STEREO, crc_protected=True
    )
    assert native[0] == python[0]


def test_native_matches_python_vbr():
    rng = np.random.default_rng(2)
    pcm = (rng.standard_normal(1152 * 8) * 0.5).astype(np.float32)
    pcm[: 1152 * 3] *= 0.02
    native, python = _encode_both([pcm], mode=Mode.MONO, vbr=True, quality=2)
    assert native[0] == python[0]


def test_native_counters():
    from swiftmp3_tpu.native import NativeStreamRenderer
    from swiftmp3_tpu.parallel.batch import BatchEncoder

    opts = MP3EncoderOptions(mode=Mode.MONO)
    enc = BatchEncoder(opts, batch=1, frames_per_step=4, use_native=True)
    pcm = np.zeros((1, 4, 1152), dtype=np.float32)
    fin = np.zeros((1, 4), dtype=bool)
    val = np.ones((1, 4), dtype=bool)
    outs = enc.step(pcm, fin, val)
    data = enc.drain(outs, val)[0]
    data += enc.flush()[0]
    r = enc.renderers[0]
    assert r.frame_count == 4
    assert r.total_bytes == len(data)
    assert sum(r.frame_sizes) == len(data)


@pytest.mark.parametrize(
    "sr,kbps,mode,preset",
    [
        (16000, 48, Mode.MONO, "hq"),
        (22050, 64, Mode.JOINT_STEREO, "hq"),
        (8000, 32, Mode.MONO, "spec_strict"),
        (24000, 96, Mode.STEREO, "spec_strict"),
    ],
)
def test_native_matches_python_lsf(sr, kbps, mode, preset):
    """LSF (MPEG-2/2.5) native rendering: one-granule side info, 8-bit
    main_data_begin (255-byte reservoir reach), 9-bit scalefac_compress,
    no scfsi/preflag bits, version header bits — byte-identical to the
    Python FrameAssembler across rates, modes and presets. Covers both
    MPEG-2 (16-24 kHz) and MPEG-2.5 (8-12 kHz) header/side-info layouts
    through the device-packed render path (LSF implies strict entropy)."""
    import swiftmp3_tpu.parallel.batch as batch_mod

    rng = np.random.default_rng(sr % 101)
    base = [
        (rng.standard_normal(1152 * 3 + 400) * 0.4).astype(np.float32),
        (np.sin(np.arange(1152 * 5) * 0.07) * 0.6).astype(np.float32),
    ]
    streams = [
        np.stack([s, 0.8 * s], axis=-1).reshape(-1) if mode != Mode.MONO else s
        for s in base
    ]
    mk = getattr(MP3EncoderOptions, preset)
    opts = mk(mode=mode, bitrate_kbps=kbps, sample_rate=sr)

    def run(use_native):
        class _B(batch_mod.BatchEncoder):
            def __init__(self, *a, **kw):
                kw["use_native"] = use_native
                super().__init__(*a, **kw)

        orig = batch_mod.BatchEncoder
        batch_mod.BatchEncoder = _B
        try:
            return encode_batch(opts, streams, frames_per_step=4)
        finally:
            batch_mod.BatchEncoder = orig

    native, python = run(True), run(False)
    for i, (a, b) in enumerate(zip(native, python)):
        assert a == b, f"stream {i}: {len(a)} vs {len(b)} bytes"
