"""Async streaming + file API tests (reference L6,
SwiftMP3Tests.swift:97-188)."""

import asyncio

import numpy as np
import pytest

from swiftmp3_tpu import ID3Tag, MP3Encoder, MP3EncoderOptions, Mode
from swiftmp3_tpu.streaming import encode_file_sync

from .util import parse_frames, sine

BACKEND = "numpy"


def encoder(**kwargs):
    return MP3Encoder(MP3EncoderOptions(**kwargs), backend=BACKEND)


def test_encode_async_stream():
    async def go():
        pcm = sine(0.4)
        chunks = [pcm[i : i + 12000] for i in range(0, len(pcm), 12000)]

        async def source():
            for c in chunks:
                await asyncio.sleep(0)
                yield c

        out = bytearray()
        async for data in encoder(mode=Mode.MONO).encode(source()):
            out += data
        return bytes(out)

    data = asyncio.run(go())
    frames = parse_frames(data)
    assert len(frames) > 0
    # streaming mode has no Xing header
    body = data[frames[0].offset + 4 : frames[0].offset + frames[0].size]
    assert b"Xing" not in body[:40] and b"Info" not in body[:40]


def test_encode_async_matches_sync():
    pcm = sine(0.3)

    async def go():
        async def source():
            yield pcm

        out = bytearray()
        async for data in encoder(mode=Mode.MONO).encode(source()):
            out += data
        return bytes(out)

    s = encoder(mode=Mode.MONO).new_session()
    expect = s.encode(pcm) + s.flush()
    assert asyncio.run(go()) == expect


def test_encode_sync_iterable():
    pcm = sine(0.2)

    async def go():
        out = bytearray()
        async for data in encoder(mode=Mode.MONO).encode([pcm[:20000], pcm[20000:]]):
            out += data
        return bytes(out)

    assert len(asyncio.run(go())) > 0


def test_empty_async_stream():
    async def go():
        async def source():
            return
            yield  # pragma: no cover

        out = bytearray()
        async for data in encoder(mode=Mode.MONO).encode(source()):
            out += data
        return bytes(out)

    assert asyncio.run(go()) == b""


def test_encode_to_file(tmp_path):
    path = tmp_path / "out.mp3"
    tag = ID3Tag(title="Stream", artist="Test")
    enc = encoder(mode=Mode.MONO, id3_tag=tag)
    pcm = sine(0.4)

    async def go():
        async def source():
            yield pcm

        await enc.encode_to_file(source(), path)

    asyncio.run(go())
    data = path.read_bytes()
    assert data[:3] == b"ID3"
    # locate audio start via synchsafe size, then expect the Xing frame
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    audio = data[10 + size :]
    assert audio[0] == 0xFF and (audio[1] & 0xE0) == 0xE0
    assert b"Info" in audio[:60]  # CBR -> Info tag in first frame
    parse_frames(audio)  # whole file is contiguous valid frames


def test_encode_file_sync(tmp_path):
    path = tmp_path / "sync.mp3"
    enc = encoder(mode=Mode.MONO)
    encode_file_sync(enc, sine(0.3), path)
    data = path.read_bytes()
    frames = parse_frames(data)
    assert len(frames) > 1


def test_file_xing_counts(tmp_path):
    path = tmp_path / "c.mp3"
    enc = encoder(mode=Mode.MONO)
    encode_file_sync(enc, sine(0.5), path)
    data = path.read_bytes()
    frames = parse_frames(data)
    tag_off = data.index(b"Info")
    declared_frames = int.from_bytes(data[tag_off + 8 : tag_off + 12], "big")
    declared_bytes = int.from_bytes(data[tag_off + 12 : tag_off + 16], "big")
    assert declared_frames == len(frames)  # includes the Xing frame itself
    assert declared_bytes == len(data)


def test_async_cancellation():
    """Task cancellation propagates out of the stream (reference:
    Task.checkCancellation, MP3Encoder.swift:160)."""

    async def go():
        started = asyncio.Event()

        async def slow_source():
            yield sine(0.1)
            started.set()
            await asyncio.sleep(30)
            yield sine(0.1)  # pragma: no cover

        async def consume():
            out = bytearray()
            async for data in encoder(mode=Mode.MONO).encode(slow_source()):
                out += data
            return bytes(out)

        task = asyncio.create_task(consume())
        await started.wait()
        task.cancel()
        try:
            await task
            return "not-cancelled"
        except asyncio.CancelledError:
            return "cancelled"

    assert asyncio.run(go()) == "cancelled"


def test_cli_end_to_end(tmp_path):
    import numpy as np

    from swiftmp3_tpu.cli import main as cli_main
    from swiftmp3_tpu.decoder import decode_mp3
    from swiftmp3_tpu.utils import write_wav

    sr = 44100
    t = np.arange(sr // 2) / sr
    pcm = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    wav = tmp_path / "in.wav"
    mp3 = tmp_path / "out.mp3"
    write_wav(wav, pcm, sr, 1)
    rc = cli_main([str(wav), str(mp3), "--backend", "numpy", "--quiet",
                   "--title", "T"])
    assert rc == 0
    blob = mp3.read_bytes()
    assert blob[:3] == b"ID3"
    dec = decode_mp3(blob)
    assert dec.frame_count > 0
    assert np.abs(dec.pcm).max() > 0.05


def test_xing_placeholder_matches_actual_frame_size():
    """The file writer's placeholder must equal the real Info frame's size
    in every header regime (seek-back overwrite): MPEG-1, LSF (72-slot
    law — the placeholder was 144-based at LSF before round 4), and
    free format (exact off-table rate)."""
    from swiftmp3_tpu import MP3Encoder
    from swiftmp3_tpu.streaming import xing_placeholder_size

    configs = [
        MP3EncoderOptions(mode=Mode.MONO, bitrate_kbps=128),
        MP3EncoderOptions.spec_strict(
            mode=Mode.MONO, sample_rate=16000, bitrate_kbps=48
        ),
        MP3EncoderOptions.spec_strict(
            mode=Mode.MONO, bitrate_kbps=150, free_format=True,
            linbits_tables=True,
        ),
    ]
    for opts in configs:
        s = MP3Encoder(opts, backend="numpy").new_session()
        assert xing_placeholder_size(opts) == len(s.generate_xing_header())
