"""Intensity-stereo DECODE support (ISO 2.4.3.4.9.3), externally validated.

libmp3lame never emits intensity stereo, so no third-party producer exists
on this rig — instead the test IS the producer: frames are hand-assembled
from the repo's own emission primitives (strict entropy layout, scalefactor
slots, pack_chunks, build_side_info) into conforming reservoir-free streams
(main_data_begin=0, each frame's data inside its own slot) with
mode_extension signalling intensity, a right channel whose spectrum is zero
from an exact scalefactor-band boundary upward, and intensity positions in
the right channel's scalefactor slots. The oracle's IS reading is then
A/B'd against the system libmpg123 — the same neutral-referee standard as
every other conformance claim in this repo.

All three window layouts are covered: long granules (per-band positions,
sfb21 tail), pure short granules (per-(band, window) positions with
per-window zero-part bounds, sfb12 tail), and MIXED granules (the same
short law restricted to the short region, lines >= 12 per window, short
sfbs 3-11; the long head keeps its M/S or L/R reading). The mixed reading
is pinned to the surface mpg123 actually arbitrates: intensity bounds at
a short-band boundary >= sfb 3 — a bound inside the long head has no
validated reading and the oracle leaves such frames unprocessed.
"""

from __future__ import annotations

import numpy as np
import pytest

from swiftmp3_tpu.decoder import decode_mp3
from swiftmp3_tpu.io.huffman_pack import pack_chunks
from swiftmp3_tpu.io.sideinfo import GranuleInfo, build_side_info
from swiftmp3_tpu.ops import reference as ref
from swiftmp3_tpu.tables import band_table, bitrate_index, sample_rate_index
from swiftmp3_tpu.utils.external import have_mpg123, mpg123_decode
from swiftmp3_tpu.utils.quality import decode_agreement_snr

SR = 44100
KBPS = 320
BOUND_SFB = 11  # right channel zero from this band boundary upward
IS_POS = [0, 1, 2, 3, 4, 5, 6, 3, 2, 1]  # bands 11..20


def _bounds():
    return np.concatenate([[0], np.cumsum(band_table(SR))]).astype(int)


def _granule(q: np.ndarray, sf: np.ndarray, gain: int):
    """(GranuleInfo, chunks, nbits) for one long-block granule."""
    layout = ref.strict_entropy_layout(q, SR, ref.BLOCK_LONG, True, True)
    sfd = ref._long_sfd(np.asarray(sf, dtype=np.int64), _bounds())
    sf_chunks, sf_nbits = ref.scalefactor_chunks_masked(
        sfd, np.ones(21, dtype=bool)
    )
    gi = GranuleInfo(
        part23_length=int(sf_nbits.sum()) + int(layout["part23_bits"]),
        big_values=int(layout["big_values"]),
        global_gain=gain,
        scalefac_compress=int(sfd["compress"]),
        table_select=tuple(layout["table_select"]),
        region0_count=int(layout["region0"]),
        region1_count=int(layout["region1"]),
        count1table_select=int(layout["count1table_select"]),
        scalefac_scale=0,
    )
    return gi, [sf_chunks, layout["chunks"]], [sf_nbits, layout["nbits"]]


def build_is_stream(
    n_frames: int = 3, mode_ext: int = 0b01, gain: int = 170, seed: int = 7
) -> bytes:
    """Conforming joint-stereo stream with intensity-coded upper bands."""
    from swiftmp3_tpu.io.bitwriter import BitstreamWriter

    bounds = _bounds()
    rz = int(bounds[BOUND_SFB])
    hi = int(bounds[18])  # left spectrum extent
    rng = np.random.default_rng(seed)
    frame_size = (144 * KBPS * 1000) // SR
    slot = frame_size - 4 - 32
    out = bytearray()
    for _ in range(n_frames):
        granules = [[None, None], [None, None]]
        chunks, nbits = [], []
        for gr in range(2):
            # left: data through the IS region; right: zero from rz upward,
            # last element before rz pinned nonzero (the zero-part bound is
            # then exactly rz in every decoder's reading)
            ql = np.zeros(576, dtype=np.int64)
            ql[:hi] = rng.integers(-4, 5, hi)
            ql[hi - 1] = 3
            qr = np.zeros(576, dtype=np.int64)
            qr[:rz] = rng.integers(-4, 5, rz)
            qr[rz - 1] = 2
            sfl = np.zeros(21, dtype=np.int64)
            sfr = np.zeros(21, dtype=np.int64)
            sfr[11:21] = IS_POS
            for ch, (q, sf) in enumerate(((ql, sfl), (qr, sfr))):
                gi, c, nb = _granule(q, sf, gain)
                granules[gr][ch] = gi
                chunks += c
                nbits += nb
        h = BitstreamWriter()
        h.write(0x7FF, 11)
        h.write(0b11, 2)  # MPEG-1
        h.write(0b01, 2)  # Layer III
        h.write(1, 1)  # no CRC
        h.write(bitrate_index(KBPS, SR), 4)
        h.write(sample_rate_index(SR), 2)
        h.write(0, 1)  # padding
        h.write(0, 1)  # private
        h.write(0b01, 2)  # joint stereo
        h.write(mode_ext, 2)
        h.write(0, 1)
        h.write(1, 1)
        h.write(0, 2)
        side = build_side_info(2, granules, [[0, 0, 0, 0]] * 2, 0)
        md, _bits = pack_chunks(
            np.concatenate(chunks), np.concatenate(nbits)
        )
        assert len(md) <= slot, (len(md), slot)
        out += h.data + side + md + bytes(slot - len(md))
    return bytes(out)


def test_is_stream_is_wellformed_and_is_fires():
    blob = build_is_stream(mode_ext=0b01)
    from tests.util import parse_frames

    frames = parse_frames(blob)
    assert len(frames) == 3
    assert all(f.mode == 1 for f in frames)
    dec = decode_mp3(blob, iso_conventions=True)
    assert dec.frame_count == 3
    assert np.all(np.isfinite(dec.pcm))
    # IS reconstruction must put real signal on BOTH channels even though
    # the right channel's upper spectrum is zero-coded: without the IS
    # law the right channel is just the low-band residue. Compare against
    # a mode_ext=00 rebuild of the same frames (no stereo processing).
    plain = decode_mp3(build_is_stream(mode_ext=0b00), iso_conventions=True)
    assert not np.allclose(dec.pcm[:, 1], plain.pcm[:, 1])
    # is_pos=6 bands are all-left: right gets less energy than left overall
    el = float(np.sum(dec.pcm[:, 0] ** 2))
    er = float(np.sum(dec.pcm[:, 1] ** 2))
    assert 0 < er < el


@pytest.mark.skipif(not have_mpg123(), reason="libmpg123 not available")
@pytest.mark.parametrize("mode_ext", [0b01, 0b11])
def test_is_decode_agrees_with_mpg123(mode_ext):
    """The conformance claim: our IS reading == libmpg123's on streams
    where the intensity bound is unambiguous (zero part starts exactly on
    a scalefactor-band boundary)."""
    blob = build_is_stream(mode_ext=mode_ext)
    dec = decode_mp3(blob, iso_conventions=True)
    ext, _ = mpg123_decode(blob)
    m = min(ext.shape[0], dec.pcm.shape[0])
    assert m >= 2 * 1152
    for c in range(2):
        agree = decode_agreement_snr(ext[:m, c], dec.pcm[:m, c])
        assert agree > 60.0, (mode_ext, c, agree)


# --- short-window intensity ----------------------------------------------------

SHORT_BOUND = 6  # right channel zero from this short band upward (all windows)
# per (short sfb 6..11, window) positions
IS_POS_SHORT = [[1, 3, 5], [0, 6, 2], [4, 4, 4], [2, 0, 6], [3, 1, 5], [6, 2, 0]]


def _short_bounds():
    from swiftmp3_tpu.tables import short_band_table

    return np.concatenate([[0], np.cumsum(short_band_table(SR))]).astype(int)


def _short_granule(q_stream: np.ndarray, sf_slots: np.ndarray, gain: int):
    """(GranuleInfo, chunks, nbits) for one PURE SHORT granule; q_stream is
    in the ISO 2.4.3.4.8 reordered (transmission) order."""
    layout = ref.strict_entropy_layout(q_stream, SR, ref.BLOCK_SHORT, True, True)
    fin = ref._finish_slots(np.asarray(sf_slots, dtype=np.int64), 18, 18)
    sfd = {
        "sf": np.zeros(21, dtype=np.int32),
        "sf_slots": np.asarray(sf_slots, dtype=np.int64),
        **fin,
    }
    sf_chunks, sf_nbits = ref.scalefactor_chunks_masked(
        sfd, np.ones(21, dtype=bool)
    )
    gi = GranuleInfo(
        part23_length=int(sf_nbits.sum()) + int(layout["part23_bits"]),
        big_values=int(layout["big_values"]),
        global_gain=gain,
        scalefac_compress=int(sfd["compress"]),
        window_switching=1,
        block_type=2,
        mixed_block_flag=0,
        table_select=tuple(layout["table_select"]),
        count1table_select=int(layout["count1table_select"]),
        scalefac_scale=0,
    )
    return gi, [sf_chunks, layout["chunks"]], [sf_nbits, layout["nbits"]]


def build_short_is_stream(
    n_frames: int = 3, mode_ext: int = 0b01, gain: int = 170, seed: int = 9
) -> bytes:
    """Joint-stereo stream of PURE SHORT granules with intensity-coded
    upper short bands (the zero part starts at the same band boundary in
    every window, so every decoder's bound reading agrees)."""
    from swiftmp3_tpu.io.bitwriter import BitstreamWriter

    sb = _short_bounds()
    rz3 = 3 * int(sb[SHORT_BOUND])  # right's stream-order zero start
    hi3 = 3 * int(sb[10])  # left spectrum extent (below the sfb11 tail)
    rng = np.random.default_rng(seed)
    frame_size = (144 * KBPS * 1000) // SR
    slot = frame_size - 4 - 32
    out = bytearray()
    for _ in range(n_frames):
        granules = [[None, None], [None, None]]
        chunks, nbits = [], []
        for gr in range(2):
            ql = np.zeros(576, dtype=np.int64)
            ql[:hi3] = rng.integers(-4, 5, hi3)
            ql[hi3 - 1] = 3
            qr = np.zeros(576, dtype=np.int64)
            qr[:rz3] = rng.integers(-4, 5, rz3)
            qr[rz3 - 1] = 2
            sfl = np.zeros(36, dtype=np.int64)
            sfr = np.zeros(36, dtype=np.int64)
            for s in range(6, 12):
                for w in range(3):
                    sfr[s * 3 + w] = IS_POS_SHORT[s - 6][w]
            for ch, (q, sf) in enumerate(((ql, sfl), (qr, sfr))):
                gi, c, nb = _short_granule(q, sf, gain)
                granules[gr][ch] = gi
                chunks += c
                nbits += nb
        h = BitstreamWriter()
        h.write(0x7FF, 11)
        h.write(0b11, 2)
        h.write(0b01, 2)
        h.write(1, 1)
        h.write(bitrate_index(KBPS, SR), 4)
        h.write(sample_rate_index(SR), 2)
        h.write(0, 1)
        h.write(0, 1)
        h.write(0b01, 2)  # joint stereo
        h.write(mode_ext, 2)
        h.write(0, 1)
        h.write(1, 1)
        h.write(0, 2)
        side = build_side_info(2, granules, [[0, 0, 0, 0]] * 2, 0)
        md, _bits = pack_chunks(np.concatenate(chunks), np.concatenate(nbits))
        assert len(md) <= slot, (len(md), slot)
        out += h.data + side + md + bytes(slot - len(md))
    return bytes(out)


@pytest.mark.skipif(not have_mpg123(), reason="libmpg123 not available")
@pytest.mark.parametrize("mode_ext", [0b01, 0b11])
def test_short_is_decode_agrees_with_mpg123(mode_ext):
    blob = build_short_is_stream(mode_ext=mode_ext)
    dec = decode_mp3(blob, iso_conventions=True)
    assert dec.frame_count == 3 and np.all(np.isfinite(dec.pcm))
    ext, _ = mpg123_decode(blob)
    m = min(ext.shape[0], dec.pcm.shape[0])
    assert m >= 2 * 1152
    for c in range(2):
        agree = decode_agreement_snr(ext[:m, c], dec.pcm[:m, c])
        assert agree > 60.0, (mode_ext, c, agree)


# --- mixed-block intensity ------------------------------------------------------

MIXED_BOUND = 6  # right channel zero from this short band upward (all windows)
# per (short sfb 6..11, window) positions; bands below MIXED_BOUND hold 0
# (real scalefactors of the coded region), bands 6..11 hold intensity
# positions in the right channel's slots.
IS_POS_MIXED = [[2, 4, 6], [5, 1, 0], [3, 3, 3], [0, 6, 2], [1, 5, 4], [6, 0, 2]]


def _mixed_granule(q_stream: np.ndarray, sf_slots: np.ndarray, gain: int):
    """(GranuleInfo, chunks, nbits) for one MIXED granule; q_stream is in
    the ISO 2.4.3.4.8 transmission order (long head in place, short lines
    >= 12 reordered sfb-major)."""
    layout = ref.strict_entropy_layout(q_stream, SR, ref.BLOCK_MIXED, True, True)
    fin = ref._finish_slots(np.asarray(sf_slots, dtype=np.int64), 17, 18)
    sfd = {
        "sf": np.zeros(21, dtype=np.int32),
        "sf_slots": np.asarray(sf_slots, dtype=np.int64),
        **fin,
    }
    sf_chunks, sf_nbits = ref.scalefactor_chunks_masked(
        sfd, np.ones(21, dtype=bool)
    )
    gi = GranuleInfo(
        part23_length=int(sf_nbits.sum()) + int(layout["part23_bits"]),
        big_values=int(layout["big_values"]),
        global_gain=gain,
        scalefac_compress=int(sfd["compress"]),
        window_switching=1,
        block_type=2,
        mixed_block_flag=1,
        table_select=tuple(layout["table_select"]),
        count1table_select=int(layout["count1table_select"]),
        scalefac_scale=0,
    )
    return gi, [sf_chunks, layout["chunks"]], [sf_nbits, layout["nbits"]]


def build_mixed_is_stream(
    n_frames: int = 3, mode_ext: int = 0b01, gain: int = 170, seed: int = 11
) -> bytes:
    """Joint-stereo stream of MIXED granules with intensity-coded upper
    short bands. The long head (natural 0..35) and short bands 3..5 are
    real on both channels; the right channel is zero from short band
    MIXED_BOUND upward in EVERY window (last line of each window pinned
    nonzero, so every decoder's per-window bound reading lands exactly on
    the band boundary)."""
    from swiftmp3_tpu.decoder.tables import short_reorder_dest
    from swiftmp3_tpu.io.bitwriter import BitstreamWriter

    sb = _short_bounds()
    rz_line = int(sb[MIXED_BOUND])  # right zero from this line, all windows
    hi_line = int(sb[10])  # left extent (below the sfb11 tail)
    dest = short_reorder_dest(SR, True)
    rng = np.random.default_rng(seed)
    frame_size = (144 * KBPS * 1000) // SR
    slot = frame_size - 4 - 32
    out = bytearray()
    for _ in range(n_frames):
        granules = [[None, None], [None, None]]
        chunks, nbits = [], []
        for gr in range(2):
            # natural order: natural index of (line, w) is 3*line + w, and
            # the long head occupies natural 0..35 — so "zero from line L
            # upward in every window" is "zero from natural 3*L upward"
            ql = np.zeros(576, dtype=np.int64)
            ql[: 3 * hi_line] = rng.integers(-4, 5, 3 * hi_line)
            qr = np.zeros(576, dtype=np.int64)
            qr[: 3 * rz_line] = rng.integers(-4, 5, 3 * rz_line)
            for w in range(3):  # pin every window's last coded line
                ql[3 * (hi_line - 1) + w] = 3
                qr[3 * (rz_line - 1) + w] = 2
            sfl = np.zeros(36, dtype=np.int64)
            sfr = np.zeros(36, dtype=np.int64)
            # mixed slots: 8 long, then (sfb 3..11) x 3 windows
            for s in range(6, 12):
                for w in range(3):
                    sfr[8 + (s - 3) * 3 + w] = IS_POS_MIXED[s - 6][w]
            for ch, (q, sf) in enumerate(((ql, sfl), (qr, sfr))):
                gi, c, nb = _mixed_granule(q[dest], sf, gain)
                granules[gr][ch] = gi
                chunks += c
                nbits += nb
        h = BitstreamWriter()
        h.write(0x7FF, 11)
        h.write(0b11, 2)
        h.write(0b01, 2)
        h.write(1, 1)
        h.write(bitrate_index(KBPS, SR), 4)
        h.write(sample_rate_index(SR), 2)
        h.write(0, 1)
        h.write(0, 1)
        h.write(0b01, 2)  # joint stereo
        h.write(mode_ext, 2)
        h.write(0, 1)
        h.write(1, 1)
        h.write(0, 2)
        side = build_side_info(2, granules, [[0, 0, 0, 0]] * 2, 0)
        md, _bits = pack_chunks(np.concatenate(chunks), np.concatenate(nbits))
        assert len(md) <= slot, (len(md), slot)
        out += h.data + side + md + bytes(slot - len(md))
    return bytes(out)


def test_mixed_is_stream_is_wellformed_and_is_fires():
    blob = build_mixed_is_stream(mode_ext=0b01)
    dec = decode_mp3(blob, iso_conventions=True)
    assert dec.frame_count == 3
    assert np.all(np.isfinite(dec.pcm))
    # the intensity law must reconstruct real right-channel signal in the
    # zero-coded upper short bands (vs the no-stereo-processing rebuild)
    plain = decode_mp3(build_mixed_is_stream(mode_ext=0b00), iso_conventions=True)
    assert not np.allclose(dec.pcm[:, 1], plain.pcm[:, 1])
    el = float(np.sum(dec.pcm[:, 0] ** 2))
    er = float(np.sum(dec.pcm[:, 1] ** 2))
    assert 0 < er < el


@pytest.mark.skipif(not have_mpg123(), reason="libmpg123 not available")
@pytest.mark.parametrize("mode_ext", [0b01, 0b11])
def test_mixed_is_decode_agrees_with_mpg123(mode_ext):
    """The conformance claim for the mixed reading: our per-(band, window)
    short-region law == libmpg123 on both-channel mixed IS granules."""
    blob = build_mixed_is_stream(mode_ext=mode_ext)
    dec = decode_mp3(blob, iso_conventions=True)
    assert dec.frame_count == 3 and np.all(np.isfinite(dec.pcm))
    ext, _ = mpg123_decode(blob)
    m = min(ext.shape[0], dec.pcm.shape[0])
    assert m >= 2 * 1152
    for c in range(2):
        agree = decode_agreement_snr(ext[:m, c], dec.pcm[:m, c])
        assert agree > 60.0, (mode_ext, c, agree)


# --- decoder corruption robustness ----------------------------------------------


@pytest.mark.parametrize("trial", range(8))
def test_decoder_survives_bitstream_corruption(trial):
    """Real-world decoder behavior: random byte corruption and truncation
    must never raise or emit non-finite PCM — corrupted frames/granules
    are skipped or decoded to whatever the bits say, like a streaming
    player. (The serving layer feeds untrusted bytes to the oracle in
    validation loops, so this is a safety surface, not a nicety.)"""
    from swiftmp3_tpu import MP3Encoder, MP3EncoderOptions, Mode

    rng = np.random.default_rng(4200 + trial)
    t = np.arange(8 * 1152) / 44100
    pcm = (0.4 * np.sin(2 * np.pi * 523 * t)).astype(np.float32)
    opts = MP3EncoderOptions.hq(mode=Mode.MONO, bitrate_kbps=128)
    s = MP3Encoder(opts, backend="numpy").new_session()
    blob = bytearray(s.encode(pcm) + s.flush())

    if trial % 2:
        blob = blob[: int(rng.integers(10, len(blob)))]  # truncation
    for _ in range(int(rng.integers(1, 12))):  # byte corruption
        if not blob:
            break
        blob[int(rng.integers(0, len(blob)))] = int(rng.integers(0, 256))

    dec = decode_mp3(bytes(blob), iso_conventions=True)
    assert np.all(np.isfinite(dec.pcm))
