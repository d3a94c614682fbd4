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


# --- LSF (MPEG-2) intensity -----------------------------------------------------

LSF_SR = 22050
LSF_KBPS = 160
LSF_BOUND_SFB = 11  # right channel zero from this band boundary upward
# bands 11..20: odd positions attenuate LEFT, even RIGHT (ISO 13818-3
# 2^(-pos/4) law); 0 = both at 1; 7 = all-ones of the 3-bit field = the
# LSF illegal marker (band keeps its L/R reading)
LSF_IS_POS = [1, 2, 3, 4, 0, 5, 6, 7, 2, 1]


def _lsf_bounds():
    return np.concatenate([[0], np.cumsum(band_table(LSF_SR))]).astype(int)


def _lsf_long_granule(q, sf_vals, sf_widths, compress, gain):
    """(GranuleInfo, chunks, nbits) for one LSF long granule with
    explicitly provided scalefactor field values/widths (the LSF 6-case
    slen law is hand-encoded by the caller — this is a producer, the
    decoder's reading is what's under test)."""
    layout = ref.strict_entropy_layout(q, LSF_SR, ref.BLOCK_LONG, True, True)
    sf_vals = np.asarray(sf_vals, dtype=np.int64)
    sf_widths = np.asarray(sf_widths, dtype=np.int64)
    keep = sf_widths > 0
    gi = GranuleInfo(
        part23_length=int(sf_widths.sum()) + int(layout["part23_bits"]),
        big_values=int(layout["big_values"]),
        global_gain=gain,
        scalefac_compress=int(compress),
        table_select=tuple(layout["table_select"]),
        region0_count=int(layout["region0"]),
        region1_count=int(layout["region1"]),
        count1table_select=int(layout["count1table_select"]),
        scalefac_scale=0,
    )
    return (
        gi,
        [sf_vals[keep], layout["chunks"]],
        [sf_widths[keep], layout["nbits"]],
    )


def build_lsf_is_stream(
    n_frames: int = 4, intensity_scale: int = 0, gain: int = 170, seed: int = 11
) -> bytes:
    """Conforming MPEG-2 (22.05 kHz) joint-stereo stream, one long granule
    per frame, intensity-coded upper bands. Right channel scalefactor
    field: intensity case 3 (ns=(7,7,7), slens (0,3,3) -> compress
    ((0*6+3)*6+3)<<1 | intensity_scale = 42|is), positions LSF_IS_POS in
    bands 11..20, real scalefactors (0) below the bound."""
    from swiftmp3_tpu.io.bitwriter import BitstreamWriter
    from swiftmp3_tpu.io.sideinfo import build_side_info_lsf

    bounds = _lsf_bounds()
    rz = int(bounds[LSF_BOUND_SFB])
    hi = int(bounds[18])  # left spectrum extent
    rng = np.random.default_rng(seed)
    frame_size = (72 * LSF_KBPS * 1000) // LSF_SR
    slot = frame_size - 4 - 17
    # right channel scalefactor fields, case 3 (groups of 7 bands at
    # slens 0/3/3): group 0 carries no bits; groups 1-2 carry 3-bit values
    sf_vals = np.zeros(21, dtype=np.int64)
    sf_vals[11:21] = LSF_IS_POS
    sf_widths = np.array([0] * 7 + [3] * 14, dtype=np.int64)
    compress = (((0 * 6 + 3) * 6 + 3) << 1) | intensity_scale
    out = bytearray()
    for _ in range(n_frames):
        ql = np.zeros(576, dtype=np.int64)
        ql[:hi] = rng.integers(-4, 5, hi)
        ql[hi - 1] = 3
        qr = np.zeros(576, dtype=np.int64)
        qr[:rz] = rng.integers(-4, 5, rz)
        qr[rz - 1] = 2
        gil, cl, nl = _lsf_long_granule(ql, [0], [0], 0, gain)
        gir, cr, nr = _lsf_long_granule(qr, sf_vals, sf_widths, compress, gain)
        granules = [[gil, gir]]
        chunks = cl + cr
        nbits = nl + nr
        h = BitstreamWriter()
        h.write(0x7FF, 11)
        h.write(0b10, 2)  # MPEG-2 (LSF)
        h.write(0b01, 2)  # Layer III
        h.write(1, 1)  # no CRC
        h.write(bitrate_index(LSF_KBPS, LSF_SR), 4)
        h.write(sample_rate_index(LSF_SR), 2)
        h.write(0, 1)  # padding
        h.write(0, 1)  # private
        h.write(0b01, 2)  # joint stereo
        h.write(0b01, 2)  # mode_ext: intensity only
        h.write(0, 1)
        h.write(1, 1)
        h.write(0, 2)
        side = build_side_info_lsf(2, granules, 0)
        md, _bits = pack_chunks(np.concatenate(chunks), np.concatenate(nbits))
        assert len(md) <= slot, (len(md), slot)
        out += h.data + side + md + bytes(slot - len(md))
    return bytes(out)


LSF_SHORT_BOUND = 6  # right channel zero from this short band upward
# per (short sfb 6..11, window): odd/even/0/illegal(7) coverage
LSF_IS_POS_SHORT = [[1, 2, 0], [3, 4, 7], [5, 6, 1], [2, 0, 3], [7, 1, 4], [2, 5, 6]]


def build_lsf_short_is_stream(
    n_frames: int = 4, intensity_scale: int = 0, gain: int = 170, seed: int = 13
) -> bytes:
    """MPEG-2 joint-stereo stream of PURE SHORT granules with
    intensity-coded upper short bands. Right channel: intensity case 3
    short (ns=(12,12,12), slens (0,3,3) -> groups = sfbs 0-3 / 4-7 / 8-11
    in (sfb, window) order), positions LSF_IS_POS_SHORT at sfbs 6..11."""
    from swiftmp3_tpu.io.bitwriter import BitstreamWriter
    from swiftmp3_tpu.io.sideinfo import build_side_info_lsf
    from swiftmp3_tpu.tables import short_band_table

    sb = np.concatenate([[0], np.cumsum(short_band_table(LSF_SR))]).astype(int)
    rz3 = 3 * int(sb[LSF_SHORT_BOUND])  # right's stream-order zero start
    hi3 = 3 * int(sb[10])  # left spectrum extent (below the sfb11 tail)
    rng = np.random.default_rng(seed)
    frame_size = (72 * LSF_KBPS * 1000) // LSF_SR
    slot = frame_size - 4 - 17
    sf_vals = np.zeros(36, dtype=np.int64)
    for s in range(6, 12):
        for w in range(3):
            sf_vals[s * 3 + w] = LSF_IS_POS_SHORT[s - 6][w]
    sf_widths = np.array([0] * 12 + [3] * 24, dtype=np.int64)
    compress = (((0 * 6 + 3) * 6 + 3) << 1) | intensity_scale
    out = bytearray()
    for _ in range(n_frames):
        ql = np.zeros(576, dtype=np.int64)
        ql[:hi3] = rng.integers(-4, 5, hi3)
        ql[hi3 - 1] = 3
        qr = np.zeros(576, dtype=np.int64)
        qr[:rz3] = rng.integers(-4, 5, rz3)
        qr[rz3 - 1] = 2

        def _short_gi(q, vals, widths, comp):
            layout = ref.strict_entropy_layout(
                q, LSF_SR, ref.BLOCK_SHORT, True, True
            )
            vals = np.asarray(vals, dtype=np.int64)
            widths = np.asarray(widths, dtype=np.int64)
            keep = widths > 0
            gi = GranuleInfo(
                part23_length=int(widths.sum()) + int(layout["part23_bits"]),
                big_values=int(layout["big_values"]),
                global_gain=gain,
                scalefac_compress=int(comp),
                window_switching=1,
                block_type=2,
                mixed_block_flag=0,
                table_select=tuple(layout["table_select"]),
                count1table_select=int(layout["count1table_select"]),
                scalefac_scale=0,
            )
            return gi, [vals[keep], layout["chunks"]], [widths[keep], layout["nbits"]]

        gil, cl, nl = _short_gi(ql, [0], [0], 0)
        gir, cr, nr = _short_gi(qr, sf_vals, sf_widths, compress)
        granules = [[gil, gir]]
        chunks, nbits = cl + cr, nl + nr
        h = BitstreamWriter()
        h.write(0x7FF, 11)
        h.write(0b10, 2)  # MPEG-2 (LSF)
        h.write(0b01, 2)
        h.write(1, 1)
        h.write(bitrate_index(LSF_KBPS, LSF_SR), 4)
        h.write(sample_rate_index(LSF_SR), 2)
        h.write(0, 1)
        h.write(0, 1)
        h.write(0b01, 2)  # joint stereo
        h.write(0b01, 2)  # mode_ext: intensity only
        h.write(0, 1)
        h.write(1, 1)
        h.write(0, 2)
        side = build_side_info_lsf(2, granules, 0)
        md, _bits = pack_chunks(np.concatenate(chunks), np.concatenate(nbits))
        assert len(md) <= slot, (len(md), slot)
        out += h.data + side + md + bytes(slot - len(md))
    return bytes(out)


@pytest.mark.skipif(not have_mpg123(), reason="libmpg123 not available")
@pytest.mark.parametrize("intensity_scale", [0, 1])
def test_lsf_short_is_decode_agrees_with_mpg123(intensity_scale):
    """LSF short-window intensity: per-(band, window) positions under the
    LSF position law, libmpg123-arbitrated."""
    blob = build_lsf_short_is_stream(intensity_scale=intensity_scale)
    dec = decode_mp3(blob, iso_conventions=True)
    assert dec.frame_count == 4 and np.all(np.isfinite(dec.pcm))
    ext, _ = mpg123_decode(blob)
    m = min(ext.shape[0], dec.pcm.shape[0])
    assert m >= 2 * 576
    for c in range(2):
        agree = decode_agreement_snr(ext[:m, c], dec.pcm[:m, c])
        assert agree > 60.0, (intensity_scale, c, agree)


def test_lsf_is_factors_law():
    """Unit pin of the LSF position law (ISO 13818-3): odd attenuates
    LEFT by base^((pos+1)/2), even RIGHT by base^(pos/2), base =
    2^(-0.25*(intensity_scale+1)); 0 = both 1; all-ones of the band's
    own slen field = illegal."""
    from swiftmp3_tpu.decoder.decoder import _is_factors

    for isc, base in ((0, 2 ** -0.25), (1, 2 ** -0.5)):
        assert _is_factors(0, 1, isc, 3) == (1.0, 1.0)
        kl, kr = _is_factors(1, 1, isc, 3)
        assert kr == 1.0 and abs(kl - base) < 1e-12
        kl, kr = _is_factors(2, 1, isc, 3)
        assert kl == 1.0 and abs(kr - base) < 1e-12
        kl, kr = _is_factors(5, 1, isc, 3)
        assert kr == 1.0 and abs(kl - base ** 3) < 1e-12
        assert _is_factors(7, 1, isc, 3) is None  # all-ones of slen 3
        assert _is_factors(7, 1, isc, 4) is not None  # not all-ones at slen 4
    # MPEG-1 law untouched
    assert _is_factors(7, 0, 0, 3) is None
    assert _is_factors(6, 0, 0, 0) == (1.0, 0.0)


def test_lsf_is_stream_wellformed_and_fires():
    blob = build_lsf_is_stream()
    dec = decode_mp3(blob, iso_conventions=True)
    assert dec.frame_count == 4
    assert np.all(np.isfinite(dec.pcm))
    # odd positions attenuate left but keep right = left content: the
    # right channel must carry real signal in the IS region
    el = float(np.sum(dec.pcm[:, 0] ** 2))
    er = float(np.sum(dec.pcm[:, 1] ** 2))
    assert 0 < er and 0 < el


@pytest.mark.skipif(not have_mpg123(), reason="libmpg123 not available")
@pytest.mark.parametrize("intensity_scale", [0, 1])
def test_lsf_is_decode_agrees_with_mpg123(intensity_scale):
    """The conformance claim: our LSF intensity reading == libmpg123's
    (both intensity_scale variants, positions covering odd/even/0/illegal)."""
    blob = build_lsf_is_stream(intensity_scale=intensity_scale)
    dec = decode_mp3(blob, iso_conventions=True)
    ext, _ = mpg123_decode(blob)
    m = min(ext.shape[0], dec.pcm.shape[0])
    assert m >= 2 * 576
    for c in range(2):
        agree = decode_agreement_snr(ext[:m, c], dec.pcm[:m, c])
        assert agree > 60.0, (intensity_scale, c, agree)


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


# --- mixed-block intensity: HEAD-INTERIOR bound (round 5) -----------------------
# The last previously-unvalidated decoder boundary: a mixed IS granule whose
# right channel's zero part reaches INSIDE the long head (its entire short
# region zero). Reading (mpg123-arbitrated, ~130-132 dB at every probed
# bound incl. mid-band and the fully-zero right channel): head bands from
# the zero extent up apply the LONG-band intensity law with positions in
# the right channel's mixed long-head slots; bands below the extent keep
# M/S-or-L/R; the short region keeps the per-(band,window) law. The head's
# alias butterfly no longer commutes (IS gains are per-band), so mixed IS
# granules now defer alias reduction past stereo like long IS granules —
# byte-neutral on the previously validated bound>=sfb3 surface (the
# butterfly region is wholly non-IS there). The old head-keeps-L/R reading
# measures ~9 dB against mpg123 on these streams, so the A/B has teeth.


def build_mixed_head_is_stream(
    rz_nat: int,
    n_frames: int = 3,
    mode_ext: int = 0b01,
    gain: int = 170,
    seed: int = 11,
    head_pos=(1, 2, 3, 4, 5, 6, 2, 1),
) -> bytes:
    """Mixed IS stream with the right channel zero from NATURAL line
    rz_nat (inside the long head when rz_nat < 36); positions in the right
    channel's head long slots AND all short slots."""
    from swiftmp3_tpu.decoder.tables import short_reorder_dest
    from swiftmp3_tpu.io.bitwriter import BitstreamWriter

    sb = _short_bounds()
    hi_line = int(sb[10])
    dest = short_reorder_dest(SR, True)
    rng = np.random.default_rng(seed)
    frame_size = (144 * KBPS * 1000) // SR
    slot = frame_size - 4 - 32
    out = bytearray()
    for _ in range(n_frames):
        granules = [[None, None], [None, None]]
        chunks, nbits = [], []
        for gr in range(2):
            ql = np.zeros(576, dtype=np.int64)
            ql[: 3 * hi_line] = rng.integers(-4, 5, 3 * hi_line)
            qr = np.zeros(576, dtype=np.int64)
            qr[:rz_nat] = rng.integers(-4, 5, rz_nat)
            if rz_nat:
                qr[rz_nat - 1] = 2  # pin the zero extent exactly
            ql[3 * (hi_line - 1)] = 3
            sfl = np.zeros(36, dtype=np.int64)
            sfr = np.zeros(36, dtype=np.int64)
            for i in range(8):
                sfr[i] = head_pos[i % len(head_pos)]
            for s in range(3, 12):
                for w in range(3):
                    sfr[8 + (s - 3) * 3 + w] = [2, 4, 6, 5, 1, 0, 3, 3, 3][
                        (s * 3 + w) % 9
                    ]
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
        h.write(0b01, 2)
        h.write(mode_ext, 2)
        h.write(0, 1)
        h.write(1, 1)
        h.write(0, 2)
        side = build_side_info(2, granules, [[0, 0, 0, 0]] * 2, 0)
        md, _bits = pack_chunks(np.concatenate(chunks), np.concatenate(nbits))
        assert len(md) <= slot, (len(md), slot)
        out += h.data + side + md + bytes(slot - len(md))
    return bytes(out)


def test_mixed_head_is_fires():
    """The head reading must actually reconstruct right-channel content in
    the head's IS bands (vs the no-stereo-processing rebuild)."""
    blob = build_mixed_head_is_stream(rz_nat=20, mode_ext=0b01)
    dec = decode_mp3(blob, iso_conventions=True)
    plain = decode_mp3(
        build_mixed_head_is_stream(rz_nat=20, mode_ext=0b00),
        iso_conventions=True,
    )
    assert not np.allclose(dec.pcm[:, 1], plain.pcm[:, 1])
    el = float(np.sum(dec.pcm[:, 0] ** 2))
    er = float(np.sum(dec.pcm[:, 1] ** 2))
    assert 0 < er < el


@pytest.mark.skipif(not have_mpg123(), reason="libmpg123 not available")
@pytest.mark.parametrize("rz_nat", [20, 22, 2, 0])
@pytest.mark.parametrize("mode_ext", [0b01, 0b11])
def test_mixed_head_is_agrees_with_mpg123(rz_nat, mode_ext):
    """Head-interior bounds at a band boundary (20), mid-band (22), line 2
    and the fully-zero right channel (0), both mode_exts."""
    blob = build_mixed_head_is_stream(rz_nat=rz_nat, mode_ext=mode_ext)
    dec = decode_mp3(blob, iso_conventions=True)
    assert np.all(np.isfinite(dec.pcm))
    ext, _ = mpg123_decode(blob)
    m = min(ext.shape[0], dec.pcm.shape[0])
    for c in range(2):
        agree = decode_agreement_snr(ext[:m, c], dec.pcm[:m, c])
        assert agree > 60.0, (rz_nat, mode_ext, c, agree)


@pytest.mark.skipif(not have_mpg123(), reason="libmpg123 not available")
def test_mixed_head_is_illegal_position():
    """pos=7 in a head slot keeps that band's L/R reading (the MPEG-1
    illegal marker) — mpg123 agrees."""
    blob = build_mixed_head_is_stream(
        rz_nat=20, mode_ext=0b01, head_pos=(7, 7, 7, 7, 7, 7, 7, 7)
    )
    dec = decode_mp3(blob, iso_conventions=True)
    ext, _ = mpg123_decode(blob)
    m = min(ext.shape[0], dec.pcm.shape[0])
    for c in range(2):
        agree = decode_agreement_snr(ext[:m, c], dec.pcm[:m, c])
        assert agree > 60.0, (c, agree)
