"""MPEG-2/2.5 (LSF) Layer III decode — third-party stream coverage.

The encoder family is MPEG-1-only (reference parity: the reference's
header writer hardcodes MPEG-1, MP3Encoder.swift), so LSF support is
decode-side only and the validation loop is fully external: libmp3lame
produces real low-sample-rate streams (it switches to MPEG-2 below 32 kHz
input and MPEG-2.5 below 16 kHz), libmpg123 arbitrates the reading.
Content includes hard transients so every stream carries start/stop/short
granules — the case that caught both LSF-specific traps:

- the window-switching big_values region boundary is BAND-DERIVED, not a
  fixed 36 lines (start/stop: 54 lines at MPEG-2 rates, 108 at 8 kHz;
  pure short: 72 at 8 kHz);
- ffmpeg's 24 kHz long band table puts the band 17/18 boundary at line
  330 where lame and mpg123 use 332 (the ISO 13818-3 corrigendum
  reading) — decoding lame streams with the 330 reading mis-scales lines
  330-331 on every frame where bands 17/18 carry different scalefactors
  (~40-55 dB granule errors, post-transient frames only). The shipped
  tables use the lame/mpg123 reading (tools/extract_lsf_tables.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from swiftmp3_tpu.decoder import decode_mp3
from swiftmp3_tpu.utils.external import have_lame, have_mpg123, lame_encode, mpg123_decode
from swiftmp3_tpu.utils.quality import decode_agreement_snr

external = pytest.mark.skipif(
    not (have_mpg123() and have_lame()), reason="system codecs not available"
)


def _content(sr: int, seconds: float = 2.0) -> np.ndarray:
    """Tonal bed + hard clicks: forces start/stop/short granules and real
    scalefactor allocation around every transient."""
    n = int(seconds * sr)
    t = np.arange(n) / sr
    base = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.15 * np.sin(2 * np.pi * 997 * t)
    for c in range(4000, n - 400, sr // 2):
        base[c : c + 200] += 0.4 * np.sign(np.sin(2 * np.pi * 1500 * t[c : c + 200]))
    return base.astype(np.float32)


@external
@pytest.mark.parametrize(
    "sr,kbps",
    [(22050, 64), (24000, 128), (16000, 96), (11025, 32), (12000, 48), (8000, 24)],
)
def test_lsf_mono_decode_agrees_with_mpg123(sr, kbps):
    pcm = _content(sr)
    blob = lame_encode(pcm, sample_rate=sr, bitrate_kbps=kbps, mode="mono")
    dec = decode_mp3(blob, iso_conventions=True)
    assert dec.sample_rate == sr and dec.channels == 1
    assert dec.frame_count * 576 >= len(pcm)  # one granule per LSF frame
    ext, xsr = mpg123_decode(blob)
    assert xsr == sr
    m = min(len(ext), len(dec.pcm))
    assert m >= len(pcm) - 2 * 576
    agree = decode_agreement_snr(ext[:m, 0], dec.pcm[:m, 0])
    assert agree > 60.0, (sr, kbps, agree)


@external
@pytest.mark.parametrize(
    "sr,kbps,mode", [(24000, 128, "stereo"), (22050, 96, "joint"), (16000, 64, "joint")]
)
def test_lsf_stereo_decode_agrees_with_mpg123(sr, kbps, mode):
    """Stereo/joint LSF: per-channel side info, M/S on joint frames, and —
    at 24 kHz — the corrigendum band row under real scalefactors (this is
    the exact case the ffmpeg 330/332 divergence corrupted)."""
    base = _content(sr)
    pcm = np.stack([base, np.roll(base, 7) * 0.8], axis=1).astype(np.float32)
    blob = lame_encode(pcm, sample_rate=sr, bitrate_kbps=kbps, mode=mode)
    dec = decode_mp3(blob, iso_conventions=True)
    assert dec.sample_rate == sr and dec.channels == 2
    ext, xsr = mpg123_decode(blob)
    assert xsr == sr
    m = min(len(ext), len(dec.pcm))
    for c in range(2):
        agree = decode_agreement_snr(ext[:m, c], dec.pcm[:m, c])
        assert agree > 60.0, (sr, kbps, mode, c, agree)


def test_lsf_band_tables_invariants():
    """Generated-table sanity: every LSF row covers the spectrum (21 long
    bands + remainder = 576; 12 short bands + remainder = 192 per window)
    and the 24 kHz row carries the lame/mpg123 corrigendum boundary."""
    from swiftmp3_tpu.decoder._lsf_data import LSF_BAND_LONG, LSF_BAND_SHORT

    assert sorted(LSF_BAND_LONG) == [8000, 11025, 12000, 16000, 22050, 24000]
    for sr, row in LSF_BAND_LONG.items():
        assert len(row) == 21 and sum(row) <= 576, sr
    for sr, row in LSF_BAND_SHORT.items():
        assert len(row) == 12 and sum(row) <= 192, sr
    bounds24 = np.cumsum((0,) + LSF_BAND_LONG[24000])
    assert bounds24[18] == 332 and bounds24[19] == 394  # not ffmpeg's 330


def test_lsf_sf_expand_cases():
    """The six scalefac_compress decompositions cover every band exactly
    once: each (case, window-class) group vector sums to the full band
    count (21 long, 36 pure-short, 33 mixed = 6 long + 9x3 short)."""
    from swiftmp3_tpu.decoder._lsf_data import LSF_NSF_TABLE
    from swiftmp3_tpu.decoder.decoder import _lsf_sf_expand

    for case in range(6):
        long_n, short_n, mixed_n = (sum(LSF_NSF_TABLE[case][w]) for w in range(3))
        assert (long_n, short_n, mixed_n) == (21, 36, 33), case
    # decomposition is a bijection onto slen tuples within each range
    seen = set()
    for sf in range(400):
        seen.add(tuple(_lsf_sf_expand(sf, 5, 4, 4)))
    assert len(seen) == 400  # 5*5*4*4 = 400 distinct tuples
    assert _lsf_sf_expand(399, 5, 4, 4) == [4, 4, 3, 3]
    assert _lsf_sf_expand(0, 5, 4, 4) == [0, 0, 0, 0]


@external
def test_mpeg1_streams_unchanged_by_lsf_support():
    """Guard: the band-derived region boundary and version dispatch are
    byte-neutral for MPEG-1 (boundary evaluates to 36 at every MPEG-1
    rate) — a 44.1 kHz lame stream still decodes conformance-grade."""
    sr = 44100
    pcm = _content(sr, seconds=1.5)
    blob = lame_encode(pcm, sample_rate=sr, bitrate_kbps=128, mode="mono")
    dec = decode_mp3(blob, iso_conventions=True)
    assert dec.sample_rate == sr
    ext, _ = mpg123_decode(blob)
    m = min(len(ext), len(dec.pcm))
    agree = decode_agreement_snr(ext[:m, 0], dec.pcm[:m, 0])
    assert agree > 60.0, agree


# --- MPEG-2.5 8 kHz mixed blocks (hand-assembled producer) ---------------------
# lame never emits mixed blocks, so — like the intensity surfaces in
# tests/test_intensity.py — the test IS the producer: conforming mono
# 8 kHz MPEG-2.5 frames whose single granule is a MIXED block (72-line /
# 4-subband long head, ISO 13818-3's 6-band head geometry), assembled
# from the repo's own emission primitives and arbitrated by libmpg123.


def build_8k_mixed_stream(
    n_frames: int = 4, gain: int = 170, seed: int = 21, with_sf: bool = False
) -> bytes:
    from swiftmp3_tpu.io.bitwriter import BitstreamWriter
    from swiftmp3_tpu.io.huffman_pack import pack_chunks
    from swiftmp3_tpu.io.sideinfo import GranuleInfo, build_side_info_lsf
    from swiftmp3_tpu.ops import reference as ref
    from swiftmp3_tpu.tables import (
        bitrate_index,
        sample_rate_index,
        short_band_table,
    )

    from swiftmp3_tpu.decoder.tables import mixed_head

    sr, kbps = 8000, 64
    sb = np.concatenate([[0], np.cumsum(short_band_table(sr))]).astype(int)
    # 72-line stream-layout head, short region from sfb 3 (tables.mixed_head)
    head, first_sfb = mixed_head(sr)
    hi3 = head + 3 * (int(sb[9]) - int(sb[first_sfb]))  # through short sfb 8
    rng = np.random.default_rng(seed)
    frame_size = (72 * kbps * 1000) // sr  # 576 bytes
    slot = frame_size - 4 - 9  # mono LSF side info
    # with_sf: case 0 mixed (ns=(6,9,9,9)), slens (2,2,2,2) -> compress
    # ((2*5+2)*4+2)*4+2 = 202; 6 long-head slots + short sfbs 3..11
    if with_sf:
        sf_vals = np.asarray(
            [1, 2, 3, 1, 2, 3] + [s % 4 for s in range(27)], np.int64
        )
        sf_widths = np.full(33, 2, dtype=np.int64)
        compress = 202
    else:
        sf_vals = np.zeros(0, np.int64)
        sf_widths = np.zeros(0, np.int64)
        compress = 0  # case 0, slens (0,0,0,0): no sf bits
    out = bytearray()
    for _ in range(n_frames):
        # transmission order: long head natural, then short region sfb-major
        q = np.zeros(576, dtype=np.int64)
        q[:hi3] = rng.integers(-3, 4, hi3)
        q[hi3 - 1] = 2
        layout = ref.strict_entropy_layout(q, sr, ref.BLOCK_MIXED, True, True)
        gi = GranuleInfo(
            part23_length=int(sf_widths.sum()) + int(layout["part23_bits"]),
            big_values=int(layout["big_values"]),
            global_gain=gain,
            scalefac_compress=compress,
            window_switching=1,
            block_type=2,
            mixed_block_flag=1,
            table_select=tuple(layout["table_select"]),
            count1table_select=int(layout["count1table_select"]),
            scalefac_scale=0,
        )
        h = BitstreamWriter()
        h.write(0x7FF, 11)
        h.write(0b00, 2)  # MPEG-2.5
        h.write(0b01, 2)  # Layer III
        h.write(1, 1)  # no CRC
        h.write(bitrate_index(kbps, sr), 4)
        h.write(sample_rate_index(sr), 2)
        h.write(0, 1)
        h.write(0, 1)
        h.write(0b11, 2)  # mono
        h.write(0, 2)
        h.write(0, 1)
        h.write(1, 1)
        h.write(0, 2)
        side = build_side_info_lsf(1, [[gi]], 0)
        md, _bits = pack_chunks(
            np.concatenate([sf_vals, layout["chunks"]]),
            np.concatenate([sf_widths, layout["nbits"]]),
        )
        assert len(md) <= slot, (len(md), slot)
        out += h.data + side + md + bytes(slot - len(md))
    return bytes(out)


def test_8k_mixed_stream_wellformed():
    blob = build_8k_mixed_stream()
    dec = decode_mp3(blob, iso_conventions=True)
    assert dec.frame_count == 4
    assert dec.sample_rate == 8000
    assert np.all(np.isfinite(dec.pcm))
    assert float(np.sum(dec.pcm ** 2)) > 0


@pytest.mark.skipif(not have_mpg123(), reason="libmpg123 not available")
@pytest.mark.parametrize("with_sf", [False, True])
def test_8k_mixed_decode_agrees_with_mpg123(with_sf):
    """The conformance claim for the last LSF exotic: the 8 kHz mixed-block
    hybrid reading (72-line stream-layout head for reorder + scalefactor
    map, region boundary at line 108, but the UNIVERSAL 2-subband IMDCT
    switch point and ONE alias boundary — see tables.mixed_head for the
    per-knob probe that isolated it) == libmpg123's, with and without
    scalefactor content (long-head slots + short sfbs 3-11)."""
    blob = build_8k_mixed_stream(with_sf=with_sf)
    dec = decode_mp3(blob, iso_conventions=True)
    ext, _ = mpg123_decode(blob)
    m = min(ext.shape[0], dec.pcm.shape[0])
    assert m >= 2 * 576
    agree = decode_agreement_snr(ext[:m, 0], dec.pcm[:m, 0])
    assert agree > 60.0, (with_sf, agree)


# --- MIXED region-0 boundary: de-facto decoder law (round 5) ------------------
# ISO 13818-3's region_address derivation (first 8 long bands) would put the
# mixed region-0/1 boundary at 54 for 16/22.05/24 kHz; libmpg123 actually
# reads the MPEG-1 constant 36 there and the 8-band law's 108 only at 8 kHz.
# The producers below discriminate the bound: region-0 values need table 15,
# region-1 values a small table, so a decoder using a different bound
# desyncs the Huffman read (~21 dB or worse). tables.mixed_switch_bound is
# the pinned law; this test keeps both directions honest (the right bound
# agrees at ~128 dB, the ISO-derived candidate measurably does NOT).


def _mixed_bound_stream(sr: int, bound: int, kbps: int = 160) -> bytes:
    from swiftmp3_tpu.io.bitwriter import BitstreamWriter
    from swiftmp3_tpu.io.huffman_pack import pack_chunks
    from swiftmp3_tpu.io.sideinfo import GranuleInfo, build_side_info_lsf
    from swiftmp3_tpu.ops import reference as ref
    from swiftmp3_tpu.tables import bitrate_index, lsf_version, sample_rate_index

    rng = np.random.default_rng(9)
    q = np.zeros(576, dtype=np.int64)
    q[:36] = rng.integers(8, 15, 36) * rng.choice([-1, 1], 36)
    q[36:130] = rng.integers(1, 3, 94) * rng.choice([-1, 1], 94)
    orig = ref.switch_bound, ref.mixed_switch_bound
    ref.switch_bound = lambda s, ps: bound
    ref.mixed_switch_bound = lambda s: bound
    try:
        layout = ref.strict_entropy_layout(q, sr, ref.BLOCK_MIXED, False, True)
    finally:
        ref.switch_bound, ref.mixed_switch_bound = orig
    assert layout["table_select"][0] != layout["table_select"][1], (
        "probe needs distinct region tables to discriminate the bound"
    )
    ver = lsf_version(sr)
    frame_size = (72 * kbps * 1000) // sr
    slot = frame_size - 4 - 9
    out = bytearray()
    for _ in range(4):
        gi = GranuleInfo(
            part23_length=int(layout["part23_bits"]),
            big_values=int(layout["big_values"]), global_gain=170,
            scalefac_compress=0, window_switching=1, block_type=2,
            mixed_block_flag=1, table_select=tuple(layout["table_select"]),
            count1table_select=int(layout["count1table_select"]),
            scalefac_scale=0)
        h = BitstreamWriter()
        h.write(0x7FF, 11)
        h.write(0b00 if ver == 2 else 0b10, 2)
        h.write(0b01, 2)
        h.write(1, 1)
        h.write(bitrate_index(kbps, sr), 4)
        h.write(sample_rate_index(sr), 2)
        h.write(0, 1); h.write(0, 1); h.write(0b11, 2); h.write(0, 2)
        h.write(0, 1); h.write(1, 1); h.write(0, 2)
        side = build_side_info_lsf(1, [[gi]], 0)
        md, _ = pack_chunks(layout["chunks"], layout["nbits"])
        assert len(md) <= slot, (len(md), slot)
        out += h.data + side + md + bytes(slot - len(md))
    return bytes(out)


def test_mixed_switch_bound_values():
    from swiftmp3_tpu.decoder.tables import mixed_region_bound
    from swiftmp3_tpu.tables import mixed_switch_bound

    for sr in (44100, 48000, 32000, 22050, 24000, 16000):
        assert mixed_switch_bound(sr) == 36, sr
    assert mixed_switch_bound(11025) == 54
    assert mixed_switch_bound(12000) == 54
    assert mixed_switch_bound(8000) == 108
    # encoder and decoder carry INDEPENDENT transcriptions of the law
    # (table-independence contract) — they must agree at every rate
    for sr in (44100, 48000, 32000, 22050, 24000, 16000, 11025, 12000, 8000):
        assert mixed_region_bound(sr) == mixed_switch_bound(sr), sr


@pytest.mark.skipif(not have_mpg123(), reason="libmpg123 not available")
@pytest.mark.parametrize("sr", [22050, 16000, 24000, 11025, 12000, 8000])
def test_mixed_region_bound_matches_mpg123(sr):
    """Streams priced at tables.mixed_switch_bound decode identically in
    the oracle and libmpg123 (~128 dB); at the MPEG-2 rates (where the
    ISO 8-band candidate 54 differs from the de-facto 36) a 54-priced
    stream measurably decodes to DIFFERENT audio — pinning that the
    de-facto law, not the ISO derivation, is what decoders read."""
    from swiftmp3_tpu.tables import mixed_switch_bound

    right = mixed_switch_bound(sr)
    blob = _mixed_bound_stream(sr, right)
    dec = decode_mp3(blob, iso_conventions=True)
    ext, _ = mpg123_decode(blob)
    m = min(ext.shape[0], dec.pcm.shape[0])
    agree = decode_agreement_snr(ext[:m, 0], dec.pcm[:m, 0])
    assert agree > 60.0, (sr, right, agree)
    if right != 54:  # MPEG-2 rates: the ISO candidate is measurably wrong
        blob_iso = _mixed_bound_stream(sr, 54)
        ext2, _ = mpg123_decode(blob_iso)
        mm = min(m, ext2.shape[0])
        # same spectral intent, different priced bound: mpg123 decodes
        # them to different audio (teeth: reverting the law to the ISO
        # derivation would make these equal and the assert fail)
        diff = decode_agreement_snr(ext[:mm, 0], ext2[:mm, 0])
        assert diff < 40.0, (sr, diff)
