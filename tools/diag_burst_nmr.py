"""Diagnostic: WHERE does the burst NMR gap vs lame live?

The round-3 attribution (ARCHITECTURE.md "Burst-NMR attribution") pinned
the residual burst gap (~15 dB NMR) as "lame's temporal machinery" after
scalefactor-side shaping measured negative twice. Before any round-4
attempt at noise targets inside candidate pricing, this tool maps the gap
cell-by-cell: per (analysis frame, bark band), the noise-over-threshold
linear ratio for hq and for lame, plus marginals that answer:

  1. Which FRAMES carry the NMR mass (attack / sustain / quiet)?
  2. Which BANDS carry it (under the tone / splatter bands / empty HF)?
  3. Does the picture change with bitrate (64k vs 128k vs 256k)?
     If the gap persists at 256k the economics story is wrong and the
     placement LAW is at fault; if it closes, it is budget allocation.

Uses the same masking law as utils.quality.masked_noise_ratio (the
referee), decomposed instead of averaged. External decode via libmpg123.

Run (CPU): python tools/diag_burst_nmr.py [--kbps 64 128 256] [--kind burst]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from swiftmp3_tpu import MP3Encoder, MP3EncoderOptions, Mode  # noqa: E402
from swiftmp3_tpu.utils.external import (  # noqa: E402
    have_lame,
    have_mpg123,
    lame_encode,
    mpg123_decode,
)
from swiftmp3_tpu.utils import quality as Q  # noqa: E402

from tune_psy import SR, synth  # noqa: E402

FRAME = 1024


def nmr_cells(original: np.ndarray, decoded: np.ndarray, sample_rate: int):
    """Per-(frame, band) noise/threshold LINEAR ratios, same law as
    masked_noise_ratio (Hann frames, bark bands, two-slope spread, -18 dB
    offset, ATH floor). Returns (ratios [F, n_bands], n_bands)."""
    original = np.asarray(original, dtype=np.float64).reshape(-1)
    decoded = np.asarray(decoded, dtype=np.float64).reshape(-1)
    d = Q._align(original, decoded, unit_gain=True)
    n = min(len(original), len(decoded) - d)
    ref = original[:n]
    dec = decoded[d : d + n]
    err = ref - dec

    hop = FRAME // 2
    win = np.hanning(FRAME)
    freqs = np.fft.rfftfreq(FRAME, 1.0 / sample_rate)
    f = np.maximum(freqs, 1.0)
    bark = 13.0 * np.arctan(0.00076 * f) + 3.5 * np.arctan((f / 7500.0) ** 2)
    n_bands = int(np.ceil(bark.max()))
    band_of = np.minimum(bark.astype(int), n_bands - 1)
    khz = f / 1000.0
    ath_db = (
        3.64 * khz**-0.8
        - 6.5 * np.exp(-0.6 * (khz - 3.3) ** 2)
        + 1e-3 * khz**4
    )
    ath_band = np.full(n_bands, np.inf)
    np.minimum.at(ath_band, band_of, ath_db)
    ath_pow = 10.0 ** ((ath_band - 96.0) / 10.0)

    rows = []
    for start in range(0, n - FRAME + 1, hop):
        R = np.fft.rfft(ref[start : start + FRAME] * win)
        E = np.fft.rfft(err[start : start + FRAME] * win)
        scale = 1.0 / (FRAME / 4) ** 2
        sp = np.zeros(n_bands)
        ep = np.zeros(n_bands)
        np.add.at(sp, band_of, np.abs(R) ** 2 * scale)
        np.add.at(ep, band_of, np.abs(E) ** 2 * scale)
        if sp.max() <= 0:
            rows.append(np.zeros(n_bands))
            continue
        sdb = 10.0 * np.log10(np.maximum(sp, 1e-30))
        spread = sdb.copy()
        for b in range(1, n_bands):
            spread[b] = max(spread[b], spread[b - 1] - 10.0)
        for b in range(n_bands - 2, -1, -1):
            spread[b] = max(spread[b], spread[b + 1] - 25.0)
        thr = np.maximum(10.0 ** ((spread - 18.0) / 10.0), ath_pow)
        rows.append(ep / thr)
    return np.asarray(rows), n_bands


def _ours(opts, pcm):
    s = MP3Encoder(opts, backend="numpy").new_session()
    return s.encode(pcm) + s.flush()


def _interior(pcm):
    trim = 2 * 1152
    return pcm[trim:-trim] if len(pcm) > 3 * trim else pcm


def heat(tag, cells):
    """Coarse dB heat map: rows = frames (downsampled x2), cols = bands."""
    F, B = cells.shape
    print(f"\n{tag}: per-(frame,band) noise/thr dB "
          f"(.'<0  1:0-10  2:10-20  3:20-30  4:30-40  #:>40)")
    glyphs = np.array(list(". 1234#"))
    for i in range(0, F, 2):
        db = 10 * np.log10(np.maximum(cells[i], 1e-12))
        lv = np.clip((db // 10).astype(int) + 1, 0, 5)
        lv = np.where(db < 0, 0, lv + 1)
        print(f"  f{i:03d} " + "".join(glyphs[np.minimum(lv, 6)]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kbps", type=int, nargs="+", default=[64, 128, 256])
    p.add_argument("--kind", default="burst")
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--maps", action="store_true", help="print heat maps")
    args = p.parse_args()
    if not (have_mpg123() and have_lame()):
        print("needs libmpg123 + libmp3lame")
        return 1

    pcm = synth(args.kind, args.frames * 1152, 14)
    src = _interior(pcm)

    for kbps in args.kbps:
        hq = MP3EncoderOptions.hq(mode=Mode.MONO, bitrate_kbps=kbps,
                                  sample_rate=SR)
        ours, _ = mpg123_decode(_ours(hq, pcm))
        lame, _ = mpg123_decode(lame_encode(pcm, SR, kbps, mode="mono"))
        c_h, nb = nmr_cells(src, ours[:, 0], SR)
        c_l, _ = nmr_cells(src, lame[:, 0], SR)
        # referee numbers (mean of per-frame mean linear ratio, in dB)
        nmr_h = 10 * np.log10(max(c_h.mean(), 1e-30))
        nmr_l = 10 * np.log10(max(c_l.mean(), 1e-30))
        print(f"\n==== {args.kind} @ {kbps} kbps: hq NMR {nmr_h:+.1f} dB, "
              f"lame {nmr_l:+.1f} dB, gap {nmr_h - nmr_l:+.1f} dB ====")
        # band marginal: each band's share of the total linear mass
        mh = c_h.mean(axis=0)
        ml = c_l.mean(axis=0)
        print(f"{'band':>4} {'hq dB':>7} {'lame dB':>7} {'hq share%':>9}")
        tot = c_h.mean() * nb
        for b in range(nb):
            sh = 100 * mh[b] / tot
            if sh < 1.0 and 10 * np.log10(max(mh[b], 1e-30)) < nmr_h - 10:
                continue
            print(f"{b:>4} {10*np.log10(max(mh[b],1e-30)):>7.1f} "
                  f"{10*np.log10(max(ml[b],1e-30)):>7.1f} {sh:>8.1f}%")
        # frame marginal: top frames by share
        fh = c_h.mean(axis=1)
        order = np.argsort(fh)[::-1][:6]
        print("top frames by hq NMR mass: "
              + ", ".join(f"f{i}({10*np.log10(max(fh[i],1e-30)):.0f}dB)"
                          for i in sorted(order)))
        if args.maps:
            heat("hq", c_h)
            heat("lame", c_l)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
