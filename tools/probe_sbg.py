"""Probe: subblock_gain temporal flattening (options.subblock_gain_shaping).

The burst-NMR diagnostic (tools/diag_burst_nmr.py) localized the hq-vs-lame
gap to short-granule attack frames at EVERY bitrate — a placement-law
problem: the global gain walk gives all three short windows one step, so the
loud window's step sets the quiet windows' noise floor (pre-echo). The ISO
subblock_gain field is the designed fix (12 dB/unit per-window attenuation,
side-info bits always transmitted), unused by the reference's own decode
convention and zeroed by every strict path until now.

This probe A/Bs hq vs hq+subblock_gain_shaping (and a SBG_DIV sweep) on the
synthetic corpus through libmpg123, reporting the NMR referee (lower =
better) and raw unit-gain SNR.

Run (CPU): python tools/probe_sbg.py [--kbps 64 128 256] [--div-sweep]

MEASURED NEGATIVE — historical record. With the sequencing hangover in
place the post-echo mass this targeted is gone: NMR +-0.1 dB everywhere,
SNR +0.6/+1.1 dB on burst at 64/128k, -0.3 at 256k. The
`subblock_gain_shaping` option and `ref.SBG_DIV` wiring were REMOVED
after measurement (this script no longer runs against current HEAD);
it is kept as the probe protocol + numbers record.
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
from swiftmp3_tpu.ops import reference as ref  # noqa: E402
from swiftmp3_tpu.utils.external import (  # noqa: E402
    have_lame,
    have_mpg123,
    lame_encode,
    mpg123_decode,
)
from swiftmp3_tpu.utils.quality import masked_noise_ratio, measure_quality  # noqa: E402

from tune_psy import SR, synth  # noqa: E402

KINDS = ("burst", "tonal", "speech", "noise", "music")


def _ours(opts, pcm):
    s = MP3Encoder(opts, backend="numpy").new_session()
    return s.encode(pcm) + s.flush()


def _interior(pcm):
    trim = 2 * 1152
    return pcm[trim:-trim] if len(pcm) > 3 * trim else pcm


def score(pcm, mp3):
    dec, _ = mpg123_decode(mp3)
    src = _interior(pcm)
    nmr = masked_noise_ratio(src, dec[:, 0], SR)
    snr = measure_quality(src, dec[:, 0], SR, compensate_gain=False).snr_db
    return nmr, snr


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kbps", type=int, nargs="+", default=[64, 128, 256])
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--kinds", nargs="+", default=list(KINDS))
    p.add_argument("--div-sweep", action="store_true",
                   help="sweep SBG_DIV in {2,3,4} on burst")
    args = p.parse_args()
    if not (have_mpg123() and have_lame()):
        print("needs libmpg123 + libmp3lame")
        return 1

    signals = {k: synth(k, args.frames * 1152, 14) for k in args.kinds}

    for kbps in args.kbps:
        print(f"\n==== {kbps} kbps mono (NMR dB lower=better / raw SNR dB) ====")
        print(f"{'kind':>7} {'hq':>13} {'hq+sbg':>13} {'lame':>13}")
        for kind, pcm in signals.items():
            base = MP3EncoderOptions.hq(
                mode=Mode.MONO, bitrate_kbps=kbps, sample_rate=SR)
            sbg = MP3EncoderOptions.hq(
                mode=Mode.MONO, bitrate_kbps=kbps, sample_rate=SR,
                subblock_gain_shaping=True)
            n0, s0 = score(pcm, _ours(base, pcm))
            n1, s1 = score(pcm, _ours(sbg, pcm))
            nl, sl = score(pcm, lame_encode(pcm, SR, kbps, mode="mono"))
            print(f"{kind:>7} {n0:>6.1f}/{s0:>6.1f} {n1:>6.1f}/{s1:>6.1f} "
                  f"{nl:>6.1f}/{sl:>6.1f}")

    if args.div_sweep:
        pcm = signals.get("burst", synth("burst", args.frames * 1152, 14))
        print("\n==== SBG_DIV sweep on burst (NMR/SNR) ====")
        for kbps in args.kbps:
            row = []
            for div in (2, 3, 4):
                ref.SBG_DIV = div
                opts = MP3EncoderOptions.hq(
                    mode=Mode.MONO, bitrate_kbps=kbps, sample_rate=SR,
                    subblock_gain_shaping=True)
                n, s = score(pcm, _ours(opts, pcm))
                row.append(f"div{div} {n:+.1f}/{s:.1f}")
            ref.SBG_DIV = 2
            print(f"  {kbps:>3}k: " + "  ".join(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
