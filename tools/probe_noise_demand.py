"""Probe: noise-targeted demand (options.noise_demand) vs the K_DEMAND
complexity probe, through libmpg123 NMR.

NO LONGER RUNS AT HEAD — noise_demand measured NEGATIVE (round 4) and its
wiring was removed; checkout commit 266ac23 to re-run. This file stays as
the protocol + numbers record (full table in ARCHITECTURE.md
"Noise-priced demand"). Verdict (6 classes x 64/96/128k x margins
{-6, 0, +6} dB, 16x1152 mono, interior-scored through libmpg123):
a WASH everywhere (within +-0.3 dB of hq on every class/rate cell) and
consistently WORSE on the targeted class — nburst at 128k: hq 12.9 vs
nd 14.3 / 13.2 / 14.5 NMR at margins -6 / 0 / +6. Read: after the
onset/drop chain landed, the burst NMR mass sits in granules the
sequencer already handles; the rest is per-band placement INSIDE a
granule, untouchable by a granule-level budget split.

The round-3 attribution closed every scalefactor-side shaping lever
(bolted loops measured negative twice) and named the one untried
formulation: price noise targets INSIDE candidate selection. noise_demand
does it at the budget-split level — a granule's demand becomes the priced
bits of the COARSEST walk candidate whose per-band reconstruction error
sits under a masking target spread from its own spectrum
(ops.reference.noise_targets / noise_demand_bits), so the existing
donation law moves bits toward audibly-starved granules.

Reports per (class, kbps): NMR (lower better) and raw SNR for
hq / hq+noise_demand (and lame when available), mpg123-decoded,
interior-scored. --margins sweeps reference.NOISE_MARGIN_DB.

Run (CPU): python tools/probe_noise_demand.py [--kbps 64 96 128]
           [--frames 16] [--margins -6 0 6] [--lame]
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


def synth_nburst(n: int, seed: int) -> np.ndarray:
    """Noise bursts over a tone bed — the onset-detector's content class
    (the cell where lame's distortion-control loop is furthest ahead)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    x = 0.3 * np.sin(2 * np.pi * 523.25 * t)
    for p in range(900, n - 600, 3000):
        x[p : p + 300] += 0.45 * rng.standard_normal(300)
    return np.clip(x, -0.99, 0.99).astype(np.float32)


def _ours(opts: MP3EncoderOptions, pcm: np.ndarray) -> bytes:
    s = MP3Encoder(opts, backend="numpy").new_session()
    return s.encode(pcm) + s.flush()


def _score(pcm: np.ndarray, blob: bytes) -> tuple[float, float]:
    ext, _ = mpg123_decode(blob)
    trim = 2 * 1152
    src = pcm[trim:-trim] if len(pcm) > 3 * trim else pcm
    nmr = masked_noise_ratio(src, ext[:, 0], SR)
    raw = measure_quality(src, ext[:, 0], SR, compensate_gain=False).snr_db
    return nmr, raw


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--kbps", type=int, nargs="+", default=[64, 96, 128])
    p.add_argument("--margins", type=float, nargs="+", default=[0.0])
    p.add_argument("--lame", action="store_true")
    args = p.parse_args()
    if not have_mpg123():
        print("needs system libmpg123")
        return 1
    n = args.frames * 1152

    kinds = ("speech", "music", "tonal", "noise", "burst")
    signals = {k: synth(k, n, 10 + i) for i, k in enumerate(kinds)}
    signals["nburst"] = synth_nburst(n, 42)

    use_lame = args.lame and have_lame()
    head = f"{'class':>7} {'kbps':>5} {'margin':>6} | {'hq NMR/SNR':>13} | {'nd NMR/SNR':>13}"
    if use_lame:
        head += f" | {'lame NMR/SNR':>13}"
    print(head)
    for kbps in args.kbps:
        for kind, pcm in signals.items():
            base = dict(mode=Mode.MONO, bitrate_kbps=kbps, sample_rate=SR)
            h_n, h_s = _score(pcm, _ours(MP3EncoderOptions.hq(**base), pcm))
            lame_cell = ""
            if use_lame:
                l_n, l_s = _score(
                    pcm, lame_encode(pcm, sample_rate=SR, bitrate_kbps=kbps, mode="mono")
                )
                lame_cell = f" | {l_n:>6.1f}/{l_s:>6.1f}"
            for m in args.margins:
                ref.NOISE_MARGIN_DB = m
                nd = MP3EncoderOptions.hq(noise_demand=True, **base)
                d_n, d_s = _score(pcm, _ours(nd, pcm))
                print(
                    f"{kind:>7} {kbps:>5} {m:>6.1f} | {h_n:>6.1f}/{h_s:>6.1f} | "
                    f"{d_n:>6.1f}/{d_s:>6.1f}{lame_cell}"
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
