"""Sweep the psy_scalefactors law constants over a synthetic corpus.

VERDICT r2 weak-point 4: the psy law's constants (PSY_SLOPE spreading skirt,
PSY_ALPHA gap share — ops/reference.py) were tuned on two synthetic signals.
This tool sweeps them over a broader corpus of signal classes and prints a
tuning table; the objective is the mean raw (unit-gain) decoder-oracle SNR
per class under the full spec_strict preset with psy_scalefactors on,
decoded with iso_conventions (what a conforming decoder plays).

Run (CPU, numpy backend; constants are monkeypatched per grid point):
    python tools/tune_psy.py [--frames 16] [--classes all]

The golden backend is used so the sweep needs no re-jit per grid point.
Freezing a new constant pair means editing BOTH ops/reference.py and
ops/dsp.py (twin-pinned by tests/test_spec_strict.py::test_psy_constants_twin)
and refreshing the regression floors in test_spec_strict.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from swiftmp3_tpu import MP3Encoder, MP3EncoderOptions, Mode  # noqa: E402
from swiftmp3_tpu.decoder import decode_mp3  # noqa: E402
from swiftmp3_tpu.ops import reference as ref  # noqa: E402
from swiftmp3_tpu.utils.quality import measure_quality  # noqa: E402

SR = 44100


def synth(kind: str, n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    if kind == "speech":
        f0 = rng.uniform(90, 220)
        voiced = np.sin(2 * np.pi * f0 * t) + 0.4 * np.sin(2 * np.pi * 2 * f0 * t)
        env = np.clip(np.sin(2 * np.pi * rng.uniform(1.5, 4.0) * t), 0, 1)
        x = 0.4 * voiced * env + rng.standard_normal(n) * 0.02
    elif kind == "music":
        # chord + vibrato lead + soft percussion clicks
        chord = sum(
            0.12 * np.sin(2 * np.pi * f * t) for f in (220.0, 277.18, 329.63)
        )
        lead = 0.2 * np.sin(2 * np.pi * (660 + 6 * np.sin(2 * np.pi * 5 * t)) * t)
        x = chord + lead
        for p in range(0, n - 400, SR // 2):
            x[p : p + 120] += rng.standard_normal(120) * 0.25
    elif kind == "tonal":
        x = sum(
            a * np.sin(2 * np.pi * f * t)
            for a, f in [(0.3, 440.0), (0.15, 1320.0), (0.08, 3520.0)]
        )
    elif kind == "noise":
        x = rng.standard_normal(n)
        for i in range(1, 6):
            x[i:] += x[:-i] / (i + 1)
        x = 0.4 * x / np.abs(x).max()
    elif kind == "burst":
        x = 0.35 * np.sin(2 * np.pi * 523.25 * t)
        env = np.zeros(n)
        for p in range(700, n - 1200, 2500):
            env[p : p + 500] = 1.0
        x = x * (0.2 + 0.8 * env)
    elif kind == "nburst":
        # noise bursts over a tone bed — the onset-detector content class
        # (lame's distortion-control loop is furthest ahead here)
        x = 0.3 * np.sin(2 * np.pi * 523.25 * t)
        for p in range(900, n - 600, 3000):
            x[p : p + 300] += 0.45 * rng.standard_normal(300)
    else:
        raise ValueError(kind)
    return np.clip(x, -0.99, 0.99).astype(np.float32)


def corpus_nmr(opts: MP3EncoderOptions, signals) -> dict:
    """Corpus masked-noise-ratio through the EXTERNAL decoder (libmpg123):
    the perceptual referee. Lower is better."""
    from swiftmp3_tpu.utils.external import mpg123_decode
    from swiftmp3_tpu.utils.quality import masked_noise_ratio

    out = {}
    for kind, pcm in signals.items():
        s = MP3Encoder(opts, backend="numpy").new_session()
        data = s.encode(pcm) + s.flush()
        ext, _ = mpg123_decode(data)
        trim = 2 * 1152
        ref = pcm[trim:-trim] if len(pcm) > 3 * trim else pcm
        out[kind] = masked_noise_ratio(ref, ext[:, 0], SR)
    return out


def corpus_snr(opts: MP3EncoderOptions, signals) -> dict:
    out = {}
    for kind, pcm in signals.items():
        s = MP3Encoder(opts, backend="numpy").new_session()
        data = s.encode(pcm) + s.flush()
        dec = decode_mp3(data, iso_conventions=True)
        q = measure_quality(pcm, dec.pcm[:, 0], SR, compensate_gain=False)
        out[kind] = q.snr_db
    return out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--bitrate", type=int, default=96)
    p.add_argument("--hq", action="store_true",
                   help="sweep under the hq preset (linbits) instead of "
                   "spec_strict — the regime where the t15-tuned constants "
                   "measured -0.1..-2.9 dB")
    p.add_argument("--nmr", action="store_true",
                   help="objective = masked-noise-ratio through libmpg123 "
                   "(LOWER is better) instead of oracle SNR — the "
                   "masking-aware referee SNR cannot stand in for")
    args = p.parse_args()
    n = args.frames * 1152

    kinds = ("speech", "music", "tonal", "noise", "burst")
    signals = {k: synth(k, n, 10 + i) for i, k in enumerate(kinds)}

    mk = MP3EncoderOptions.hq if args.hq else MP3EncoderOptions.spec_strict
    base = mk(mode=Mode.MONO, bitrate_kbps=args.bitrate)
    if args.nmr:
        global corpus_snr
        corpus_snr = corpus_nmr  # same shape, NMR objective (lower=better)
    peak_share = corpus_snr(base, signals)  # psy off: the peak-share law
    print(f"bitrate {args.bitrate}k, {args.frames} frames/class")
    print("peak-share baseline:", {k: round(v, 2) for k, v in peak_share.items()})

    psy_opts = base.replace(psy_scalefactors=True)
    rows = []
    for slope in (2, 3, 4, 6, 8):
        for a_num, a_den in ((1, 3), (1, 2), (2, 3), (1, 1)):
            ref.PSY_SLOPE = slope
            ref.PSY_ALPHA_NUM, ref.PSY_ALPHA_DEN = a_num, a_den
            snrs = corpus_snr(psy_opts, signals)
            sign = -1.0 if args.nmr else 1.0  # NMR: lower is better
            mean = sign * float(np.mean(list(snrs.values())))
            worst_delta = min(sign * (snrs[k] - peak_share[k]) for k in kinds)
            rows.append((slope, (a_num, a_den), mean, worst_delta, snrs))
            print(
                f"slope={slope} alpha={a_num}/{a_den}: mean {mean:6.2f} "
                f"worst-vs-baseline {worst_delta:+5.2f}  "
                + " ".join(f"{k}={snrs[k]:5.2f}" for k in kinds)
            )
    best = max(rows, key=lambda r: (r[2]))  # mean is sign-adjusted above
    print(
        f"\nbest mean: slope={best[0]} alpha={best[1][0]}/{best[1][1]} "
        f"(mean {best[2]:.2f} dB, worst class delta {best[3]:+.2f} dB)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
