"""Probe: adaptive lowpass (options.adaptive_lowpass) vs static vs off.

The static options.lowpass_hz knob is a measured low-rate win on
speech/noise (64k mono through libmpg123: NMR 15.0->9.7 / 12.6->9.5, lame
parity) but removes real content on harmonic-rich wideband material. The
adaptive law (reference.ALP_FRAC / ALP_SFM: engage where the high band is
negligible OR noise-like, keep peaky harmonic bands) should match static
where static wins and match OFF where static hurts — making the knob safe
to engage on unknown low-rate content.

Reports, per (class, kbps): NMR (masked-noise-ratio, lower better) and
raw unit-gain SNR for hq / hq+static / hq+adaptive, via libmpg123 with
interior scoring; plus the adaptive law's per-class engage rate (fraction
of granule decisions that zeroed the band). `--sweep` grids ALP_FRAC x
ALP_SFM golden-side.

Run (CPU): python tools/probe_adaptive_lowpass.py [--kbps 64 96]
           [--cut-hz 10000] [--sweep]
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
from swiftmp3_tpu.utils.external import have_mpg123, mpg123_decode  # noqa: E402
from swiftmp3_tpu.utils.quality import masked_noise_ratio, measure_quality  # noqa: E402

from tune_psy import SR, synth  # noqa: E402


def synth_bright(n: int, seed: int) -> np.ndarray:
    """Harmonic-rich wideband content: a 311 Hz 1/k harmonic series out to
    Nyquist (sawtooth-like) with slow vibrato — real high-band content the
    lowpass must NOT remove. High-band stats: energy fraction well above
    ALP_FRAC, flatness well below ALP_SFM (1-in-~8 bins loud)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    f0 = 311.0 + 2.0 * np.sin(2 * np.pi * 0.7 * t)
    phase = np.cumsum(2 * np.pi * f0 / SR)
    x = np.zeros(n)
    for k in range(1, int((SR / 2) // 311)):
        x += (0.55 / k) * np.sin(k * phase + rng.uniform(0, 2 * np.pi))
    x *= 0.8 / np.abs(x).max()
    return np.clip(x, -0.99, 0.99).astype(np.float32)


def _ours(opts: MP3EncoderOptions, pcm: np.ndarray) -> bytes:
    s = MP3Encoder(opts, backend="numpy").new_session()
    return s.encode(pcm) + s.flush()


def _score(pcm: np.ndarray, blob: bytes) -> tuple[float, float]:
    ext, _ = mpg123_decode(blob)
    trim = 2 * 1152
    src = pcm[trim:-trim] if len(pcm) > 3 * trim else pcm
    raw = measure_quality(src, ext[:, 0], SR, compensate_gain=False).snr_db
    nmr = masked_noise_ratio(src, ext[:, 0], SR)
    return nmr, raw


def engage_rate(pcm: np.ndarray, cut_hz: int, kbps: int) -> float:
    """Golden-law engage rate: encode with adaptive on and count decisions
    by re-running the law on each granule's spectrum via a tap."""
    hits = [0, 0]
    orig = ref.adaptive_lowpass_engage

    def tap(spectrum, cut_sb):
        e = orig(spectrum, cut_sb)
        hits[0] += int(e)
        hits[1] += 1
        return e

    ref.adaptive_lowpass_engage = tap
    try:
        opts = MP3EncoderOptions.hq(
            mode=Mode.MONO, bitrate_kbps=kbps, sample_rate=SR,
            lowpass_hz=cut_hz, adaptive_lowpass=True,
        )
        _ours(opts, pcm)
    finally:
        ref.adaptive_lowpass_engage = orig
    return hits[0] / max(hits[1], 1)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--kbps", type=int, nargs="+", default=[64, 96])
    p.add_argument("--cut-hz", type=int, default=10000)
    p.add_argument("--sweep", action="store_true")
    args = p.parse_args()
    if not have_mpg123():
        print("needs system libmpg123")
        return 1
    n = args.frames * 1152

    kinds = ("speech", "music", "tonal", "noise", "burst")
    signals = {k: synth(k, n, 10 + i) for i, k in enumerate(kinds)}
    signals["bright"] = synth_bright(n, 77)

    if args.sweep:
        grid_f = [3e-4, 1e-3, 3e-3]
        grid_s = [0.10, 0.15, 0.22]
        for gf in grid_f:
            for gs in grid_s:
                ref.ALP_FRAC, ref.ALP_SFM = gf, gs
                nmrs = {}
                for kind, pcm in signals.items():
                    opts = MP3EncoderOptions.hq(
                        mode=Mode.MONO, bitrate_kbps=64, sample_rate=SR,
                        lowpass_hz=args.cut_hz, adaptive_lowpass=True,
                    )
                    nmrs[kind], _ = _score(pcm, _ours(opts, pcm))
                body = " ".join(f"{k}={v:.1f}" for k, v in nmrs.items())
                print(f"frac={gf:g} sfm={gs:g} | {body}")
        return 0

    print(f"{'class':>7} {'kbps':>5} | {'off NMR/SNR':>13} | "
          f"{'static NMR/SNR':>15} | {'adapt NMR/SNR':>15} | {'engage':>6}")
    for kbps in args.kbps:
        for kind, pcm in signals.items():
            base = dict(mode=Mode.MONO, bitrate_kbps=kbps, sample_rate=SR)
            # round 4: hq auto-engages adaptive lowpass at <=96 kbps;
            # the off arm must disable the rule explicitly
            off = MP3EncoderOptions.hq(lowpass_hz=None, **base)
            stat = MP3EncoderOptions.hq(lowpass_hz=args.cut_hz, **base)
            adap = MP3EncoderOptions.hq(
                lowpass_hz=args.cut_hz, adaptive_lowpass=True, **base
            )
            o_n, o_s = _score(pcm, _ours(off, pcm))
            s_n, s_s = _score(pcm, _ours(stat, pcm))
            a_n, a_s = _score(pcm, _ours(adap, pcm))
            rate = engage_rate(pcm, args.cut_hz, kbps)
            print(f"{kind:>7} {kbps:>5} | {o_n:>6.1f}/{o_s:>6.1f} | "
                  f"{s_n:>7.1f}/{s_s:>7.1f} | {a_n:>7.1f}/{a_s:>7.1f} | "
                  f"{rate:>5.0%}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
