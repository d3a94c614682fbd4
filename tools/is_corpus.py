"""Corpus-scale intensity-stereo quality table (VERDICT r4 weak #4).

The IS encode claims (+0.8..+1.8 dB downmix at 32/48k, 64k a wash) rested
on a 3-class sweep with one seed each. This tool measures the whole
distribution: stereo classes x seeds x bitrates, IS vs discrete stereo
(both hq joint-stereo presets, golden backend — device is byte-identical
on this corpus, test_intensity_encode pins it) and libmp3lame joint
stereo as the external anchor, all decoded by the system libmpg123.

Referees (per tools/quality_vs_lame.py interior-scoring discipline):
- DOWNMIX gain-compensated SNR: (L+R)/2 of the decode vs the source
  downmix. Per-channel SNR is the WRONG referee for IS (7 pan positions
  ~ 1 dB level steps quantize the image, not the content); downmix
  cancels the pan split exactly.
- STEREO-IMAGE error: RMS error (dB) of the broadband interchannel level
  difference 10*log10(EL/ER) per granule, source vs decode, over
  granules carrying energy in both source channels. This sees exactly
  what downmix SNR cannot: pan-position quantization and wrong-side
  leakage.

Run (CPU):  python tools/is_corpus.py [--frames 12] [--seeds 4]
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
from swiftmp3_tpu.utils.quality import measure_quality  # noqa: E402

SR = 44100


def _mono_src(kind: str, n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    if kind == "tonal":
        f0 = 330 + 40 * rng.random()
        x = (
            0.5 * np.sin(2 * np.pi * f0 * t)
            + 0.3 * np.sin(2 * np.pi * 7.1 * f0 * t)
            + 0.2 * np.sin(2 * np.pi * 19.3 * f0 * t)
            + 0.04 * rng.standard_normal(n)
        )
    elif kind == "speech":
        env = np.abs(rng.standard_normal(max(n // 512, 1))).repeat(512)[:n]
        f0 = 110 + 30 * rng.random()
        buzz = sum(
            np.sin(2 * np.pi * f0 * (k + 1) * t + rng.random() * 7) / (k + 1)
            for k in range(8)
        )
        x = 0.5 * env * buzz + 0.05 * rng.standard_normal(n)
    else:  # noise
        x = 0.35 * rng.standard_normal(n)
    return np.clip(x, -0.99, 0.99).astype(np.float32)


def make_class(kind: str, n: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Stereo (L, R) per class. IS-qualifying classes pan one source;
    decorr/antiphase exercise the no-region fallback path."""
    rng = np.random.default_rng(seed * 977 + 11)
    t = np.arange(n) / SR
    if kind.startswith("pan_"):
        src = _mono_src(kind[4:], n, seed)
        pan = 0.25 + 0.5 * np.sin(2 * np.pi * (0.2 + 0.2 * rng.random()) * t) ** 2
        return (src * pan).astype(np.float32), (src * (1 - pan)).astype(np.float32)
    if kind == "hard_pan":
        src = _mono_src("tonal", n, seed)
        return (src * 0.95).astype(np.float32), (src * 0.12).astype(np.float32)
    if kind == "decorr":
        return _mono_src("noise", n, seed), _mono_src("noise", n, seed + 1000)
    if kind == "antiphase":
        src = _mono_src("tonal", n, seed)
        return src, (-0.9 * src).astype(np.float32)
    raise ValueError(kind)


def _deinter(pcm: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return pcm[0::2], pcm[1::2]


def _ours(opts: MP3EncoderOptions, pcm: np.ndarray) -> bytes:
    s = MP3Encoder(opts, backend="numpy").new_session()
    return s.encode(pcm) + s.flush()


def ild_error_db(
    Ls: np.ndarray, Rs: np.ndarray, Ld: np.ndarray, Rd: np.ndarray, delay: int
) -> float:
    """RMS error of the per-granule broadband level difference (dB).

    Decoded channels are shifted by the downmix alignment delay; granules
    where either source channel is near-silent (ILD undefined) are
    skipped; the interior window drops 2 frames per end."""
    g = 576
    Ld, Rd = Ld[delay:], Rd[delay:]
    n = min(len(Ls), len(Ld))
    trim = 4 * 1152
    sl = slice(trim, max(n - trim, trim))
    Ls, Rs, Ld, Rd = Ls[sl], Rs[sl], Ld[: n][sl], Rd[: n][sl]
    m = len(Ls) // g
    if m == 0:
        return float("nan")
    def eg(x):
        return (x[: m * g].astype(np.float64) ** 2).reshape(m, g).sum(axis=1)
    el_s, er_s, el_d, er_d = eg(Ls), eg(Rs), eg(Ld), eg(Rd)
    floor = max(el_s.max(), er_s.max()) * 1e-6 + 1e-20
    keep = (el_s > floor) & (er_s > floor)
    if not keep.any():
        return float("nan")
    ild_s = 10 * np.log10((el_s[keep] + 1e-20) / (er_s[keep] + 1e-20))
    ild_d = 10 * np.log10((el_d[keep] + 1e-20) / (er_d[keep] + 1e-20))
    return float(np.sqrt(np.mean((ild_s - ild_d) ** 2)))


def score(pcm: np.ndarray, blob: bytes) -> tuple[float, float]:
    """(downmix gain-compensated SNR dB, stereo-image RMS error dB)."""
    dec, _ = mpg123_decode(blob)
    Ls, Rs = _deinter(pcm)
    Ld, Rd = dec[:, 0].astype(np.float32), dec[:, 1].astype(np.float32)
    dm_src = 0.5 * (Ls + Rs)
    dm_dec = 0.5 * (Ld + Rd)
    trim = 2 * 1152
    ref = dm_src[trim:-trim] if len(dm_src) > 3 * trim else dm_src
    rep = measure_quality(ref, dm_dec, SR)
    # rep.delay_samples aligns the decode to the TRIMMED ref (ref[0] =
    # src[trim]); the decode index of src[0] is therefore delay - trim.
    delay = rep.delay_samples - trim
    img = ild_error_db(Ls, Rs, Ld, Rd, max(delay, 0))
    return rep.snr_db, img


CLASSES = ["pan_tonal", "pan_speech", "pan_noise", "hard_pan", "decorr", "antiphase"]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--seeds", type=int, default=4)
    p.add_argument("--bitrates", type=int, nargs="+", default=[32, 48, 64])
    args = p.parse_args()
    if not (have_mpg123() and have_lame()):
        print("needs system libmpg123 + libmp3lame")
        return 1
    n = args.frames * 1152

    print(f"{args.seeds} seeds/class, {args.frames} frames, {SR} Hz")
    print(
        f"{'class':10s} {'kbps':>4s} | {'IS dmix':>8s} {'disc':>8s} {'lame':>8s} |"
        f" {'IS img':>7s} {'disc':>7s} {'lame':>7s} (seed medians; img max"
        f" shows rate-floor tail granules)"
    )
    rows = {}
    for kind in CLASSES:
        for kbps in args.bitrates:
            accs = {k: [] for k in ("is", "disc", "lame")}
            imgs = {k: [] for k in ("is", "disc", "lame")}
            for seed in range(args.seeds):
                L, R = make_class(kind, n, seed)
                pcm = np.empty(2 * n, np.float32)
                pcm[0::2], pcm[1::2] = L, R
                blob_is = _ours(
                    MP3EncoderOptions.hq(
                        mode=Mode.JOINT_STEREO, bitrate_kbps=kbps,
                        intensity_stereo=True,
                    ),
                    pcm,
                )
                blob_d = _ours(
                    MP3EncoderOptions.hq(
                        mode=Mode.JOINT_STEREO, bitrate_kbps=kbps
                    ),
                    pcm,
                )
                blob_l = lame_encode(
                    np.stack([L, R], axis=1), SR, bitrate_kbps=kbps, mode="joint"
                )
                for key, blob in (("is", blob_is), ("disc", blob_d), ("lame", blob_l)):
                    snr, img = score(pcm, blob)
                    accs[key].append(snr)
                    imgs[key].append(img)
            m = {k: float(np.mean(v)) for k, v in accs.items()}
            mi = {k: float(np.nanmedian(v)) for k, v in imgs.items()}
            mx = {k: float(np.nanmax(v)) for k, v in imgs.items()}
            rows[(kind, kbps)] = (m, mi)
            print(
                f"{kind:10s} {kbps:4d} | {m['is']:8.2f} {m['disc']:8.2f}"
                f" {m['lame']:8.2f} | {mi['is']:7.2f} {mi['disc']:7.2f}"
                f" {mi['lame']:7.2f} | max {mx['is']:6.1f} {mx['disc']:6.1f}"
            )
    print("\nIS minus discrete (downmix dB / image dB, + = IS better on both"
          " when downmix positive and image negative):")
    for (kind, kbps), (m, mi) in rows.items():
        print(f"  {kind:10s} {kbps:3d}k: {m['is']-m['disc']:+6.2f} dmix,"
              f" {mi['is']-mi['disc']:+6.2f} img")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
