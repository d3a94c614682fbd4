"""Probe: how much does a distortion-control (noise-shaping) outer loop
buy under the real strict/linbits rate walk?

Round-3 attribution (ARCHITECTURE.md "Burst-NMR attribution") found the
one measurable quality gap vs libmp3lame is per-band noise placement: the
single-pass peak-exponent scalefactor law + global gain walk shapes
nothing per band, while lame iterates scalefactors until every band's
noise sits under its threshold. This tool quantifies the headroom WITHOUT
building the product feature:

Stage 1 (granule-level loop, exact walk in the loop): for each granule
spectrum, run the real `quantize_to_fit_budget_strict` at a fixed bit
budget, reconstruct per the ISO decode law, measure per-band noise
against the psy spread mask, amplify the worst violating bands'
scalefactors by one step, re-walk; N iterations. Reports spectral-domain
noise-over-mask before/after at the same bit budget.

Stage 2 (end-to-end confirmation): re-encode the full stream with the
converged per-granule scalefactors (granule_scalefactors hooked in call
order), decode through libmpg123, and report the masked-noise-ratio
referee before/after — the number that decides whether the product
feature is worth building.

Run (CPU):  python tools/probe_noise_shaping.py [--kbps 64] [--iters 3]
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
from swiftmp3_tpu.tables import band_table  # noqa: E402
from swiftmp3_tpu.utils.external import have_mpg123, mpg123_decode  # noqa: E402
from swiftmp3_tpu.utils.quality import masked_noise_ratio  # noqa: E402

from tune_psy import SR, synth  # noqa: E402

MASK_OFFSET_EXP = 6  # exponent units (~18 dB) below the spread mask


def _bounds():
    return np.concatenate([[0], np.cumsum(band_table(SR))]).astype(int)


def _spread_mask_exp(spectrum: np.ndarray) -> np.ndarray:
    """Per-band threshold exponents: psy max-plus spread of band peak
    float32 exponents (the ops/reference psy law's mask), minus an offset."""
    bounds = _bounds()
    absx = np.abs(spectrum.astype(np.float32))
    EMPTY = -(1 << 14)
    pe = np.full(21, EMPTY, dtype=np.int64)
    for b in range(21):
        if bounds[b] < bounds[b + 1]:
            pb = float(absx[bounds[b] : bounds[b + 1]].max())
            if pb > 0:
                pe[b] = int(np.frexp(pb)[1])
    M = pe.copy()
    for b in range(1, 21):
        M[b] = max(M[b], M[b - 1] - ref.PSY_SLOPE)
    for b in range(19, -1, -1):
        M[b] = max(M[b], M[b + 1] - ref.PSY_SLOPE)
    return M - MASK_OFFSET_EXP


def _walk_and_noise(spectrum, sf, budget_bits):
    """(per-band noise/mask power ratios, total err energy, bits) for the
    strict/linbits walk at the given scalefactors."""
    bounds = _bounds()
    sfd = ref._long_sfd(np.asarray(sf, dtype=np.int64), bounds)
    gain0 = ref.compute_global_gain_scaled(
        spectrum, sfd["mag_scale"], target=ref.LINBITS_Q_TARGET
    )
    gain, q, bits = ref.quantize_to_fit_budget_strict(
        spectrum, sfd["mag_scale"], gain0, budget_bits, SR, ref.BLOCK_LONG,
        True, True, part2=int(sfd["part2_bits"]), perm=None, iso=True,
        linbits=True,
    )
    # ISO decode law (scalefac_scale=1): xr = sign q^{4/3} 2^{(gain-210)/4} 2^{-sf_b}
    step = 2.0 ** ((gain - 210) / 4.0)
    mag = np.abs(q.astype(np.float64)) ** (4.0 / 3.0) * step
    xr = np.where(q < 0, -mag, mag)
    sf_full = np.zeros(576)
    for b in range(21):
        sf_full[bounds[b] : bounds[b + 1]] = sf[b]
    xr = xr * (2.0 ** -sf_full)
    err = xr - spectrum.astype(np.float64)
    thr_exp = _spread_mask_exp(spectrum)
    ratios = np.zeros(21)
    for b in range(21):
        lo, hi = int(bounds[b]), int(bounds[b + 1])
        if hi <= lo:
            continue
        en = float(np.sum(err[lo:hi] ** 2))
        thr = (2.0 ** float(thr_exp[b])) ** 2 * (hi - lo)
        ratios[b] = en / max(thr, 1e-300)
    return ratios, float(np.sum(err**2)), bits


def shape_granule_oneshot(
    spectrum, budget_bits, max_bump: int = 2, thresh: float = 1.0
):
    """Vectorizable one-shot law: run the walk at the baseline sfs, measure
    per-band noise/mask from the SELECTED quantization (free: q is known),
    bump every band with ratio > thresh by min(max_bump, ceil(log4 ratio))
    steps in a single pass, re-walk once. Two walk passes total — the
    device-feasible formulation (the hill-climb's sequential accept/reject
    is not)."""
    sf = ref.strict_scalefactors(spectrum, SR, ref.BLOCK_LONG)["sf"].copy()
    base_ratios, base_err, _ = _walk_and_noise(spectrum, sf, budget_bits)
    cur = sf.astype(np.int64).copy()
    for b in range(21):
        if base_ratios[b] > thresh:
            bump = min(max_bump, int(np.ceil(np.log(base_ratios[b]) / np.log(4.0))))
            cap = 15 if b < 11 else 7
            cur[b] = min(cur[b] + max(bump, 1), cap)
    shaped_ratios, shaped_err, _ = _walk_and_noise(spectrum, cur, budget_bits)
    return base_ratios, base_err, cur, shaped_ratios, shaped_err


def shape_granule(spectrum, budget_bits, iters, greedy: bool = True):
    """(baseline ratios, err, shaped sf, shaped ratios, err).

    greedy=True: amplify the worst violators unconditionally (the naive
    loop). greedy=False: hill-climb WITH REJECTION — try one-band bumps on
    the worst violators, keep a bump only if the measured mean noise/mask
    at the same budget improves, else revert and blacklist the band. If
    even this loses, the negative result is economic (amplification's
    global-gain cost exceeds its band gain), not an artifact of greed."""
    sf = ref.strict_scalefactors(spectrum, SR, ref.BLOCK_LONG)["sf"].copy()
    base_ratios, base_err, _ = _walk_and_noise(spectrum, sf, budget_bits)
    cur = sf.astype(np.int64).copy()
    if greedy:
        for _ in range(iters):
            ratios, _, _ = _walk_and_noise(spectrum, cur, budget_bits)
            viol = np.where(ratios > 1.0)[0]
            if viol.size == 0:
                break
            worst = viol[np.argsort(ratios[viol])[::-1][:4]]
            bumped = False
            for b in worst:
                cap = 15 if b < 11 else 7
                if cur[b] < cap:
                    cur[b] += 1
                    bumped = True
            if not bumped:
                break
    else:
        ratios, _, _ = _walk_and_noise(spectrum, cur, budget_bits)
        score = float(np.mean(ratios))
        dead = set()
        for _ in range(iters * 4):
            viol = [
                b for b in np.argsort(ratios)[::-1]
                if ratios[b] > 1.0 and b not in dead
                and cur[b] < (15 if b < 11 else 7)
            ]
            if not viol:
                break
            b = int(viol[0])
            cur[b] += 1
            new_ratios, _, _ = _walk_and_noise(spectrum, cur, budget_bits)
            new_score = float(np.mean(new_ratios))
            if new_score < score:
                ratios, score = new_ratios, new_score
            else:
                cur[b] -= 1
                dead.add(b)
    shaped_ratios, shaped_err, _ = _walk_and_noise(spectrum, cur, budget_bits)
    return base_ratios, base_err, cur, shaped_ratios, shaped_err


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--kbps", type=int, default=64)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--hillclimb", action="store_true",
                   help="accept/reject one-band bumps by measured mean "
                   "noise/mask instead of the naive greedy loop")
    p.add_argument("--oneshot", action="store_true",
                   help="vectorizable law: one measured pass, bump every "
                   "violating band once (<= --max-bump), one re-walk")
    p.add_argument("--max-bump", type=int, default=2)
    p.add_argument("--thresh", type=float, default=1.0,
                   help="oneshot: bump only bands with noise/mask > thresh")
    args = p.parse_args()

    frame_bytes = (144 * args.kbps * 1000) // SR
    budget = (frame_bytes - 4 - 17) * 8 // 2  # per mono granule, no reservoir

    print(f"budget {budget} bits/granule at {args.kbps} kbps mono")
    for kind in ("burst", "tonal", "speech"):
        pcm = synth(kind, args.frames * 1152, 14)
        # granule spectra via the golden DSP chain
        fb = np.zeros(512, dtype=np.float32)
        ov = np.zeros((32, 18), dtype=np.float32)
        nmr_b, nmr_s, viol_b, viol_s = [], [], 0, 0
        shaped_sfs = []
        for g in range(args.frames * 2):
            gs = pcm[g * 576 : (g + 1) * 576]
            S, fb = ref.analyze_subbands(gs, fb)
            spec, ov = ref.mdct_apply(S, ov, ref.BLOCK_LONG)
            if float(np.abs(spec).max()) <= 0:
                shaped_sfs.append(np.zeros(21, dtype=np.int64))
                continue
            if args.oneshot:
                br, be, sf, sr_, se = shape_granule_oneshot(
                    spec, budget, max_bump=args.max_bump, thresh=args.thresh
                )
            else:
                br, be, sf, sr_, se = shape_granule(
                    spec, budget, args.iters, greedy=not args.hillclimb
                )
            shaped_sfs.append(sf)
            nmr_b.append(10 * np.log10(max(float(np.mean(br)), 1e-30)))
            nmr_s.append(10 * np.log10(max(float(np.mean(sr_)), 1e-30)))
            viol_b += int(np.sum(br > 1))
            viol_s += int(np.sum(sr_ > 1))
        print(
            f"{kind:7s} granule-level noise/mask: {np.mean(nmr_b):6.1f} -> "
            f"{np.mean(nmr_s):6.1f} dB; violating bands {viol_b} -> {viol_s}"
        )

        # ---- Stage 2: end-to-end confirmation through libmpg123
        if not have_mpg123():
            continue
        opts = MP3EncoderOptions.hq(
            mode=Mode.MONO, bitrate_kbps=args.kbps, window_sequencing=False
        )

        def encode(hook_sfs=None):
            calls = {"k": 0}
            orig = ref.granule_scalefactors

            def hooked(spectrum, sample_rate, block_type, psy=False,
                       iso_short=False, **kw):
                out = orig(spectrum, sample_rate, block_type, psy=psy,
                           iso_short=iso_short, **kw)
                k = calls["k"]
                calls["k"] += 1
                if (
                    hook_sfs is not None
                    and block_type == ref.BLOCK_LONG
                    and k < len(hook_sfs)
                ):
                    return ref._long_sfd(hook_sfs[k], _bounds())
                return out

            ref.granule_scalefactors = hooked
            try:
                s = MP3Encoder(opts, backend="numpy").new_session()
                return s.encode(pcm) + s.flush()
            finally:
                ref.granule_scalefactors = orig

        trim = 2 * 1152
        refpcm = pcm[trim:-trim]
        base_blob = encode(None)
        shaped_blob = encode(shaped_sfs)
        eb, _ = mpg123_decode(base_blob)
        es, _ = mpg123_decode(shaped_blob)
        print(
            f"{kind:7s} end-to-end mpg123 NMR: "
            f"{masked_noise_ratio(refpcm, eb[:, 0], SR):6.1f} -> "
            f"{masked_noise_ratio(refpcm, es[:, 0], SR):6.1f} dB "
            f"(lower is better)"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
