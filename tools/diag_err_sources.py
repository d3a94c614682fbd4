"""Exact NMR attribution by error SOURCE (granule block type x band region).

tools/diag_burst_nmr.py located the hq-vs-lame burst NMR gap in analysis
bands 11-21 of attack frames at every bitrate, but MDCT-domain per-band SNR
measured encoder-side kept contradicting the analysis-frame picture (local
band SNR scales with bitrate; analysis-band NMR doesn't). The missing link
is the SYNTHESIS: a granule's MDCT error lands in the waveform through the
window's time support and spectral selectivity, so analysis-frame noise is
not in one-to-one correspondence with MDCT cells.

This tool closes the loop exactly. The decoded waveform satisfies
  decoded = synth(spec_chain) - synth(err_chain),  err = spec - requantized
because the decoder pipeline after requantization (alias-undo, IMDCT,
overlap-add, polyphase synthesis) is LINEAR for fixed window types, and
synth(spec_chain) reproduces the input to ~-87 dB (the sequencing round
trip). So the NMR contribution of ANY error subset S can be measured by
synthesizing err masked to S through the decoder's own IMDCT/filterbank and
scoring src vs (src - synth(err_S)).

Masks reported: by block type (LONG / START / SHORT / STOP), and within
SHORT granules by band region (sfb 0-5 / 6-11 / no-sf top). Sanity row
"ALL" must reproduce the real measured NMR.

Run (CPU): python tools/diag_err_sources.py [--kbps 128 256]
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
from swiftmp3_tpu.tables import short_band_bounds  # noqa: E402
from swiftmp3_tpu.decoder import decoder as D  # noqa: E402
from swiftmp3_tpu.utils.external import have_mpg123, mpg123_decode  # noqa: E402
from swiftmp3_tpu.utils.quality import masked_noise_ratio  # noqa: E402

from tune_psy import SR, synth  # noqa: E402

BL = {0: "LONG", 1: "MIX", 2: "SHORT", 3: "START", 4: "STOP"}


def capture(kbps: int, kind: str, frames: int):
    """Encode and capture (spec, err, block) per granule, in time order."""
    caps = []
    orig = ref.quantize_to_fit_budget_strict

    def spy(spectrum, mag_scale, gain0, budget, sr, block, *a, **k):
        gain, q, bits = orig(
            spectrum, mag_scale, gain0, budget, sr, block, *a, **k)
        spec = np.asarray(spectrum, dtype=np.float64)
        step = 2.0 ** ((gain - 210) / 4.0)
        xr = (np.abs(q).astype(np.float64) ** (4.0 / 3.0)) * step
        if mag_scale is not None:
            xr = xr / (np.asarray(mag_scale, dtype=np.float64) ** (4.0 / 3.0))
        caps.append(dict(err=spec - np.sign(q) * xr, block=int(block)))
        return gain, q, bits

    ref.quantize_to_fit_budget_strict = spy
    try:
        pcm = synth(kind, frames * 1152, 14)
        o = MP3EncoderOptions.hq(
            mode=Mode.MONO, bitrate_kbps=kbps, sample_rate=SR)
        s = MP3Encoder(o, backend="numpy").new_session()
        mp3 = s.encode(pcm) + s.flush()
    finally:
        ref.quantize_to_fit_budget_strict = orig
    return pcm, mp3, caps


def synth_chain(caps, mask_fn) -> np.ndarray:
    """Run masked per-granule errors through the decoder's synthesis."""
    overlap = np.zeros((32, 18), dtype=np.float64)
    fb = D.SynthesisFilterbank()
    out = np.zeros(len(caps) * 576)
    for i, c in enumerate(caps):
        block = c["block"]
        e = c["err"] * mask_fn(c)
        if block in (0, 3, 4):  # long layout: full 31-boundary alias-undo
            e = D._alias_reduce_decode(e)
        elif block == 1:
            e = D._alias_reduce_decode(e, 1)
        g = D.GranuleSide(
            window_switching=0 if block == 0 else 1,
            block_type={0: 0, 1: 2, 2: 2, 3: 1, 4: 3}[block],
            mixed_block_flag=1 if block == 1 else 0,
        )
        sub = D._imdct_granule(e, g, overlap)
        for t in range(18):
            out[i * 576 + t * 32 : i * 576 + (t + 1) * 32] = fb.run(sub[:, t])
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kbps", type=int, nargs="+", default=[128, 256])
    p.add_argument("--kind", default="burst")
    p.add_argument("--frames", type=int, default=16)
    args = p.parse_args()

    sb = short_band_bounds(SR)
    line_of = (np.arange(576) // 18) * 6 + (np.arange(576) % 18) // 3
    low = line_of < sb[6]
    mid = (line_of >= sb[6]) & (line_of < sb[12])
    top = line_of >= sb[12]

    def by_block(*want):
        return lambda c: 1.0 if c["block"] in want else 0.0

    def short_region(region):
        return lambda c: region.astype(float) if c["block"] == 2 else 0.0

    masks = [
        ("ALL", lambda c: 1.0),
        ("LONG only", by_block(0)),
        ("START only", by_block(3)),
        ("STOP only", by_block(4)),
        ("SHORT only", by_block(2)),
        ("SHORT sfb0-5", short_region(low)),
        ("SHORT sfb6-11", short_region(mid)),
        ("SHORT top(no-sf)", short_region(top)),
    ]

    from swiftmp3_tpu.utils import quality as Q

    for kbps in args.kbps:
        pcm, mp3, caps = capture(kbps, args.kind, args.frames)
        trim = 2 * 1152
        src = pcm[trim:-trim].astype(np.float64)
        print(f"\n==== {args.kind} @ {kbps} kbps — NMR dB by error source ====")
        dec, _ = mpg123_decode(mp3)
        real = masked_noise_ratio(src, dec[:, 0], SR)
        print(f"  measured (mpg123 decode):       {real:+6.1f}")
        # Real error waveform on the pcm timeline (align decode to pcm).
        p64 = pcm.astype(np.float64)
        d0 = Q._align(p64, dec[:, 0].astype(np.float64), unit_gain=True)
        n_r = min(len(p64), len(dec) - d0)
        err_real = p64[:n_r] - dec[d0 : d0 + n_r, 0].astype(np.float64)
        # Find the synthetic chain's shift against the real error: the
        # chain carries the encoder analysis + decoder synthesis delays
        # plus window_sequencing's preroll; cross-correlate instead of
        # deriving the constant.
        e_all = synth_chain(caps, masks[0][1])
        best_s, best_c = 0, -1.0
        for s in range(0, 2400):
            seg = e_all[s : s + n_r]
            if len(seg) < n_r:
                break
            c = float(seg @ err_real)
            if c > best_c:
                best_c, best_s = c, s
        seg = e_all[best_s : best_s + n_r]
        resid = err_real - seg
        match_db = 10 * np.log10(
            max(float(resid @ resid), 1e-30) / max(float(err_real @ err_real), 1e-30)
        )
        print(f"  [chain shift {best_s}, residual vs real error: "
              f"{match_db:+.1f} dB]")
        for name, fn in masks:
            e_wave = synth_chain(caps, fn)[best_s : best_s + n_r]
            sim = p64[: len(e_wave)] - e_wave
            n = masked_noise_ratio(src, sim, SR)
            print(f"  {name:<18} {n:+6.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
