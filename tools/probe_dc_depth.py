"""Distortion-control DEPTH probe (round 4 final / round-5 candidate).

The shipped default is ONE probe->bump pass with a FLAT +3-step bump
(options dc_passes=1, dc_proportional=False). The deeper formulations are
real options with device twins; this tool measures them:

  --passes N         probe->bump iterated N times (still ONE real walk)
  --proportional     bump = ceil(log2(noise/mask)/2), capped at DC_BUMP_MAX
                     (mild violations bump 1 step instead of 3; extreme
                     ones up to 6)

Round-5 result (this matrix, 12-seed speech @128k mono, NMR deltas):
(1,flat) -1.08 | (2,flat) -1.50 | (1,prop) -1.39 | (2,prop) -1.62 |
(3,prop) -1.95 (12/12 improved, noise -1.87) | (4/6/8,prop) plateau
-1.85/-1.82/-1.82. Shipped as options.dc_passes/dc_proportional with
device twins; defaults stay (1, flat).

Protocol: hq(distortion_control=True) at 128 kbps mono (the measured
activity window) over the 12-seed speech distribution (the class where
lame still leads) + the corpus noise clip + VBR speech, interior-scored
NMR through libmpg123 — the same referee as every dc claim
(tools/quality_vs_lame --dc is the single-seed table).

Run:  python tools/probe_dc_depth.py [--passes 2] [--proportional]
      (each invocation prints one config's distribution; run the matrix
      by invoking per config — results table lives in ARCHITECTURE.md)
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
from swiftmp3_tpu.utils.external import have_lame, have_mpg123  # noqa: E402
from swiftmp3_tpu.utils.external import lame_encode, mpg123_decode  # noqa: E402
from swiftmp3_tpu.utils.quality import masked_noise_ratio  # noqa: E402

from tune_psy import SR, synth  # noqa: E402


def _nmr(pcm: np.ndarray, blob: bytes) -> float:
    ext, _ = mpg123_decode(blob)
    trim = 2 * 1152
    src = pcm[trim:-trim] if len(pcm) > 3 * trim else pcm
    return masked_noise_ratio(src, ext[:, 0], SR)


def _ours(opts: MP3EncoderOptions, pcm: np.ndarray) -> bytes:
    s = MP3Encoder(opts, backend="numpy").new_session()
    return s.encode(pcm) + s.flush()


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--passes", type=int, default=1)
    p.add_argument("--proportional", action="store_true")
    p.add_argument("--kbps", type=int, default=128)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--seeds", type=int, default=12)
    args = p.parse_args()
    if not (have_mpg123() and have_lame()):
        print("needs system libmpg123 + libmp3lame")
        return 1

    n = args.frames * 1152
    kbps = args.kbps
    tag = f"passes={args.passes} proportional={args.proportional}"
    print(f"config: {tag} @ {kbps}k mono, {args.frames} frames")

    hq_off = MP3EncoderOptions.hq(mode=Mode.MONO, bitrate_kbps=kbps)
    hq_dc = MP3EncoderOptions.hq(
        mode=Mode.MONO, bitrate_kbps=kbps, distortion_control=True,
        dc_passes=args.passes, dc_proportional=args.proportional,
    )

    deltas = []
    print(f"{'clip':>12} | {'dc off':>7} | {'dc on':>7} | {'delta':>6} | {'lame':>7}")
    for seed in range(10, 10 + args.seeds):
        pcm = synth("speech", n, seed)
        off = _nmr(pcm, _ours(hq_off, pcm))
        on = _nmr(pcm, _ours(hq_dc, pcm))
        lame = _nmr(pcm, lame_encode(pcm, SR, kbps, mode="mono"))
        deltas.append(on - off)
        print(f"{'speech s' + str(seed):>12} | {off:>7.2f} | {on:>7.2f} | "
              f"{on - off:>+6.2f} | {lame:>7.2f}")
    for kind in ("noise", "tonal"):
        pcm = synth(kind, n, 13)
        off = _nmr(pcm, _ours(hq_off, pcm))
        on = _nmr(pcm, _ours(hq_dc, pcm))
        lame = _nmr(pcm, lame_encode(pcm, SR, kbps, mode="mono"))
        print(f"{kind:>12} | {off:>7.2f} | {on:>7.2f} | "
              f"{on - off:>+6.2f} | {lame:>7.2f}")
    d = np.asarray(deltas)
    print(f"speech distribution: mean {d.mean():+.2f} dB, "
          f"{(d < 0).sum()}/{len(d)} improved, worst {d.max():+.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
