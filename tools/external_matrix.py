"""One-off external conformance matrix: hq/strict across rates x bitrates
x modes x vbr, long streams, validated against the system libmpg123.

Motivation (round 3): the aligned-reservoir >511-byte corruption was
invisible to every in-repo test — it needed LONG streams at HIGH bitrates
and an EXTERNAL decoder to surface (oracle and mpg123 both "decoded" the
corrupt stream and disagreed at ~0 dB). The existing hq tests all pin
sample_rate=44100 and CBR; this sweep drives the remaining axes: all three
MPEG-1 sample rates (band tables, frame byte sizes, and reservoir
arithmetic all change), VBR, and both channel modes, on transient-heavy
content so window_sequencing and demand_budget actually fire.

Checks per config:
- every frame decodes in BOTH the in-repo oracle (iso_conventions) and
  libmpg123;
- decoder agreement (decode_agreement_snr, no alignment search) > 90 dB --
  the two decoders reading the same bytes must agree to float precision on
  conforming streams;
- raw unit-gain SNR of the mpg123 decode vs the source is reported (and
  sanity-floored > 0 dB on the tonal/burst content used here).

Run (CPU, numpy backend):  python tools/external_matrix.py [--frames 24]
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
from swiftmp3_tpu.decoder import decode_mp3  # noqa: E402
from swiftmp3_tpu.utils.external import have_mpg123, mpg123_decode  # noqa: E402
from swiftmp3_tpu.utils.quality import (  # noqa: E402
    decode_agreement_snr,
    measure_quality,
)


def make_pcm(sr: int, n: int, seed: int, ch: int) -> np.ndarray:
    """Transient-heavy mono content (tone + bursts + noise floor),
    interleaved to ch channels with a slight inter-channel tilt so stereo
    modes exercise real M/S decisions."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = 0.25 * np.sin(2 * np.pi * 493.88 * t) + 0.1 * np.sin(2 * np.pi * 1975.5 * t)
    env = np.full(n, 0.15)
    for p in range(sr // 3, n - 1500, int(sr * 0.37)):
        env[p : p + 900] = 1.0
    x = x * env + rng.standard_normal(n).astype(np.float64) * 0.01
    x = np.clip(x, -0.99, 0.99).astype(np.float32)
    if ch == 1:
        return x
    out = np.empty(n * 2, dtype=np.float32)
    out[0::2] = x
    out[1::2] = np.clip(x * 0.8 + 0.02 * rng.standard_normal(n), -0.99, 0.99)
    return out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=24)
    p.add_argument("--agree-floor", type=float, default=90.0)
    args = p.parse_args()

    if not have_mpg123():
        print("libmpg123 not available; nothing to validate", file=sys.stderr)
        return 2

    failures = []
    rows = []
    cfg_id = 0
    for sr in (32000, 44100, 48000):
        for kbps in (64, 160, 320):
            for mode in (Mode.MONO, Mode.JOINT_STEREO):
                for preset, vbr in (("hq", False), ("strict", False), ("hq", True)):
                    # bound runtime: vbr + strict only ride the 44.1 row
                    # (their rate-dependent paths are the same code; the
                    # rate axis is covered by the CBR hq sweep)
                    if (preset, vbr) != ("hq", False) and sr != 44100:
                        continue
                    cfg_id += 1
                    mk = (
                        MP3EncoderOptions.hq
                        if preset == "hq"
                        else MP3EncoderOptions.spec_strict
                    )
                    opts = mk(
                        mode=mode, sample_rate=sr, bitrate_kbps=kbps, vbr=vbr
                    )
                    ch = mode.channels
                    n = args.frames * 1152
                    pcm = make_pcm(sr, n, 7000 + cfg_id, ch)
                    s = MP3Encoder(opts, backend="numpy").new_session()
                    blob = s.encode(pcm) + s.flush()

                    tag = f"{preset}{'+vbr' if vbr else ''} {sr} {kbps}k {mode.name}"
                    try:
                        dec = decode_mp3(blob, iso_conventions=True)
                        ok_frames = dec.frame_count == s.encoded_frame_count
                        ext, ext_sr = mpg123_decode(blob)
                        agree = decode_agreement_snr(ext[:, 0], dec.pcm[:, 0])
                        mono_in = pcm[0::ch] if ch == 2 else pcm
                        q = measure_quality(
                            mono_in, ext[:, 0], sr, compensate_gain=False
                        )
                        ok = (
                            ok_frames
                            and ext_sr == sr
                            and agree > args.agree_floor
                            and q.snr_db > 0.0
                            and ext.shape[0] >= (s.encoded_frame_count - 1) * 1152
                        )
                        rows.append((tag, agree, q.snr_db, ok))
                        if not ok:
                            failures.append(
                                (tag, f"frames={ok_frames} agree={agree:.1f} "
                                      f"snr={q.snr_db:.1f} ext={ext.shape}")
                            )
                    except Exception as e:  # noqa: BLE001 - sweep must report all
                        rows.append((tag, float("nan"), float("nan"), False))
                        failures.append((tag, repr(e)))
                    print(
                        f"{tag:32s} agree={rows[-1][1]:7.1f} dB  "
                        f"snr={rows[-1][2]:6.2f} dB  "
                        f"{'ok' if rows[-1][3] else 'FAIL'}",
                        flush=True,
                    )

    print(f"\n{len(rows)} configs, {len(failures)} failures")
    for tag, why in failures:
        print(f"  FAIL {tag}: {why}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
