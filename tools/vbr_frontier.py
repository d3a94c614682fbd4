"""Rate-quality frontier: CBR vs reference (energy) VBR vs demand VBR.

Probe record (2026-08-19, mixed tonal|speech|sparse-attacks|noise piece,
24 frames mono 44.1k, libmpg123, interior-scored NMR; lower is better):

    CBR  64..128:   66.7/23.4  83.3/22.1  100.0/21.1  116.7/17.7  133.3/17.2
    eVBR q1/3/5/7:  129.3/17.5  130.0/20.4  130.7/17.3  131.3/17.3
    dVBR q1..q7:    152.0/13.6  147.3/14.2  142.7/14.0  133.7/14.2
                    130.0/14.4  125.3/17.5  120.7/17.5

dVBR q5 matches CBR-128's rate at ~2.8 dB better NMR; the reference's
energy law buys nothing over CBR. On EASY content (quiet passages that
CBR codes transparently) high q trades transparency for rate — q0 is
the never-worse point (measured 5.8 vs 10.6 NMR at +21% rate); one
candidate notch is ~6 dB, so the q ladder is coarse by construction.

Run (CPU): python tools/vbr_frontier.py
"""
import sys
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from swiftmp3_tpu import MP3Encoder, MP3EncoderOptions, Mode
from swiftmp3_tpu.utils.external import mpg123_decode
from swiftmp3_tpu.utils.quality import masked_noise_ratio
from tune_psy import SR, synth

def enc(opts, pcm):
    s = MP3Encoder(opts, backend="numpy").new_session()
    return s.encode(pcm) + s.flush()

# mixed realistic piece: tonal -> speech -> sparse-attacks -> noise, 24 frames
rng = np.random.default_rng(3)
seg = 6 * 1152
parts = [synth("tonal", seg, 12), synth("speech", seg, 10)]
t = np.arange(seg) / SR
bed = 0.08 * np.sin(2 * np.pi * 330 * t)
for f in (1, 4):
    off = f * 1152 + 400
    bed[off:off+300] += 0.7 * rng.standard_normal(300)
parts.append(np.clip(bed, -0.99, 0.99).astype(np.float32))
parts.append(synth("noise", seg, 13) * 0.5)
pcm = np.concatenate(parts).astype(np.float32)
n = len(pcm); dur = n / SR; trim = 2 * 1152

def score(opts):
    blob = enc(opts, pcm)
    kbps = len(blob) * 8 / dur / 1000
    ext, _ = mpg123_decode(blob)
    return kbps, masked_noise_ratio(pcm[trim:-trim], ext[:, 0], SR)

print("== CBR frontier")
for kb in (64, 80, 96, 112, 128):
    k, nmr = score(MP3EncoderOptions.hq(mode=Mode.MONO, bitrate_kbps=kb, sample_rate=SR))
    print(f"  CBR {kb:3d}: {k:6.1f} kbps  NMR {nmr:7.2f}")
print("== reference (energy) VBR frontier, base 128")
for q in (1, 3, 5, 7):
    k, nmr = score(MP3EncoderOptions.hq(mode=Mode.MONO, bitrate_kbps=128, sample_rate=SR, vbr=True, quality=q))
    print(f"  eVBR q{q}: {k:6.1f} kbps  NMR {nmr:7.2f}")
print("== demand VBR frontier, base 128")
for q in (1, 2, 3, 4, 5, 6, 7):
    k, nmr = score(MP3EncoderOptions.hq(mode=Mode.MONO, bitrate_kbps=128, sample_rate=SR, vbr=True, vbr_demand=True, quality=q))
    print(f"  dVBR q{q}: {k:6.1f} kbps  NMR {nmr:7.2f}")

# --- corpus-scale frontier (round 4, VERDICT item 7) ---------------------------
# Per-class pareto: q in {0,3,5,7} x {64, 96, 128} base rates over the
# 5-class corpus + nburst. Run: python tools/vbr_frontier.py --corpus
if "--corpus" in sys.argv:
    kinds = ("speech", "music", "tonal", "noise", "burst", "nburst")
    n16 = 16 * 1152
    sigs = {}
    for i, k in enumerate(kinds):
        if k == "nburst":
            t16 = np.arange(n16) / SR
            x = 0.3 * np.sin(2 * np.pi * 523.25 * t16)
            r2 = np.random.default_rng(42)
            for p in range(900, n16 - 600, 3000):
                x[p:p+300] += 0.45 * r2.standard_normal(300)
            sigs[k] = np.clip(x, -0.99, 0.99).astype(np.float32)
        else:
            sigs[k] = synth(k, n16, 10 + i)
    trim16 = 2 * 1152
    dur16 = n16 / SR

    def score16(opts, sig):
        blob = enc(opts, sig)
        kbps = len(blob) * 8 / dur16 / 1000
        ext, _ = mpg123_decode(blob)
        return kbps, masked_noise_ratio(sig[trim16:-trim16], ext[:, 0], SR)

    print("== corpus frontier: class | base | CBR kbps/NMR | dVBR q0/q3/q5/q7 kbps/NMR")
    for kind in kinds:
        sig = sigs[kind]
        for base in (64, 96, 128):
            ck, cn = score16(
                MP3EncoderOptions.hq(mode=Mode.MONO, bitrate_kbps=base, sample_rate=SR), sig
            )
            cells = []
            for q in (0, 3, 5, 7):
                dk, dn = score16(
                    MP3EncoderOptions.hq(
                        mode=Mode.MONO, bitrate_kbps=base, sample_rate=SR,
                        vbr=True, vbr_demand=True, quality=q,
                    ), sig
                )
                cells.append(f"q{q} {dk:6.1f}/{dn:6.2f}")
            print(f"  {kind:>7} {base:3d} | CBR {ck:6.1f}/{cn:6.2f} | " + "  ".join(cells))
