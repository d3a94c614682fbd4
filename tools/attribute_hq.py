"""Chip attribution for the hq preset (linbits + scfsi + demand_budget +
window_sequencing): the round-3 step never got a per-stage chip profile
because the tunnel was down for the whole back half of the round.

Two complementary views, both on the CHAINED full step (isolated stage
timings on this rig lie — see CLAUDE.md):

1. OPTION LADDER — time the full step at each rung from compat to hq.
   Deltas between rungs are the true in-graph cost of each feature
   (semantic cost: the graph is rebuilt, so XLA refuses/allows fusions
   exactly as it does in production).
2. STUB ATTRIBUTION inside full hq — dependency-preserving fakes for the
   strict sweep, the exact anchor pricing, finalize, chunk emission,
   scalefactors, MDCT, transient, and pack (same methodology as
   tools/attribute_step.py).

Run on the real chip: python tools/attribute_hq.py [B] [T]
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN = 8
REPS = 3


@contextlib.contextmanager
def patched(obj, name, fake):
    orig = getattr(obj, name)
    setattr(obj, name, fake)
    try:
        yield
    finally:
        setattr(obj, name, orig)


def main():
    import jax
    import jax.numpy as jnp

    from swiftmp3_tpu.models.pipeline import init_carry, make_chunk_fn
    from swiftmp3_tpu.options import MP3EncoderOptions, Mode
    from swiftmp3_tpu.ops import dsp, pallas_kernels
    from swiftmp3_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    ch = 2
    n = 1152 * ch
    sr = 44100
    audio_seconds = B * T * 1152 / sr
    print(f"B={B} T={T} platform={jax.devices()[0].platform} chain={CHAIN}")

    rng = np.random.default_rng(0)
    pcm_d = [
        jax.device_put(
            (np.clip(rng.standard_normal((B, T, n)) * 0.2, -0.99, 0.99) * 32767
             ).astype(np.int16)
        )
        for _ in range(CHAIN)
    ]
    la_d = [
        jax.device_put(
            (np.clip(rng.standard_normal((B, T, 576 * ch)) * 0.2, -0.99, 0.99)
             * 32767).astype(np.int16)
        )
        for _ in range(CHAIN)
    ]
    fin_d = jax.device_put(np.zeros((B, T), dtype=bool))
    val_d = jax.device_put(np.ones((B, T), dtype=bool))
    jax.block_until_ready(pcm_d)
    jax.block_until_ready(la_d)

    def chained_time(options, needs_la):
        run = jax.jit(make_chunk_fn(options))
        carry = init_carry(B, options)
        args0 = (carry, pcm_d[0], fin_d, val_d) + ((la_d[0],) if needs_la else ())
        c, out = run(*args0)
        jax.block_until_ready(out)
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            c = carry
            last = None
            for k in range(CHAIN):
                extra = (la_d[k],) if needs_la else ()
                c, last = run(c, pcm_d[k], fin_d, val_d, *extra)
            jax.block_until_ready(last)
            ts.append((time.perf_counter() - t0) / CHAIN)
        return float(np.median(ts))

    # ------------------------- 1. option ladder ---------------------------
    ladder = [
        ("compat", MP3EncoderOptions(mode=Mode.STEREO, bitrate_kbps=128), False),
        ("spec_strict", MP3EncoderOptions.spec_strict(
            mode=Mode.STEREO, bitrate_kbps=128), False),
        ("strict+linbits", MP3EncoderOptions.spec_strict(
            mode=Mode.STEREO, bitrate_kbps=128, linbits_tables=True), False),
        ("hq - winseq - demand", MP3EncoderOptions.spec_strict(
            mode=Mode.STEREO, bitrate_kbps=128, linbits_tables=True,
            scfsi=True), False),
        ("hq - winseq", MP3EncoderOptions.spec_strict(
            mode=Mode.STEREO, bitrate_kbps=128, linbits_tables=True,
            scfsi=True, demand_budget=True), False),
        ("hq (full)", MP3EncoderOptions.hq(
            mode=Mode.STEREO, bitrate_kbps=128), True),
    ]
    times = {}
    prev = None
    print("\n--- option ladder (chained full step) ---")
    for name, opts, needs_la in ladder:
        t = chained_time(opts, needs_la)
        d = "" if prev is None else f"  delta {1e3*(t-prev):+7.2f} ms"
        print(f"{name:24s} {t*1e3:8.2f} ms  ({audio_seconds/t:7.0f}x rt){d}")
        times[name] = t
        prev = t

    # --------------------- 2. stubs inside full hq ------------------------
    hq_opts = ladder[-1][1]
    t_full = times["hq (full)"]
    print("\n--- stub attribution inside hq (full) ---")

    def consume(*xs):
        s = jnp.float32(0)
        for x in xs:
            s = s + jnp.sum(x).astype(jnp.float32) * jnp.float32(1e-30)
        return s

    def fvary(s, shape):
        return s + jnp.arange(shape[-1], dtype=jnp.float32) * jnp.float32(
            1e-6
        ) + jnp.zeros(shape, jnp.float32)

    def ivary(z, shape, lo, hi):
        ramp = lo + jnp.arange(shape[-1], dtype=jnp.int32) % (hi - lo)
        return z + ramp + jnp.zeros(shape, jnp.int32)

    def measure(name, ctxs):
        with contextlib.ExitStack() as st:
            for c in ctxs:
                st.enter_context(c)
            t = chained_time(hq_opts, True)
        print(f"{name:24s} {t*1e3:8.2f} ms  delta {1e3*(t_full-t):+7.2f} ms")

    # strict sweep (pricing + candidate table) as one unit
    def fake_pre_strict(spectrum, init_gain, sample_rate, is_long, iso,
                        count1_coding, region_table_select, mag_scale=None,
                        part2=None, block=None, iso_short=False,
                        use_pallas=False, linbits=False):
        lead = spectrum.shape[:-1]
        s = consume(spectrum) + (consume(mag_scale) if mag_scale is not None else 0)
        z = (s * 0).astype(jnp.int32) + init_gain * 0
        bits = ivary(z[..., None], (*lead, dsp.N_GAIN_CANDIDATES), 100, 4000)
        if part2 is not None:
            bits = bits + part2[..., None]
        return {
            "mag": jnp.abs(spectrum),
            "sign_neg": spectrum < 0,
            "gstart": z + 210,
            "k_budget": z + dsp.N_GAIN_CANDIDATES,
            "bits": bits,
            "evaluated": ivary(z[..., None], (*lead, dsp.N_GAIN_CANDIDATES), 0, 20) < 19,
            "iso": iso,
            "strict": (sample_rate, count1_coding, region_table_select),
            "is_long": is_long,
            "linbits": linbits,
        }

    measure("strict sweep (pricing)",
            [patched(dsp, "rate_loop_precompute_strict", fake_pre_strict)])

    # exact anchor pricing only: cheap strict_layout_device (affects both
    # the sweep's lax.map anchors AND the finalize layout — read the delta
    # as "the whole exact-layout law", sweep share = this minus finalize)
    def fake_layout(q, sample_rate, is_long, count1_coding,
                    region_table_select, assume_abs=False, linbits=False):
        lead = q.shape[:-1]
        z = (consume(q.astype(jnp.float32)) * 0).astype(jnp.int32)
        full = jnp.zeros(lead, jnp.int32) + z
        return {
            "bv": full + 100,
            "n1": full + 8,
            "c1t": full & 0,
            "tid0": full + 7,
            "tid1": full + 10,
            "tid2": full + 13,
            "r0": full + 4,
            "r1": full + 3,
            "b0": full + 36,
            "b1": full + 400,
            "bits": full + 900,
        }

    measure("exact layout law (all)",
            [patched(dsp, "strict_layout_device", fake_layout)])

    def fake_finalize(pre, k_sel, has_fit):
        gains = pre["gstart"] + 4 * k_sel
        z = (consume(pre["mag"]) * 0).astype(jnp.int32) + k_sel * 0
        q = ivary(z[..., None], (*k_sel.shape, 576), -15, 16)
        lay = fake_layout(q, 0, None, True, True)
        return gains, q, lay

    measure("strict finalize",
            [patched(dsp, "strict_finalize", fake_finalize)])

    def fake_chunks(q, lay, linbits=False):
        lead = q.shape[:-1]
        w = 864 + 144 if linbits else 288 + 144
        z = (consume(q.astype(jnp.float32)) * 0).astype(jnp.int32) + lay["bv"][..., None] * 0
        c = ivary(z, (*lead, w), 0, 4000)
        nb = ivary(z, (*lead, w), 0, 12)
        return c, nb

    measure("strict chunk emission",
            [patched(dsp, "strict_chunks_device", fake_chunks)])

    def fake_sfd(spectrum, sample_rate, block, psy=False, iso_short=False):
        lead = spectrum.shape[:-1]
        s = consume(spectrum) + consume(block.astype(jnp.float32))
        z = (s * 0).astype(jnp.int32)
        full = jnp.zeros(lead, jnp.int32) + z
        SF_SLOTS = dsp.SF_SLOTS
        return {
            "sf": ivary(z[..., None], (*lead, 21), 0, 4),
            "sf_slots": ivary(z[..., None], (*lead, SF_SLOTS), 0, 4),
            "slot_nbits": ivary(z[..., None], (*lead, SF_SLOTS), 0, 4),
            "compress": full + 1,
            "slen1": full + 1,
            "slen2": full + 1,
            "part2": full + 21,
            "mag_scale": jnp.ones(spectrum.shape, jnp.float32) + s,
        }

    measure("scalefactors (granule)",
            [patched(dsp, "granule_scalefactors_device", fake_sfd)])

    def fake_mdct(S, overlap, block_seq, iso_mixed_alias=False,
                  window_seq=False):
        lead = S.shape[:-2]
        n_gran = S.shape[-2] // 18
        s = consume(S, overlap) + consume(block_seq.astype(jnp.float32))
        spectra = fvary(s, (*lead, n_gran, 576)) * jnp.float32(1e-3)
        cur = fvary(s, (*lead, n_gran, 576))
        return spectra, cur

    measure("mdct (incl start/stop)", [patched(dsp, "mdct_chunk", fake_mdct)])

    def fake_transient(gp):
        lead = gp.shape[:-1]
        z = (consume(gp) * 0).astype(jnp.int32)
        return (
            z + jnp.zeros(lead, jnp.int32),
            ivary(z[..., None], (*lead, 3), 0, 3),
        )

    measure("transient (x3 winseq)",
            [patched(dsp, "transient_frame", fake_transient)])

    def fake_pack(chunks, nbits, cap_bytes):
        F = chunks.shape[0]
        z = (consume(chunks.astype(jnp.float32), nbits.astype(jnp.float32)) * 0)
        by = ivary(z.astype(jnp.int32), (F, cap_bytes), 0, 250).astype(jnp.uint8)
        tb = z.astype(jnp.int32) + jnp.zeros((F,), jnp.int32) + 800
        return by, tb

    measure("pack (pallas)",
            [patched(pallas_kernels, "pack_pallas", fake_pack),
             patched(dsp, "pack_main_data", fake_pack)])


if __name__ == "__main__":
    main()
