"""Per-stage device-compute breakdown of the chunk encode step.

Run on the real chip: python tools/profile_step.py [B] [T]
Times (median of N) each jitted stage with resident inputs, then the full
step, so the sum-of-stages vs whole-step gap exposes fusion/layout costs.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def med_time(fn, args, n=5, name=""):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    print(f"{name:36s} {t*1e3:9.2f} ms   (min {min(ts)*1e3:7.2f}, max {max(ts)*1e3:7.2f})")
    return t, out


def main():
    import jax
    import jax.numpy as jnp

    from swiftmp3_tpu.models.pipeline import init_carry, make_chunk_fn, main_data_cap
    from swiftmp3_tpu.options import MP3EncoderOptions, Mode
    from swiftmp3_tpu.ops import dsp, pallas_kernels
    from swiftmp3_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    options = MP3EncoderOptions(mode=Mode.STEREO, bitrate_kbps=128)
    ch = options.channels
    n = 1152 * ch
    cap = main_data_cap(options)
    print(f"B={B} T={T} ch={ch} cap={cap} platform={jax.devices()[0].platform}")
    audio_seconds = B * T * 1152 / options.sample_rate

    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal((B, T, n)) * 0.3).astype(np.float32)
    final = np.zeros((B, T), dtype=bool)
    valid = np.ones((B, T), dtype=bool)
    carry = init_carry(B, options)

    pcm_d = jax.device_put(pcm)
    fin_d = jax.device_put(final)
    val_d = jax.device_put(valid)
    jax.block_until_ready(pcm_d)

    # ---- full step ----
    run = jax.jit(make_chunk_fn(options))
    t_full, _ = med_time(run, (carry, pcm_d, fin_d, val_d), name="FULL STEP")
    print(f"{'':36s} => {audio_seconds / t_full:8.0f}x realtime")

    # ---- stage inputs (batch-major, as the pipeline builds them) ----
    pcm_bt = pcm.reshape(B, T * n)
    left = pcm_bt[:, 0::2].reshape(B, T, 1152)
    right = pcm_bt[:, 1::2].reshape(B, T, 1152)
    pcm_chunk = np.stack([left, right], axis=1).reshape(B, ch, T * 1152)
    pcm_chunk_d = jax.device_put(jnp.asarray(pcm_chunk))
    fb_hist = jax.device_put(jnp.zeros((B, ch, 480), jnp.float32))
    overlap = jax.device_put(jnp.zeros((B, ch, 576), jnp.float32))
    jax.block_until_ready(pcm_chunk_d)

    # filterbank
    fb_x = jax.jit(dsp.polyphase_chunk)
    _, (S, full_x) = med_time(fb_x, (fb_hist, pcm_chunk_d), name="polyphase_chunk (XLA)")
    if jax.devices()[0].platform == "tpu" and (36 * T) % 96 == 0:
        fb_p = jax.jit(pallas_kernels.polyphase_chunk_pallas)
        med_time(fb_p, (fb_hist, pcm_chunk_d), name="polyphase_chunk (pallas)")

    # transient
    granule_pcm = jnp.asarray(pcm_chunk.reshape(B, ch, T, 2, 576))
    granule_pcm = jax.device_put(granule_pcm)
    tr = jax.jit(dsp.transient_frame)
    _, (block_b, sbg) = med_time(tr, (granule_pcm,), name="transient_frame")
    block_seq = block_b.reshape(B, ch, 2 * T)

    # mdct
    md = jax.jit(dsp.mdct_chunk)
    _, (spectra, cur) = med_time(md, (S, overlap, block_seq), name="mdct_chunk")
    spectra = spectra.reshape(B, ch, T, 2, 576)

    # initial gain
    ig = jax.jit(dsp.initial_gain)
    _, g0 = med_time(ig, (spectra,), name="initial_gain")

    # rate loop precompute (the 20-gain sweep)
    rp = jax.jit(dsp.rate_loop_precompute)
    _, pre = med_time(rp, (spectra, g0), name="rate_loop_precompute")

    # finalize (re-quantize at selected gains)
    k_sel = jax.device_put(jnp.zeros((B, ch, T, 2), jnp.int32))
    has_fit = jax.device_put(jnp.ones((B, ch, T, 2), bool))
    fin_fn = jax.jit(dsp.rate_loop_finalize)
    _, (gain_b, quantized, bv) = med_time(
        fin_fn, (pre, k_sel, has_fit), name="rate_loop_finalize"
    )

    # pair chunks + pack
    pc = jax.jit(dsp.pair_chunks_device)
    _, (chunks, nb) = med_time(pc, (quantized, bv), name="pair_chunks_device")

    def fm(x):
        return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(B * T, 2 * ch * 288)

    chunks_f = jax.device_put(fm(chunks))
    nb_f = jax.device_put(fm(nb))
    jax.block_until_ready(chunks_f)
    pk = jax.jit(lambda c, nbits: dsp.pack_main_data(c, nbits, cap))
    med_time(pk, (chunks_f, nb_f), name="pack_main_data")

    # the integer scan alone (phase 2): build via the full fn minus? skipped —
    # estimate as residual.
    print("(residual = full - sum(stages) ≈ scan + transposes + output pack)")


if __name__ == "__main__":
    main()
