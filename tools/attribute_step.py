"""Stage attribution by STUBBING: time the CHAINED full step, then rebuild
it with one stage replaced by a cheap dependency-preserving fake and time
again; the delta is that stage's true in-graph cost (isolated stage timings
on this rig include a ~26-45 ms blocking dispatch round-trip and miss
fusion effects — see CLAUDE.md).

Run on the real chip: python tools/attribute_step.py [B] [T]
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


def chained_time(run, carry, pcm_d, fin_d, val_d):
    import jax

    # compile + warm
    c, out = run(carry, pcm_d[0], fin_d, val_d)
    jax.block_until_ready(out)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        c = carry
        last = None
        for k in range(CHAIN):
            c, last = run(c, pcm_d[k], fin_d, val_d)
        jax.block_until_ready(last)
        ts.append((time.perf_counter() - t0) / CHAIN)
    return float(np.median(ts))


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

    from swiftmp3_tpu.models import pipeline
    from swiftmp3_tpu.models.pipeline import init_carry, make_chunk_fn
    from swiftmp3_tpu.options import MP3EncoderOptions, Mode
    from swiftmp3_tpu.ops import dsp, pallas_kernels
    from swiftmp3_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    options = MP3EncoderOptions(mode=Mode.STEREO, bitrate_kbps=128)
    ch = options.channels
    n = 1152 * ch
    audio_seconds = B * T * 1152 / options.sample_rate
    print(f"B={B} T={T} platform={jax.devices()[0].platform} chain={CHAIN}")

    rng = np.random.default_rng(0)
    pcm_d = [
        jax.device_put(
            (np.clip(rng.standard_normal((B, T, n)) * 0.2, -0.99, 0.99) * 32767
             ).astype(np.int16)
        )
        for _ in range(CHAIN)
    ]
    fin_d = jax.device_put(np.zeros((B, T), dtype=bool))
    val_d = jax.device_put(np.ones((B, T), dtype=bool))
    jax.block_until_ready(pcm_d)
    carry = init_carry(B, options)

    def build():
        return jax.jit(make_chunk_fn(options))

    t_full = chained_time(build(), carry, pcm_d, fin_d, val_d)
    print(f"{'FULL STEP':28s} {t_full*1e3:8.2f} ms  ({audio_seconds/t_full:7.0f}x rt)")

    results = {}

    def measure(name, ctxs):
        with contextlib.ExitStack() as st:
            for c in ctxs:
                st.enter_context(c)
            t = chained_time(build(), carry, pcm_d, fin_d, val_d)
        results[name] = t_full - t
        print(f"{name:28s} {t*1e3:8.2f} ms  delta {1e3*(t_full-t):+7.2f} ms")

    # --- fakes: consume inputs via a scalar sum (prevents DCE of upstream),
    # produce correctly-shaped CHEAP outputs. Outputs vary along their minor
    # axes (scalar + iota) so XLA cannot algebraically fold downstream work
    # on a pure broadcast — a constant-filled fake would undercount
    # downstream and overcount the stubbed stage.
    def consume(*xs):
        s = jnp.float32(0)
        for x in xs:
            s = s + jnp.sum(x).astype(jnp.float32) * jnp.float32(1e-30)
        return s

    def fvary(s, shape):  # f32 filler varying along the last axis
        return s + jnp.arange(shape[-1], dtype=jnp.float32) * jnp.float32(
            1e-6
        ) + jnp.zeros(shape, jnp.float32)

    def ivary(z, shape, lo, hi):  # int32 filler varying along the last axis
        ramp = lo + jnp.arange(shape[-1], dtype=jnp.int32) % (hi - lo)
        return z + ramp + jnp.zeros(shape, jnp.int32)

    def fake_polyphase(hist, pcm):
        x = jnp.concatenate([hist, pcm], axis=-1)
        T36 = (x.shape[-1] - 480) // 32
        s = consume(x)
        S = fvary(s, (*x.shape[:-1], T36, 32))
        return S, x

    measure(
        "filterbank",
        [patched(dsp, "polyphase_chunk", fake_polyphase),
         patched(dsp, "polyphase_chunk_matmul", fake_polyphase),
         patched(pallas_kernels, "polyphase_chunk_pallas", fake_polyphase)],
    )

    def fake_mdct(S, overlap, block_seq):
        lead = S.shape[:-2]
        n_gran = S.shape[-2] // 18
        s = consume(S, overlap) + consume(block_seq.astype(jnp.float32))
        spectra = fvary(s, (*lead, n_gran, 576)) * jnp.float32(1e-3)
        cur = fvary(s, (*lead, n_gran, 576))
        return spectra, cur

    measure("mdct", [patched(dsp, "mdct_chunk", fake_mdct)])

    def fake_transient(gp):
        lead = gp.shape[:-1]
        z = (consume(gp) * 0).astype(jnp.int32)
        return (
            z + jnp.zeros(lead, jnp.int32),
            ivary(z, (*lead, 3), 0, 3),
        )

    measure("transient", [patched(dsp, "transient_frame", fake_transient)])

    def fake_precompute(spectrum, init_gain, iso=False, use_pallas=False):
        lead = spectrum.shape[:-1]
        z = (consume(spectrum) * 0).astype(jnp.int32) + init_gain * 0
        return {
            "mag": jnp.abs(spectrum),
            "sign_neg": spectrum < 0,
            "gstart": z + 210,
            "k_budget": z[..., None][..., 0] + 20,
            "bits": ivary(z[..., None], (*lead, dsp.N_GAIN_CANDIDATES), 100, 4000),
            "bv": ivary(z[..., None], (*lead, dsp.N_GAIN_CANDIDATES), 1, 289),
            "evaluated": ivary(z[..., None], (*lead, dsp.N_GAIN_CANDIDATES), 0, 20) < 19,
            "iso": iso,
        }

    measure("rate sweep (pallas)", [patched(dsp, "rate_loop_precompute", fake_precompute)])

    def fake_finalize(pre, k_sel, has_fit):
        gains = pre["gstart"] + 4 * k_sel
        z = (consume(pre["mag"]) * 0).astype(jnp.int32) + k_sel[..., None] * 0
        q = ivary(z, (*k_sel.shape, 576), -15, 16)
        bv = jnp.take_along_axis(pre["bv"], k_sel[..., None], axis=-1)[..., 0]
        return gains, q, bv

    measure("finalize requant", [patched(dsp, "rate_loop_finalize", fake_finalize)])

    def fake_pair_chunks(q, bv):
        lead = q.shape[:-1]
        z = (consume(q.astype(jnp.float32)) * 0).astype(jnp.int32) + bv[..., None] * 0
        c = ivary(z, (*lead, 288), 0, 4000)
        nb = ivary(z, (*lead, 288), 0, 12)
        return c, nb

    measure("pair chunks", [patched(dsp, "pair_chunks_device", fake_pair_chunks)])

    def fake_pack(chunks, nbits, cap_bytes):
        F = chunks.shape[0]
        z = (consume(chunks.astype(jnp.float32), nbits.astype(jnp.float32)) * 0)
        by = ivary(z.astype(jnp.int32), (F, cap_bytes), 0, 250).astype(jnp.uint8)
        tb = z.astype(jnp.int32) + jnp.zeros((F,), jnp.int32) + 800
        return by, tb

    measure("pack", [patched(dsp, "pack_main_data", fake_pack)])

    # integer scan: replace lax.scan with one-step + broadcast (keeps shapes
    # and input deps, removes the T-long sequential chain)
    real_scan = jax.lax.scan

    def fake_scan(f, init, xs):
        x0 = jax.tree_util.tree_map(lambda a: a[0], xs)
        Tlen = jax.tree_util.tree_leaves(xs)[0].shape[0]
        c1, y0 = f(init, x0)
        ys = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (Tlen, *a.shape)), y0
        )
        return c1, ys

    measure("integer scan", [patched(jax.lax, "scan", fake_scan)])

    # carry-out one-hot selects (einsum since the gather removal)
    real_einsum = jnp.einsum  # captured: the patch rebinds jnp.einsum itself

    def fake_einsum(spec, a, b, precision=None):
        if spec == "bt,bctj->bcj":
            return b[:, :, 0] + (consume(a) * 0)
        if spec == "bg,bcgj->bcj":
            return b[:, :, 0] + (consume(a) * 0)
        return real_einsum(spec, a, b, precision=precision)

    measure("carry-out selects", [patched(pipeline.jnp, "einsum", fake_einsum)])

    # trace-time ablation branches inside the pipeline
    measure("ingest (deint+cvt)", [patched(pipeline, "_ABLATE", frozenset({"ingest"}))])
    measure("meta assembly+concat", [patched(pipeline, "_ABLATE", frozenset({"meta"}))])

    # dispatch floor: a trivial program over the same inputs
    def noop(carry, pcm, fin, val):
        s = jnp.sum(pcm, dtype=jnp.float32) * jnp.float32(1e-30)
        out = {"packed": jnp.zeros((B, T, 8), jnp.uint8) + s.astype(jnp.uint8)}
        return carry, out

    t_noop = chained_time(jax.jit(noop), carry, pcm_d, fin_d, val_d)
    print(f"{'dispatch floor (noop)':28s} {t_noop*1e3:8.2f} ms")

    print("-" * 58)
    acc = sum(results.values())
    print(f"sum of deltas {acc*1e3:6.2f} ms; unattributed remainder "
          f"{(t_full-acc)*1e3:6.2f} ms (deinterleave, scrub, meta assembly, "
          f"output concat, dispatch)")


if __name__ == "__main__":
    main()
