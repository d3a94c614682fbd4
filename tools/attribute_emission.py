"""Sub-stage chip attribution INSIDE the strict entropy lookups.

The round-4 stub attribution priced whole stages (strict chunk emission
8.6 ms, scalefactors 5.0, finalize 4.3 at 128x64 hq). Before spending a
round-5 lever on any of them, split the emission/pricing cost by LOOKUP
KIND: the pair CODE halfword trees (127 wheres each, emission-only) vs
the pair LEN nibble trees (31 wheres each, but running 20x inside the
sweep's anchor pricing), vs everything else.

Methodology: dependency-preserving cheap fakes for _pair_code_by_tid /
_pair_len_by_tid patched into the FULL hq chained step (isolated stage
timings lie on this rig — CLAUDE.md). Deltas vs the unpatched step are
the true in-graph cost of each lookup kind.

Run on the real chip: python tools/attribute_emission.py [B] [T]
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
    from swiftmp3_tpu.ops import dsp
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

    hq_opts = MP3EncoderOptions.hq(mode=Mode.STEREO, bitrate_kbps=128)

    def chained_time():
        run = jax.jit(make_chunk_fn(hq_opts))
        carry = init_carry(B, hq_opts)
        c, out = run(carry, pcm_d[0], fin_d, val_d, la_d[0])
        jax.block_until_ready(out)
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            c = carry
            last = None
            for k in range(CHAIN):
                c, last = run(c, pcm_d[k], fin_d, val_d, la_d[k])
            jax.block_until_ready(last)
            ts.append((time.perf_counter() - t0) / CHAIN)
        return float(np.median(ts))

    t_full = chained_time()
    print(f"{'hq (full)':28s} {t_full*1e3:8.2f} ms  ({audio_seconds/t_full:7.0f}x rt)")

    # Cheap dependency-preserving fakes: same dtype/shape/range, ~3 ops.
    def fake_len(tid, idx, linbits=False):
        return ((idx & 7) + (tid & 3) + 1).astype(jnp.int32)

    def fake_code(tid, idx, linbits=False):
        return ((idx * 5 + tid) & 0xFFF).astype(jnp.int32)

    def measure(name, ctxs):
        with contextlib.ExitStack() as st:
            for c in ctxs:
                st.enter_context(c)
            t = chained_time()
        print(f"{name:28s} {t*1e3:8.2f} ms  delta {1e3*(t_full-t):+7.2f} ms")

    measure("pair CODE trees stubbed",
            [patched(dsp, "_pair_code_by_tid", fake_code)])
    measure("pair LEN trees stubbed",
            [patched(dsp, "_pair_len_by_tid", fake_len)])
    measure("both stubbed",
            [patched(dsp, "_pair_code_by_tid", fake_code),
             patched(dsp, "_pair_len_by_tid", fake_len)])


if __name__ == "__main__":
    main()
