"""Headline benchmark: audio-seconds encoded per second per chip.

Config: CBR 128 kbps stereo 44.1 kHz (BASELINE.json headline). Prints ONE
JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
vs_baseline is value / 1000x-realtime (the BASELINE.json north star — it is
defined PER CHIP; the reference publishes no numbers of its own —
BASELINE.md).

Two numbers are measured, both as MEDIANS over unique-content iterations
(the tunnel dedupes repeated buffers, so every timed iteration gets fresh
audio):

1. device_compute (the headline `value`): the chip's throughput — N steps
   over pre-uploaded unique inputs chained back-to-back with ONE final
   block. Chaining matters: a blocking round-trip through the axon tunnel
   costs ~25-45 ms, so timing steps one at a time measures dispatch
   latency, not compute (this is what made round 1's "212 ms device
   compute" reading wrong; the same program chains at ~20 ms/step). This
   matches the north-star metric (per chip): a production PCIe host moves
   19 MB in ~2 ms, far below compute time, so its e2e equals this number
   (the host render path, ~40 ms across 4 cores, overlaps and keeps up).

2. e2e_tunnel (`e2e_tunnel_x_realtime` extra): full pipelined path on THIS
   dev rig — host builds PCM, uploads through the axon tunnel, device
   encodes, downloads, C++ renders bytes. The tunnel moves unique data at
   ~20-45 MB/s (hour-to-hour lottery), one stream at a time (concurrent
   device_puts do not add bandwidth; measured) — 18.9 MB of int16 PCM per
   95.7 s-of-audio step bounds THIS RIG's e2e at ~120-250x realtime
   regardless of device speed. Reported for transparency, not as the
   framework's number.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _make_audio(rng, B, T, n, channels, sample_rate):
    """Realistic correlated audio (speech/music-like), int16 interleaved.
    Every call returns unique content (the transport dedupes repeats)."""
    t_ax = np.arange(T * 1152) / sample_rate
    base = sum(
        a * np.sin(2 * np.pi * f * t_ax)
        for a, f in [(0.35, 220.0), (0.2, 467.0), (0.1, 1313.0)]
    )
    ar = rng.standard_normal((B, T * 1152)).astype(np.float32)
    for i in range(1, 8):
        ar[:, i:] += ar[:, :-i] / (i + 1)
    ar *= 0.05 / np.abs(ar).max()
    sig = (base[None, :] * rng.uniform(0.5, 1.0, (B, 1)) + ar).astype(np.float32)
    sig = np.clip(sig, -0.99, 0.99)
    mono = (sig * 32767).astype(np.int16)
    return np.repeat(mono[..., None], channels, axis=-1).reshape(B, T, n)


def main() -> None:
    import jax

    # The axon tunnel to the TPU flaps for hours at a time (measured:
    # repeated UNAVAILABLE backend-init failures). jax caches the failed
    # backend state in-process, so retry by RE-EXECING with a backoff — a
    # transient outage then doesn't sink the whole bench run. This must
    # run BEFORE any swiftmp3_tpu import (module-level jnp constants touch
    # the backend during import).
    try:
        jax.devices()
    except Exception as e:  # jax wraps init failures in several types
        attempt = int(os.environ.get("_BENCH_TPU_RETRY", "0"))
        if attempt >= 5:
            raise
        print(
            f"TPU backend unavailable (attempt {attempt + 1}/6): {e}; "
            "re-exec retry in 120 s",
            file=sys.stderr,
        )
        time.sleep(120)
        env = dict(os.environ)
        env["_BENCH_TPU_RETRY"] = str(attempt + 1)
        os.execve(sys.executable, [sys.executable] + sys.argv, env)

    from swiftmp3_tpu.options import MP3EncoderOptions, Mode
    from swiftmp3_tpu.parallel.batch import BatchEncoder
    from swiftmp3_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    options = MP3EncoderOptions(mode=Mode.STEREO, bitrate_kbps=128, sample_rate=44100)
    # B=256 x T=128 won the latest (B, T) sweep (~+10% over 128x64 at the
    # current ~20 ms step): as compute shrank, the ~3.5 ms/step dispatch
    # floor through the dev tunnel grew in relative terms, so bigger chunks
    # amortize it further. Working set still fits HBM comfortably.
    B = int(os.environ.get("BENCH_BATCH", "256"))
    T = int(os.environ.get("BENCH_FRAMES", "128"))
    n = 1152 * options.channels
    n_iter = int(os.environ.get("BENCH_ITERS", "12"))
    audio_seconds = B * T * 1152 / options.sample_rate

    rng = np.random.default_rng(0)
    pcms = [_make_audio(rng, B, T, n, options.channels, options.sample_rate)
            for _ in range(n_iter + 1)]
    final = np.zeros((B, T), dtype=bool)
    valid = np.ones((B, T), dtype=bool)

    enc = BatchEncoder(options, B, frames_per_step=T)

    # Warmup (compile + first render)
    outs = enc.step(pcms[-1], final, valid)
    jax.block_until_ready(outs)
    enc.drain(outs, valid)

    # ---- HEADLINE: end-to-end, 3-stage software pipeline (chunk k computes
    # while chunk k+1 uploads and chunk k-1 renders to bytes), per-iteration
    # wall times, median.
    e2e_times = []
    prepared = enc.prepare(pcms[0], final, valid)
    pending = None
    for k in range(n_iter):
        t0 = time.perf_counter()
        outs = enc.step(*prepared)
        if k + 1 < n_iter:
            prepared = enc.prepare(pcms[k + 1], final, valid)
        if pending is not None:
            enc.drain(pending, valid)
        pending = outs
        e2e_times.append(time.perf_counter() - t0)
    enc.drain(pending, valid)
    t_e2e = float(np.median(e2e_times))

    # ---- device compute: chained steps over pre-uploaded unique inputs,
    # one final block; median over repeats. (Per-step blocking would measure
    # the tunnel's ~25-45 ms dispatch round-trip, not the chip.)
    CHAIN = min(8, len(pcms))  # small BENCH_ITERS runs still chain correctly
    pcm_d = [jax.device_put(p) for p in pcms[:CHAIN]]
    fin_d = jax.device_put(final)
    val_d = jax.device_put(valid)
    jax.block_until_ready(pcm_d)
    comp_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        c = enc.carry
        last = None
        for k in range(CHAIN):
            c, last = enc._run(c, pcm_d[k], fin_d, val_d)
        jax.block_until_ready(last)
        comp_times.append((time.perf_counter() - t0) / CHAIN)
    t_comp = float(np.median(comp_times))

    # ---- spec-strict preset compute: same chained/median discipline. The
    # strict mode carries the quality/conformance story, so its cost must be
    # driver-visible next to the compat headline (VERDICT r2 weak-point 1).
    t_strict = None
    if os.environ.get("BENCH_STRICT", "1") != "0":
        try:
            # hq = spec_strict + linbits/psy/scfsi: the configuration that
            # carries the quality story (bitrate-scaling fidelity); costs
            # what spec_strict costs (same sweep architecture, wider caps)
            strict_opts = MP3EncoderOptions.hq(
                mode=Mode.STEREO, bitrate_kbps=128, sample_rate=44100
            )
            enc_s = BatchEncoder(strict_opts, B, frames_per_step=T)
            # window_sequencing (hq): per-frame lookahead = the next raw
            # granule; chained chunks borrow the next chunk's first granule
            la_n = 576 * strict_opts.channels
            las = []
            for k in range(CHAIN):
                la = np.zeros((B, T, la_n), dtype=pcms[k].dtype)
                la[:, :-1] = pcms[k][:, 1:, :la_n]
                la[:, -1] = pcms[(k + 1) % CHAIN][:, 0, :la_n]
                las.append(la)
            la_last = np.zeros((B, T, la_n), dtype=pcms[-1].dtype)
            la_last[:, :-1] = pcms[-1][:, 1:, :la_n]
            outs = enc_s.step(pcms[-1], final, valid, lookahead=la_last)
            jax.block_until_ready(outs)
            enc_s.drain(outs, valid)
            la_d = [jax.device_put(x) for x in las]
            jax.block_until_ready(la_d)
            strict_times = []
            for _ in range(3):
                t0 = time.perf_counter()
                c = enc_s.carry
                last = None
                for k in range(CHAIN):
                    c, last = enc_s._run(c, pcm_d[k], fin_d, val_d, la_d[k])
                jax.block_until_ready(last)
                strict_times.append((time.perf_counter() - t0) / CHAIN)
            t_strict = float(np.median(strict_times))
        except Exception as e:  # never let the strict extra sink the bench
            print(f"spec_strict bench failed: {e!r}", file=sys.stderr)
            t_strict = None

    # ---- serving: fixed saturated StreamPool configuration (VERDICT r3
    # item 6 — a serving regression must be driver-visible). All lanes
    # permanently fed (no arrival simulation: the number is the pool's
    # steady-state ceiling, not a workload draw); per-step wall times,
    # median. Includes the host render + byte assembly (pipelined one
    # chunk deep), so it is the e2e serving number ON THIS RIG — tunnel
    # weather applies, hence median-of-steps.
    t_serving = None
    serving_audio = None
    serving_detail = {}
    if os.environ.get("BENCH_SERVING", "1") != "0":
        try:
            from swiftmp3_tpu.parallel import StreamPool

            lanes = int(os.environ.get("BENCH_LANES", "64"))
            fps = int(os.environ.get("BENCH_POOL_FRAMES", "32"))
            pool = StreamPool(options, lanes=lanes, frames_per_step=fps)
            srng = np.random.default_rng(7)
            feed_n = fps * 1152 * options.channels
            sids = [pool.submit() for _ in range(lanes)]
            serve_steps = int(os.environ.get("BENCH_POOL_STEPS", "10"))
            # pre-synthesize unique int16 feeds (tunnel dedup)
            feeds = [
                [
                    (srng.standard_normal(feed_n) * 4000).astype(np.int16)
                    for _ in range(lanes)
                ]
                for _ in range(serve_steps + 2)
            ]
            for sid in sids:
                pool.feed(sid, feeds[0][sid % lanes])
            pool.step()  # warmup (compile shared with e2e config if equal)
            serve_times = []
            for k in range(serve_steps):
                for sid in sids:
                    pool.feed(sid, feeds[k + 1][sid % lanes])
                t0 = time.perf_counter()
                pool.step()
                serve_times.append(time.perf_counter() - t0)
            t_serving = float(np.median(serve_times))
            serving_audio = lanes * fps * 1152 / options.sample_rate

            # Attribution at the pool's own (lanes, fps) configuration —
            # a serving regression must be distinguishable from tunnel
            # weather (VERDICT r4 weak-point 1). The pipelined step wall
            # time is bounded below by max(upload, device compute, host
            # render) + dispatch; measure each component:
            #   compute — chained pool.enc._run over resident inputs
            #   upload  — unique-content int16 device_put, forced
            #   render  — pool.enc.drain of a ready chunk (1-core host)
            sp_pcm = np.zeros((lanes, fps, n), dtype=np.int16)
            for lane in range(lanes):
                sp_pcm[lane] = (
                    feeds[-1][lane].reshape(fps, n)
                )
            sp_fin = np.zeros((lanes, fps), dtype=bool)
            sp_val = np.ones((lanes, fps), dtype=bool)
            sp_pcm_d = jax.device_put(sp_pcm)
            sp_fin_d = jax.device_put(sp_fin)
            sp_val_d = jax.device_put(sp_val)
            jax.block_until_ready((sp_pcm_d, sp_fin_d, sp_val_d))
            c = pool.enc.carry
            c, _ = pool.enc._run(c, sp_pcm_d, sp_fin_d, sp_val_d)  # warm
            t0 = time.perf_counter()
            last = None
            for _ in range(4):
                c, last = pool.enc._run(c, sp_pcm_d, sp_fin_d, sp_val_d)
            jax.block_until_ready(last)
            sp_comp = (time.perf_counter() - t0) / 4
            up_times = []
            for k in range(3):
                buf = np.stack(
                    [f.reshape(fps, n) for f in feeds[k]]
                ).astype(np.int16)
                t0 = time.perf_counter()
                jax.block_until_ready(jax.device_put(buf))
                up_times.append(time.perf_counter() - t0)
            sp_up = float(np.median(up_times))
            outs_r = pool.enc._run(pool.enc.carry, sp_pcm_d, sp_fin_d, sp_val_d)[1]
            jax.block_until_ready(outs_r)
            t0 = time.perf_counter()
            pool.enc.drain(outs_r, sp_val)
            sp_render = time.perf_counter() - t0
            pool.shutdown()
            bound = max(
                ("device_compute", sp_comp),
                ("tunnel_upload", sp_up),
                ("host_render", sp_render),
                key=lambda kv: kv[1],
            )[0]
            serving_detail = {
                "serving_ms_median": round(t_serving * 1e3, 1),
                "serving_ms_min": round(min(serve_times) * 1e3, 1),
                "serving_ms_max": round(max(serve_times) * 1e3, 1),
                "serving_n": len(serve_times),
                "serving_compute_ms": round(sp_comp * 1e3, 1),
                "serving_upload_ms": round(sp_up * 1e3, 1),
                "serving_render_ms": round(sp_render * 1e3, 1),
                "serving_bound": bound,
            }
        except Exception as e:  # never let the serving extra sink the bench
            print(f"serving bench failed: {e!r}", file=sys.stderr)
            t_serving = None
            serving_detail = {}

    # ---- informational: host render alone (data already local)
    from swiftmp3_tpu.models.pipeline import fetch_outputs

    fetched_outs = enc._run(enc.carry, pcm_d[0], fin_d, val_d)[1]
    _ = fetch_outputs(fetched_outs, options)  # force download outside timer
    t0 = time.perf_counter()
    enc.drain(fetched_outs, valid)
    t_render = time.perf_counter() - t0

    rt_e2e = audio_seconds / t_e2e
    rt_comp = audio_seconds / t_comp
    mb_up = pcms[0].nbytes / 1e6
    print(
        f"device compute (chained, resident unique inputs, median): "
        f"{rt_comp:.0f}x realtime ({t_comp*1e3:.1f} ms/step); e2e through the "
        f"dev tunnel (median of {n_iter} unique-content iters): {rt_e2e:.0f}x "
        f"({t_e2e*1e3:.1f} ms/step, {mb_up:.1f} MB PCM upload/step binds it); "
        f"host render+fetch: {t_render*1e3:.1f} ms/step (overlapped); "
        f"B={B} T={T}"
        + (
            f"; hq (strict+linbits) compute: {audio_seconds / t_strict:.0f}x "
            f"({t_strict*1e3:.1f} ms/step)"
            if t_strict
            else ""
        )
        + (
            f"; serving (StreamPool, saturated): "
            f"{serving_audio / t_serving:.0f}x ({t_serving*1e3:.1f} ms/step, "
            f"min {serving_detail.get('serving_ms_min')} / max "
            f"{serving_detail.get('serving_ms_max')} ms over "
            f"{serving_detail.get('serving_n')} steps; components "
            f"compute {serving_detail.get('serving_compute_ms')} / upload "
            f"{serving_detail.get('serving_upload_ms')} / render "
            f"{serving_detail.get('serving_render_ms')} ms -> bound: "
            f"{serving_detail.get('serving_bound')})"
            if t_serving
            else ""
        ),
        file=sys.stderr,
    )
    print(
        f"per-iter e2e ms: {[round(t*1e3) for t in e2e_times]}; "
        f"per-rep compute ms: {[round(t*1e3, 1) for t in comp_times]}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "audio_seconds_per_second_per_chip_128kbps_cbr_stereo",
                "value": round(rt_comp, 1),
                "unit": "x realtime",
                "vs_baseline": round(rt_comp / 1000.0, 3),
                "e2e_tunnel_x_realtime": round(rt_e2e, 1),
                "device_compute_ms_per_step": round(t_comp * 1e3, 2),
                **(
                    {
                        "hq_strict_x_realtime": round(audio_seconds / t_strict, 1),
                        "hq_strict_ms_per_step": round(t_strict * 1e3, 2),
                    }
                    if t_strict
                    else {}
                ),
                **(
                    {
                        "serving_x_realtime": round(serving_audio / t_serving, 1),
                        "serving_ms_per_step": round(t_serving * 1e3, 2),
                        **serving_detail,
                    }
                    if t_serving
                    else {}
                ),
                "note": "headline = per-chip compute (north-star metric; a "
                "PCIe production host sees this e2e). e2e_tunnel is this dev "
                "rig's end-to-end through its ~20-45 MB/s host<->TPU tunnel "
                f"({mb_up:.1f} MB PCM per {audio_seconds:.0f} s-audio step; "
                "transport-bound)",
            }
        )
    )


if __name__ == "__main__":
    main()
