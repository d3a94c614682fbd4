"""The frame-encode pipeline: carry pytree + jittable per-frame step + scan.

Architecture (SURVEY.md §7): the time axis is a `lax.scan` over frames — MP3
state (filterbank history, MDCT overlap, bit reservoir counters, padding
accumulator, VBR history) is a strict serial chain per stream — while the
batch axis holds independent streams and is sharded over chips. The host
receives fixed-shape integer/spectra outputs per frame and renders bytes
(swiftmp3_tpu.io.framing).

Carry layout (per stream):
    fb_hist   [B, ch, 480]  f32  trailing PCM for the polyphase filterbank
    overlap   [B, ch, 32, 18] f32  MDCT overlap (post frequency-inversion)
    stream_len [B] i32  reservoir byte-stream length mirror
    avail      [B] i32  reservoir borrowing counter (MP3Encoder.swift:2096)
    pad_rem    [B] i32  Bresenham padding accumulator (MP3Encoder.swift:456)
    prev_slot  [B] i32  buffered frame's slot size (one-frame delay)
    has_buffered [B] bool
    vbr_ehist  [B, 10] f32  granule energy history (MP3Encoder.swift:1144)
    vbr_count  [B] i32
"""

from __future__ import annotations

import math
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..io.framing import FrameResult
from ..io.sideinfo import GranuleInfo
from ..options import MP3EncoderOptions, Mode, SAMPLES_PER_FRAME
from ..tables import bitrate_index, bitrate_value
from ..ops import dsp


def init_carry(batch: int, options: MP3EncoderOptions):
    ch = options.channels
    return {
        "fb_hist": jnp.zeros((batch, ch, 480), dtype=jnp.float32),
        "overlap": jnp.zeros((batch, ch, 32, 18), dtype=jnp.float32),
        "stream_len": jnp.zeros(batch, dtype=jnp.int32),
        "avail": jnp.zeros(batch, dtype=jnp.int32),
        "pad_rem": jnp.zeros(batch, dtype=jnp.int32),
        "prev_slot": jnp.zeros(batch, dtype=jnp.int32),
        "has_buffered": jnp.zeros(batch, dtype=bool),
        "vbr_ehist": jnp.zeros((batch, 10), dtype=jnp.float32),
        "vbr_count": jnp.zeros(batch, dtype=jnp.int32),
    }


def make_frame_step(options: MP3EncoderOptions):
    """Build the per-frame step function (carry, inputs) -> (carry, outputs).

    inputs: {"pcm": [B, 1152*ch] f32, "final": [B] bool, "valid": [B] bool}.
    Invalid frames leave the carry untouched (used to run fixed-shape scans
    over partially-filled chunks).
    """
    sr = options.sample_rate
    ch = options.channels
    n_gran = 2 * ch
    side_size = 17 if ch == 1 else 32
    crc_size = 2 if options.crc_protected else 0
    is_vbr = options.vbr
    base_kbps = options.bitrate_kbps
    quality = options.quality
    mode = options.mode
    cbr_index = bitrate_index(base_kbps, sr)
    cbr_value = bitrate_value(cbr_index)

    def step(carry, inp):
        pcm = inp["pcm"].astype(jnp.float32)  # [B, 1152*ch]
        final = inp["final"]
        valid = inp["valid"]
        B = pcm.shape[0]

        # --- Bitrate (VBR) + frame sizing + padding ---
        if is_vbr:
            frame_e = dsp.mean_square(pcm)
            target = dsp.vbr_choose_bitrate(
                frame_e, carry["vbr_ehist"], carry["vbr_count"], base_kbps, quality
            )
            br_idx = dsp.bitrate_index_device(target, sr)
            br_val = dsp.bitrate_value_device(br_idx)
        else:
            br_idx = jnp.full(B, cbr_index, dtype=jnp.int32)
            br_val = jnp.full(B, cbr_value, dtype=jnp.int32)

        numerator = 144 * br_val * 1000
        base_size = numerator // sr
        remainder = numerator % sr
        pad_acc = carry["pad_rem"] + remainder
        padding = (pad_acc >= sr).astype(jnp.int32)
        pad_rem = pad_acc - padding * sr
        frame_size = base_size + padding
        main_data_size = frame_size - 4 - crc_size - side_size

        # --- Reservoir snapshot + bit budget ---
        mdb = jnp.where(final, 0, jnp.minimum(carry["stream_len"], 511))
        res_bits = jnp.where(final, 0, carry["avail"] * 8)
        usable = (res_bits * 9) // 10
        total_bits = main_data_size * 8 + usable
        bits_per_granule = total_bits // n_gran

        # --- Deinterleave + stereo decision ---
        if ch == 1:
            chans = pcm[:, None, :]  # [B, 1, 1152]
        else:
            left = pcm[:, 0::2]
            right = pcm[:, 1::2]
            if mode is Mode.JOINT_STEREO:
                _use_ms, c0, c1 = dsp.stereo_decide(left, right)
            else:
                c0, c1 = left, right
            chans = jnp.stack([c0, c1], axis=1)  # [B, 2, 1152]

        granule_pcm = chans.reshape(B, ch, 2, 576)

        # --- Granule DSP (both granules batched) ---
        S, fb_hist = dsp.polyphase_frame(carry["fb_hist"], chans)  # [B,ch,36,32]
        block, sb_gain = dsp.transient_frame(granule_pcm)  # [B,ch,2], [B,ch,2,3]
        spectra, overlap = dsp.mdct_frame(S, carry["overlap"], block)  # [B,ch,2,576]

        g0 = dsp.initial_gain(spectra)  # [B,ch,2]
        max_bits = jnp.broadcast_to(bits_per_granule[:, None, None], g0.shape)
        gain, quantized, part23, big_values = dsp.rate_loop(spectra, g0, max_bits)
        pre = dsp.preflag(spectra)
        region0, region1 = dsp.region_counts(big_values, sr)

        # --- Reservoir mirror update (MP3Encoder.swift:511, 549, 565) ---
        total_used = jnp.sum(part23.reshape(B, -1), axis=-1)
        huffman_bytes = (total_used + 7) // 8
        stream_len = carry["stream_len"] + huffman_bytes
        stream_len = jnp.where(
            carry["has_buffered"],
            jnp.maximum(stream_len - carry["prev_slot"], 0),
            stream_len,
        )
        avail = jnp.clip(carry["avail"] + main_data_size - huffman_bytes, 0, 511)

        # --- VBR energy history push (granule-major order) ---
        granule_e = dsp.mean_square(granule_pcm)  # [B, ch, 2]
        push = jnp.swapaxes(granule_e, 1, 2).reshape(B, n_gran)
        vbr_ehist = jnp.concatenate([carry["vbr_ehist"][:, n_gran:], push], axis=1)
        vbr_count = jnp.minimum(carry["vbr_count"] + n_gran, 10)

        new_carry = {
            "fb_hist": fb_hist,
            "overlap": overlap,
            "stream_len": stream_len,
            "avail": avail,
            "pad_rem": pad_rem,
            "prev_slot": main_data_size,
            "has_buffered": jnp.ones_like(carry["has_buffered"]),
            "vbr_ehist": vbr_ehist,
            "vbr_count": vbr_count,
        }
        # Masked (invalid) lanes keep their old state.
        def keep(new, old):
            v = valid.reshape((B,) + (1,) * (new.ndim - 1))
            return jnp.where(v, new, old)

        merged = jax.tree_util.tree_map(keep, new_carry, carry)

        def gm(x):  # [B, ch, 2, ...] -> granule-major [B, 2*ch, ...]
            return jnp.swapaxes(x, 1, 2).reshape((B, n_gran) + x.shape[3:])

        outputs = {
            "bitrate_index": br_idx,
            "padding": padding,
            "mdb": mdb,
            "slot": main_data_size,
            "quantized": gm(quantized).astype(jnp.int8),
            "big_values": gm(big_values),
            "part23": gm(part23),
            "gain": gm(gain),
            "block_type": gm(block),
            "subblock_gain": gm(sb_gain),
            "preflag": gm(pre),
            "region0": gm(region0),
            "region1": gm(region1),
        }
        return merged, outputs

    return step


def make_chunk_encoder(options: MP3EncoderOptions, chunk: int):
    """jit-compiled scan over a fixed-size chunk of frames."""
    step = make_frame_step(options)

    @jax.jit
    def run(carry, pcm, final, valid):
        # pcm: [T, B, n], final/valid: [T, B]
        return jax.lax.scan(
            lambda c, x: step(c, {"pcm": x[0], "final": x[1], "valid": x[2]}),
            carry,
            (pcm, final, valid),
        )

    return run


def frame_results_from_outputs(
    outs: dict, options: MP3EncoderOptions, t: int, b: int
) -> FrameResult:
    """Convert one (time, batch) slice of stacked scan outputs to a
    FrameResult for the host assembler."""
    ch = options.channels
    n_gran = 2 * ch
    granules = [[None] * ch for _ in range(2)]
    for g in range(n_gran):
        gr, c = divmod(g, ch)
        block = int(outs["block_type"][t, b, g])
        granules[gr][c] = GranuleInfo(
            part23_length=int(outs["part23"][t, b, g]),
            big_values=int(outs["big_values"][t, b, g]),
            global_gain=int(outs["gain"][t, b, g]),
            scalefac_compress=0,
            window_switching=0 if block == dsp.BLOCK_LONG else 1,
            block_type=block,
            mixed_block_flag=1 if block == dsp.BLOCK_MIXED else 0,
            table_select=(15, 15, 15),
            subblock_gain=tuple(int(x) for x in outs["subblock_gain"][t, b, g]),
            region0_count=int(outs["region0"][t, b, g]),
            region1_count=int(outs["region1"][t, b, g]),
            preflag=int(outs["preflag"][t, b, g]),
            scalefac_scale=0,
            count1table_select=0,
        )
    return FrameResult(
        bitrate_index=int(outs["bitrate_index"][t, b]),
        padding=int(outs["padding"][t, b]),
        main_data_begin=int(outs["mdb"][t, b]),
        slot_size=int(outs["slot"][t, b]),
        granules=granules,
        quantized=np.asarray(outs["quantized"][t, b], dtype=np.int32),
        big_values=np.asarray(outs["big_values"][t, b], dtype=np.int32),
    )


class TPUBackend:
    """Single-stream session backend: fixed-size jitted chunks of frames.

    Keeps the carry on device between calls; pads partial chunks with
    valid=False lanes so there is exactly one compiled program.
    """

    CHUNK = 8

    def __init__(self, options: MP3EncoderOptions):
        self.options = options
        self._run = make_chunk_encoder(options, self.CHUNK)
        self.carry = init_carry(1, options)

    def encode_frames(self, frames: np.ndarray, is_final: np.ndarray) -> List[FrameResult]:
        n = SAMPLES_PER_FRAME * self.options.channels
        F = len(frames)
        results: List[FrameResult] = []
        for start in range(0, F, self.CHUNK):
            count = min(self.CHUNK, F - start)
            pcm = np.zeros((self.CHUNK, 1, n), dtype=np.float32)
            fin = np.zeros((self.CHUNK, 1), dtype=bool)
            val = np.zeros((self.CHUNK, 1), dtype=bool)
            pcm[:count, 0] = frames[start : start + count]
            fin[:count, 0] = is_final[start : start + count]
            val[:count, 0] = True
            self.carry, outs = self._run(self.carry, pcm, fin, val)
            outs = jax.tree_util.tree_map(np.asarray, outs)
            for t in range(count):
                results.append(frame_results_from_outputs(outs, self.options, t, 0))
        return results

    def notify_flush(self) -> None:
        sl = np.asarray(self.carry["stream_len"]).copy()
        hb = np.asarray(self.carry["has_buffered"]).copy()
        ps = np.asarray(self.carry["prev_slot"]).copy()
        sl = np.where(hb, np.maximum(sl - ps, 0), sl)
        self.carry["stream_len"] = jnp.asarray(sl)
        self.carry["has_buffered"] = jnp.zeros_like(self.carry["has_buffered"])
