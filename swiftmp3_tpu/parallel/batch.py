"""Batched multi-stream encoding: the TPU throughput path.

`BatchEncoder` encodes B independent streams in lockstep: PCM is reshaped to
[T, B, frame] and scanned over T on device (batch axis sharded over the
mesh), then each stream's fixed-shape outputs are rendered to bytes by a
per-stream host assembler. Streams of unequal length are handled with
per-(t, b) valid/final masks that freeze the carry and reproduce single-
session semantics exactly (including the zero-padded `isFinal` frame for a
trailing partial frame and the delayed-frame flush).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import numpy as np

from ..io.framing import FrameAssembler
from ..models.pipeline import (
    frame_results_from_outputs,
    init_carry,
    make_chunk_encoder,
)
from ..options import MP3EncoderOptions, SAMPLES_PER_FRAME
from .mesh import carry_sharding, make_mesh, time_major_sharding


class BatchEncoder:
    """Encode a fixed-size batch of streams with one compiled scan program."""

    def __init__(
        self,
        options: MP3EncoderOptions,
        batch: int,
        frames_per_step: int = 64,
        mesh=None,
    ):
        self.options = options
        self.batch = batch
        self.frames_per_step = frames_per_step
        self.mesh = mesh
        self._run = make_chunk_encoder(options, frames_per_step)
        carry = init_carry(batch, options)
        if mesh is not None:
            sh = carry_sharding(mesh)
            carry = jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), carry)
        self.carry = carry
        self.assemblers = [FrameAssembler(options) for _ in range(batch)]
        self._xm = time_major_sharding(mesh) if mesh is not None else None

    def _put(self, arr):
        if self._xm is None:
            return arr
        return jax.device_put(arr, self._xm)

    def step(self, pcm: np.ndarray, final: np.ndarray, valid: np.ndarray):
        """Run one device scan chunk. pcm: [T, B, 1152*ch]; final/valid:
        [T, B]. Returns stacked outputs (device arrays)."""
        self.carry, outs = self._run(
            self.carry, self._put(pcm), self._put(final), self._put(valid)
        )
        return outs

    def drain(self, outs, valid: np.ndarray) -> List[bytes]:
        """Render one chunk's outputs to bytes per stream."""
        outs = jax.tree_util.tree_map(np.asarray, outs)
        T, B = valid.shape
        emitted = [bytearray() for _ in range(B)]
        for t in range(T):
            for b in range(B):
                if not valid[t, b]:
                    continue
                fr = frame_results_from_outputs(outs, self.options, t, b)
                emitted[b] += self.assemblers[b].push(fr)
        return [bytes(e) for e in emitted]

    def flush(self) -> List[bytes]:
        return [a.flush_buffered() for a in self.assemblers]


def encode_batch(
    options: MP3EncoderOptions,
    streams: Sequence[np.ndarray],
    frames_per_step: int = 64,
    mesh=None,
    use_mesh: bool = False,
) -> List[bytes]:
    """Encode N independent PCM streams; returns MP3 bytes per stream.

    Equivalent to running one EncoderSession per stream (encode + flush),
    but batched on device. Streams may have different lengths.
    """
    if use_mesh and mesh is None:
        mesh = make_mesh()
    n_streams = len(streams)
    ch = options.channels
    frame_len = SAMPLES_PER_FRAME * ch

    # Pad the batch to the mesh size if sharded.
    B = n_streams
    if mesh is not None:
        n_dev = mesh.devices.size
        B = ((n_streams + n_dev - 1) // n_dev) * n_dev

    lengths = [len(s) for s in streams]
    n_full = [l // frame_len for l in lengths]
    rem = [l % frame_len for l in lengths]
    n_frames = [f + (1 if r else 0) for f, r in zip(n_full, rem)]
    T_total = max(n_frames) if n_frames else 0

    enc = BatchEncoder(options, B, frames_per_step, mesh)
    out = [bytearray() for _ in range(n_streams)]

    Tc = frames_per_step
    for start in range(0, max(T_total, 1), Tc):
        count = min(Tc, T_total - start)
        if count <= 0:
            break
        pcm = np.zeros((Tc, B, frame_len), dtype=np.float32)
        final = np.zeros((Tc, B), dtype=bool)
        valid = np.zeros((Tc, B), dtype=bool)
        for b in range(n_streams):
            for tt in range(count):
                t = start + tt
                if t >= n_frames[b]:
                    continue
                valid[tt, b] = True
                lo = t * frame_len
                hi = min(lo + frame_len, lengths[b])
                pcm[tt, b, : hi - lo] = streams[b][lo:hi]
                if t == n_frames[b] - 1 and rem[b]:
                    final[tt, b] = True
        outs = enc.step(pcm, final, valid)
        chunk_bytes = enc.drain(outs, valid)
        for b in range(n_streams):
            out[b] += chunk_bytes[b]

    for b, tail in enumerate(enc.flush()):
        if b < n_streams:
            out[b] += tail
    return [bytes(o) for o in out]
