"""Continuous-batching serving layer: streams join and leave a fixed-lane
device batch at any time.

`BatchEncoder` (batch.py) encodes a fixed cohort of streams in lockstep —
right for corpus jobs, wrong for serving, where streams arrive and end
independently. `StreamPool` multiplexes an open-ended set of streams onto
B device lanes:

    pool = StreamPool(options, lanes=8, frames_per_step=4)
    sid = pool.submit()              # open a stream
    pool.feed(sid, pcm_chunk)        # append PCM (any length, any count)
    pool.close(sid)                  # no more PCM
    pool.step()                      # run one device chunk (call in a loop)
    if pool.done(sid):
        data = pool.result(sid)      # the finished MP3 byte stream

Each lane carries one stream's device state (filterbank history, MDCT
overlap, reservoir mirrors — the same carry pytree as a single session);
when a stream's final frame is emitted the lane is reset
(`BatchEncoder.reset_lanes`) and recycled for the next waiting stream.
Lanes with no work run with all-False `valid` masks, which freeze their
carry bit-for-bit (the pipeline's prefix-valid contract).

Byte-exactness: a stream's output is identical to encoding it alone with
`EncoderSession` under the same options and backend float stack — pinned by
tests/test_pool.py against staggered arrivals, mixed lengths, and lane
reuse. The reference has no equivalent (its sessions are one-stream
objects; see SURVEY §5 "long-context streaming").
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from ..options import MP3EncoderOptions, SAMPLES_PER_FRAME
from .batch import BatchEncoder


@dataclass
class _Stream:
    sid: int
    buffer: np.ndarray  # interleaved float32/int16 samples, frame tail kept
    closed: bool = False
    lane: Optional[int] = None
    out: bytearray = field(default_factory=bytearray)
    done: bool = False
    frames: int = 0
    frame_sizes: Optional[List[int]] = None  # snapshot at finish (Xing)


class StreamPool:
    """Continuous batching over a fixed number of device lanes."""

    def __init__(
        self,
        options: MP3EncoderOptions = None,
        lanes: int = 8,
        frames_per_step: int = 4,
        mesh=None,
        use_native: bool | None = None,
    ):
        self.options = options if options is not None else MP3EncoderOptions()
        self.lanes = lanes
        self.T = frames_per_step
        self.enc = BatchEncoder(
            self.options, lanes, frames_per_step=frames_per_step, mesh=mesh,
            use_native=use_native,
        )
        self._streams: Dict[int, _Stream] = {}
        self._lane_owner: List[Optional[int]] = [None] * lanes
        self._waiting: List[int] = []  # sids with no lane yet (FIFO)
        self._next_sid = 0
        self._n = SAMPLES_PER_FRAME * self.options.channels

    # ---- stream lifecycle -------------------------------------------------

    def submit(self) -> int:
        """Open a new stream; returns its id. Feed PCM with feed()."""
        sid = self._next_sid
        self._next_sid += 1
        self._streams[sid] = _Stream(
            sid, np.zeros(0, dtype=np.float32)
        )
        self._waiting.append(sid)
        return sid

    def feed(self, sid: int, pcm) -> None:
        """Append interleaved PCM samples (float in [-1, 1] or int16).
        Non-finite samples are zeroed (EncoderSession parity)."""
        s = self._streams[sid]
        if s.closed:
            raise ValueError(f"stream {sid} is closed")
        arr = np.asarray(pcm)
        if arr.dtype == np.int16:
            arr = arr.astype(np.float32).reshape(-1) / np.float32(32768.0)
        else:
            arr = arr.astype(np.float32).reshape(-1)
        if not np.isfinite(arr).all():
            arr = np.nan_to_num(arr, nan=0.0, posinf=0.0, neginf=0.0)
        s.buffer = np.concatenate([s.buffer, arr])

    def close(self, sid: int) -> None:
        """Mark the stream complete; its tail is zero-padded to a full
        frame and flagged final (EncoderSession flush semantics)."""
        self._streams[sid].closed = True

    def done(self, sid: int) -> bool:
        return self._streams[sid].done

    def result(self, sid: int) -> bytes:
        """The finished MP3 bytes; raises if the stream is not done."""
        s = self._streams[sid]
        if not s.done:
            raise ValueError(f"stream {sid} is not finished")
        return bytes(s.out)

    def frame_count(self, sid: int) -> int:
        return self._streams[sid].frames

    def xing_header(self, sid: int) -> bytes:
        """Xing/Info frame (frame count, byte count, 100-byte seek TOC)
        for a finished stream — prepend it to result() like
        EncoderSession.generate_xing_header()."""
        from ..io.xing import build_xing_header

        s = self._streams[sid]
        if not s.done:
            raise ValueError(f"stream {sid} is not finished")
        sizes = s.frame_sizes or []
        return build_xing_header(self.options, len(sizes), sum(sizes), sizes)

    @property
    def idle(self) -> bool:
        """True when no lane has work and nothing is waiting."""
        return all(o is None for o in self._lane_owner) and not self._waiting

    # ---- scheduling -------------------------------------------------------

    def _assign_lanes(self) -> None:
        for lane in range(self.lanes):
            if self._lane_owner[lane] is not None or not self._waiting:
                continue
            sid = self._waiting.pop(0)
            self._lane_owner[lane] = sid
            self._streams[sid].lane = lane

    def _lane_chunk(self, s: _Stream):
        """(pcm [T, n], final [T], valid [T], consumed, finishing) for one
        lane's next chunk. EncoderSession parity: `final` is raised ONLY on
        a zero-padded partial tail frame (a stream ending exactly on a
        frame boundary encodes its last frame unflagged, like flush());
        an open stream only emits the whole frames it has buffered."""
        T, n = self.T, self._n
        avail_frames = len(s.buffer) // n
        tail = len(s.buffer) - avail_frames * n
        pcm = np.zeros((T, n), dtype=np.float32)
        final = np.zeros(T, dtype=bool)
        valid = np.zeros(T, dtype=bool)
        emit = min(avail_frames, T)
        if emit:
            pcm[:emit] = s.buffer[: emit * n].reshape(emit, n)
            valid[:emit] = True
        consumed = emit * n
        if s.closed and tail and emit == avail_frames and emit < T:
            # the padded isFinal frame (EncoderSession.flush)
            pcm[emit, :tail] = s.buffer[consumed : consumed + tail]
            valid[emit] = True
            final[emit] = True
            consumed += tail
        finishing = s.closed and consumed == len(s.buffer)
        return pcm, final, valid, consumed, finishing

    def step(self) -> None:
        """Assign waiting streams to free lanes, run one device chunk, and
        route rendered bytes to their streams; finished streams free their
        lane (reset + recycle)."""
        self._assign_lanes()
        B, T, n = self.lanes, self.T, self._n
        pcm = np.zeros((B, T, n), dtype=np.float32)
        final = np.zeros((B, T), dtype=bool)
        valid = np.zeros((B, T), dtype=bool)
        consumed = [0] * B
        finishing = [False] * B
        for lane, sid in enumerate(self._lane_owner):
            if sid is None:
                continue
            pcm[lane], final[lane], valid[lane], consumed[lane], finishing[lane] = (
                self._lane_chunk(self._streams[sid])
            )

        rendered = None
        if valid.any():
            outs = self.enc.step(pcm, final, valid)
            rendered = self.enc.drain(outs, valid)

        reset_mask = np.zeros(B, dtype=bool)
        for lane, sid in enumerate(self._lane_owner):
            if sid is None:
                continue
            s = self._streams[sid]
            if rendered is not None:
                s.out += rendered[lane]
                s.frames += int(valid[lane].sum())
                s.buffer = s.buffer[consumed[lane] :]
            if finishing[lane]:
                # the one-frame delay: flush the lane's buffered last frame
                s.out += self._flush_lane(lane)
                s.frame_sizes = list(self._lane_frame_sizes(lane))
                s.done = True
                self._lane_owner[lane] = None
                s.lane = None
                reset_mask[lane] = True
        self.enc.reset_lanes(reset_mask)

    def _lane_frame_sizes(self, lane: int):
        if self.enc.use_native:
            return self.enc.renderers[lane].frame_sizes
        return self.enc.assemblers[lane].frame_sizes

    def _flush_lane(self, lane: int) -> bytes:
        if self.enc.use_native:
            return self.enc.renderers[lane].flush_buffered()
        return self.enc.assemblers[lane].flush_buffered()

    def run_until_idle(self, max_steps: int = 1_000_000) -> None:
        """Convenience: step until every submitted stream is done."""
        for _ in range(max_steps):
            if self.idle:
                return
            self.step()
        raise RuntimeError("run_until_idle: step budget exhausted")
