"""Utilities: WAV I/O for tests/benchmarks, profiling helpers."""

from .wav import read_wav, write_wav

__all__ = ["read_wav", "write_wav"]
