"""Utilities: WAV I/O for tests/benchmarks, profiling helpers."""

import os

from .wav import read_wav, write_wav

__all__ = ["enable_compilation_cache", "read_wav", "write_wav"]


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (pipeline programs take
    minutes to compile cold on tunneled TPU runtimes; cached reloads are
    seconds)."""
    import jax

    cache_dir = path or os.environ.get(
        "SWIFTMP3_TPU_CACHE", os.path.expanduser("~/.cache/swiftmp3_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
