"""Persistent XLA compilation cache for cross-process reuse.

The reference keeps an in-process FFT plan cache (``POCKETFFT_CACHE_SIZE``,
``Source.cpp:4-5``) so repeated transforms of one size are planned once.
The XLA analog is heavier: every distinct (shape, sigma, engine) tuple is
a compiled program costing 5-30 s, and a CLI invocation is a fresh process
— without a disk cache each run pays the full compile. JAX's persistent
compilation cache writes serialized executables keyed by the program
fingerprint, so repeat CLI runs (and fresh pipeline processes) load in
milliseconds instead.

Opt-out with ``BLUR_TPU_NO_COMPILE_CACHE=1``; redirect with
``JAX_COMPILATION_CACHE_DIR`` (the standard JAX env var) or the explicit
``cache_dir`` argument.
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_cache"]

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "blur_algorithms_tpu", "xla_cache"
)


def enable_persistent_cache(
    cache_dir: str | None = None, min_compile_secs: float = 1.0
) -> str | None:
    """Point JAX's persistent compilation cache at a writable directory.

    Returns the directory in use, or None when disabled (env opt-out) or
    unavailable (read-only filesystem, old jax). Programs compiling faster
    than ``min_compile_secs`` are not persisted — they recompile faster
    than a disk round trip.

    Call this BEFORE the first compile: jax binds its cache singleton to
    the first directory used and ignores later ``cache_dir`` changes for
    the life of the process (``jax._src.compilation_cache._get_cache``).
    """
    # affirmative opt-out only: =1/true disables, =0/"" does not
    if os.environ.get("BLUR_TPU_NO_COMPILE_CACHE", "").lower() not in (
        "", "0", "false",
    ):
        return None
    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", _DEFAULT_DIR
    )
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        # thresholds first: if any knob is missing (older jax) we bail
        # before the cache dir is set, so "return None" == cache disabled
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except (OSError, AttributeError):  # unwritable dir / jax without the knob
        return None
    return cache_dir
