"""Persistent XLA compilation cache.

Remote compiles on the tunneled TPU backend are the dominant fixed cost of
every entry point (2-14 min for a 544px graph, re-paid by every fresh
process: the backend's server-side cache does NOT reliably hit across
clients — measured 13.5 min for a re-compile of an already-compiled
headline graph under load). JAX's persistent cache serializes the compiled
executable to disk and restores it in any later process: ~2 s for small
graphs (measured 63.6 s -> 2.16 s), but **~113 s for the 544px detect
executable** (deserialize + remote load; still ~5x better than its cold
compile, which exceeds 570 s). Every CLI (train/eval/detect/bench) enables
it before first device use.

The reference has no analog (torch caches kernels in-process only); this is
the TPU-native answer to its "first iteration is slow" warmup note
(/root/reference/train.py:77-81 context).
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), '.jax_cache')


def enable(cache_dir: str | None = None) -> str:
    """Enable the persistent compilation cache (idempotent; honors an
    existing JAX_COMPILATION_CACHE_DIR / YOLACT_COMPILE_CACHE override).
    Call BEFORE the first jit dispatch. Returns the directory used."""
    cache_dir = (cache_dir
                 or os.environ.get('YOLACT_COMPILE_CACHE')
                 or os.environ.get('JAX_COMPILATION_CACHE_DIR')
                 or _DEFAULT_DIR)
    if cache_dir in ('0', 'off', 'none'):
        return cache_dir
    import jax
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    # cache everything that took a real compile; tiny entries are cheap to
    # store and the driver's bench budget is the thing being protected
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    return cache_dir
