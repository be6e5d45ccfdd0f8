"""Persistent XLA compilation cache setup.

Compiles through the experimental axon TPU tunnel take minutes for render
programs; the persistent cache makes them one-time per (program, shape)
across processes.  Called by render.py, bench.py and __graft_entry__.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    cache_dir = path or os.environ.get(
        "VISIONARAY_TPU_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags
    return cache_dir
