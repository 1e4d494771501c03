"""Persistent XLA compilation cache setup.

First compiles through the remote TPU compile service are slow (minutes);
the on-disk cache makes warm starts near-instant. Called by the test
conftest, bench.py, train.py and __graft_entry__.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "MOBI_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/mobi_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
