"""Persistent kernel-compilation cache (reference: FA4's JIT cache,
flash_attn/cute/cache_utils.py:81-227 JITCache/JITPersistentCache/FileLock).

XLA already fingerprints programs; enabling its on-disk cache gives the
same survive-restart behavior the reference hand-builds, including safe
concurrent access (XLA uses atomic renames — no file locking needed)."""

from __future__ import annotations

import os
from typing import Optional

import jax


def enable_persistent_cache(
    cache_dir: Optional[str] = None,
    min_compile_time_secs: float = 0.0,
):
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "flash_attn_tpu", "xla"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )
    return cache_dir
