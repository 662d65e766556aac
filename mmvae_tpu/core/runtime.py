"""Runtime setup shared by entry points."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    """Persistent XLA compilation cache (huge win when compiles go through
    a remote-compile tunnel; also speeds repeat CPU runs). Opt out with
    MMVAE_TPU_NO_COMPILE_CACHE=1."""
    if os.environ.get("MMVAE_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    path = path or os.environ.get(
        "MMVAE_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "mmvae_tpu_jax"),
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
