"""Runtime setup shared by entry points."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    """Persistent XLA compilation cache (huge win when compiles go through
    a remote-compile tunnel; also speeds repeat CPU runs). Opt out with
    MMVAE_TPU_NO_COMPILE_CACHE=1."""
    register_stall_diagnostics()
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
    _install_cache_read_watchdog()


def register_stall_diagnostics():
    """`kill -USR1 <pid>` dumps all Python stacks — the tunnel-stall
    debugging hook (no-op if signals are unavailable, e.g. subthreads)."""
    try:
        import faulthandler
        import signal

        faulthandler.register(signal.SIGUSR1)
    except (ImportError, AttributeError, ValueError):
        pass


def _install_cache_read_watchdog(timeout_s: float | None = None):
    """Bound persistent-cache executable deserialization with a timeout.

    The axon remote backend's `deserialize_executable` RPC hangs
    indefinitely for some cached executables (observed via SIGUSR1 stack
    dumps: inception forward, trimodal JNF train step). jax's `_cache_read`
    already treats exceptions as a cache miss, so raising TimeoutError from
    a watchdog thread degrades gracefully to a fresh compile. Tune with
    MMVAE_TPU_CACHE_READ_TIMEOUT (seconds; 0 disables the watchdog)."""
    timeout_s = timeout_s if timeout_s is not None else float(
        os.environ.get("MMVAE_TPU_CACHE_READ_TIMEOUT", "90"))
    if not timeout_s:
        return
    from jax._src import compilation_cache as cc

    if getattr(cc, "_mmvae_tpu_watchdog", None):
        return
    orig = cc.get_executable_and_time

    def get_executable_and_time_with_timeout(*args, **kwargs):
        import concurrent.futures

        pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="cache-read")
        fut = pool.submit(orig, *args, **kwargs)
        try:
            return fut.result(timeout=timeout_s)
        except concurrent.futures.TimeoutError:
            raise TimeoutError(
                f"persistent-cache executable deserialize exceeded "
                f"{timeout_s:.0f}s (axon deserialize hang) — recompiling")
        finally:
            pool.shutdown(wait=False)

    cc.get_executable_and_time = get_executable_and_time_with_timeout
    cc._mmvae_tpu_watchdog = True
