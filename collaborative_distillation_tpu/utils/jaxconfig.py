"""Process-wide JAX configuration: the persistent XLA compilation cache.

The UHD cascade's first compile costs 40-140 s through the remote-compile
tunnel (BENCH_r02: 71.7 s compile+first-run), per process, per shape — the
reference pays an analogous construction cost building all 10 models up
front (PytorchWCT/WCT.py:97). XLA's persistent compilation cache removes
that for every process after the first: measured on this container's axon
backend, a 6.8 s conv-stack compile replays in 0.15 s from a warm cache.

``enable_persistent_cache()`` is idempotent and called by every entry point
that compiles (WCTEngine, the trainer, bench, the graft entry), so users of
the library get it for free. Env knobs:

  CD_TPU_COMPILATION_CACHE_DIR  cache directory; "0"/"off" disables.
                                Default: ~/.cache/collaborative_distillation_tpu/xla
"""

from __future__ import annotations

import os
import threading

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "collaborative_distillation_tpu", "xla")

_lock = threading.Lock()
_configured: str | None = None
_done = False


def enable_persistent_cache() -> str | None:
    """Point JAX at the on-disk compilation cache (idempotent, thread-safe).

    Returns the cache directory in use, or None when disabled (env knob set
    to "0"/"off", or the directory cannot be created). Safe to call after
    backend initialization — the cache is consulted at compile time.
    """
    global _configured, _done
    if _done:
        return _configured
    with _lock:
        if _done:
            return _configured
        raw = os.environ.get("CD_TPU_COMPILATION_CACHE_DIR", _DEFAULT_DIR)
        if raw.strip().lower() in ("", "0", "off", "none"):
            _done = True
            return None
        try:
            os.makedirs(raw, exist_ok=True)
            import jax
            jax.config.update("jax_compilation_cache_dir", raw)
            # persist everything above 0.2 s: on this backend even "small"
            # programs (style stats, u8 converters) cost ~1 s each through
            # the remote-compile tunnel, and a cold UHD start runs a dozen
            # of them; disk replay is ~10 ms apiece
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
            _configured = raw
        except Exception:  # noqa: BLE001 — the cache is an optimization only
            _configured = None
        _done = True
        return _configured
