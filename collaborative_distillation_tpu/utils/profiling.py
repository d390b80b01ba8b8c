"""Profiling hooks: jax.profiler traces + simple timers.

The reference's only instrumentation is wall-clock prints (WCT.py:118,
main.py:115-119) and commented-out CUDA memory probes (WCT.py:134-135). Here:

* :func:`trace` — context manager writing a TensorBoard-loadable profiler
  trace (open with ``tensorboard --logdir`` or xprof) covering device
  execution, HLO names and memory;
* :class:`StepTimer` — EMA step timer with percentile reporting.
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(logdir: str | None):
    """Profile the enclosed block to ``logdir`` (no-op when logdir is falsy)."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.samples: list[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.samples.append(time.time() - self._t0)

    def report(self) -> str:
        if not self.samples:
            return "no samples"
        s = sorted(self.samples)
        n = len(s)
        return (f"n={n} mean={sum(s)/n*1000:.1f}ms "
                f"p50={s[n//2]*1000:.1f}ms p95={s[min(n-1, int(n*0.95))]*1000:.1f}ms "
                f"min={s[0]*1000:.1f}ms")
