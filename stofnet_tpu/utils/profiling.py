"""Profiling / tracing utilities.

The reference's only instrumentation is host wall-clock around the forward
pass (main.py:313-315) and parameter counting by PARSING torchinfo's text
output (main.py:415-417). Here:

- ``count_params``: structural parameter count from the pytree.
- ``flops_estimate``: XLA cost analysis of a jitted function.
- ``trace``: context manager writing a jax.profiler trace viewable in
  TensorBoard/Perfetto.
- ``benchmark_fn``: steady-state timing with explicit host fetch (NB:
  block_until_ready does not synchronize through the axon relay harness —
  see bench.py; fetching a result does).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import numpy as np


def count_params(variables: Any) -> int:
    import jax

    return sum(int(np.prod(np.shape(p))) for p in jax.tree.leaves(variables))


def flops_estimate(fn: Callable, *args) -> Optional[float]:
    """FLOPs from XLA's cost analysis of the lowered computation."""
    import jax

    try:
        analysis = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return None


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def benchmark_fn(fn: Callable, *args, iters: int = 10,
                 warmup: int = 2) -> Dict[str, float]:
    """Times fn(*args) with result fetch; returns ms statistics.

    The fetch flattens pytree outputs and np.asarray's EVERY leaf — a bare
    np.asarray on a dict/tuple output would build a 0-d object array
    without touching any device buffer, timing only async dispatch (on the
    axon relay only host fetches synchronize; see module docstring)."""
    import jax

    def fetch(out):
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf)

    for _ in range(warmup):
        fetch(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    t = np.asarray(times)
    return {"mean_ms": float(t.mean()), "p50_ms": float(np.median(t)),
            "min_ms": float(t.min()), "max_ms": float(t.max())}


class StepTraceProfiler:
    """Trace a window of driver steps into a TensorBoard/Perfetto profile.

    The reference has no profiler at all (SURVEY §5: wall-clock only);
    this wires ``jax.profiler`` into the CLI loops behind two config keys:
    ``profile_dir=DIR`` enables it, ``profile_steps=N`` (default 5) sizes
    the window. The window starts at the SECOND step so the first-step
    jit compile doesn't drown the steady-state timeline, and stops after
    N steps (one window per run; ``close()`` is the safety net when the
    loop ends inside the window).
    """

    def __init__(self, profile_dir: Optional[str], steps: int = 5):
        self.dir = str(profile_dir) if profile_dir else None
        self.n = max(1, int(steps))
        self._seen = 0
        self._active = False

    def step(self) -> None:
        """Call once per driver step (after the step's device work): the
        trace starts after step 1 (the compile step) completes, so the
        window covers steps 2..n+1 exactly as documented."""
        if self.dir is None:
            return
        import jax

        self._seen += 1
        if not self._active and self._seen == 1:
            jax.profiler.start_trace(self.dir)
            self._active = True
        elif self._active and self._seen >= 1 + self.n:
            jax.profiler.stop_trace()
            self._active = False
            self.dir = None  # one window per run

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            self.dir = None
