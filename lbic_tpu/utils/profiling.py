"""Profiling utilities.

The reference has no profiler integration — only ptflops FLOPs counts and
time.time() wall-clock logs (SURVEY.md §5; agents/blkbsdimgcomp_agent.py:
591-599, 821-834). Here:

  * `trace(logdir)`: context manager around `jax.profiler.trace` — dumps
    an XPlane trace viewable in TensorBoard/Perfetto, including TPU
    device timelines.
  * `StageTimers`: named wall-clock accumulators with block_until_ready
    semantics, for the per-stage breakdowns that drove the codec
    optimization (scan / phase A / phase B / host packing).
  * `annotate(name)`: `jax.profiler.TraceAnnotation` passthrough so hot
    host-side stages show up inside the trace.
"""

import contextlib
import time
from collections import defaultdict

import jax


trace = jax.profiler.trace  # the library context manager is exactly this


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StageTimers:
    """Accumulate wall time per named stage.

    JAX dispatch is asynchronous, so a stage's device time is only
    captured if something blocks before the context exits. Assign the
    stage's outputs to the yielded holder and they are blocked on in
    the exit path:

        timers = StageTimers()
        with timers("scan") as h:
            h.out = fn(...)          # blocked on at context exit
        print(timers.report())
    """

    class _Holder:
        out = None

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        holder = self._Holder()
        t0 = time.perf_counter()
        try:
            yield holder
        finally:
            if holder.out is not None:
                jax.block_until_ready(holder.out)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        width = max((len(k) for k in self.totals), default=0)
        lines = [f"{k:<{width}}  {self.totals[k]:8.3f}s  x{self.counts[k]}"
                 for k in sorted(self.totals, key=self.totals.get,
                                 reverse=True)]
        return "\n".join(lines)
