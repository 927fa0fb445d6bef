"""Stage tracing / profiling utility.

The reference sprinkles ad-hoc wall timers at every stage gated by debug
macros (reference `include/Frame360.h:303-307`, `RegisterPhotoICP.h:4522`,
SURVEY.md section 5.1).  Here the same stage taxonomy (load / undistort /
stitch / cloud / segment / register / optimize) is first-class: a
`StageTimer` collects wall times per named region and can wrap regions in
`jax.profiler.TraceAnnotation` so stages show up in TPU profiler traces;
`jax.profiler.start_trace` capture is exposed via `trace_to`.

Note on async dispatch: JAX execution is asynchronous — by default a region
measures *dispatch* time unless `sync=True`, which blocks on the region's
outputs (pass them to `region(..., outputs=...)` or call `timer.sync()`).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulates wall time per named stage.

    with timer.region("stitch"):
        out = stitch(...)
    print(timer.report())
    """

    def __init__(self, sync: bool = False):
        self.sync = sync
        self.times = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def region(self, name: str, outputs=None):
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            yield
            if self.sync and outputs is not None:
                jax.block_until_ready(outputs)
            self.times[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def add(self, name: str, seconds: float):
        self.times[name] += seconds
        self.counts[name] += 1

    def report(self) -> str:
        rows = ["stage                   total ms   calls   ms/call"]
        for name in sorted(self.times, key=lambda n: -self.times[n]):
            t = self.times[name] * 1000
            c = self.counts[name]
            rows.append(f"{name:<22} {t:9.2f} {c:7d} {t / max(c, 1):9.2f}")
        return "\n".join(rows)

    def reset(self):
        self.times.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture a TPU profiler trace for the enclosed region (view with
    TensorBoard or xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
