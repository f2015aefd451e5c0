"""Stage timing + optional device profiling.

Counterpart of the reference's colmap::Timer-around-each-stage pattern
(global_mapper.cc:32-38) plus the TPU-native upgrades SURVEY.md §5 calls
for: a stage registry that records wall-clock per pipeline stage, and an
optional jax.profiler trace context (set GLOMAP_TPU_TRACE_DIR to capture
a TensorBoard-readable device trace of any stage).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

logger = logging.getLogger(__name__)


class StageTimer:
    """Collects named stage durations; printable summary."""

    def __init__(self):
        self.stages = []  # (name, seconds)
        self._t0 = time.time()

    @contextlib.contextmanager
    def stage(self, name: str):
        trace_dir = os.environ.get("GLOMAP_TPU_TRACE_DIR")
        ctx = contextlib.nullcontext()
        if trace_dir:
            import jax
            ctx = jax.profiler.trace(os.path.join(trace_dir, name))
        start = time.time()
        logger.info("[%7.1fs] ------ %s ------", start - self._t0, name)
        with ctx:
            yield
        dt = time.time() - start
        self.stages.append((name, dt))
        logger.info("[%7.1fs] ------ %s done in %.2fs ------",
                    time.time() - self._t0, name, dt)

    def summary(self) -> str:
        total = sum(s for _, s in self.stages)
        lines = [f"{n:<28s} {s:8.2f}s  {100 * s / max(total, 1e-9):5.1f}%"
                 for n, s in self.stages]
        lines.append(f"{'total':<28s} {total:8.2f}s")
        return "\n".join(lines)
