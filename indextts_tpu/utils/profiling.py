"""Tracing / profiling utilities.

The reference only has ad-hoc wall-clock stage timers and an RTF printout
(SURVEY.md §5.1). Here those stage timers are kept (pipeline prints) and real
tracing is added: `jax.profiler` traces viewable in TensorBoard/Perfetto and a
simple scoped stage-timer registry for programmatic access.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class StageTimers:
    """Accumulating named wall-clock timers (the reference's gpt_gen_time /
    s2mel_time / bigvgan_time pattern, `infer_v2.py:538-541`)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        return "\n".join(f">> {k}: {v:.2f} seconds" for k, v in self.totals.items())

    def reset(self):
        self.totals.clear()


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace scope; writes a TensorBoard/Perfetto trace.

    Usage:
        with profiling.trace("/tmp/tts_trace"):
            tts.infer(...)
    """
    import jax

    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up in the profiler timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
