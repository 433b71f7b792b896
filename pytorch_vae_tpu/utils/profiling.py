"""Tracing / profiling hooks.

The reference had no formal profiler — only wall-clock accounting
(run.py:213-221, summary.json timing_sec; SURVEY.md §5). The TPU build
adds proper `jax.profiler` traces (viewable in TensorBoard / Perfetto)
behind a flag, plus a phase timer that reproduces the reference's
timing_sec JSON schema.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when trace_dir is set, no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir, create_perfetto_trace=True):
        yield
    print(f"[profile] trace written to {trace_dir}")


class phase_timer:
    """Accumulates phase durations into a timing_sec-style dict.

    usage:
        t = phase_timer()
        with t("ot"): ...
        with t("decode_filter"): ...
        t.summary()  # {"ot": ..., "decode_filter": ..., "total": ...}
    """

    def __init__(self) -> None:
        self.phases: Dict[str, float] = {}
        self._t0 = time.time()

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        start = time.time()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + (
                time.time() - start)

    def summary(self) -> Dict[str, float]:
        return {**self.phases, "total": time.time() - self._t0}
