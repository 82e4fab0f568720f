"""Profiling / tracing utilities (new design — the reference has none;
SURVEY §5 'Tracing/profiling: none instrumented').

`StageTimer` collects named wall-clock stages with device synchronization;
`profile_trace` wraps jax.profiler for TensorBoard-compatible traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict


class StageTimer:
    """Accumulating stage timer with optional device sync at boundaries."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    def _sync(self):
        if self.sync:
            try:
                import jax

                jax.effects_barrier()
            except Exception:
                pass

    @contextlib.contextmanager
    def stage(self, name: str):
        self._sync()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._sync()
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "calls": self.counts[name],
                "mean_s": self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def summary(self) -> str:
        lines = [f"{'stage':<28} {'calls':>6} {'total (s)':>10} {'mean (ms)':>10}"]
        for name, r in sorted(
            self.report().items(), key=lambda kv: -kv[1]["total_s"]
        ):
            lines.append(
                f"{name:<28} {r['calls']:>6} {r['total_s']:>10.3f} "
                f"{r['mean_s'] * 1e3:>10.1f}"
            )
        return "\n".join(lines)

    def save(self, path: str) -> None:
        Path(path).write_text(json.dumps(self.report(), indent=2))


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/mlis_tpu_trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
