"""Profiling & phase timing.

The reference's observability is a started-but-never-reported tracemalloc
(__main__.py:1158) and ad-hoc CUDA memory prints (SURVEY.md §5.1). Here
profiling is first-class:

* ``PhaseTimer`` — wall-clock (+ device memory) accounting per pipeline
  phase, printed as a table and saved to JSON next to the outputs.
* ``trace`` — context manager around jax.profiler.trace producing a
  TensorBoard/XProf trace directory when ``--profile`` is set.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Dict, Optional


class PhaseTimer:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.phases: Dict[str, dict] = {}

    @contextmanager
    def phase(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        mem0 = self._device_mem()
        try:
            yield
        finally:
            self.phases[name] = {
                "seconds": round(time.perf_counter() - t0, 3),
                "device_bytes_delta": self._device_mem() - mem0,
            }

    @staticmethod
    def _device_mem() -> int:
        try:
            import jax

            stats = jax.devices()[0].memory_stats() or {}
            return int(stats.get("bytes_in_use", 0))
        except Exception:
            return 0

    def report(self, path: Optional[str] = None) -> None:
        if not self.enabled or not self.phases:
            return
        total = sum(p["seconds"] for p in self.phases.values())
        print("\n[PROFILE] phase timings:")
        for name, p in self.phases.items():
            pct = 100.0 * p["seconds"] / total if total else 0.0
            print(
                f"[PROFILE]   {name:<28} {p['seconds']:>9.3f}s  ({pct:4.1f}%)"
                f"  mem +{p['device_bytes_delta'] / 1e6:.1f}MB"
            )
        print(f"[PROFILE]   {'total':<28} {total:>9.3f}s")
        if path:
            with open(path, "w") as fh:
                json.dump(self.phases, fh, indent=2)
            print(f"[PROFILE] wrote {path}")


@contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler device trace (view with TensorBoard / xprof)."""
    if not logdir:
        yield
        return
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"[PROFILE] device trace written to {logdir}")
