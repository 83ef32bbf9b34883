"""Minimal scalar writer + profiler hooks (SURVEY §5.1/§5.5 plan).

The reference inherits nerfstudio's event writer (tensorboard/wandb/viewer,
`vis="viewer"` in the configs) and measures throughput inline at eval
(`/root/reference/nerfuncertainty/scripts/eval_uncertainty.py:896-952`).
Here:

  * :class:`ScalarWriter` — append-only JSONL of {step, name, value, wall}
    records + in-memory history; tail-friendly and dependency-free.
  * :func:`profile_trace` — context manager around
    ``jax.profiler.trace`` for capturing device traces (view with
    TensorBoard / xprof); no-ops cleanly if profiling is unavailable.
  * :class:`Throughput` — rays/sec / fps counter with the same semantics
    as the reference's per-image timers.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path


class ScalarWriter:
    """Append-only JSONL scalar logger."""

    def __init__(self, log_path: Path | str | None = None):
        self.log_path = Path(log_path) if log_path else None
        self.history: dict[str, list[tuple[int, float]]] = defaultdict(list)
        self._t0 = time.perf_counter()
        if self.log_path:
            self.log_path.parent.mkdir(parents=True, exist_ok=True)
            self._fh = open(self.log_path, "a")
        else:
            self._fh = None

    def write(self, step: int, scalars: dict[str, float]) -> None:
        wall = time.perf_counter() - self._t0
        for name, value in scalars.items():
            self.history[name].append((step, float(value)))
            if self._fh:
                self._fh.write(
                    json.dumps(
                        {"step": step, "name": name, "value": float(value),
                         "wall": round(wall, 3)}
                    ) + "\n"
                )
        if self._fh:
            self._fh.flush()

    def latest(self, name: str) -> float | None:
        h = self.history.get(name)
        return h[-1][1] if h else None

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


@contextlib.contextmanager
def profile_trace(log_dir: Path | str, enabled: bool = True):
    """Capture a jax.profiler device trace into ``log_dir``."""
    if not enabled:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(str(log_dir))
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class Throughput:
    """rays/sec + fps counter (reference per-image timing semantics)."""

    def __init__(self):
        self._start: float | None = None

    def start(self) -> None:
        self._start = time.perf_counter()

    def stop(self, num_rays: int, height: int, width: int) -> dict[str, float]:
        dt = time.perf_counter() - (self._start or time.perf_counter())
        dt = max(dt, 1e-9)
        return {
            "num_rays_per_sec": num_rays / dt,
            "fps": num_rays / dt / (height * width),
        }
