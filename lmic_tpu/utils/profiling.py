"""Structured timing and device profiling.

The reference has no profiling subsystem — only ad-hoc `time.time()` deltas
and commented-out torchsnooper decorators (SURVEY.md §5). Here:

- `timed(name)` / `Timings`: nested wall-clock sections with a structured
  report, used by the eval CLIs for enc/dec split timing.
- `device_trace(logdir)`: context manager around `jax.profiler` traces —
  open the result in TensorBoard/XProf to see per-op TPU time, HBM traffic,
  and host<->device transfers.

Wall-clock numbers around jitted code are only meaningful if the section
blocks on the result; `timed` calls `block_until_ready` on an optional
`sync` pytree for that reason.

Axon (tunnel-TPU) caveat, measured 2026-08-19: `jax.block_until_ready`
on SMALL SCALAR outputs can return before the computation has executed
(a metrics dict read 0.7 ms/step where the true step was 62.6 ms) —
pass a LARGE output array (e.g. the updated params) as `sync`, or
materialize a value with `float(...)`/`np.asarray(...)`, or the section
measures dispatch only.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Dict, Iterator, Optional


class Timings:
    """Accumulates named wall-clock sections: `with t.section("enc"): ...`"""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, sync: Any = None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_s": self.totals[name] / max(1, self.counts[name]),
            }
            for name in self.totals
        }

    def __str__(self) -> str:
        lines = [
            f"{name:>24s}: {v['total_s']:8.3f}s total"
            f"  ({v['count']}x, {v['mean_s'] * 1e3:7.2f} ms avg)"
            for name, v in sorted(self.report().items())
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (TensorBoard 'profile' plugin / XProf).

    Shows XLA op timelines on the accelerator: MXU occupancy, fusion
    boundaries, transfer overlap — the ground truth for kernel tuning.
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a device trace (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def timed(fn, *args, sync: bool = True, **kwargs):
    """One-shot: returns (result, seconds). Blocks on the result pytree."""
    import jax

    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    if sync:
        jax.block_until_ready(out)
    return out, time.perf_counter() - t0
