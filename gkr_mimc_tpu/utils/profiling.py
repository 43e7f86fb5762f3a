"""Tracing & timing harness — the reference's profiling analog, TPU-style.

The reference wraps benchmark bodies with runtime/trace + pprof
(common/profiling.go:52-92, output under profiling/<bench-name>/) and
sprinkles printf wall timers through the production path
(common/timing.go:8-22 TimeTracker; prover/gadget/prove.go:27,34). The
JAX equivalents here:

* `Timer` / `timed`      — wall-clock phase timers that block on device
                           results so async dispatch doesn't hide work;
                           printf format matches TimeTracker ("<name> took
                           <ms> ms").
* `profile_trace(name)`  — jax.profiler trace context writing a TensorBoard
                           / xprof trace under profiling/<name>/ (the
                           runtime/trace analog; per-kernel HLO timelines
                           instead of goroutine timelines).
* `phase_report()`       — accumulated per-phase totals, the printf-ms
                           breakdown the reference's benchmarks emit
                           (snark/gkr/gkr_test.go:123-159).

All instrumentation is off unless entered explicitly; nothing in the hot
path pays for it.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from collections import defaultdict

import jax

_PHASE_TOTALS: dict[str, float] = defaultdict(float)
_PHASE_COUNTS: dict[str, int] = defaultdict(int)


class Timer:
    """Wall timer over a named phase (TimeTracker analog). Use as a context
    manager; pass `sync=` a pytree to block_until_ready before stopping so
    asynchronously dispatched device work is charged to the right phase."""

    def __init__(self, name: str, verbose: bool = True, out=sys.stderr):
        self.name = name
        self.verbose = verbose
        self.out = out
        self.elapsed_ms: float | None = None
        self._sync = None

    def sync_on(self, tree):
        self._sync = tree
        return tree

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync is not None:
            jax.block_until_ready(self._sync)
        self.elapsed_ms = (time.perf_counter() - self._t0) * 1e3
        _PHASE_TOTALS[self.name] += self.elapsed_ms
        _PHASE_COUNTS[self.name] += 1
        if self.verbose and exc[0] is None:
            print(f"{self.name} took {self.elapsed_ms:.1f} ms", file=self.out)
        return False


@contextlib.contextmanager
def timed(name: str, verbose: bool = True):
    with Timer(name, verbose=verbose) as t:
        yield t


def phase_report(reset: bool = False) -> dict[str, dict]:
    """Accumulated {phase: {total_ms, count, mean_ms}} across Timer uses."""
    rep = {
        k: {
            "total_ms": v,
            "count": _PHASE_COUNTS[k],
            "mean_ms": v / _PHASE_COUNTS[k],
        }
        for k, v in _PHASE_TOTALS.items()
    }
    if reset:
        _PHASE_TOTALS.clear()
        _PHASE_COUNTS.clear()
    return rep


@contextlib.contextmanager
def profile_trace(name: str, root: str | None = None):
    """Capture a jax.profiler device trace under profiling/<name>/
    (ProfileTrace analog; view with TensorBoard or xprof). Set
    GKR_PROFILE=0 to turn these into no-ops without touching call sites."""
    if os.environ.get("GKR_PROFILE", "1") == "0":
        yield None
        return
    base = root or os.path.join(os.getcwd(), "profiling")
    path = os.path.join(base, name)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield path
