"""Tracing / profiling helpers.

Reference counterpart (SURVEY.md §5.1): a wall-clock `tick()` probe with
device sync (torchpq/util.py:86-99), per-class verbosity printing, and
external Nsight profiling (profile.sh). The TPU equivalents: named scopes
that show up in XLA/jax profiler traces, a structured phase timer, and a
`trace()` context manager writing a jax.profiler trace for xprof/tensorboard.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def named_scope(name):
    """Annotate a region so it appears in profiler traces."""
    with jax.named_scope(name):
        yield


@contextlib.contextmanager
def trace(log_dir):
    """Capture a device trace (open with xprof/tensorboard).

    TPU analogue of the reference's Nsight profile.sh."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Structured multi-phase wall timer with device sync at boundaries
    (generalizes the reference's tick())."""

    def __init__(self):
        self.phases = {}
        self._t = None
        self._name = None

    @contextlib.contextmanager
    def phase(self, name, sync=None):
        """`sync`: a zero-arg callable returning the phase's jax outputs —
        they are blocked on at exit. effects_barrier alone does not wait
        for pending *pure* computations (the 'timings read ~0' trap,
        util.Timer.tick), so phases that end with a jitted call should
        pass one, e.g. `with t.phase('scan', lambda: vals): ...`."""
        jax.effects_barrier()
        t0 = time.perf_counter()
        yield
        if sync is not None:
            from .util import block_until_ready
            block_until_ready(sync())
        jax.effects_barrier()
        self.phases[name] = self.phases.get(name, 0.0) + (
            time.perf_counter() - t0)

    def report(self):
        return dict(sorted(self.phases.items(), key=lambda kv: -kv[1]))
