"""Tracing / profiling — first-class, unlike the reference (SURVEY.md §5:
"no profiler, no timers, not even time.time()").

* ``phase(name)``      — context manager timing a pipeline phase with a forced
                         scalar readback (block_until_ready is unreliable under
                         remote relays — see bench.py NOTE).
* ``Stopwatch``        — accumulates per-phase wall times + image counts and
                         reports images/sec (the baseline metric).
* ``trace(dir)``       — jax.profiler trace wrapper for TensorBoard dumps.
* ``log_compile_time`` — decorator reporting first-call (compile) vs steady cost.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

import jax


def enable_compile_cache(path: str | None = None):
    """Persistent XLA compilation cache — first compiles of the big models are
    20-40s on this stack; cache them across processes."""
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            path or os.path.expanduser("~/.cache/wsdl_jax"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def force_ready(value):
    """Ensure device work backing `value` has completed (readback a scalar)."""
    import jax.numpy as jnp

    leaves = jax.tree.leaves(value)
    if not leaves:
        return value
    x = leaves[0]
    if hasattr(x, "ravel"):
        float(jnp.asarray(x).ravel()[0])
    return value


class Stopwatch:
    def __init__(self):
        self.times = defaultdict(float)
        self.counts = defaultdict(int)
        self.images = defaultdict(int)
        # per-call (seconds, images) history: phases that jit-compile on their
        # first call need first-call vs marginal rates reported separately —
        # at reference scale the first seg-training alternation is dominated
        # by XLA compiles while later ones run at the in-jit step rate
        self.calls = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str, images: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] += dt
            self.counts[name] += 1
            self.images[name] += images
            self.calls[name].append((dt, images))

    def report(self, log=print):
        for name in self.times:
            line = f"[profile] {name}: {self.times[name]:.3f}s over {self.counts[name]} calls"
            if self.images[name]:
                line += f" = {self.images[name] / self.times[name]:.1f} img/s"
                m = self.marginal_rate(name)
                if m is not None:
                    line += f" (marginal {m:.1f} img/s after first call)"
            log(line)

    def rate(self, name: str) -> float:
        return self.images[name] / self.times[name] if self.times[name] else 0.0

    def marginal_rate(self, name: str) -> float | None:
        """img/s over calls 2..N — the steady rate once call 1 has paid the
        jit compiles. None when the phase ran fewer than 2 calls."""
        tail = self.calls[name][1:]
        secs = sum(t for t, _ in tail)
        imgs = sum(i for _, i in tail)
        if not tail or secs <= 0 or imgs <= 0:
            return None
        return imgs / secs

    def first_call_s(self, name: str) -> float | None:
        return self.calls[name][0][0] if self.calls[name] else None


def warmup_device(warn_after_s: float = 60.0, log=print) -> float:
    """Pay the first-dispatch cost of an attached device and attribute it.

    On a shared remote relay (axon) the first dispatch of a process covers
    session establishment AND any queueing behind whoever currently holds the
    single-chip device — measured here from ~25 s (healthy) to 704 s (relay
    held by a concurrent run; see BASELINE.md's round-4 aux re-record note).
    Long pipelines should pay this in its own phase so their stage timings
    measure the pipeline; when it exceeds `warn_after_s` this prints what is
    almost certainly going on instead of leaving a silent multi-minute stall.

    Returns the measured first-dispatch wall seconds.
    """
    import jax.numpy as jnp

    _log = (lambda m: print(m, flush=True)) if log is print else log
    dev = jax.devices()[0]
    _log(f"device: {dev}")
    t0 = time.perf_counter()
    float(jax.jit(lambda x: x + 1)(jnp.float32(0)))
    dt = time.perf_counter() - t0
    if dt > warn_after_s:
        _log(
            f"[profile] device warmup took {dt:.0f}s — on a shared relay this "
            "is queueing behind another process holding the device session "
            "(or a stalled/stopped client that never released it), not "
            "pipeline cost; subsequent dispatches run at the normal floor"
        )
    return dt


@contextlib.contextmanager
def phase(name: str, log=print):
    t0 = time.perf_counter()
    yield
    log(f"[profile] {name}: {time.perf_counter() - t0:.3f}s")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto.

    WARNING (shared remote relays, e.g. axon): start_trace attaches the
    profiler to EVERY backend the plugin registry knows, including a remote
    TPU backend other processes are using — measured here to abort a
    concurrent training run with FAILED_PRECONDITION and wedge the relay's
    device session for ~10 minutes. Only use on exclusively-owned devices.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_compile_time(fn, name: str | None = None, log=print):
    """Wrap a jitted fn: report the first (compile) call's wall time."""
    label = name or getattr(fn, "__name__", "fn")
    state = {"first": True}

    def wrapped(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        force_ready(out)
        dt = time.perf_counter() - t0
        if state["first"]:
            log(f"[profile] {label}: first call (compile) {dt:.2f}s")
            state["first"] = False
        return out

    return wrapped
