"""Profiling helpers (aux subsystem C16): jax.profiler traces + the
scan-amortized device timer that actually works through RPC-tunneled
backends (per-call timing measures the network, CLAUDE.md)."""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np


@contextmanager
def trace(log_dir: str = "/tmp/sba_trace"):
    """jax.profiler trace context; view with tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_time(body_fn, reps: int = 32, n: int = 3):
    """Median device seconds per execution of `body_fn()` (a traceable
    function returning any pytree), measured as `reps` executions inside
    one dispatch minus a trivially-measured dispatch RTT."""

    def _sum_tree(t):
        return sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(t))

    @jax.jit
    def run(_x):
        def sbody(c, i):
            return c + _sum_tree(body_fn()), None

        c, _ = jax.lax.scan(sbody, jnp.float32(0.0), jnp.arange(reps))
        return c

    @jax.jit
    def tiny(x):
        return x + 1.0

    jax.block_until_ready(tiny(jnp.float32(0.0)))
    jax.block_until_ready(run(0))

    def med(f, *a):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*a))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    rtt = med(tiny, jnp.float32(1.0))
    t = med(run, 0)
    return max(t - rtt, 0.0) / reps
