"""Honest timing helpers for the axon TPU tunnel.

The tunnel memoizes/defers executions: repeating one jitted call with
identical inputs — and even ``jax.block_until_ready`` — can report enqueue
time, not device time (measured "0.05 ms" for an 8192^3 matmul).  The only
trustworthy protocol is:

  * vary the inputs every iteration (defeats result memoization), and
  * FETCH a scalar reduction of the output to the host every iteration
    (forces the computation; nothing downstream can be deferred).

``fetch_ms`` reports both raw per-iteration wall time and the time with the
measured round-trip floor subtracted.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

_RTT_MS = None


def rtt_ms() -> float:
    """Median host<->device round-trip of a trivial fetch (cached)."""
    global _RTT_MS
    if _RTT_MS is None:
        x = jnp.zeros(())
        trip = jax.jit(lambda v, i: v + i)
        float(np.asarray(trip(x, 1.0)))
        ts = []
        for i in range(7):
            t0 = time.perf_counter()
            float(np.asarray(trip(x, float(i))))
            ts.append(time.perf_counter() - t0)
        _RTT_MS = float(np.median(ts) * 1e3)
    return _RTT_MS


def fetch_ms(fn, make_args, iters=8, name="", quiet=False):
    """Per-iteration ms of ``float(np.asarray(fn(*make_args(i))))``.

    fn must return a SCALAR (reduce inside the jit).  Returns device ms
    (raw minus the round-trip floor, clamped at 0).
    """
    val = float(np.asarray(fn(*make_args(0))))
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        val = float(np.asarray(fn(*make_args(i))))
    raw = (time.perf_counter() - t0) / iters * 1e3
    dev = max(raw - rtt_ms(), 0.0)
    if not quiet:
        print(f"{name:46s} {dev:9.2f} ms  (raw {raw:8.2f}, val {val:.4g})")
    return dev
