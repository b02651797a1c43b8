"""Shared TPU micro-bench harness with tunnel-overhead calibration.

The axon TPU is reached through a tunnel: ONE dispatch+fetch round trip
costs ~25-30 ms regardless of device work, so `time(loop)/iters` with
small iters measures the tunnel, not the kernel (this poisoned the
round-2 W4 probes).  Calibrate: t_iter = (t_total - t_fixed) / iters,
where t_fixed is the round trip of a trivial program.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

_FIXED = None


def fixed_overhead() -> float:
    """Round-trip cost of dispatching + fetching a trivial program."""
    global _FIXED
    if _FIXED is not None:
        return _FIXED

    @jax.jit
    def trivial(x):
        return x + 1.0

    x = jnp.zeros((1,), jnp.float32)
    np.asarray(jax.device_get(trivial(x)))  # compile
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(jax.device_get(trivial(x)))
        ts.append(time.time() - t0)
    _FIXED = float(np.median(ts))
    return _FIXED


def timeit(fn, *args, iters: int = 400) -> float:
    """Per-iteration seconds of fn(*args), tunnel overhead subtracted.
    Serializes iterations through a data dependency so the device cannot
    overlap them dishonestly."""

    @jax.jit
    def loop(*a):
        def body(i, acc):
            xi = a[0] + (acc[0] * 1e-30).astype(a[0].dtype)
            out = fn(xi, *a[1:])
            return acc + out.reshape(-1)[:1].astype(jnp.float32) * 1e-9

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((1,), jnp.float32))

    fixed = fixed_overhead()
    np.asarray(jax.device_get(loop(*args)))  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        np.asarray(jax.device_get(loop(*args)))
        best = min(best, time.time() - t0)
    return max(best - fixed, 1e-9) / iters
