"""Runtime configuration knobs (trace-time constants).

``time_parallel``: route Kalman recursions through the associative-scan
(parallel-in-time) implementations — O(log n) depth instead of O(n)
sequential steps.  Wins when chains x state-dim underfills the chip (few
chains / long series); the sequential scan wins when thousands of vmapped
chains already saturate it.  Changing the flag requires retracing (new jit
cache entries), which happens automatically on the next call.
"""
from __future__ import annotations

import contextlib

time_parallel: bool = False

# Route batched Kalman recursions through the fused Pallas chains-in-lanes
# kernel (ops/pallas_kalman.py) when supported: "auto" = on TPU backends
# only; True = always (interpret mode off-TPU, for testing); False = never.
fused_kernels: bool | str = "auto"


def set_time_parallel(value: bool) -> None:
    global time_parallel
    time_parallel = bool(value)


def set_fused_kernels(value) -> None:
    global fused_kernels
    fused_kernels = value


def use_fused() -> bool:
    import jax
    if fused_kernels == "auto":
        # the axon tunnel registers TPU devices under its own platform name
        return jax.default_backend() in ("tpu", "axon")
    return bool(fused_kernels)


@contextlib.contextmanager
def parallel_time(value: bool = True):
    global time_parallel
    old = time_parallel
    time_parallel = bool(value)
    try:
        yield
    finally:
        time_parallel = old
