"""Honest device timing for the axon TPU harness.

`jax.block_until_ready` does not actually block on this harness and
dispatch RTT over the tunnel is ~30-50ms, so wall-clock around single
dispatches measures nothing. The reliable method: loop the workload inside
one jit with data dependencies, force completion by downloading a single
scalar, and difference two repetition counts.
"""

from __future__ import annotations

import time
from typing import Callable


def device_seconds(make_fn: Callable[[int], Callable[[], float]],
                   n_lo: int = 1, n_hi: int = 5) -> float:
    """Seconds per workload repetition, RTT-compensated.

    `make_fn(n)` must return a zero-arg callable that runs the workload n
    times inside one jitted dispatch (chained with data dependencies) and
    returns a Python float (forcing completion).
    """
    f_lo, f_hi = make_fn(n_lo), make_fn(n_hi)
    f_lo()
    f_hi()  # compile + warm
    t = time.time(); f_lo(); t_lo = time.time() - t
    t = time.time(); f_hi(); t_hi = time.time() - t
    return max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def bucket_pow2(x: int, lo: int = 1) -> int:
    """Round up to a power of two (>= lo) so jit shapes stay cacheable."""
    x = max(x, lo)
    return 1 << (x - 1).bit_length()
