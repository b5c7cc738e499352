"""Global counters, timers and return codes.

TPU-native analog of the reference's ``StrumpackParameters.hpp:50-110``
(atomic flop/byte/memory counters, ``ReturnCode`` enum) and
``misc/TaskTimer.hpp:74`` (scoped wall timers).  Here the counters are plain
Python ints updated from host-side planning code and from the (host-visible)
cost models of the jitted kernels; there is no per-kernel atomic increment on
device — flops are *computed analytically* from the static level plans, which
is exact for dense factorization and an upper bound for compressed fronts.
"""
from __future__ import annotations

import contextlib
import enum
import time
from dataclasses import dataclass, field


class ReturnCode(enum.Enum):
    """Mirror of the reference's ReturnCode (StrumpackParameters.hpp:50-58)."""

    SUCCESS = 0
    MATRIX_NOT_SET = 1
    REORDERING_ERROR = 2
    ZERO_PIVOT = 3
    NO_CONVERGENCE = 4
    INACCURATE_INERTIA = 5


@dataclass
class Counters:
    """Flop / byte / memory counters (role of strumpack::params globals)."""

    flops: int = 0
    bytes_moved: int = 0
    peak_device_bytes: int = 0
    factor_nonzeros: int = 0
    factor_memory: int = 0

    def reset(self) -> None:
        self.flops = 0
        self.bytes_moved = 0
        self.peak_device_bytes = 0
        self.factor_nonzeros = 0
        self.factor_memory = 0


counters = Counters()


@dataclass
class TimerList:
    """Named wall-clock phase timers (role of misc/TaskTimer.hpp:74,107)."""

    times: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def get(self, name: str) -> float:
        return self.times.get(name, 0.0)

    def reset(self) -> None:
        self.times.clear()


timers = TimerList()


def lu_flops(m: int, n: int) -> int:
    """Flops of partial-pivoted LU of the leading n cols of an m x n panel."""
    # sum_k (m-k-1) + 2*(m-k-1)*(n-k-1) for k in range(min(m,n))
    k = min(m, n)
    return int(k * (k * (k / 3.0) - (k * k) / 2.0) + m * n * k - (m + n) * k * k / 2.0 + k**3 / 3.0 + 2 * m * n * k - (m + n) * k**2 + (2.0 / 3.0) * k**3) if False else int(
        2.0 * m * n * k - (m + n) * k * k + (2.0 / 3.0) * k**3
    )


def trsm_flops(m: int, n: int) -> int:
    """Flops of a triangular solve with an m x m triangle and n rhs."""
    return m * m * n


def gemm_flops(m: int, n: int, k: int) -> int:
    return 2 * m * n * k
