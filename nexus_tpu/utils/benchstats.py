"""Repeat-measurement statistics for the benchmark scripts.

The relay-attached chip shows large run-to-run service variance (BENCH_NOTES:
identical warm-cache runs measured 77-906 samples/s), so single-run numbers
are not evidence. Every headline bench runs >= N_TRIALS timed trials and
reports the MEDIAN with the IQR as the spread (robust to the relay's
occasional multi-second stalls, which poison a mean).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List

import numpy as np

N_TRIALS = 5


def measure_trials(
    timed_fn: Callable[[], float],
    n_trials: int = N_TRIALS,
) -> Dict[str, float]:
    """Run ``timed_fn`` (returns a throughput/latency sample) n times; report
    median + IQR + the raw samples."""
    samples: List[float] = [float(timed_fn()) for _ in range(n_trials)]
    arr = np.asarray(samples, np.float64)
    q1, med, q3 = np.percentile(arr, [25, 50, 75])
    return {
        "value": float(med),
        "n": int(n_trials),
        "iqr": float(q3 - q1),
        "q1": float(q1),
        "q3": float(q3),
        "min": float(arr.min()),
        "max": float(arr.max()),
        "samples": samples,
    }


def throughput_trials(
    run_iters: Callable[[int], None],
    units_per_iter: float,
    iters: int = 3,
    n_trials: int = N_TRIALS,
) -> Dict[str, float]:
    """Trials of `iters` back-to-back iterations each; sample = units/s."""

    def one() -> float:
        t0 = time.perf_counter()
        run_iters(iters)
        return units_per_iter * iters / (time.perf_counter() - t0)

    return measure_trials(one, n_trials)
