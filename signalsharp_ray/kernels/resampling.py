"""Resampling / segment-statistic kernels (pure numpy).

Semantics match /root/reference/SignalSharp/Resampling/Resampling.cs:
tumbling fixed-size index buckets of `factor` points; the last bucket may be
ragged; downsample takes every factor-th sample starting at index 0.
Median follows the sort-based definition (even -> mean of middle two),
identical for both the reference's QuickSelect and sort paths.

The time-bucketed rollup used by the distributed engine generalizes these to
tumbling windows on timestamps; see signalsharp_ray.stages.rollup.
"""

from __future__ import annotations

import numpy as np


def _check(signal: np.ndarray, factor: int) -> np.ndarray:
    if factor <= 0:
        raise ValueError("factor must be positive")
    return np.asarray(signal, dtype=np.float64)


def downsample(signal: np.ndarray, factor: int) -> np.ndarray:
    signal = _check(signal, factor)
    return signal[::factor].copy()


def _segment_reduce(signal: np.ndarray, factor: int, op: str) -> np.ndarray:
    n = signal.size
    if n == 0:
        return signal.copy()
    n_full = n // factor
    out_len = -(-n // factor)
    head = signal[: n_full * factor].reshape(n_full, factor)
    out = np.empty(out_len, dtype=np.float64)
    if op == "mean":
        out[:n_full] = head.mean(axis=1)
    elif op == "max":
        out[:n_full] = head.max(axis=1)
    elif op == "min":
        out[:n_full] = head.min(axis=1)
    elif op == "median":
        out[:n_full] = np.median(head, axis=1)
    else:  # pragma: no cover
        raise ValueError(op)
    if out_len > n_full:
        tail = signal[n_full * factor :]
        out[-1] = {
            "mean": tail.mean,
            "max": tail.max,
            "min": tail.min,
            "median": lambda: np.median(tail),
        }[op]()
    return out


def segment_mean(signal: np.ndarray, factor: int) -> np.ndarray:
    return _segment_reduce(_check(signal, factor), factor, "mean")


def segment_median(signal: np.ndarray, factor: int, use_quickselect: bool = True) -> np.ndarray:
    # both reference paths produce the identical value; np.median matches
    return _segment_reduce(_check(signal, factor), factor, "median")


def segment_max(signal: np.ndarray, factor: int) -> np.ndarray:
    return _segment_reduce(_check(signal, factor), factor, "max")


def segment_min(signal: np.ndarray, factor: int) -> np.ndarray:
    return _segment_reduce(_check(signal, factor), factor, "min")
