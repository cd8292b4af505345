"""Scalar / statistical utility kernels (pure numpy).

Semantics match the reference's StatisticalFunctions
(/root/reference/SignalSharp/Utilities/StatisticalFunctions.cs:40-405 and
StatisticalFunctions.generic.cs):

- variance/std are POPULATION (ddof=0)
- median: sort-based, even length -> mean of the two middle values
- normalize to [0,1]: constant input -> zeros
- z-score: sigma effectively zero -> zeros
- skewness: hybrid G1 using the POPULATION std dev with the
  n/((n-1)(n-2)) small-sample factor (StatisticalFunctions.generic.cs:167-204)
- population excess kurtosis: m4/var^2 - 3 (raises on zero variance)
- sample kurtosis G2: population 4th moment scaled by ((n-1)/n)^2, then
  n(n+1)/((n-1)(n-2)(n-3)) * m4s - 3(n-1)^2/((n-2)(n-3))
  (StatisticalFunctions.generic.cs:245-303)
"""

from __future__ import annotations

import numpy as np

from ..common.constants import DEFAULT_EPSILON


def mean(values: np.ndarray) -> float:
    """Mean; empty input -> 0.0 (reference quirk,
    StatisticalFunctionsTests.cs Mean_Double_EmptySpan_ShouldReturnZero)."""
    values = np.asarray(values, dtype=np.float64)
    if values.size == 0:
        return 0.0
    return float(values.mean())


def variance(values: np.ndarray) -> float:
    """Population variance (ddof=0); length <= 1 -> 0."""
    values = np.asarray(values, dtype=np.float64)
    if values.size <= 1:
        return 0.0
    return float(values.var())


def standard_deviation(values: np.ndarray) -> float:
    return float(np.sqrt(max(0.0, variance(values))))


def median(values: np.ndarray) -> float:
    """Sorted median; even length -> mean of the two middle values.

    QuickSelect and sort paths of the reference produce the same value
    (Resampling.cs:74-83); numpy partition gives the same result in O(n).
    """
    values = np.asarray(values, dtype=np.float64)
    n = values.size
    if n == 0:
        raise ValueError("Input must not be empty.")
    mid = n // 2
    if n % 2 != 0:
        return float(np.partition(values, mid)[mid])
    part = np.partition(values, [mid - 1, mid])
    return float((part[mid - 1] + part[mid]) / 2.0)


def normalize(values: np.ndarray) -> np.ndarray:
    """Scale to [0,1]; constant input -> zeros; empty -> empty."""
    values = np.asarray(values, dtype=np.float64)
    if values.size == 0:
        return values.copy()
    lo, hi = values.min(), values.max()
    rng = hi - lo
    if abs(rng) < DEFAULT_EPSILON:
        return np.zeros_like(values)
    return (values - lo) / rng


def zscore(values: np.ndarray) -> np.ndarray:
    """(x - mean) / population-std; sigma ~ 0 -> zeros; empty -> empty."""
    values = np.asarray(values, dtype=np.float64)
    if values.size == 0:
        return values.copy()
    mu = values.mean()
    sigma = np.sqrt(max(0.0, float(values.var())))
    if abs(sigma) < DEFAULT_EPSILON:
        return np.zeros_like(values)
    return (values - mu) / sigma


def skewness(values: np.ndarray) -> float:
    values = np.asarray(values, dtype=np.float64)
    n = values.size
    if n < 3:
        raise ValueError("Skewness requires at least three data points.")
    mu = values.mean()
    sigma = np.sqrt(max(0.0, float(values.var())))
    if abs(sigma) < DEFAULT_EPSILON:
        return 0.0
    s = float(np.sum(((values - mu) / sigma) ** 3))
    denom = (n - 1) * (n - 2)
    if abs(denom) < DEFAULT_EPSILON:
        return 0.0
    return n * s / denom


def population_excess_kurtosis(values: np.ndarray) -> float:
    values = np.asarray(values, dtype=np.float64)
    n = values.size
    if n < 4:
        raise ValueError("Population excess kurtosis requires at least four data points.")
    mu = values.mean()
    var = float(values.var())
    if abs(var) < DEFAULT_EPSILON:
        raise ValueError("Population variance is effectively zero.")
    m4 = float(np.sum((values - mu) ** 4)) / n
    return m4 / (var * var) - 3.0


def sample_kurtosis_g2(values: np.ndarray) -> float:
    values = np.asarray(values, dtype=np.float64)
    n = values.size
    if n < 4:
        raise ValueError("Sample excess kurtosis (G2) requires at least four data points.")
    mu = values.mean()
    pop_var = float(values.var())
    if abs(pop_var) < DEFAULT_EPSILON:
        raise ValueError("Population variance is effectively zero.")
    pop_std = np.sqrt(max(0.0, pop_var))
    m4_pop = float(np.sum(((values - mu) / pop_std) ** 4))
    adj = ((n - 1) / n) ** 2
    m4_sample = m4_pop * adj
    term1 = n * (n + 1) / ((n - 1) * (n - 2) * (n - 3))
    term3 = 3.0 * (n - 1) ** 2 / ((n - 2) * (n - 3))
    return term1 * m4_sample - term3
