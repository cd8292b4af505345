"""Kernel tests for pipelines/queries10.py — Haar lifting exactness,
Goertzel known answers, pure numpy (no Ray)."""

import math

import numpy as np

from signalsharp_ray.pipelines.queries10 import (
    GOERTZEL_C,
    goertzel_power,
    haar_energy_series,
)


def test_haar_known_answer():
    # x = [1, 3, 2, 2, 5, 1, 4, 4]
    # L1 pairs: d = [-2, 0, 4, 0], a = [4, 4, 6, 8] -> E1 = 20
    # L2 pairs: d = [0, -2],       a = [8, 14]      -> E2 = 4
    # L3 pairs: d = [-6]                            -> E3 = 36
    out = haar_energy_series(np.array([1, 3, 2, 2, 5, 1, 4, 4]))
    assert out == [(1, 4, 20), (2, 2, 4), (3, 1, 36)]


def test_haar_odd_length_truncates():
    # trailing element dropped at each level
    out = haar_energy_series(np.array([1, 2, 7]))
    assert out == [(1, 1, 1)]  # only (1,2) pairs; 7 dropped; level2 empty


def test_haar_parseval_scaling_pure_sine_concentrates():
    # an alternating series puts ALL its energy in level 1
    x = np.tile([5, -5], 32)
    out = dict((l, e) for l, _, e in haar_energy_series(x))
    assert out[1] == 64 // 2 * (10**2)
    assert out[2] == 0 and out[3] == 0


def test_goertzel_constant_is_2cos_period24():
    assert GOERTZEL_C == 2.0 * math.cos(2.0 * math.pi / 24.0)


def test_goertzel_detects_diurnal_sine():
    t = np.arange(240)
    diurnal = np.rint(100 + 50 * np.cos(2 * np.pi * t / 24)).astype(np.int64)
    # power at the 24h bin dwarfs a series oscillating at a different period
    p7 = goertzel_power(np.rint(100 + 50 * np.cos(2 * np.pi * t / 7)).astype(np.int64))
    assert goertzel_power(diurnal) > 50 * p7


def test_goertzel_zero_series():
    assert goertzel_power(np.zeros(10, dtype=np.int64)) == 0.0
