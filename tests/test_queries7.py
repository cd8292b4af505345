"""Kernel-level tests for pipelines/queries7.py (the TPC-H join-pattern
batch) — pure pandas/numpy, no Ray. The end-to-end query-vs-oracle runs
live in test_queries_contract.py; here we pin the exact-integer money
encoding and the cross-multiplied correlated predicates that the oracles
rely on."""

import numpy as np
import pandas as pd

from signalsharp_ray.pipelines.queries7 import _rev_cbp


def test_rev_cbp_exact_integer_encoding():
    # price 1234.56 at 7% discount: 123456 cents * (10000 - 700) bp
    out = _rev_cbp(pd.Series([1234.56]), pd.Series([0.07]))
    assert out.dtype == np.int64
    assert out[0] == 123456 * 9300


def test_rev_cbp_float_noise_immune():
    # 0.07 * 10000 = 699.9999... in float; rint must recover 700 exactly
    noisy = np.nextafter(0.07, 0.0)
    out = _rev_cbp(pd.Series([100.0]), pd.Series([noisy]))
    assert out[0] == 10000 * 9300


def test_small_qty_cross_multiplied_predicate_matches_float_division():
    rng = np.random.default_rng(7)
    q = rng.integers(1, 51, 500).astype(np.int64)
    n = rng.integers(1, 40, 500).astype(np.int64)
    sq = rng.integers(1, 2000, 500).astype(np.int64)
    int_keep = 5 * q * n < sq
    # float form: q < 0.2 * (sq / n); equivalent away from exact equality,
    # and the integer form is the one that is exact AT equality
    float_keep = q.astype(float) < 0.2 * (sq.astype(float) / n.astype(float))
    disagree = int_keep != float_keep
    # any disagreement must sit exactly on the boundary 5*q*n == sq
    assert (5 * q[disagree] * n[disagree] == sq[disagree]).all()


def test_rich_idle_cross_multiplied_average_predicate():
    b = np.array([100, 250, 400, -50, 0], dtype=np.int64)
    pos = b[b > 0]
    s, n = int(pos.sum()), len(pos)  # avg = 250
    keep = b * n > s
    assert list(keep) == [False, False, True, False, False]


def test_sole_late_winner_filter():
    ls = pd.DataFrame(
        {
            "orderkey": [1, 1, 2, 2, 3],
            "suppkey": [10, 11, 10, 11, 12],
            "late_max": [1, 0, 1, 1, 1],
        }
    )
    po = (
        ls.groupby("orderkey")
        .agg(n_supp=("suppkey", "size"), n_late=("late_max", "sum"))
        .reset_index()
    )
    both = ls.merge(po, on="orderkey")
    keep = (both["late_max"] == 1) & (both["n_late"] == 1) & (both["n_supp"] >= 2)
    winners = both.loc[keep, ["orderkey", "suppkey"]].to_records(index=False).tolist()
    # order 1: supp 10 is the sole late supplier of a 2-supplier order
    # order 2: both late -> nobody; order 3: single-supplier -> nobody
    assert winners == [(1, 10)]
