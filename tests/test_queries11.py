"""Kernel tests for pipelines/queries11.py — token-bucket replay known
answers (pure numpy, no Ray)."""

import numpy as np

from signalsharp_ray.pipelines.queries11 import token_bucket_replay


def test_token_bucket_known_replay():
    # cap=5, refill=2; arrivals 0,7,1,0,4
    v = np.array([0, 7, 1, 0, 4], dtype=np.int64)
    avail, served, dropped, remaining = token_bucket_replay(v, cap=5, refill=2)
    # t0: avail=min(5+2,5)=5, served=0, left=5
    # t1: avail=min(5+2,5)=5, served=5, dropped=2, left=0
    # t2: avail=min(0+2,5)=2, served=1, left=1
    # t3: avail=min(1+2,5)=3, served=0, left=3
    # t4: avail=min(3+2,5)=5, served=4, left=1
    assert list(avail) == [5, 5, 2, 3, 5]
    assert list(served) == [0, 5, 1, 0, 4]
    assert list(dropped) == [0, 2, 0, 0, 0]
    assert list(remaining) == [5, 0, 1, 3, 1]


def test_token_bucket_conservation():
    rng = np.random.default_rng(3)
    v = rng.integers(0, 12, 200).astype(np.int64)
    _avail, served, dropped, remaining = token_bucket_replay(v, cap=8, refill=2)
    assert (served + dropped == v).all()
    assert (served >= 0).all() and (dropped >= 0).all()
    assert (remaining >= 0).all() and (remaining <= 8).all()


def test_token_bucket_never_exceeds_refill_rate_sustained():
    # under sustained overload, long-run service rate == refill rate
    v = np.full(1000, 100, dtype=np.int64)
    _a, served, _d, _r = token_bucket_replay(v, cap=20, refill=3)
    # first hour burns the full bucket, afterwards exactly the refill
    assert served[0] == 20
    assert (served[1:] == 3).all()
