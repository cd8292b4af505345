"""Split-invariance tests for the partial+final operator kernels in
pipelines/queries2.py — pure pandas, no Ray session.

The round-1 asof_join bug was a per-batch reduction doing a global job:
results varied with block layout. Every partial+final pair added since must
produce IDENTICAL output for any partition of the input into batches. These
tests run each combiner over adversarial splits (one row per batch, skewed
splits, shuffled order) and compare against the whole-frame answer.
"""

import numpy as np
import pandas as pd
import pytest

from signalsharp_ray.pipelines.queries2 import (
    keep_longest_final,
    keep_longest_partial,
    ohlc_final,
    ohlc_partial,
    topk_orders_final,
    topk_orders_partial,
)


def _splits(df: pd.DataFrame, rng: np.random.Generator):
    """Adversarial batch layouts: whole frame, singleton rows, skewed cuts,
    shuffled row order."""
    yield [df]
    yield [df.iloc[[i]] for i in range(len(df))]
    cut = max(1, len(df) // 7)
    yield [df.iloc[:cut], df.iloc[cut:]]
    perm = df.iloc[rng.permutation(len(df))].reset_index(drop=True)
    half = len(perm) // 2
    yield [perm.iloc[:half], perm.iloc[half:]]


def _events_frame(n=400, seed=3):
    rng = np.random.default_rng(seed)
    ts = pd.to_datetime(
        1_704_067_200_000_000 + rng.integers(0, 6 * 3600 * 1_000_000, n), unit="us"
    )
    return pd.DataFrame(
        {
            "event_id": rng.permutation(n).astype(np.int64),
            "ts": ts,
            "event_type": rng.choice(["a", "b", "c"], n),
            "value": np.round(rng.normal(50, 10, n), 3),
        }
    ), rng


class TestOHLCSplitInvariance:
    def test_any_split_same_bars(self):
        df, rng = _events_frame()
        # duplicate some timestamps so the (ts, event_id) tie-break matters
        dup = df.iloc[:40].copy()
        dup["event_id"] = dup["event_id"] + 10_000
        df = pd.concat([df, dup], ignore_index=True)

        def run(batches):
            parts = pd.concat([ohlc_partial(b) for b in batches], ignore_index=True)
            outs = [
                ohlc_final(g)
                for _, g in parts.groupby(["event_type", "bucket_ts"], sort=False)
            ]
            return (
                pd.concat(outs, ignore_index=True)
                .sort_values(["event_type", "bucket_ts"])
                .reset_index(drop=True)
            )

        ref = run([df])
        for batches in _splits(df, rng):
            pd.testing.assert_frame_equal(run(batches), ref)

    def test_open_close_match_window_oracle(self):
        df, _ = _events_frame(n=300, seed=11)
        parts = ohlc_partial(df)
        outs = pd.concat(
            [
                ohlc_final(g)
                for _, g in parts.groupby(["event_type", "bucket_ts"], sort=False)
            ],
            ignore_index=True,
        )
        s = df.sort_values(["ts", "event_id"], kind="mergesort")
        bucket = s["ts"].dt.floor("h")
        g = s.assign(bucket_ts=bucket).groupby(["event_type", "bucket_ts"])
        oracle = g["value"].agg(["first", "last", "min", "max", "size"]).reset_index()
        merged = outs.merge(oracle, on=["event_type", "bucket_ts"])
        assert len(merged) == len(outs)
        np.testing.assert_allclose(merged["open"], np.round(merged["first"], 6))
        np.testing.assert_allclose(merged["close"], np.round(merged["last"], 6))
        np.testing.assert_allclose(merged["low"], np.round(merged["min"], 6))
        np.testing.assert_allclose(merged["high"], np.round(merged["max"], 6))
        np.testing.assert_array_equal(merged["cnt"], merged["size"])


class TestTopKSplitInvariance:
    def test_any_split_same_topk(self):
        rng = np.random.default_rng(5)
        n = 500
        df = pd.DataFrame(
            {
                "o_custkey": rng.integers(0, 30, n).astype(np.int64),
                "o_orderkey": rng.permutation(n).astype(np.int64),
                # coarse prices force totalprice ties -> orderkey tie-break
                "o_totalprice": np.round(rng.uniform(100, 110, n), 0),
            }
        )

        def run(batches):
            parts = pd.concat(
                [topk_orders_partial(b, 3) for b in batches], ignore_index=True
            )
            outs = [
                topk_orders_final(g, 3)
                for _, g in parts.groupby("o_custkey", sort=False)
            ]
            return (
                pd.concat(outs, ignore_index=True)
                .sort_values(["o_custkey", "rank"])
                .reset_index(drop=True)
            )

        ref = run([df])
        for batches in _splits(df, rng):
            pd.testing.assert_frame_equal(run(batches), ref)
        # window oracle
        w = df.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
        )
        expected = w.groupby("o_custkey", sort=False).head(3)
        assert set(map(tuple, ref[["o_custkey", "o_orderkey"]].to_numpy())) == set(
            map(tuple, expected[["o_custkey", "o_orderkey"]].to_numpy())
        )


class TestKeepLongestSplitInvariance:
    def test_any_split_same_representatives(self):
        rng = np.random.default_rng(8)
        n = 300
        prefixes = [f"page-{i:02d} " for i in range(12)]
        texts = [
            rng.choice(prefixes) + "x" * int(rng.integers(0, 50)) for _ in range(n)
        ]
        df = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "text": texts,
                "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
            }
        )

        def run(batches):
            parts = pd.concat(
                [keep_longest_partial(b, 64) for b in batches], ignore_index=True
            )
            outs = [keep_longest_final(g) for _, g in parts.groupby("prefix", sort=False)]
            return (
                pd.concat(outs, ignore_index=True)
                .sort_values("doc_id")
                .reset_index(drop=True)
            )

        ref = run([df])
        for batches in _splits(df, rng):
            pd.testing.assert_frame_equal(run(batches), ref)
        # every group's representative is its longest text (min doc_id tie)
        w = df.assign(prefix=df["text"].str.slice(0, 64)).sort_values(
            ["n_chars", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        expected = w.groupby("prefix", sort=False).head(1)
        assert set(ref["doc_id"]) == set(expected["doc_id"])
        assert int(ref["n_variants"].sum()) == n
