"""Kernel-level tests for pipelines/queries5.py — pure pandas, no Ray.

Each kernel gets a known-answer fixture plus the house split/order
invariance checks: whole-group kernels must be row-order independent
(they sort internally), and per-batch combiners must be split-invariant
(partials merge associatively)."""

import math

import numpy as np
import pandas as pd

from signalsharp_ray.pipelines.queries5 import (
    bigram_partial,
    iqr_outliers_kernel,
    markov_user_kernel,
    sax_series_kernel,
    token_entropy_batch,
)

US = 1_000_000
HOUR_US = 3_600_000_000


def _user_df(types, ids=None):
    n = len(types)
    return pd.DataFrame(
        {
            "user_id": np.full(n, 1, dtype=np.int64),
            "ts_us": np.arange(n, dtype=np.int64) * US,
            "event_id": np.asarray(ids if ids is not None else range(n), np.int64),
            "event_type": types,
        }
    )


def test_markov_known_answer():
    out = markov_user_kernel(_user_df(["a", "b", "a", "b", "c"]))
    got = {(r.from_type, r.to_type): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 2, ("b", "a"): 1, ("b", "c"): 1}


def test_markov_orders_by_time_then_event_id():
    # same ts for rows 1 and 2 -> event_id breaks the tie
    df = _user_df(["a", "b", "c"], ids=[0, 2, 1])
    df.loc[1:2, "ts_us"] = 5 * US
    out = markov_user_kernel(df)
    got = {(r.from_type, r.to_type): r.n for r in out.itertuples()}
    assert got == {("a", "c"): 1, ("c", "b"): 1}


def test_markov_row_order_invariant():
    rng = np.random.default_rng(11)
    df = _user_df(list(rng.choice(["a", "b", "c"], 60)))
    shuffled = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    a = markov_user_kernel(df).sort_values(["from_type", "to_type"]).reset_index(drop=True)
    b = (
        markov_user_kernel(shuffled)
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_markov_single_event_user_emits_nothing():
    assert len(markov_user_kernel(_user_df(["a"]))) == 0


def test_markov_bucket_kernel_matches_per_user_map():
    from signalsharp_ray.pipelines.queries5 import markov_bucket_kernel

    rng = np.random.default_rng(13)
    frames = []
    for uid in range(5):
        df = _user_df(list(rng.choice(["a", "b", "c", "d"], 40)))
        df["user_id"] = np.int64(uid)
        frames.append(df)
    bucket = pd.concat(frames, ignore_index=True).sample(frac=1.0, random_state=1)
    whole = (
        markov_bucket_kernel(bucket)
        .groupby(["from_type", "to_type"])["n"]
        .sum()
        .sort_index()
    )
    per_user = (
        pd.concat([markov_user_kernel(f) for f in frames], ignore_index=True)
        .groupby(["from_type", "to_type"])["n"]
        .sum()
        .sort_index()
    )
    pd.testing.assert_series_equal(whole, per_user)


def test_markov_bucket_kernel_no_cross_user_pairs():
    from signalsharp_ray.pipelines.queries5 import markov_bucket_kernel

    # two single-event users -> no pairs at all
    df = pd.DataFrame(
        {
            "user_id": np.array([1, 2], dtype=np.int64),
            "ts_us": np.array([0, 1], dtype=np.int64),
            "event_id": np.array([0, 1], dtype=np.int64),
            "event_type": ["a", "b"],
        }
    )
    assert len(markov_bucket_kernel(df)) == 0


def test_token_entropy_uniform_and_degenerate():
    batch = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["a b c d", "x x x x", "", "y"],
        }
    )
    out = token_entropy_batch(batch).set_index("doc_id")
    # 4 distinct tokens once each -> H = ln(4)
    assert out.loc[1, "entropy"] == round(math.log(4.0), 6)
    assert out.loc[1, "n_tokens"] == 4 and out.loc[1, "n_distinct"] == 4
    # one token repeated -> H = 0
    assert out.loc[2, "entropy"] == 0.0
    # empty text emits no row; single token -> ln(1) = 0
    assert 3 not in out.index
    assert out.loc[4, "entropy"] == 0.0


def test_token_entropy_split_invariant():
    texts = ["the cat sat", "the the the dog", "cat cat mouse mouse mouse"]
    whole = token_entropy_batch(pd.DataFrame({"doc_id": [1, 2, 3], "text": texts}))
    parts = pd.concat(
        [
            token_entropy_batch(pd.DataFrame({"doc_id": [i + 1], "text": [t]}))
            for i, t in enumerate(texts)
        ],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(whole, parts)


def _series_df(counts):
    n = len(counts)
    return pd.DataFrame(
        {
            "event_type": ["a"] * n,
            "bucket_ts": pd.to_datetime(np.arange(n, dtype=np.int64) * HOUR_US, unit="us"),
            "count": np.asarray(counts, np.int64),
        }
    )


def test_sax_constant_series_is_all_b():
    out = sax_series_kernel(_series_df([5] * 48))
    assert list(out["sax"]) == ["b", "b"]
    assert list(out["seg_len"]) == [24, 24]


def test_sax_step_series_splits_low_high():
    out = sax_series_kernel(_series_df([0] * 24 + [100] * 24))
    # z of the low day is -1, high day +1 -> letters a and d
    assert list(out["sax"]) == ["a", "d"]


def test_sax_ragged_tail_and_zero_fill():
    # 30 hourly buckets -> segments of 24 and 6; missing buckets zero-fill
    df = _series_df([1] * 30)
    df = df[df.index != 5].reset_index(drop=True)  # drop one bucket -> dense 0
    out = sax_series_kernel(df)
    assert list(out["seg_len"]) == [24, 6]
    assert len(out) == 2


def test_sax_row_order_invariant():
    rng = np.random.default_rng(5)
    df = _series_df(list(rng.integers(0, 50, 72)))
    shuffled = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        sax_series_kernel(df), sax_series_kernel(shuffled)
    )


def test_iqr_outliers_known_answer():
    # 0..99 plus one huge outlier
    v = list(range(100)) + [10_000]
    df = pd.DataFrame({"event_type": ["a"] * 101, "value": np.asarray(v, float)})
    out = iqr_outliers_kernel(df)
    assert out["n_outliers"].iloc[0] == 1
    assert out["n_events"].iloc[0] == 101
    q1, q3 = np.quantile(np.asarray(v, float), 0.25), np.quantile(
        np.asarray(v, float), 0.75
    )
    assert out["q1"].iloc[0] == q1 and out["q3"].iloc[0] == q3


def test_iqr_outliers_no_outliers():
    df = pd.DataFrame({"event_type": ["a"] * 8, "value": [1.0] * 8})
    out = iqr_outliers_kernel(df)
    assert out["n_outliers"].iloc[0] == 0
    assert out["outlier_pct"].iloc[0] == 0.0


def test_bigram_partial_counts_and_doc_boundary():
    batch = pd.DataFrame({"text": ["a b c", "c a"]})
    out = bigram_partial(batch).set_index("bigram")["n"]
    # "c" (end of doc 1) never pairs with "c" (start of doc 2)
    assert out.to_dict() == {"a b": 1, "b c": 1, "c a": 1}


def test_bigram_partial_split_invariant_across_docs():
    texts = ["the cat sat on the mat", "the dog", "cat sat cat sat"]
    whole = (
        bigram_partial(pd.DataFrame({"text": texts}))
        .groupby("bigram")["n"]
        .sum()
        .sort_index()
    )
    parts = (
        pd.concat(
            [bigram_partial(pd.DataFrame({"text": [t]})) for t in texts],
            ignore_index=True,
        )
        .groupby("bigram")["n"]
        .sum()
        .sort_index()
    )
    pd.testing.assert_series_equal(whole, parts)


def test_bigram_partial_empty_and_single_token():
    out = bigram_partial(pd.DataFrame({"text": ["", "solo", None]}))
    assert len(out) == 0


def test_lttb_grid_short_series_passthrough():
    from signalsharp_ray.pipelines.queries5 import lttb_grid_kernel

    out = lttb_grid_kernel(_series_df([3] * 20))
    assert list(out["idx"]) == list(range(20))
    assert list(out["y"]) == [3] * 20


def test_lttb_grid_selects_n_out_and_keeps_endpoints():
    from signalsharp_ray.pipelines.queries5 import _LTTB_N_OUT, lttb_grid_kernel

    rng = np.random.default_rng(9)
    out = lttb_grid_kernel(_series_df(list(rng.integers(0, 100, 400))))
    assert len(out) == _LTTB_N_OUT
    assert out["idx"].iloc[0] == 0 and out["idx"].iloc[-1] == 399
    assert out["idx"].is_monotonic_increasing


def test_gini_uniform_is_zero():
    from signalsharp_ray.pipelines.queries5 import gini_type_kernel

    df = pd.DataFrame(
        {
            "event_type": ["a"] * 10,
            "user_id": np.arange(10, dtype=np.int64),
            "cnt": np.full(10, 7, dtype=np.int64),
        }
    )
    assert gini_type_kernel(df)["gini"].iloc[0] == 0.0


def test_gini_concentration_approaches_one():
    from signalsharp_ray.pipelines.queries5 import gini_type_kernel

    # one user holds ~all traffic -> G near (n-1)/n
    df = pd.DataFrame(
        {
            "event_type": ["a"] * 100,
            "user_id": np.arange(100, dtype=np.int64),
            "cnt": np.array([1] * 99 + [100_000], dtype=np.int64),
        }
    )
    assert gini_type_kernel(df)["gini"].iloc[0] > 0.97


def test_burstiness_metronome_is_minus_one():
    from signalsharp_ray.pipelines.queries5 import burstiness_kernel

    df = pd.DataFrame(
        {
            "event_type": ["a"] * 20,
            "ts_us": np.arange(20, dtype=np.int64) * 1_000_000,
            "event_id": np.arange(20, dtype=np.int64),
        }
    )
    out = burstiness_kernel(df)
    assert out["burstiness"].iloc[0] == -1.0
    assert out["mean_gap_us"].iloc[0] == 1_000_000.0


def test_burstiness_all_same_timestamp_emits_nothing():
    # every gap zero -> B = 0/0; must drop the row (like the oracle's
    # HAVING s > 0), not raise ZeroDivisionError
    from signalsharp_ray.pipelines.queries5 import burstiness_kernel

    df = pd.DataFrame(
        {
            "event_type": ["a"] * 5,
            "ts_us": np.full(5, 42, dtype=np.int64),
            "event_id": np.arange(5, dtype=np.int64),
        }
    )
    assert len(burstiness_kernel(df)) == 0


def test_burstiness_single_event_emits_nothing():
    from signalsharp_ray.pipelines.queries5 import burstiness_kernel

    df = pd.DataFrame({"event_type": ["a"], "ts_us": [0], "event_id": [0]})
    assert len(burstiness_kernel(df)) == 0


def test_strict_rank_score_quintiles():
    from signalsharp_ray.pipelines.queries5 import _strict_rank_score

    # 10 users, distinct values 0..9 (one each), higher better
    lut = _strict_rank_score(
        np.arange(10, dtype=np.int64), np.ones(10, dtype=np.int64), 10, True
    )
    assert lut[0] == 1 and lut[9] == 5
    assert [lut[v] for v in range(10)] == [1, 1, 2, 2, 3, 3, 4, 4, 5, 5]
    # lower better flips the order
    lut2 = _strict_rank_score(
        np.arange(10, dtype=np.int64), np.ones(10, dtype=np.int64), 10, False
    )
    assert lut2[0] == 5 and lut2[9] == 1


def test_strict_rank_score_ties_share():
    from signalsharp_ray.pipelines.queries5 import _strict_rank_score

    # all users tie -> everyone scores 1 (zero strictly worse)
    lut = _strict_rank_score(
        np.array([42], dtype=np.int64), np.array([10], dtype=np.int64), 10, True
    )
    assert lut[42] == 1


def test_lsh_identical_docs_pair_on_both_bands():
    from signalsharp_ray.pipelines.queries5 import lsh_band_batch, lsh_bucket_pairs

    text = "the quick brown fox jumps over the lazy dog again and again"
    bands = lsh_band_batch(pd.DataFrame({"doc_id": [1, 2], "text": [text, text]}))
    assert len(bands) == 4  # 2 docs x 2 bands
    pairs = pd.concat(
        [
            lsh_bucket_pairs(g)
            for _, g in bands.groupby(["band", "s_lo", "s_hi"], sort=False)
        ],
        ignore_index=True,
    )
    agg = pairs.groupby(["doc_a", "doc_b"])["n"].sum()
    assert agg.loc[(1, 2)] == 2


def test_lsh_unrelated_docs_do_not_pair():
    from signalsharp_ray.pipelines.queries5 import lsh_band_batch

    bands = lsh_band_batch(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    "completely different content about databases",
                    "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss",
                ],
            }
        )
    )
    keys = bands.groupby(["band", "s_lo", "s_hi"]).size()
    assert (keys == 1).all()


def test_ks_drift_identical_halves_is_zero():
    from signalsharp_ray.pipelines.queries5 import ks_drift_kernel

    # same distribution both halves -> D = 0
    cents = np.tile(np.array([100, 200, 300, 400], dtype=np.int64), 10)
    df = pd.DataFrame(
        {
            "event_type": ["a"] * 40,
            "ts_us": np.arange(40, dtype=np.int64),
            "cents": cents,
        }
    )
    out = ks_drift_kernel(df)
    assert out["d_num"].iloc[0] == 0 and out["ks_d"].iloc[0] == 0.0


def test_ks_drift_disjoint_halves_is_one():
    from signalsharp_ray.pipelines.queries5 import ks_drift_kernel

    # first half all 100s, second half all 900s -> D = 1
    df = pd.DataFrame(
        {
            "event_type": ["a"] * 20,
            "ts_us": np.arange(20, dtype=np.int64),
            "cents": np.array([100] * 10 + [900] * 10, dtype=np.int64),
        }
    )
    out = ks_drift_kernel(df)
    assert out["ks_d"].iloc[0] == 1.0
    assert out["n1"].iloc[0] == 10 and out["n2"].iloc[0] == 10


def test_ks_drift_matches_scipy_formula():
    from signalsharp_ray.pipelines.queries5 import ks_drift_kernel

    rng = np.random.default_rng(3)
    n = 200
    cents = rng.integers(0, 50, n).astype(np.int64)
    df = pd.DataFrame(
        {
            "event_type": ["a"] * n,
            "ts_us": np.arange(n, dtype=np.int64),
            "cents": cents,
        }
    )
    out = ks_drift_kernel(df)
    s1, s2 = np.sort(cents[:100]), np.sort(cents[100:])
    sup = np.unique(cents)
    d_ref = np.max(
        np.abs(
            np.searchsorted(s1, sup, side="right") / 100.0
            - np.searchsorted(s2, sup, side="right") / 100.0
        )
    )
    assert abs(out["d_num"].iloc[0] / (100.0 * 100.0) - d_ref) < 1e-12


def test_pareto_top_decile():
    from signalsharp_ray.pipelines.queries5 import pareto_type_kernel

    # 20 users: one with 1000 events, rest with 1 -> k=2, top share
    df = pd.DataFrame(
        {
            "event_type": ["a"] * 20,
            "user_id": np.arange(20, dtype=np.int64),
            "cnt": np.array([1000] + [1] * 19, dtype=np.int64),
        }
    )
    out = pareto_type_kernel(df)
    assert out["k_top"].iloc[0] == 2
    assert out["top_events"].iloc[0] == 1001
    assert out["total_events"].iloc[0] == 1019


def test_pareto_small_group_keeps_one_user():
    from signalsharp_ray.pipelines.queries5 import pareto_type_kernel

    df = pd.DataFrame(
        {
            "event_type": ["a"] * 3,
            "user_id": np.array([5, 6, 7], dtype=np.int64),
            "cnt": np.array([4, 2, 2], dtype=np.int64),
        }
    )
    out = pareto_type_kernel(df)
    assert out["k_top"].iloc[0] == 1
    assert out["top_events"].iloc[0] == 4


def test_levenshtein_known_values():
    from signalsharp_ray.pipelines.queries5 import levenshtein_int

    assert levenshtein_int("kitten", "sitting") == 3
    assert levenshtein_int("", "abc") == 3
    assert levenshtein_int("abc", "") == 3
    assert levenshtein_int("abc", "abc") == 0
    assert levenshtein_int("flaw", "lawn") == 2


def test_scd2_intervals_and_current_flag():
    from signalsharp_ray.pipelines.queries5 import _SCD2_OPEN_US, scd2_bucket_kernel

    df = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 1, 2], dtype=np.int64),
            "event_type": ["a", "a", "b", "a"],
            "ts_us": np.array([100, 200, 150, 300], dtype=np.int64),
            "event_id": np.array([0, 1, 2, 3], dtype=np.int64),
            "value": np.array([1.0, 2.0, 3.0, 4.0]),
        }
    )
    out = scd2_bucket_kernel(df)
    # (1, a): first row closes at 200, second open; (1, b) and (2, a) open
    u1a = out[(out["user_id"] == 1) & (out["event_type"] == "a")].sort_values(
        "valid_from"
    )
    assert u1a["valid_to"].iloc[0] == np.datetime64(200, "us")
    assert u1a["is_current"].tolist() == [0, 1]
    assert u1a["valid_to"].iloc[1] == np.datetime64(_SCD2_OPEN_US, "us")
    assert out["is_current"].sum() == 3  # one open row per key


def test_scd2_row_order_invariant():
    from signalsharp_ray.pipelines.queries5 import scd2_bucket_kernel

    rng = np.random.default_rng(21)
    n = 60
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 4, n).astype(np.int64),
            "event_type": rng.choice(["a", "b"], n),
            "ts_us": rng.choice(np.arange(10_000), n, replace=False).astype(np.int64),
            "event_id": np.arange(n, dtype=np.int64),
            "value": rng.normal(size=n),
        }
    )
    shuffled = df.sample(frac=1.0, random_state=2).reset_index(drop=True)
    a = scd2_bucket_kernel(df).reset_index(drop=True)
    b = scd2_bucket_kernel(shuffled).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_bloom_positions_match_md5_reference():
    import hashlib

    from signalsharp_ray.pipelines.queries5 import _BLOOM_M, _bloom_positions

    texts = pd.Series(["hello", "world", ""])
    pos = _bloom_positions(texts)
    assert len(pos) == 3
    for i, p in enumerate(pos):
        for t, got in zip(texts, p):
            ref = (
                int.from_bytes(
                    hashlib.md5(f"b{i}:{t}".encode()).digest()[:8], "little"
                )
                % _BLOOM_M
            )
            assert int(got) == ref


def test_bloom_no_false_negatives_construction():
    # any text's own positions are, by construction, a subset of the
    # filter built from a set containing it
    from signalsharp_ray.pipelines.queries5 import _bloom_positions

    corpus = pd.Series(["doc one text", "doc two text", "third document"])
    bits = set()
    for p in _bloom_positions(corpus):
        bits.update(int(x) for x in p)
    probe = _bloom_positions(pd.Series(["doc two text"]))
    assert all(int(p[0]) in bits for p in probe)


def test_croston_known_answer():
    from signalsharp_ray.pipelines.queries5 import croston_user_kernel

    # demands 2 at day 0 and 4 at day 2, alpha=0.2:
    # init z=2, p=1; then z=2+.2*(4-2)=2.4, p=1+.2*(2-1)=1.2 -> f=2.0
    df = pd.DataFrame(
        {
            "user_id": np.array([7, 7], dtype=np.int64),
            "day_idx": np.array([0, 2], dtype=np.int64),
            "n": np.array([2, 4], dtype=np.int64),
        }
    )
    out = croston_user_kernel(df)
    assert out["z_level"].iloc[0] == 2.4
    assert out["p_interval"].iloc[0] == 1.2
    assert out["croston_forecast"].iloc[0] == 2.0
    assert out["n_demand_days"].iloc[0] == 2


def test_croston_single_demand_day():
    from signalsharp_ray.pipelines.queries5 import croston_user_kernel

    # one demand at day 4 -> z = d, p = 5 (interval from virtual day -1)
    df = pd.DataFrame(
        {
            "user_id": np.array([1], dtype=np.int64),
            "day_idx": np.array([4], dtype=np.int64),
            "n": np.array([3], dtype=np.int64),
        }
    )
    out = croston_user_kernel(df)
    assert out["z_level"].iloc[0] == 3.0
    assert out["p_interval"].iloc[0] == 5.0


def test_croston_row_order_invariant():
    from signalsharp_ray.pipelines.queries5 import croston_user_kernel

    df = pd.DataFrame(
        {
            "user_id": np.full(5, 1, dtype=np.int64),
            "day_idx": np.array([0, 3, 7, 12, 20], dtype=np.int64),
            "n": np.array([1, 5, 2, 8, 3], dtype=np.int64),
        }
    )
    shuffled = df.sample(frac=1.0, random_state=4).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        croston_user_kernel(df), croston_user_kernel(shuffled)
    )


def test_session_entry_exit_pairs():
    from signalsharp_ray.pipelines.queries5 import session_entry_exit_kernel

    HOUR = 3_600_000_000
    # two sessions: [view, click, purchase] then (2h later) [error]
    df = pd.DataFrame(
        {
            "user_id": np.full(4, 1, dtype=np.int64),
            "ts_us": np.array([0, 60_000_000, 120_000_000, 2 * HOUR], dtype=np.int64),
            "event_id": np.arange(4, dtype=np.int64),
            "event_type": ["view", "click", "purchase", "error"],
        }
    )
    out = session_entry_exit_kernel(df).set_index(["entry_type", "exit_type"])["n"]
    assert out.to_dict() == {("view", "purchase"): 1, ("error", "error"): 1}


def test_copurchase_pairs_distinct_and_cross_order():
    from signalsharp_ray.pipelines.queries5 import copurchase_bucket_kernel

    df = pd.DataFrame(
        {
            "orderkey": np.array([1, 1, 1, 2, 2, 3], dtype=np.int64),
            # order 1 has a duplicate part 10 (two lines) -> counted once
            "partkey": np.array([10, 10, 20, 10, 20, 30], dtype=np.int64),
        }
    )
    out = copurchase_bucket_kernel(df).set_index(["part_a", "part_b"])["n"]
    assert out.to_dict() == {(10, 20): 2}  # orders 1 and 2; order 3 has 1 part


def test_copurchase_matches_per_order_triu():
    from signalsharp_ray.pipelines.queries5 import copurchase_bucket_kernel

    rng = np.random.default_rng(31)
    rows = []
    for ok in range(200):
        for pk in rng.choice(50, rng.integers(1, 8), replace=False):
            rows.append((ok, int(pk)))
    df = pd.DataFrame(rows, columns=["orderkey", "partkey"]).astype(np.int64)
    got = (
        copurchase_bucket_kernel(df)
        .groupby(["part_a", "part_b"])["n"]
        .sum()
        .sort_index()
    )
    want: dict = {}
    for _, g in df.groupby("orderkey"):
        ps = np.unique(g["partkey"].to_numpy())
        for i in range(ps.size):
            for j in range(i + 1, ps.size):
                want[(ps[i], ps[j])] = want.get((ps[i], ps[j]), 0) + 1
    assert got.to_dict() == want


def test_bounce_rate_kernel():
    from signalsharp_ray.pipelines.queries5 import bounce_user_kernel

    HOUR = 3_600_000_000
    # session 1: [view, click] (no bounce); session 2: [view] (bounce)
    df = pd.DataFrame(
        {
            "user_id": np.full(3, 1, dtype=np.int64),
            "ts_us": np.array([0, 60_000_000, 2 * HOUR], dtype=np.int64),
            "event_id": np.arange(3, dtype=np.int64),
            "event_type": ["view", "click", "view"],
        }
    )
    out = bounce_user_kernel(df).set_index("entry_type")
    assert out.loc["view", "n_sessions"] == 2
    assert out.loc["view", "n_bounces"] == 1


def test_embedding_norms_known_values():
    from signalsharp_ray.pipelines.queries5 import embedding_norms_batch

    batch = pd.DataFrame(
        {
            "vec_id": np.array([1, 2], dtype=np.int64),
            "embedding": [np.array([3.0, 4.0], np.float32),
                          np.array([1.0, 0.0, 0.0], np.float32)],
            "label": ["a", "b"],
        }
    )
    out = embedding_norms_batch(batch)
    assert out["l2_norm"].tolist() == [5.0, 1.0]


def test_scd2_open_rows_one_per_key():
    from signalsharp_ray.pipelines.queries5 import scd2_bucket_kernel

    rng = np.random.default_rng(8)
    n = 40
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 6, n).astype(np.int64),
            "event_type": rng.choice(["a", "b", "c"], n),
            "ts_us": rng.choice(np.arange(100_000), n, replace=False).astype(np.int64),
            "event_id": np.arange(n, dtype=np.int64),
            "value": rng.normal(size=n),
        }
    )
    out = scd2_bucket_kernel(df)
    n_keys = df.groupby(["user_id", "event_type"]).ngroups
    assert out["is_current"].sum() == n_keys
    # intervals within a key must chain: each valid_to equals the next
    # valid_from (except the open row)
    for _, g in out.groupby(["user_id", "event_type"]):
        g = g.sort_values("valid_from")
        closed = g.iloc[:-1]
        nxt = g["valid_from"].iloc[1:].to_numpy()
        assert (closed["valid_to"].to_numpy() == nxt).all()


def test_weekend_limb_roundtrip_large():
    # limb split/reconstruct must be exact for cents^2 sums beyond int64
    q = 3 * (10**19) + 123456789  # > 2^63
    hi, lo = q >> 32, q & ((1 << 32) - 1)
    assert (hi << 32) + lo == q


def test_abc_classes_monotone():
    # classes must be non-increasing in revenue order: A..A B..B C..C
    # (kernel-level check via the same integer cut logic)
    total = 1000
    prev_cum = np.array([0, 700, 801, 949, 951])
    cls = np.where(
        prev_cum * 100 < 80 * total, "A",
        np.where(prev_cum * 100 < 95 * total, "B", "C"),
    )
    assert list(cls) == ["A", "A", "B", "B", "C"]


def test_max_drawdown_known_answer():
    from signalsharp_ray.pipelines.queries5 import max_drawdown_kernel

    DAY = 86_400_000_000
    # counts 10, 50, 20, 5, 30: peak 50 -> trough 5 => drawdown 45
    df = pd.DataFrame(
        {
            "event_type": ["a"] * 5,
            "bucket_ts": pd.to_datetime(np.arange(5, dtype=np.int64) * DAY, unit="us"),
            "count": np.array([10, 50, 20, 5, 30], dtype=np.int64),
        }
    )
    out = max_drawdown_kernel(df)
    assert out["max_drawdown"].iloc[0] == 45
    assert out["peak"].iloc[0] == 50
    assert out["trough_day"].iloc[0] == pd.Timestamp(3 * DAY, unit="us")
    assert out["drawdown_pct"].iloc[0] == 0.9


def test_max_drawdown_monotone_series_is_zero():
    from signalsharp_ray.pipelines.queries5 import max_drawdown_kernel

    DAY = 86_400_000_000
    df = pd.DataFrame(
        {
            "event_type": ["a"] * 4,
            "bucket_ts": pd.to_datetime(np.arange(4, dtype=np.int64) * DAY, unit="us"),
            "count": np.array([1, 2, 3, 4], dtype=np.int64),
        }
    )
    out = max_drawdown_kernel(df)
    assert out["max_drawdown"].iloc[0] == 0
    # earliest tie: day 0
    assert out["trough_day"].iloc[0] == pd.Timestamp(0, unit="us")


def test_lttb_grid_keeps_spike():
    # a huge spike mid-series must survive downsampling
    from signalsharp_ray.pipelines.queries5 import lttb_grid_kernel

    y = [1] * 400
    y[217] = 1000
    out = lttb_grid_kernel(_series_df(y))
    assert 217 in set(out["idx"])
