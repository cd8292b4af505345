"""Error-bound and merge-invariance tests for the mergeable sketches
(stages/sketches.py) — pure numpy, no Ray session."""

import numpy as np
import pytest

from signalsharp_ray.stages.sketches import HyperLogLog, TDigestLite


class TestTDigest:
    def test_quantile_error_bound(self):
        rng = np.random.default_rng(0)
        v = rng.normal(100, 25, 50_000)
        d = TDigestLite.of(v, compression=100)
        for q in (0.01, 0.25, 0.5, 0.75, 0.95, 0.99):
            est = d.quantile(q)
            # rank error: the estimate's true rank must be within 1% of q
            rank = np.mean(v <= est)
            assert abs(rank - q) < 0.01, (q, est, rank)

    def test_merge_matches_whole(self):
        rng = np.random.default_rng(1)
        v = rng.exponential(10, 30_000)
        whole = TDigestLite.of(v)
        parts = np.array_split(v, 17)
        acc = TDigestLite(100)
        for p in parts:
            acc = acc.merge(TDigestLite.of(p))
        for q in (0.1, 0.5, 0.9, 0.99):
            r_whole = np.mean(v <= whole.quantile(q))
            r_acc = np.mean(v <= acc.quantile(q))
            assert abs(r_whole - q) < 0.01
            assert abs(r_acc - q) < 0.015  # merged digests stay bounded

    def test_state_growth_sublinear(self):
        # centroid count grows ~logarithmically with input size (measured
        # 458 -> 597 over a 16x input increase at compression=100): a 16x
        # bigger input must cost < 1.5x the state, and stay under 1 KB-ish
        rng = np.random.default_rng(2)
        small = TDigestLite.of(rng.random(50_000), compression=100)
        big = TDigestLite.of(rng.random(800_000), compression=100)
        assert big.means.size < small.means.size * 1.5
        assert big.means.size < 1000

    def test_roundtrip_and_edges(self):
        d = TDigestLite.of(np.array([5.0]))
        assert d.quantile(0.5) == 5.0
        blob = d.to_bytes()
        d2 = TDigestLite.from_bytes(blob)
        assert d2.quantile(0.9) == 5.0
        empty = TDigestLite(100)
        assert np.isnan(empty.quantile(0.5))


class TestHLL:
    def test_estimate_error(self):
        rng = np.random.default_rng(3)
        for n in (100, 5_000, 200_000):
            keys = rng.integers(0, 10**12, n)
            h = HyperLogLog(12)
            h.add_hashes(HyperLogLog.hash_keys(keys.tolist()))
            true = len(set(keys.tolist()))
            est = h.estimate()
            assert abs(est - true) / true < 0.05, (n, true, est)

    def test_merge_is_union_and_idempotent(self):
        rng = np.random.default_rng(4)
        a_keys = rng.integers(0, 10**9, 20_000)
        b_keys = rng.integers(0, 10**9, 20_000)
        a = HyperLogLog(12)
        a.add_hashes(HyperLogLog.hash_keys(a_keys.tolist()))
        b = HyperLogLog(12)
        b.add_hashes(HyperLogLog.hash_keys(b_keys.tolist()))
        u = a.merge(b)
        true_union = len(set(a_keys.tolist()) | set(b_keys.tolist()))
        assert abs(u.estimate() - true_union) / true_union < 0.05
        # idempotent: merging a into the union changes nothing
        again = u.merge(a)
        assert again.estimate() == u.estimate()

    def test_split_invariance(self):
        rng = np.random.default_rng(5)
        keys = rng.integers(0, 10**9, 30_000).tolist()
        whole = HyperLogLog(12)
        whole.add_hashes(HyperLogLog.hash_keys(keys))
        acc = HyperLogLog(12)
        for i in range(10):
            part = HyperLogLog(12)
            part.add_hashes(HyperLogLog.hash_keys(keys[i::10]))
            acc = acc.merge(part)
        # register-max merging is exact: bitwise-identical state
        np.testing.assert_array_equal(whole.registers, acc.registers)

    def test_roundtrip(self):
        h = HyperLogLog(12)
        h.add_hashes(HyperLogLog.hash_keys(list(range(1000))))
        h2 = HyperLogLog.from_bytes(h.to_bytes())
        assert h2.estimate() == h.estimate()


class TestMisraGries:
    def _stream(self, seed=0, n=20_000, domain=1_000):
        rng = np.random.default_rng(seed)
        return (rng.zipf(1.5, n) % domain).tolist()

    def _feed(self, mg, keys, n_chunks):
        import numpy as _np

        for chunk in _np.array_split(_np.asarray(keys), n_chunks):
            ks, cs = _np.unique(chunk, return_counts=True)
            mg.add_counts(ks.tolist(), cs.tolist())
        return mg

    def test_estimate_bounds(self):
        from collections import Counter

        from signalsharp_ray.stages.sketches import MisraGries

        keys = self._stream()
        true = Counter(keys)
        mg = self._feed(MisraGries(64), keys, 37)
        assert mg.offset <= len(keys) // 65 + 1  # N/(k+1)
        for k, est in mg.counters.items():
            assert est <= true[k] <= est + mg.offset

    def test_no_false_negatives_at_threshold(self):
        from collections import Counter

        from signalsharp_ray.stages.sketches import MisraGries

        keys = self._stream(seed=3)
        true = Counter(keys)
        mg = self._feed(MisraGries(64), keys, 23)
        threshold = 500
        cand = {k for k, _, _ in mg.candidates(threshold)}
        for k, t in true.items():
            if t >= threshold:
                assert k in cand, (k, t)

    def test_merge_preserves_bounds(self):
        from collections import Counter

        from signalsharp_ray.stages.sketches import MisraGries

        keys = self._stream(seed=9)
        true = Counter(keys)
        a = self._feed(MisraGries(64), keys[:9_000], 7)
        b = self._feed(MisraGries(64), keys[9_000:], 11)
        m = a.merge(b)
        assert len(m.counters) <= 64
        for k, est in m.counters.items():
            assert est <= true[k] <= est + m.offset

    def test_state_is_bounded(self):
        from signalsharp_ray.stages.sketches import MisraGries

        mg = MisraGries(16)
        mg.add_counts(list(range(10_000)), [1] * 10_000)
        assert len(mg.counters) <= 16
