"""LSH band-geometry tuning: curve math vs brute-force simulation,
and the chooser's behavior across thresholds."""

import numpy as np
import pytest

from raydedup.functions.lsh_tuning import (choose_bands,
                                           collision_probability,
                                           curve_threshold)


class TestCurveMath:
    def test_collision_probability_monte_carlo(self):
        # simulate banding directly: a band matches iff all r minhash
        # comparisons match (each w.p. s, independent across perms)
        rng = np.random.RandomState(7)
        b, r, s = 16, 8, 0.7
        trials = 20000
        per_perm = rng.random_sample((trials, b * r)) < s
        band_hit = per_perm.reshape(trials, b, r).all(axis=2).any(axis=1)
        sim = band_hit.mean()
        assert abs(sim - collision_probability(s, b, r)) < 0.01

    def test_monotone_in_s(self):
        ps = [collision_probability(s, 32, 4)
              for s in np.linspace(0, 1, 21)]
        assert all(a <= b + 1e-12 for a, b in zip(ps, ps[1:]))
        assert ps[0] == 0.0 and ps[-1] == 1.0

    def test_inflection_near_half_probability(self):
        for b, r in [(32, 4), (16, 8), (64, 2)]:
            t = curve_threshold(b, r)
            p = collision_probability(t, b, r)
            assert 0.3 < p < 0.8, (b, r, p)


class TestChooseBands:
    def test_recovers_shipped_default_at_tau08(self):
        # the default weight recovers the engine's shipped geometry,
        # and the result satisfies the config invariant b*r == n_perm
        assert choose_bands(0.8, 128) == (32, 4)
        assert choose_bands(0.7, 128) == (32, 4)

    def test_threshold_ladder(self):
        assert choose_bands(0.5, 128) == (64, 2)
        assert choose_bands(0.9, 128) == (16, 8)

    def test_exact_divisor_invariant(self):
        for tau in (0.3, 0.5, 0.8, 0.95):
            b, r = choose_bands(tau, 128)
            assert b * r == 128
        b, r = choose_bands(0.8, 100)
        assert b * r == 100

    def test_low_threshold_picks_fewer_rows(self):
        b_lo, r_lo = choose_bands(0.4, 128)
        b_hi, r_hi = choose_bands(0.9, 128)
        assert r_lo < r_hi          # steep curve further right needs
        assert b_lo > b_hi or r_lo < r_hi

    def test_recall_dominates(self):
        # at the chosen geometry, a true pair AT threshold is caught
        # with high probability for any threshold in a realistic range
        for tau in (0.5, 0.7, 0.8, 0.9):
            b, r = choose_bands(tau, 128)
            assert collision_probability(tau, b, r) > 0.9, (tau, b, r)

    def test_validation(self):
        with pytest.raises(ValueError):
            choose_bands(0.0)
        with pytest.raises(ValueError):
            choose_bands(1.5)
        with pytest.raises(ValueError):
            collision_probability(-0.1, 32, 4)
