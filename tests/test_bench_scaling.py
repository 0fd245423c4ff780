"""Scaling-artifact selection logic (no Spark needed).

The headline estimator is ``best_per_level``: co-resident load only ever
LOWERS a probe's throughput, so per-level maxima over K interleaved
passes are the tightest clean-rate estimates and their ratio the cleanest
efficiency. ``median_pass`` (the r2 estimator, still used in analysis)
stays covered: it resists ONE contaminated pass but not a load wave that
poisons a majority of passes — exactly the failure best_per_level fixes.
"""

from __future__ import annotations

import bench


def _p(lo_rate: float, hi_rate: float) -> dict:
    return {2: {"turns_per_sec": lo_rate}, 8: {"turns_per_sec": hi_rate}}


def test_median_pass_resists_inflated_outlier():
    # pass2: contaminated 2-core side inflates efficiency to ~0.97
    passes = [_p(14000, 44000), _p(11500, 44800), _p(14200, 47600)]
    chosen = bench.median_pass(passes, 2, 8)
    assert chosen is passes[2]  # effs ≈ 0.786, 0.974, 0.838 → median 0.838


def test_median_pass_resists_deflated_outlier():
    # pass1: a lucky fast 2-core run drags efficiency down to ~0.77
    passes = [_p(16200, 50000), _p(14200, 47600), _p(14000, 46000)]
    chosen = bench.median_pass(passes, 2, 8)
    assert chosen is passes[2]  # effs ≈ 0.772, 0.838, 0.821 → median 0.821


def test_single_clean_pass_stands_alone():
    passes = [_p(14231, 47607)]
    assert bench.median_pass(passes, 2, 8) is passes[0]


def test_best_per_level_survives_majority_contamination():
    # the r2 failure mode: a load ramp poisons passes 2-3 progressively
    # (observed pass efficiencies 0.759/0.639/0.482); only pass 1's
    # 2-core probe and pass 1's 8-core probe are clean. best_per_level
    # recovers the clean pair regardless of which passes were hit.
    passes = [
        _p(14200, 47600),   # clean: eff 0.838
        _p(11900, 30500),   # wave arrives: both sides slowed
        _p(9800, 18900),    # fully poisoned
    ]
    best = bench.best_per_level(passes, 2, 8)
    assert best[2]["turns_per_sec"] == 14200
    assert best[8]["turns_per_sec"] == 47600
    assert abs(bench._pass_eff(best, 2, 8) - 0.838) < 0.001


def test_best_per_level_mixes_levels_across_passes():
    # the clean 2-core probe and clean 8-core probe may land in DIFFERENT
    # passes (interleaving means a short wave hits one side of a pass)
    passes = [_p(14200, 31000), _p(10100, 47600)]
    best = bench.best_per_level(passes, 2, 8)
    assert best[2]["turns_per_sec"] == 14200
    assert best[8]["turns_per_sec"] == 47600


def test_best_per_level_never_below_any_pass_efficiency_pairing():
    # max/(4*max) uses the fastest N-core probe in the DENOMINATOR, so the
    # estimator cannot inflate efficiency above what a fully-clean paired
    # run would report (a slow contaminated N probe is never selected)
    passes = [_p(14200, 47600), _p(11500, 44800)]
    best_eff = bench._pass_eff(bench.best_per_level(passes, 2, 8), 2, 8)
    # pairing pass2's slow lo with pass1's fast hi would claim 1.03 —
    # best_per_level instead pairs the two maxima: 47600/(4*14200)=0.838
    assert best_eff < 0.85


def _pb(lo_rate, hi_rate, lo_batches, hi_batches):
    return {
        2: {"turns_per_sec": lo_rate, "batch_rates": lo_batches},
        8: {"turns_per_sec": hi_rate, "batch_rates": hi_batches},
    }


def test_best_batch_rate_survives_probe_level_contamination():
    # no single probe is fully clean (every whole-run rate is depressed),
    # but each level has at least one clean micro-batch somewhere
    passes = [
        _pb(11000, 26000, [11000, 14800, 9000], [26000, 30000, 29000]),
        _pb(12000, 31000, [12500, 13900, 12100], [47500, 31000, 22000]),
    ]
    best = bench.best_batch_rate_per_level(passes, 2, 8)
    assert best == {2: 14800, 8: 47500}
    assert abs(best[8] / (4 * best[2]) - 0.802) < 0.001


def test_best_batch_rate_denominator_uses_fastest_n_batch():
    # the fastest N-core batch lands in the denominator, so a slowed
    # N-core probe cannot inflate the ratio
    passes = [
        _pb(9000, 47600, [9000, 9100], [47600, 45000]),
        _pb(14200, 40000, [14800, 14200], [40000, 39000]),
    ]
    best = bench.best_batch_rate_per_level(passes, 2, 8)
    assert best[2] == 14800  # NOT the contaminated 9k side
    assert best[8] / (4 * best[2]) < 0.81
