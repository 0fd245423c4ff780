"""Scaling-artifact selection logic (no Spark needed): the reported pair
must be the true-median pass, immune to one contaminated pass in either
direction."""

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
