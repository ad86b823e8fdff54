"""Robust-statistics operator invariants vs numpy reference."""

from __future__ import annotations

import numpy as np

from auto_trade_data_pipeline_spark.operators.robust import MAD_K, robust_stats


def _df(spark, vals, group="A"):
    return spark.createDataFrame([(group, float(v)) for v in vals], "symbol string, price double")


def test_robust_stats_matches_numpy(spark):
    rng = np.random.RandomState(7)
    vals = np.concatenate([rng.normal(100, 2, 199), [500.0]])  # one gross outlier
    [row] = robust_stats(_df(spark, vals), "symbol", "price").collect()
    assert row.n == 200
    assert abs(row.med - np.percentile(vals, 50, method="linear")) < 1e-9
    assert abs(row.p01 - np.percentile(vals, 1, method="linear")) < 1e-9
    assert abs(row.p99 - np.percentile(vals, 99, method="linear")) < 1e-9
    mad = np.percentile(np.abs(vals - np.percentile(vals, 50)), 50, method="linear")
    assert abs(row.mad - mad) < 1e-9
    expected_out = int(np.sum(np.abs(vals - row.med) > 5.0 * MAD_K * mad))
    assert row.n_outliers == expected_out >= 1


def test_robust_stats_degenerate_scale(spark):
    # All-equal values: MAD = 0; the one deviant is an outlier.
    [row] = robust_stats(_df(spark, [5.0] * 50 + [6.0]), "symbol", "price").collect()
    assert row.mad == 0.0
    assert row.n_outliers == 1


def test_robust_stats_groups_are_independent(spark):
    a = [(f"S{i % 3}", float(i)) for i in range(90)]
    df = spark.createDataFrame(a, "symbol string, price double")
    rows = {r.symbol: r for r in robust_stats(df, "symbol", "price").collect()}
    assert set(rows) == {"S0", "S1", "S2"}
    for s, r in rows.items():
        grp = sorted(v for g, v in a if g == s)
        assert abs(r.med - np.percentile(grp, 50, method="linear")) < 1e-9
