"""SCD2 history builder — island collapse, half-open chaining,
deterministic tie-break, current-row flag (operators/scd.py)."""

from __future__ import annotations

import datetime as dt

from auto_trade_data_pipeline_spark.operators.scd import scd2_from_changelog


def _T(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_scd2_islands_collapse_and_current_flag(spark):
    rows = [
        # key 1: A A B A -> islands A, B, A (consecutive dup collapsed)
        (1, _T("2024-01-01T00:00:00"), 10, "A"),
        (1, _T("2024-01-01T00:01:00"), 11, "A"),
        (1, _T("2024-01-01T00:02:00"), 12, "B"),
        (1, _T("2024-01-01T00:03:00"), 13, "A"),
        # key 2: single observation -> one open-ended current row
        (2, _T("2024-01-01T00:00:30"), 14, "Z"),
        # key 3: equal timestamps -> event id orders the history
        (3, _T("2024-01-01T00:05:00"), 16, "Y"),
        (3, _T("2024-01-01T00:05:00"), 15, "X"),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "eid", "state"])
    out = scd2_from_changelog(
        df, keys=("k",), ts_col="ts", state_cols=("state",), tiebreak=("eid",)
    )
    rows_out = sorted(out.collect(), key=lambda r: (r.k, r.valid_from, r.state))
    assert len(rows_out) == 6

    k1 = [r for r in rows_out if r.k == 1]
    assert [(r.state, r.is_current) for r in k1] == [("A", 0), ("B", 0), ("A", 1)]
    # half-open chaining: valid_to equals the next island's valid_from
    assert k1[0].valid_to == k1[1].valid_from and k1[1].valid_to == k1[2].valid_from
    assert k1[2].valid_to is None

    k2 = [r for r in rows_out if r.k == 2]
    assert [(r.state, r.is_current, r.valid_to) for r in k2] == [("Z", 1, None)]

    k3 = [r for r in rows_out if r.k == 3]
    assert [(r.state, r.is_current) for r in k3] == [("X", 0), ("Y", 1)]
    assert k3[0].valid_to == k3[1].valid_from


def test_scd2_single_exchange(spark):
    """The lag flag, island filter, and lead must share ONE hash
    exchange on the key — a second shuffle would reshuffle the whole
    log again at 100 TB."""
    df = spark.createDataFrame(
        [(1, _T("2024-01-01T00:00:00"), 1, "A")], ["k", "ts", "eid", "state"]
    )
    out = scd2_from_changelog(
        df, keys=("k",), ts_col="ts", state_cols=("state",), tiebreak=("eid",)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
