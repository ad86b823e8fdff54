"""The pandas_udf surface (SURVEY §2.10): Arrow-vectorized scalar and
grouped-aggregate UDFs.

The engine's hot paths are JVM expressions (typical price, VWAP live
in operators/candles.py and operators/windows.py as built-ins —
whole-stage-codegen'd, no Python). These UDFs exist because the
reference's "UDFs" are Python lambdas (VWAP group lambda,
``src/aggregator_candles.py:212``) and a user of this engine gets the
same extension points: write a vectorized kernel, Spark ships Arrow
batches through it. The parity tests pin each UDF to its expression
twin, so the two paths can never drift.

Rule of thumb encoded here: a pandas_udf is ~10-100x faster than a
row-at-a-time F.udf (Arrow batch transfer, numpy inside) but still
loses to a pure-JVM expression — use built-ins first, pandas_udf when
the math genuinely needs numpy/scipy, F.udf never.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql.functions import pandas_udf

__all__ = ["typical_price_udf", "vwap_agg_udf"]


@pandas_udf("double")
def typical_price_udf(high: pd.Series, low: pd.Series, close: pd.Series) -> pd.Series:
    """Vectorized-scalar form of W1 typical price (h+l+c)/3
    (``src/candle_to_calcs.py:386``). One Arrow batch in, one out."""
    return (high + low + close) / 3.0


@pandas_udf("double")
def vwap_agg_udf(price: pd.Series, volume: pd.Series) -> float:
    """Grouped-aggregate form of A3 VWAP: sum(p*v)/sum(v), None when
    the group's volume is zero (the reference's nullable-vwap rule,
    ``src/aggregator_candles.py:212,147``). Partial aggregation does
    NOT apply to pandas grouped-agg UDFs — the whole group's columns
    ship to Python, which is exactly why the production candle path
    uses the expression form; this is the extension-point surface."""
    v = float(volume.sum())
    if v <= 0:
        return None
    return float((price * volume).sum() / v)
