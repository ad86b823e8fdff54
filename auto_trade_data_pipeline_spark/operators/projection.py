"""P9: default-column projection — pre-create every derived output
column with its default, mirroring ``initialize_output_columns``
(``/root/reference/src/candle_to_calcs.py:316-350``): 0.0 everywhere
except ``is_no_trend`` = 1.0, only for columns not already present.

Under Spark this is a single ``select`` extension — pure metadata
until execution, zero data movement; Catalyst folds the literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.functions.cdl import ALL_PATTERNS

__all__ = ["initialize_output_columns", "DEFAULT_COLUMNS"]

#: The reference's 47 derived columns (``:318-329``) in order.
_DERIVED = (
    "typical_price", "adx", "di_pos", "di_neg", "di_diff", "macd", "macd_signal",
    "macd_diff", "psar", "psar_trend", "psar_reversal", "atr", "atr_norm",
    "atr_change", "high_volatility", "bb_upper", "bb_lower", "bb_mid", "bb_width",
    "bb_pos", "bb_breakout", "t3", "t3_slope", "is_uptrend", "is_downtrend",
    "is_no_trend", "candle_pattern_sum", "is_volume_spike", "rolling_avg_volume",
    "is_major_peak", "is_major_valley", "is_minor_peak", "is_minor_valley",
    "is_micro_peak", "is_micro_valley", "is_overnight_early", "is_overnight_late",
    "is_early_morning", "is_premarket_early", "is_premarket_morn", "is_morning",
    "is_late_morning", "is_midday", "is_early_afternoon", "is_late_afternoon",
    "is_closing", "is_afterhours",
)

#: Full default map: 47 derived + 59 CDL columns (``:330-345``).
DEFAULT_COLUMNS: dict[str, float] = {
    **{c: (1.0 if c == "is_no_trend" else 0.0) for c in _DERIVED},
    **{c: 0.0 for c in ALL_PATTERNS},
}


def initialize_output_columns(df: DataFrame) -> DataFrame:
    """Add every missing output column with its default (the
    reference's ``if col not in df.columns`` guard preserved)."""
    present = set(df.columns)
    additions = {
        name: F.lit(default)
        for name, default in DEFAULT_COLUMNS.items()
        if name not in present
    }
    return df.withColumns(additions) if additions else df
