"""Numeric kernels used inside the pandas-UDF operators: TA-Lib- and
scipy-compatible algorithms reimplemented in pure numpy (neither
library ships in this environment). Public algorithm specs only."""
