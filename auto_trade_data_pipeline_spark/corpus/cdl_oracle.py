"""DuckDB SQL twin of the ENTIRE 59-pattern candle kernel
(`functions/cdl.py`) — every pattern rule re-expressed as lag
comparisons + trailing candle-setting averages, so the full
`candle_patterns_pack` (and its horizontal sum) is cross-engine
hash-checked, not just the 23-pattern subset.

The kernel is pure shifts + trailing means (no recursion), so SQL
expresses it exactly: NaN-poisoned comparisons on the numpy side
(head-of-series shifts, short average windows) map to NULL-propagated
comparisons whose CASE falls through to 0 — the same "not enough
history → no signal" semantics.

This file is an INDEPENDENT re-implementation against the same
published TA-Lib candle-setting semantics (reference only calls
`getattr(talib, name)` — src/candle_to_calcs.py:454-507); a mismatch
with the numpy kernel fails the oracle hash, which is the point.
"""

from __future__ import annotations

#: Base columns carried through the lag CTE, with their k=0 SQL name.
_BASES = {
    "o": "open",
    "h": "high",
    "l": "low",
    "c": "close",
    "rb": "rb",
    "us": "us",
    "ls": "ls",
    "top": "top",
    "bot": "bot",
    "color": "color",
    "rb10": "rb10",
    "hl10": "hl10",
    "hl5": "hl5",
    "ss10": "ss10",
}

_MAX_LAG = 4


def C(base: str, k: int = 0) -> str:
    """Column reference at lag k (0 = current row)."""
    return _BASES[base] if k == 0 else f"{base}_{k}"


def AVG(setting: str, k: int = 0) -> str:
    """Candle-setting average for bar i-k (functions/cdl.py:_SETTINGS)."""
    return {
        "bodylong": C("rb10", k),
        "bodyshort": C("rb10", k),
        "bodyverylong": f"3 * {C('rb10', k)}",
        "bodydoji": f"0.1 * {C('hl10', k)}",
        "shadowlong": C("rb", k),
        "shadowverylong": f"2 * {C('rb', k)}",
        "shadowshort": C("ss10", k),
        "shadowveryshort": f"0.1 * {C('hl10', k)}",
        "near": f"0.2 * {C('hl5', k)}",
        "far": f"0.6 * {C('hl5', k)}",
        "equal": f"0.05 * {C('hl5', k)}",
    }[setting]


def GUP(near: int, far: int) -> str:
    return f"({C('bot', near)} > {C('top', far)})"


def GDN(near: int, far: int) -> str:
    return f"({C('top', near)} < {C('bot', far)})"


def SIGN(cond: str, sign: str) -> str:
    return f"CASE WHEN {cond} THEN 100 * ({sign}) ELSE 0 END"


def _and(*parts: str) -> str:
    return "(" + " AND ".join(parts) + ")"


def _or(*parts: str) -> str:
    return "(" + " OR ".join(parts) + ")"


def _doji(k: int = 0) -> str:
    return f"{C('rb', k)} <= {AVG('bodydoji', k)}"


def _marubozu_at(k: int) -> str:
    return _and(
        f"{C('rb', k)} > {AVG('bodylong', k)}",
        f"{C('us', k)} < {AVG('shadowveryshort', k)}",
        f"{C('ls', k)} < {AVG('shadowveryshort', k)}",
    )


def _star_base(doji_star: bool) -> str:
    star = (
        f"rb_1 <= {AVG('bodydoji', 1)}" if doji_star else f"rb_1 < {AVG('bodyshort', 1)}"
    )
    return _and(f"rb_2 > {AVG('bodylong', 2)}", star, f"rb > {AVG('bodyshort')}")


def _exprs() -> dict[str, str]:
    p: dict[str, str] = {}

    # ---- single-candle -------------------------------------------------
    p["CDLDOJI"] = SIGN(_doji(), "1")
    p["CDLLONGLEGGEDDOJI"] = SIGN(
        _and(_doji(), _or(f"ls > {AVG('shadowlong')}", f"us > {AVG('shadowlong')}")), "1"
    )
    p["CDLDRAGONFLYDOJI"] = SIGN(
        _and(_doji(), f"us < {AVG('shadowveryshort')}", f"ls > {AVG('shadowveryshort')}"),
        "1",
    )
    p["CDLGRAVESTONEDOJI"] = SIGN(
        _and(_doji(), f"ls < {AVG('shadowveryshort')}", f"us > {AVG('shadowveryshort')}"),
        "1",
    )
    p["CDLTAKURI"] = SIGN(
        _and(_doji(), f"us < {AVG('shadowveryshort')}", f"ls > {AVG('shadowverylong')}"),
        "1",
    )
    p["CDLRICKSHAWMAN"] = SIGN(
        _and(
            _doji(),
            f"ls > {AVG('shadowlong')}",
            f"us > {AVG('shadowlong')}",
            f"bot <= low + (high - low) / 2 + {AVG('near')}",
            f"top >= low + (high - low) / 2 - {AVG('near')}",
        ),
        "1",
    )
    p["CDLHAMMER"] = SIGN(
        _and(
            f"rb < {AVG('bodyshort')}",
            f"ls > {AVG('shadowlong')}",
            f"us < {AVG('shadowveryshort')}",
            f"bot <= l_1 + {AVG('near', 1)}",
        ),
        "1",
    )
    p["CDLHANGINGMAN"] = SIGN(
        _and(
            f"rb < {AVG('bodyshort')}",
            f"ls > {AVG('shadowlong')}",
            f"us < {AVG('shadowveryshort')}",
            f"bot >= h_1 - {AVG('near', 1)}",
        ),
        "-1",
    )
    p["CDLINVERTEDHAMMER"] = SIGN(
        _and(
            f"rb < {AVG('bodyshort')}",
            f"us > {AVG('shadowlong')}",
            f"ls < {AVG('shadowveryshort')}",
            GDN(0, 1),
        ),
        "1",
    )
    p["CDLSHOOTINGSTAR"] = SIGN(
        _and(
            f"rb < {AVG('bodyshort')}",
            f"us > {AVG('shadowlong')}",
            f"ls < {AVG('shadowveryshort')}",
            GUP(0, 1),
        ),
        "-1",
    )
    p["CDLMARUBOZU"] = SIGN(_marubozu_at(0), "color")
    p["CDLCLOSINGMARUBOZU"] = SIGN(
        _and(
            f"rb > {AVG('bodylong')}",
            _or(
                _and("color = 1", f"us < {AVG('shadowveryshort')}"),
                _and("color = -1", f"ls < {AVG('shadowveryshort')}"),
            ),
        ),
        "color",
    )
    p["CDLBELTHOLD"] = SIGN(
        _and(
            f"rb > {AVG('bodylong')}",
            _or(
                _and("color = 1", f"ls < {AVG('shadowveryshort')}"),
                _and("color = -1", f"us < {AVG('shadowveryshort')}"),
            ),
        ),
        "color",
    )
    p["CDLHIGHWAVE"] = SIGN(
        _and(
            f"rb < {AVG('bodyshort')}",
            f"us > {AVG('shadowverylong')}",
            f"ls > {AVG('shadowverylong')}",
        ),
        "color",
    )
    p["CDLSPINNINGTOP"] = SIGN(
        _and(f"rb < {AVG('bodyshort')}", "us > rb", "ls > rb"), "color"
    )
    p["CDLSHORTLINE"] = SIGN(
        _and(
            f"rb < {AVG('bodyshort')}",
            f"us < {AVG('shadowshort')}",
            f"ls < {AVG('shadowshort')}",
        ),
        "color",
    )
    p["CDLLONGLINE"] = SIGN(
        _and(
            f"rb > {AVG('bodylong')}",
            f"us < {AVG('shadowshort')}",
            f"ls < {AVG('shadowshort')}",
        ),
        "color",
    )

    # ---- two-candle ----------------------------------------------------
    p["CDLHARAMI"] = SIGN(
        _and(
            f"rb_1 > {AVG('bodylong', 1)}",
            f"rb <= {AVG('bodyshort')}",
            "top < top_1",
            "bot > bot_1",
        ),
        "-color_1",
    )
    p["CDLHARAMICROSS"] = SIGN(
        _and(
            f"rb_1 > {AVG('bodylong', 1)}",
            f"rb <= {AVG('bodydoji')}",
            "top < top_1",
            "bot > bot_1",
        ),
        "-color_1",
    )
    p["CDLENGULFING"] = (
        "("
        + SIGN(_and("color = 1", "color_1 = -1", "close > o_1", "open < c_1"), "1")
        + ") + ("
        + SIGN(_and("color = -1", "color_1 = 1", "open > c_1", "close < o_1"), "-1")
        + ")"
    )
    p["CDLPIERCING"] = SIGN(
        _and(
            "color_1 = -1",
            f"rb_1 > {AVG('bodylong', 1)}",
            "color = 1",
            f"rb > {AVG('bodylong')}",
            "open < l_1",
            "close > c_1 + rb_1 * 0.5",
            "close < o_1",
        ),
        "1",
    )
    p["CDLDARKCLOUDCOVER"] = SIGN(
        _and(
            "color_1 = 1",
            f"rb_1 > {AVG('bodylong', 1)}",
            "color = -1",
            "open > h_1",
            "close > o_1",
            "close < c_1 - rb_1 * 0.5",
        ),
        "-1",
    )
    kick_both = _and(_marubozu_at(0), _marubozu_at(1), "color_1 = -color")
    p["CDLKICKING"] = (
        "("
        + SIGN(_and(kick_both, "color = 1", GUP(0, 1)), "1")
        + ") + ("
        + SIGN(_and(kick_both, "color = -1", GDN(0, 1)), "-1")
        + ")"
    )
    p["CDLKICKINGBYLENGTH"] = SIGN(
        _or(
            _and(kick_both, "color = 1", GUP(0, 1)),
            _and(kick_both, "color = -1", GDN(0, 1)),
        ),
        "CASE WHEN rb > rb_1 THEN color ELSE color_1 END",
    )
    p["CDLCOUNTERATTACK"] = SIGN(
        _and(
            "color_1 = -color",
            f"rb > {AVG('bodylong')}",
            f"rb_1 > {AVG('bodylong', 1)}",
            f"abs(close - c_1) <= {AVG('equal', 1)}",
        ),
        "color",
    )
    gss_base = _and(
        "color_1 = 1",
        "color = 1",
        f"rb >= rb_1 - {AVG('near', 1)}",
        f"rb <= rb_1 + {AVG('near', 1)}",
        f"open >= o_1 - {AVG('near', 1)}",
        f"open <= o_1 + {AVG('near', 1)}",
    )
    p["CDLGAPSIDESIDEWHITE"] = (
        "("
        + SIGN(_and(gss_base, GUP(1, 2), GUP(0, 2)), "1")
        + ") + ("
        + SIGN(_and(gss_base, GDN(1, 2), GDN(0, 2)), "-1")
        + ")"
    )
    p["CDLSEPARATINGLINES"] = SIGN(
        _and(
            "color_1 = -color",
            f"abs(open - o_1) <= {AVG('equal', 1)}",
            f"rb > {AVG('bodylong')}",
            _or(
                _and("color = 1", f"ls < {AVG('shadowveryshort')}"),
                _and("color = -1", f"us < {AVG('shadowveryshort')}"),
            ),
        ),
        "color",
    )
    p["CDLONNECK"] = SIGN(
        _and(
            "color_1 = -1",
            f"rb_1 > {AVG('bodylong', 1)}",
            "color = 1",
            "open < l_1",
            f"abs(close - l_1) <= {AVG('equal', 1)}",
        ),
        "-1",
    )
    p["CDLINNECK"] = SIGN(
        _and(
            "color_1 = -1",
            f"rb_1 > {AVG('bodylong', 1)}",
            "color = 1",
            "open < l_1",
            "close >= c_1",
            f"close <= c_1 + {AVG('equal', 1)}",
        ),
        "-1",
    )
    p["CDLTHRUSTING"] = SIGN(
        _and(
            "color_1 = -1",
            f"rb_1 > {AVG('bodylong', 1)}",
            "color = 1",
            "open < l_1",
            f"close > c_1 + {AVG('equal', 1)}",
            "close <= c_1 + rb_1 * 0.5",
        ),
        "-1",
    )
    p["CDLSTALLEDPATTERN"] = SIGN(
        _and(
            "color_2 = 1",
            "color_1 = 1",
            "color = 1",
            "close > c_1",
            "c_1 > c_2",
            f"rb_2 > {AVG('bodylong', 2)}",
            f"rb_1 > {AVG('bodylong', 1)}",
            f"us_1 < {AVG('shadowveryshort', 1)}",
            "o_1 > o_2",
            f"o_1 <= c_2 + {AVG('near', 2)}",
            f"rb < {AVG('bodyshort')}",
            f"open >= c_1 - rb - {AVG('near', 1)}",
        ),
        "-1",
    )
    p["CDLMATCHINGLOW"] = SIGN(
        _and("color_1 = -1", "color = -1", f"abs(close - c_1) <= {AVG('equal', 1)}"), "1"
    )
    brk_base = _and(
        f"rb_4 > {AVG('bodylong', 4)}",
        "color_4 = color_3",
        "color_3 = color_1",
        "color = -color_4",
    )
    p["CDLBREAKAWAY"] = (
        "("
        + SIGN(
            _and(
                brk_base,
                "color_4 = -1",
                GDN(3, 4),
                "h_2 < h_3",
                "l_2 < l_3",
                "h_1 < h_2",
                "l_1 < l_2",
                "close > o_3",
                "close < c_4",
            ),
            "1",
        )
        + ") + ("
        + SIGN(
            _and(
                brk_base,
                "color_4 = 1",
                GUP(3, 4),
                "h_2 > h_3",
                "l_2 > l_3",
                "h_1 > h_2",
                "l_1 > l_2",
                "close < o_3",
                "close > c_4",
            ),
            "-1",
        )
        + ")"
    )
    p["CDLUNIQUE3RIVER"] = SIGN(
        _and(
            f"rb_2 > {AVG('bodylong', 2)}",
            "color_2 = -1",
            "color_1 = -1",
            "c_1 > c_2",
            "o_1 <= o_2",
            "l_1 < l_2",
            f"rb < {AVG('bodyshort')}",
            "color = 1",
            "open > l_1",
        ),
        "1",
    )
    p["CDLHOMINGPIGEON"] = SIGN(
        _and(
            "color_1 = -1",
            "color = -1",
            f"rb_1 > {AVG('bodylong', 1)}",
            f"rb < {AVG('bodyshort')}",
            "open < o_1",
            "close > c_1",
        ),
        "1",
    )
    tsk_near = f"abs(rb_1 - rb) < {AVG('near', 1)}"
    p["CDLTASUKIGAP"] = (
        "("
        + SIGN(
            _and(
                GUP(1, 2),
                "color_1 = 1",
                "color = -1",
                "open < c_1",
                "open > o_1",
                "close < o_1",
                "close > top_2",
                tsk_near,
            ),
            "1",
        )
        + ") + ("
        + SIGN(
            _and(
                GDN(1, 2),
                "color_1 = -1",
                "color = 1",
                "open < o_1",
                "open > c_1",
                "close > o_1",
                "close < bot_2",
                tsk_near,
            ),
            "-1",
        )
        + ")"
    )

    # ---- three-candle --------------------------------------------------
    p["CDL3WHITESOLDIERS"] = SIGN(
        _and(
            f"us_2 < {AVG('shadowveryshort', 2)}",
            f"us_1 < {AVG('shadowveryshort', 1)}",
            f"us < {AVG('shadowveryshort')}",
            "color_2 = 1",
            "color_1 = 1",
            "color = 1",
            "close > c_1",
            "c_1 > c_2",
            "o_1 > o_2",
            f"o_1 <= c_2 + {AVG('near', 2)}",
            "open > o_1",
            f"open <= c_1 + {AVG('near', 1)}",
            f"rb_1 > rb_2 - {AVG('far', 2)}",
            f"rb > rb_1 - {AVG('far', 1)}",
        ),
        "1",
    )
    p["CDL3BLACKCROWS"] = SIGN(
        _and(
            f"ls_2 < {AVG('shadowveryshort', 2)}",
            f"ls_1 < {AVG('shadowveryshort', 1)}",
            f"ls < {AVG('shadowveryshort')}",
            "color_3 = 1",
            "color_2 = -1",
            "color_1 = -1",
            "color = -1",
            "c_2 < c_3",
            "c_1 < c_2",
            "close < c_1",
            "o_1 < o_2",
            "o_1 > c_2",
            "open < o_1",
            "open > c_1",
            "h_3 > c_2",
        ),
        "-1",
    )
    inside_harami = _and(
        f"rb_2 > {AVG('bodylong', 2)}",
        f"rb_1 <= {AVG('bodyshort', 1)}",
        "top_1 < top_2",
        "bot_1 > bot_2",
    )
    p["CDL3INSIDE"] = (
        "("
        + SIGN(_and(inside_harami, "color_2 = -1", "color = 1", "close > o_2"), "1")
        + ") + ("
        + SIGN(_and(inside_harami, "color_2 = 1", "color = -1", "close < o_2"), "-1")
        + ")"
    )
    p["CDLEVENINGSTAR"] = SIGN(
        _and(
            _star_base(False),
            "color_2 = 1",
            GUP(1, 2),
            "color = -1",
            "close < c_2 - rb_2 * 0.3",
        ),
        "-1",
    )
    p["CDLMORNINGSTAR"] = SIGN(
        _and(
            _star_base(False),
            "color_2 = -1",
            GDN(1, 2),
            "color = 1",
            "close > c_2 + rb_2 * 0.3",
        ),
        "1",
    )
    p["CDLEVENINGDOJISTAR"] = SIGN(
        _and(
            _star_base(True),
            "color_2 = 1",
            GUP(1, 2),
            "color = -1",
            "close < c_2 - rb_2 * 0.3",
        ),
        "-1",
    )
    p["CDLMORNINGDOJISTAR"] = SIGN(
        _and(
            _star_base(True),
            "color_2 = -1",
            GDN(1, 2),
            "color = 1",
            "close > c_2 + rb_2 * 0.3",
        ),
        "1",
    )
    p["CDLDOJISTAR"] = SIGN(
        _and(
            f"rb_1 > {AVG('bodylong', 1)}",
            f"rb <= {AVG('bodydoji')}",
            _or(
                _and("color_1 = 1", GUP(0, 1)),
                _and("color_1 = -1", GDN(0, 1)),
            ),
        ),
        "-color_1",
    )
    ab_base = _and(
        f"rb_2 > {AVG('bodylong', 2)}",
        f"rb_1 <= {AVG('bodydoji', 1)}",
        f"rb > {AVG('bodyshort')}",
    )
    p["CDLABANDONEDBABY"] = (
        "("
        + SIGN(
            _and(
                ab_base,
                "color_2 = -1",
                "color = 1",
                "close > c_2 + rb_2 * 0.3",
                "h_1 < l_2",
                "low > h_1",
            ),
            "1",
        )
        + ") + ("
        + SIGN(
            _and(
                ab_base,
                "color_2 = 1",
                "color = -1",
                "close < c_2 - rb_2 * 0.3",
                "l_1 > h_2",
                "high < l_1",
            ),
            "-1",
        )
        + ")"
    )
    tristar_dojis = _and(
        f"rb_2 <= {AVG('bodydoji', 2)}", f"rb_1 <= {AVG('bodydoji', 1)}", _doji()
    )
    p["CDLTRISTAR"] = (
        "("
        + SIGN(_and(tristar_dojis, GDN(1, 2), GUP(0, 1)), "1")
        + ") + ("
        + SIGN(_and(tristar_dojis, GUP(1, 2), GDN(0, 1)), "-1")
        + ")"
    )
    weakening = _or(
        _and(f"rb_1 < rb_2 - {AVG('far', 2)}", f"rb < rb_1 + {AVG('near', 1)}"),
        f"rb < rb_1 - {AVG('far', 1)}",
        _and(
            "rb < rb_1",
            "rb_1 < rb_2",
            _or(f"us > {AVG('shadowshort')}", f"us_1 > {AVG('shadowshort', 1)}"),
        ),
        _and("rb < rb_1", f"us > {AVG('shadowlong')}"),
    )
    p["CDLADVANCEBLOCK"] = SIGN(
        _and(
            "color_2 = 1",
            "color_1 = 1",
            "color = 1",
            "close > c_1",
            "c_1 > c_2",
            "o_1 > o_2",
            f"o_1 <= c_2 + {AVG('near', 2)}",
            "open > o_1",
            f"open <= c_1 + {AVG('near', 1)}",
            f"rb_2 > {AVG('bodylong', 2)}",
            f"us_2 < {AVG('shadowshort', 2)}",
            weakening,
        ),
        "-1",
    )
    p["CDLSTICKSANDWICH"] = SIGN(
        _and(
            "color_2 = -1",
            "color_1 = 1",
            "color = -1",
            "l_1 > c_2",
            f"abs(close - c_2) <= {AVG('equal', 2)}",
        ),
        "1",
    )
    p["CDL3STARSINSOUTH"] = SIGN(
        _and(
            "color_2 = -1",
            "color_1 = -1",
            "color = -1",
            f"rb_2 > {AVG('bodylong', 2)}",
            f"ls_2 > {AVG('shadowlong', 2)}",
            "rb_1 < rb_2",
            "o_1 > c_2",
            "o_1 <= h_2",
            "l_1 < c_2",
            "l_1 >= l_2",
            f"ls_1 > {AVG('shadowveryshort', 1)}",
            f"rb < {AVG('bodyshort')}",
            f"ls < {AVG('shadowveryshort')}",
            f"us < {AVG('shadowveryshort')}",
            "low > l_1",
            "high < h_1",
        ),
        "1",
    )
    p["CDLIDENTICAL3CROWS"] = SIGN(
        _and(
            f"ls_2 < {AVG('shadowveryshort', 2)}",
            f"ls_1 < {AVG('shadowveryshort', 1)}",
            f"ls < {AVG('shadowveryshort')}",
            "color_2 = -1",
            "color_1 = -1",
            "color = -1",
            "c_2 > c_1",
            "c_1 > close",
            f"abs(o_1 - c_2) <= {AVG('equal', 2)}",
            f"abs(open - c_1) <= {AVG('equal', 1)}",
        ),
        "-1",
    )
    ls3_base = _and(
        "color_3 = color_2",
        "color_2 = color_1",
        "color = -color_1",
        f"o_2 >= bot_3 - {AVG('near', 3)}",
        f"o_2 <= top_3 + {AVG('near', 3)}",
        f"o_1 >= bot_2 - {AVG('near', 2)}",
        f"o_1 <= top_2 + {AVG('near', 2)}",
    )
    p["CDL3LINESTRIKE"] = SIGN(
        _and(
            ls3_base,
            _or(
                _and("color_1 = 1", "c_1 > c_2", "c_2 > c_3", "open > c_1", "close < o_3"),
                _and("color_1 = -1", "c_1 < c_2", "c_2 < c_3", "open < c_1", "close > o_3"),
            ),
        ),
        "color_1",
    )
    p["CDL2CROWS"] = SIGN(
        _and(
            "color_2 = 1",
            f"rb_2 > {AVG('bodylong', 2)}",
            "color_1 = -1",
            GUP(1, 2),
            "color = -1",
            "open < o_1",
            "open > c_1",
            "close > o_2",
            "close < c_2",
        ),
        "-1",
    )
    p["CDLUPSIDEGAP2CROWS"] = SIGN(
        _and(
            "color_2 = 1",
            f"rb_2 > {AVG('bodylong', 2)}",
            "color_1 = -1",
            GUP(1, 2),
            "color = -1",
            "open > o_1",
            "close < c_1",
            "close > c_2",
        ),
        "-1",
    )

    # ---- multi-candle --------------------------------------------------
    rf_smalls = _and(
        f"rb_3 < {AVG('bodyshort', 3)}",
        f"rb_2 < {AVG('bodyshort', 2)}",
        f"rb_1 < {AVG('bodyshort', 1)}",
        "h_3 < h_4",
        "h_2 < h_4",
        "h_1 < h_4",
        "l_3 > l_4",
        "l_2 > l_4",
        "l_1 > l_4",
    )
    rf_cond = _and(f"rb_4 > {AVG('bodylong', 4)}", f"rb > {AVG('bodylong')}", rf_smalls)
    p["CDLRISEFALL3METHODS"] = (
        "("
        + SIGN(
            _and(
                rf_cond,
                "color_4 = 1",
                "color_3 = -1",
                "color_1 = -1",
                "c_3 > c_2",
                "c_2 > c_1",
                "color = 1",
                "open > c_1",
                "close > c_4",
            ),
            "1",
        )
        + ") + ("
        + SIGN(
            _and(
                rf_cond,
                "color_4 = -1",
                "color_3 = 1",
                "color_1 = 1",
                "c_3 < c_2",
                "c_2 < c_1",
                "color = -1",
                "open < c_1",
                "close < c_4",
            ),
            "-1",
        )
        + ")"
    )
    xg_base = _and(
        "color_2 = color_1",
        "color = -color_1",
        "open < top_1",
        "open > bot_1",
        "close < top_2",
        "close > bot_2",
    )
    p["CDLXSIDEGAP3METHODS"] = (
        "("
        + SIGN(_and(xg_base, "color_2 = 1", GUP(1, 2)), "1")
        + ") + ("
        + SIGN(_and(xg_base, "color_2 = -1", GDN(1, 2)), "-1")
        + ")"
    )
    p["CDLLADDERBOTTOM"] = SIGN(
        _and(
            "color_4 = -1",
            "color_3 = -1",
            "color_2 = -1",
            "o_3 < o_4",
            "c_3 < c_4",
            "o_2 < o_3",
            "c_2 < c_3",
            "color_1 = -1",
            f"us_1 > {AVG('shadowveryshort', 1)}",
            "color = 1",
            "open > o_1",
            "close > h_1",
        ),
        "1",
    )
    p["CDLCONCEALBABYSWALL"] = SIGN(
        _and(
            "color_3 = -1",
            "color_2 = -1",
            "color_1 = -1",
            "color = -1",
            f"ls_3 < {AVG('shadowveryshort', 3)}",
            f"us_3 < {AVG('shadowveryshort', 3)}",
            f"ls_2 < {AVG('shadowveryshort', 2)}",
            f"us_2 < {AVG('shadowveryshort', 2)}",
            GDN(1, 2),
            f"us_1 > {AVG('shadowveryshort', 1)}",
            "h_1 > c_2",
            "high > h_1",
            "low < l_1",
        ),
        "1",
    )
    hik_inside = _and("h_2 < h_3", "l_2 > l_3")
    p["CDLHIKKAKEMOD"] = (
        "("
        + SIGN(
            _and(
                hik_inside,
                f"c_2 <= l_3 + {AVG('near', 3)}",
                "h_1 < h_2",
                "l_1 < l_2",
                "close > h_1",
            ),
            "1",
        )
        + ") + ("
        + SIGN(
            _and(
                hik_inside,
                f"c_2 >= h_3 - {AVG('near', 3)}",
                "h_1 > h_2",
                "l_1 > l_2",
                "close < l_1",
            ),
            "-1",
        )
        + ")"
    )
    p["CDLMATHOLD"] = SIGN(
        _and(
            f"rb_4 > {AVG('bodylong', 4)}",
            f"rb_3 < {AVG('bodyshort', 3)}",
            f"rb_2 < {AVG('bodyshort', 2)}",
            f"rb_1 < {AVG('bodyshort', 1)}",
            "color_4 = 1",
            "color_3 = -1",
            GUP(3, 4),
            "least(l_3, l_2, l_1) > c_4 - rb_4 * 0.5",
            "color = 1",
            "open > c_1",
            "close > greatest(h_3, h_2, h_1)",
        ),
        "1",
    )
    return p


def cdl_full_oracle_sql(candles_cte: str, ts_fmt: str) -> str:
    """The complete 59-pattern + horizontal-sum oracle over the
    standard candles CTE."""
    from auto_trade_data_pipeline_spark.functions.cdl import ALL_PATTERNS

    exprs = _exprs()
    missing = set(ALL_PATTERNS) - set(exprs)
    assert not missing, f"oracle missing patterns: {sorted(missing)}"

    lag_cols = ",\n         ".join(
        f"lag({_BASES[b]}, {k}) OVER o AS {b}_{k}"
        for b in _BASES
        for k in range(1, _MAX_LAG + 1)
    )
    pat_cols = ",\n       ".join(
        f"CAST(({exprs[name]}) AS INTEGER) AS {name}" for name in ALL_PATTERNS
    )
    total = " + ".join(ALL_PATTERNS)
    return f"""
WITH {candles_cte},
anatomy AS (
  SELECT symbol, timestamp, open, high, low, close,
         abs(close - open) AS rb,
         high - low AS hl,
         greatest(close, open) AS top,
         least(close, open) AS bot,
         high - greatest(close, open) AS us,
         least(close, open) - low AS ls,
         CASE WHEN close >= open THEN 1 ELSE -1 END AS color
  FROM candles
),
avgs AS (
  SELECT *,
         CASE WHEN count(*) OVER w10 = 10 THEN avg(hl) OVER w10 END AS hl10,
         CASE WHEN count(*) OVER w10 = 10 THEN avg(rb) OVER w10 END AS rb10,
         CASE WHEN count(*) OVER w10 = 10 THEN avg(us + ls) OVER w10 / 2 END AS ss10,
         CASE WHEN count(*) OVER w5 = 5 THEN avg(hl) OVER w5 END AS hl5
  FROM anatomy
  WINDOW w10 AS (PARTITION BY symbol ORDER BY timestamp ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING),
         w5  AS (PARTITION BY symbol ORDER BY timestamp ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
),
w AS (
  SELECT *,
         {lag_cols}
  FROM avgs
  WINDOW o AS (PARTITION BY symbol ORDER BY timestamp)
),
pats AS (
  SELECT symbol, timestamp,
       {pat_cols}
  FROM w
)
SELECT symbol,
       strftime(timestamp, '{ts_fmt}') AS bucket_ts,
       * EXCLUDE (symbol, timestamp),
       CAST({total} AS BIGINT) AS candle_pattern_sum
FROM pats
"""
