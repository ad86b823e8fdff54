"""remove_flagged_spans: the broadcast array-filter plan and the
posexplode + anti-join + re-agg plan must be output-identical — the
strategy choice is a pure plan decision (round-8 verdict structural
note on boilerplate_span_report's per-doc linear array scan)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from auto_trade_data_pipeline_spark.operators.clean import remove_flagged_spans

SP = "source string, doc_id long, spans array<string>"
FL = "source string, flagged array<string>"

_spark = None


@pytest.fixture(autouse=True)
def _grab_spark(spark):
    global _spark
    _spark = spark


#: Tiny alphabets on purpose: heavy span collisions within and across
#: groups, frequent empty arrays, flagged spans that may not occur.
_span = st.sampled_from(["x", "y", "z", "w"])
_docs_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.lists(_span, min_size=0, max_size=6),
    ),
    min_size=1,
    max_size=12,
)
_flags_strategy = st.dictionaries(
    st.sampled_from(["a", "b", "c"]),  # 'c' never occurs in sp
    st.lists(_span, min_size=0, max_size=3, unique=True),
    max_size=3,
)


def _collect(df):
    return sorted(
        (r["source"], r["doc_id"], tuple(r["spans"]), tuple(r["kept"]))
        for r in df.collect()
    )


@given(docs=_docs_strategy, flags=_flags_strategy)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_strategies_agree_on_random_shapes(docs, flags):
    """Property: on ANY (docs, flagged) input — collisions, empties,
    duplicate spans, unflagged groups, flags that never occur — the
    two plans produce identical keep decisions, and kept is always
    the original order with flagged occurrences deleted."""
    sp = _spark.createDataFrame(
        [(g, i, arr) for i, (g, arr) in enumerate(docs)], SP
    )
    fl = _spark.createDataFrame(list(flags.items()), FL)
    out_f = _collect(remove_flagged_spans(sp, fl, strategy="filter"))
    out_e = _collect(remove_flagged_spans(sp, fl, strategy="exploded"))
    assert out_f == out_e
    for g, _i, spans, kept in out_f:
        banned = set(flags.get(g, []))
        assert kept == tuple(x for x in spans if x not in banned)


def test_strategies_agree_on_edge_shapes(spark):
    sp = spark.createDataFrame(
        [
            # Duplicates preserved, order preserved.
            ("a", 1, ["x y", "b b", "x y", "z z", "b b"]),
            # Everything flagged -> kept empty.
            ("a", 2, ["b b", "b b"]),
            # Empty span array.
            ("a", 3, []),
            # Source with no flagged entry -> keep all.
            ("c", 4, ["b b", "q q"]),
            # Flagged span of ANOTHER source must not leak across.
            ("d", 5, ["b b", "d d"]),
        ],
        SP,
    )
    fl = spark.createDataFrame([("a", ["b b", "z z"]), ("d", ["d d"])], FL)
    out_f = _collect(remove_flagged_spans(sp, fl, strategy="filter"))
    out_e = _collect(remove_flagged_spans(sp, fl, strategy="exploded"))
    assert out_f == out_e
    by_id = {r[1]: r[3] for r in out_f}
    assert by_id[1] == ("x y", "x y")
    assert by_id[2] == ()
    assert by_id[3] == ()
    assert by_id[4] == ("b b", "q q")
    assert by_id[5] == ("b b",)


def test_strategies_agree_on_corpus_frames(spark, sf_small):
    """Same equality over the real boilerplate frames at sf0.001 — via
    the SAME boiler_spans/boiler_flagged helpers the corpus query
    uses, so the test cannot drift from the query's construction."""
    from auto_trade_data_pipeline_spark.corpus.clean import (
        boiler_flagged,
        boiler_spans,
    )
    from auto_trade_data_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_small, "documents")
    sp = boiler_spans(docs).persist()
    fl = boiler_flagged(sp)
    try:
        out_f = _collect(remove_flagged_spans(sp, fl, strategy="filter"))
        out_e = _collect(remove_flagged_spans(sp, fl, strategy="exploded"))
    finally:
        sp.unpersist()
    assert out_f == out_e and len(out_f) > 0
    # The dataset must actually exercise removal for this to mean much.
    assert any(len(r[2]) != len(r[3]) for r in out_f)
