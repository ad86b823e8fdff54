"""Corpus-cleaning operators: PII redaction, chunking, repetition,
contamination."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.operators import clean as CL
from auto_trade_data_pipeline_spark.operators import text as TX


def test_redact_pii_all_pattern_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "call 415-555-0123 or 650-555-9999"),
            (3, "ssn 123-45-6789 host 10.0.0.7"),
            (4, "clean text no pii"),
        ],
        "id long, t string",
    )
    counts, red = CL.redact_pii(F.col("t"))
    out = {r.id: r for r in df.select("id", *counts.values(), red.alias("red")).collect()}
    assert out[1].email_count == 1 and "<EMAIL>" in out[1].red
    assert out[2].phone_count == 2 and out[2].red.count("<PHONE>") == 2
    assert out[3].ssn_count == 1 and out[3].ip_count == 1
    assert "<SSN>" in out[3].red and "<IP>" in out[3].red
    assert out[4].red == "clean text no pii"
    assert all(out[4][c] == 0 for c in ("email_count", "phone_count", "ssn_count", "ip_count"))


def test_redact_email_before_ip_ordering(spark):
    # A digit-heavy email domain must be swallowed by <EMAIL>, not <IP>.
    df = spark.createDataFrame([(1, "x a@10.0.0.7.io y")], "id long, t string")
    _, red = CL.redact_pii(F.col("t"))
    assert df.select(red.alias("r")).first().r == "x <EMAIL> y"


def test_chunk_tokens_boundaries(spark):
    # 100 tokens, size 32 / stride 24 -> starts 1,25,49,73,97; last len 4.
    toks = [f"t{i}" for i in range(100)]
    df = spark.createDataFrame([(1, toks), (2, [])], "id long, toks array<string>")
    rows = CL.chunk_tokens(df, "toks", "id", size=32, stride=24).collect()
    assert all(r.id == 1 for r in rows)  # empty doc -> no chunks
    got = {r.chunk_id: (r.start_token, r.chunk_len) for r in rows}
    assert got == {0: (1, 32), 1: (25, 32), 2: (49, 32), 3: (73, 28), 4: (97, 4)}


def test_chunk_tokens_exact_fit_no_empty_tail(spark):
    # n == size: exactly one chunk even when stride < size.
    df = spark.createDataFrame([(1, ["a"] * 24)], "id long, toks array<string>")
    rows = CL.chunk_tokens(df, "toks", "id", size=24, stride=24).collect()
    assert [(r.chunk_id, r.chunk_len) for r in rows] == [(0, 24)]
    with pytest.raises(ValueError):
        CL.chunk_tokens(df, "toks", "id", size=8, stride=0)


def test_repetition_stats_degenerate_vs_diverse(spark):
    df = spark.createDataFrame(
        [(1, ["spam"] * 10), (2, [f"w{i}" for i in range(10)])],
        "id long, toks array<string>",
    )
    out = {r.id: r for r in CL.repetition_stats(df, "toks", "id").collect()}
    assert out[1].distinct_ratio == 0.1 and out[1].dup_gram_ratio == 0.875
    assert out[1].top_token_ratio == 1.0
    assert out[2].distinct_ratio == 1.0 and out[2].dup_gram_ratio == 0.0
    assert out[2].top_token_count == 1


def test_ngram_contamination_full_and_zero_overlap(spark):
    text = "one two three four five six seven eight"
    bench = spark.createDataFrame([(100, "x")], "id long, ignore string").select(
        "id", F.split(F.lit(text), " ").alias("toks")
    )
    corpus = spark.createDataFrame(
        [(1, text), (2, "alpha beta gamma delta epsilon zeta")],
        "id long, t string",
    ).select("id", F.split("t", " ").alias("toks"))
    out = {r.id: r for r in CL.ngram_contamination(corpus, bench, "toks", "id").collect()}
    assert out[1].contamination_ratio == 1.0 and out[1].contaminated
    assert out[2].hit_grams == 0 and not out[2].contaminated
    assert out[2].n_grams == 2


def test_word_shingles_short_arrays_yield_empty_not_crash(spark):
    df = spark.createDataFrame(
        [(1, []), (2, ["a"]), (3, ["a", "b"]), (4, ["a", "b", "c"])],
        "id long, toks array<string>",
    )
    out = {
        r.id: r.sh
        for r in df.select(
            "id", TX.word_shingles(F.col("toks"), 3).alias("sh")
        ).collect()
    }
    assert out[1] == [] and out[2] == [] and out[3] == []
    assert out[4] == ["a b c"]
    # The downstream ops that crashed on short docs now run clean.
    stats = CL.repetition_stats(df.withColumnRenamed("toks", "toks"), "toks", "id").collect()
    assert {r.id for r in stats} == {1, 2, 3, 4}


def test_char_shingles_short_text_empty(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "abcde")], "id long, t string")
    out = {
        r.id: r.sh
        for r in df.select("id", TX.char_shingles(F.col("t"), 5).alias("sh")).collect()
    }
    assert out[1] == [] and out[2] == ["abcde"]


def test_lm_quality_score_orders_common_before_rare(spark):
    """A doc of corpus-common tokens must score lower (more fluent)
    than a doc of corpus-unique tokens; token counts are exact."""
    from auto_trade_data_pipeline_spark.corpus.clean import lm_quality_score
    import tempfile, os

    # Build a tiny documents table: 9 docs of 'the cat sat', 1 of rare noise.
    rows = [(i, "the cat sat the cat sat", "en", "srcA", 23) for i in range(9)]
    rows.append((9, "zyx qwv jkp", "en", "srcA", 11))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in lm_quality_score(spark, d).collect()}
    assert out[0]["n_tokens"] == 6 and out[9]["n_tokens"] == 3
    assert out[0]["avg_neg_logprob"] < out[9]["avg_neg_logprob"]
    assert all(out[i]["avg_neg_logprob"] == out[0]["avg_neg_logprob"] for i in range(9))


def test_gd_classifier_learns_separable_signal_and_is_deterministic(spark):
    """The in-engine GD classifier: (a) on a linearly separable toy
    corpus (label-1 docs say 'good', label-0 docs say 'bad') three
    full-batch iterations reach perfect train accuracy; (b) the
    trained weights are bit-identical run to run; (c) a document with
    no features scores exactly 0.5 (zero margin)."""
    from auto_trade_data_pipeline_spark.operators import classifier as CF

    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "good fine great good quality text here", 1.0))
        else:
            rows.append((i, "bad junk spam bad noise garbage here", 0.0))
    rows.append((99, "", 0.0))  # empty doc -> no features
    df = spark.createDataFrame(rows, "doc_id long, text string, y double")
    base = df.select("doc_id", TX.tokens(F.col("text")).alias("ts"))
    feats = CF.hashed_features(base, "ts", "doc_id", n_buckets=16)
    labels = df.select("doc_id", "y")

    w1 = CF.train_logistic_gd(feats, labels, "doc_id", n_buckets=16, iters=3, lr=5.0)
    w2 = CF.train_logistic_gd(feats, labels, "doc_id", n_buckets=16, iters=3, lr=5.0)
    assert sorted(map(tuple, w1.collect())) == sorted(map(tuple, w2.collect()))

    scored = {r.doc_id: r.score for r in CF.predict_scores(feats, w1, df, "doc_id").collect()}
    assert scored[99] == 0.5
    acc = sum(
        1 for i in range(40) if (scored[i] >= 0.5) == (i % 2 == 0)
    ) / 40
    assert acc == 1.0
