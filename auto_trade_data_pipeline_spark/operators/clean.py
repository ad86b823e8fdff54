"""Corpus-cleaning operators for LLM training-data pipelines (EXT,
SURVEY §2.11): PII redaction, fixed-stride token chunking, within-
document repetition scoring, and benchmark-contamination detection.

Everything is JVM-side built-in expressions — no Python in any hot
path. Hashes are md5-derived (`operators.text.hash64`) so the DuckDB
oracles reproduce results bit-for-bit.

Scale design:
- PII redaction is a per-row regexp chain: embarrassingly parallel,
  zero shuffle, whole-stage codegen.
- Chunking is sequence+slice+posexplode: the token array is sliced
  JVM-side; output rows carry a 64-bit chunk hash, not chunk text,
  unless the caller asks for text.
- Repetition stats need one explode + two hash-aggs keyed by
  (doc_id, token) then doc_id — both uniform keys.
- Contamination joins corpus n-gram HASHES against the benchmark
  n-gram set: the shuffle carries 8 bytes per gram. Benchmark suites
  are dimension-sized by nature, so the gram set is broadcast; drop
  the hint if a benchmark ever rivals the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.operators.text import hash64, word_shingles

__all__ = [
    "temperature_sampling_rates",
    "PII_PATTERNS",
    "redact_pii",
    "chunk_tokens",
    "remove_flagged_spans",
    "repetition_stats",
    "ngram_contamination",
]


def remove_flagged_spans(
    sp: DataFrame,
    flagged: DataFrame,
    *,
    strategy: str = "filter",
    span_col: str = "spans",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop per-group flagged spans from each document's ordered span
    array (the removal half of boilerplate cleaning). ``sp`` carries
    (group, id, spans: array<string>); ``flagged`` carries (group,
    flagged: array<string>), dimension-sized by the df-threshold
    construction. Returns ``sp`` plus ``kept`` — the spans NOT
    flagged for their group, in original order, duplicates preserved;
    groups absent from ``flagged`` keep everything.

    Two plans with identical output (equality pinned in
    tests/test_boilerplate_strategies.py):

    - ``filter``: broadcast the flagged arrays, per-row
      ``F.filter(spans, x -> !array_contains(flagged, x))``. ZERO
      extra shuffle, but O(|spans| * |flagged|) string compares per
      document — Spark evaluates both ``array_contains`` and
      expression-map lookups as linear scans. Right while flagged
      sets are small (the synthetic corpus: tens of spans).
    - ``exploded``: posexplode the spans, broadcast LEFT ANTI join
      against the exploded flagged rows, re-assemble per document
      with ``array_sort(collect_list(struct(pos, span)))``. O(|spans|)
      hash probes per document plus ONE extra narrow exchange
      (id-keyed re-agg of (pos, span) rows — the blobs stay behind).
      Right on a real line-structured crawl where flagged sets reach
      the k*100/BOILER_DF_PCT bound (~10^3-10^4 spans): the filter
      plan's per-doc compare count goes quadratic-ish while this
      stays linear, and the exchange is narrower than the compute it
      saves.

    Measured crossover (local[32], 20k docs, interleaved same-session
    A/B): with |flagged|=50 the two are comparable (2.0 s vs 1.5 s);
    at |flagged|=1000 exploded wins 7.5x (13.6 s vs 1.8 s); at
    |flagged|=4000, spans/doc=500, it wins 36x (79.9 s vs 2.2 s).
    On the corpus frames at sf0.1 the flagged set is EMPTY and filter
    wins 2x (0.46 s vs 0.94 s — exploded pays its exchange for
    nothing), which is why the corpus query defaults to ``filter``.
    """
    empty = F.array().cast("array<string>")
    if strategy == "filter":
        return sp.join(F.broadcast(flagged), group_col, "left").select(
            *sp.columns,
            F.filter(
                span_col,
                lambda x: ~F.array_contains(F.coalesce(F.col("flagged"), empty), x),
            ).alias("kept"),
        )
    if strategy != "exploded":
        raise ValueError(f"unknown strategy {strategy!r}")
    # No distinct: flagged arrays are collect_set-built (unique), and a
    # left_anti join is unaffected by duplicate right-side keys anyway.
    fl_rows = flagged.select(group_col, F.explode("flagged").alias("__span"))
    pos = sp.select(
        group_col, id_col, F.posexplode(span_col).alias("__pos", "__span")
    )
    kept_agg = (
        pos.join(F.broadcast(fl_rows), [group_col, "__span"], "left_anti")
        .groupBy(group_col, id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__span"))),
                lambda s: s["__span"],
            ).alias("kept")
        )
    )
    return sp.join(kept_agg, [group_col, id_col], "left").select(
        *sp.columns, F.coalesce("kept", empty).alias("kept")
    )

#: Redaction patterns, applied IN ORDER (email first: its domain part
#: would otherwise partially match the IP pattern). Each is valid and
#: identical under Java regex (Spark) and RE2 (DuckDB): character
#: classes, bounded repetition, ASCII word boundaries only.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(text: Column) -> tuple[dict[str, Column], Column]:
    """Count and redact PII spans. Returns ({name: count_col}, redacted)
    where counts are matched-span counts of the ORIGINAL text and
    `redacted` has every span replaced by its placeholder, applied in
    `PII_PATTERNS` order so overlapping matches resolve identically on
    any engine."""
    counts = {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), 0)).alias(f"{name}_count")
        for name, pat, _ in PII_PATTERNS
    }
    redacted = text
    for _, pat, repl in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, repl)
    return counts, redacted


def chunk_tokens(
    df: DataFrame,
    tokens_col: str,
    id_col: str,
    size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Fixed-stride token chunking (the RAG / context-window prep
    layout): chunk i covers tokens [i*stride+1, i*stride+size]
    (1-based, inclusive), the last chunk is short, chunks start while
    tokens remain (`i <= (n-1)/stride`). Empty documents produce no
    chunks. Emits (id, chunk_id, start_token, chunk_len, chunk_hash).

    sequence -> slice -> posexplode, all JVM expressions; rows carry
    the 64-bit hash of the space-joined chunk, not the text."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    toks = F.col(tokens_col)
    n = F.size(toks)
    starts = F.transform(
        F.sequence(F.lit(0), F.floor((n - 1) / stride).cast("int")),
        lambda i: i * stride + 1,
    )
    chunked = df.filter(n > 0).select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_id", "start_token"),
        toks.alias("__toks"),
    )
    chunk = F.slice(F.col("__toks"), F.col("start_token"), size)
    return chunked.select(
        id_col,
        "chunk_id",
        "start_token",
        F.size(chunk).alias("chunk_len"),
        hash64(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


def repetition_stats(
    df: DataFrame, tokens_col: str, id_col: str, gram_n: int = 3
) -> DataFrame:
    """Within-document repetition profile — the pre-training filter
    that catches boilerplate and degenerate generations: distinct-
    token ratio, duplicate n-gram ratio (1 - distinct/total grams),
    and the modal token's share of the document.

    The array-local ratios are per-row expressions; the modal token
    needs one explode and two hash-aggs ((doc, token) then doc) —
    uniform keys, map-side combine."""
    toks = F.col(tokens_col)
    n = F.size(toks)
    grams_total = F.greatest(n - (gram_n - 1), F.lit(0))
    grams_distinct = F.size(word_shingles(toks, gram_n))
    base = df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        grams_total.alias(f"grams{gram_n}_total"),
        grams_distinct.alias(f"grams{gram_n}_distinct"),
    )
    top = (
        df.select(F.col(id_col), F.explode(tokens_col).alias("__tok"))
        .groupBy(id_col, "__tok")
        .agg(F.count(F.lit(1)).alias("__tf"))
        .groupBy(id_col)
        .agg(F.max("__tf").alias("top_token_count"))
    )
    out = base.join(top, id_col, "left")
    nt = F.col("n_tokens")
    gt = F.col(f"grams{gram_n}_total")
    return out.select(
        id_col,
        "n_tokens",
        "n_distinct",
        F.when(nt > 0, F.round(F.col("n_distinct") / nt, 4)).otherwise(1.0).alias(
            "distinct_ratio"
        ),
        F.when(gt > 0, F.round(1 - F.col(f"grams{gram_n}_distinct") / gt, 4))
        .otherwise(0.0)
        .alias("dup_gram_ratio"),
        F.coalesce("top_token_count", F.lit(0)).alias("top_token_count"),
        F.when(nt > 0, F.round(F.coalesce("top_token_count", F.lit(0)) / nt, 4))
        .otherwise(0.0)
        .alias("top_token_ratio"),
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    tokens_col: str,
    id_col: str,
    gram_n: int = 5,
    flag_ratio: float = 0.2,
) -> DataFrame:
    """Benchmark-contamination detection: for every corpus document,
    the share of its distinct word n-grams that appear anywhere in the
    benchmark set. Emits (id, n_grams, hit_grams, contamination_ratio,
    contaminated) for EVERY corpus document (zero-overlap docs kept).

    The benchmark side collapses to its distinct gram-hash set first
    (benchmarks are dimension-sized — broadcast), so the join moves
    8-byte hashes, never text, and each corpus gram is hashed once."""
    gram_hash = lambda c: hash64(c)  # noqa: E731
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(word_shingles(F.col(tokens_col), gram_n)).alias("__g")
    ).select(id_col, gram_hash(F.col("__g")).alias("__gh"))
    bench_grams = (
        benchmark.select(F.explode(word_shingles(F.col(tokens_col), gram_n)).alias("__g"))
        .select(gram_hash(F.col("__g")).alias("__gh"))
        .distinct()
    )
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "__gh", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("hit_grams"))
    )
    totals = corpus.select(
        F.col(id_col),
        F.size(word_shingles(F.col(tokens_col), gram_n)).alias("n_grams"),
    )
    out = totals.join(hits, id_col, "left")
    ratio = F.when(
        F.col("n_grams") > 0,
        F.round(F.coalesce("hit_grams", F.lit(0)) / F.col("n_grams"), 4),
    ).otherwise(0.0)
    return out.select(
        id_col,
        "n_grams",
        F.coalesce("hit_grams", F.lit(0)).alias("hit_grams"),
        ratio.alias("contamination_ratio"),
        (ratio >= flag_ratio).alias("contaminated"),
    )


def temperature_sampling_rates(
    df: DataFrame,
    group_col: str,
    id_col: str,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-based source mixing (the multilingual/multi-source
    balancing rule of mT5 / XLM-R: sample source s with probability
    proportional to n_s^alpha, alpha<1 UP-samples small sources and
    DOWN-samples dominant ones), materialized as deterministic
    per-row keep decisions: rate_s = min(1, p_s * target / n_s) with
    p_s = n_s^alpha / sum n^alpha and target = target_frac * N; a row
    is sampled iff its salted 60-bit hash mod 1e6 falls under
    round(rate_s * 1e6). Emits every input row with (n_group,
    rate_ppm, sampled).

    Scale shape: ONE count aggregate over the group key (sources are
    few — the rate table is broadcast-sized at any corpus size), one
    broadcast join back, and a per-row hash — no sampling state, no
    shuffle of the corpus, reproducible across runs/engines, and
    stable under growth within a source only via the rate (the hash
    keeps membership stable when rates do not change). The ppm
    integer threshold keeps the keep decision exact cross-engine
    (double pow differs at ~1 ulp; a 1e-6-granular threshold absorbs
    it)."""
    from auto_trade_data_pipeline_spark.operators.text import hash64

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_group"))
    tot = counts.agg(
        F.sum("n_group").alias("__N"),
        F.sum(F.pow(F.col("n_group").cast("double"), F.lit(alpha))).alias("__W"),
    )
    rates = (
        counts.join(F.broadcast(tot))
        .withColumn(
            "__rate",
            F.least(
                F.lit(1.0),
                (F.pow(F.col("n_group").cast("double"), F.lit(alpha)) / F.col("__W"))
                * (F.lit(target_frac) * F.col("__N"))
                / F.col("n_group"),
            ),
        )
        .select(
            group_col,
            "n_group",
            F.round(F.col("__rate") * 1e6, 0).cast("long").alias("rate_ppm"),
        )
    )
    bucket = F.pmod(
        hash64(
            F.concat_ws("|", F.col(group_col), F.col(id_col).cast("string")), salt=salt
        ),
        F.lit(1_000_000),
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .withColumn("sampled", bucket < F.col("rate_ppm"))
    )
