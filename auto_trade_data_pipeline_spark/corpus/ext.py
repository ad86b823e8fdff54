"""EXT corpus (SURVEY §2.11): LLM training-data operators over the
driver's ``documents`` / ``embeddings`` tables — dedup (exact,
MinHash-LSH, SimHash), n-gram Jaccard, similarity search (brute-force
+ IVF), text analysis (stats/quality/lang-ID/token counts),
fingerprinting, multimodal plumbing.

Every query has a DuckDB oracle that reproduces the Spark hashes
bit-for-bit (md5-derived 60-bit integers) and the float math
op-for-op (sequential-order folds, integer-scaled sums), so even the
LSH pipelines hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.corpus import register, scoped_persist
from auto_trade_data_pipeline_spark.operators import text as TX
from auto_trade_data_pipeline_spark.operators import vectors as VX
from auto_trade_data_pipeline_spark.operators.multimodal import (
    byte_histogram_features,
    decode_stats,
    sample_frames,
)
from auto_trade_data_pipeline_spark.sources import fan_out_scan, load_table

# LSH configuration: 20 permutations in bands of 2 puts the s-curve
# threshold at (1/10)^(1/2) ~= 0.32 — tuned to the 0.3 Jaccard cut.
NUM_PERMS = 20
ROWS_PER_BAND = 2
SHINGLE_N = 3
JACCARD_T = 0.3

STOPWORDS = ("the", "a")

#: DuckDB twin of operators.text.hash64 (60-bit md5 prefix).
_H = "CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def _duck_hash(expr: str, salt: str | None = None) -> str:
    if salt is not None:
        expr = f"'{salt}' || '|' || {expr}"
    return _H.format(expr=expr)


_DOCS_CTE = """
docs AS (SELECT doc_id, lang, source, n_chars, text, lower(text) AS lt FROM documents),
toks AS (SELECT *, regexp_extract_all(lt, '\\w+') AS ts FROM docs)
"""

def _shingles_cte(src: str = "toks") -> str:
    """``sh`` CTE over any source relation exposing (doc_id, ts)."""
    return f"""
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(ts) - {SHINGLE_N - 1}, 0) + 1),
           i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingles
  FROM {src}
)
"""


_SHINGLES_CTE = _shingles_cte()


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

_EXACT_DEDUP_ORACLE = f"""
WITH {_DOCS_CTE}
SELECT sha256(lower(trim(text))) AS fingerprint,
       min(doc_id) AS keep_id,
       count(*) AS dup_count
FROM docs
GROUP BY sha256(lower(trim(text)))
"""


@register("dedup_exact_text", _EXACT_DEDUP_ORACLE, tags=("EXT1",))
def dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup: group by sha256(normalized text), keep the
    lowest doc_id. The shuffle key is the 64-hex digest, not the
    document bytes (operators/text.py:exact_dedup)."""
    return TX.exact_dedup(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Text statistics + quality score
# ---------------------------------------------------------------------------

_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)

_PROFILES = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "y"),
}


def _profile_hits_sql(markers: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(ts, t -> t IN ({inlist})))"


_TEXT_QUALITY_LANGID_ORACLE = f"""
WITH {_DOCS_CTE},
st AS (
  SELECT doc_id, lang,
         length(text) AS n_chars_obs,
         len(ts) AS n_tokens,
         len(list_filter(ts, t -> t IN ({_STOP_IN}))) AS stop_hits,
         CASE WHEN len(ts) > 0
              THEN CAST(list_sum(list_transform(ts, t -> length(t))) AS BIGINT) ELSE 0 END AS token_chars,
         {_profile_hits_sql(_PROFILES['en'])} AS en_hits,
         {_profile_hits_sql(_PROFILES['de'])} AS de_hits,
         {_profile_hits_sql(_PROFILES['fr'])} AS fr_hits,
         {_profile_hits_sql(_PROFILES['es'])} AS es_hits
  FROM toks
)
SELECT doc_id, lang, n_chars_obs, n_tokens, stop_hits,
       round(CASE WHEN n_tokens > 0 THEN token_chars / (1.0 * n_tokens) ELSE 0.0 END, 4) AS avg_token_len,
       round(CASE WHEN n_tokens > 0 THEN stop_hits / (1.0 * n_tokens) ELSE 0.0 END, 4) AS stop_ratio,
       (CASE WHEN n_chars_obs BETWEEN 100 AND 2000 THEN 1 ELSE 0 END
        + CASE WHEN n_tokens >= 20 THEN 1 ELSE 0 END
        + CASE WHEN n_tokens > 0 AND stop_hits / (1.0 * n_tokens) BETWEEN 0.01 AND 0.5 THEN 1 ELSE 0 END
        + CASE WHEN n_tokens > 0 AND token_chars / (1.0 * n_tokens) BETWEEN 2.0 AND 10.0 THEN 1 ELSE 0 END
       ) AS quality_score,
       CASE WHEN en_hits = 0 AND de_hits = 0 AND fr_hits = 0 AND es_hits = 0 THEN 'und'
            WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
            WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
            WHEN fr_hits >= es_hits THEN 'fr'
            ELSE 'es' END AS predicted_lang
FROM st
"""


@register("text_quality_langid", _TEXT_QUALITY_LANGID_ORACLE, tags=("EXT3",))
def text_quality_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text statistics, a 0-4 quality score (length /
    token count / stopword ratio / avg token length gates — the
    classic pre-training quality filter) AND stopword-profile language
    ID (per-language marker-token counts, deterministic argmax with a
    fixed priority order, 'und' when no profile fires) — one scan, all
    JVM expressions."""
    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))

    def _hits(markers: tuple[str, ...]):
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    d = docs.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars_obs"),
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).alias("stop_hits"),
        F.coalesce(
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
            F.lit(0).cast("long"),
        ).alias("token_chars"),
        *[_hits(markers).alias(f"{lang}_hits") for lang, markers in _PROFILES.items()],
    )
    n_tok = F.col("n_tokens")
    avg_len = F.when(n_tok > 0, F.col("token_chars") / (n_tok * 1.0)).otherwise(0.0)
    stop_ratio = F.when(n_tok > 0, F.col("stop_hits") / (n_tok * 1.0)).otherwise(0.0)
    quality = (
        F.when(F.col("n_chars_obs").between(100, 2000), 1).otherwise(0)
        + F.when(n_tok >= 20, 1).otherwise(0)
        + F.when((n_tok > 0) & stop_ratio.between(0.01, 0.5), 1).otherwise(0)
        + F.when((n_tok > 0) & avg_len.between(2.0, 10.0), 1).otherwise(0)
    )
    en, de, fr, es = (F.col(f"{lg}_hits") for lg in ("en", "de", "fr", "es"))
    predicted = (
        F.when((en == 0) & (de == 0) & (fr == 0) & (es == 0), "und")
        .when((en >= de) & (en >= fr) & (en >= es), "en")
        .when((de >= fr) & (de >= es), "de")
        .when(fr >= es, "fr")
        .otherwise("es")
    )
    return d.select(
        "doc_id",
        "lang",
        "n_chars_obs",
        "n_tokens",
        "stop_hits",
        F.round(avg_len, 4).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        quality.alias("quality_score"),
        predicted.alias("predicted_lang"),
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms
# ---------------------------------------------------------------------------

_TFIDF_ORACLE = f"""
WITH {_DOCS_CTE},
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(ts) AS term FROM toks)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df_count FROM tf GROUP BY term),
n AS (SELECT count(*) AS n FROM docs),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_count,
         round(tf.tf * ln(n.n / (1.0 * dfreq.df_count)), 6) AS tfidf
  FROM tf JOIN dfreq USING (term), n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df_count, tfidf, rank FROM ranked WHERE rank <= 3
"""


@register("tfidf_top_terms", _TFIDF_ORACLE, tags=("EXT3",))
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (operators/text.py:tfidf_topk):
    doc-term counts and per-term document frequencies are two uniform-
    key shuffles, the corpus size joins in as a broadcast 1-row
    aggregate, ranking orders by the ROUNDED score then term so ranks
    are deterministic cross-engine."""
    docs = load_table(spark, sf_dir, "documents")
    tokenized = docs.select("doc_id", TX.tokens(F.col("text")).alias("toks"))
    return TX.tfidf_topk(tokenized, "toks", "doc_id", k=3)


# ---------------------------------------------------------------------------
# Training-mix assembly: hash split + concat-and-chunk packing
# ---------------------------------------------------------------------------

PACK_BUDGET = 512

_MIX_PACK_ORACLE = f"""
WITH {_DOCS_CTE},
base AS (
  SELECT doc_id, source, len(ts) AS n_tokens,
         {_duck_hash("CAST(doc_id AS VARCHAR)", "split")} % 100 AS bucket
  FROM toks
),
sp AS (
  SELECT *, CASE WHEN bucket < 80 THEN 'train'
                 WHEN bucket < 90 THEN 'val'
                 ELSE 'test' END AS split
  FROM base
),
pk AS (
  -- sum(BIGINT) OVER is HUGEINT in DuckDB; a pandas-based fetch turns
  -- HUGEINT into float64 ("3" -> "3.0"), flipping the driver's value
  -- hash. Cast back to BIGINT immediately so every derived integer
  -- stays an int64 end to end.
  SELECT *, CAST(coalesce(sum(n_tokens) OVER (PARTITION BY split, source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prefix
  FROM sp
)
SELECT doc_id, source, bucket, split, n_tokens,
       CAST(prefix // {PACK_BUDGET} AS BIGINT) AS seq_id,
       CAST(prefix % {PACK_BUDGET} AS BIGINT) AS seq_offset
FROM pk
"""


@register("training_mix_pack", _MIX_PACK_ORACLE, tags=("EXT3", "EXT1"))
def training_mix_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix assembly in one pass: deterministic hash-based
    train/val/test split (salted 60-bit hash mod 100 — no sampling
    state, stable under corpus growth) plus concat-and-chunk sequence
    packing within each (split, source) shard: exclusive prefix token
    sums place each document at (seq_id, seq_offset) of the packed
    token stream (operators/text.py:hash_split, pack_sequences). Pure
    integer window math — bit-exact at any parallelism."""
    docs = load_table(spark, sf_dir, "documents")
    bucket, split = TX.hash_split(F.col("doc_id"), 80, 10, salt="split")
    d = docs.select(
        "doc_id",
        "source",
        F.size(TX.tokens(F.col("text"))).cast("long").alias("n_tokens"),
        bucket.alias("bucket"),
        split.alias("split"),
    )
    packed = TX.pack_sequences(d, "n_tokens", "doc_id", ["split", "source"], PACK_BUDGET)
    return packed.select(
        "doc_id", "source", "bucket", "split", "n_tokens", "seq_id", "seq_offset"
    )


# ---------------------------------------------------------------------------
# Token counting (whitespace + BPE-ish regex)
# ---------------------------------------------------------------------------

_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

_TOKENS_FINGERPRINT_ORACLE = f"""
WITH {_DOCS_CTE},
cs AS (
  SELECT doc_id, lang,
         len(ts) AS ws_tokens,
         len(regexp_extract_all(lt, '{_BPE_RE}')) AS bpe_tokens,
         list_distinct(list_filter(
           list_transform(range(1, greatest(length(text) - 4, 0) + 1),
                          i -> substr(text, i, 5)),
           g -> length(g) = 5)) AS grams
  FROM toks
)
SELECT doc_id, lang, ws_tokens, bpe_tokens,
       len(grams) AS shingle_count,
       list_aggregate(list_transform(grams, g -> {_duck_hash('g')}), 'min') AS fingerprint
FROM cs
"""


@register("doc_tokens_fingerprint", _TOKENS_FINGERPRINT_ORACLE, tags=("EXT1", "EXT3"))
def doc_tokens_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token accounting AND content fingerprint in one
    scan: whitespace tokens vs a BPE-ish pre-tokenizer regex (alpha
    runs | digit runs | single punctuation) — the budget numbers every
    training-data pipeline computes before a tokenizer pass — plus the
    rolling-hash fingerprint (min 60-bit hash over character 5-grams,
    1-permutation MinHash), the compact content id used for copy
    detection across corpus versions."""
    # fan_out: char-5-gram hashing over every document is the one
    # corpus-sized map side of this single-job query (r10).
    docs = fan_out_scan(load_table(spark, sf_dir, "documents"))
    lt = F.lower(F.col("text"))
    grams = TX.char_shingles(F.col("text"), 5)
    d = docs.select(
        "doc_id",
        "lang",
        F.size(TX.tokens(F.col("text"))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(lt, F.lit(_BPE_RE), 0)).alias("bpe_tokens"),
        grams.alias("grams"),
    )
    fp = F.array_min(F.transform("grams", lambda g: TX.hash64(g)))
    return d.select(
        "doc_id",
        "lang",
        "ws_tokens",
        "bpe_tokens",
        F.size("grams").alias("shingle_count"),
        fp.alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# Near-dup dedup: MinHash-LSH + exact Jaccard verify
# ---------------------------------------------------------------------------


def _mh_cols_sql() -> str:
    """The NUM_PERMS minhash columns over a ``shingles`` list column."""
    from auto_trade_data_pipeline_spark.operators.text import (
        MINHASH_PRIME,
        minhash_coeffs,
    )

    base = "CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)"
    return ",\n         ".join(
        "list_aggregate(list_transform(shingles, s -> ({base} * {a} + {b}) % {m}), 'min') AS mh{p}".format(
            base=base, a=minhash_coeffs(p)[0], b=minhash_coeffs(p)[1], m=MINHASH_PRIME, p=p
        )
        for p in range(NUM_PERMS)
    )


def _band_rows_sql(mh_src: str = "mh") -> str:
    """The banded (doc_id, band_idx, band_hash) rows over a minhash
    signature relation."""
    num_bands = NUM_PERMS // ROWS_PER_BAND
    return "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band_idx, md5({parts}) AS band_hash FROM {src}".format(
            b=b,
            src=mh_src,
            parts=" || ',' || ".join(
                f"CAST(mh{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(num_bands)
    )


def _minhash_ctes(src: str | None = None) -> str:
    """The MinHash-LSH pipeline as a CTE chain ending in ``njpairs``
    (the verified near-dup pairs) — shared by the pair query, the
    connected-components grouping query, and (parameterized over its
    source relation) the composed corpus pipeline. With ``src`` the
    chain starts at a caller-provided (doc_id, ts) relation instead
    of the full documents table."""
    mh_cols = _mh_cols_sql()
    band_rows = _band_rows_sql()
    prefix = f"{_DOCS_CTE},\n" if src is None else ""
    return f"""{prefix}{_shingles_cte(src or "toks")},
mh AS (
  SELECT doc_id,
         {mh_cols}
  FROM sh
),
bands AS (
{band_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
verify AS (
  SELECT id_a, id_b,
         len(list_intersect(sa.shingles, sb.shingles))
           / (1.0 * (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles)))) AS j
  FROM cand
  JOIN sh sa ON sa.doc_id = id_a
  JOIN sh sb ON sb.doc_id = id_b
),
njpairs AS (
  SELECT id_a, id_b, round(j, 4) AS jaccard
  FROM verify
  WHERE j >= {JACCARD_T}
)"""


def _minhash_oracle() -> str:
    return f"""
WITH {_minhash_ctes()}
SELECT id_a, id_b, jaccard FROM njpairs
"""


@register("dedup_near_minhash_lsh", _minhash_oracle(), tags=("EXT1", "bench"))
def dedup_near_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection, the scale path: word-3-gram shingle
    ROWS (posexplode + lead windows — whole-stage codegen, never an
    interpreted array lambda) -> 20-permutation MinHash (one groupBy)
    -> banded LSH self-join (shuffle on band hash, candidates only
    within buckets — never all-pairs) -> exact Jaccard verify on
    candidates as a pair-keyed row-count (no per-doc shingle arrays
    anywhere) (operators/text.py). Emits pairs with Jaccard >= 0.3."""
    # The raw table arrives as one small parquet split; repartition by
    # doc id so the hash-heavy shingle expressions use every core (at
    # 100 TB the scan itself provides the splits). Persist the shingle
    # rows: they are read three times (signature + both sides of the
    # verify join).
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    rows = scoped_persist(TX.shingle_rows(docs, "text", "doc_id", SHINGLE_N))
    # Signature persisted too: the band self-join reads it from both
    # sides (NUM_PERMS longs per doc — a checkpointed signature table
    # in production).
    sig = scoped_persist(TX.minhash_signature_rows(rows, "shingle", "doc_id", NUM_PERMS))
    pairs = TX.lsh_candidate_pairs(sig, "doc_id", NUM_PERMS, ROWS_PER_BAND)
    return TX.jaccard_verify_rows(pairs, rows, "doc_id", "shingle", JACCARD_T)


# ---------------------------------------------------------------------------
# Dedup-group resolution: connected components over the near-dup graph
# ---------------------------------------------------------------------------


def _cc_oracle() -> str:
    return f"""
WITH RECURSIVE {_minhash_ctes()},
edges AS (
  SELECT id_a AS u, id_b AS v FROM njpairs
  UNION
  SELECT id_b AS u, id_a AS v FROM njpairs
),
walk(u, v) AS (
  SELECT u, u FROM edges
  UNION
  SELECT w.u, e.v FROM walk w JOIN edges e ON w.v = e.u
),
comp AS (
  SELECT u AS doc_id, min(v) AS group_id FROM walk GROUP BY u
)
SELECT doc_id, group_id,
       count(*) OVER (PARTITION BY group_id) AS group_size
FROM comp
"""


@register("dedup_groups_cc", _cc_oracle(), tags=("EXT1", "bench"))
def dedup_groups_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup DECISIONS from near-dup PAIRS: connected components of
    the MinHash-verified pair graph via iterative min-label
    propagation (operators/graph.py — one join + one groupBy-min per
    round, O(diameter) rounds, convergence probed with an aggregate,
    never a driver-side graph). Every doc in a component maps to the
    component's min doc_id (the canonical keeper) with the component
    size attached. The oracle recomputes the same components with a
    recursive CTE reachability closure."""
    from auto_trade_data_pipeline_spark.operators.graph import (
        component_sizes,
        connected_components,
    )

    pairs = dedup_near_minhash_lsh(spark, sf_dir)
    labels = connected_components(pairs)
    return component_sizes(labels).select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("group_id"),
        "group_size",
    )


# ---------------------------------------------------------------------------
# Dedup-cluster quality audit (LSH-precision QA)
# ---------------------------------------------------------------------------


def _cluster_audit_oracle() -> str:
    return f"""
WITH RECURSIVE {_minhash_ctes()},
edges AS (
  SELECT id_a AS u, id_b AS v FROM njpairs
  UNION
  SELECT id_b AS u, id_a AS v FROM njpairs
),
walk(u, v) AS (
  SELECT u, u FROM edges
  UNION
  SELECT w.u, e.v FROM walk w JOIN edges e ON w.v = e.u
),
comp AS (
  SELECT u AS doc_id, min(v) AS group_id FROM walk GROUP BY u
),
sizes AS (SELECT group_id, CAST(count(*) AS BIGINT) AS n_docs FROM comp GROUP BY group_id),
grp AS (
  SELECT c.group_id,
         CAST(round(p.jaccard * 10000) AS BIGINT) AS je4
  FROM njpairs p JOIN comp c ON p.id_a = c.doc_id
)
SELECT g.group_id, s.n_docs,
       CAST(count(*) AS BIGINT) AS n_edges,
       min(je4) AS min_jaccard_e4,
       CAST(sum(je4) AS BIGINT) AS jaccard_sum_e4,
       (CAST(count(*) AS BIGINT) * 2 * 10000) // (s.n_docs * (s.n_docs - 1))
         AS density_bp
FROM grp g JOIN sizes s USING (group_id)
GROUP BY g.group_id, s.n_docs
"""


@register("dedup_cluster_audit", _cluster_audit_oracle(), tags=("EXT1",))
def dedup_cluster_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-precision QA over the resolved dedup clusters: for every
    connected component of the verified near-dup graph, report its
    size, verified-edge count, MINIMUM and SUM of the exact pair
    Jaccards (integer e4 — the rounded pair values scaled exactly, no
    FP summation order), and edge DENSITY in basis points
    (2E / n(n-1), floor division). Low-density or low-min-Jaccard
    clusters are transitive-closure overreach — A~B~C chains merged
    without A~C — the thing a production dedup pipeline audits before
    dropping documents (triangle_counts in operators/graph.py gives
    the same signal per NODE; this is the component-level report the
    keep/drop review actually consumes).

    Scale shape: everything derives from the already-banded verified
    pair list and the CC labels — no new all-pairs work anywhere; the
    labels join is component-membership-sized and the aggregation is
    one (group_id)-keyed map-side-combinable pass. The oracle replays
    the closure with a recursive CTE and the same integer math."""
    from auto_trade_data_pipeline_spark.operators.graph import connected_components

    pairs = scoped_persist(dedup_near_minhash_lsh(spark, sf_dir))
    labels = connected_components(pairs).select(
        F.col("node").alias("id_a"), F.col("component").alias("group_id")
    )
    sizes = labels.groupBy("group_id").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    je4 = F.expr("CAST(round(jaccard * 10000) AS BIGINT)")
    agg = (
        pairs.join(labels, "id_a")
        .groupBy("group_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.min(je4).alias("min_jaccard_e4"),
            F.sum(je4).cast("long").alias("jaccard_sum_e4"),
        )
    )
    return agg.join(sizes, "group_id").select(
        "group_id",
        "n_docs",
        "n_edges",
        "min_jaccard_e4",
        "jaccard_sum_e4",
        F.expr("(n_edges * 2 * 10000) div (n_docs * (n_docs - 1))").alias("density_bp"),
    )


# ---------------------------------------------------------------------------
# Cluster-aware train/val/test split (leakage-free benchmark splitting)
# ---------------------------------------------------------------------------

#: Hash-bucket boundaries (percent): [0,80) train, [80,90) val, rest test.
SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 90


def _split_oracle() -> str:
    gb = _duck_hash("CAST(group_id AS VARCHAR)", salt="split")
    nb = _duck_hash("CAST(doc_id AS VARCHAR)", salt="split")
    return f"""
WITH RECURSIVE {_minhash_ctes()},
edges AS (
  SELECT id_a AS u, id_b AS v FROM njpairs
  UNION
  SELECT id_b AS u, id_a AS v FROM njpairs
),
walk(u, v) AS (
  SELECT u, u FROM edges
  UNION
  SELECT w.u, e.v FROM walk w JOIN edges e ON w.v = e.u
),
comp AS (
  SELECT u AS doc_id, min(v) AS group_id FROM walk GROUP BY u
),
assign AS (
  SELECT d.doc_id, coalesce(c.group_id, d.doc_id) AS group_id
  FROM docs d LEFT JOIN comp c ON c.doc_id = d.doc_id
),
marked AS (
  SELECT doc_id, group_id, {gb} % 100 AS gb, {nb} % 100 AS nb FROM assign
),
named AS MATERIALIZED (
  SELECT doc_id, group_id,
         CASE WHEN gb < {SPLIT_TRAIN_PCT} THEN 'train'
              WHEN gb < {SPLIT_VAL_PCT} THEN 'val' ELSE 'test' END AS split,
         CASE WHEN nb < {SPLIT_TRAIN_PCT} THEN 'train'
              WHEN nb < {SPLIT_VAL_PCT} THEN 'val' ELSE 'test' END AS naive_split
  FROM marked
),
split_counts AS (
  SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT group_id) AS BIGINT) AS n_clusters
  FROM named GROUP BY split
),
pair_marked AS (
  SELECT ma.split AS sa_c, mb.split AS sb_c,
         ma.naive_split AS sa_n, mb.naive_split AS sb_n
  FROM njpairs p
  JOIN named ma ON ma.doc_id = p.id_a
  JOIN named mb ON mb.doc_id = p.id_b
),
leak_naive AS (
  SELECT sa_n AS split, CAST(count(*) AS BIGINT) AS c
  FROM pair_marked WHERE sa_n <> sb_n GROUP BY sa_n
),
leak_cluster AS (
  SELECT sa_c AS split, CAST(count(*) AS BIGINT) AS c
  FROM pair_marked WHERE sa_c <> sb_c GROUP BY sa_c
)
SELECT s.split, s.n_docs, s.n_clusters,
       CAST(coalesce(ln.c, 0) AS BIGINT) AS leaked_pairs_naive,
       CAST(coalesce(lc.c, 0) AS BIGINT) AS leaked_pairs_cluster
FROM split_counts s
LEFT JOIN leak_naive ln ON ln.split = s.split
LEFT JOIN leak_cluster lc ON lc.split = s.split
"""


@register("cluster_aware_split", _split_oracle(), tags=("EXT1",))
def cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/val/test splitting: assign every document
    to a split by the salted hash of its NEAR-DUP CLUSTER id (CC over
    the MinHash-verified pair graph; unpaired docs are their own
    singleton cluster), so no near-duplicate pair can straddle
    train/test — the split-time counterpart of decontamination
    (`contamination_check` audits a finished split; this op makes the
    leak impossible by construction). Per split, reports doc and
    cluster counts plus the number of verified near-dup pairs that
    straddle splits under (a) the naive per-doc hash split — the
    demonstrated leak — and (b) the cluster-aware split, computed the
    same way and provably zero.

    Scale shape: the pair list is banded-LSH-bounded (never
    all-pairs), CC is the shared O(log n)/O(diameter) fixpoint, the
    assignment is ONE doc-keyed left join + pure hash expressions,
    and the leak audit is two pair-sized joins — output is 3 rows.
    The hash is the portable md5 family, so the same corpus splits
    identically on any engine (reproducible across reshards; at
    100 TB the split needs no coordination — any worker can recompute
    any doc's split from its cluster id alone)."""
    from auto_trade_data_pipeline_spark.operators.graph import connected_components

    pairs = scoped_persist(dedup_near_minhash_lsh(spark, sf_dir))
    labels = connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("group_id")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    assign = docs.join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("group_id", "doc_id").alias("group_id")
    )

    # The split expression is the repo's canonical hash_split
    # (operators/text.py) — applied to the CLUSTER id vs the doc id.
    def split_name(col):
        return TX.hash_split(col, SPLIT_TRAIN_PCT, SPLIT_VAL_PCT - SPLIT_TRAIN_PCT)[1]

    named = scoped_persist(
        assign.select(
            "doc_id",
            "group_id",
            split_name(F.col("group_id")).alias("split"),
            split_name(F.col("doc_id")).alias("naive_split"),
        )
    )
    counts = named.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("group_id").cast("long").alias("n_clusters"),
    )
    pm = pairs.join(
        named.select(
            F.col("doc_id").alias("id_a"),
            F.col("split").alias("sa_c"),
            F.col("naive_split").alias("sa_n"),
        ),
        "id_a",
    ).join(
        named.select(
            F.col("doc_id").alias("id_b"),
            F.col("split").alias("sb_c"),
            F.col("naive_split").alias("sb_n"),
        ),
        "id_b",
    )
    leak_n = (
        pm.filter("sa_n <> sb_n")
        .groupBy(F.col("sa_n").alias("split"))
        .agg(F.count(F.lit(1)).cast("long").alias("ln"))
    )
    leak_c = (
        pm.filter("sa_c <> sb_c")
        .groupBy(F.col("sa_c").alias("split"))
        .agg(F.count(F.lit(1)).cast("long").alias("lc"))
    )
    return (
        counts.join(leak_n, "split", "left")
        .join(leak_c, "split", "left")
        .select(
            "split",
            "n_docs",
            "n_clusters",
            F.coalesce("ln", F.lit(0)).cast("long").alias("leaked_pairs_naive"),
            F.coalesce("lc", F.lit(0)).cast("long").alias("leaked_pairs_cluster"),
        )
    )


# ---------------------------------------------------------------------------
# PageRank over the near-dup graph (corpus-authority signal)
# ---------------------------------------------------------------------------

PR_ITERS = 5
PR_TOTAL = 10**12  # one unit of probability mass, in integer rank units
PR_DNUM, PR_DDEN = 85, 100  # damping d = 0.85 as an exact rational


def _pagerank_oracle() -> str:
    """DuckDB twin of operators.graph.pagerank over the MinHash
    near-dup edges: symmetrize, degree, then PR_ITERS chained power
    iterations in pure BIGINT arithmetic (``//`` floor division =
    Spark's ``div``) with full dangling-mass redistribution — the
    iterative update itself is hash-checked cross-engine."""
    ctes = [
        # MATERIALIZED throughout: each pr{{i}} is referenced by THREE
        # downstream CTEs (contrib, dangling, update); inlined, the
        # expansion re-runs the whole LSH pipeline per reference and
        # the oracle goes exponential in the iteration count
        # (observed: 424 s inlined vs ~15 s materialized).
        f"""pr_edges AS MATERIALIZED (
  SELECT id_a AS u, id_b AS v FROM njpairs
  UNION
  SELECT id_b AS u, id_a AS v FROM njpairs
)""",
        "pr_deg AS (SELECT u, count(*) AS degree FROM pr_edges GROUP BY u)",
        """pr_nodes AS MATERIALIZED (
  SELECT d.doc_id AS node, CAST(coalesce(g.degree, 0) AS BIGINT) AS degree
  FROM docs d LEFT JOIN pr_deg g ON g.u = d.doc_id
)""",
        "pr_n AS MATERIALIZED (SELECT count(*) AS n FROM pr_nodes)",
        f"""pr0 AS MATERIALIZED (
  SELECT node, degree, CAST({PR_TOTAL} // (SELECT n FROM pr_n) AS BIGINT) AS rank_units
  FROM pr_nodes
)""",
    ]
    for i in range(PR_ITERS):
        ctes += [
            f"""pr_c{i} AS (
  SELECT e.v AS node,
         CAST(sum(({PR_DNUM} * r.rank_units) // ({PR_DDEN} * r.degree)) AS BIGINT) AS contrib
  FROM pr_edges e JOIN pr{i} r ON r.node = e.u
  GROUP BY e.v
)""",
            f"""pr_d{i} AS (
  SELECT CAST(({PR_DNUM} * coalesce(sum(rank_units), 0))
              // ({PR_DDEN} * (SELECT n FROM pr_n)) AS BIGINT) AS dang
  FROM pr{i} WHERE degree = 0
)""",
            f"""pr{i + 1} AS MATERIALIZED (
  SELECT b.node, b.degree,
         CAST((SELECT (({PR_DDEN} - {PR_DNUM}) * {PR_TOTAL}) // ({PR_DDEN} * n) FROM pr_n)
              + coalesce(c.contrib, 0) + d.dang AS BIGINT) AS rank_units
  FROM pr_nodes b LEFT JOIN pr_c{i} c ON c.node = b.node, pr_d{i} d
)""",
        ]
    body = ",\n".join(ctes)
    return f"""
WITH {_minhash_ctes()},
{body}
SELECT node AS doc_id, degree, rank_units FROM pr{PR_ITERS}
"""


@register("graph_pagerank", _pagerank_oracle(), tags=("EXT1",))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-authority ranking: integer-exact PageRank over the
    MinHash near-dup pair graph (operators/graph.py:pagerank) — the
    'domain ranking' stage a pretraining pipeline uses to weight
    sources, here scoring how central each document is in its
    duplication neighborhood. 5 power iterations, damping 85/100,
    dangling mass redistributed; every node of the documents table is
    ranked (isolated docs converge to the teleport+dangling floor).
    All mass is BIGINT rank units updated with integer floor-division,
    so the iterative fixpoint is bit-identical at any parallelism and
    the DuckDB oracle replays the exact iterations."""
    from auto_trade_data_pipeline_spark.operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup_near_minhash_lsh(spark, sf_dir)
    ranks = pagerank(
        docs,
        pairs,
        node_col="doc_id",
        iters=PR_ITERS,
        d_num=PR_DNUM,
        d_den=PR_DDEN,
        total_units=PR_TOTAL,
    )
    return ranks.select(F.col("node").alias("doc_id"), "degree", "rank_units")


# ---------------------------------------------------------------------------
# Near-dup dedup: SimHash + Hamming-LSH
# ---------------------------------------------------------------------------


def _simhash_oracle() -> str:
    vote_terms = " + ".join(
        f"CASE WHEN (h >> {j}) & 1 = 1 THEN CAST({2**j} AS BIGINT) ELSE 0 END"
        for j in range(32)
    )
    votes = ",\n         ".join(
        f"list_sum(list_transform(hs, h -> CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END)) AS v{j}"
        for j in range(32)
    )
    sim = " + ".join(f"CASE WHEN v{j} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END" for j in range(32))
    chunk_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {c} AS chunk_idx, (simhash >> {8 * c}) & 255 AS chunk_val, simhash FROM sims"
        for c in range(4)
    )
    return f"""
WITH {_DOCS_CTE},
th AS (
  SELECT doc_id, list_transform(list_distinct(ts), t -> {_duck_hash('t')}) AS hs
  FROM toks
),
vt AS (
  SELECT doc_id,
         {votes}
  FROM th
),
sims AS (
  SELECT doc_id, {sim} AS simhash FROM vt
),
chunks AS (
{chunk_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM chunks a JOIN chunks b
    ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, bit_count(xor(sim_a, sim_b)) AS hamming
FROM cand
WHERE bit_count(xor(sim_a, sim_b)) <= 2
"""


@register("dedup_simhash", _simhash_oracle(), tags=("EXT1",))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 32-bit majority-vote hash per document, then
    Hamming-LSH on 8-bit chunks (pairs must share a chunk — pigeonhole
    guarantees recall to distance 3, probabilistic beyond) and a
    bit_count(xor) <= 2 verify (operators/text.py:simhash32)."""
    docs = load_table(spark, sf_dir, "documents")
    tokenized = docs.select("doc_id", TX.tokens(F.col("text")).alias("toks"))
    sim = TX.simhash32(tokenized, "toks", "doc_id")
    return TX.simhash_candidate_pairs(sim, "doc_id", max_hamming=2, chunks=4)


# ---------------------------------------------------------------------------
# Near-dup / plagiarism detection: winnowing fingerprints (MOSS)
# ---------------------------------------------------------------------------

WINNOW_K = 12
WINNOW_W = 8
WINNOW_MAX_DF = 10
WINNOW_MIN_OVERLAP = 3
WINNOW_MIN_CONTAINMENT = 0.5

_WINNOW_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, regexp_replace(lower(text), '\\W+', '', 'g') AS norm FROM documents
),
hs AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(norm) - {WINNOW_K - 1}, 0) + 1),
           i -> {_duck_hash(f"substr(norm, i, {WINNOW_K})")}) AS h
  FROM docs
),
wins AS (
  SELECT doc_id,
         CASE WHEN len(h) = 0 THEN []
              WHEN len(h) < {WINNOW_W} THEN [list_aggregate(h, 'min')]
              ELSE list_distinct(list_transform(range(1, len(h) - {WINNOW_W - 1} + 1),
                     j -> list_aggregate(h[j:j+{WINNOW_W - 1}], 'min'))) END AS sketch
  FROM hs
),
fp AS (SELECT doc_id, unnest(sketch) AS f FROM wins),
rare AS (SELECT f FROM fp GROUP BY f HAVING count(*) <= {WINNOW_MAX_DF}),
ff AS (SELECT fp.doc_id, fp.f FROM fp JOIN rare USING (f)),
sz AS (SELECT doc_id, count(*) AS n FROM ff GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS overlap
  FROM ff a JOIN ff b ON a.f = b.f AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= {WINNOW_MIN_OVERLAP}
)
SELECT p.id_a, p.id_b, p.overlap,
       round(p.overlap / least(sa.n, sb.n), 4) AS containment
FROM pairs p
JOIN sz sa ON sa.doc_id = p.id_a
JOIN sz sb ON sb.doc_id = p.id_b
WHERE round(p.overlap / least(sa.n, sb.n), 4) >= {WINNOW_MIN_CONTAINMENT}
"""


@register("winnowing_overlap", _WINNOW_ORACLE, tags=("EXT1", "bench"))
def winnowing_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint overlap (Schleimer/Wilkerson/Aiken
    SIGMOD'03, the MOSS plagiarism detector): positional char-12-gram
    hashes, per-8-window minimum selection (any shared substring of
    >= 19 chars lands a common fingerprint in both sketches), a
    boilerplate cut at document frequency > 10, then a
    fingerprint-keyed self-join scoring pairs by overlap count and
    containment. Complements MinHash (set similarity) with LOCAL
    substring-overlap evidence; on the planted near-dup corpus the
    containment >= 0.5 cut recovers exactly the Jaccard >= 0.3 pairs.
    (operators/text.py:winnow_sketch, winnow_overlap_pairs)."""
    # fan_out_scan: the single-split testdata scan serializes the
    # positional-gram md5 pipeline (~1M grams) on ONE task — measured
    # 6.1s of a 9.1s pass in one stage-47 task; at 100 TB the scan
    # splits itself and the fan-out is a no-op.
    docs = fan_out_scan(load_table(spark, sf_dir, "documents"))
    # Persist the fingerprint rows at their reuse point: the overlap
    # stage reads them from both sides of the self-join (and through
    # two analytic windows); without materialization the optimizer
    # replicates the gram-hash pipeline into every branch.
    fp = scoped_persist(TX.winnow_fingerprints(docs, "text", "doc_id", WINNOW_K, WINNOW_W))
    return TX.winnow_overlap_pairs(
        fp,
        "doc_id",
        max_df=WINNOW_MAX_DF,
        min_overlap=WINNOW_MIN_OVERLAP,
        min_containment=WINNOW_MIN_CONTAINMENT,
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_DOT = (
    "list_reduce(list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (acc, x) -> acc + x)"
)


def _cos(a: str, b: str) -> str:
    return (
        f"({_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)})))"
    )


_TOPK_COSINE_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round({_cos('q.qv', 'e.embedding')}, 6) AS cos
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 5
"""


@register("similarity_topk_cosine", _TOPK_COSINE_ORACLE, tags=("EXT2", "bench"))
def similarity_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for 10 query vectors — the
    brute-force baseline: broadcast queries, sequential-order dot
    products (bit-deterministic), per-query window rank."""
    emb = load_table(spark, sf_dir, "embeddings")
    return VX.cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


KMEANS_K = 8
KMEANS_ITERS = 2


def _kmeans_ctes(k: int = KMEANS_K, iters: int = KMEANS_ITERS, src: str = "embeddings") -> str:
    """Shared DuckDB twin of operators.vectors.kmeans_cells: the same
    seed selection (smallest md5-60bit of the id), the same round-6
    cosine argmax assignment, the same integer-scaled centroid means —
    iteration for iteration, so the trained quantizer is
    bit-reproducible cross-engine. Returns the CTE body ending with
    ``afin`` (the final cell assignment) and ``c{iters}`` (the trained
    centroids); callers append their own consumers. ``src`` names the
    corpus the quantizer trains on/assigns — the ``embeddings`` table
    by default, or a caller-provided CTE (e.g. a train split)."""

    def assign(prev_cents: str, out: str) -> str:
        return f"""{out} AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, p.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY round({_cos('e.embedding', 'p.centroid')}, 6) DESC, p.cell) AS pr
    FROM {src} e, {prev_cents} p
  ) WHERE pr = 1
)"""

    def update(assigned: str, out: str) -> str:
        return f"""{out} AS (
  SELECT cell, list(mean ORDER BY pos) AS centroid FROM (
    SELECT cell, pos,
           (CAST(sum(CAST(round(v * 1000000) AS BIGINT)) AS BIGINT) / 1000000.0) / count(*) AS mean
    FROM (SELECT cell, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
          FROM {assigned}, range(1, 65) t(i))
    GROUP BY cell, pos
  ) GROUP BY cell
)"""

    ctes = [
        f"""c0 AS (
  SELECT cell, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid FROM (
    SELECT embedding,
           row_number() OVER (ORDER BY CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT), vec_id) - 1 AS cell
    FROM {src}
  ) WHERE cell < {k}
)"""
    ]
    for i in range(iters):
        ctes.append(assign(f"c{i}", f"a{i + 1}"))
        ctes.append(update(f"a{i + 1}", f"c{i + 1}"))
    ctes.append(assign(f"c{iters}", "afin"))
    return ",\n".join(ctes)


def _ivf_kmeans_oracle(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    return f"""
WITH {_kmeans_ctes(k, iters)},
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
probes AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, c.cell,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY round({_cos('q.qv', 'c.centroid')}, 6) DESC, c.cell) AS pr
    FROM q, c{iters} c
  ) WHERE pr <= 2
),
scored AS (
  SELECT p.query_id, e.vec_id AS neighbor_id,
         round({_cos('p.qv', 'e.embedding')}, 6) AS cos
  FROM probes p JOIN afin e ON e.cell = p.cell AND e.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 5
"""


@register("similarity_topk_ivf", _ivf_kmeans_oracle(), tags=("EXT2",))
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-5 with a TRAINED coarse quantizer: deterministic
    k-means (hash-sampled seeds, round-6 cosine argmax assignment,
    integer-exact centroid means; operators/vectors.py:kmeans_cells),
    nprobe=2 probe selection, exact rerank inside probed cells only —
    the 100 TB path where unprobed cells are never scanned. The
    oracle retrains the quantizer iteration-for-iteration in SQL, so
    even the k-means is hash-checked cross-engine."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, cents = VX.kmeans_cells(emb, k=KMEANS_K, iters=KMEANS_ITERS)
    return VX.ivf_topk(
        assigned, emb.filter(F.col("vec_id") < 10), cents, k=5, nprobe=2, cell_col="cell"
    )


# ---------------------------------------------------------------------------
# Semantic (embedding-space) train/test contamination
# ---------------------------------------------------------------------------

#: Cosine threshold for the semantic contamination query — calibrated
#: so it fires on the synthetic near-random embeddings (max eval/train
#: cosine ~0.49; ~30 pairs >= 0.35 before cell routing) without
#: flagging everything. Real text embeddings of a leaked benchmark
#: doc sit at 0.9+; the MACHINERY, not the constant, is the operator.
SEM_CONTAM_T = 0.35
#: Cells probed per eval vector (of KMEANS_K trained cells).
SEM_CONTAM_NPROBE = 2
#: Deterministic eval/benchmark split: vec_id % 20 == 7 plays the
#: held-out benchmark; the rest is the training corpus.
SEM_CONTAM_EVAL_MOD, SEM_CONTAM_EVAL_RESIDUE = 20, 7


def _sem_contam_oracle(
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    t: float = SEM_CONTAM_T,
    nprobe: int = SEM_CONTAM_NPROBE,
) -> str:
    m, r = SEM_CONTAM_EVAL_MOD, SEM_CONTAM_EVAL_RESIDUE
    return f"""
WITH train AS (SELECT * FROM embeddings WHERE vec_id % {m} <> {r}),
{_kmeans_ctes(k, iters, src="train")},
q AS (SELECT vec_id AS eval_id, embedding AS qv
      FROM embeddings WHERE vec_id % {m} = {r}),
probes AS (
  SELECT eval_id, qv, cell FROM (
    SELECT q.eval_id, q.qv, c.cell,
           row_number() OVER (PARTITION BY q.eval_id
                              ORDER BY round({_cos('q.qv', 'c.centroid')}, 6) DESC, c.cell) AS pr
    FROM q, c{iters} c
  ) WHERE pr <= {nprobe}
),
hits AS (
  SELECT train_id, eval_id, cos FROM (
    SELECT e.vec_id AS train_id, p.eval_id,
           round({_cos('p.qv', 'e.embedding')}, 6) AS cos
    FROM probes p JOIN afin e ON e.cell = p.cell
  ) WHERE cos >= {t}
),
ranked AS (
  SELECT train_id, eval_id, cos,
         row_number() OVER (PARTITION BY train_id ORDER BY cos DESC, eval_id) AS rn,
         CAST(count(*) OVER (PARTITION BY train_id) AS BIGINT) AS n_eval_hits
  FROM hits
)
SELECT train_id, n_eval_hits, cos AS max_cos, eval_id AS top_eval_id
FROM ranked WHERE rn = 1
"""


@register("semantic_contamination", _sem_contam_oracle(), tags=("EXT2", "EXT3"))
def semantic_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) train/test contamination detection —
    the vector-space complement of the n-gram ``contamination_check``
    (corpus/clean.py): a TRAIN vector is contaminated when its cosine
    to some held-out EVAL/benchmark vector reaches ``SEM_CONTAM_T``.
    The comparison is routed through the trained IVF coarse quantizer
    (operators/vectors.py:kmeans_cells — trained on the TRAIN split
    only, the honest protocol: the index must not see the benchmark):
    each eval vector probes its ``nprobe`` nearest cells and compares
    against train vectors IN THOSE CELLS only — the standard
    ANN-decontamination trade, and part of the spec here (the oracle
    replays the identical probing, so the result is hash-exact, not
    "approximately similar"). Output: one row per contaminated train
    vector — hit count, max cosine, and the argmax eval id (smallest
    id on ties, deterministic cross-engine).

    Scale shape (100 TB): the quantizer + probe table are
    dimension-sized broadcasts; the corpus-sized train side shuffles
    ONCE (by cell, for the window) — with cell-partitioned storage
    even that disappears into partition pruning, and unprobed cells
    are never read. The eval/benchmark side is benchmark-sized by
    construction. Nothing is all-pairs; per-cell work is
    |cell| x |probes into that cell|, the IVF trade."""
    emb = load_table(spark, sf_dir, "embeddings")
    m, r = SEM_CONTAM_EVAL_MOD, SEM_CONTAM_EVAL_RESIDUE
    train = emb.filter(F.col("vec_id") % m != r)
    evalq = emb.filter(F.col("vec_id") % m == r)
    assigned, cents = VX.kmeans_cells(train, k=KMEANS_K, iters=KMEANS_ITERS)

    probe_w = Window.partitionBy("eval_id").orderBy(F.col("__ccos").desc(), "cell")
    probes = (
        evalq.select(F.col("vec_id").alias("eval_id"), F.col("embedding").alias("__qv"))
        .join(F.broadcast(cents))
        .withColumn("__ccos", F.round(VX.cosine(F.col("__qv"), F.col("centroid")), 6))
        .withColumn("__pr", F.row_number().over(probe_w))
        .filter(F.col("__pr") <= SEM_CONTAM_NPROBE)
        .select("eval_id", "__qv", "cell")
    )
    hits = (
        assigned.select(
            F.col("vec_id").alias("train_id"), F.col("embedding").alias("__tv"), "cell"
        )
        .join(F.broadcast(probes), "cell")
        .withColumn("cos", F.round(VX.cosine(F.col("__qv"), F.col("__tv")), 6))
        .filter(F.col("cos") >= SEM_CONTAM_T)
    )
    w = Window.partitionBy("train_id").orderBy(F.col("cos").desc(), "eval_id")
    return (
        hits.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_eval_hits", F.count(F.lit(1)).over(Window.partitionBy("train_id"))
        )
        .filter(F.col("rn") == 1)
        .select(
            "train_id",
            "n_eval_hits",
            F.col("cos").alias("max_cos"),
            F.col("eval_id").alias("top_eval_id"),
        )
    )


_NORM_STATS_ORACLE = f"""
WITH n AS (
  SELECT label, sqrt({_DOT.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings
)
SELECT label,
       count(*) AS vectors,
       round(min(nrm), 4) AS min_norm,
       round(max(nrm), 4) AS max_norm,
       round((CAST(sum(CAST(round(nrm * 1000000) AS BIGINT)) AS BIGINT) / 1000000.0) / count(*), 6) AS avg_norm
FROM n
GROUP BY label
"""


@register("embedding_norm_stats", _NORM_STATS_ORACLE, tags=("EXT2",))
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell embedding L2-norm profile (count/min/max/avg) — the
    sanity scan before any ANN build. Mean uses integer-scaled sums
    (order-independent)."""
    emb = load_table(spark, sf_dir, "embeddings")
    nrm = VX.l2_norm(F.col("embedding"))
    d = emb.select("label", nrm.alias("nrm"))
    return d.groupBy("label").agg(
        F.count(F.lit(1)).alias("vectors"),
        F.round(F.min("nrm"), 4).alias("min_norm"),
        F.round(F.max("nrm"), 4).alias("max_norm"),
        F.round(
            (F.sum(F.round(F.col("nrm") * 1e6, 0).cast("long")) / 1e6) / F.count(F.lit(1)), 6
        ).alias("avg_norm"),
    )


# ---------------------------------------------------------------------------
# Dominant embedding direction (integer-exact distributed power iteration)
# ---------------------------------------------------------------------------

EMB_DIM = 64
PC1_XSCALE = 10**5  # component scale: (0.53e5)^2 * rows stays < 2^63 past sf10
PC1_GDIV = 10**6  # Gram shrink before matvec so G'*v stays < 2^63
PC1_VSCALE = 10**6  # direction vector renormalized to max|v| = 1e6 each round
PC1_ROUNDS = 128


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division — Spark ``div`` == DuckDB ``//``
    (both truncate toward zero; Python's ``//`` FLOORS, which diverges
    on negative numerators — probed on both engines)."""
    q = abs(a) // b
    return -q if a < 0 else q


def power_iteration_int(
    gram: dict[tuple[int, int], int],
    dim: int,
    rounds: int = PC1_ROUNDS,
    gdiv: int = PC1_GDIV,
    vscale: int = PC1_VSCALE,
) -> list[int]:
    """Dominant-eigenvector power iteration in pure integers: start
    from all-ones, each round w = (G // gdiv) @ v then renormalize
    v = w * vscale // max|w| (truncating division, engine-portable).
    Deterministic — no norms, no square roots, no FP accumulation —
    so a SQL oracle replays the identical chain."""
    g = {pq: _tdiv(val, gdiv) for pq, val in gram.items()}
    v = [vscale] * dim
    for _ in range(rounds):
        w = [
            sum(g.get((p, q), 0) * v[q] for q in range(dim))
            for p in range(dim)
        ]
        m = max(max(abs(x) for x in w), 1)
        v = [_tdiv(x * vscale, m) for x in w]
    return v


def _pc1_oracle() -> str:
    ctes = [
        f"""px AS MATERIALIZED (
  SELECT vec_id, label, i - 1 AS p,
         CAST(round(CAST(embedding[i] AS DOUBLE) * {PC1_XSCALE}) AS BIGINT) AS xi
  FROM embeddings, range(1, {EMB_DIM + 1}) t(i)
)""",
        f"""pg AS MATERIALIZED (
  SELECT a.p AS p, b.p AS q,
         CAST(sum(a.xi * b.xi) AS BIGINT) // {PC1_GDIV} AS g
  FROM px a JOIN px b ON a.vec_id = b.vec_id
  GROUP BY a.p, b.p
)""",
        f"pv0 AS (SELECT p, CAST({PC1_VSCALE} AS BIGINT) AS v FROM range(0, {EMB_DIM}) t(p))",
    ]
    for i in range(PC1_ROUNDS):
        ctes += [
            f"""pw{i} AS MATERIALIZED (
  SELECT g.p, CAST(sum(g.g * v.v) AS BIGINT) AS w
  FROM pg g JOIN pv{i} v ON v.p = g.q
  GROUP BY g.p
)""",
            f"pm{i} AS (SELECT greatest(max(abs(w)), 1) AS m FROM pw{i})",
            f"""pv{i + 1} AS MATERIALIZED (
  SELECT p, CAST(w * {PC1_VSCALE} // (SELECT m FROM pm{i}) AS BIGINT) AS v
  FROM pw{i}
)""",
        ]
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT x.vec_id, any_value(x.label) AS label,
       CAST(sum(x.xi * v.v) AS BIGINT) AS pc1_proj
FROM px x JOIN pv{PC1_ROUNDS} v ON v.p = x.p
GROUP BY x.vec_id
"""


@register("embedding_pc1_power", _pc1_oracle(), tags=("EXT2",))
def embedding_pc1_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding corpus —
    distributed PCA's first step, with every number engine-exact:
    components integer-scaled (e5), the uncentered second-moment
    (Gram) matrix accumulated as ONE d^2-keyed BIGINT aggregation
    over a vec_id-keyed self-join of the exploded components (the
    classic outer-product layout: d^2 * n multiply-adds map-side,
    d^2 = 4,096 result rows), then PC1_ROUNDS fixed rounds of power
    iteration on the dimension-sized G — matvec + max-abs
    renormalization in truncating integer division (Spark ``div`` ==
    DuckDB ``//``; no norms, no sqrt, no FP accumulation, so the
    ENTIRE iteration is hash-checked cross-engine, the PageRank
    discipline applied to PCA). Round count is sized to the spectral
    gap, not a token few: the synthetic corpus is nearly isotropic
    (gap ratio ~1.02-1.07 measured), so 128 rounds land |cos| to the
    true eigh PC1 at 1.000 (sf0.001) / 0.9986 (sf0.01) — pinned in
    tests/test_pc1.py; a real embedding corpus with an actual
    dominant axis converges far faster. The readout projects every vector
    onto the final direction: (vec_id, label, pc1_proj) — the
    corpus's dominant-axis ordering (drift/outlier triage; label
    separation along PC1 shows up directly).

    Scale shape: the Gram aggregation is the only corpus-scale job
    (map-side combinable, uniform (p, q) keys); G is d^2 rows —
    dimension-sized like a k-means codebook, so the iteration runs
    driver-side in exact Python integers (the BPE pattern: train on
    the histogram, broadcast the model) and the final direction
    returns as 64 literals in a broadcast join. One corpus scan for
    the Gram, one for the projection."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("p", "xv"),
    ).select(
        "vec_id",
        "label",
        "p",
        F.round(F.col("xv") * PC1_XSCALE, 0).cast("long").alias("xi"),
    )
    x = scoped_persist(x)
    b = x.select(
        F.col("vec_id").alias("vid_b"), F.col("p").alias("q"), F.col("xi").alias("xj")
    )
    gram_rows = (
        x.join(b, F.col("vec_id") == F.col("vid_b"))
        .groupBy("p", "q")
        .agg(F.sum(F.col("xi") * F.col("xj")).cast("long").alias("g"))
        .collect()  # d^2 = 4,096 rows — dimension-sized by construction
    )
    gram = {(r["p"], r["q"]): r["g"] for r in gram_rows}
    v = power_iteration_int(gram, EMB_DIM)
    vdf = spark.createDataFrame(
        [(p, int(c)) for p, c in enumerate(v)], "p int, v long"
    )
    return (
        x.join(F.broadcast(vdf), "p")
        .groupBy("vec_id")
        .agg(
            F.any_value(F.col("label")).alias("label"),
            F.sum(F.col("xi") * F.col("v")).cast("long").alias("pc1_proj"),
        )
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------

_MULTIMODAL_ORACLE = """
SELECT doc_id, lang,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       CAST(octet_length(encode(text)) % 64 + 1 AS INT) AS width,
       CAST(octet_length(encode(text)) // 64 % 64 + 1 AS INT) AS height,
       3 AS channels
FROM documents
"""


@register("multimodal_decode_stats", _MULTIMODAL_ORACLE, tags=("EXT4", "U1"))
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline plumbing: binary payload column + metadata
    struct -> Arrow-batched mapInPandas pseudo-decoder
    (operators/multimodal.py — decode math is a documented stub; the
    schema/batching/UDF surface is the production shape)."""
    return decode_stats(load_table(spark, sf_dir, "documents"))


_FRAME_SAMPLE_ORACLE = f"""
WITH f AS (
  SELECT doc_id, CAST(unnest(range(0, 4)) AS INT) AS frame_idx,
         text, length(text) AS n
  FROM documents WHERE length(text) > 0
)
SELECT doc_id, frame_idx,
       CAST(frame_idx * n // 4 AS INT) AS frame_off,
       CAST(least(64, n - frame_idx * n // 4) AS INT) AS frame_len,
       {_duck_hash("substr(text, frame_idx * n // 4 + 1, least(64, n - frame_idx * n // 4))")} AS frame_hash
FROM f
"""


@register("multimodal_frame_sample", _FRAME_SAMPLE_ORACLE, tags=("EXT4", "U1"))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads
    (operators/multimodal.py:sample_frames): 4 uniform-offset frames
    per payload, ONE OUTPUT ROW PER FRAME — the one-to-many decode
    shape (ffmpeg keyframe extraction slots in at the byte slice).
    Only 40-byte frame descriptors leave the Python worker; the
    oracle reproduces offsets and frame hashes byte-for-byte (ASCII
    payloads: char offsets == byte offsets)."""
    return sample_frames(load_table(spark, sf_dir, "documents"))


def _hist_oracle() -> str:
    from auto_trade_data_pipeline_spark.operators.multimodal import N_HIST_BINS

    hcols = ",\n       ".join(
        f"CAST(coalesce(max(CASE WHEN bin = {i} THEN cnt END), 0) AS INT) AS h{i}"
        for i in range(N_HIST_BINS)
    )
    return f"""
WITH c AS (
  SELECT doc_id, unnest(range(1, length(text) + 1)) AS i, text FROM documents
),
b AS (SELECT doc_id, ord(substr(text, CAST(i AS INT), 1)) // 16 AS bin FROM c),
hh AS (SELECT doc_id, bin, count(*) AS cnt FROM b GROUP BY doc_id, bin),
dom AS (
  SELECT doc_id, bin AS dominant_bin,
         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bin) AS rn
  FROM hh
)
SELECT hh.doc_id,
       {hcols},
       CAST(min(dom.dominant_bin) AS INT) AS dominant_bin
FROM hh JOIN dom ON hh.doc_id = dom.doc_id AND dom.rn = 1
GROUP BY hh.doc_id
"""


@register("multimodal_byte_histogram", _hist_oracle(), tags=("EXT4", "U1"))
def multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-style feature extraction
    (operators/multimodal.py:byte_histogram_features): a 16-bin
    byte-value histogram per payload (pixel-intensity stand-in) as
    exact integer counts + dominant bin (ties to the lowest bin) —
    numpy.bincount inside the Arrow batch, bit-reproducible by the
    oracle's ord()-based recount."""
    return byte_histogram_features(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup + blocked exact n-gram Jaccard
# ---------------------------------------------------------------------------

_COS_NEARDUP_ORACLE = f"""
WITH pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round({_cos('a.embedding', 'b.embedding')}, 6) AS cos
  FROM embeddings a
  JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, cos
FROM pairs
WHERE cos >= 0.4
"""


@register("dedup_embedding_cosine", _COS_NEARDUP_ORACLE, tags=("EXT1", "EXT2"))
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= 0.4 — sized to
    this corpus's within-cell similarity tail), blocked by
    coarse cell (label): candidate pairs form only within a cell —
    the IVF-style blocking that avoids the all-pairs crossJoin. At
    100 TB the cell assignment comes from a coarse quantizer; the
    join shape is identical. Cells are capped by the oversized-block
    guard (operators/skew.py) so one dense cell can never become an
    n^2 task — inert at oracle scale (no cell approaches the cap), so
    the oracle needs no sub-block model."""
    from auto_trade_data_pipeline_spark.operators.skew import split_oversized_blocks

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("label").alias("cell"), "vec_id", "embedding"
    )
    emb = split_oversized_blocks(emb, "cell", "vec_id", max_rows=10_000)
    # Per-vector norms projected once per side BELOW the join: the
    # pair cosine then evaluates one interpreted aggregate() fold
    # (the dot) instead of three — `dot / (na * nb)` is the identical
    # IEEE expression VX.cosine builds (round-10; measured 6.5 ->
    # ~2.5 s at sf0.1).
    a = emb.select(
        "cell",
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("__va"),
        VX.l2_norm(F.col("embedding")).alias("__na"),
    )
    b = emb.select(
        "cell",
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("__vb"),
        VX.l2_norm(F.col("embedding")).alias("__nb"),
    )
    pairs = a.join(b, "cell").filter(F.col("id_a") < F.col("id_b"))
    cos = F.round(
        VX.dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 6
    )
    return (
        pairs.withColumn("cos", cos)
        .filter(F.col("cos") >= 0.4)
        .select("id_a", "id_b", "cos")
    )


_NGRAM_JACCARD_ORACLE = f"""
WITH {_DOCS_CTE},
{_SHINGLES_CTE},
keyed AS (
  SELECT s.doc_id, d.source, s.shingles
  FROM sh s JOIN docs d USING (doc_id)
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.shingles, b.shingles))
           / (1.0 * (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)))) AS j
  FROM keyed a
  JOIN keyed b ON a.source = b.source AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, round(j, 4) AS jaccard
FROM pairs
WHERE j >= {JACCARD_T}
"""


@register("ngram_jaccard_blocked", _NGRAM_JACCARD_ORACLE, tags=("EXT1",))
def ngram_jaccard_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard dedup with SOURCE blocking: pairs
    compared only within the same source (the metadata-blocking
    strategy — exact within blocks, zero recall outside, a different
    trade than MinHash-LSH's probabilistic global recall). Source
    blocks are capped by the oversized-block guard (operators/
    skew.py); inert at oracle scale, so the oracle needs no
    sub-block model."""
    from auto_trade_data_pipeline_spark.operators.skew import split_oversized_blocks

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    shingled = docs.select(
        "doc_id",
        "source",
        TX.word_shingles(TX.tokens(F.col("text")), SHINGLE_N).alias("shingles"),
    )
    shingled = scoped_persist(split_oversized_blocks(shingled, "source", "doc_id", max_rows=10_000))
    a = shingled.select(
        F.col("source"), F.col("doc_id").alias("id_a"), F.col("shingles").alias("__sa")
    )
    b = shingled.select(
        F.col("source"), F.col("doc_id").alias("id_b"), F.col("shingles").alias("__sb")
    )
    pairs = a.join(b, "source").filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
    union = (F.size("__sa") + F.size("__sb")).cast("double") - inter
    return (
        pairs.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= JACCARD_T)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


_SRP_COS = _cos("a.embedding", "b.embedding")

_SRP_NEARDUP_ORACLE = f"""
WITH planes AS (
  SELECT j, i,
         CASE WHEN CAST('0x' || substr(md5('srp:' || j || ':' || i), 1, 15) AS BIGINT) % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM range(0, 16) t1(j), range(0, 64) t2(i)
),
scaled AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(round(x * 1000000) AS BIGINT)) AS v
  FROM embeddings
),
proj AS (
  SELECT s.vec_id, p.j, sum(s.v[p.i + 1] * p.s) AS dotp
  FROM scaled s, planes p
  GROUP BY s.vec_id, p.j
),
sig AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN dotp >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT)
           AS signature
  FROM proj GROUP BY vec_id
),
bands AS (
  SELECT vec_id, b AS band_idx, (signature >> (b * 4)) & 15 AS band_val
  FROM sig, range(0, 4) t(b)
),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM bands x
  JOIN bands y ON x.band_idx = y.band_idx AND x.band_val = y.band_val
             AND x.vec_id < y.vec_id
)
SELECT id_a, id_b, round({_SRP_COS}, 6) AS cos
FROM cand
JOIN embeddings a ON a.vec_id = id_a
JOIN embeddings b ON b.vec_id = id_b
WHERE {_SRP_COS} >= 0.4
"""


@register("dedup_embedding_srp", _SRP_NEARDUP_ORACLE, tags=("EXT1", "EXT2"))
def dedup_embedding_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via signed-random-projection cosine LSH —
    the metadata-FREE counterpart of dedup_embedding_cosine (which
    blocks on the label column): SRP signatures band vectors by the
    geometry alone, so recall crosses cell boundaries (this query
    finds cross-label pairs the cell-blocked variant structurally
    cannot). Banded self-join on (band_idx, band_val), exact-cosine
    verification — precision 1.0, recall 1-(1-p^r)^b per Charikar.
    The oracle regenerates the identical md5-parity hyperplanes and
    reproduces the result bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    return VX.srp_near_dup(emb, threshold=0.4, nbits=16, band_bits=4, dims=64)


# ---------------------------------------------------------------------------
# Span-level exact-substring dedup (Lee et al., ACL'22)
# ---------------------------------------------------------------------------

SPAN_K = 8  # token-gram length: the minimum duplicated run worth removing

_SPAN_DEDUP_ORACLE = f"""
WITH {_DOCS_CTE},
posn AS (
  SELECT doc_id, ts, unnest(range(1, greatest(len(ts) - {SPAN_K} + 1, 0) + 1)) AS pos
  FROM toks
),
grams AS (
  SELECT doc_id, pos,
         {_duck_hash(f"array_to_string(ts[pos:pos+{SPAN_K - 1}], ' ')")} AS gh
  FROM posn
),
dup AS (SELECT gh FROM grams GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
hits AS (SELECT g.doc_id, g.pos, g.pos + {SPAN_K - 1} AS e FROM grams g JOIN dup USING (gh)),
flagged AS (
  SELECT doc_id, pos, e,
         CASE WHEN pos > coalesce(max(e) OVER (
             PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           THEN 1 ELSE 0 END AS nw
  FROM hits
),
isl AS (
  SELECT doc_id, pos, e,
         sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
)
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(e) AS BIGINT) AS span_end,
       CAST(max(e) - min(pos) + 1 AS BIGINT) AS span_len
FROM isl GROUP BY doc_id, island
"""


@register("span_dedup_exact", _SPAN_DEDUP_ORACLE, tags=("EXT1",))
def span_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring SPANS (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL'22) — the
    span-level complement of document-level dedup: every maximal run
    of tokens covered by some 8-gram that also appears in ANOTHER
    document, found by positional gram hashing + a document-frequency
    cut + a gaps-and-islands interval merge
    (operators/text.py:duplicated_spans). One row per maximal span
    (doc_id, span_start, span_end, span_len) in token coordinates —
    the removal list a span-level cleaner consumes. Integer
    arithmetic end-to-end; the oracle replays the identical hashes
    and window algebra."""
    # fan_out: positional gram hashing is the corpus-sized map side
    # (r10; the winnowing precedent — serialized on the single split).
    docs = fan_out_scan(load_table(spark, sf_dir, "documents"))
    return TX.duplicated_spans(docs, "text", "doc_id", k=SPAN_K)


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al., NeurIPS'23)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 1024
DSIR_TARGET_SOURCE = "src0"  # the "high-quality target corpus" stand-in

_DSIR_ORACLE = f"""
WITH {_DOCS_CTE},
uni AS (SELECT doc_id, source, unnest(ts) AS f FROM toks),
bi AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, greatest(len(ts) - 1, 0) + 1),
                               i -> ts[i] || ' ' || ts[i+1])) AS f
  FROM toks
),
feats AS (
  SELECT doc_id, source, {_duck_hash('f')} % {DSIR_BUCKETS} AS bucket
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
),
tgt AS (
  SELECT bucket, count(*) AS ct FROM feats WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY bucket
),
raw AS (SELECT bucket, count(*) AS cr FROM feats GROUP BY bucket),
tot AS (
  SELECT (SELECT CAST(sum(ct) AS BIGINT) FROM tgt) AS tt,
         (SELECT CAST(sum(cr) AS BIGINT) FROM raw) AS tr
),
ratios AS (
  SELECT r.bucket,
         ln((coalesce(t.ct, 0) + 1) / (1.0 * (tot.tt + {DSIR_BUCKETS})))
           - ln((r.cr + 1) / (1.0 * (tot.tr + {DSIR_BUCKETS}))) AS ratio
  FROM raw r LEFT JOIN tgt t ON r.bucket = t.bucket, tot
),
per_doc AS (SELECT doc_id, bucket, count(*) AS n FROM feats GROUP BY doc_id, bucket)
SELECT d.doc_id,
       CAST(sum(d.n) AS BIGINT) AS n_feats,
       round(sum(d.n * r.ratio), 4) AS weight
FROM per_doc d JOIN ratios r ON d.bucket = r.bucket
GROUP BY d.doc_id
"""


@register("dsir_importance", _DSIR_ORACLE, tags=("EXT3",))
def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al.,
    NeurIPS'23): score every document by the hashed-n-gram (unigram +
    bigram, 1024 buckets) log-likelihood ratio between a TARGET
    distribution (here: the 'src0' source, standing in for the
    curated corpus) and the RAW corpus distribution — the standard
    recipe for choosing pretraining data that "looks like" a trusted
    corpus without training a classifier
    (operators/text.py:dsir_weights). Emits (doc_id, n_feats,
    weight); a selection step keeps the top fraction by weight. The
    bucket ratio table is broadcast-sized (B rows) at any corpus
    scale."""
    # fan_out: the unigram+bigram tokenize/explode map side is
    # corpus-sized (r10; target inherits the spread through the filter).
    docs = fan_out_scan(load_table(spark, sf_dir, "documents"))
    target = docs.filter(F.col("source") == DSIR_TARGET_SOURCE)
    return TX.dsir_weights(docs, target, "text", "doc_id", buckets=DSIR_BUCKETS)


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup inside k-means cells (Abbas et al., 2023)
# ---------------------------------------------------------------------------

SEMDEDUP_T = 0.4


def _semdedup_oracle(k: int = KMEANS_K, iters: int = KMEANS_ITERS, t: float = SEMDEDUP_T) -> str:
    return f"""
WITH {_kmeans_ctes(k, iters)},
dups AS (
  SELECT DISTINCT b.vec_id AS dup_id
  FROM afin a JOIN afin b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round({_cos('a.embedding', 'b.embedding')}, 6) >= {t}
)
SELECT f.vec_id, CAST(f.cell AS BIGINT) AS cell,
       CASE WHEN d.dup_id IS NULL THEN 1 ELSE 0 END AS kept
FROM afin f LEFT JOIN dups d ON f.vec_id = d.dup_id
"""


@register("dedup_semantic_kmeans", _semdedup_oracle(), tags=("EXT1", "EXT2"))
def dedup_semantic_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): semantic near-duplicate removal
    confined to k-means cells — the SAME trained deterministic
    quantizer the IVF search uses (hash-sampled seeds, round-6 cosine
    argmax, integer-exact centroid means), then greedy keep-lowest-id
    within each cell at cosine >= 0.4
    (operators/vectors.py:semantic_dedup). One row per vector:
    (vec_id, cell, kept). The oracle retrains the quantizer
    iteration-for-iteration and replays the greedy drop — even the
    clustering is hash-checked. Finds the 25 planted embedding
    near-dup pairs; pairwise work is sum(|cell|^2), bounded by
    k ∝ N at scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = VX.kmeans_cells(emb, k=KMEANS_K, iters=KMEANS_ITERS)
    out = VX.semantic_dedup(assigned, threshold=SEMDEDUP_T)
    return out.select(
        "vec_id", F.col("cell").cast("long").alias("cell"), F.col("kept").cast("int")
    )


# ---------------------------------------------------------------------------
# The composed corpus pipeline: quality -> exact dedup -> near-dup CC
# -> split -> pack, end-to-end in ONE oracled query
# ---------------------------------------------------------------------------

PIPE_MIN_TOKENS = 20
PIPE_BUDGET = 2048

_PIPELINE_ORACLE = f"""
WITH RECURSIVE {_DOCS_CTE},
q AS (
  SELECT t.doc_id, t.text, CAST(len(t.ts) AS BIGINT) AS n_tokens, t.ts
  FROM toks t WHERE len(t.ts) >= {PIPE_MIN_TOKENS}
),
exk AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY sha256(lower(trim(text)))),
s1 AS (SELECT q.* FROM q JOIN exk USING (doc_id)),
{_minhash_ctes(src="s1")},
edges AS (
  SELECT id_a AS u, id_b AS v FROM njpairs
  UNION
  SELECT id_b AS u, id_a AS v FROM njpairs
),
walk(u, v) AS (
  SELECT u, u FROM edges
  UNION
  SELECT w.u, e.v FROM walk w JOIN edges e ON w.v = e.u
),
comp AS (SELECT u AS doc_id, min(v) AS group_id FROM walk GROUP BY u),
s2 AS (
  SELECT s1.doc_id, s1.n_tokens
  FROM s1 LEFT JOIN comp ON s1.doc_id = comp.doc_id
  WHERE comp.doc_id IS NULL OR comp.group_id = s1.doc_id
),
sp AS (
  SELECT doc_id, n_tokens,
         {_duck_hash("CAST(doc_id AS VARCHAR)", "split")} % 100 AS bucket
  FROM s2
),
sp2 AS (
  SELECT doc_id, n_tokens,
         CASE WHEN bucket < 80 THEN 'train'
              WHEN bucket < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM sp
),
packed AS (
  SELECT doc_id, split, n_tokens,
         coalesce(sum(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
  FROM sp2
)
SELECT doc_id, split, n_tokens,
       CAST(floor(prefix / {PIPE_BUDGET}) AS BIGINT) AS seq_id,
       CAST(prefix % {PIPE_BUDGET} AS BIGINT) AS seq_offset
FROM packed
"""


@register("llm_corpus_pipeline", _PIPELINE_ORACLE, tags=("EXT1", "EXT3", "W14", "bench"))
def llm_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED training-corpus pipeline, end-to-end in one
    oracled query — what an LLM data team actually runs nightly:

      quality gate (>= 20 tokens)
      -> exact dedup (sha256 keep-lowest-id)
      -> near-dup dedup (MinHash-LSH pairs -> connected components ->
         keep the component minimum)
      -> train/val/test hash split (stable under corpus growth)
      -> concat-and-chunk sequence packing per split (budget 2048)

    emitting (doc_id, split, n_tokens, seq_id, seq_offset) for every
    surviving document. Each stage is the SAME operator its
    standalone query exercises (operators/text.py, operators/graph.py)
    — this query pins their composition: survivors feed the LSH, the
    CC keep-decision feeds the split, the split partitions the
    packing. The oracle replays the whole chain (recursive-CTE
    reachability included) hash-exact.

    100 TB shape: adds NOTHING beyond the component costs — the gate
    and split are scans, exact dedup shuffles 64-byte digests, LSH is
    banded, CC is O(log n) rounds on a pair list, packing is one
    window per split."""
    from auto_trade_data_pipeline_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = TX.tokens(F.col("text"))
    q = docs.select(
        "doc_id", "text", F.size(toks).cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") >= PIPE_MIN_TOKENS)
    fp = F.sha2(F.lower(F.trim(F.col("text"))), 256)
    keep = (
        q.select(fp.alias("__fp"), "doc_id")
        .groupBy("__fp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    # s1 (the gated, exactly-deduped corpus) feeds BOTH the shingle
    # pipeline and the final near-dup anti join; unpersisted, the
    # scan+gate+sha256-dedup chain runs twice per action (interleaved
    # A/B: warm min 2.68s -> 2.08s with this persist; persisting the
    # pre-dedup q as well measured strictly worse — cache pressure).
    s1 = scoped_persist(q.join(keep.select("doc_id"), "doc_id", "left_semi"))
    rows = scoped_persist(TX.shingle_rows(s1, "text", "doc_id", SHINGLE_N))
    sig = scoped_persist(TX.minhash_signature_rows(rows, "shingle", "doc_id", NUM_PERMS))
    cand = TX.lsh_candidate_pairs(sig, "doc_id", NUM_PERMS, ROWS_PER_BAND)
    nd_pairs = TX.jaccard_verify_rows(cand, rows, "doc_id", "shingle", JACCARD_T)
    labels = connected_components(nd_pairs)
    drops = labels.filter(F.col("component") != F.col("node")).select(
        F.col("node").alias("doc_id")
    )
    s2 = s1.join(drops, "doc_id", "left_anti")
    _bucket, split = TX.hash_split(F.col("doc_id"))
    s3 = s2.select("doc_id", "n_tokens", split.alias("split"))
    packed = TX.pack_sequences(s3, "n_tokens", "doc_id", ["split"], budget=PIPE_BUDGET)
    return packed.select("doc_id", "split", "n_tokens", "seq_id", "seq_offset")


# ---------------------------------------------------------------------------
# Incremental dedup: a delta batch against the standing corpus
# ---------------------------------------------------------------------------

INCR_DELTA_START = 400  # docs >= this id play the "tonight's crawl" role


def _incremental_oracle() -> str:
    shc = _shingles_cte("corp").replace("sh AS (", "shc AS (")
    shd = _shingles_cte("delt").replace("sh AS (", "shd AS (")
    return f"""
WITH {_DOCS_CTE},
corp AS (SELECT * FROM toks WHERE doc_id < {INCR_DELTA_START}),
delt AS (SELECT * FROM toks WHERE doc_id >= {INCR_DELTA_START}),
exact AS (
  SELECT d.doc_id, min(c.doc_id) AS exact_id
  FROM delt d JOIN corp c
    ON sha256(lower(trim(d.text))) = sha256(lower(trim(c.text)))
  GROUP BY d.doc_id
),
{shc},
{shd},
mhc AS (
  SELECT doc_id,
         {_mh_cols_sql()}
  FROM shc
),
mhd AS (
  SELECT doc_id,
         {_mh_cols_sql()}
  FROM shd
),
bandsc AS (
{_band_rows_sql("mhc")}
),
bandsd AS (
{_band_rows_sql("mhd")}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandsd a JOIN bandsc b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id <> b.doc_id
),
ver AS (
  SELECT id_a, id_b, round(j, 4) AS jaccard FROM (
    SELECT id_a, id_b,
           len(list_intersect(sa.shingles, sb.shingles))
             / (1.0 * (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles)))) AS j
    FROM cand
    JOIN shd sa ON sa.doc_id = id_a
    JOIN shc sb ON sb.doc_id = id_b
  ) WHERE j >= {JACCARD_T}
),
near AS (
  SELECT id_a AS doc_id, id_b AS near_id, jaccard FROM (
    SELECT *, row_number() OVER (PARTITION BY id_a ORDER BY jaccard DESC, id_b) AS rn
    FROM ver
  ) WHERE rn = 1
)
SELECT d.doc_id,
       CASE WHEN e.exact_id IS NOT NULL THEN 'exact'
            WHEN n.near_id IS NOT NULL THEN 'near'
            ELSE 'new' END AS status,
       coalesce(e.exact_id, n.near_id) AS match_id,
       CASE WHEN e.exact_id IS NULL THEN n.jaccard END AS jaccard
FROM delt d LEFT JOIN exact e USING (doc_id) LEFT JOIN near n USING (doc_id)
"""


@register("incremental_dedup_delta", _incremental_oracle(), tags=("EXT1",))
def incremental_dedup_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup — the nightly-crawl shape every standing
    corpus needs: classify each DELTA document (doc_id >= 400,
    playing tonight's batch) against the CORPUS (doc_id < 400)
    WITHOUT ever re-pairing corpus x corpus:

      exact  — sha256(normalized) matches a corpus doc (lowest id);
      near   — banded MinHash candidates BETWEEN the delta and corpus
               signature sets (operators/text.py:
               lsh_candidate_pairs_between), exact-Jaccard verified,
               best match by (jaccard desc, id);
      new    — neither.

    Emits (doc_id, status, match_id, jaccard). At 100 TB the corpus
    side's signatures/digests are precomputed and stored — a nightly
    run costs |delta| signatures + banded collisions, and the
    corpus's own pair graph is never touched. The exact path's
    standing-side prefilter at scale is the Bloom join pruning
    asserted in tests/test_plans.py."""
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    corpus = docs.filter(F.col("doc_id") < INCR_DELTA_START)
    delta = docs.filter(F.col("doc_id") >= INCR_DELTA_START)
    fp = F.sha2(F.lower(F.trim(F.col("text"))), 256)
    cfp = corpus.select(fp.alias("__fp"), F.col("doc_id").alias("__cid"))
    exact = (
        delta.select("doc_id", fp.alias("__fp"))
        .join(cfp, "__fp")
        .groupBy("doc_id")
        .agg(F.min("__cid").alias("exact_id"))
    )
    rows_c = scoped_persist(TX.shingle_rows(corpus, "text", "doc_id", SHINGLE_N))
    rows_d = scoped_persist(TX.shingle_rows(delta, "text", "doc_id", SHINGLE_N))
    sig_c = TX.minhash_signature_rows(rows_c, "shingle", "doc_id", NUM_PERMS)
    sig_d = TX.minhash_signature_rows(rows_d, "shingle", "doc_id", NUM_PERMS)
    cand = TX.lsh_candidate_pairs_between(sig_d, sig_c, "doc_id", NUM_PERMS, ROWS_PER_BAND)
    ver = TX.jaccard_verify_rows(
        cand, rows_d.unionByName(rows_c), "doc_id", "shingle", JACCARD_T
    )
    w = W.partitionBy("id_a").orderBy(F.col("jaccard").desc(), F.col("id_b"))
    near = (
        ver.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("id_a").alias("doc_id"),
            F.col("id_b").alias("near_id"),
            "jaccard",
        )
    )
    return (
        delta.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("exact_id").isNotNull(), "exact")
            .when(F.col("near_id").isNotNull(), "near")
            .otherwise("new")
            .alias("status"),
            F.coalesce("exact_id", "near_id").alias("match_id"),
            F.when(F.col("exact_id").isNull(), F.col("jaccard")).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental embedding dedup: delta vectors against the standing corpus
# ---------------------------------------------------------------------------

INCR_VEC_START = 400  # vec_id >= this plays tonight's embedding batch

_INCR_EMB_ORACLE = f"""
WITH planes AS (
  SELECT j, i,
         CASE WHEN CAST('0x' || substr(md5('srp:' || j || ':' || i), 1, 15) AS BIGINT) % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM range(0, 16) t1(j), range(0, 64) t2(i)
),
scaled AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(round(x * 1000000) AS BIGINT)) AS v
  FROM embeddings
),
proj AS (
  SELECT s.vec_id, p.j, sum(s.v[p.i + 1] * p.s) AS dotp
  FROM scaled s, planes p
  GROUP BY s.vec_id, p.j
),
sig AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN dotp >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT)
           AS signature
  FROM proj GROUP BY vec_id
),
bands AS (
  SELECT vec_id, b AS band_idx, (signature >> (b * 4)) & 15 AS band_val
  FROM sig, range(0, 4) t(b)
),
cand AS (
  SELECT DISTINCT d.vec_id AS id_a, c.vec_id AS id_b
  FROM bands d JOIN bands c ON d.band_idx = c.band_idx AND d.band_val = c.band_val
  WHERE d.vec_id >= {INCR_VEC_START} AND c.vec_id < {INCR_VEC_START}
),
ver AS (
  SELECT id_a, id_b, round({_SRP_COS}, 6) AS cos
  FROM cand
  JOIN embeddings a ON a.vec_id = id_a
  JOIN embeddings b ON b.vec_id = id_b
  WHERE round({_SRP_COS}, 6) >= 0.4
),
best AS (
  SELECT id_a, id_b, cos FROM (
    SELECT *, row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rn
    FROM ver
  ) WHERE rn = 1
)
SELECT e.vec_id,
       CASE WHEN b.id_b IS NOT NULL THEN 'near' ELSE 'new' END AS status,
       b.id_b AS match_id,
       b.cos
FROM embeddings e LEFT JOIN best b ON e.vec_id = b.id_a
WHERE e.vec_id >= {INCR_VEC_START}
"""


@register("incremental_dedup_embedding", _INCR_EMB_ORACLE, tags=("EXT1", "EXT2"))
def incremental_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental EMBEDDING dedup — the vector-modality twin of
    incremental_dedup_delta: classify each delta vector
    (vec_id >= 400) against the standing corpus via signed-random-
    projection cosine LSH, banding the delta signatures against the
    corpus's (at scale: precomputed, stored) signatures — the corpus
    is never self-joined. Candidates verify with exact cosine >= 0.4;
    best match by (cos desc, id); emits (vec_id, status, match_id,
    cos). The oracle regenerates the identical md5-parity hyperplanes
    and integer-scaled projections, so even the banding is
    cross-engine bit-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    sig = scoped_persist(emb.select(
        "vec_id", "embedding", VX.srp_signature(F.col("embedding"), 16, 64).alias("__sig")
    ))
    bands = VX.srp_bands(sig, "vec_id", "__sig", 16, 4)
    d = bands.filter(F.col("vec_id") >= INCR_VEC_START).withColumnRenamed("vec_id", "id_a")
    c = bands.filter(F.col("vec_id") < INCR_VEC_START).withColumnRenamed("vec_id", "id_b")
    cand = d.join(c, ["band_idx", "band_val"]).select("id_a", "id_b").distinct()
    # Per-vector norms attached once per side (see
    # dedup_embedding_cosine): one dot fold per candidate pair,
    # bit-equal to VX.cosine.
    va = sig.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("__va"),
        VX.l2_norm(F.col("embedding")).alias("__na"),
    )
    vb = sig.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("__vb"),
        VX.l2_norm(F.col("embedding")).alias("__nb"),
    )
    ver = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cos",
            F.round(
                VX.dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")),
                6,
            ),
        )
        .filter(F.col("cos") >= 0.4)
        .select("id_a", "id_b", "cos")
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("id_a").orderBy(F.col("cos").desc(), F.col("id_b"))
    best = (
        ver.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col("id_a").alias("vec_id"), F.col("id_b").alias("match_id"), "cos")
    )
    return (
        emb.filter(F.col("vec_id") >= INCR_VEC_START)
        .select("vec_id")
        .join(best, "vec_id", "left")
        .select(
            "vec_id",
            F.when(F.col("match_id").isNotNull(), "near").otherwise("new").alias("status"),
            "match_id",
            "cos",
        )
    )


# ---------------------------------------------------------------------------
# EXT2: product-quantization ANN (PQ/ADC, Jegou et al. TPAMI'11)
# ---------------------------------------------------------------------------

PQ_M = 4  #: subspaces (64 dims -> 4 x 16)
PQ_KSUB = 8  #: codes per subspace codebook
PQ_ITERS = 2  #: Lloyd iterations per subspace


def _pq_sq(a: str, b: str, dsub: int = 16) -> str:
    """Sequential-order squared-L2 over a dsub-dim subvector — the
    DuckDB twin of operators.vectors.sq_l2."""
    diff = f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    return (
        f"list_reduce(list_transform(range(1, {dsub + 1}), "
        f"i -> {diff} * {diff}), (acc, x) -> acc + x)"
    )


def _pq_ctes(m: int = PQ_M, ksub: int = PQ_KSUB, iters: int = PQ_ITERS) -> str:
    """DuckDB twin of operators.vectors.pq_train/pq_encode: identical
    seed selection (smallest md5-60bit of the id, per subspace),
    round-6 squared-L2 argmin with code tiebreak, integer-scaled
    centroid means — so the codebooks AND the codes are
    bit-reproducible cross-engine. Ends with ``pq_codes`` (vec_id,
    codes ordered by subspace) and ``pq_c{iters}`` (the codebooks)."""
    dsub = 64 // m

    def assign(prev: str, out: str) -> str:
        return f"""{out} AS (
  SELECT vec_id, sub, subvec, code FROM (
    SELECT s.vec_id, s.sub, s.subvec, c.code,
           row_number() OVER (PARTITION BY s.vec_id, s.sub
                              ORDER BY round({_pq_sq('s.subvec', 'c.centroid', dsub)}, 6), c.code) AS pr
    FROM pq_sub s JOIN {prev} c ON c.sub = s.sub
  ) WHERE pr = 1
)"""

    def update(assigned: str, out: str) -> str:
        return f"""{out} AS (
  SELECT sub, code, list(mean ORDER BY pos) AS centroid FROM (
    SELECT sub, code, pos,
           (CAST(sum(CAST(round(v * 1000000) AS BIGINT)) AS BIGINT) / 1000000.0) / count(*) AS mean
    FROM (SELECT sub, code, i AS pos, subvec[i] AS v FROM {assigned}, range(1, {dsub + 1}) t(i))
    GROUP BY sub, code, pos
  ) GROUP BY sub, code
)"""

    ctes = [
        f"""pq_nrm AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(x AS DOUBLE) / sqrt({_DOT.format(a='embedding', b='embedding')})) AS embedding
  FROM embeddings
)""",
        f"""pq_sub AS (
  SELECT vec_id, CAST(t.sub AS INTEGER) AS sub,
         list_transform(list_slice(embedding, t.sub * {dsub} + 1, t.sub * {dsub} + {dsub}),
                        x -> CAST(x AS DOUBLE)) AS subvec
  FROM pq_nrm, range(0, {m}) t(sub)
)""",
        f"""pq_c0 AS (
  SELECT sub, code, subvec AS centroid FROM (
    SELECT sub, subvec,
           row_number() OVER (PARTITION BY sub
                              ORDER BY CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT), vec_id) - 1 AS code
    FROM pq_sub
  ) WHERE code < {ksub}
)""",
    ]
    for i in range(iters):
        ctes.append(assign(f"pq_c{i}", f"pq_a{i + 1}"))
        ctes.append(update(f"pq_a{i + 1}", f"pq_c{i + 1}"))
    ctes.append(assign(f"pq_c{iters}", "pq_afin"))
    ctes.append(
        "pq_codes AS (SELECT vec_id, list(code ORDER BY sub) AS codes FROM pq_afin GROUP BY vec_id)"
    )
    return ",\n".join(ctes)


def _pq_oracle(m: int = PQ_M, ksub: int = PQ_KSUB, iters: int = PQ_ITERS) -> str:
    dsub = 64 // m
    return f"""
WITH {_pq_ctes(m, ksub, iters)},
pq_q AS (SELECT vec_id AS query_id, sub, subvec FROM pq_sub WHERE vec_id < 10),
pq_dt AS (
  SELECT q.query_id, q.sub, c.code,
         CAST(round(round({_pq_sq('q.subvec', 'c.centroid', dsub)}, 6) * 1000000) AS BIGINT) AS dq
  FROM pq_q q JOIN pq_c{iters} c ON c.sub = q.sub
),
pq_dtab AS (
  SELECT query_id, list(drow ORDER BY sub) AS dtab FROM (
    SELECT query_id, sub, list(dq ORDER BY code) AS drow FROM pq_dt GROUP BY query_id, sub
  ) GROUP BY query_id
),
pq_scored AS (
  SELECT d.query_id, e.vec_id AS neighbor_id,
         list_reduce(list_transform(range(1, {m + 1}), j -> d.dtab[j][e.codes[j] + 1]),
                     (acc, x) -> acc + x) AS ds
  FROM pq_codes e, pq_dtab d
  WHERE e.vec_id <> d.query_id
),
pq_cand AS (
  SELECT query_id, neighbor_id, ds FROM (
    SELECT query_id, neighbor_id, ds,
           row_number() OVER (PARTITION BY query_id ORDER BY ds, neighbor_id) AS cr
    FROM pq_scored
  ) WHERE cr <= 15
),
pq_rr AS (
  SELECT c.query_id, c.neighbor_id, c.ds,
         round({_cos('q.embedding', 'e.embedding')}, 6) AS cos
  FROM pq_cand c
  JOIN pq_nrm q ON q.vec_id = c.query_id
  JOIN embeddings e ON e.vec_id = c.neighbor_id
),
pq_ranked AS (
  SELECT query_id, neighbor_id, round(ds / 1000000.0, 6) AS adist, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM pq_rr
)
SELECT query_id, neighbor_id, adist, cos, rank FROM pq_ranked WHERE rank <= 5
"""


@register("similarity_topk_pq", _pq_oracle(), tags=("EXT2",))
def similarity_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jegou/Douze/Schmid, TPAMI 2011):
    per-subspace codebooks trained with the deterministic k-means
    recipe, every vector encoded as m=4 codes (64x compression at
    production m=8/ksub=256 — a billion-vector index fits executor
    memory), then asymmetric-distance (ADC) top-k: the per-query
    m x ksub distance table rides a broadcast, the compressed corpus
    is scanned with m exact bigint lookups per vector (zero shuffle
    until the per-query top-k window), and the refine*k best
    candidates are reranked by exact cosine against raw vectors. The
    oracle retrains the codebooks, re-encodes, and re-scans entirely
    in SQL — the whole index build is hash-checked cross-engine."""
    emb = load_table(spark, sf_dir, "embeddings")
    # Unit-normalize for the index: on unit vectors squared-L2 is
    # 2 - 2*cos, so ADC candidate order agrees with the cosine rerank.
    unit = emb.select("vec_id", VX.l2_normalize(F.col("embedding")).alias("embedding"))
    books = VX.pq_train(unit, m=PQ_M, ksub=PQ_KSUB, iters=PQ_ITERS)
    enc = VX.pq_encode(unit, books, m=PQ_M)
    return VX.pq_adc_topk(
        enc, unit.filter(F.col("vec_id") < 10), books, emb, k=5, refine=3, m=PQ_M
    )


# ---------------------------------------------------------------------------
# EXT2: ANN quality evaluation — recall@k of IVF and PQ vs exact, in-engine
# ---------------------------------------------------------------------------


def _ann_recall_oracle() -> str:
    """Composes the brute-force, IVF (trained k-means, nprobe=2) and
    PQ-ADC (refine=3) retrievals — each already individually oracled —
    and scores the two ANN paths against the exact baseline. CTE
    namespaces (c*/afin vs pq_*) do not collide."""
    return f"""
WITH {_kmeans_ctes()},
{_pq_ctes()},
arq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
ar_exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY round({_cos('q.qv', 'e.embedding')}, 6) DESC, e.vec_id) AS rank
    FROM arq q JOIN embeddings e ON e.vec_id <> q.query_id
  ) WHERE rank <= 5
),
ar_probes AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, c.cell,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY round({_cos('q.qv', 'c.centroid')}, 6) DESC, c.cell) AS pr
    FROM arq q, c{KMEANS_ITERS} c
  ) WHERE pr <= 2
),
ar_ivf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY p.query_id
                              ORDER BY round({_cos('p.qv', 'e.embedding')}, 6) DESC, e.vec_id) AS rank
    FROM ar_probes p JOIN afin e ON e.cell = p.cell AND e.vec_id <> p.query_id
  ) WHERE rank <= 5
),
ar_pqq AS (SELECT vec_id AS query_id, sub, subvec FROM pq_sub WHERE vec_id < 10),
ar_pqdt AS (
  SELECT q.query_id, q.sub, c.code,
         CAST(round(round({_pq_sq('q.subvec', 'c.centroid', 64 // PQ_M)}, 6) * 1000000) AS BIGINT) AS dq
  FROM ar_pqq q JOIN pq_c{PQ_ITERS} c ON c.sub = q.sub
),
ar_pqtab AS (
  SELECT query_id, list(drow ORDER BY sub) AS dtab FROM (
    SELECT query_id, sub, list(dq ORDER BY code) AS drow FROM ar_pqdt GROUP BY query_id, sub
  ) GROUP BY query_id
),
ar_pqsc AS (
  SELECT d.query_id, e.vec_id AS neighbor_id,
         list_reduce(list_transform(range(1, PQM + 1), j -> d.dtab[j][e.codes[j] + 1]),
                     (acc, x) -> acc + x) AS ds
  FROM pq_codes e, ar_pqtab d
  WHERE e.vec_id <> d.query_id
),
ar_pqcand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY ds, neighbor_id) AS cr
    FROM ar_pqsc
  ) WHERE cr <= 15
),
ar_pq AS (
  SELECT query_id, neighbor_id FROM (
    SELECT c.query_id, c.neighbor_id,
           row_number() OVER (PARTITION BY c.query_id
                              ORDER BY round({_cos('q.embedding', 'e.embedding')}, 6) DESC, c.neighbor_id) AS rank
    FROM ar_pqcand c
    JOIN pq_nrm q ON q.vec_id = c.query_id
    JOIN embeddings e ON e.vec_id = c.neighbor_id
  ) WHERE rank <= 5
)
SELECT x.query_id,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits_ivf,
       CAST(sum(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits_pq,
       round(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) / (1.0 * count(*)), 4) AS recall_ivf,
       round(sum(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) / (1.0 * count(*)), 4) AS recall_pq
FROM ar_exact x
LEFT JOIN ar_ivf i ON i.query_id = x.query_id AND i.neighbor_id = x.neighbor_id
LEFT JOIN ar_pq p ON p.query_id = x.query_id AND p.neighbor_id = x.neighbor_id
GROUP BY x.query_id
""".replace("PQM", str(PQ_M))


@register("ann_recall_report", _ann_recall_oracle(), tags=("EXT2",))
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation IN the engine: recall@5 of the IVF path
    (trained k-means coarse quantizer, nprobe=2) and the PQ-ADC path
    (m=4 codebooks, refine=3) against the exact cosine baseline, per
    query — the measurement harness a production ANN deployment runs
    on a hash-sample before trusting an index. All three retrievals
    reuse the already-oracled operators; the joins that score them
    touch only (query_id, neighbor_id) pairs."""
    emb = load_table(spark, sf_dir, "embeddings")
    q_raw = emb.filter(F.col("vec_id") < 10)
    exact = VX.cosine_topk(emb, q_raw, k=5).select("query_id", "neighbor_id")

    assigned, cents = VX.kmeans_cells(emb, k=KMEANS_K, iters=KMEANS_ITERS)
    ivf = VX.ivf_topk(assigned, q_raw, cents, k=5, nprobe=2, cell_col="cell").select(
        "query_id", "neighbor_id"
    )

    unit = emb.select("vec_id", VX.l2_normalize(F.col("embedding")).alias("embedding"))
    books = VX.pq_train(unit, m=PQ_M, ksub=PQ_KSUB, iters=PQ_ITERS)
    enc = VX.pq_encode(unit, books, m=PQ_M)
    pq = VX.pq_adc_topk(
        enc, unit.filter(F.col("vec_id") < 10), books, emb, k=5, refine=3, m=PQ_M
    ).select("query_id", "neighbor_id")

    i = ivf.withColumn("__ivf", F.lit(1))
    p = pq.withColumn("__pq", F.lit(1))
    joined = (
        exact.join(i, ["query_id", "neighbor_id"], "left")
        .join(p, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce("__ivf", F.lit(0))).alias("hits_ivf"),
            F.sum(F.coalesce("__pq", F.lit(0))).alias("hits_pq"),
        )
    )
    return joined.select(
        "query_id",
        "n_exact",
        "hits_ivf",
        "hits_pq",
        F.round(F.col("hits_ivf") / (F.col("n_exact") * 1.0), 4).alias("recall_ivf"),
        F.round(F.col("hits_pq") / (F.col("n_exact") * 1.0), 4).alias("recall_pq"),
    )


# ---------------------------------------------------------------------------
# EXT2: IVF-PQ composite (the IndexIVFPQ layout: coarse routing + ADC scan)
# ---------------------------------------------------------------------------


def _ivfpq_oracle() -> str:
    """Coarse k-means routing (nprobe=2) + PQ/ADC scan confined to the
    probed cells + exact rerank — the non-residual IVFADC variant
    (Jegou et al. TPAMI'11 §V; FAISS IndexIVFPQ with by_residual
    off). Reuses the trained-k-means and PQ CTE builders; both index
    builds are re-trained inside the oracle."""
    return f"""
WITH {_kmeans_ctes()},
{_pq_ctes()},
ipq_q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
ipq_probes AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY round({_cos('q.qv', 'c.centroid')}, 6) DESC, c.cell) AS pr
    FROM ipq_q q, c{KMEANS_ITERS} c
  ) WHERE pr <= 2
),
ipq_qsub AS (SELECT vec_id AS query_id, sub, subvec FROM pq_sub WHERE vec_id < 10),
ipq_dt AS (
  SELECT q.query_id, q.sub, c.code,
         CAST(round(round({_pq_sq('q.subvec', 'c.centroid', 64 // PQ_M)}, 6) * 1000000) AS BIGINT) AS dq
  FROM ipq_qsub q JOIN pq_c{PQ_ITERS} c ON c.sub = q.sub
),
ipq_dtab AS (
  SELECT query_id, list(drow ORDER BY sub) AS dtab FROM (
    SELECT query_id, sub, list(dq ORDER BY code) AS drow FROM ipq_dt GROUP BY query_id, sub
  ) GROUP BY query_id
),
ipq_scored AS (
  SELECT d.query_id, e.vec_id AS neighbor_id,
         list_reduce(list_transform(range(1, {PQ_M + 1}), j -> d.dtab[j][e.codes[j] + 1]),
                     (acc, x) -> acc + x) AS ds
  FROM pq_codes e
  JOIN afin a ON a.vec_id = e.vec_id
  JOIN ipq_probes p ON p.cell = a.cell
  JOIN ipq_dtab d ON d.query_id = p.query_id
  WHERE e.vec_id <> d.query_id
),
ipq_cand AS (
  SELECT query_id, neighbor_id, ds FROM (
    SELECT query_id, neighbor_id, ds,
           row_number() OVER (PARTITION BY query_id ORDER BY ds, neighbor_id) AS cr
    FROM ipq_scored
  ) WHERE cr <= 15
),
ipq_rr AS (
  SELECT c.query_id, c.neighbor_id, c.ds,
         round({_cos('q.embedding', 'e.embedding')}, 6) AS cos
  FROM ipq_cand c
  JOIN pq_nrm q ON q.vec_id = c.query_id
  JOIN embeddings e ON e.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, round(ds / 1000000.0, 6) AS adist, cos, rank FROM (
  SELECT query_id, neighbor_id, ds, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM ipq_rr
) WHERE rank <= 5
"""


@register("similarity_topk_ivfpq", _ivfpq_oracle(), tags=("EXT2",))
def similarity_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite ANN — the production billion-vector layout
    (FAISS IndexIVFPQ, non-residual variant): the trained coarse
    quantizer routes each query to nprobe=2 cells, the PQ/ADC
    compressed-domain scan runs ONLY inside probed cells (at scale,
    with cell-partitioned storage, unprobed cells are never read),
    and the surviving refine*k candidates get an exact cosine rerank.
    Both index builds (coarse k-means AND per-subspace codebooks) are
    re-trained inside the SQL oracle, so the entire composite index
    is hash-checked cross-engine."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, cents = VX.kmeans_cells(emb, k=KMEANS_K, iters=KMEANS_ITERS)
    unit = emb.select("vec_id", VX.l2_normalize(F.col("embedding")).alias("embedding"))
    books = VX.pq_train(unit, m=PQ_M, ksub=PQ_KSUB, iters=PQ_ITERS)
    enc = VX.pq_encode(unit, books, m=PQ_M)

    from pyspark.sql.window import Window

    q_raw = emb.filter(F.col("vec_id") < 10)
    probe_w = Window.partitionBy("query_id").orderBy(F.col("__ccos").desc(), F.col("cell"))
    probes = (
        q_raw.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv"))
        .join(F.broadcast(cents))
        .withColumn("__ccos", F.round(VX.cosine(F.col("__qv"), F.col("centroid")), 6))
        .withColumn("__pr", F.row_number().over(probe_w))
        .filter(F.col("__pr") <= 2)
        .select("query_id", "cell")
    )
    cell_enc = enc.join(assigned.select("vec_id", "cell"), "vec_id").join(
        F.broadcast(probes), "cell"
    )
    return VX.pq_adc_topk(
        cell_enc.select("vec_id", "codes", "query_id"),
        unit.filter(F.col("vec_id") < 10),
        books,
        emb,
        k=5,
        refine=3,
        m=PQ_M,
        precomputed_routing=True,
    )


# ---------------------------------------------------------------------------
# EXT3: BM25 retrieval top-k (in-engine search scoring)
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (0, "fast query join"),
    (1, "stream window sort"),
    (2, "table merge batch"),
)


def _bm25_oracle() -> str:
    vals = ", ".join(f"({qid}, '{terms}')" for qid, terms in BM25_QUERIES)
    k1, b = BM25_K1, BM25_B
    return f"""
WITH {_DOCS_CTE},
bm_q AS (
  SELECT qid, unnest(string_split(terms, ' ')) AS term
  FROM (VALUES {vals}) v(qid, terms)
),
bm_dl AS (SELECT doc_id, len(ts) AS dl FROM toks),
bm_stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) / (1.0 * count(*)) AS avgdl
  FROM bm_dl
),
bm_tf AS (
  SELECT t.doc_id, q.term, count(*) AS tf
  FROM (SELECT doc_id, unnest(ts) AS tok FROM toks) t
  JOIN (SELECT DISTINCT term FROM bm_q) q ON q.term = t.tok
  GROUP BY t.doc_id, q.term
),
bm_df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM bm_tf GROUP BY term),
bm_idf AS (
  SELECT d.term,
         CAST(round(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) * 1000000) AS BIGINT) AS idf_ppm
  FROM bm_df d, bm_stats s
),
bm_contrib AS (
  SELECT q.qid, f.doc_id,
         CAST(round(
           (i.idf_ppm / 1000000.0)
           * ((f.tf * ({k1} + 1.0)) / (f.tf + {k1} * (1.0 - {b} + {b} * l.dl / s.avgdl)))
           * 1000000) AS BIGINT) AS c_ppm
  FROM bm_q q
  JOIN bm_tf f ON f.term = q.term
  JOIN bm_idf i ON i.term = q.term
  JOIN bm_dl l ON l.doc_id = f.doc_id
  CROSS JOIN bm_stats s
),
bm_scores AS (
  SELECT qid, doc_id,
         CAST(sum(c_ppm) AS BIGINT) / 1000000.0 AS score
  FROM bm_contrib GROUP BY qid, doc_id
)
SELECT qid, doc_id, round(score, 4) AS score, rank FROM (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
  FROM bm_scores
) WHERE rank <= 10
"""


@register("bm25_retrieval_topk", _bm25_oracle(), tags=("EXT3",))
def bm25_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Sparck Jones; the Okapi
    scoring used by every search engine and RAG retriever): top-10
    documents per query with k1=1.2, b=0.75. The corpus side is
    filtered to QUERY TERMS before any aggregation (a broadcast
    semi-join on the term), so at 100 TB only postings for the query
    vocabulary ever shuffle — the classic inverted-index access
    pattern expressed relationally. Per-(doc, term) contributions are
    integer-scaled before the per-doc sum, and the IDF's ln() is
    snapped to ppm so a last-ulp libm difference cannot flip the
    hash."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", TX.tokens(F.col("text")).alias("__ts"))
    q = spark.createDataFrame(list(BM25_QUERIES), "qid int, terms string").select(
        "qid", F.explode(F.split("terms", " ")).alias("term")
    )
    terms = F.broadcast(q.select("term").distinct())

    dl = toks.select("doc_id", F.size("__ts").alias("dl"))
    stats = F.broadcast(
        dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("dl") / (1.0 * F.count(F.lit(1)))).alias("avgdl"),
        )
    )
    tf = (
        toks.select("doc_id", F.explode("__ts").alias("tok"))
        .join(terms.withColumnRenamed("term", "tok"), "tok")
        .groupBy("doc_id", F.col("tok").alias("term"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.broadcast(
        df_t.join(stats).select(
            "term",
            F.round(
                F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
                * 1000000,
                0,
            )
            .cast("long")
            .alias("idf_ppm"),
        )
    )
    k1, b = BM25_K1, BM25_B
    contrib = (
        F.broadcast(q)
        .join(tf, "term")
        .join(idf, "term")
        .join(dl, "doc_id")
        .join(stats)
        .select(
            "qid",
            "doc_id",
            F.round(
                (F.col("idf_ppm") / F.lit(1000000.0))
                * (
                    (F.col("tf") * F.lit(k1 + 1.0))
                    / (
                        F.col("tf")
                        + F.lit(k1)
                        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                    )
                )
                * 1000000,
                0,
            )
            .cast("long")
            .alias("c_ppm"),
        )
    )
    scores = contrib.groupBy("qid", "doc_id").agg(
        (F.sum("c_ppm") / F.lit(1000000.0)).alias("score")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), "doc_id")
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("qid", "doc_id", F.round("score", 4).alias("score"), "rank")
    )


# ---------------------------------------------------------------------------
# Count-Min sketch: heavy-hitter frequency estimation from bounded state
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_TOPN = 30


def _cms_oracle() -> str:
    """DuckDB twin of operators.sketch.cms_sketch + cms_lookup: the
    depth x width counter grid from the salted md5-60bit hash family,
    point estimates as min-over-rows for the top-N exact tokens."""
    grid = "\n  UNION ALL\n".join(
        f"  SELECT {r} AS r, {_duck_hash('tok', f'cms{r}')} % {CMS_WIDTH} AS bucket FROM tk"
        for r in range(CMS_DEPTH)
    )
    probe_buckets = "\n  UNION ALL\n".join(
        f"  SELECT tok, exact_cnt, {r} AS r, {_duck_hash('tok', f'cms{r}')} % {CMS_WIDTH} AS bucket FROM probes"
        for r in range(CMS_DEPTH)
    )
    return f"""
WITH {_DOCS_CTE},
tk AS (SELECT unnest(ts) AS tok FROM toks),
cells AS (
{grid}
),
cms AS MATERIALIZED (
  SELECT r, bucket, CAST(count(*) AS BIGINT) AS c FROM cells GROUP BY r, bucket
),
exact AS MATERIALIZED (
  SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt FROM tk GROUP BY tok
),
probes AS MATERIALIZED (
  SELECT tok, exact_cnt FROM exact ORDER BY exact_cnt DESC, tok LIMIT {CMS_TOPN}
),
pb AS (
{probe_buckets}
),
est AS (
  SELECT p.tok, p.exact_cnt, min(coalesce(c.c, 0)) AS cms_est
  FROM pb p LEFT JOIN cms c ON c.r = p.r AND c.bucket = p.bucket
  GROUP BY p.tok, p.exact_cnt
)
SELECT tok AS token, exact_cnt, CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - exact_cnt AS BIGINT) AS overcount
FROM est
"""


@register("cms_heavy_hitters", _cms_oracle(), tags=("EXT3",))
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation
    (operators/sketch.py:cms_sketch): a 4 x 512 counter grid over the
    corpus token stream — bounded, mergeable state that answers
    point-frequency queries without re-touching the data — probed
    with the top-30 exact tokens and reported next to the exact
    counts with the (always >= 0) overcount. Because the bucket
    hashes are the salted portable md5-60bit family, the sketch AND
    every estimate are deterministic and hash-checked cross-engine —
    unlike seeded-RNG CMS implementations. One token scan builds the
    sketch (depth buckets per token ride one inline array explode,
    then a uniform-key shuffle with map-side partial sums); the
    lookup broadcasts the KB-sized grid."""
    from auto_trade_data_pipeline_spark.operators.sketch import cms_lookup, cms_sketch

    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(F.explode(TX.tokens(F.col("text"))).alias("tok"))
    tk = scoped_persist(tk)  # scanned by both the sketch and the exact counts
    cms = cms_sketch(tk, "tok", depth=CMS_DEPTH, width=CMS_WIDTH)
    probes = (
        tk.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "tok")
        .limit(CMS_TOPN)
    )
    out = cms_lookup(cms, probes, "tok", depth=CMS_DEPTH, width=CMS_WIDTH)
    return out.select(
        F.col("tok").alias("token"),
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
    )


# ---------------------------------------------------------------------------
# Multimodal: REAL PNG codec round trip (pure-stdlib encoder/decoder)
# ---------------------------------------------------------------------------

_PNG_N_PX = 16 * 16 * 3

_PNG_ROUNDTRIP_ORACLE = f"""
WITH {_DOCS_CTE},
px AS (
  SELECT d.doc_id,
         CASE WHEN len(d.text) = 0 THEN 0
              ELSE ord(substr(d.text, CAST(u.i % len(d.text) AS INTEGER) + 1, 1)) % 256
         END AS b
  FROM docs d, unnest(range({_PNG_N_PX})) AS u(i)
)
SELECT doc_id,
       CAST(16 AS INTEGER) AS width,
       CAST(16 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       CAST(count(*) AS INTEGER) AS n_px,
       CAST(sum(b) AS BIGINT) AS px_sum,
       CAST(min(b) AS INTEGER) AS px_min,
       CAST(max(b) AS INTEGER) AS px_max
FROM px GROUP BY doc_id
"""


@register("multimodal_png_roundtrip", _PNG_ROUNDTRIP_ORACLE, tags=("EXT4",))
def multimodal_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec in-engine, no external libs: every document is
    rasterized to a 16x16 RGB PNG (pure-stdlib encoder — Sub-filtered
    scanlines, zlib IDAT; functions/png.py) and decoded back by a
    real PNG decoder (IHDR parse, inflate, per-filter unfilter) in a
    second mapInPandas stage, emitting dimension + pixel statistics.
    The rasterization recipe (pixel[i] = ord(text[i mod n]) % 256) is
    restated relationally by the oracle, so any bug anywhere in the
    codec round trip — filter arithmetic, compression framing, header
    layout — breaks the hash. The blob lives only between the two
    Arrow-batched stages and never reaches a shuffle
    (extract-early-drop-blob; upgrades the documented decode stub of
    `multimodal_decode_stats` to a working codec path)."""
    from auto_trade_data_pipeline_spark.operators.multimodal import png_roundtrip_stats

    docs = load_table(spark, sf_dir, "documents")
    return png_roundtrip_stats(docs)


_WAV_N = 1024

_WAV_ROUNDTRIP_ORACLE = f"""
WITH {_DOCS_CTE},
smp AS (
  SELECT d.doc_id,
         CASE WHEN len(d.text) = 0 THEN 0
              ELSE (ord(substr(d.text, CAST(u.i % len(d.text) AS INTEGER) + 1, 1)) % 256 - 128) * 256
         END AS s
  FROM docs d, unnest(range({_WAV_N})) AS u(i)
)
SELECT doc_id,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST(1 AS INTEGER) AS channels,
       CAST(count(*) AS INTEGER) AS n_samples,
       CAST(sum(s) AS BIGINT) AS s_sum,
       CAST(min(s) AS INTEGER) AS s_min,
       CAST(max(s) AS INTEGER) AS s_max
FROM smp GROUP BY doc_id
"""


@register("multimodal_wav_roundtrip", _WAV_ROUNDTRIP_ORACLE, tags=("EXT4",))
def multimodal_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec in-engine (the WAV sibling of
    `multimodal_png_roundtrip`): each document is synthesized into a
    1024-sample 16-bit PCM WAV by a pure-stdlib RIFF encoder and
    decoded back by a real chunk-walking parser (functions/wav.py),
    emitting rate/channels/sample statistics that the oracle restates
    relationally from the synthesis recipe. Two chained mapInPandas
    stages; the audio blob never reaches a shuffle."""
    from auto_trade_data_pipeline_spark.operators.multimodal import wav_roundtrip_stats

    docs = load_table(spark, sf_dir, "documents")
    return wav_roundtrip_stats(docs)


# ---------------------------------------------------------------------------
# Triangle counting / clustering coefficient over the near-dup graph
# ---------------------------------------------------------------------------

_TRIANGLES_ORACLE = f"""
WITH {_minhash_ctes()},
tg_e AS MATERIALIZED (
  SELECT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
  FROM njpairs WHERE id_a <> id_b
  GROUP BY 1, 2
),
tg_tri AS MATERIALIZED (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM tg_e e1 JOIN tg_e e2 ON e2.u = e1.v
  WHERE EXISTS (SELECT 1 FROM tg_e e3 WHERE e3.u = e1.u AND e3.v = e2.v)
),
tg_pn AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
    SELECT a AS node FROM tg_tri
    UNION ALL SELECT b FROM tg_tri
    UNION ALL SELECT c FROM tg_tri
  ) GROUP BY node
),
tg_deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT u AS node FROM tg_e UNION ALL SELECT v FROM tg_e
  ) GROUP BY node
)
SELECT d.node AS doc_id, d.degree,
       CAST(coalesce(p.n_triangles, 0) AS BIGINT) AS n_triangles,
       CAST(CASE WHEN d.degree >= 2
                 THEN (2 * coalesce(p.n_triangles, 0) * 1000000) // (d.degree * (d.degree - 1))
                 ELSE 0 END AS BIGINT) AS clustering_ppm
FROM tg_deg d LEFT JOIN tg_pn p ON p.node = d.node
"""


@register("graph_triangles", _TRIANGLES_ORACLE, tags=("EXT1",))
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts + clustering coefficient per node of the
    MinHash near-dup graph (operators/graph.py:triangle_counts) —
    distinguishes tight duplicate cliques (clustering 1.0: keep one
    canonical doc) from loose similarity chains (clustering 0:
    A~B~C but A!~C — transitive-closure dedup would over-delete).
    Edge-iterator algorithm: one wedge join + one closing semi join
    on canonically oriented edges; the coefficient is integer
    floor-division ppm, exact cross-engine."""
    from auto_trade_data_pipeline_spark.operators.graph import triangle_counts

    pairs = dedup_near_minhash_lsh(spark, sf_dir)
    out = triangle_counts(pairs)
    return out.select(
        F.col("node").alias("doc_id"), "degree", "n_triangles", "clustering_ppm"
    )


# ---------------------------------------------------------------------------
# K-means cluster quality report (index health monitoring)
# ---------------------------------------------------------------------------

_KMQ_ORACLE = f"""
WITH {_kmeans_ctes()},
kmq AS (
  SELECT a.cell,
         CAST(round((1 - {_cos('a.embedding', 'c.centroid')}) * 1000000) AS BIGINT) AS d_e6
  FROM afin a JOIN c{KMEANS_ITERS} c ON c.cell = a.cell
),
kmn AS (SELECT CAST(count(*) AS BIGINT) AS total FROM afin)
SELECT cell,
       CAST(count(*) AS BIGINT) AS n,
       CAST((count(*) * 1000000) // (SELECT total FROM kmn) AS BIGINT) AS share_ppm,
       CAST(sum(d_e6) AS BIGINT) AS inertia_e6,
       CAST(max(d_e6) AS BIGINT) AS max_dist_e6
FROM kmq GROUP BY cell
"""


@register("kmeans_quality_report", _KMQ_ORACLE, tags=("EXT2",))
def kmeans_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index health monitoring for the trained quantizer that serves
    IVF search AND SemDeDup: per cell, the member count, corpus share
    (ppm), cosine-distance inertia, and the worst member distance —
    the report that tells an index operator when cells have gone
    lopsided (retrain) or loose (raise nprobe). Distances are
    round-6 cosine complements integer-scaled e6, so the whole
    train -> assign -> measure chain is hash-checked; the oracle
    retrains the same k-means in SQL. One broadcast join + one
    grouped aggregate over the assigned corpus."""
    from auto_trade_data_pipeline_spark.operators.vectors import cosine, kmeans_cells

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, cents = VX.kmeans_cells(emb, k=KMEANS_K, iters=KMEANS_ITERS)
    j = assigned.join(
        F.broadcast(cents.withColumnRenamed("centroid", "__c")), "cell"
    )
    # Raw cosine scaled directly (round(x, 6) as a VALUE is the
    # documented cross-engine rounding trap; the fold-ordered dot
    # product is already bit-identical on both engines).
    d_e6 = F.round(
        (F.lit(1) - cosine(F.col("embedding"), F.col("__c"))) * 1000000, 0
    ).cast("long")
    per = j.select("cell", d_e6.alias("d_e6"))
    total = per.count()
    return per.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"(count(*) * 1000000) div {total}").alias("share_ppm"),
        F.sum("d_e6").alias("inertia_e6"),
        F.max("d_e6").alias("max_dist_e6"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-token sketch (deterministic registers + union merge)
# ---------------------------------------------------------------------------

_HLL_EST = (
    "CAST('0.7093409548395029' AS DOUBLE) * 4096.0 * 1125899906842624.0"
    " / CAST(s_scaled AS DOUBLE)"
)

_HLL_ORACLE = f"""
WITH {_DOCS_CTE},
tok AS (SELECT DISTINCT source, unnest(ts) AS tok FROM toks),
hv AS (SELECT DISTINCT source, {_duck_hash('tok', 'hll')} AS hv FROM tok),
regs AS (
  SELECT source, hv % 64 AS bucket,
         max(CASE WHEN hv // 64 = 0 THEN 55
                  ELSE 55 - length(bin(hv // 64)) END) AS register
  FROM hv GROUP BY source, bucket
),
merged AS (SELECT 'ALL' AS source, bucket, max(register) AS register FROM regs GROUP BY bucket),
allregs AS (SELECT * FROM regs UNION ALL SELECT * FROM merged),
spine AS (
  SELECT s.source, r.range AS bucket
  FROM (SELECT DISTINCT source FROM allregs) s CROSS JOIN range(64) r
),
filled AS (
  SELECT sp.source, sp.bucket, coalesce(a.register, 0) AS register
  FROM spine sp LEFT JOIN allregs a ON sp.source = a.source AND sp.bucket = a.bucket
),
ssum AS (
  SELECT source,
         CAST(sum(CASE WHEN register <= 50 THEN (CAST(1 AS BIGINT) << (50 - register))
                       ELSE 0 END) AS BIGINT) AS s_scaled
  FROM filled GROUP BY source
),
ex AS (
  SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact FROM tok GROUP BY source
  UNION ALL
  SELECT 'ALL', CAST(count(DISTINCT tok) AS BIGINT) FROM tok
),
est AS (
  SELECT s.source, s.s_scaled, e.n_exact,
         CAST(round(({_HLL_EST}) * 100) AS BIGINT) AS hll_est_e2
  FROM ssum s JOIN ex e ON s.source = e.source
)
SELECT source, s_scaled, n_exact, hll_est_e2,
       CAST((abs(hll_est_e2 - n_exact * 100) * 1000000) // (n_exact * 100) AS BIGINT)
         AS abs_err_ppm
FROM est
"""


@register("hll_distinct_sketch", _HLL_ORACLE, tags=("A5", "A9", "EXT3"))
def hll_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-token counts per document source PLUS the
    union-merged corpus-wide row (Flajolet et al., AofA'07) — the
    production mergeable distinct-count sketch, made cross-engine
    oracle-able by computing registers over the deterministic
    md5-60bit hash family (`operators/sketch.py:hll_sketch`): bucket
    = hash mod 64, register = max leading-zero rank. The 'ALL' row is
    built by ELEMENTWISE MAX over the per-source registers — the
    union-merge property that lets 1000 executors reduce a 100 TB
    scan to 64 bytes each — and its estimate is hash-checked against
    the oracle's identical merge. The harmonic sum is an exact BIGINT
    (2^(50-reg) scaling); the only float step is one shared-literal
    alpha*m^2/S division. Realized |error| vs the exact count is
    emitted in ppm."""
    from auto_trade_data_pipeline_spark.operators.sketch import hll_estimate, hll_sketch
    from auto_trade_data_pipeline_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("tok")).distinct()
    )
    regs = hll_sketch(tok, "source", "tok")
    merged = regs.groupBy("bucket").agg(F.max("register").alias("register")).select(
        F.lit("ALL").alias("source"), "bucket", "register"
    )
    allregs = regs.unionByName(merged)
    est = hll_estimate(allregs, "source")
    exact = tok.groupBy("source").agg(F.countDistinct("tok").alias("n_exact")).unionByName(
        tok.select(F.lit("ALL").alias("source"), "tok")
        .groupBy("source")
        .agg(F.countDistinct("tok").alias("n_exact"))
    )
    out = est.join(exact, "source").select(
        "source",
        "s_scaled",
        "n_exact",
        F.round(F.col("hll_est") * 100, 0).cast("long").alias("hll_est_e2"),
    )
    err = F.expr("(abs(hll_est_e2 - n_exact * 100) * 1000000) div (n_exact * 100)").cast(
        "long"
    )
    return out.select(
        "source", "s_scaled", "n_exact", "hll_est_e2", err.alias("abs_err_ppm")
    )


# ---------------------------------------------------------------------------
# Bigram language-model scoring (in-engine trained, add-one smoothed)
# ---------------------------------------------------------------------------

_BIGRAM_LM_ORACLE = f"""
WITH {_DOCS_CTE},
bg AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ts)), i -> ts[i])) AS w1,
         unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS b
  FROM toks WHERE len(ts) >= 2
),
vocab AS MATERIALIZED (
  SELECT CAST(count(DISTINCT t) AS BIGINT) AS v
  FROM (SELECT unnest(ts) AS t FROM toks)
),
cb AS MATERIALIZED (SELECT b, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY b),
ch AS MATERIALIZED (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY w1),
scored AS (
  SELECT g.doc_id,
         CAST(round(ln(CAST(cb.c12 + 1 AS DOUBLE) / CAST(ch.c1 + vocab.v AS DOUBLE))
                    * 1000000) AS BIGINT) AS logp_ppm
  FROM bg g JOIN cb ON g.b = cb.b JOIN ch ON g.w1 = ch.w1 CROSS JOIN vocab
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(logp_ppm) AS BIGINT) AS sum_logp_ppm,
       CAST((-sum(logp_ppm)) // count(*) AS BIGINT) AS neg_avg_logp_ppm
FROM scored GROUP BY doc_id
"""


@register("bigram_lm_score", _BIGRAM_LM_ORACLE, tags=("EXT3", "bench"))
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fluency scoring under a bigram language model
    TRAINED IN-ENGINE on the same corpus (add-one smoothing over the
    corpus vocabulary) — the KenLM-style perplexity filter of an LLM
    data pipeline, expressed relationally: bigram/history counts are
    two uniform-key shuffles, the 1-row vocabulary size broadcasts,
    and each bigram occurrence joins its type's log-probability.
    ln() is snapped to ppm AT THE TYPE LEVEL (same division then same
    IEEE ln on both engines — the BM25 IDF recipe), so per-doc sums
    are exact BIGINTs; the negated floor-average keeps the integer
    division on a positive numerator (engine div parity). Docs under
    2 tokens carry no bigram and are excluded by construction."""
    from auto_trade_data_pipeline_spark.operators import text as TX

    # The token table feeds FOUR consumers (bigram stream -> scored
    # join + bigram counts + history counts, and the vocabulary);
    # unpersisted, each branch re-runs tokenization from the scan.
    # Persisting the doc-sized token arrays runs it once. (Measured
    # against the alternatives in a 4-round interleaved A/B at sf0.1:
    # base 1.287s, fan_out 1.513s, persist-bigrams 1.153s,
    # persist-toks 0.784s — the exploded-bigram persist and the
    # fan-out exchange both cost more than they save here.)
    docs = load_table(spark, sf_dir, "documents")
    toks = scoped_persist(
        docs.select("doc_id", TX.tokens(F.col("text")).alias("ts"))
    )
    bg = (
        toks.filter(F.size("ts") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ts) - 2),"
                    " i -> struct(ts[i] AS w1, concat(ts[i], ' ', ts[i+1]) AS b))"
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.b").alias("b"))
    )
    vocab = toks.select(F.explode("ts").alias("t")).agg(
        F.countDistinct("t").alias("v")
    )
    cb = bg.groupBy("b").agg(F.count(F.lit(1)).alias("c12"))
    ch = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (
        bg.join(cb, "b")
        .join(ch, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.col("c12") + 1).cast("double") / (F.col("c1") + F.col("v")).cast("double")
                )
                * 1000000,
                0,
            )
            .cast("long")
            .alias("logp_ppm"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("logp_ppm").alias("sum_logp_ppm"),
        F.expr("(-sum(logp_ppm)) div count(*)").cast("long").alias("neg_avg_logp_ppm"),
    )


# ---------------------------------------------------------------------------
# Token entropy scoring (plug-in Shannon entropy per document)
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = f"""
WITH {_DOCS_CTE},
tok AS (
  SELECT doc_id, unnest(ts) AS t FROM toks WHERE len(ts) > 0
),
tc AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY doc_id, t
),
n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM tc GROUP BY doc_id),
scored AS (
  SELECT tc.doc_id, tc.c, n.n,
         CAST(round(ln(CAST(tc.c AS DOUBLE) / CAST(n.n AS DOUBLE)) * 1000000) AS BIGINT)
           AS lnp_ppm
  FROM tc JOIN n ON tc.doc_id = n.doc_id
)
SELECT doc_id,
       CAST(max(n) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST((-sum(c * lnp_ppm)) // max(n) AS BIGINT) AS entropy_ppm_nats
FROM scored GROUP BY doc_id
"""


@register("token_entropy_score", _ENTROPY_ORACLE, tags=("EXT3",))
def token_entropy_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token Shannon entropy (plug-in estimator, nats) —
    the lexical-diversity signal that separates repetitive
    boilerplate (low entropy) from natural prose, a standard LLM
    corpus-quality feature alongside the repetition profile. Each
    type's ln(c/n) is ppm-snapped (same IEEE division + ln both
    engines), the c-weighted sum is exact BIGINT, and the negated
    floor-average keeps integer division on a positive numerator.
    One uniform-key shuffle on (doc, token), one grouped rollup."""
    from auto_trade_data_pipeline_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("t"))
    tc = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    n = tc.groupBy("doc_id").agg(F.sum("c").alias("n"))
    scored = tc.join(n, "doc_id").select(
        "doc_id",
        "c",
        "n",
        F.round(F.log(F.col("c").cast("double") / F.col("n").cast("double")) * 1000000, 0)
        .cast("long")
        .alias("lnp_ppm"),
    )
    return scored.groupBy("doc_id").agg(
        F.max("n").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.expr("(-sum(c * lnp_ppm)) div max(n)").cast("long").alias("entropy_ppm_nats"),
    )


# ---------------------------------------------------------------------------
# PMI collocations (corpus phrase mining)
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOP_K = 100

_PMI_ORACLE = f"""
WITH {_DOCS_CTE},
bg AS MATERIALIZED (
  SELECT unnest(list_transform(range(1, len(ts)), i -> ts[i])) AS w1,
         unnest(list_transform(range(1, len(ts)), i -> ts[i+1])) AS w2
  FROM toks WHERE len(ts) >= 2
),
n AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nb FROM bg),
cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2),
c1 AS MATERIALIZED (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY w1),
c2 AS MATERIALIZED (SELECT w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY w2),
scored AS (
  SELECT cb.w1, cb.w2, cb.c12, c1.c1, c2.c2,
         CAST(round(ln(CAST(cb.c12 AS DOUBLE) * nb / (CAST(c1.c1 AS DOUBLE) * c2.c2))
                    * 1000000) AS BIGINT) AS pmi_ppm
  FROM cb JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
  WHERE cb.c12 >= {_PMI_MIN_COUNT}
)
SELECT w1, w2, c12, c1, c2, pmi_ppm FROM scored
ORDER BY pmi_ppm DESC, w1, w2 LIMIT {_PMI_TOP_K}
"""


@register("pmi_collocations", _PMI_ORACLE, tags=("EXT3",))
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by pointwise mutual information — the classic
    corpus phrase-mining pass (multiword-expression discovery for
    tokenizer vocabularies and stopword-phrase lists). Bigram and
    unigram-margin counts are three map-side-combinable shuffles over
    uniform token keys; the 1-row corpus total broadcasts; the
    min-count cut (>= 5) bounds the scored set before ranking.
    PMI's ln() is computed at the TYPE level from one fixed-order
    double expression shared verbatim with the oracle (the BM25/LM
    recipe), snapped to ppm; the top-k is a TakeOrderedAndProject on
    the total order (pmi desc, w1, w2) — never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", TX.tokens(F.col("text")).alias("ts"))
    bg = (
        toks.filter(F.size("ts") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ts) - 2),"
                    " i -> struct(ts[i] AS w1, ts[i+1] AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    # ONE corpus tokenization pass: the unigram margins and the
    # corpus total are exact sums over the bigram TYPE counts
    # (c1(x) = sum_w2 c12(x, w2), etc.), so they derive from the
    # persisted type table instead of three more passes over the
    # exploded token stream (round-6 scan audit: 4 corpus reads -> 1).
    cb = scoped_persist(bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")))
    n = cb.agg(F.sum("c12").alias("nb"))
    c1 = cb.groupBy("w1").agg(F.sum("c12").alias("c1"))
    c2 = cb.groupBy("w2").agg(F.sum("c12").alias("c2"))
    scored = (
        cb.filter(F.col("c12") >= _PMI_MIN_COUNT)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            F.expr(
                "CAST(round(ln(CAST(c12 AS DOUBLE) * nb / (CAST(c1 AS DOUBLE) * c2))"
                " * 1000000) AS BIGINT)"
            ).alias("pmi_ppm"),
        )
    )
    return scored.orderBy(F.desc("pmi_ppm"), "w1", "w2").limit(_PMI_TOP_K)


# ---------------------------------------------------------------------------
# Multi-source BFS hop levels over the near-dup graph
# ---------------------------------------------------------------------------

_BFS_SEED_SOURCE = "src0"
_BFS_HOPS = 4


def _bfs_oracle() -> str:
    """Unrolled min-plus BFS rounds over the symmetrized njpairs
    edges (MATERIALIZED once); the relax step is the same explicit
    CASE the Spark operator uses, so NULL semantics match exactly."""
    ctes = [
        """bfs_e AS MATERIALIZED (
  SELECT id_a AS u, id_b AS v FROM njpairs
  UNION
  SELECT id_b AS u, id_a AS v FROM njpairs
)""",
        f"""bfs_l0 AS MATERIALIZED (
  SELECT doc_id AS node,
         CASE WHEN source = '{_BFS_SEED_SOURCE}'
              THEN CAST(0 AS BIGINT) END AS level
  FROM docs
)""",
    ]
    for i in range(_BFS_HOPS):
        ctes += [
            f"""bfs_c{i} AS (
  SELECT e.v AS node, CAST(min(l.level) + 1 AS BIGINT) AS cand
  FROM bfs_e e JOIN bfs_l{i} l ON l.node = e.u
  WHERE l.level IS NOT NULL
  GROUP BY e.v
)""",
            f"""bfs_l{i + 1} AS MATERIALIZED (
  SELECT b.node,
         CASE WHEN b.level IS NULL THEN c.cand
              WHEN c.cand IS NULL THEN b.level
              WHEN c.cand < b.level THEN c.cand ELSE b.level END AS level
  FROM bfs_l{i} b LEFT JOIN bfs_c{i} c ON c.node = b.node
)""",
        ]
    body = ",\n".join(ctes)
    return f"""
WITH {_minhash_ctes()},
{body}
SELECT node AS doc_id, CAST(coalesce(level, -1) AS BIGINT) AS level
FROM bfs_l{_BFS_HOPS}
"""


@register("graph_bfs_levels", _bfs_oracle(), tags=("EXT1", "J4"))
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance through the near-dup graph
    (operators/graph.py:bfs_levels): every document's degrees of
    separation from the trusted seed source's documents — the
    blast-radius / provenance-propagation audit (how far does content
    trace back to a trusted origin through near-duplicate chains).
    {H} min-plus rounds over the symmetrized MinHash-LSH pair edges;
    levels are small exact integers updated by MIN, so the fixpoint
    is order-free at any parallelism and the DuckDB oracle replays
    the identical unrolled rounds; isolated documents report -1.

    Scale shape: per round, one frontier-x-edges shuffle join + one
    min-groupBy (the Pregel BFS layout); lineage truncated per round
    via localCheckpoint.""".replace("{H}", str(_BFS_HOPS))
    from auto_trade_data_pipeline_spark.operators.graph import bfs_levels

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup_near_minhash_lsh(spark, sf_dir)
    seeds = docs.filter(F.col("source") == _BFS_SEED_SOURCE).select(
        F.col("doc_id").alias("node")
    )
    return bfs_levels(
        docs.select(F.col("doc_id").alias("node")),
        pairs,
        seeds,
        max_hops=_BFS_HOPS,
    ).select(F.col("node").alias("doc_id"), "level")


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis race)
# ---------------------------------------------------------------------------

_ES_K = 100
#: Deterministic uniform in (0, 1]: the 60-bit salted hash shifted by
#: one so ln() never sees 0; 1152921504606846977 = 2^60 + 1.
_ES_U = "((CAST(h AS DOUBLE) + 1.0) / 1152921504606846977.0)"
#: ES race key: rank by ln(u)/w DESCENDING == rank by u^(1/w) — the
#: classic one-pass weighted-without-replacement reservoir key.
_ES_KEY = f"(ln({_ES_U}) / greatest(n_chars, 1))"

_ES_SAMPLE_ORACLE = f"""
WITH base AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
         {_duck_hash("CAST(doc_id AS VARCHAR)", "es")} AS h
  FROM documents
),
keyed AS (
  -- snap BEFORE ranking: membership and rank are decided on the
  -- integer e9 key (doc_id tiebreak), so a 1-ulp libm ln difference
  -- at the K-th boundary cannot flip the sample (round-4 advice)
  SELECT doc_id, source, n_chars,
         CAST(round({_ES_KEY} * 1000000000) AS BIGINT) AS key_e9
  FROM base
),
ranked AS (
  SELECT doc_id, source, n_chars, key_e9,
         row_number() OVER (ORDER BY key_e9 DESC, doc_id) AS rk
  FROM keyed
)
SELECT doc_id, source, n_chars, key_e9, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {_ES_K}
"""


@register("weighted_sample_es", _ES_SAMPLE_ORACLE, tags=("EXT3", "O2"))
def weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    2006 exponential race) — the corpus-subsampling primitive that
    pps/source-cap sampling doesn't give: each document gets the race
    key u^(1/w) (here ranked as ln(u)/w with w = document length),
    and the global top-{K} keys ARE a weighted sample without
    replacement. u comes from a salted 60-bit hash, so the sample is
    deterministic, reproducible under re-runs, and mergeable: the
    top-{K} of a union is the top-{K} of the per-shard top-{K}s — the
    property that makes the one-pass distributed reservoir work.

    Scale shape: pure scan-side key computation + one
    TakeOrderedAndProject (per-task {K}-row heaps, driver merge) —
    no shuffle of the corpus, ever. The race key is snapped to an
    integer e9 BEFORE ranking on both engines (doc_id tiebreak), so
    top-{K} membership is exact-integer — a 1-ulp JVM-vs-libm ln
    difference at the boundary cannot flip the sample (round-4
    advice).""".replace(
        "{K}", str(_ES_K)
    )
    from auto_trade_data_pipeline_spark.operators.text import hash64

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        hash64(F.col("doc_id").cast("string"), salt="es").alias("h"),
    ).select(
        "doc_id",
        "source",
        "n_chars",
        F.expr(f"CAST(round({_ES_KEY} * 1000000000) AS BIGINT)").alias("key_e9"),
    )
    from pyspark.sql.window import Window

    top = keyed.orderBy(F.col("key_e9").desc(), F.col("doc_id")).limit(_ES_K)
    w = Window.orderBy(F.col("key_e9").desc(), F.col("doc_id"))
    return top.select(
        "doc_id",
        "source",
        "n_chars",
        "key_e9",
        F.row_number().over(w).cast("long").alias("rk"),
    )
