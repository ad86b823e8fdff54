"""In-engine trained text-quality classifier (EXT, SURVEY §2.11
extension): logistic-style regression over hashed bag-of-words
features, trained by distributed full-batch gradient descent — the
fastText-/CCNet-style "learned quality filter" stage of an LLM data
pipeline, expressed entirely in DataFrame operations so the TRAINING
LOOP itself runs where the data lives.

Determinism contract (what makes the loop cross-engine oracle-able):

- the link function is the rational "fast sigmoid"
  ``s(z) = 0.5 + (z/2) / (1 + |z|)`` — same shape and gradient sign
  as the logistic sigmoid but computed with +-*/ only, so both
  engines produce bit-identical activations (``exp`` differs at ~1
  ulp across libm implementations; a rational link removes the
  transcendental entirely);
- every cross-row sum (the per-document margin and the per-bucket
  gradient) accumulates integer-scaled BIGINT terms
  (``round(x * 1e6)``), so partial-aggregation order cannot change
  the result at any parallelism;
- feature hashing uses the portable md5-60bit hash
  (`operators.text.hash64`), reproducible in SQL.

Scale shape: the model is dimension-sized (n_buckets+1 weights) and
rides a broadcast; each GD iteration is two shuffles over the sparse
feature rows (margin: keyed by doc, gradient: keyed by bucket — both
uniform keys with map-side combine). At 100 TB that is the canonical
data-parallel GD layout: O(iters) corpus scans, nothing quadratic,
no parameter server needed below ~1e6 buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from auto_trade_data_pipeline_spark.operators.text import hash64

__all__ = ["hashed_features", "fast_sigmoid", "train_logistic_gd", "predict_scores"]


def fast_sigmoid(z):
    """Rational sigmoid: 0.5 + (z/2)/(1+|z|) — monotone, (0,1),
    s(0)=0.5, computable bit-identically on any engine."""
    return F.lit(0.5) + (z / 2) / (1 + F.abs(z))


def hashed_features(
    df: DataFrame,
    tokens_col: str,
    id_col: str,
    n_buckets: int = 16,
    salt: str = "feat",
) -> DataFrame:
    """Sparse hashed bag-of-words features: (id, bucket, val) rows
    where bucket = hash64(token) % n_buckets and val = bucket token
    count / document token count, plus one bias row (bucket =
    n_buckets, val = 1.0) per non-empty document. Empty documents
    emit nothing (their margin is 0 ⇒ score 0.5)."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    toks = df.select(F.col(id_col), F.col(tokens_col).alias("__ts")).filter(
        F.size("__ts") > 0
    )
    counts = (
        toks.select(
            id_col,
            F.size("__ts").alias("__n"),
            F.explode("__ts").alias("__tok"),
        )
        .withColumn("bucket", F.pmod(hash64(F.col("__tok"), salt=salt), F.lit(n_buckets)).cast("int"))
        .groupBy(id_col, "bucket", "__n")
        .agg(F.count(F.lit(1)).alias("__c"))
        .select(id_col, "bucket", (F.col("__c") / F.col("__n")).alias("val"))
    )
    bias = toks.select(
        F.col(id_col), F.lit(n_buckets).cast("int").alias("bucket"), F.lit(1.0).alias("val")
    )
    return counts.unionByName(bias)


def _margins(feats: DataFrame, weights: DataFrame, id_col: str, scale: int) -> DataFrame:
    """Per-document margin z = w . x as an exact integer-scaled sum:
    one broadcast join (model side) + one doc-keyed aggregation."""
    return (
        feats.join(F.broadcast(weights), "bucket")
        .withColumn("__p", F.round(F.col("val") * F.col("w") * scale, 0).cast("long"))
        .groupBy(id_col)
        .agg((F.sum("__p") / F.lit(float(scale))).alias("z"))
    )


def train_logistic_gd(
    feats: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    n_buckets: int = 16,
    iters: int = 3,
    lr: float = 5.0,
    scale: int = 10**6,
) -> DataFrame:
    """Full-batch gradient descent for the fast-sigmoid linear
    classifier. `labels` is (id, y: double in {0,1}); N (the GD
    normalizer) is its row count, carried as a broadcast one-row
    aggregate — no driver-side collect. Returns (bucket, w) with
    n_buckets+1 rows (the last is the bias).

    Each iteration: margin (doc-keyed shuffle) → residual
    r = s(z) - y → per-bucket gradient (bucket-keyed shuffle, exact
    integer-scaled sum) → broadcast model update. The weight values
    are deterministic doubles derived from exact sums, so retraining
    on any engine at any parallelism gives identical weights.

    Each iteration's weight table is MATERIALIZED
    (n_buckets+1 rows — model-sized, never data-sized): the update
    expression references the previous weights twice (margins + the
    update join), so a lazy lineage doubles per iteration and the
    doc-sized margin/residual stages re-execute 2^iters times — the
    Spark twin of the exponential inlined-CTE trap the corpus oracle
    conventions document for DuckDB. Training is therefore eager
    (iters tiny jobs), like any iterative fit — each iteration ends
    in a model-sized collect (the dimension-metadata pattern of
    operators/ranking.py; the GD normalizer N itself stays a
    broadcast aggregate). Callers should persist
    `feats` (every iteration reads it); `labels` is persisted here
    for the loop and released before returning."""
    from pyspark import StorageLevel

    spark = feats.sparkSession
    w = spark.range(n_buckets + 1).select(
        F.col("id").cast("int").alias("bucket"), F.lit(0.0).alias("w")
    )
    owns_labels = labels.storageLevel == StorageLevel.NONE
    if owns_labels:
        labels = labels.persist()
    total = F.broadcast(labels.agg(F.count(F.lit(1)).alias("__N")))
    for _ in range(iters):
        z = _margins(feats, w, id_col, scale)
        resid = z.join(labels, id_col).select(
            F.col(id_col), (fast_sigmoid(F.col("z")) - F.col("y")).alias("__r")
        )
        grads = (
            feats.join(resid, id_col)
            .withColumn("__g", F.round(F.col("__r") * F.col("val") * scale, 0).cast("long"))
            .groupBy("bucket")
            .agg((F.sum("__g") / F.lit(float(scale))).alias("__grad"))
        )
        w = (
            w.join(grads, "bucket", "left")
            .join(total)
            .select(
                "bucket",
                (
                    F.col("w")
                    - F.lit(lr) * F.coalesce(F.col("__grad"), F.lit(0.0)) / F.col("__N")
                ).alias("w"),
            )
        )
        # Materialize the model into a LocalRelation: truncates the
        # doubling lineage (see docstring). n_buckets+1 rows of
        # (int, double) — model-sized driver metadata, the same
        # category as ranking.py's partition sums, never data-sized.
        w = spark.createDataFrame(
            sorted(w.collect()), schema="bucket int, w double"
        )
    if owns_labels:
        labels.unpersist()
    return w


def predict_scores(
    feats: DataFrame,
    weights: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    scale: int = 10**6,
) -> DataFrame:
    """Score every document in `docs` with the trained model:
    (id, margin, score). Documents with no feature rows score 0.5
    (zero margin). One broadcast join + one doc-keyed aggregation."""
    z = _margins(feats, weights, id_col, scale)
    zc = F.coalesce(F.col("z"), F.lit(0.0))
    return docs.select(id_col).join(z, id_col, "left").select(
        id_col,
        F.round(zc, 6).alias("margin"),
        F.round(fast_sigmoid(zc), 6).alias("score"),
    )
