"""Vector similarity operators (EXT, SURVEY §2.11): exact cosine
top-k and an IVF-bucketed approximate variant over
``embeddings(embedding: array<float>)``.

Determinism contract: dot products accumulate **sequentially in index
order via F.aggregate** (not a commutative sum), so the same bits come
out regardless of parallelism — and the DuckDB oracle reproduces them
with ``list_reduce`` over the same index order. Arrays are cast to
``array<double>`` first so both engines do double arithmetic.

Scale design:
- Brute-force top-k broadcasts the (small) query set and computes
  per-partition partial top-k via window rank on (query, candidate)
  pairs — row explosion is |queries| x |corpus|, the honest baseline.
- IVF variant prunes the corpus to `nprobe` coarse cells before the
  exact rerank: the join key is the cell id, so the shuffle carries
  only probed cells. Centroids come from any coarse assignment
  (here: the `label` column as a stand-in k-means); at 100 TB the
  centroid table is dimension-sized and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from auto_trade_data_pipeline_spark.cache_scope import scoped_persist
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "dot",
    "l2_norm",
    "cosine",
    "cosine_topk",
    "ivf_topk",
    "label_centroids",
    "assign_cells",
    "kmeans_cells",
    "srp_signature",
    "srp_bands",
    "srp_near_dup",
    "semantic_dedup",
    "centroids_as_row",
    "assign_cell_expr",
    "sq_l2",
    "l2_normalize",
    "pq_train",
    "pq_encode",
    "pq_adc_topk",
]


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product (deterministic across engines)."""
    prods = F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_normalize(a: Column) -> Column:
    """Unit-normalize (deterministic: sequential-order norm, one
    double division per component). On unit vectors squared-L2 is
    2 - 2*cos, so L2-based ANN (PQ/ADC) ranks identically to cosine."""
    nrm = l2_norm(a)
    return F.transform(a.cast("array<double>"), lambda x: x / nrm)


def centroids_as_row(centroids: DataFrame) -> DataFrame:
    """Collapse a (cell, centroid) table into ONE row holding the
    cell-ascending array<struct<cell, centroid>> plus a constant join
    key ``__k`` — the broadcastable form a STREAM can consume (stream
    DataFrames cannot run the ranking window `assign_cells` uses;
    `assign_cell_expr` replaces it with a pure-expression fold)."""
    return (
        centroids.groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("cell", "centroid"))).alias("__ctab"))
        .withColumn("__k", F.lit(1))
    )


def assign_cell_expr(vec_col: Column, ctab_col: Column) -> Column:
    """Nearest-cell id by round-6 cosine as a pure expression fold —
    bit-identical to `assign_cells`'s window (desc cosine, cell-asc
    tiebreak): the fold visits cells in ASCENDING cell order (the
    array is sorted by `centroids_as_row`), replacing the accumulator
    only on a STRICTLY greater rounded cosine, so a tie keeps the
    smaller cell. Windowless => legal on streaming DataFrames, and on
    batch plans it trades the per-vector rank exchange for a narrow
    map — the corpus never shuffles at all."""
    init = F.struct(
        F.lit(-2.0).alias("cos"), F.lit(-1).cast("int").alias("cell")
    )
    return F.aggregate(
        ctab_col,
        init,
        lambda acc, c: F.when(
            F.round(cosine(vec_col, c["centroid"]), 6) > acc["cos"],
            F.struct(
                F.round(cosine(vec_col, c["centroid"]), 6).alias("cos"),
                c["cell"].alias("cell"),
            ),
        ).otherwise(acc),
    )["cell"]


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast the query set against
    the corpus, rank per query by (cosine desc, id). Self-matches are
    excluded. Output: (query_id, neighbor_id, cos, rank)."""
    # Norms are per-VECTOR, so they are projected once per side below
    # the join instead of recomputed inside every pair's cosine —
    # per-pair work drops from three interpreted aggregate() folds to
    # one (the dot). `dot / (qn * cn)` is the identical IEEE
    # expression cosine() builds, with the same norm values
    # substituted, so results are bit-equal (round-10).
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            l2_norm(F.col(vec_col)).alias("__qn"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.join(q, F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def label_centroids(
    corpus: DataFrame, cell_col: str = "label", vec_col: str = "embedding", scale: int = 10**6
) -> DataFrame:
    """Per-cell centroid via posexplode + per-dimension mean, computed
    over integer-scaled values so the sum is order-independent (exact
    bigint arithmetic -> identical centroids in any engine at any
    parallelism). Returns (cell, centroid: array<double>)."""
    dims = corpus.select(
        F.col(cell_col).alias("cell"), F.posexplode(F.col(vec_col).cast("array<double>"))
    )
    per_dim = dims.groupBy("cell", "pos").agg(
        (
            F.sum(F.round(F.col("col") * scale, 0).cast("long"))
            / F.lit(float(scale))
            / F.count(F.lit(1))
        ).alias("mean")
    )
    return per_dim.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mean"))), lambda s: s["mean"]
        ).alias("centroid")
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid by cosine
    (round-6, cell-id tiebreak — deterministic across engines and
    parallelism). One broadcast join against the dimension-sized
    centroid table + a per-vector rank: the corpus never shuffles."""
    w = Window.partitionBy(id_col).orderBy(F.col("__acos").desc(), F.col("cell"))
    return (
        corpus.join(F.broadcast(centroids))
        .withColumn("__acos", F.round(cosine(F.col(vec_col), F.col("centroid")), 6))
        .withColumn("__pr", F.row_number().over(w))
        .filter(F.col("__pr") == 1)
        .drop("__acos", "__pr", "centroid")
    )


def kmeans_cells(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic k-means coarse quantizer — the trained IVF cell
    assignment (replaces any metadata stand-in):

    - **seeds**: the k corpus vectors with the smallest portable 60-bit
      md5 hash of their id — a uniform deterministic sample selected by
      top-k (TakeOrderedAndProject), never a global sort;
    - **assign**: argmax cosine vs the broadcast centroid table
      (round-6, cell tiebreak) — corpus-side narrow, no shuffle;
    - **update**: per-cell per-dimension means over integer-scaled
      values (bigint sums are order-independent ⇒ bit-identical
      centroids at any parallelism, reproducible in the DuckDB oracle).

    Runs `iters` assign→update rounds, then a final assignment against
    the trained centroids. Returns (assigned corpus with ``cell``,
    centroids ``(cell, centroid)``). Empty cells drop out naturally on
    both engines. Per round: one broadcast join + one k×dims-sized
    aggregation — the iteration cost at 100 TB is `iters` corpus scans,
    nothing quadratic. The corpus is persisted for the training loop
    (unless the caller already persisted it): each round's assignment
    and the final assignment all read the same input, and caching it
    turns `iters + 1` table scans into one scan plus cache reads (the
    MLlib convention for iterative fits; the cache is LRU-evictable
    and results are unchanged)."""
    from pyspark import StorageLevel

    from auto_trade_data_pipeline_spark.operators.text import hash64

    if corpus.storageLevel == StorageLevel.NONE:
        corpus = scoped_persist(corpus)
    hashed = corpus.select(
        F.col(id_col), F.col(vec_col), hash64(F.col(id_col).cast("string")).alias("__h")
    )
    seed_w = Window.orderBy("__h", id_col)
    cents = (
        hashed.orderBy("__h", id_col)
        .limit(k)
        .withColumn("cell", F.row_number().over(seed_w) - 1)
        .select("cell", F.col(vec_col).cast("array<double>").alias("centroid"))
    )
    for _ in range(iters):
        assigned = assign_cells(corpus, cents, id_col, vec_col)
        cents = label_centroids(assigned, cell_col="cell", vec_col=vec_col, scale=scale)
    assigned = assign_cells(corpus, cents, id_col, vec_col)
    return assigned, cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF search: route each query to its `nprobe` nearest coarse
    cells (by centroid cosine), then exact cosine rerank within the
    probed cells only. Centroid table broadcasts; the corpus is
    touched only where its cell matches a probe — at scale, with
    cell-partitioned storage, unprobed cells are never even scanned
    (partition pruning). Output: (query_id, neighbor_id, cos, rank).
    """
    cq = F.broadcast(centroids)
    probe_w = Window.partitionBy("query_id").orderBy(F.col("__ccos").desc(), F.col("cell"))
    probes = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
        .join(cq)
        .withColumn("__ccos", F.round(cosine(F.col("__qv"), F.col("centroid")), 6))
        .withColumn("__pr", F.row_number().over(probe_w))
        .filter(F.col("__pr") <= nprobe)
        .select("query_id", "__qv", "cell")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.col(cell_col).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(probes), on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("__qv"), F.col("__cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def semantic_dedup(
    assigned: DataFrame,
    threshold: float = 0.6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", 2023): embedding-space
    near-duplicate removal WITHIN k-means clusters — a vector is
    dropped iff a smaller-id vector in the SAME cell has cosine >=
    threshold (greedy keep-first; the paper keeps the point closest
    to the centroid — lowest-id is the deterministic, oracle-checkable
    stand-in for that policy). Input is a cell-assigned corpus
    (`kmeans_cells`); output keeps every input row with a 0/1 `kept`
    flag.

    Scale shape: the pairwise comparison is CONFINED to cells — the
    self-join key is the cell id, never a crossJoin — so the work is
    sum(|cell|^2), the SemDeDup trade. At 100 TB k grows with the
    corpus (k ≈ N/target_cell_size) so cells stay bounded; a skewed
    cell would hit the `split_oversized_blocks` pair-work cap
    (operators/skew.py) before exploding."""
    # Per-vector norms below the self-join (one dot fold per pair
    # instead of three; dot/(na*nb) is the identical IEEE expression
    # — see cosine_topk, round 10).
    a = assigned.select(
        F.col(cell_col).alias("__cell"),
        F.col(id_col).alias("__ida"),
        F.col(vec_col).alias("__va"),
        l2_norm(F.col(vec_col)).alias("__na"),
    )
    b = assigned.select(
        F.col(cell_col).alias("__cell"),
        F.col(id_col).alias("__idb"),
        F.col(vec_col).alias("__vb"),
        l2_norm(F.col(vec_col)).alias("__nb"),
    )
    dups = (
        a.join(b, "__cell")
        .filter(F.col("__ida") < F.col("__idb"))
        .withColumn(
            "__cos",
            F.round(
                dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 6
            ),
        )
        .filter(F.col("__cos") >= threshold)
        .select(F.col("__idb").alias(id_col))
        .distinct()
        .withColumn("__dup", F.lit(1))
    )
    return (
        assigned.join(dups, id_col, "left")
        .withColumn("kept", F.when(F.col("__dup").isNull(), 1).otherwise(0))
        .drop("__dup")
    )


def sq_l2(a: Column, b: Column) -> Column:
    """Sequential-order squared-L2 distance (deterministic across
    engines/parallelism — same contract as :func:`dot`)."""
    diffs = F.zip_with(
        a.cast("array<double>"), b.cast("array<double>"), lambda x, y: (x - y) * (x - y)
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def _subspace_rows(
    corpus: DataFrame, m: int, dsub: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, sub, subvec) — one row per vector per PQ subspace."""
    return corpus.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sub"),
                        F.slice(F.col(vec_col).cast("array<double>"), j * dsub + 1, dsub).alias(
                            "subvec"
                        ),
                    )
                    for j in range(m)
                ]
            )
        ).alias("__s"),
    ).select(id_col, "__s.sub", "__s.subvec")


def _pq_assign(subrows: DataFrame, codebooks: DataFrame, id_col: str) -> DataFrame:
    """Nearest-code assignment per (vector, subspace): argmin round-6
    squared-L2 vs the broadcast codebook, code-id tiebreak."""
    w = Window.partitionBy(id_col, "sub").orderBy("__d", "code")
    return (
        subrows.join(F.broadcast(codebooks), "sub")
        .withColumn("__d", F.round(sq_l2(F.col("subvec"), F.col("centroid")), 6))
        .withColumn("__pr", F.row_number().over(w))
        .filter(F.col("__pr") == 1)
        .select(id_col, "sub", "subvec", "code")
    )


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> DataFrame:
    """Product-quantization codebooks (Jegou, Douze, Schmid, "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): split each
    vector into `m` subvectors of dims/m components and train an
    independent `ksub`-centroid k-means per subspace. Deterministic by
    the same recipe as :func:`kmeans_cells` — hash-sampled seeds
    (smallest 60-bit md5 of the id, shared across subspaces), round-6
    squared-L2 argmin with code-id tiebreak, integer-scaled centroid
    means — so an oracle engine retrains bit-identical codebooks.

    Returns ``(sub, code, centroid: array<double>)`` — m*ksub rows, a
    dimension-sized table that broadcasts everywhere it is used. At
    100 TB codebooks are trained on a hash-sample of the corpus (the
    seed hash already defines one); training cost per iteration is one
    corpus scan over (id, sub, subvec) rows."""
    from auto_trade_data_pipeline_spark.operators.text import hash64

    if m <= 0 or dims % m != 0:
        raise ValueError(f"dims ({dims}) must divide evenly into m ({m}) subspaces")
    if ksub < 1 or iters < 0:
        raise ValueError("ksub must be >= 1 and iters >= 0")
    dsub = dims // m
    # Persist the subspace rows: every k-means round re-reads them,
    # and they exist only inside this call (clearly owned; the
    # kmeans_cells caching rationale applies).
    subrows = scoped_persist(_subspace_rows(corpus, m, dsub, id_col, vec_col))
    hashed = subrows.withColumn("__h", hash64(F.col(id_col).cast("string")))
    seed_w = Window.partitionBy("sub").orderBy("__h", id_col)
    books = (
        hashed.withColumn("code", F.row_number().over(seed_w) - 1)
        .filter(F.col("code") < ksub)
        .select("sub", "code", F.col("subvec").alias("centroid"))
    )
    for _ in range(iters):
        assigned = _pq_assign(subrows, books, id_col)
        per_dim = assigned.select(
            "sub", "code", F.posexplode("subvec").alias("pos", "v")
        ).groupBy("sub", "code", "pos").agg(
            (
                F.sum(F.round(F.col("v") * scale, 0).cast("long"))
                / F.lit(float(scale))
                / F.count(F.lit(1))
            ).alias("mean")
        )
        books = per_dim.groupBy("sub", "code").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mean"))), lambda s: s["mean"]
            ).alias("centroid")
        )
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as `m` codebook indices — ``(id, codes:
    array<int>)`` ordered by subspace. This is the 100 TB payoff: a
    64-dim float32 vector (256 B) compresses to m bytes (64x at m=4,
    ksub<=256), so a billion-vector index fits executor memory and the
    ADC scan is compressed-domain — the raw vectors are read once at
    encode time and never shuffled again."""
    dsub = dims // m
    assigned = _pq_assign(_subspace_rows(corpus, m, dsub, id_col, vec_col), codebooks, id_col)
    return assigned.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))), lambda s: s["code"]
        ).alias("codes")
    )


def pq_adc_topk(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    refine: int = 3,
    m: int = 4,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
    precomputed_routing: bool = False,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes with exact
    rerank: per query, precompute the m x ksub table of integer-scaled
    squared-L2 distances from each query subvector to each codebook
    centroid, scan the encoded corpus summing m exact bigint lookups
    (``adist``), keep the ``refine * k`` best candidates, then rerank
    those few by exact cosine against the raw vectors.

    Scale shape: the distance table is per-query dimension-sized and
    rides a broadcast; the corpus side touches only (id, codes) — one
    narrow broadcast join, zero shuffle until the per-query top-k
    window; the exact-rerank join fetches refine*k*|queries| raw
    vectors, not the corpus. Output: (query_id, neighbor_id, adist,
    cos, rank).

    With ``precomputed_routing`` the encoded side already carries a
    ``query_id`` routing column (e.g. IVF cell probes matched the
    candidates to queries); the scan then equi-joins the distance
    table on query_id instead of fanning every code row out to every
    query — the IVF-PQ composite path."""
    dsub = dims // m
    q_sub = _subspace_rows(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col)),
        m,
        dsub,
        "query_id",
        vec_col,
    )
    dtab = (
        q_sub.join(F.broadcast(codebooks), "sub")
        .withColumn(
            "__dq", F.round(F.round(sq_l2(F.col("subvec"), F.col("centroid")), 6) * scale, 0).cast("long")
        )
        .groupBy("query_id", "sub")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("code", "__dq"))), lambda s: s["__dq"]
            ).alias("__row")
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "__row"))), lambda s: s["__row"]
            ).alias("__dtab")
        )
    )
    if precomputed_routing:
        routed = encoded.select(
            F.col(id_col).alias("neighbor_id"), "codes", "query_id"
        ).join(F.broadcast(dtab), "query_id").filter(
            F.col("query_id") != F.col("neighbor_id")
        )
    else:
        routed = encoded.select(F.col(id_col).alias("neighbor_id"), "codes").join(
            F.broadcast(dtab), F.col("query_id") != F.col("neighbor_id")
        )
    scored = (
        routed
        .withColumn(
            "__ds",
            F.aggregate(
                F.zip_with(
                    F.col("codes"),
                    F.col("__dtab"),
                    lambda c, row: F.element_at(row, c + F.lit(1)),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
        .withColumn("adist", F.col("__ds") / F.lit(float(scale)))
    )
    cw = Window.partitionBy("query_id").orderBy("__ds", "neighbor_id")
    cands = (
        scored.withColumn("__cr", F.row_number().over(cw))
        .filter(F.col("__cr") <= refine * k)
        .select("query_id", "neighbor_id", "adist")
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    rw = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        cands.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cos", F.round(cosine(F.col("__qv"), F.col("__cv")), 6))
        .withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("adist", 6).alias("adist"), "cos", "rank")
    )


def srp_signature(
    vec: Column, nbits: int = 16, dims: int = 64, scale: int = 10**6, salt: str = "srp"
) -> Column:
    """Signed-random-projection (cosine LSH) signature: bit j is the
    sign of <v, h_j> for a fixed random hyperplane h_j with +-1
    entries. The hyperplane matrix is derived from md5 parity
    (sign(j,i) = +1 iff md5("salt:j:i")'s 60-bit prefix is even), so
    an oracle engine regenerates the identical planes from the same
    formula — and the projection is computed over integer-scaled
    components (bigint sums are order-independent), so the signature
    is bit-identical at any parallelism.

    Charikar (STOC'02): P[bit agrees] = 1 - theta/pi — Hamming
    distance on signatures estimates the angle. All JVM-side
    expression code (zip_with + aggregate), no Python in the path.
    """
    import hashlib

    scaled = F.transform(vec.cast("array<double>"), lambda x: F.round(x * scale, 0).cast("long"))
    sig = F.lit(0).cast("long")
    for j in range(nbits):
        signs = F.array(
            *[
                F.lit(
                    1
                    if int(hashlib.md5(f"{salt}:{j}:{i}".encode()).hexdigest()[:15], 16) % 2 == 0
                    else -1
                )
                for i in range(dims)
            ]
        )
        proj = F.aggregate(
            F.zip_with(scaled, signs, lambda x, s: x * s.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj >= 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def srp_bands(
    sig: DataFrame,
    id_col: str,
    sig_col: str = "__sig",
    nbits: int = 16,
    band_bits: int = 4,
) -> DataFrame:
    """(id, band_idx, band_val) rows from an SRP signature column —
    one explode per vector, shared by the self-join near-dup and the
    delta-vs-corpus incremental variant."""
    nbands = nbits // band_bits
    mask = (1 << band_bits) - 1
    return sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright(sig_col, b * band_bits).bitwiseAND(mask).alias("band_val"),
                    )
                    for b in range(nbands)
                ]
            )
        ).alias("__b"),
    ).select(id_col, "__b.band_idx", "__b.band_val")


def srp_near_dup(
    corpus: DataFrame,
    threshold: float = 0.4,
    nbits: int = 16,
    band_bits: int = 4,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Metadata-free embedding near-dup via cosine LSH: band the SRP
    signature (nbits/band_bits bands), self-join on (band_idx,
    band_val), verify candidates with exact cosine >= threshold.
    Complements the cell-blocked variant (dedup_embedding_cosine):
    no prior cell/label metadata needed, and recall crosses cell
    boundaries. At 100 TB the shuffle key is the band value (uniform
    by construction — hyperplane signs are unbiased), candidate
    verification touches only banded collisions, never all pairs;
    nbits/band_bits tune the recall/candidate-volume trade
    (production sizing: 64-128 bits, 8-16 bit bands).
    Output: (id_a, id_b, cos)."""
    sig = scoped_persist(corpus.select(
        F.col(id_col), F.col(vec_col), srp_signature(F.col(vec_col), nbits, dims).alias("__sig")
    ))
    bands = srp_bands(sig, id_col, "__sig", nbits, band_bits)
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band_idx", "band_val"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b"))
        .distinct()
    )
    va = sig.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    vb = sig.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", F.round(cosine(F.col("__va"), F.col("__vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
