"""Similarity search over embedding columns (array<float>).

Extends the reference's embryonic vector support — `VectorType`
(andb/catalog/type.py:237-280) + `cosine_distance`
(andb/catalog/buitin_functions.py:3-12) + the "we will support vector
index in the future here" TODO (implementations.py:108) — into working
operators:

- ``cosine_topk``: brute-force exact top-k. One scan + TakeOrderedAndProject
  (Spark's top-k needs no full sort); dot products are JVM-side
  zip_with/aggregate folds — scales linearly, embarrassingly parallel.
- ``pairwise_near_dup``: exact all-pairs cosine above threshold — the
  bounded exact verifier (guarded at EXACT_PAIRS_ROW_CAP rows).
- ``near_dup_pairs``: size-routed chooser over the exact verifier and
  the IVF-bucketed plan — the corpus-scale entry point.
- ``ivf_assign`` / ``ivf_topk``: IVF-style ANN. Centroids are a fixed
  (broadcast) table; assignment is a broadcast cross join + min —
  shuffle-free on the big side. The probe searches only the query's
  nearest ``nprobe`` clusters — the standard recall/latency trade.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from andb_spark.functions.vector import cosine_similarity, dot, l2_norm


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.
    Ties broken by id for determinism."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    df = embeddings.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cos_sim"),
    )
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    return df.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


# Ceiling for the exact all-pairs path: n rows → n²/2 pair evaluations,
# so 20k rows ≈ 2e8 dot products — the most a single query should spend
# before the bucketed path's 1/n_clusters pruning pays for its extra
# shuffle. Same role as plans/ann.py::EXACT_ROW_CAP for top-k.
EXACT_PAIRS_ROW_CAP = 20_000

# Task granularity for the exact verifier's pair evaluation: the
# BroadcastNestedLoopJoin evaluates every (a, b) dot product inside the
# STREAM side's tasks, and a cap-sized input is typically one parquet
# row group → ONE task grinding n²/2 zip_with folds while every other
# core idles (r15 job profile: two sequential 0.82 s single-task jobs
# at n=400). The stream side is therefore repartitioned to about one
# task per _EXACT_PAIRS_PER_TASK pairs, clamped to defaultParallelism
# (guide §2: derive the width from the work, not a core-count
# constant; ~10k pairs ≈ 0.1 s of fold work keeps scheduling overhead
# amortized — the r15 spread-width scan's sweet spot).
_EXACT_PAIRS_PER_TASK = 10_000


def _score_cosine_pairs(joined: DataFrame, threshold: float) -> DataFrame:
    """Shared tail of both near-dup scorers: given (id_a, va, na,
    id_b, vb, nb) candidate rows, keep ordered pairs with
    round(cos, 6) >= threshold. ONE copy of the similarity convention
    (rounding digits, NaN policy) for exact and bucketed plans.

    try_divide: 0/0 double division yields NaN, and Spark orders NaN
    ABOVE every number — a zero-norm vector would pass `>= threshold`
    as a spurious near-dup of everything. NULL instead, which the
    threshold filter drops."""
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos_sim",
            F.round(
                F.try_divide(
                    dot(F.col("va"), F.col("vb")),
                    F.col("na") * F.col("nb"),
                ),
                6,
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def pairwise_near_dup(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_exact_rows: int | None = EXACT_PAIRS_ROW_CAP,
    n_rows: int | None = None,
) -> DataFrame:
    """Exact embedding near-duplicate pairs: cosine >= threshold,
    id_a < id_b. Normalizes once per row (norm is computed in the
    projection, not per pair).

    This is the BOUNDED EXACT VERIFIER: the cross join is quadratic, so
    a guard refuses inputs past ``max_exact_rows`` (the probe scans at
    most cap+1 rows, so the guard itself is O(cap)). Corpus-scale
    callers go through ``near_dup_pairs`` below, which routes to the
    cluster-bucketed plan instead; pass ``max_exact_rows=None`` only
    when the caller has already sized the input (and forward its count
    as ``n_rows`` so the fan-out width is still work-derived)."""
    n = n_rows
    if max_exact_rows is not None:
        n = embeddings.limit(max_exact_rows + 1).count()
        if n > max_exact_rows:
            raise ValueError(
                f"pairwise_near_dup input exceeds {max_exact_rows} rows; "
                "use near_dup_pairs() for size-routed execution"
            )
    a = embeddings.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        l2_norm(F.col(vec_col)).alias("na"),
    )
    # Spread the pair evaluation: the nested-loop join computes every
    # dot product in the stream (a) side's tasks — width ≈ pairs /
    # _EXACT_PAIRS_PER_TASK (see constant above). Only widens; a scan
    # already split finer keeps its layout.
    if n is not None and n > 0:
        width = min(
            embeddings.sparkSession.sparkContext.defaultParallelism,
            max(1, (n * n // 2) // _EXACT_PAIRS_PER_TASK + 1),
        )
        if width > 1 and a.rdd.getNumPartitions() < width:
            a = a.repartition(width)
    b = embeddings.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        l2_norm(F.col(vec_col)).alias("nb"),
    )
    return _score_cosine_pairs(a.crossJoin(b), threshold)


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid_vec",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine, ties to
    the smallest centroid id). Broadcast cross join + per-row arg-max —
    the big side never shuffles at scale. A SMALL corpus (one parquet
    row group) is first fanned out by the size-derived width
    (dedup.spread_small_input — r15: the whole corpus × centroids
    scoring ran as ONE 1.2 s task at sf0.1 while 31 cores idled; at
    real scale the scan already has ≥ parallelism splits and the
    fan-out is a no-op)."""
    from andb_spark.operators.dedup import spread_small_input

    scored = (
        spread_small_input(embeddings).crossJoin(F.broadcast(centroids))
        .withColumn(
            "cos_sim",
            F.round(
                cosine_similarity(F.col(vec_col), F.col(centroid_vec_col)), 6
            ),
        )
        .select(id_col, centroid_id_col, "cos_sim")
    )
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("cos_sim"), (-F.col(centroid_id_col)).alias("neg_cid")))
        .alias("best")
    )
    return best.select(
        id_col,
        (-F.col("best.neg_cid")).cast("int").alias(centroid_id_col),
        F.col("best.cos_sim").alias("centroid_sim"),
    )


def kmeans(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd's k-means over an embedding column — the
    iterative-algorithm pattern (genuinely non-SQL-expressible; the
    driver applies its rows-only check).

    Initialization: the k lowest-id vectors (no RNG → reproducible).
    Per iteration: broadcast the k current centroids (k × dim doubles —
    constant size, the ONLY driver-side data), assign every vector to
    its nearest centroid by cosine, recompute centroids as arithmetic
    means via one groupBy. The corpus is scanned once per iteration and
    never collected; this is exactly MLlib's KMeans dataflow shape.

    Returns (cluster_id, n_members, avg_sim): per-cluster size and mean
    cosine similarity to the final centroid, rounded for stability.

    Empty-cluster behavior: a cluster that attracts no members during
    an iteration (possible when seed vectors are duplicates — ties go
    to the lower id) is DROPPED, so the output can have fewer than k
    rows. This is standard Lloyd's behavior without re-seeding; pass
    distinct seeds (dedup the corpus first) when exactly k clusters
    matter."""
    cents: list[tuple[int, list[float]]] = [
        (i, [float(x) for x in r[0]])
        for i, r in enumerate(
            embeddings.orderBy(id_col).select(vec_col).limit(k).collect()
        )
    ]

    def centroid_df():
        spark = embeddings.sparkSession
        return spark.createDataFrame(
            [(cid, vec) for cid, vec in cents],
            f"centroid_id int, centroid_vec array<double>",
        )

    def assign():
        return ivf_assign(
            embeddings, F.broadcast(centroid_df()), id_col, vec_col
        )

    for _ in range(iterations):
        assigned = assign().select(id_col, "centroid_id")
        joined = embeddings.join(assigned, id_col)
        # mean vector per cluster: positional explode + groupBy(cid, pos)
        exploded = joined.select(
            "centroid_id", F.posexplode(vec_col).alias("pos", "v")
        )
        means = (
            exploded.groupBy("centroid_id", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "centroid_id",
                F.transform("pm", lambda s: s["m"]).alias("centroid_vec"),
            )
            .collect()
        )
        cents = [
            (r["centroid_id"], [float(x) for x in r["centroid_vec"]])
            for r in sorted(means, key=lambda r: r["centroid_id"])
        ]

    final = assign()
    return (
        final.groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.avg("centroid_sim"), 6).alias("avg_sim"),
        )
        .withColumnRenamed("centroid_id", "cluster_id")
        .orderBy("cluster_id")
    )


def bucketed_near_dup(
    embeddings: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid_vec",
) -> DataFrame:
    """Embedding near-duplicate pairs with the quadratic term pruned by
    clustering: vectors are IVF-assigned to centroids, pairs are scored
    only within a cluster. The n² cross join becomes sum over clusters
    of |cluster|² — with balanced clusters, a 1/n_centroids fraction of
    the work, and the self-join shuffles on centroid_id instead of
    replicating the table. Approximate by construction: a near-dup pair
    split across two clusters is missed (the LSH/IVF recall trade)."""
    assigned = embeddings.join(
        ivf_assign(
            embeddings, centroids, id_col, vec_col, centroid_id_col,
            centroid_vec_col,
        ).select(id_col, centroid_id_col),
        id_col,
    )
    a = assigned.select(
        F.col(centroid_id_col),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        l2_norm(F.col(vec_col)).alias("na"),
    )
    b = assigned.select(
        F.col(centroid_id_col),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        l2_norm(F.col(vec_col)).alias("nb"),
    )
    return _score_cosine_pairs(a.join(b, centroid_id_col), threshold)


def near_dup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "auto",
    stats: dict | None = None,
    exact_row_cap: int = EXACT_PAIRS_ROW_CAP,
    n_centroids: int | None = None,
) -> tuple[DataFrame, str]:
    """Size-routed near-duplicate pairs — the pairwise analog of
    plans/ann.py::choose_topk_path. Returns (pairs_df, path_taken).

    ``auto`` picks the exact all-pairs verifier while n² work is cheaper
    than the bucketed plan's extra assignment shuffle (n ≤ cap), and the
    IVF-bucketed plan past it — so the quadratic cross join is never
    reachable from a corpus-scale input. Row count comes from ANALYZE
    statistics when present; otherwise a capped probe scan (reads at
    most cap+1 rows, never the full table). Centroids default to
    ~sqrt(n) vectors taken deterministically by lowest id — at 100 TB
    you'd feed k-means centroids (operators/similarity.py::kmeans), the
    plan shape is identical."""
    if mode not in ("exact", "bucketed", "auto"):
        raise ValueError(f"mode must be exact|bucketed|auto, got {mode!r}")
    rows = (stats or {}).get("rows")
    if mode == "auto" and rows is None:
        rows = embeddings.limit(exact_row_cap + 1).count()
        if rows > exact_row_cap:
            # The capped probe only proves "bigger than the cap" — sizing
            # centroids from it would pin k at sqrt(cap) for EVERY large
            # corpus (1B rows -> 141 clusters of ~7M -> quadratic
            # in-cluster blowup). A real count is one metadata-only job
            # on parquet (footer row counts, no data read).
            rows = embeddings.count()
    elif mode == "bucketed" and rows is None and n_centroids is None:
        # explicit bucketed mode without stats or an explicit k needs
        # the same real count — falling back to sqrt(cap) centroids
        # would re-create the quadratic in-cluster blowup above
        rows = embeddings.count()
    if mode == "exact" or (mode == "auto" and rows <= exact_row_cap):
        return (
            pairwise_near_dup(
                embeddings, threshold, id_col, vec_col,
                max_exact_rows=None, n_rows=rows,
            ),
            "exact",
        )
    k = n_centroids or max(16, min(4096, int((rows or exact_row_cap) ** 0.5)))
    # Centroid ids are SEQUENTIAL (row_number over the k-row seed set,
    # a bounded window), not the seed vectors' own ids: casting a
    # snowflake-style bigint vec_id to int would wrap past 2^31 and
    # silently merge two centroids into one bucket.
    from pyspark.sql.window import Window

    centroids = (
        embeddings.orderBy(id_col)
        .limit(k)
        .withColumn(
            "centroid_id",
            F.row_number().over(Window.orderBy(id_col)).cast("int"),
        )
        .select("centroid_id", F.col(vec_col).alias("centroid_vec"))
    )
    return (
        bucketed_near_dup(
            embeddings, centroids, threshold, id_col=id_col, vec_col=vec_col
        ),
        "bucketed",
    )


def sign_bucket(vec: Column | str, bits: int = 4) -> Column:
    """Sign-LSH bucket of a vector: one char per leading component,
    '1' if the component is >= 0 else '0'. Axis-aligned random-hyperplane
    LSH for cosine similarity (the hyperplanes are the first ``bits``
    coordinate planes — deterministic, so the DuckDB oracle can state
    the identical rule). Pure per-row expression: computing it is
    shuffle-free, and at scale the table is WRITTEN bucketed/partitioned
    by this column so a probe reads only the matching buckets
    (layout-as-index, the same design as SCALE.md §3.1)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    # try_element_at, not element_at: the vector type is variable-
    # length (reference catalog/type.py:237-280), and under ANSI a
    # corpus vector shorter than ``bits`` would abort the whole query
    # instead of degrading that row to the '0' branch
    return F.concat(
        *[
            F.when(
                F.try_element_at(v, F.lit(i)) >= 0, F.lit("1")
            ).otherwise(F.lit("0"))
            for i in range(1, bits + 1)
        ]
    )


def signlsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int,
    bits: int = 4,
    max_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """ANN top-k via sign-LSH bucketing (the LSH-bucketed alternative to
    ``ivf_topk``): candidates are vectors whose bucket is within
    ``max_hamming`` bits of the query's bucket; exact cosine rank within
    the candidate set. Approximate by construction — a true neighbor on
    the far side of >max_hamming hyperplanes is missed.

    The candidate predicate is a plain scan filter (no centroid table,
    no join, no shuffle); with a bucket-partitioned layout it becomes
    partition pruning and the scan touches bits+1 of 2^bits buckets."""
    if len(query_vec) < bits:
        raise ValueError(
            f"query_vec has {len(query_vec)} components < bits={bits}"
            " — the sign bucket needs one hyperplane sign per bit"
        )
    qb = "".join("1" if float(v) >= 0.0 else "0" for v in query_vec[:bits])
    b = sign_bucket(F.col(vec_col), bits)
    hamming = None
    for i in range(1, bits + 1):
        term = (F.substring(b, i, 1) != F.lit(qb[i - 1])).cast("int")
        hamming = term if hamming is None else hamming + term
    cand = embeddings.filter(hamming <= max_hamming)
    if exclude_id is not None:
        cand = cand.filter(F.col(id_col) != exclude_id)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        cand.select(
            F.col(id_col),
            F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_topk(
    embeddings: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid_vec",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """ANN top-k: probe only the nprobe centroids nearest the query,
    then exact-rank within those clusters. Approximate by construction
    (recall < 1 when the true neighbor lives in an unprobed cluster).

    ``assigned``: pass the precomputed (id, centroid_id) assignment
    table (the IVF index build step — ``ivf_assign`` once, or the
    streaming-maintained table from stream_ivf_ingest) to amortize it:
    without it every call re-scores the whole corpus against every
    centroid, which is index CONSTRUCTION cost paid per query."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    probe_ids = [
        r[0]
        for r in centroids.select(
            centroid_id_col,
            cosine_similarity(F.col(centroid_vec_col), q).alias("s"),
        )
        .orderBy(F.col("s").desc(), F.col(centroid_id_col))
        .limit(nprobe)
        .collect()
    ]
    if assigned is None:
        assigned = ivf_assign(
            embeddings, centroids, id_col, vec_col, centroid_id_col,
            centroid_vec_col,
        )
    probed = embeddings.join(
        assigned.filter(F.col(centroid_id_col).isin(probe_ids)).select(id_col),
        id_col,
    )
    return (
        probed.select(
            F.col(id_col),
            F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def rerank_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int,
    coarse_dims: int = 16,
    coarse_k: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Two-stage coarse-to-fine ANN (Matryoshka-style truncated-dim
    retrieval): stage 1 ranks by dot product over only the LEADING
    ``coarse_dims`` components and keeps ``coarse_k`` candidates
    (TakeOrdered — never a full sort); stage 2 computes the exact
    full-dimension cosine for those candidates and returns the top k.

    Scale shape: stage 1 is the only corpus-sized pass and does
    dims/coarse_dims× less arithmetic (at rest, store the prefix as its
    own narrow column — or its int8-quantized form — so the scan reads
    a fraction of the vector bytes); stage 2 touches ``coarse_k`` rows
    regardless of corpus size. Deterministic by (rounded score, id)
    ordering on both stages."""
    qc = F.array(*[F.lit(float(v)) for v in query_vec[:coarse_dims]])
    qf = F.array(*[F.lit(float(v)) for v in query_vec])
    df = embeddings
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    prefix = F.slice(F.col(vec_col), 1, coarse_dims)
    cand = (
        df.select(
            id_col,
            vec_col,
            F.round(dot(prefix, qc), 6).alias("coarse_score"),
        )
        .orderBy(F.col("coarse_score").desc(), F.col(id_col))
        .limit(coarse_k)
    )
    return (
        cand.select(
            F.col(id_col),
            F.col("coarse_score"),
            F.round(cosine_similarity(F.col(vec_col), qf), 6).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Product Quantization (PQ) — the fourth member of the ANN quartet
# (brute-force / IVF / sign-LSH / PQ). Jégou et al. 2011, "Product
# Quantization for Nearest Neighbor Search": split each vector into m
# subvectors, k-means each subspace to k centroids, store each vector
# as m small codes; answer queries by Asymmetric Distance Computation
# (ADC) — a per-query lookup table of query↔centroid distances, so the
# corpus-side cost per row is m table lookups instead of d multiplies,
# and the at-rest footprint is m bytes instead of d floats (16× for
# 64-dim float32 at m=8/k=16).
#
# Scale shape: training collects a BOUNDED id-ordered sample (the
# standard practice — codebooks generalize), encode is a pure per-row
# Catalyst expression (no shuffle, no Python), and search broadcasts
# the m×k ADC table as a literal — the corpus never shuffles and the
# only driver data is O(sample·d + m·k).


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 512,
) -> list[list[list[float]]]:
    """Train PQ codebooks[m][k][d/m] by deterministic per-subspace
    Lloyd's k-means over the ``sample`` lowest-id vectors (no RNG:
    init = first k sample rows, ties stable)."""
    import numpy as np

    rows = (
        embeddings.orderBy(id_col).select(vec_col).limit(sample).collect()
    )
    X = np.array([r[0] for r in rows], dtype=np.float64)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dims {d} not divisible by m={m}")
    sub = d // m
    books: list[list[list[float]]] = []
    for j in range(m):
        S = X[:, j * sub: (j + 1) * sub]
        C = S[:k].copy()
        for _ in range(iterations):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    C[c] = S[mask].mean(0)
        books.append([[float(x) for x in c] for c in C])
    return books


def _pq_sqdist(vec_slice: Column, centroid: list[float]) -> Column:
    cv = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(vec_slice, cv, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — per subspace, the index of the nearest
    codebook centroid. Pure Catalyst expressions (centroids are
    literals): per-row map work, zero shuffle, zero Python."""
    sub = len(codebooks[0][0])
    code_cols = []
    for j, book in enumerate(codebooks):
        sl = F.slice(F.col(vec_col), j * sub + 1, sub)
        dists = F.array(*[_pq_sqdist(sl, c) for c in book])
        code_cols.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
    return embeddings.select(
        F.col(id_col), F.array(*code_cols).alias("codes")
    )


def pq_topk(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """ADC top-k: approx_dist(id) = Σ_j LUT[j][codes[j]] where LUT is
    the per-query table of squared distances from each query subvector
    to each centroid — computed driver-side (m×k doubles) and inlined
    as a literal. Per corpus row: m array lookups + m adds, inside
    whole-stage codegen. Returns (id, approx_dist) ascending."""
    import numpy as np

    q = np.array(query_vec, dtype=np.float64)
    m = len(codebooks)
    sub = len(codebooks[0][0])
    lut = [
        [
            float(((q[j * sub: (j + 1) * sub] - np.array(c)) ** 2).sum())
            for c in codebooks[j]
        ]
        for j in range(m)
    ]
    lut_col = F.array(
        *[F.array(*[F.lit(v) for v in row]) for row in lut]
    )
    df = embeddings
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    codes = pq_encode(df, codebooks, id_col, vec_col)
    dist = F.aggregate(
        F.zip_with(
            lut_col,
            F.col("codes"),
            lambda row, code: F.element_at(row, code + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        codes.select(
            F.col(id_col), F.round(dist, 6).alias("approx_dist")
        )
        .orderBy(F.col("approx_dist").asc(), F.col(id_col))
        .limit(k)
    )


def pq_rerank_topk(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int,
    candidates: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """The standard ADC + exact-rerank pipeline: PQ distances select
    ``candidates`` ids (the only corpus-sized pass — m lookups/row over
    the code column), then the true cosine is computed for candidates
    alone and the top k returned. Recall is set by the candidate
    multiple, cost by the code scan — the knob every production PQ
    deployment exposes. Measured on the synthetic fixture (near-random
    vectors, the hardest case for a quantizer): recall@10 = 1.0 at
    m=16/k=16/candidates=100."""
    cand = pq_topk(
        embeddings, codebooks, query_vec, candidates,
        id_col, vec_col, exclude_id,
    )
    qf = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        embeddings.join(F.broadcast(cand.select(id_col)), id_col)
        .select(
            F.col(id_col),
            F.round(cosine_similarity(F.col(vec_col), qf), 6).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )
