"""Approximate-nearest-neighbor search over an embedding column.

Two tiers:

* brute-force cosine top-k — the exactness baseline. One broadcast of the
  (small) query set against the full vector table; per-partition partial
  top-k via window rank. Linear in corpus size, no n² anywhere.
* sign-LSH bucketed top-k — the 100 TB path. Bucket key = sign bits of the
  first B embedding coordinates (coordinate-hyperplane LSH — deterministic,
  engine-portable: no RNG to keep in sync with the oracle). Probing joins
  only same-bucket vectors: the shuffle is keyed on the 2^B buckets and
  each bucket's candidate set is ~n/2^B. An IVF variant would swap the
  bucket fn for learned centroids; the join shape is identical.

All math is double-precision sequential folds (dedup.cosine) so the DuckDB
oracle agrees to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wikifrontier.dedup import cosine

SIGN_BITS = 6  # 64 buckets


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k of each query over the vector table.

    `queries` (small) is broadcast — the big side never shuffles; ranking
    is a window partitioned by query id over the scored rows.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"))
    scored = (
        q.crossJoin(v)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def sign_bucket(vec_col, bits: int = SIGN_BITS):
    """Deterministic LSH bucket id: bit i = sign(vec[i]) for the first
    `bits` coordinates."""
    return sum(
        F.when(F.element_at(vec_col, i + 1).cast("double") > 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        for i in range(bits)
    ).cast("int")


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid (max cosine, centroid-id tie-break).

    The centroid table is broadcast (inverted-file lists assume a small
    codebook); at real scale the centroids come from a few distributed
    k-means iterations — here any deterministic small table serves, since
    the *join shape* (broadcast codebook → argmax → partition by list id)
    is the operator under test."""
    v = vectors.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    c = F.broadcast(
        centroids.select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec")
        )
    )
    scored = v.crossJoin(c).select(
        "vid",
        "centroid_id",
        cosine(F.col("vec"), F.col("cvec")).alias("sim"),
    )
    w = Window.partitionBy("vid").orderBy(F.col("sim").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col("vid").alias(id_col), "centroid_id")
    )


KMEANS_SCALE = 1_000_000  # 1e-6 component quantization for exact sums


def kmeans_centroids(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic distributed Lloyd iterations for the IVF codebook.

    * seed codebook: the k lowest-id vectors (closed-form, no RNG);
    * assign: max cosine with centroid-id tie-break (ivf_assign);
    * update: per-dimension mean over each cluster, computed as an EXACT
      integer sum of 1e-6-quantized components — order-independent, so
      the DuckDB oracle replays every iteration bit-identically (a plain
      double sum would drift with aggregation order). Empty clusters keep
      their previous centroid.

    Plan per iteration: broadcast codebook → argmax → posexplode →
    groupBy (centroid, dim) with map-side partial sums → k·d-row codebook
    rebuild. All shuffles are keyed on (centroid_id, dim) — no step is
    proportional to n² at 10^10 vectors, and the codebook stays tiny.
    """
    cents = vectors.filter(F.col(id_col) < k).select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(vec_col),
    )
    for _ in range(iters):
        assign = ivf_assign(vectors, cents, vec_col, id_col)
        exploded = vectors.join(assign, id_col).select(
            "centroid_id", F.posexplode(vec_col).alias("pos", "x")
        )
        q = F.round(F.col("x").cast("double") * KMEANS_SCALE).cast("long")
        means = exploded.groupBy("centroid_id", "pos").agg(
            (F.sum(q).cast("double") / F.count("*") / KMEANS_SCALE).alias("m")
        )
        new = (
            means.groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                F.col("centroid_id").alias(id_col),
                F.transform("pm", lambda s: s["m"]).alias(vec_col),
            )
        )
        cents = new.unionByName(
            cents.join(new.select(id_col), id_col, "left_anti")
        ).localCheckpoint(eager=True)  # k rows; prevents per-use
        # re-evaluation of the nested iteration lineage
    return cents


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN top-k: probe only the query's own inverted list (its
    nearest centroid's vectors). Same output schema as brute_force_topk;
    recall < 1 by design. The candidate join is an equi-join on
    centroid_id — at 10^10 vectors each side shuffles once on a small int
    key, and per-list candidate counts are ~n/|codebook|."""
    assign = ivf_assign(vectors, centroids, vec_col, id_col)
    v = vectors.join(assign, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        "centroid_id",
    )
    q = queries.join(assign, id_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        "centroid_id",
    )
    scored = (
        q.join(v, "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = SIGN_BITS,
) -> DataFrame:
    """ANN top-k probing only the query's own sign-LSH bucket.

    Same output schema as brute_force_topk; recall < 1 by design (that is
    the approximation). The join is an equi-join on bucket — at 10^10
    vectors it shuffles each side once on a small int key instead of
    broadcasting anything.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    scored = (
        q.join(v, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


SEMDEDUP_THRESHOLD = 0.95  # cosine above which same-list vectors are dups


def semantic_dedup(
    vectors: DataFrame,
    centroids: DataFrame,
    threshold: float = SEMDEDUP_THRESHOLD,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    coarse-quantize every embedding to its nearest centroid (ivf_assign's
    broadcast-codebook argmax), then inside each inverted list drop any
    vector that has a LOWER-id neighbor with cosine >= threshold — the
    deterministic "keep one representative per semantic cluster" rule.
    Returns (id, centroid_id, kept) for every input vector.

    Scale shape: pair generation is an equi self-join keyed on
    centroid_id — never all-pairs; k grows with the corpus so per-list
    membership stays bounded (SemDeDup used k=50000 for LAION-440M, lists
    of ~10^4). The duplicate-id set is a DISTINCT projection of ids only
    (embeddings never survive past the cosine), removed via left_anti —
    at any scale the wide vector column moves exactly once, into the
    bucketed join.
    """
    assigned = ivf_assign(vectors, centroids, vec_col, id_col)
    v = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).join(assigned.withColumnRenamed(id_col, "id"), "id")
    lo = v.select(
        F.col("id").alias("id_lo"), "centroid_id", F.col("vec").alias("vec_lo")
    )
    hi = v.select(
        F.col("id").alias("id_hi"), "centroid_id", F.col("vec").alias("vec_hi")
    )
    dup_ids = (
        lo.join(hi, "centroid_id")
        .filter(F.col("id_lo") < F.col("id_hi"))
        .filter(
            F.round(cosine(F.col("vec_lo"), F.col("vec_hi")), 6)
            >= F.lit(threshold)
        )
        .select(F.col("id_hi").alias("id"))
        .distinct()
    )
    return (
        v.join(dup_ids.withColumn("_dup", F.lit(True)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "centroid_id",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("kept"),
        )
    )


def ann_recall(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    codebook_k: int = 8,
    codebook_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN index QA: recall@k of the IVF index (learned codebook,
    single-probe) against the brute-force cosine ground truth — per
    query, how many of the true top-k the approximate path returned.
    This is the evaluation loop an embedding-dedup / similarity-search
    deployment runs before trusting an index at corpus scale (recall
    drops → probe more lists or grow the codebook).

    Both legs reuse the production operators unchanged
    (``brute_force_topk``, ``kmeans_centroids`` → ``ivf_topk``), so the
    measured recall is the deployed path's, not a reimplementation's.
    The overlap join is keyed on (query, neighbor) — counters only; the
    denominator is the per-query ground-truth size (= k except on tiny
    corpora), so recall is exact at any scale.
    """
    truth = brute_force_topk(vectors, queries, k, vec_col, id_col).select(
        "query_id", "neighbor_id"
    )
    cents = kmeans_centroids(
        vectors, k=codebook_k, iters=codebook_iters, vec_col=vec_col, id_col=id_col
    )
    approx = ivf_topk(vectors, queries, cents, k, vec_col, id_col).select(
        "query_id", "neighbor_id"
    )
    hits = (
        truth.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    base = truth.groupBy("query_id").agg(F.count("*").alias("n_truth"))
    return base.join(hits, "query_id", "left").select(
        "query_id",
        F.col("n_truth").cast("long").alias("n_truth"),
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        F.round(
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
            / F.col("n_truth"),
            6,
        ).alias("recall"),
    )


# --- product quantization (PQ) ------------------------------------------------
PQ_M = 4       # subspaces
PQ_K = 8       # codes per subspace codebook
PQ_ITERS = 1   # Lloyd iterations per codebook


def _l2sq(a, b):
    """Squared L2 distance between two array<double> columns — a single
    left-to-right fold (zip_with then aggregate), so the float addition
    order is fixed and DuckDB's list_sum replays it exactly."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_codebooks(
    vectors: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-subspace PQ codebooks → ``(sub, centroid_id, cvec)``.

    Product quantization (Jégou/Douze/Schmid 2011): split the D-dim
    space into m subspaces and k-means each independently — the
    codebook has m·k entries but spans k^m effective cells. Training
    reuses the IVF k-means recipe per subspace (seed = k lowest-id
    vectors' subvectors; argmin L2 with centroid-id tie-break;
    1e-6-quantized exact-integer mean updates, empty clusters keep
    their centroid), so every float is oracle-replayable.

    Scale shape: the m subspaces train over the SAME scan (slice is a
    projection); per iteration each subspace is one broadcast-codebook
    argmin + one (centroid, dim) counter fold. The codebook output is
    m·k rows — always broadcastable.
    """
    d_sub_expr = F.size(F.col(vec_col)) / m  # constant per dataset
    books = []
    for s in range(m):
        sub = vectors.select(
            F.col(id_col),
            F.slice(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                F.lit(s).cast("int") * d_sub_expr.cast("int") + 1,
                d_sub_expr.cast("int"),
            ).alias("svec"),
        )
        cents = sub.filter(F.col(id_col) < k).select(
            F.col(id_col).alias("centroid_id"), F.col("svec").alias("cvec")
        )
        for _ in range(iters):
            assign = _pq_assign(sub, cents, id_col)
            exploded = sub.join(assign, id_col).select(
                "centroid_id", F.posexplode("svec").alias("pos", "x")
            )
            q = F.round(F.col("x") * KMEANS_SCALE).cast("long")
            means = exploded.groupBy("centroid_id", "pos").agg(
                (F.sum(q).cast("double") / F.count("*") / KMEANS_SCALE)
                .alias("mv")
            )
            new = (
                means.groupBy("centroid_id")
                .agg(F.array_sort(F.collect_list(F.struct("pos", "mv")))
                     .alias("pm"))
                .select(
                    "centroid_id",
                    F.transform("pm", lambda st: st["mv"]).alias("cvec"),
                )
            )
            cents = new.unionByName(
                cents.join(new.select("centroid_id"), "centroid_id",
                           "left_anti")
            ).localCheckpoint(eager=True)
        books.append(cents.select(F.lit(s).alias("sub"), "centroid_id",
                                  "cvec"))
    out = books[0]
    for b in books[1:]:
        out = out.unionByName(b)
    return out


def _pq_assign(sub: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """Nearest-centroid (argmin L2, centroid-id tie-break) per vector."""
    scored = sub.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        "centroid_id",
        _l2sq(F.col("svec"), F.col("cvec")).alias("d2"),
    )
    w = Window.partitionBy(id_col).orderBy("d2", "centroid_id")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "centroid_id")
    )


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    m: int = PQ_M,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ compression → ``(vec_id, sub, code)``: each vector stored as m
    small codes (m·log2(k) bits — 64-dim float32 becomes 12 bits here).
    One broadcast join against the m·k codebook + a per-(vector, sub)
    argmin; the full-precision vector dies at this operator's output.
    """
    sliced = vectors.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).select(
        id_col,
        "sub",
        F.slice(
            "v",
            F.col("sub") * (F.size("v") / m).cast("int") + 1,
            (F.size("v") / m).cast("int"),
        ).alias("svec"),
    )
    scored = sliced.join(F.broadcast(codebooks), "sub").select(
        id_col, "sub", "centroid_id",
        _l2sq(F.col("svec"), F.col("cvec")).alias("d2"),
    )
    w = Window.partitionBy(id_col, "sub").orderBy("d2", "centroid_id")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "sub", F.col("centroid_id").alias("code"))
    )


def pq_adc_topk(
    vectors: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    k: int = 10,
    m: int = PQ_M,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes →
    ``(query_id, neighbor_id, adc_d2, rank)``.

    ADC (the PQ paper's query path): precompute, per query, the L2²
    from each query SUBVECTOR to each codebook centroid — an m·k
    distance table per query — then a database vector's approximate
    distance is the sum of m table lookups on its codes; the raw
    vectors are never touched at query time. Per-sub distances are
    1e-6-quantized to longs BEFORE the cross-subspace sum, so the fold
    is an exact integer sum — order-independent at any parallelism,
    bit-replayable by the oracle, and the rank ordering ties out.

    Scale shape: codes shuffle nowhere — the distance table
    (queries × m·k rows) broadcasts onto the code table, and the
    (query, vector) fold is the only exchange. ADC is the
    compressed-domain SCAN (every vector, m integer adds each);
    at 10^10 vectors compose it with the IVF lists (q28) so only the
    probed lists are scanned — both pieces exist in this module.
    """
    codes = pq_encode(vectors, codebooks, m, vec_col, id_col).select(
        F.col(id_col).alias("neighbor_id"), "sub", "code"
    )
    qsub = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).select(
        "query_id",
        "sub",
        F.slice(
            "v",
            F.col("sub") * (F.size("v") / m).cast("int") + 1,
            (F.size("v") / m).cast("int"),
        ).alias("svec"),
    )
    dtable = qsub.join(F.broadcast(codebooks), "sub").select(
        "query_id", "sub",
        F.col("centroid_id").alias("code"),
        F.round(_l2sq(F.col("svec"), F.col("cvec")) * KMEANS_SCALE)
        .cast("long").alias("d2_q"),
    )
    summed = (
        codes.join(F.broadcast(dtable), ["sub", "code"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(
            (F.sum("d2_q").cast("double") / KMEANS_SCALE).alias("adc_raw"),
            F.count("*").alias("_nsub"),
        )
        .filter(F.col("_nsub") == m)  # guard: all m codes present
        .select(
            "query_id", "neighbor_id",
            F.round("adc_raw", 6).alias("adc_d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return summed.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


# --- Johnson-Lindenstrauss projection ----------------------------------------
JL_OUT_DIM = 16


def jl_sign_matrix(in_dim: int, out_dim: int) -> list[int]:
    """Deterministic ±1 Achlioptas matrix, flattened row-major
    (index i·out_dim + j): entry parity comes from sha256("jl:i,j"),
    computed ONCE at plan-build time and embedded as a literal array —
    no per-row hashing, and the entries behave independently (an
    LCG-parity generator tried first had inter-column correlations up
    to 38/64, which quietly destroyed the distance-preservation
    guarantee; sha256 measures ≤18/64). Both engines read the same
    literal, so parity is trivial."""
    import hashlib

    flat = []
    for i in range(in_dim):
        for j in range(out_dim):
            h = hashlib.sha256(f"jl:{i},{j}".encode()).hexdigest()
            flat.append(1 if int(h[0], 16) % 2 == 0 else -1)
    return flat


def jl_project(
    vectors: DataFrame,
    out_dim: int = JL_OUT_DIM,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    in_dim: int = 64,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction → ``(vec_id,
    proj)`` with ``proj`` = array<double> of ``out_dim`` components.

    Achlioptas (2003) database-friendly projection: y_j = Σ_i x_i ·
    s(i,j) / √k with s ∈ {±1} — pairwise distances are preserved within
    1±ε w.h.p., so downstream ANN (q19/q20/q28/q121) runs on k dims
    instead of D. Components are 1e-6-quantized to longs before the
    (vector, j) fold, so the sum is exact-integer — order-independent
    at any parallelism and bit-replayable by the oracle (√16 = 4 keeps
    even the final scale exact).

    Scale shape: posexplode × out_dim literals → one keyed counter fold
    on (vec_id, j) → array rebuild. The projection "matrix" is pure
    arithmetic on (i, j) — nothing is broadcast, nothing collected.
    """
    scale = float(out_dim) ** 0.5
    signs = F.array(*[
        F.lit(v).cast("long") for v in jl_sign_matrix(in_dim, out_dim)
    ])
    comps = vectors.select(
        F.col(id_col),
        F.posexplode(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("i", "x"),
    ).select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(out_dim - 1))).alias("j"),
        (
            F.round(F.col("x") * KMEANS_SCALE).cast("long")
            * F.element_at(
                signs, (F.col("i") * out_dim + F.col("j") + 1).cast("int")
            )
        ).alias("xq"),
    )
    return (
        comps.groupBy(id_col, "j")
        .agg(F.sum("xq").alias("s"))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("j", "s"))).alias("js"))
        .select(
            id_col,
            F.transform(
                "js",
                lambda st: st["s"].cast("double") / KMEANS_SCALE / scale,
            ).alias("proj"),
        )
    )


def jl_distortion(
    vectors: DataFrame,
    out_dim: int = JL_OUT_DIM,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_queries: int = 5,
    cand_mod: int = 25,
) -> DataFrame:
    """Distance-preservation audit → ``(id_a, id_b, d2_orig, d2_proj,
    distortion)`` over a bounded probe set (query ids < n_queries ×
    candidate ids ≡ 0 mod cand_mod, a < b): squared L2 before and after
    projection and their ratio. The acceptance artifact for q123 — a
    production pipeline runs the projection alone and spot-checks
    distortion on a sample exactly like this.
    """
    proj = jl_project(vectors, out_dim, vec_col, id_col)
    both = vectors.join(proj, id_col).select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        "proj",
    )
    a = both.filter(F.col("id") < n_queries).select(
        F.col("id").alias("id_a"), F.col("v").alias("va"),
        F.col("proj").alias("pa"),
    )
    b = both.filter(F.col("id") % cand_mod == 0).select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"),
        F.col("proj").alias("pb"),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(_l2sq(F.col("va"), F.col("vb")), 6).alias("d2_orig"),
            F.round(_l2sq(F.col("pa"), F.col("pb")), 6).alias("d2_proj"),
        )
        # identical-vector pairs are trivially preserved and make the
        # ratio undefined — drop them from the audit
        .filter(F.col("d2_orig") != 0)
        .select(
            "id_a", "id_b", "d2_orig", "d2_proj",
            F.round(F.col("d2_proj") / F.col("d2_orig"), 6)
            .alias("distortion"),
        )
    )
