"""Distributed fixed-point k-means — the centroid TRAINER the ANN/IVF
family references.

``similarity.ivf_topk`` and ``similarity.semdedup`` partition the
corpus into Voronoi cells around centroid vectors and document that at
100 TB "you train centroids on a sample once and broadcast them"; this
module is that trainer. Lloyd's algorithm, deterministic init (the
first ``n_cells`` vectors by id), a fixed iteration count — the
offline batch job whose output is the small broadcast dimension every
downstream assignment joins against.

Determinism is the design constraint, exactly as in
``linkgraph.pagerank``: every quantity is INTEGER. Vector components
are quantized once to micro-units (``round(x * 1e6)`` as long);
distances are exact long sums of squared integer differences
(dim 64 x (2e6)^2 = 2.6e14 << 2^63); centroid updates are associative
long sums followed by an explicitly toward-zero integer division
(negative sums spelled out as ``-((-s) div n)`` so Spark's ``div``
and DuckDB's ``//`` cannot disagree). The result is independent of
partitioning and execution order, which is what lets the DuckDB
oracle hash-match the trained centroids exactly — float k-means
never would.

Scale design (100 TB corpus, n_cells up to ~2^16):
- centroids are a tiny dimension: broadcast into every assignment
  join, so assignment is map-side — zero shuffle on the corpus;
- per-point argmin is an associative ``min(struct(d2, cid, qv))``
  groupBy — no window over the corpus, a cell attracting the whole
  corpus costs nothing extra;
- the update step shuffles only (cid, dim_index, component) triples:
  map-side combine collapses each partition to at most
  n_cells x dim rows before the exchange, regardless of corpus size;
- empty cells deterministically KEEP their previous centroid (left
  join + coalesce) — the standard Lloyd fallback, never a
  data-dependent reseed;
- each iteration's centroid relation is persisted (so lineage stays
  one iteration deep, never a 20-deep recompute chain); a train call
  pins at most ``iterations`` n_cells-row relations, all released at
  the next train call via the module cache.

Centroid init convention: the vectors whose ids are 0..n_cells-1 (the
deterministic convention shared with the ``similarity`` ANN family and
every oracle). An id space that does not contain 0..n_cells-1 must be
densified first — ids above the range train fewer (or zero) centroids
rather than erroring, the same contract as ``cosine_topk``'s
``id < n_queries`` query selection.

Distance is squared Euclidean (classic Lloyd objective); on the
L2-normalized embeddings the ANN family consumes, L2 ordering and
cosine ordering agree, so these centroids drop straight into
``ivf_topk``-style cosine cell assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000

# bounded cache discipline (same pattern as linkgraph): each train call
# releases the previous call's pinned centroid relations
_ACTIVE_CENT_CACHE: list[DataFrame] = []


def quantize_vectors(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vid, qv): components as micro-unit longs — the one float->int
    boundary; everything downstream is exact integer arithmetic."""
    return emb.select(
        F.col(id_col).cast("long").alias("vid"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * MICRO).cast("long"),
        ).alias("qv"),
    )


def _d2(a, b):
    """Exact squared L2 distance between two long-array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def assign_cells(q: DataFrame, cents: DataFrame) -> DataFrame:
    """(vid, qv, cid, d2): each quantized point's nearest centroid by
    exact integer squared-L2, ties broken on cid ascending. ``cents``
    is (cid, cv) and is broadcast — assignment is map-side (the
    n_cells-way compare) plus ONE associative min(struct) groupBy."""
    scored = q.join(F.broadcast(cents)).withColumn(
        "d2", _d2(F.col("qv"), F.col("cv"))
    )
    best = scored.groupBy("vid").agg(
        F.min(F.struct("d2", "cid", "qv")).alias("b")
    )
    return best.select(
        "vid",
        F.col("b.qv").alias("qv"),
        F.col("b.cid").alias("cid"),
        F.col("b.d2").alias("d2"),
    )


def _train(q: DataFrame, n_cells: int, iterations: int) -> DataFrame:
    """The Lloyd loop over quantized points: returns the trained
    (cid, cv) centroid relation, persisted."""
    while _ACTIVE_CENT_CACHE:
        _ACTIVE_CENT_CACHE.pop().unpersist(blocking=False)
    cents = q.filter(F.col("vid") < n_cells).select(
        F.col("vid").alias("cid"), F.col("qv").alias("cv")
    )
    for _ in range(iterations):
        assigned = assign_cells(q, cents)
        upd = (
            assigned.select("cid", F.posexplode("qv").alias("i", "v"))
            .groupBy("cid", "i")
            .agg(
                F.sum("v").cast("long").alias("s"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
            .select(
                "cid",
                "i",
                # toward-zero integer division, negative sums included
                F.when(F.col("s") < 0, -F.expr("(-s) div n"))
                .otherwise(F.expr("s div n"))
                .cast("long")
                .alias("comp"),
            )
        )
        newc = upd.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "comp"))),
                lambda st: st["comp"],
            ).alias("ncv")
        )
        cents = (
            cents.join(newc, "cid", "left")
            .select("cid", F.coalesce("ncv", "cv").alias("cv"))
            .persist()
        )
        _ACTIVE_CENT_CACHE.append(cents)
    return cents


def kmeans_train(
    emb: DataFrame,
    n_cells: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train ``n_cells`` centroids with ``iterations`` Lloyd rounds and
    return the per-cell rollup under the FINAL assignment:
    (cid, n_assigned, inertia, centroid) — inertia the exact long sum
    of squared distances within the cell, centroid the comma-joined
    micro-unit components (the canonical engine-portable string form,
    as in ``invindex`` postings). Cells that attracted no points keep
    their init vector and report n_assigned = 0."""
    q = quantize_vectors(emb, id_col, vec_col)
    cents = _train(q, n_cells, iterations)
    roll = assign_cells(q, cents).groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_assigned"),
        F.sum("d2").cast("long").alias("inertia"),
    )
    return cents.join(roll, "cid", "left").select(
        "cid",
        F.coalesce("n_assigned", F.lit(0)).cast("long").alias("n_assigned"),
        F.coalesce("inertia", F.lit(0)).cast("long").alias("inertia"),
        F.concat_ws(
            ",", F.transform(F.col("cv"), lambda x: x.cast("string"))
        ).alias("centroid"),
    )


def kmeans_assignments(
    emb: DataFrame,
    n_cells: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vid, cid, d2): the final per-point assignment under the same
    training run — the relation ``ivf_topk``-style consumers join the
    corpus against."""
    q = quantize_vectors(emb, id_col, vec_col)
    cents = _train(q, n_cells, iterations)
    return assign_cells(q, cents).select("vid", "cid", "d2")


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al., TPAMI 2011) — the memory-bound ANN
# scale path: vectors compressed to m byte codes, distances computed
# against a per-query lookup table instead of the raw floats.
# ---------------------------------------------------------------------------
#
# At 100 TB the brute/LSH/IVF family still materializes float vectors
# (256 B/vec at dim 64); PQ stores m codes (4 B at m=4) plus one tiny
# (m x k x subdim) codebook — a 64x corpus-memory reduction that turns a
# disk-bound scan into an in-memory one. Training reuses the integer
# Lloyd arithmetic of ``kmeans_train`` verbatim, just keyed by
# (subspace, cid): the m per-subspace problems are disjoint, so ONE
# shuffled aggregation trains all m codebooks at once — never m
# sequential jobs. Encoding and ADC scoring are broadcast map-side
# joins (the codebook/LUT is m*k rows), zero corpus shuffle.


def _sub_table(q: DataFrame, m: int) -> DataFrame:
    """(vid, sub, sv): each quantized vector split into ``m`` contiguous
    equal subvectors. Dims are data-derived (size(qv) div m) so the
    operator never reads the corpus driver-side; a dim not divisible by
    m silently truncates the tail, as the classic PQ construction
    pads/crops to a multiple of m."""
    return q.select(
        "vid",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        "qv",
    ).select(
        "vid",
        "sub",
        F.expr(
            f"slice(qv, sub * (size(qv) div {m}) + 1, size(qv) div {m})"
        ).alias("sv"),
    )


def _pq_assign(sv: DataFrame, cents: DataFrame) -> DataFrame:
    """(vid, sub, cid, d2, sv): nearest codebook entry per subvector,
    ties broken cid-ascending — broadcast join + one min(struct)
    groupBy, same shape as :func:`assign_cells`."""
    scored = sv.join(F.broadcast(cents), "sub").withColumn(
        "d2", _d2(F.col("sv"), F.col("cv"))
    )
    best = scored.groupBy("vid", "sub").agg(
        F.min(F.struct("d2", "cid", "sv")).alias("b")
    )
    return best.select(
        "vid",
        "sub",
        F.col("b.cid").alias("cid"),
        F.col("b.d2").alias("d2"),
        F.col("b.sv").alias("sv"),
    )


def _pq_train(q: DataFrame, m: int, k: int, iterations: int) -> DataFrame:
    """Lloyd loop over all m subspaces at once, keyed (sub, cid):
    returns the trained (sub, cid, cv) codebook, persisted. Identical
    integer contract to :func:`_train` (micro-quantized inputs, exact
    long squared-L2, toward-zero division, empty-entry keep), and the
    same bounded-cache discipline: the previous train call's pinned
    relations are released on entry."""
    while _ACTIVE_CENT_CACHE:
        _ACTIVE_CENT_CACHE.pop().unpersist(blocking=False)
    sv = _sub_table(q, m)
    cents = sv.filter(F.col("vid") < k).select(
        "sub", F.col("vid").alias("cid"), F.col("sv").alias("cv")
    )
    for _ in range(iterations):
        assigned = _pq_assign(sv, cents)
        upd = (
            assigned.select("sub", "cid", F.posexplode("sv").alias("i", "v"))
            .groupBy("sub", "cid", "i")
            .agg(
                F.sum("v").cast("long").alias("s"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
            .select(
                "sub",
                "cid",
                "i",
                F.when(F.col("s") < 0, -F.expr("(-s) div n"))
                .otherwise(F.expr("s div n"))
                .cast("long")
                .alias("comp"),
            )
        )
        newc = upd.groupBy("sub", "cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "comp"))),
                lambda st: st["comp"],
            ).alias("ncv")
        )
        cents = (
            cents.join(newc, ["sub", "cid"], "left")
            .select("sub", "cid", F.coalesce("ncv", "cv").alias("cv"))
            .persist()
        )
        _ACTIVE_CENT_CACHE.append(cents)
    return cents


def pq_codes(
    emb: DataFrame,
    m: int = 4,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train an (m x k) product-quantization codebook and encode the
    corpus under it: (vid, codes, qerr) — ``codes`` the comma-joined
    per-subspace centroid ids in subspace order (the engine-portable
    string form, 4 B/vector at m=4 in a binary layout), ``qerr`` the
    exact long total quantization error (the reconstruction-quality
    audit column). All-integer end to end, so the oracle reproduces
    the trained codebook AND every code assignment."""
    q = quantize_vectors(emb, id_col, vec_col)
    cents = _pq_train(q, m, k, iterations)
    return encode_with_codebook(emb, cents, m, id_col, vec_col)


def train_codebook(
    emb: DataFrame,
    m: int = 4,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The trained (sub, cid, cv) codebook relation itself — the small
    broadcast dimension a production deployment trains ONCE on a seed
    sample, freezes, and ships to every encoder (batch or streaming).
    ``cv`` components are micro-unit longs."""
    return _pq_train(quantize_vectors(emb, id_col, vec_col), m, k, iterations)


def encode_with_codebook(
    emb: DataFrame,
    cents: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vid, codes, qerr) under a FROZEN (sub, cid, cv) codebook —
    pure map-side work (broadcast codebook join + min(struct) argmin +
    per-vid rollup), no training, so it drops into a streaming
    foreachBatch unchanged."""
    q = quantize_vectors(emb, id_col, vec_col)
    a = _pq_assign(_sub_table(q, m), cents)
    return a.groupBy("vid").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("sub", F.col("cid")))
                ),
                lambda st: st["cid"].cast("string"),
            ),
        ).alias("codes"),
        F.sum("d2").cast("long").alias("qerr"),
    )


def pq_adc_topk(
    emb: DataFrame,
    query_vid: int = 0,
    topk: int = 10,
    m: int = 4,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k (ADC, Jégou et al. 2011 §IV): the
    query stays a full vector, the corpus stays codes; distance =
    sum over subspaces of LUT[sub][code], where the LUT is the m*k
    table of exact squared-L2 distances from the query's subvectors to
    the codebook. Returns (vid, ad2) for the ``topk`` nearest non-query
    vectors, ties broken vid-ascending.

    Scale: the LUT is m*k rows — broadcast; scoring is one map-side
    join on the encoded corpus + a groupBy(vid) sum + TakeOrdered
    (no global sort materialization). The corpus never re-reads its
    float vectors: this is the plan that survives when the vectors
    no longer fit the cluster's memory."""
    q = quantize_vectors(emb, id_col, vec_col)
    cents = _pq_train(q, m, k, iterations)
    a = _pq_assign(_sub_table(q, m), cents)
    qsv = _sub_table(q.filter(F.col("vid") == query_vid), m).select(
        "sub", F.col("sv").alias("qsv")
    )
    lut = cents.join(F.broadcast(qsv), "sub").select(
        "sub", "cid", _d2(F.col("qsv"), F.col("cv")).alias("ld2")
    )
    return (
        a.select("vid", "sub", "cid")
        .filter(F.col("vid") != query_vid)
        .join(F.broadcast(lut), ["sub", "cid"])
        .groupBy("vid")
        .agg(F.sum("ld2").cast("long").alias("ad2"))
        .orderBy("ad2", "vid")
        .limit(topk)
    )


def pq_adc_batch(
    emb: DataFrame,
    n_queries: int = 10,
    topk: int = 5,
    m: int = 4,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch ADC: (q, vid, ad2, rank) for every query vid < n_queries —
    the form recall measurement and batch serving use. The LUT is
    n_queries * m * k rows (still a broadcast dimension); scoring is
    one map-side join on the encoded corpus + a (q, vid) sum + a
    per-query rank window bounded by n_queries * corpus rows, the same
    shape as the other ANN batch scorers."""
    from pyspark.sql import Window

    q = quantize_vectors(emb, id_col, vec_col)
    cents = _pq_train(q, m, k, iterations)
    a = _pq_assign(_sub_table(q, m), cents)
    qsv = _sub_table(q.filter(F.col("vid") < n_queries), m).select(
        F.col("vid").alias("q"), "sub", F.col("sv").alias("qsv")
    )
    lut = cents.join(F.broadcast(qsv), "sub").select(
        "q", "sub", "cid", _d2(F.col("qsv"), F.col("cv")).alias("ld2")
    )
    scored = (
        a.select("vid", "sub", "cid")
        .join(F.broadcast(lut), ["sub", "cid"])
        .filter(F.col("vid") != F.col("q"))
        .groupBy("q", "vid")
        .agg(F.sum("ld2").cast("long").alias("ad2"))
    )
    w = Window.partitionBy("q").orderBy("ad2", "vid")
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= topk
    )


def pq_rerank_batch(
    emb: DataFrame,
    n_queries: int = 10,
    topk: int = 5,
    n_candidates: int = 50,
    m: int = 4,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN serving (the production IVFADC+rerank layout,
    Jégou et al. 2011 §V): stage 1 shortlists ``n_candidates`` per
    query by ADC over the 4-byte codes (no float reads), stage 2
    re-scores ONLY the shortlist against the full quantized vectors
    with exact integer squared-L2 and returns the top ``topk``.
    Returns (q, vid, d2, rank), ties broken vid-ascending.

    Scale: stage 2 touches n_queries * n_candidates vectors total —
    the full-precision reads are bounded by the shortlist, never the
    corpus, which is what lets the corpus stay as codes on disk."""
    from pyspark.sql import Window

    q = quantize_vectors(emb, id_col, vec_col)
    cand = pq_adc_batch(
        emb, n_queries=n_queries, topk=n_candidates,
        m=m, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col,
    ).select("q", "vid")
    qv = q.filter(F.col("vid") < n_queries).select(
        F.col("vid").alias("q"), F.col("qv").alias("query_qv")
    )
    exact = (
        cand.join(q, "vid")
        .join(F.broadcast(qv), "q")
        .select("q", "vid", _d2(F.col("qv"), F.col("query_qv")).alias("d2"))
    )
    w = Window.partitionBy("q").orderBy("d2", "vid")
    return exact.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= topk
    )


def kmeans_centroids(
    emb: DataFrame,
    n_cells: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The raw trained (cid, cv) centroid relation, cv in micro-unit
    longs — the broadcast dimension downstream cell families consume."""
    return _train(quantize_vectors(emb, id_col, vec_col), n_cells, iterations)


def centroids_as_float(cents: DataFrame) -> DataFrame:
    """(cid, cv) with components back in float units (micro-longs /
    1e6 as double — exact IEEE division of an integer < 2^53, so Spark
    and DuckDB produce bit-identical doubles): the form float-space
    consumers like ``similarity.ivf_topk(centroids=...)`` take."""
    return cents.select(
        "cid",
        F.transform(
            F.col("cv"), lambda x: x.cast("double") / F.lit(1000000.0)
        ).alias("cv"),
    )
