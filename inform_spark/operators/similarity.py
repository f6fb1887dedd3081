"""Similarity search over an embedding column (array<float>).

Two paths, same results contract:

- ``cosine_topk``          — exact brute force: broadcast the (small) query
                             set against the corpus, dot products via native
                             ``aggregate``/``zip_with`` (JVM-side, no UDF),
                             per-query top-k via ranking window.
- ``lsh_bucketed_topk``    — scale path: random-hyperplane LSH buckets the
                             corpus so each query only scans its bucket(s).
                             Recall < 1 by design; the test asserts recall
                             against the brute-force oracle on the fixture.

At 100 TB the brute-force path is a broadcast-join map-side scan (no
shuffle; ideal), and the LSH path turns top-k into a bucketed join —
both avoid any O(corpus x queries) shuffle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    # products in DOUBLE (not float) so the DuckDB oracle — which casts the
    # float[] to double[] — computes bit-identical sums in the same order
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def _cos(a, b, na, nb):
    """round-6 cosine from precomputed per-vector norms: norms are
    O(dim) aggregates, so computing them once per vector in the join
    projections — instead of once per PAIR inside the join — turns the
    hot pair paths from O(pairs * dim) extra work into O(vectors * dim),
    with bit-identical results (same expression, same rounding)."""
    return F.round(_dot(a, b) / (F.col(na) * F.col(nb)), 6)


def _topk(scored: DataFrame, k: int) -> DataFrame:
    """Shared (q, neighbor, cosine, rank) epilogue: per-query ranking
    window, deterministic (cosine DESC, neighbor ASC) tie-break."""
    w = Window.partitionBy("q").orderBy(F.desc("cosine"), F.asc("neighbor"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q").cast("long").alias("q"),
            F.col("neighbor").cast("long").alias("neighbor"),
            "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def cosine_topk(
    emb: DataFrame, n_queries: int = 10, k: int = 5, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for the first ``n_queries`` vectors.
    Returns (q, neighbor, cosine, rank), deterministic tie-break on id."""
    queries = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("q"), F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    corpus = emb.select(
        F.col(id_col).alias("neighbor"), F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        corpus.join(F.broadcast(queries))
        .filter(F.col("neighbor") != F.col("q"))
        .withColumn("cosine", _cos("qv", "cv", "qn", "cn"))
    )
    return _topk(scored, k)


def embedding_neardup_topk(
    emb: DataFrame,
    per_group: int = 3,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate candidates: the ``per_group`` closest
    pairs within each group (pre-bucketed by ``group_col`` — at scale the
    bucket is an LSH/IVF cell, here the provided label). Group-scoped
    self-join keeps the pair space O(Σ bucket²), never corpus²; ranking
    window per group, deterministic tie-break on (a, b)."""
    l = emb.select(
        F.col(group_col).alias("g"), F.col(id_col).alias("a"),
        F.col(vec_col).alias("va"), _norm(F.col(vec_col)).alias("na"),
    )
    r = emb.select(
        F.col(group_col).alias("g"), F.col(id_col).alias("b"),
        F.col(vec_col).alias("vb"), _norm(F.col(vec_col)).alias("nb"),
    )
    pairs = (
        l.join(r, "g")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cosine", _cos("va", "vb", "na", "nb"))
    )
    w = Window.partitionBy("g").orderBy(F.desc("cosine"), "a", "b")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_group)
        .select(
            # g keeps the caller's group type — an int cast would null
            # out string bucket keys (LSH band keys) the docstring invites
            "g",
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(np.float64)


def _bucket_col(vec_col, planes: np.ndarray):
    """Sign-pattern bucket id from n_planes fixed hyperplanes — built as a
    native expression tree (dot product per plane via aggregate/zip_with)."""
    bucket = F.lit(0)
    for j, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        d = _dot(F.col(vec_col) if isinstance(vec_col, str) else vec_col, arr)
        bucket = bucket + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def ivf_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) cells — the other classic
    ANN scale path next to LSH: the corpus is partitioned into ``n_cells``
    Voronoi cells around centroid vectors and each query scans only its
    ``n_probe`` closest cells, so candidate count is O(corpus·probe/cells)
    instead of O(corpus).

    Default centroids are the first ``n_cells`` corpus vectors — a
    deterministic stand-in for an offline k-means. Pass ``centroids``
    (a (cid, cv) relation, e.g. ``clustering.kmeans_centroids`` run
    through ``centroids_as_float``) to use TRAINED cells instead —
    at 100 TB you train on a sample once and broadcast; the assignment /
    probe / rank dataflow is identical either way, and determinism is
    what lets DuckDB oracle-check both paths exactly.

    Plan shape: centroids broadcast twice (corpus assignment + query
    probing — both map-side), candidates form via an equi-join on cell id,
    per-query ranking window. No all-pairs shuffle anywhere."""
    if centroids is not None:
        cents = centroids.select(
            "cid", "cv", _norm(F.col("cv")).alias("ctn")
        )
    else:
        cents = emb.filter(F.col(id_col) < n_cells).select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"),
            _norm(F.col(vec_col)).alias("ctn"),
        )
    corpus = emb.select(
        F.col(id_col).alias("neighbor"), F.col(vec_col).alias("nv"),
        _norm(F.col(vec_col)).alias("nn"),
    )
    # cell assignment: nearest centroid by cosine, tie-break on cid
    ac = (
        corpus.join(F.broadcast(cents))
        .withColumn("ccos", _cos("nv", "cv", "nn", "ctn"))
    )
    wa = Window.partitionBy("neighbor").orderBy(F.desc("ccos"), F.asc("cid"))
    assigned = (
        ac.withColumn("rk", F.row_number().over(wa))
        .filter(F.col("rk") == 1)
        .select("neighbor", "nv", "nn", F.col("cid").alias("cell"))
    )
    # query probes: the n_probe closest cells per query vector
    queries = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("q"), F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    qc = (
        queries.join(F.broadcast(cents))
        .withColumn("ccos", _cos("qv", "cv", "qn", "ctn"))
    )
    wq = Window.partitionBy("q").orderBy(F.desc("ccos"), F.asc("cid"))
    probes = (
        qc.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= n_probe)
        .select("q", "qv", "qn", F.col("cid").alias("cell"))
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor") != F.col("q"))
        .withColumn("cosine", _cos("qv", "nv", "qn", "nn"))
    )
    return _topk(scored, k)


def lsh_bucketed_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: corpus bucketed by hyperplane sign pattern; each
    query scans only its own bucket. (q, neighbor, cosine, rank)."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucketed = emb.withColumn("bucket", _bucket_col(vec_col, planes))
    queries = bucketed.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("q"), F.col(vec_col).alias("qv"), "bucket",
        _norm(F.col(vec_col)).alias("qn"),
    )
    corpus = bucketed.select(
        F.col(id_col).alias("neighbor"), F.col(vec_col).alias("cv"), "bucket",
        _norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        corpus.join(F.broadcast(queries), "bucket")
        .filter(F.col("neighbor") != F.col("q"))
        .withColumn("cosine", _cos("qv", "cv", "qn", "cn"))
    )
    return _topk(scored, k)


def semdedup(
    emb: DataFrame,
    n_cells: int = 8,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    _counters: dict | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication of an embedded corpus — cluster into cells, call
    within-cell pairs with cosine >= ``tau`` semantic duplicates, keep
    ONE survivor per duplicate family: the member FARTHEST from its
    centroid (the paper's criterion — edge examples carry more signal
    than cluster-typical ones), ties broken on vec_id.

    Returns (vec_id, cell, ccos, component, n_members, keep) for every
    input vector: ``ccos`` the cosine to the assigned centroid,
    ``component`` the duplicate-family id (min reachable vec_id;
    singletons are their own family), ``keep`` the survivor flag.

    Centroids are the first ``n_cells`` vectors — the deterministic
    stand-in for an offline k-means (same convention and rationale as
    :func:`ivf_topk`: at 100 TB you train centroids on a sample once and
    broadcast them; the dataflow is identical and determinism is what
    lets DuckDB oracle-check the whole path).

    Scale (100 TB): centroids broadcast (assignment is map-side; the
    per-vector ranking window is bounded at n_cells rows per vector);
    the pair join is scoped to cells, O(sum cell^2) never corpus^2 —
    with SemDeDup-realistic cell counts (~sqrt(corpus)) cells stay small.
    Exact-identical vectors are PRE-COLLAPSED to their min-id
    representative before cell assignment (one groupBy on the vector),
    so the degenerate cell — a boilerplate class of byte-identical
    embeddings — costs O(distinct) in the pair join instead of
    O(copies^2), by construction rather than by user discipline.
    Collapsing is exact, not an approximation: identical vectors have
    identical cosine to every centroid (same cell, same ccos) and
    identical tau-edges, each copy-group's min id IS its representative
    so the component label (min reachable id) is unchanged, and the
    survivor min(struct(ccos, v)) over the fanned-out family is always
    attained at a representative. Components run on the (sparse)
    representative tau-graph only; the survivor pick is an associative
    min(struct) — no global sort, no window over the corpus."""
    from inform_spark.operators.components import connected_components

    cents = emb.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("ctn"),
    )
    members = emb.select(
        F.col(id_col).alias("ov"), F.col(vec_col).alias("ovv")
    )
    # exact-dup pre-collapse: one groupBy on the vector; every copy-group's
    # representative is its min id
    reps = members.groupBy("ovv").agg(F.min("ov").alias("v")).persist()
    corpus = reps.select(
        "v", F.col("ovv").alias("vv"), _norm(F.col("ovv")).alias("vn")
    )
    ac = corpus.join(F.broadcast(cents)).withColumn(
        "ccos", _cos("vv", "cv", "vn", "ctn")
    )
    wa = Window.partitionBy("v").orderBy(F.desc("ccos"), F.asc("cid"))
    assigned = (
        ac.withColumn("rk", F.row_number().over(wa))
        .filter(F.col("rk") == 1)
        .select("v", "vv", "vn", F.col("cid").alias("cell"), "ccos")
        .persist()  # referenced by both pair sides and the final labeling
    )
    l = assigned.select(
        "cell", F.col("v").alias("a"), F.col("vv").alias("va"),
        F.col("vn").alias("na"),
    )
    r = assigned.select(
        "cell", F.col("v").alias("b"), F.col("vv").alias("vb"),
        F.col("vn").alias("nb"),
    )
    pairs = (
        l.join(r, "cell")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos", _cos("va", "vb", "na", "nb"))
        .filter(F.col("cos") >= tau)
        .select("a", "b")
    )
    if _counters is not None:
        # test seam: prove the pair join runs at collapsed cardinality
        _counters["n_input"] = members.count()
        _counters["n_reps"] = reps.count()
        _counters["n_rep_pairs"] = pairs.count()
    comp = connected_components(pairs, "a", "b").select(
        F.col("v").alias("cv_id"), "component"
    )
    labeled = assigned.join(comp, assigned["v"] == comp["cv_id"], "left").select(
        F.col("v").alias("rep"), "cell", "ccos",
        F.coalesce("component", F.col("v")).alias("component"),
    )
    # fan the representative verdicts back out to every exact copy, then
    # localCheckpoint (eager): pins the small (v, cell, ccos, component)
    # relation so the cached assignment and rep frames — which still carry
    # the full embedding vectors — can be dropped instead of leaking for
    # the session lifetime
    rep_map = members.join(
        reps.select("ovv", F.col("v").alias("rep")), "ovv"
    ).select(F.col("ov").alias("v"), "rep")
    full = (
        rep_map.join(labeled, "rep")
        .select("v", "cell", "ccos", "component")
        .localCheckpoint()
    )
    assigned.unpersist()
    reps.unpersist()
    # family stats over the FULL corpus: n_members counts copies, and the
    # survivor min(struct(ccos, v)) is attained at a representative (copies
    # share ccos and have larger ids), matching the uncollapsed semantics
    stats = full.groupBy("component").agg(
        F.min(F.struct(F.col("ccos"), F.col("v"))).alias("pick"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
    )
    return full.join(stats, "component").select(
        F.col("v").cast("long").alias("vec_id"),
        F.col("cell").cast("long").alias("cell"),
        "ccos",
        F.col("component").cast("long").alias("component"),
        "n_members",
        (F.col("v") == F.col("pick.v")).cast("int").alias("keep"),
    )


def contrastive_pairs(
    emb: DataFrame,
    n_queries: int = 10,
    k_pos: int = 2,
    k_neg: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Contrastive training-pair mining over :func:`cosine_topk`: for
    each query, ranks 1..k_pos are ``positive`` examples and ranks
    k_pos+1..k_pos+k_neg are ``hard_negative`` — the top-of-the-ranking
    negatives that contrastive/embedding training (DPR, SimCSE,
    sentence-transformers hard-negative mining) actually wants, rather
    than uniform random negatives a naive sampler would draw.

    Returns (q, neighbor, cosine, rank, role). Same scale shape as the
    exact top-k it composes: broadcast query side, JVM dot products,
    one TakeOrdered per query — swap in ``ivf_topk``/``pq_adc`` upstream
    when the corpus outgrows exact scoring; the ranking contract (and
    therefore this labeling) is unchanged."""
    ranked = cosine_topk(
        emb, n_queries=n_queries, k=k_pos + k_neg,
        id_col=id_col, vec_col=vec_col,
    )
    return ranked.withColumn(
        "role",
        F.when(F.col("rank") <= k_pos, F.lit("positive")).otherwise(
            F.lit("hard_negative")
        ),
    )
