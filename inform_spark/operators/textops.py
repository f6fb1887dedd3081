"""Training-data pipeline operators over a documents table.

Large-scale corpus hygiene ops, each expressed Spark-first (built-in
functions, no Python in the hot path) and each with a DuckDB-checkable
formulation (see ``__spark_entry__.oracle_sql``):

- exact dedup (hash groupBy)
- MinHash signatures + LSH banding candidate pairs
- SimHash fingerprints
- n-gram Jaccard pairwise similarity
- language ID (stopword-profile heuristic)
- quality scoring (length / punctuation / stopword ratios)
- token counting (whitespace + BPE-ish estimate)
- rolling-hash document fingerprinting

Cross-engine determinism: every hash is ``H60(s) = int(md5(s)[:15], 16)``
— Spark: ``conv(substr(md5(s),1,15),16,10)``, DuckDB:
``cast('0x'||substr(md5(s),1,15) as bigint)`` — so the oracle comparison is
exact, not statistical.

Scale notes: all ops are shuffle-by-key aggregations or explode+groupBy;
pair generation is always LSH/band-bucketed or key-scoped (never an
unbounded cross join); minhash/simhash are one pass over exploded shingles
with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_MINHASH = 8
BAND_SIZE = 2  # 8 hashes -> 4 bands
SHINGLE_W = 3

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "fr": ["le", "la", "de", "et", "les"],
    "de": ["der", "die", "und", "das", "ist"],
}


def _h60(col):
    """60-bit md5-based hash, reproducible in DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hof_let(value, body):
    """Expression-level let-binding for higher-order-function trees:
    evaluate ``value`` ONCE per row and feed it to ``body`` as a lambda
    variable (single-element-array ``transform``). HOFs are interpreted
    — no codegen, no common-subexpression elimination — so a
    subexpression referenced inside a lambda re-evaluates per element;
    binding intermediates keeps in-row operators linear (measured 100x+
    on operators/chunking before its bindings were added)."""
    return F.element_at(F.transform(F.array(value), body), 1)


def floor_log2(col):
    """Exact integer floor(log2(x)) for a positive integer column, as
    binary-string length (``length(conv(x, 10, 2)) - 1``) — the shared
    fixed-point idiom of ``importance.unigram_surprisal``,
    ``relevance.bm25_relevance`` and ``streaming.curation``; DuckDB
    mirror: ``length(printf('%b', x)) - 1``."""
    return (F.length(F.conv(col, 10, 2)) - 1).cast("long")


def words_col(text_col="text"):
    return F.split(F.lower(F.col(text_col)), " ")


def shingles_col(text_col="text", w: int = SHINGLE_W):
    """Distinct w-word shingles as array<string> (native, no UDF)."""
    words = words_col(text_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(words) - w, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, w)),
        )
    )


# ---------------------------------------------------------------------------
# Exact dedup (hash groupBy) — D10/S10 analog for corpora
# ---------------------------------------------------------------------------


def dedup_exact(docs: DataFrame) -> DataFrame:
    """One survivor per distinct text: (keep_id, n_copies)."""
    return (
        docs.groupBy("text")
        .agg(
            F.min("doc_id").cast("long").alias("keep_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
        .select("keep_id", "n_copies")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


# xor-mixing constants: a fixed 60-bit bijection per hash function, so the
# expensive md5 runs ONCE per shingle and the k minhash values derive from
# cheap JVM-side xor (cross-engine: DuckDB xor()). Deterministic constants.
import hashlib as _hashlib

MIX_CONSTANTS = [
    int(_hashlib.md5(f"mix{i}".encode()).hexdigest()[:15], 16)
    for i in range(N_MINHASH)
]


def minhash_signatures(docs: DataFrame, k: int = N_MINHASH) -> DataFrame:
    """(doc_id, mh_0..mh_{k-1}): per-doc minhash signature over 3-word
    shingles. ONE md5 per shingle, k xor-mixed minima. Entirely native:
    transform + array_min, no shuffle at all (narrow, embarrassingly
    parallel — ideal 100TB shape).

    STAGED select, deliberately: `hs` is aliased once and referenced k
    times, which stops CollapseProject from inlining k copies of the
    interpreted shingle+md5 pipeline into the signature projection (and,
    downstream, into per-exploded-row band expressions) — inlined, the
    pipeline re-evaluates k x per row instead of once per document."""
    staged = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.transform(shingles_col(), _h60).alias("hs"),
    )

    def mh_col(c: int):
        # NB: the inner lambda must take exactly ONE parameter — pyspark
        # treats a 2-arg lambda in F.transform as (element, index).
        return F.array_min(
            F.transform(F.col("hs"), lambda h: h.bitwiseXOR(F.lit(c)))
        )

    cols = [F.col("doc_id")]
    for i in range(k):
        cols.append(mh_col(MIX_CONSTANTS[i]).alias(f"mh_{i}"))
    return staged.select(*cols)


def minhash_band_keys(
    docs: DataFrame, k: int = N_MINHASH, band: int = BAND_SIZE
) -> DataFrame:
    """(doc_id, band_key): the LSH banding of the minhash signature —
    ``k // band`` keys per document, each hashing ``band`` adjacent
    signature slots. Two documents share a band_key iff that band of
    their signatures is identical. This is also the INDEX format a
    persisted corpus signature store keeps (bucketed by band_key at
    scale) for incremental dedup — see components.minhash_incremental."""
    assert k % band == 0, "k must divide into whole bands"
    sig = minhash_signatures(docs, k)
    n_bands = k // band
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "_",
                        F.lit(j),
                        *[F.col(f"mh_{j * band + x}") for x in range(band)],
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("band_key"),
    )


def pairs_from_bands(bands: DataFrame) -> DataFrame:
    """Candidate pairs (a, b), a < b, distinct, from a (doc_id, band_key)
    banding. Bucket-grouped: pairs expand natively inside each band
    bucket, so the pair count is bounded by sum(|bucket|^2) — never a
    corpus-wide cross join, and never a self-join that would recompute
    the signature pipeline per side.

    100 TB caveat: O(|bucket|^2) is EXACT semantics, and a degenerate
    band bucket (millions of boilerplate near-dups sharing a key) makes
    it both an executor-OOM (the per-bucket array) and a ~10^12-pair
    explosion. Consumers that only need connectivity (clustering) must
    use :func:`star_pairs_from_bands` — O(|bucket|), same transitive
    closure. To bound the exact pair output, call
    :func:`pairs_from_bands_capped` directly — it returns the cap audit
    alongside the pairs, and that audit MUST be surfaced (this function
    deliberately has no cap parameter, so truncation can never be
    silent)."""
    buckets = (
        bands.groupBy("band_key")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    ids = F.col("ids")
    # (element, index) transform IS intended here: pair x with every later y
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    ids,
                    lambda x, i: F.transform(
                        F.slice(ids, i + 2, F.size(ids)),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select(F.col("p.a").alias("a"), F.col("p.b").alias("b")).distinct()


def star_pairs_from_bands(bands: DataFrame) -> DataFrame:
    """Star edges (bucket_min, member) per band bucket — the scale-safe
    pair form for CLUSTERING consumers: within a bucket the star and the
    full clique connect exactly the same vertex set, so connected
    components (and therefore clusters / survivors / incremental
    verdicts) are identical, at O(|bucket|) edges instead of
    O(|bucket|^2). No per-bucket array is ever materialized (the
    all-pairs form's ``collect_set`` is the executor-OOM at web scale):
    a map-side-combined min per band_key, broadcast-or-hash joined back.
    A degenerate bucket of 10M boilerplate docs costs 10M-1 edges and
    zero driver/executor blowup (AQE skew-split applies to the join)."""
    mins = bands.groupBy("band_key").agg(F.min("doc_id").alias("a"))
    return (
        bands.join(mins, "band_key")
        .filter(F.col("doc_id") != F.col("a"))
        .select("a", F.col("doc_id").alias("b"))
        .distinct()
    )


def pairs_from_bands_capped(
    bands: DataFrame, max_bucket: int
) -> tuple[DataFrame, DataFrame]:
    """Exact all-pairs expansion with a per-bucket size cap and a
    NEVER-SILENT audit: returns ``(pairs, audit)`` where ``pairs`` are
    the (a, b) pairs among each bucket's first ``max_bucket`` members
    (ranked by doc_id — deterministic, engine-independent), and
    ``audit`` has one row per truncated bucket: (band_key, bucket_n,
    n_dropped_members, n_dropped_pairs). Callers must surface the audit
    (count/log/persist) — truncation is visible, not silent.

    The rank is a per-bucket window: a degenerate bucket sorts on disk
    (spillable) instead of materializing an O(|bucket|) array in one
    executor's heap, and only ``max_bucket`` rows per bucket reach the
    pair expansion."""
    from pyspark.sql import Window

    w = Window.partitionBy("band_key").orderBy(F.col("doc_id").asc())
    sized = bands.select("band_key", "doc_id").withColumn(
        "__rk", F.row_number().over(w)
    )
    kept = sized.filter(F.col("__rk") <= max_bucket).drop("__rk")
    audit = (
        sized.groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .filter(F.col("bucket_n") > max_bucket)
        .select(
            "band_key",
            "bucket_n",
            (F.col("bucket_n") - max_bucket).alias("n_dropped_members"),
            # Integer arithmetic throughout: float division would round the
            # exact pair count once a degenerate bucket exceeds ~9.4e7
            # members (pairs > 2^53) — precisely the web-scale case this
            # audit exists for. `div` is Spark's integral division.
            (
                F.expr("cast(bucket_n as bigint) * (bucket_n - 1) div 2")
                - F.lit(max_bucket * (max_bucket - 1) // 2)
            ).cast("long").alias("n_dropped_pairs"),
        )
    )
    return pairs_from_bands(kept), audit


def minhash_lsh_pairs(docs: DataFrame, k: int = N_MINHASH, band: int = BAND_SIZE) -> DataFrame:
    """LSH candidate pairs: docs sharing any band of the signature.
    (a, b) with a < b, distinct. The signature pipeline runs ONCE and
    bucket size bounds the n^2 — see :func:`pairs_from_bands`."""
    return pairs_from_bands(minhash_band_keys(docs, k, band))


# ---------------------------------------------------------------------------
# SimHash (16-bit, cross-engine checkable; production would use 64)
# ---------------------------------------------------------------------------


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """(doc_id, simhash): majority-vote bit fingerprint over word hashes.
    explode -> groupBy(doc_id) with conditional sums = one shuffle with
    map-side combine."""
    words = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(words_col()).alias("w"),
    ).withColumn("h", _h60(F.col("w")))
    bit_sums = [
        F.sum(
            F.when((F.shiftright("h", j).bitwiseAND(F.lit(1))) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(bits)
    ]
    agg = words.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


# ---------------------------------------------------------------------------
# n-gram Jaccard (scoped pairs, top-k)
# ---------------------------------------------------------------------------


def ngram_jaccard_topk(docs: DataFrame, topk: int = 20) -> DataFrame:
    """Top-k most similar same-source doc pairs by 3-gram Jaccard, as a
    set-similarity join: explode hashed shingles, equi-join on
    ``(source, shingle_hash)``, and count shared shingles per pair —
    |A∩B| by aggregation, |A∪B| = |A|+|B|-|A∩B| with the per-doc sizes
    carried through the join. Only pairs that actually share a shingle are
    ever materialized (Σ bucket² rows, no array payload in the shuffle),
    vs. the naive source-scoped cross join scoring every pair with
    array_intersect — far less work, and the skew is bounded by shingle
    frequency, not source size. Zero-overlap pairs (jaccard 0) cannot
    enter a top-k (they tie below any sharing pair), so results match the
    all-pairs oracle exactly. Deterministic tie-break on (a, b)."""
    # STAGED selects, deliberately: aliasing `sh` first and referencing it
    # twice (size + explode) stops CollapseProject from inlining the whole
    # interpreted shingle+hash pipeline into per-exploded-row expressions —
    # inlined, the pipeline re-evaluates once per OUTPUT row (~50x) instead
    # of once per document. The shuffle_hash hints make both join sides
    # identical hashpartitioning exchanges, so ReuseExchange computes the
    # exploded stream once, and SHJ skips the SMJ sorts.
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("source"),
        F.transform(shingles_col(), _h60).alias("sh"),
    )
    ex = base.select("doc_id", "source", F.size("sh").alias("n"), F.explode("sh").alias("h"))
    l, r = ex.alias("l"), ex.alias("r")
    inter = (
        l.hint("shuffle_hash")
        .join(r.hint("shuffle_hash"), ["source", "h"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .groupBy(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .agg(
            F.count("*").alias("inter"),
            # every row of a pair group carries the same n: first() is exact
            F.first("l.n").alias("na"),
            F.first("r.n").alias("nb"),
        )
    )
    pairs = inter.select(
        "a",
        "b",
        F.round(
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
        ).alias("jaccard"),
    )
    return pairs.orderBy(F.desc("jaccard"), "a", "b").limit(topk)


# ---------------------------------------------------------------------------
# Language ID (stopword-profile heuristic)
# ---------------------------------------------------------------------------


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, predicted_lang): argmax of stopword hits per language
    profile; deterministic tie-break by profile order, 'unk' when no hits."""
    words = words_col()
    scores = {
        lang: F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in sw])))
        for lang, sw in STOPWORDS.items()
    }
    pred = F.lit("unk")
    best = F.lit(0)
    for lang in STOPWORDS:  # insertion order = priority
        s = scores[lang]
        pred = F.when(s > best, F.lit(lang)).otherwise(pred)
        best = F.when(s > best, s).otherwise(best)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), pred.alias("predicted_lang")
    )


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, mean_word_len, stop_ratio, quality): simple
    length/stopword heuristics, all native arithmetic (codegen'd)."""
    words = words_col()
    en_stops = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_words = F.size(words)
    mean_wl = F.round(
        (F.length("text") - (n_words - 1)) / n_words, 4
    )  # chars minus spaces
    stop_ratio = F.round(
        F.size(F.filter(words, lambda w: F.array_contains(en_stops, w))) / n_words, 4
    )
    quality = F.round(
        F.least(F.lit(1.0), n_words / F.lit(100.0)) * 0.5
        + F.when((mean_wl >= 3) & (mean_wl <= 10), 0.3).otherwise(0.0)
        + F.least(stop_ratio * F.lit(2.0), F.lit(0.2)),
        4,
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
    )


# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, bpe_est): whitespace tokens + the ~4-chars/token
    BPE estimate."""
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("ws_tokens"),
        F.ceil(F.col("n_chars") / 4.0).cast("long").alias("bpe_est"),
    )


# ---------------------------------------------------------------------------
# Rolling-hash fingerprinting
# ---------------------------------------------------------------------------


def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, n_shingles, min_fp): distinct shingle count + the minimum
    60-bit shingle hash (k=1 minhash == the document's stable fingerprint)."""
    sh = shingles_col()
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(sh).cast("long").alias("n_shingles"),
        F.array_min(F.transform(sh, _h60)).alias("min_fp"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (w-gram overlap flagging)
# ---------------------------------------------------------------------------


def ngram_contamination(
    docs: DataFrame,
    is_bench: Column,
    w: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag every TRAINING document that
    shares at least one w-word shingle with any BENCHMARK document (the
    standard n-gram-overlap test-set-leak check run before training;
    8-grams is the conventional window). ``is_bench`` is a boolean
    Column partitioning ``docs``. Returns the distinct contaminated
    ``doc_id``s.

    Scale: shingle hashes (60-bit md5, cross-engine) are exploded on
    both sides, the benchmark side is distinct-ed and BROADCAST (a
    benchmark suite is tiny next to a 100 TB corpus), and the semi-join
    never materializes pairs — flagged ids come straight out of the
    probe. For a benchmark too large to broadcast, drop the hint and
    the same plan runs as a shuffled semi-join with AQE skew handling.
    """
    hs = docs.withColumn(
        "__hs", F.transform(shingles_col(text_col, w), _h60)
    )
    bench = hs.filter(is_bench).select(F.explode("__hs").alias("h")).distinct()
    train = hs.filter(~is_bench).select(
        "doc_id", F.explode("__hs").alias("h")
    )
    return (
        train.join(F.broadcast(bench), "h", "left_semi")
        .select("doc_id")
        .distinct()
    )


def ngram_contamination_fraction(
    docs: DataFrame,
    is_bench: Column,
    w: int = 8,
    text_col: str = "text",
    drop_at_milli: int = 50,
) -> DataFrame:
    """Graded decontamination: per-training-document FRACTION of its
    distinct w-gram shingles that occur in any benchmark document —
    the decision signal behind span-removal-vs-doc-removal policies
    (GPT-3 appx. C removes whole documents only above an overlap
    threshold; light overlap gets span surgery or a pass). The binary
    :func:`ngram_contamination` is this operator at threshold > 0.

    Returns every training doc: (doc_id, n_shingles, n_contaminated,
    contamination_milli, keep) with ``contamination_milli`` =
    ``1000 * hits // n_shingles`` (integer fixed-point, engine-exact)
    and ``keep = contamination_milli < drop_at_milli`` (default: drop
    at >=5% overlap).

    Scale: identical join shape to :func:`ngram_contamination` — the
    benchmark shingle-hash set is distinct-ed and broadcast, the
    training side counts semi-join survivors per doc with map-side
    combine; no pair materialization, one shuffle (the per-doc count).
    """
    hs = docs.withColumn("__hs", F.transform(shingles_col(text_col, w), _h60))
    bench = hs.filter(is_bench).select(F.explode("__hs").alias("h")).distinct()
    train = hs.filter(~is_bench).select(
        "doc_id", F.size("__hs").cast("long").alias("n_shingles"), "__hs"
    )
    hits = (
        train.select("doc_id", F.explode("__hs").alias("h"))
        .join(F.broadcast(bench), "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        train.drop("__hs")
        .join(hits, "doc_id", "left")
        .withColumn(
            "n_contaminated", F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long")
        )
        # integer fixed-point via `div` — floor(double division) can
        # round a just-below-integer quotient up before flooring
        .withColumn(
            "contamination_milli",
            F.expr(
                "case when n_shingles > 0 "
                "then 1000 * n_contaminated div n_shingles else 0 end"
            ).cast("long"),
        )
        .withColumn("keep", F.col("contamination_milli") < F.lit(drop_at_milli))
    )


# ---------------------------------------------------------------------------
# Line-level global dedup (C4 / CCNet style)
# ---------------------------------------------------------------------------


def dedup_lines(docs: DataFrame, min_chars: int = 0) -> DataFrame:
    """Global line-level dedup: across the WHOLE corpus, each distinct
    line survives only at its first occurrence — the instance with the
    minimum (doc_id, line_position) — and every other occurrence is
    dropped; each document's text is rebuilt from its surviving lines in
    original order. This is the C4 three-sentence-span / CCNet line-hash
    dedup shape (boilerplate that repeats across a site — nav text, cookie
    banners, footers — survives exactly once corpus-wide). Lines shorter
    than ``min_chars`` are never dedup-eligible (always kept), matching
    production pipelines that exempt short/structural lines.

    Returns (doc_id, text_dedup, n_lines_kept, n_lines_dropped) for every
    input document (a fully-deduped document keeps its row with empty
    text).

    Scale design: two shuffles — the first-occurrence groupBy on the line
    value (``min`` combines map-side, so a line repeated 10^9 times
    reduces per-partition before the shuffle) and the per-doc
    reassembly groupBy. The join back from winners to occurrences is an
    equi-join on the line value; heavy-hitter lines skew it, which AQE's
    skew-join split absorbs (the engine enables AQE in session.py). The
    (doc_id, pos) pair is encoded as one long (doc_id·2^32 + pos) so the
    winner min is a plain long min — identical pick in any engine.
    """
    big = F.lit(1 << 32)
    lines = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(F.split("text", "\n")).alias("pos", "line"),
    ).withColumn("k", F.col("doc_id") * big + F.col("pos"))
    winners = (
        lines.filter(F.length("line") >= min_chars)
        .groupBy("line")
        .agg(F.min("k").alias("wk"))
    )
    kept = lines.join(winners, "line", "left").filter(
        (F.length("line") < min_chars) | (F.col("k") == F.col("wk"))
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("__text"),
        F.count(F.lit(1)).alias("__kept"),
    )
    totals = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.split("text", "\n")).cast("long").alias("__total"),
    )
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("__text", F.lit("")).alias("text_dedup"),
        F.coalesce("__kept", F.lit(0)).cast("long").alias("n_lines_kept"),
        (F.col("__total") - F.coalesce("__kept", F.lit(0)))
        .cast("long")
        .alias("n_lines_dropped"),
    )


# ---------------------------------------------------------------------------
# Corpus vocabulary
# ---------------------------------------------------------------------------


def vocab_topk(docs: DataFrame, k: int = 100) -> DataFrame:
    """Corpus vocabulary head: the k most frequent whitespace tokens,
    (token, cnt), ties broken by token ascending — the first step of
    tokenizer training / frequency-based quality features.

    Scale: explode + count groupBy with map-side partial aggregation
    (the Zipf head reduces per-partition before the shuffle), then a
    TakeOrdered top-k — the global sort never materializes, each
    partition ships only its k best."""
    words = docs.select(F.explode(words_col()).alias("token")).filter(
        F.length("token") > 0
    )
    counts = words.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.orderBy(F.desc("cnt"), F.asc("token")).limit(k)


# ---------------------------------------------------------------------------
# Cross-document duplicate-passage signal (exact-substring dedup input)
# ---------------------------------------------------------------------------


def duplicate_passage_stats(docs: DataFrame, w: int = 8) -> DataFrame:
    """Per-document exact-substring duplication signal: the fraction of a
    document's distinct w-word windows that also occur in at least one
    OTHER document — the doc-level decision input for exact-substring
    dedup (train-data dedup a la 'Deduplicating Training Data Makes
    Language Models Better': docs past a threshold get their duplicated
    passages cut or are dropped). Complements repetition_gates (INTRA-doc
    repetition) and ngram_contamination (train-vs-benchmark).

    Returns (doc_id, n_windows, n_shared, dup_frac) with dup_frac
    rounded to 6 places (cross-engine float safety).

    Scale: three key-shuffles — (doc_id, window-hash) dedup, docs-per-
    hash count (map-side combine), and the hash join back (boilerplate
    windows are heavy hitters; AQE skew split absorbs them) — each on
    60-bit hashes, never on text. No pair materialization anywhere:
    sharing is counted per window, not per doc pair, so a window shared
    by 10^6 docs costs 10^6 rows, not 10^12 pairs."""
    wins = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.transform(shingles_col("text", w), _h60)
            )
        ).alias("h"),
    )
    doc_counts = wins.groupBy("h").agg(
        F.count(F.lit(1)).alias("n_docs")  # wins is distinct per (doc, h)
    )
    return (
        wins.join(doc_counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum((F.col("n_docs") >= 2).cast("long")).alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_windows"), 6).alias(
                "dup_frac"
            ),
        )
    )


def exact_substring_dedup(docs: DataFrame, w: int = 50) -> DataFrame:
    """Exact-substring dedup (Lee et al., "Deduplicating Training Data
    Makes Language Models Better", 2022): REMOVE every w-token span that
    occurs at least twice anywhere in the corpus (including within one
    document), keeping the rest of each document. This is the span-level
    cut GPT-3/PaLM-style pipelines run after doc-level near-dup removal;
    :func:`duplicate_passage_stats` is its doc-level decision signal,
    this operator is the actual surgery. Default w=50 tokens per the
    paper; small corpora / tests use smaller windows.

    Returns (doc_id, clean_text, n_tokens, n_removed). Tokens are the
    lowercased whitespace tokens used corpus-wide; a fully-duplicated
    document comes back with clean_text = ''.

    Scale design — everything is linear and join-based, no suffix array
    and no per-doc quadratic in-row scan:
    - window hashes: narrow posexplode, O(corpus tokens) rows of
      (doc_id, pos, h1, h2) — text never shuffles, only hashes. The key
      is 120 bits (two 60-bit halves of ONE md5): at 10^11 w-token
      windows the birthday bound is n^2/2^121 ~ 4e-15 expected
      collisions, vs thousands at 60 bits — and every collision is a
      wrongful w-token cut from a real document, so the width is a
      correctness margin, not a tuning knob;
    - duplicated hashes: count groupBy with map-side combine (boilerplate
      windows are heavy hitters; partial aggregation absorbs them);
    - removed token indices: duplicated window starts exploded xW and
      deduped — bounded by W x dup occurrences;
    - rebuild: token posexplode anti-join removed on (doc_id, idx), then
      one groupBy per doc re-assembling in index order (the same rebuild
      shape as :func:`dedup_lines`). AQE skew handling applies to the
      hash join; nothing is O(doc^2) or O(corpus^2)."""
    staged = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), words_col().alias("__w")
    )
    toks = staged.select("doc_id", F.posexplode("__w").alias("idx", "tok"))
    wins = staged.filter(F.size("__w") >= w).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("__w") - w),
                # one md5 per window; the two 60-bit halves are derived
                # post-explode so the digest is computed exactly once
                lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("__w"), i + 1, w))),
            )
        ).alias("pos", "__hm"),
    ).select(
        "doc_id",
        "pos",
        F.conv(F.substring("__hm", 1, 15), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring("__hm", 17, 15), 16, 10).cast("long").alias("h2"),
    )
    dup_h = (
        wins.groupBy("h1", "h2")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= 2)
        .select("h1", "h2")
    )
    removed = (
        wins.join(dup_h, ["h1", "h2"], "left_semi")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (w - 1))).alias(
                "idx"
            ),
        )
        .distinct()
    )
    kept = toks.join(removed, ["doc_id", "idx"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("__n_kept"),
    )
    return (
        staged.select("doc_id", F.size("__w").cast("long").alias("n_tokens"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("__n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def simhash_neardup_pairs(
    docs: DataFrame, bits: int = 16, n_bands: int = 4, max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate candidate pairs by simhash hamming distance:
    (a, b, hamming) for every doc pair with hamming(simhash) <=
    ``max_hamming``. Band-bucketed like the pHash image path
    (multimodal.phash_neardup): the ``bits``-bit fingerprint splits
    into ``n_bands`` bands; the pigeonhole principle guarantees any
    pair within ``max_hamming`` <= n_bands - 1 bit flips shares at
    least one identical band, so the equi-join on band values has
    EXACT recall while only same-band candidates ever meet —
    O(sum bucket^2), never corpus^2. The hamming verify is in-row
    (xor + bit_count, whole-stage codegen).

    This upgrades ``simhash`` from a per-doc signal to a pairing
    operator: identical-fingerprint grouping misses near-dups that
    differ by a few majority-vote bits (measured in bench.py
    dedup_quality), while hamming<=3 pairing recovers them without
    widening the fingerprint."""
    assert max_hamming < n_bands, "pigeonhole recall needs max_hamming < n_bands"
    assert bits % n_bands == 0
    bw = bits // n_bands
    sig = simhash(docs, bits)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.concat(
                    F.lit(f"{j}_"),
                    (
                        F.shiftright("simhash", j * bw)
                        .bitwiseAND(F.lit((1 << bw) - 1))
                    ).cast("string"),
                )
                for j in range(n_bands)
            ])
        ).alias("band_key"),
    )
    l = bands.select(
        "band_key", F.col("doc_id").alias("a"), F.col("simhash").alias("sa")
    )
    r = bands.select(
        "band_key", F.col("doc_id").alias("b"), F.col("simhash").alias("sb")
    )
    return (
        l.join(r, "band_key")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b",
            F.bit_count(
                F.col("sa").bitwiseXOR(F.col("sb"))
            ).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# CCNet normalized-paragraph dedup
# ---------------------------------------------------------------------------

def ccnet_normalize(col):
    """CCNet's paragraph-hash normalization (Wenzek et al. 2020 §3.2,
    public paper): lowercase, every digit to '0', strip everything
    outside [a-z0 ], collapse whitespace runs, trim. Two paragraphs that
    differ only in casing, punctuation, or embedded numbers (dates,
    view counts, session ids — the classic boilerplate variants) then
    hash identically. Pure codegen string ops, zero shuffle."""
    s = F.regexp_replace(F.lower(col), "[0-9]", "0")
    s = F.regexp_replace(s, "[^a-z0 ]", "")
    s = F.regexp_replace(s, " +", " ")
    return F.trim(s)


def ccnet_paragraph_dedup(docs: DataFrame) -> DataFrame:
    """Corpus-wide NORMALIZED-paragraph dedup: each distinct
    ccnet_normalize(paragraph) survives only at its first occurrence
    (minimum (doc_id, position), long-encoded so the winner pick is a
    plain associative min); every other occurrence is dropped and each
    document is rebuilt from its surviving ORIGINAL paragraphs in
    order. This is :func:`dedup_lines` hardened the CCNet way — raw
    line-hash dedup misses the dominant boilerplate variants (same
    banner, different date), normalized hashing catches them.
    Paragraphs that normalize to '' (pure punctuation/whitespace) are
    structural, never dedup-eligible, always kept.

    Returns (doc_id, text_dedup, n_paras_kept, n_paras_dropped) for
    every input document.

    Scale design: identical to dedup_lines — two shuffles (winner
    groupBy with map-side combine absorbing heavy-hitter boilerplate;
    per-doc reassembly), AQE skew-join on the value join. Only the
    normalized key shuffles twice; original paragraph text shuffles
    once."""
    big = F.lit(1 << 32)
    paras = (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.posexplode(F.split("text", "\n")).alias("pos", "para"),
        )
        .withColumn("k", F.col("doc_id") * big + F.col("pos"))
        .withColumn("norm", ccnet_normalize(F.col("para")))
    )
    winners = (
        paras.filter(F.col("norm") != "")
        .groupBy("norm")
        .agg(F.min("k").alias("wk"))
    )
    kept = paras.join(winners, "norm", "left").filter(
        (F.col("norm") == "") | (F.col("k") == F.col("wk"))
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            "\n",
        ).alias("__text"),
        F.count(F.lit(1)).alias("__kept"),
    )
    totals = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.split("text", "\n")).cast("long").alias("__total"),
    )
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("__text", F.lit("")).alias("text_dedup"),
        F.coalesce("__kept", F.lit(0)).cast("long").alias("n_paras_kept"),
        (F.col("__total") - F.coalesce("__kept", F.lit(0)))
        .cast("long")
        .alias("n_paras_dropped"),
    )


# ---------------------------------------------------------------------------
# Unicode/whitespace text canonicalization
# ---------------------------------------------------------------------------

# committed 1:1-and-small punctuation transliteration table (curly
# quotes, dashes, ellipsis, non-breaking/ideographic spaces) — the
# pre-tokenization cleanup every corpus pipeline runs before hashing
PUNCT_MAP: list[tuple[str, str]] = [
    ("‘", "'"), ("’", "'"), ("‚", "'"),
    ("“", '"'), ("”", '"'), ("„", '"'),
    ("–", "-"), ("—", "-"), ("−", "-"),
    ("…", "..."), (" ", " "), ("　", " "),
]


def text_normalize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, norm_text, n_chars, n_chars_norm): canonicalize text for
    downstream hashing/tokenization — transliterate the committed
    PUNCT_MAP (curly quotes -> straight, en/em/minus dashes -> '-',
    ellipsis -> '...', nbsp/ideographic space -> ' '), replace control
    characters with spaces, collapse whitespace runs, trim. Zero
    shuffle: a chain of replace/regexp_replace, whole-stage codegen.
    Full NFC normalization needs ICU (not a Spark built-in); the
    committed-table subset keeps the operator engine-exact and covers
    the forms that actually fracture dedup keys in web text."""
    s: Column = F.col(text_col)
    for src, dst in PUNCT_MAP:
        s = F.replace(s, F.lit(src), F.lit(dst))
    s = F.regexp_replace(s, r"[\x00-\x1f\x7f]", " ")
    s = F.trim(F.regexp_replace(s, " +", " "))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        s.alias("norm_text"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        s.alias("__n"),
    ).select(
        "doc_id", "norm_text", "n_chars",
        F.length("__n").cast("long").alias("n_chars_norm"),
    )


# ---------------------------------------------------------------------------
# Suffix/prefix boundary overlap (pagination stitching)
# ---------------------------------------------------------------------------

def suffix_prefix_overlap(docs: DataFrame, k: int = 2) -> DataFrame:
    """Candidate continuation pairs: (a, b, boundary) where document
    a's last ``k`` lowercased tokens equal document b's first ``k``
    tokens — the signal for stitching paginated articles / split crawl
    captures back together (a "page 2 of" detector that needs no
    markup). Documents shorter than k tokens have no boundary and never
    pair.

    Scale design: one equi-join on the k-token boundary key — each side
    is one row per doc (narrow slice + concat, no explode). Boilerplate
    boundaries ("click here to continue") are hot keys; AQE's skew-join
    split absorbs them, and the key itself is k tokens, so only short
    strings shuffle, never documents."""
    w = words_col()
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), w.alias("__w")
    ).filter(F.size("__w") >= k)
    suf = base.select(
        F.col("doc_id").alias("a"),
        F.concat_ws(" ", F.slice("__w", -k, k)).alias("boundary"),
    )
    pre = base.select(
        F.col("doc_id").alias("b"),
        F.concat_ws(" ", F.slice("__w", 1, k)).alias("boundary"),
    )
    return (
        suf.join(pre, "boundary")
        .filter(F.col("a") != F.col("b"))
        .select("a", "b", "boundary")
    )


def snapshot_scoped_dedup(
    docs: DataFrame, snapshot_col: str = "snapshot"
) -> DataFrame:
    """Per-snapshot vs global exact-dedup accounting — the FineWeb
    ablation shape (Penedo et al. 2024, S4.4: deduplicating each
    CommonCrawl dump INDIVIDUALLY trains better than one global pass,
    which concentrates surviving text in the oldest dump). The
    reference crawls one site at a time and has no cross-snapshot
    notion (builder-brief scope).

    Input: one row per (doc, crawl snapshot). Output: one row per
    snapshot with
    - ``n_docs`` — documents in the snapshot,
    - ``scoped_survivors`` — survivors when dedup is scoped to the
      snapshot (distinct texts within it),
    - ``global_survivors`` — documents of this snapshot that survive a
      single GLOBAL pass (survivor = min (snapshot, doc_id) per text,
      so all later snapshots' copies collapse into the earliest).

    ``scoped - global`` is exactly the text the global pass strips
    from newer snapshots. Scale: two hash groupBys on the text key
    (both with map-side partial aggregation), one small groupBy per
    snapshot; no window, no join back to the corpus.
    """
    # the snapshot key keeps its NATIVE type end to end: real
    # CommonCrawl dump labels are strings ('CC-MAIN-2024-10'), and a
    # cast('long') would turn every label into NULL — collapsing all
    # global survivors into one NULL group while scoped counts stayed
    # per-snapshot (silently inconsistent output). Struct-min compares
    # strings lexically, which IS chronological for zero-padded dump
    # labels and exact for numeric snapshots.
    snap = F.col(snapshot_col)
    scoped = (
        docs.groupBy(snap.alias("snapshot"), F.col("text"))
        .agg(F.count("*").alias("__n"))
        .groupBy("snapshot")
        .agg(
            F.count("*").cast("long").alias("scoped_survivors"),
            F.sum("__n").cast("long").alias("n_docs"),
        )
    )
    global_surv = (
        docs.groupBy("text")
        .agg(
            F.min(
                F.struct(snap.alias("s"), F.col("doc_id").alias("d"))
            ).alias("w")
        )
        .groupBy(F.col("w.s").alias("snapshot"))
        .agg(F.count("*").cast("long").alias("global_survivors"))
    )
    return (
        scoped.join(global_surv, "snapshot", "left")
        .select(
            "snapshot",
            "n_docs",
            "scoped_survivors",
            F.coalesce("global_survivors", F.lit(0))
            .cast("long")
            .alias("global_survivors"),
        )
    )
