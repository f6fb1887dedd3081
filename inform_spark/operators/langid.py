"""Model-based language identification, engine-exact.

Upgrades the stopword-argmax heuristic (``textops.lang_id``) to the
CLD/fastText-lid SHAPE: a per-language linear model over hashed
character n-grams (Joulin et al. 2017 "Bag of Tricks", public paper).
The model here is a per-language hashed-trigram unigram LM trained on a
COMMITTED seed corpus, scored in integer surprisal bits — each trigram
bucket b costs ``floor(log2((tot_lang + B) div (cnt_lang(b) + 1)))``
whole bits (add-one smoothing over B=4096 buckets), and the predicted
language is the argmin of total bits (= naive-Bayes argmax), ties
broken alphabetically.

Fixed-point rationale (same as ``importance.dsir_weights``): float
log-prob sums are shuffle-order dependent; the floor-log2-as-binary-
length idiom makes every sum exactly associative, so the result is
independent of partitioning, execution order, and engine — which is
what lets the DuckDB oracle hash-match the scores themselves, not just
the argmax.

Scale design (100 TB):
- trigram extraction + bucketing is narrow (in-row transform + md5);
- (doc, bucket) counts: ONE shuffle with map-side combine;
- the model is a FIXED <=4096-row weight table derived from the
  committed seeds — broadcast to the doc side, per-doc rollup is the
  only other shuffle. Unseen buckets cost the per-language default
  (cnt=0) bits via coalesce, so no row is ever dropped by the join.

Reference scope note: the reference engine has no language
classification; the training-data pipeline family (SURVEY §2
extension). The stopword ``textops.lang_id`` remains as the
zero-shuffle fallback.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from inform_spark.operators.textops import _h60, floor_log2

N_BUCKETS = 4096

# Committed ASCII-only seed corpus (accents transliterated so character
# indexing can never diverge between engines on multi-byte forms).
SEEDS: dict[str, str] = {
    "de": (
        "der schnelle braune fuchs springt ueber den faulen hund und die "
        "kinder spielten froehlich im garten waehrend ihre eltern mit "
        "grosser freude zusahen die wirtschaft des landes waechst in "
        "diesem jahr deutlich schneller als erwartet sagte der minister "
        "am dienstag in berlin nach einem treffen mit den vertretern der "
        "gewerkschaften und der industrie"
    ),
    "en": (
        "the quick brown fox jumps over the lazy dog and the children "
        "were playing happily in the garden while their parents watched "
        "with great joy the economy of the country is growing much "
        "faster this year than expected the minister said on tuesday in "
        "london after a meeting with representatives of the unions and "
        "industry leaders from across the region"
    ),
    "es": (
        "el rapido zorro marron salta sobre el perro perezoso y los "
        "ninos jugaban felices en el jardin mientras sus padres miraban "
        "con gran alegria la economia del pais esta creciendo mucho mas "
        "rapido este ano de lo esperado dijo el ministro el martes en "
        "madrid despues de una reunion con los representantes de los "
        "sindicatos y de la industria"
    ),
    "fr": (
        "le renard brun rapide saute par dessus le chien paresseux et "
        "les enfants jouaient joyeusement dans le jardin pendant que "
        "leurs parents regardaient avec beaucoup de joie l economie du "
        "pays croit beaucoup plus vite cette annee que prevu a declare "
        "le ministre mardi a paris apres une reunion avec les "
        "representants des syndicats et de l industrie"
    ),
}
LANGS = sorted(SEEDS)  # de, en, es, fr — alphabetical = tie-break order


def trigram_buckets(text_col: Column) -> Column:
    """Hashed char-trigram buckets of lower(text) as an array<long>.
    Guarded so texts shorter than 3 chars yield an EMPTY array (Spark's
    sequence(1, 0) would count down — the guard keeps both engines on
    the same empty-list semantics)."""
    s = F.lower(text_col)
    return F.when(
        F.length(s) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(s) - 2),
            lambda i: F.pmod(
                _h60(F.concat(F.lit("lid"), s.substr(i.cast("int"), F.lit(3)))),
                F.lit(N_BUCKETS),
            ).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))


def lang_id_model(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_trigrams, bits_de, bits_en, bits_es, bits_fr,
    pred_lang) — per-language total surprisal bits under the seed-
    trained hashed-trigram LM, argmin prediction. Documents with no
    trigrams carry n_trigrams = 0, NULL bits and NULL prediction
    (explicit unknown, same contract as dsir_weights)."""
    spark = docs.sparkSession
    seeds = spark.createDataFrame(
        [(lang, SEEDS[lang]) for lang in LANGS], "lang string, text string"
    )
    seed_counts = (
        seeds.select("lang", F.explode(trigram_buckets(F.col("text"))).alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # per-language totals as a 1-row dim (4 scalars, broadcast-crossed)
    tots = seed_counts.groupBy().pivot("lang", LANGS).sum("cnt").select(
        *[F.col(lang).cast("long").alias(f"tot_{lang}") for lang in LANGS]
    )

    # bucket weight table: bits per language for every bucket the seeds
    # saw; unseen buckets fall back to the cnt=0 default after the join
    w = (
        seed_counts.groupBy("bucket")
        .pivot("lang", LANGS)
        .sum("cnt")
        .join(F.broadcast(tots))
        .select(
            "bucket",
            *[
                floor_log2(
                    F.expr(
                        f"(tot_{lang} + {N_BUCKETS}) div "
                        f"(coalesce({lang}, 0) + 1)"
                    )
                ).alias(f"w_{lang}")
                for lang in LANGS
            ],
        )
    )
    doc_counts = (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.explode(trigram_buckets(F.col(text_col))).alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    scored = (
        doc_counts.join(F.broadcast(w), "bucket", "left")
        .join(F.broadcast(tots))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_trigrams"),
            *[
                F.sum(
                    F.col("cnt")
                    * F.coalesce(
                        F.col(f"w_{lang}"),
                        floor_log2(F.expr(f"tot_{lang} + {N_BUCKETS}")),
                    )
                )
                .cast("long")
                .alias(f"bits_{lang}")
                for lang in LANGS
            ],
        )
    )
    # argmin with alphabetical tie-break: the first language (in
    # alphabetical order) whose bits are <= every later language's
    pred = F.when(
        (F.col("bits_de") <= F.col("bits_en"))
        & (F.col("bits_de") <= F.col("bits_es"))
        & (F.col("bits_de") <= F.col("bits_fr")),
        F.lit("de"),
    ).when(
        (F.col("bits_en") <= F.col("bits_es"))
        & (F.col("bits_en") <= F.col("bits_fr")),
        F.lit("en"),
    ).when(F.col("bits_es") <= F.col("bits_fr"), F.lit("es")).otherwise(
        F.lit("fr")
    )
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    return base.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_trigrams", F.lit(0)).cast("long").alias("n_trigrams"),
        "bits_de",
        "bits_en",
        "bits_es",
        "bits_fr",
        F.when(F.col("n_trigrams").isNotNull(), pred).alias("pred_lang"),
    )


# ---------------------------------------------------------------------------
# Script / writing-system profiling (zero-shuffle char-class histogram)
# ---------------------------------------------------------------------------

# codepoint RANGES (not \p{Script} names) so the identical pattern string
# means the same thing to Java regex (Spark) and RE2 (DuckDB) — the
# literal characters are interpolated into both engines' patterns
SCRIPT_RANGES = {
    # À-Ö Ø-ö ø-ɏ excludes the math symbols × ÷ (not letters);
    # Ḁ-ỿ is Latin Extended Additional (Vietnamese tone-marked vowels)
    "latin": "A-Za-zÀ-ÖØ-öø-ɏḀ-ỿ",
    "cyrillic": "Ѐ-ӿ",
    "greek": "Ͱ-Ͽ",
    "arabic": "؀-ۿ",
    "cjk": "一-鿿",
    "kana": "぀-ヿ",
    "hangul": "가-힯",
}
SCRIPTS = list(SCRIPT_RANGES)  # insertion order = tie-break priority


def _class_count(text_col: Column, char_class: str) -> Column:
    return F.length(F.regexp_replace(text_col, f"[^{char_class}]", ""))


def script_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document writing-system histogram + dominant script — the
    script-detection stage a multilingual pipeline runs BEFORE language
    ID (script partitions the candidate-language set: CLD2/fastText-lid
    do exactly this; a Cyrillic doc never scores against the es/fr
    models). Counts per script range plus digits/whitespace/other, the
    dominant script (argmax, ties broken in SCRIPTS order, 'none' for
    zero script chars), and its share of all characters in integer
    milli.

    Scale: ZERO shuffle — the whole profile is a narrow codegen chain
    of regexp_replace/length arithmetic; supplementary-plane characters
    (emoji) fall into `other` identically in both engines because every
    class is a BMP codepoint range."""
    t = F.col(text_col)
    # stage 1 names every count ONCE so stage 2's argmax/other/milli
    # expressions reference columns, not re-inlined regexp trees — the
    # CASE chain would otherwise embed each regexp ~9x in the project
    counted = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length(t).cast("long").alias("n_chars"),
        *[
            _class_count(t, r).cast("long").alias(f"n_{s}")
            for s, r in SCRIPT_RANGES.items()
        ],
        _class_count(t, "0-9").cast("long").alias("n_digit"),
        _class_count(t, " \t\n\r").cast("long").alias("n_space"),
    )
    script_cols = [F.col(f"n_{s}") for s in SCRIPTS]
    known = F.col("n_digit") + F.col("n_space")
    for c in script_cols:
        known = known + c
    g = F.greatest(*script_cols)
    dominant = F.when(g == 0, F.lit("none"))
    for s in SCRIPTS:
        dominant = dominant.when(F.col(f"n_{s}") == g, F.lit(s))
    return counted.select(
        "*",
        (F.col("n_chars") - known).cast("long").alias("n_other"),
        dominant.alias("dominant_script"),
        F.when(
            F.col("n_chars") > 0,
            F.expr(
                "1000 * greatest("
                + ", ".join(f"n_{s}" for s in SCRIPTS)
                + ") div n_chars"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("script_milli"),
    )
