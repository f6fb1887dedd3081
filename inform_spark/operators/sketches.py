"""Mergeable cardinality sketches — engine-exact HyperLogLog.

Why a crawler needs this: the frontier's URL-seen set at 10^10 scale is
a sharded bloom/cuckoo filter (operators/bloom.py, operators/cuckoo.py)
— membership is cheap, but "how many distinct URLs has host H
contributed?" is not answerable from a bloom without a full scan, and
an exact count(distinct url) per host is a full shuffle of every URL
string ever seen. HyperLogLog (Flajolet et al. 2007, and the HLL
practice writeup by Heule et al. 2013) answers it from m = 2^p
one-byte registers per host: the registers are built in one narrow
pass + one tiny groupBy, merge across crawl snapshots with a plain
MAX, and the estimate is computed from 64 longs without ever touching
the raw URLs again. Per-host politeness budgeting, trap detection
(a host whose fetch count grows while its HLL plateaus is serving
duplicate surfaces), and recrawl scheduling all read this signal.

Engine-exactness (the repo-wide oracle discipline): floats only enter
through ONE fixed expression — ``floor((C / double(sum_scaled)) *
1000)`` where ``C`` is a committed Python-double literal and
``sum_scaled`` is an exact 64-bit integer. int64→double conversion,
one division, one multiplication and ``floor`` are all IEEE-754
correctly-rounded operations, so Spark (JVM) and DuckDB (C++) produce
the identical bit pattern; everything else (hashing, bucketing, rank,
register max, the scaled sum) is integer arithmetic, associative and
partitioning-independent. The small-range (linear-counting)
correction uses a COMMITTED integer table — ``floor(m*ln(m/V)*1000)``
precomputed once in Python — so no engine evaluates ``ln`` at query
time.

Scale design:
- register build: narrow projection (hash, bucket, rank) + ONE groupBy
  (key, bucket) with map-side combine — the heavy-hitter host's
  millions of URLs collapse to <= m rows before the shuffle;
- estimate: ONE groupBy (key) over at most m rows per key;
- merge across snapshots/shards: union registers, groupBy MAX — the
  sketch is a semilattice, so incremental maintenance is append+max,
  never a rebuild (test_sketches.py proves union-merge == whole-corpus
  build row-for-row);
- memory: m * 8 bytes per key in flight; with m=64 and 10^8 hosts the
  whole register table is ~50 GB spread over the cluster — a small
  dimension, broadcastable after aggregation.

Accuracy: the standard error is 1.04/sqrt(m) ~= 13% at m=64 (p=6, the
default here — chosen so tests exercise both the raw-estimate and
linear-counting regimes at sf0.01); production raises p to 11-14
(m=2048-16384, 2.3-0.8% error) by changing ONE parameter — every
expression below is parametric in p and stays within int64 for
p <= 14 (sum_scaled <= m * 2^(61-p) = 2^61).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inform_spark.operators.textops import _h60, floor_log2

# alpha_m bias constants per the HLL paper (m=16/32/64, then the
# general formula for m >= 128)
def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _lc_milli_table(m: int) -> list[int]:
    """Committed linear-counting table: floor(m * ln(m/V) * 1000) for
    V = 1..m. Computed once in CPython; both engines consume the same
    integer literals, so no runtime ``ln`` anywhere."""
    return [math.floor(m * math.log(m / v) * 1000) for v in range(1, m + 1)]


def _c_literal(m: int, p: int) -> float:
    """The committed double constant alpha_m * m^2 * 2^(61-p); its
    repr() round-trips to the identical IEEE double in JVM and DuckDB."""
    return _alpha(m) * m * m * float(1 << (61 - p))


def hll_registers(
    df: DataFrame,
    item_col: str,
    key_cols: list[str],
    p: int = 6,
    salt: str = "hll",
) -> DataFrame:
    """(key..., bucket, register) — the mergeable state. bucket is the
    low p bits of the 60-bit item hash; rank is the HLL
    leading-zero-count of the remaining 60-p bits, computed exactly as
    ``(60-p) - floor_log2(w)`` (w>0) / ``61-p`` (w=0) via the repo's
    shared binary-string-length floor-log2 idiom; register = MAX(rank).
    Merging two register tables is union + the same MAX groupBy."""
    if not 4 <= p <= 14:
        raise ValueError(f"p={p} outside the int64-safe range [4, 14]")
    m = 1 << p
    h = _h60(F.concat(F.lit(salt), F.col(item_col).cast("string")))
    # a NULL item would hash to a NULL bucket whose rank falls through
    # when() to the 61-p maximum — a phantom register countDistinct
    # would never see; NULL means "no item observed", so drop it
    df = df.filter(F.col(item_col).isNotNull())
    staged = df.select(*key_cols, h.alias("__h")).select(
        *key_cols,
        F.pmod(F.col("__h"), F.lit(m)).cast("int").alias("bucket"),
        F.expr(f"__h div {m}").alias("__w"),
    )
    rank = (
        F.when(F.col("__w") > 0, F.lit(60 - p) - floor_log2(F.col("__w")))
        .otherwise(F.lit(61 - p))
        .cast("int")
    )
    return (
        staged.withColumn("__r", rank)
        .groupBy(*key_cols, "bucket")
        .agg(F.max("__r").alias("register"))
    )


def hll_estimate(
    registers: DataFrame, key_cols: list[str], p: int = 6
) -> DataFrame:
    """(key..., n_zero_registers, sum_scaled, est_milli) from a register
    table. est_milli is the HLL estimate in 1/1000 units as a LONG:
    the raw estimate floor((C / sum_scaled) * 1000) with the committed
    C = alpha*m^2*2^(61-p), replaced by the committed linear-counting
    table value when est <= 2.5*m and some register is empty — the
    standard two-regime estimator, every branch engine-exact."""
    m = 1 << p
    sh = 61 - p
    c = _c_literal(m, p)
    lc = _lc_milli_table(m)
    agg = registers.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("__present"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {sh} - register)")).alias(
            "__psum"
        ),
    )
    # fail loudly instead of estimating garbage when the register table
    # was built with a LARGER p than this estimate assumes (more than m
    # distinct buckets for a key is impossible under matching p).
    # assert_true returns NULL on success, so the filter keeps every
    # row — but unlike a dropped column it cannot be pruned away
    agg = agg.filter(
        F.assert_true(
            F.col("__present") <= F.lit(m),
            F.lit(
                f"register table has >{m} buckets for a key: built with "
                f"a larger p than the p={p} passed to hll_estimate"
            ),
        ).isNull()
    )
    v = (F.lit(m) - F.col("__present")).cast("long")
    sum_scaled = (
        F.col("__psum") + v * F.lit(1 << sh).cast("long")
    ).cast("long")
    est = agg.select(
        *key_cols,
        v.alias("n_zero_registers"),
        sum_scaled.alias("sum_scaled"),
    )
    raw_milli = F.floor(F.lit(c) / F.col("sum_scaled").cast("double") * F.lit(1000.0)).cast(
        "long"
    )
    # greatest(1, V): the LC branch is only TAKEN when V > 0, but the
    # index expression must stay in-bounds even if an engine evaluates
    # both CASE arms eagerly
    lc_milli = F.element_at(
        F.array(*[F.lit(x).cast("long") for x in lc]),
        F.greatest(F.lit(1), F.col("n_zero_registers").cast("int")),
    )
    return est.withColumn(
        "est_milli",
        F.when(
            (raw_milli <= F.lit(2500 * m)) & (F.col("n_zero_registers") > 0),
            lc_milli,
        ).otherwise(raw_milli),
    )


def hll_cardinality(
    df: DataFrame,
    item_col: str,
    key_cols: list[str],
    p: int = 6,
    salt: str = "hll",
) -> DataFrame:
    """End-to-end per-key sketch + the exact distinct count alongside
    (key..., exact_distinct, n_zero_registers, sum_scaled, est_milli).
    The exact count is the verification column — at 10^10 scale you run
    only the sketch; here it lets tests and the DuckDB oracle grade the
    estimate without any tolerance."""
    regs = hll_registers(df, item_col, key_cols, p=p, salt=salt)
    est = hll_estimate(regs, key_cols, p=p)
    exact = df.groupBy(*key_cols).agg(
        F.countDistinct(item_col).alias("exact_distinct")
    )
    # LEFT join: a key whose items are all NULL has no registers (the
    # build drops NULLs) but countDistinct reports 0 for it — an inner
    # join would silently drop the key from the output. Fill with what
    # an empty register table means: every register zero, est 0.
    m = 1 << p
    sh = 61 - p
    return exact.join(est, key_cols, "left").select(
        *key_cols,
        "exact_distinct",
        F.coalesce("n_zero_registers", F.lit(m).cast("long")).alias(
            "n_zero_registers"
        ),
        F.coalesce("sum_scaled", F.lit(m * (1 << sh)).cast("long")).alias(
            "sum_scaled"
        ),
        F.coalesce("est_milli", F.lit(0).cast("long")).alias("est_milli"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch — mergeable frequency estimation (Cormode & Muthukrishnan
# 2005), the heavy-hitter companion to the HLL above: HLL answers "how many
# DISTINCT items", CMS answers "how often does item x occur" from the same
# kind of tiny, mergeable, integer state. A crawler reads it for hot-host /
# hot-template detection (the skew signal that triggers salting or budget
# clamps) without keeping a counter per key — depth*width longs total,
# regardless of key cardinality.
#
# Engine-exactness: everything is integer — the salted 60-bit md5 hash,
# the modulo bucketing, the associative counter sums, and the min over
# depth rows — so the sketch AND every estimate are partitioning/engine
# independent. Overestimate-only by construction (collisions only ADD),
# with error <= 2N/width at ~98% confidence for depth=4.
#
# Scale: the build is ONE groupBy over (row, col) keys — map-side combine
# collapses each partition to <= depth*width rows before the shuffle, the
# same shape as the HLL register build; shard merges are union + SUM
# (a commutative monoid), never a rebuild.


def cms_counters(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """(r, c, cnt): the depth x width counter matrix. Each item lands in
    one column per row via a salted hash; absent (r, c) cells are
    implicit zeros (the estimate side coalesces)."""
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    # NULL means "no item observed" (the HLL build's rule): a NULL item
    # would hash to a NULL cell that no probe's null-unsafe join could
    # ever read back — count it nowhere rather than into a ghost cell
    rows = df.filter(F.col(item_col).isNotNull()).select(
        F.col(item_col).cast("string").alias("item"),
        w.alias("w"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
    )
    return (
        rows.select(
            "r",
            (
                _h60(
                    F.concat(
                        F.lit("cms"),
                        F.col("r").cast("string"),
                        F.lit("|"),
                        F.col("item"),
                    )
                )
                % width
            ).alias("c"),
            "w",
        )
        .groupBy("r", "c")
        .agg(F.sum("w").cast("long").alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """(item, cms_est): point estimates for the candidate items —
    min over the depth probed counters. The counter table is tiny
    (<= depth*width rows) and broadcasts; probing is map-side."""
    probes = items.filter(F.col(item_col).isNotNull()).select(
        F.col(item_col).cast("string").alias("item")
    ).distinct().select(
        "item",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
    ).select(
        "item",
        "r",
        (
            _h60(
                F.concat(
                    F.lit("cms"),
                    F.col("r").cast("string"),
                    F.lit("|"),
                    F.col("item"),
                )
            )
            % width
        ).alias("c"),
    )
    return (
        probes.join(F.broadcast(counters), ["r", "c"], "left")
        .select("item", F.coalesce("cnt", F.lit(0)).alias("cnt"))
        .groupBy("item")
        .agg(F.min("cnt").cast("long").alias("cms_est"))
    )


def cms_frequencies(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """(item, true_cnt, cms_est): every distinct NON-NULL item's exact
    count next to its sketch estimate — the verification shape (est >=
    true always; equality when the item's columns are collision-free).
    NULL rows are not items (the sketch family's shared rule): they are
    excluded from the sketch, the probes, and this exact side alike, so
    the invariant holds over exactly the counted universe."""
    counters = cms_counters(df, item_col, depth, width)
    true_cnt = (
        df.filter(F.col(item_col).isNotNull())
        .select(F.col(item_col).cast("string").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
    )
    est = cms_estimate(counters, df.select(item_col), item_col, depth, width)
    return true_cnt.join(est, "item").select("item", "true_cnt", "cms_est")
