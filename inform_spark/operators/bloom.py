"""Sharded bloom filter for the URL-seen/enqueued set (SURVEY Phase 3).

At a 10^10-URL frontier the exact anti-join shuffles every candidate link
against the full frontier table each batch. The bloom path pre-partitions
candidates with a broadcast bit array:

- bloom-NEGATIVE  -> definitely never enqueued -> admitted with NO exact join
- bloom-POSITIVE  -> *maybe* enqueued -> exact anti-join of the (few)
                     positives only

False positives therefore cost one exact re-check, never a lost URL; false
negatives are impossible by construction, so the final URL-seen set is
byte-identical to the exact path (asserted in tests).

Sizing: 10 bits/URL at 10^10 URLs ≈ 12.5 GB — sharded by
``pmod(xxhash64(url), n_shards)`` so each executor holds only the shards it
probes; in-sandbox shards are small and broadcast whole. Each ``add`` bumps
``version`` — recorded per batch in the lineage table (north_rule:
per-partition lineage includes the bloom shard version).

Construction is distributed: hashes are computed by Spark's built-in
``xxhash64`` (JVM side), bitmaps are OR-reduced per shard via
``applyInPandas``; only the n_shards bitmaps travel to the driver.

K hash functions use double hashing h_i = h1 + i*h2 (Kirsch-Mitzenmacher),
with h2 derived from a second JVM xxhash64 over a salted column.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

K_HASHES = 5


def _with_hashes(df: DataFrame) -> DataFrame:
    """h1/h2 as unsigned-ish int64 columns, JVM-side."""
    return df.withColumn("__h1", F.xxhash64("url")).withColumn(
        "__h2", F.xxhash64(F.concat(F.col("url"), F.lit("\x01salt")))
    )


def _bit_positions(h1: np.ndarray, h2: np.ndarray, m: int) -> np.ndarray:
    """(n, K) bit indices via double hashing, numpy-vectorized."""
    i = np.arange(K_HASHES, dtype=np.uint64)
    # view as uint64 for well-defined modular arithmetic
    u1 = h1.astype(np.int64).view(np.uint64)[:, None]
    u2 = h2.astype(np.int64).view(np.uint64)[:, None]
    return ((u1 + i * u2) % np.uint64(m)).astype(np.int64)


def _build_bitmap(h1: np.ndarray, h2: np.ndarray, m: int) -> np.ndarray:
    bits = np.zeros(m, dtype=bool)
    bits[_bit_positions(h1, h2, m).ravel()] = True
    return np.packbits(bits)


@dataclass
class ShardedBloom:
    n_shards: int
    bits_per_shard: int
    version: int
    shards: dict[int, np.ndarray]  # shard_id -> packed bit array (uint8)

    @staticmethod
    def empty(n_shards: int = 16, bits_per_shard: int = 1 << 20) -> "ShardedBloom":
        # build computes the shard via signed pmod(h1, n) JVM-side while the
        # probe uses uint64(h1) % n — these agree for negative h1 ONLY when
        # n is a power of two (both reduce to the low bits)
        assert n_shards > 0 and n_shards & (n_shards - 1) == 0
        return ShardedBloom(n_shards, bits_per_shard, 0, {})

    @staticmethod
    def build(
        spark: SparkSession,
        urls: DataFrame,
        n_shards: int = 16,
        bits_per_shard: int = 1 << 20,
        approx_count: int | None = None,
    ) -> "ShardedBloom":
        return ShardedBloom.empty(n_shards, bits_per_shard).add(
            spark, urls, approx_count=approx_count
        )

    # below this many urls the distributed OR-reduce costs more than it
    # saves: the groupBy shuffle + applyInPandas python-worker spin-up is
    # seconds of fixed cost, while collecting (shard, h1, h2) longs for a
    # small set is one narrow JVM-only job and a microsecond numpy fold
    SMALL_ADD_MAX = 1 << 16

    def add(
        self,
        spark: SparkSession,
        urls: DataFrame,
        approx_count: int | None = None,
    ) -> "ShardedBloom":
        """Fold new urls in: distributed per-shard bitmap build, OR on driver.
        Returns a NEW ShardedBloom with version+1 (immutable snapshots so a
        resumed crawl can pin the version recorded in lineage).

        ``approx_count``: caller's upper bound on |urls| (the crawl engine
        knows it from bookkeeping — seed-list length, batch admission
        count). When provably small the bitmaps are folded driver-side
        from JVM-computed hashes — bit-identical (same xxhash64 pair, same
        shard pmod, same ``_build_bitmap``), no shuffle, no python workers.
        Unknown (None) or large counts take the distributed path."""
        m = self.bits_per_shard
        n_shards = self.n_shards
        hashed = _with_hashes(urls).select(
            F.pmod(F.col("__h1"), F.lit(n_shards)).cast("int").alias("shard"),
            "__h1",
            "__h2",
        )

        if approx_count is not None and approx_count <= self.SMALL_ADD_MAX:
            small = hashed.collect()  # JVM-only narrow job
            shards = {k: v.copy() for k, v in self.shards.items()}
            by_shard: dict[int, list] = {}
            for r in small:
                by_shard.setdefault(r["shard"], []).append((r["__h1"], r["__h2"]))
            for shard, hs in by_shard.items():
                a = np.asarray(hs, dtype=np.int64)
                delta = _build_bitmap(a[:, 0], a[:, 1], m)
                if shard in shards:
                    shards[shard] = shards[shard] | delta
                else:
                    shards[shard] = delta
            return ShardedBloom(n_shards, m, self.version + 1, shards)

        def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            if pdf.empty:
                return pd.DataFrame({"shard": [], "bitmap": []})
            shard = int(pdf["shard"].iloc[0])
            bm = _build_bitmap(pdf["__h1"].to_numpy(), pdf["__h2"].to_numpy(), m)
            return pd.DataFrame({"shard": [shard], "bitmap": [bm.tobytes()]})

        rows = (
            hashed.groupBy("shard")
            .applyInPandas(build_shard, schema="shard int, bitmap binary")
            .collect()
        )
        shards = {k: v.copy() for k, v in self.shards.items()}
        for r in rows:
            delta = np.frombuffer(r["bitmap"], dtype=np.uint8)
            if r["shard"] in shards:
                shards[r["shard"]] = shards[r["shard"]] | delta
            else:
                shards[r["shard"]] = delta
        return ShardedBloom(n_shards, m, self.version + 1, shards)

    # ------------------------------------------------------------------
    def probe_udf(self, spark: SparkSession):
        """pandas UDF (h1, h2) -> maybe_member boolean (Arrow-batched).
        Memoized per filter snapshot: filters are immutable, so the
        broadcast of the shard arrays happens ONCE per version instead of
        once per probing batch."""
        cached = getattr(self, "_probe_udf", None)
        if cached is not None:
            return cached
        bc = spark.sparkContext.broadcast(
            {"shards": self.shards, "m": self.bits_per_shard, "n": self.n_shards}
        )

        @pandas_udf(BooleanType())
        def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
            state = bc.value
            m, n = state["m"], state["n"]
            shards = state["shards"]
            a1 = h1.to_numpy()
            a2 = h2.to_numpy()
            shard_ids = (a1.view(np.uint64) % np.uint64(n)).astype(np.int64)
            out = np.zeros(len(a1), dtype=bool)
            pos = _bit_positions(a1, a2, m)
            for sid in np.unique(shard_ids):
                bm = shards.get(int(sid))
                if bm is None:
                    continue
                mask = shard_ids == sid
                p = pos[mask]
                bits = (bm[p >> 3] >> (7 - (p & 7))) & 1
                out[mask] = bits.all(axis=1)
            return pd.Series(out)

        object.__setattr__(self, "_probe_udf", probe)
        return probe


def bloom_partition(
    df: DataFrame, bloom: ShardedBloom, persist: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame | None]:
    """Split df into (maybe_seen, definitely_fresh) by bloom membership.
    maybe_seen still needs the exact anti-join; fresh does not.

    With ``persist=True`` the probed set is persisted and returned as the
    third element (caller unpersists): both output branches and any union of
    them then read the cache instead of re-executing the upstream pipeline
    once per branch."""
    spark = df.sparkSession
    probe = bloom.probe_udf(spark)
    hashed = _with_hashes(df).withColumn(
        "__maybe", probe(F.col("__h1"), F.col("__h2"))
    )
    probed = None
    if persist:
        hashed = hashed.persist()
        probed = hashed
    maybe = hashed.filter("__maybe").drop("__h1", "__h2", "__maybe")
    fresh = hashed.filter("NOT __maybe").drop("__h1", "__h2", "__maybe")
    return maybe, fresh, probed
