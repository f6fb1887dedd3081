"""Sharded cuckoo filter — the deletable fallback for the URL-seen set.

The north_star pins the seen-set design as "bloom-filter (with
cuckoo-filter fallback for deletes)": a bloom filter cannot unlearn a URL,
so workflows that *invalidate* previously-crawled pages (recrawl after
content change, robots rule tightening, takedown) need a filter with
``delete``. This is the standard partial-key cuckoo filter (Fan et al.,
"Cuckoo Filter: Practically Better Than Bloom", CoNEXT'14): 4-slot
buckets, 16-bit fingerprints, the two candidate buckets related by
``i2 = i1 XOR H(fp)`` so either bucket recovers the other without the key.

Same interface as :class:`~inform_spark.operators.bloom.ShardedBloom`
(``build`` / ``add`` / ``probe_udf`` / ``version``), so the crawl engine's
bloom pre-probe path (`bloom_partition`) runs unchanged with
``CrawlConfig(seen_filter="cuckoo")`` — false positives still get the
exact anti-join re-check, false negatives remain impossible for inserted
keys (overflow during eviction lands in an exact per-shard stash, probed
alongside the table).

Distribution shape mirrors the bloom: hashes JVM-side (``xxhash64``),
per-shard (bucket, fingerprint) entries built by ``applyInPandas`` —
one per distinct url, duplicates preserved so delete() of one key never
erases a colliding key's copy. Deletes take a (small) invalidation
DataFrame; at 10^10
scale both the shards and the deletes stay executor-resident behind the
same interface, only the merge point moves.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from inform_spark.operators.bloom import _with_hashes

SLOTS = 4
MAX_KICKS = 500
_FP_MIX = np.uint64(0x5BD1E995)
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _fingerprints(h2: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprints from h2."""
    u = h2.astype(np.int64).view(np.uint64)
    return ((u % np.uint64(0xFFFF)) + np.uint64(1)).astype(np.uint16)


def _bucket1(h1: np.ndarray, nb: int) -> np.ndarray:
    """Primary bucket from a REMIXED h1 (the shard id already consumed
    h1's low bits via pmod(h1, n_shards); reusing them for the bucket
    would collapse every key in a shard onto 1/n_shards of the buckets)."""
    u = h1.astype(np.int64).view(np.uint64)
    mixed = (u ^ (u >> np.uint64(17))) * _MIX
    return (mixed & np.uint64(nb - 1)).astype(np.int64)


def _alt_bucket(i: np.ndarray, fp: np.ndarray, nb: int) -> np.ndarray:
    """i XOR H(fp) — an involution (alt(alt(i)) == i) since nb is 2^k."""
    fph = fp.astype(np.uint64) * _FP_MIX
    return (i.astype(np.uint64) ^ (fph & np.uint64(nb - 1))).astype(np.int64)


def _insert_many(
    table: np.ndarray, stash: dict[int, int], i1s: np.ndarray, fps: np.ndarray
) -> None:
    """Insert (bucket, fp) pairs with eviction; overflow -> exact stash
    (a multiset: key -> copy count). Deterministic kick pattern
    (slot = kicks % SLOTS), no RNG.

    Standard cuckoo semantics: duplicate fingerprints ARE stored (one copy
    per inserted key). Skipping an "already present" fp would merge two
    DISTINCT keys that collide on (fp, bucket-pair) into one stored copy —
    delete() of one key would then erase the other's membership, a false
    negative the crawl engine's bloom-negative fresh path cannot tolerate.
    Identical URLs are deduped upstream (by url, in ``_entries``)."""
    nb = table.shape[0]
    for i1, fp in zip(i1s.tolist(), fps.tolist()):
        i2 = int(_alt_bucket(np.array([i1]), np.array([fp], dtype=np.uint16), nb)[0])
        placed = False
        for b in (i1, i2):
            empty = np.flatnonzero(table[b] == 0)
            if empty.size:
                table[b, empty[0]] = fp
                placed = True
                break
        if placed:
            continue
        cur_b, cur_fp = i1, fp
        for kick in range(MAX_KICKS):
            slot = kick % SLOTS
            cur_fp, table[cur_b, slot] = int(table[cur_b, slot]), cur_fp
            cur_b = int(
                _alt_bucket(
                    np.array([cur_b]), np.array([cur_fp], dtype=np.uint16), nb
                )[0]
            )
            empty = np.flatnonzero(table[cur_b] == 0)
            if empty.size:
                table[cur_b, empty[0]] = cur_fp
                break
        else:
            key = int(cur_fp) << 32 | cur_b  # exact overflow, probed too
            stash[key] = stash.get(key, 0) + 1


@dataclass
class ShardedCuckoo:
    n_shards: int  # power of two (build pmod == probe uint64-mod only then)
    buckets_per_shard: int  # power of two
    version: int
    shards: dict[int, np.ndarray]  # shard -> (nb, SLOTS) uint16 table
    stashes: dict[int, dict[int, int]]  # shard -> {key: copy count}

    @staticmethod
    def empty(
        n_shards: int = 16, buckets_per_shard: int = 1 << 15
    ) -> "ShardedCuckoo":
        # build computes the shard via signed pmod(h1, n) JVM-side while the
        # probe uses uint64(h1) % n — these agree for negative h1 ONLY when
        # n is a power of two (both reduce to the low bits)
        assert n_shards > 0 and n_shards & (n_shards - 1) == 0
        assert buckets_per_shard & (buckets_per_shard - 1) == 0
        return ShardedCuckoo(n_shards, buckets_per_shard, 0, {}, {})

    @staticmethod
    def build(
        spark: SparkSession,
        urls: DataFrame,
        n_shards: int = 16,
        buckets_per_shard: int = 1 << 15,
        approx_count: int | None = None,
    ) -> "ShardedCuckoo":
        return ShardedCuckoo.empty(n_shards, buckets_per_shard).add(
            spark, urls, approx_count=approx_count
        )

    # below this many urls the groupBy + applyInPandas python-worker spin-up
    # dominates: collect JVM-computed (shard, h1, h2) and derive
    # bucket/fingerprint driver-side with the same numpy helpers instead
    SMALL_ADD_MAX = 1 << 16

    # -- shared hashing ----------------------------------------------------
    def _entries(
        self, spark: SparkSession, urls: DataFrame, approx_count: int | None = None
    ):
        """Distributed: (shard, bucket1, fp) rows — one per DISTINCT url.
        Dedup is by the full (h1, h2) hash pair (identical urls hash
        identically; a cross-url 128-bit collision is negligible), NEVER by
        the 16-bit (bucket, fp): two distinct urls colliding there must
        each store a copy, or delete() of one would erase the other (a
        false negative). ``approx_count``-provably-small sets skip the
        shuffle and python workers (hashes still JVM xxhash64 — entries
        are identical)."""
        nb = self.buckets_per_shard
        hashed = _with_hashes(urls).select(
            F.pmod(F.col("__h1"), F.lit(self.n_shards)).cast("int").alias("shard"),
            "__h1",
            "__h2",
        )

        if approx_count is not None and approx_count <= self.SMALL_ADD_MAX:
            collected = hashed.collect()  # JVM-only narrow job
            seen_h: set[tuple[int, int]] = set()
            small = []
            for r in collected:
                hk = (r["__h1"], r["__h2"])
                if hk not in seen_h:
                    seen_h.add(hk)
                    small.append(r)
            if not small:
                return []
            buckets = _bucket1(
                np.array([r["__h1"] for r in small], dtype=np.int64), nb
            )
            fps = _fingerprints(
                np.array([r["__h2"] for r in small], dtype=np.int64)
            )
            return [
                {"shard": r["shard"], "bucket": int(b), "fp": int(fp)}
                for r, b, fp in zip(small, buckets, fps)
            ]

        def prep(pdf: pd.DataFrame) -> pd.DataFrame:
            if pdf.empty:
                return pd.DataFrame({"shard": [], "bucket": [], "fp": []})
            shard = int(pdf["shard"].iloc[0])
            # dedup identical urls via their full hash pair; NEVER by the
            # 16-bit (bucket, fp) — colliding distinct urls each keep a copy
            pdf = pdf.drop_duplicates(subset=["__h1", "__h2"])
            fps = _fingerprints(pdf["__h2"].to_numpy())
            b1 = _bucket1(pdf["__h1"].to_numpy(), nb)
            ent = pd.DataFrame({"bucket": b1, "fp": fps.astype(np.int64)})
            ent.insert(0, "shard", shard)
            return ent

        return (
            hashed.groupBy("shard")
            .applyInPandas(prep, schema="shard int, bucket long, fp long")
            .collect()
        )

    def add(
        self,
        spark: SparkSession,
        urls: DataFrame,
        approx_count: int | None = None,
    ) -> "ShardedCuckoo":
        """Fold urls in; returns a NEW versioned filter (immutable snapshots
        like ShardedBloom, so lineage can pin versions)."""
        rows = self._entries(spark, urls, approx_count=approx_count)
        shards = {k: v.copy() for k, v in self.shards.items()}
        stashes = {k: dict(v) for k, v in self.stashes.items()}
        by_shard: dict[int, list[tuple[int, int]]] = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append((r["bucket"], r["fp"]))
        for sid, ents in by_shard.items():
            table = shards.get(sid)
            if table is None:
                table = np.zeros((self.buckets_per_shard, SLOTS), dtype=np.uint16)
            stash = stashes.setdefault(sid, {})
            arr = np.array(ents, dtype=np.int64)
            _insert_many(table, stash, arr[:, 0], arr[:, 1].astype(np.uint16))
            shards[sid] = table
        return ShardedCuckoo(
            self.n_shards, self.buckets_per_shard, self.version + 1, shards, stashes
        )

    def delete(
        self,
        spark: SparkSession,
        urls: DataFrame,
        approx_count: int | None = None,
    ) -> "ShardedCuckoo":
        """Remove urls (the operation blooms cannot do): drops ONE matching
        fingerprint per key from its candidate buckets / stash. Deleting a
        never-inserted key can only remove a colliding fingerprint — i.e.
        turn a false positive into a miss — so membership stays sound for
        all keys still inserted (standard cuckoo-filter contract: only
        delete what you inserted). ``approx_count``: same small-set fast
        path as :meth:`add` (invalidation lists are typically a handful
        of urls — no shuffle, no python workers)."""
        rows = self._entries(spark, urls, approx_count=approx_count)
        shards = {k: v.copy() for k, v in self.shards.items()}
        stashes = {k: dict(v) for k, v in self.stashes.items()}
        nb = self.buckets_per_shard
        for r in rows:
            table = shards.get(r["shard"])
            if table is None:
                continue
            fp = np.uint16(r["fp"])
            i1 = int(r["bucket"])
            i2 = int(_alt_bucket(np.array([i1]), np.array([fp]), nb)[0])
            stash = stashes.get(r["shard"], {})
            removed = False
            for b in (i1, i2):
                hit = np.flatnonzero(table[b] == fp)
                if hit.size:
                    table[b, hit[0]] = 0
                    removed = True
                    break
            if not removed:
                # a stashed entry recorded whichever bucket the eviction
                # chain ended at — either candidate is possible; decrement
                # ONE copy (multiset), never erase other keys' copies
                for b in (i1, i2):
                    key = int(fp) << 32 | b
                    if stash.get(key, 0) > 0:
                        stash[key] -= 1
                        if stash[key] == 0:
                            del stash[key]
                        break
        return ShardedCuckoo(
            self.n_shards, nb, self.version + 1, shards, stashes
        )

    # ------------------------------------------------------------------
    def probe_udf(self, spark: SparkSession):
        """pandas UDF (h1, h2) -> maybe_member — drop-in for ShardedBloom's
        (bloom_partition and therefore the crawl engine use it unchanged).
        Memoized per (immutable) filter snapshot like ShardedBloom's, so
        the table broadcast happens once per version, not per batch."""
        cached = getattr(self, "_probe_udf", None)
        if cached is not None:
            return cached
        bc = spark.sparkContext.broadcast(
            {
                "shards": self.shards,
                # membership only — counts stay driver-side for delete
                "stashes": {
                    k: frozenset(kk for kk, c in v.items() if c > 0)
                    for k, v in self.stashes.items()
                },
                "nb": self.buckets_per_shard,
                "n": self.n_shards,
            }
        )

        @pandas_udf(BooleanType())
        def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
            st = bc.value
            nb, n = st["nb"], st["n"]
            a1 = h1.to_numpy()
            a2 = h2.to_numpy()
            shard_ids = (a1.view(np.uint64) % np.uint64(n)).astype(np.int64)
            fps = _fingerprints(a2)
            b1 = _bucket1(a1, nb)
            b2 = _alt_bucket(b1, fps, nb)
            out = np.zeros(len(a1), dtype=bool)
            for sid in np.unique(shard_ids):
                table = st["shards"].get(int(sid))
                mask = shard_ids == sid
                if table is None:
                    continue
                t1 = table[b1[mask]]
                t2 = table[b2[mask]]
                f = fps[mask][:, None]
                hit = (t1 == f).any(axis=1) | (t2 == f).any(axis=1)
                stash = st["stashes"].get(int(sid))
                if stash:
                    # stashed under whichever candidate bucket the eviction
                    # chain ended at -> probe both
                    f64 = fps[mask].astype(np.int64) << 32
                    k1 = f64 | b1[mask].astype(np.int64)
                    k2 = f64 | b2[mask].astype(np.int64)
                    hit |= np.fromiter(
                        (int(a) in stash or int(b) in stash
                         for a, b in zip(k1, k2)),
                        dtype=bool, count=len(k1),
                    )
                out[mask] = hit
            return pd.Series(out)

        object.__setattr__(self, "_probe_udf", probe)
        return probe
