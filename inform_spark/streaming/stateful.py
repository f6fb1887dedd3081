"""Custom stateful streaming operator: per-host politeness admission.

The crawl engine's T2 politeness budget (reference crawl-delay semantics,
src/WebCrawler.js:265-267; batch formulation plans/crawl.py
``_select_batch``) re-expressed as a CONTINUOUS operator: given an
unbounded stream of fetch candidates, admit at most ``budget`` per host
per event-time window and defer the rest — the state (current window,
tokens used) lives in Spark's state store per host, checkpointed and
restored across restarts like the rest of Structured Streaming state.

Two formulations with identical semantics on in-order input:

- :func:`paced_admissions_stream` — ``applyInPandasWithState`` (grouped
  by host, Arrow-batched pandas per group; state schema is columnar, no
  Python objects in the store). Deterministic contract: rows are decided
  in (ts, url) order within each micro-batch; a LATE row whose window
  precedes the host's current state window is conservatively DEFERRED
  (politeness must never over-admit, so late arrivals never get tokens
  retroactively).
- :func:`paced_admissions_batch` — the pure-DataFrame equivalent (one
  shuffle on host; per-(host, window) rank), DuckDB-checkable
  (``__spark_entry__.oracle_sql``: ``t3_paced_admissions``).

Scale: state is O(active hosts) × 16 bytes; the shuffle key is the host,
so hot-host skew in the *candidate* stream concentrates in one task —
at 10^8-host scale feed this operator the output of the engine's salted
per-host pre-rank, which already bounds any single host's rows per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ADMISSIONS = StructType(
    [
        StructField("host", StringType(), False),
        StructField("url", StringType(), False),
        StructField("ts", TimestampType(), False),
        StructField("window_start_ms", LongType(), False),
        StructField("admitted", BooleanType(), False),
    ]
)

# state: the host's current event-time window and tokens used inside it
_STATE = StructType(
    [
        StructField("window_ms", LongType(), True),
        StructField("used", LongType(), True),
    ]
)


def paced_admissions_stream(
    candidates: DataFrame,
    budget: int = 3,
    window_ms: int = 60_000,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming form. ``candidates`` needs (host, url, ts) columns."""

    def decide(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (host,) = key
        if state.exists:
            cur_win, used = state.get
        else:
            cur_win, used = -1, 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "url"], kind="mergesort")
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
            wins = (ts_ms // window_ms) * window_ms
            admitted = []
            for w in wins:
                if w > cur_win:
                    cur_win, used = int(w), 0
                if w == cur_win and used < budget:
                    used += 1
                    admitted.append(True)
                else:
                    # over budget, or late (w < cur_win): defer — never
                    # hand out tokens retroactively
                    admitted.append(False)
            yield pd.DataFrame(
                {
                    "host": host,
                    "url": pdf["url"].to_numpy(),
                    "ts": pdf["ts"].to_numpy(),
                    "window_start_ms": wins,
                    "admitted": admitted,
                }
            )
        state.update((cur_win, used))

    df = candidates.withColumn("ts", F.col("ts").cast("timestamp"))
    df = df.withWatermark("ts", watermark)
    return df.groupBy("host").applyInPandasWithState(
        decide,
        outputStructType=ADMISSIONS,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def _windowed_admissions(
    df: DataFrame, key_col: str, budget: int, window_ms: int,
    out_cols: list[str],
) -> DataFrame:
    """Shared admission kernel for the batch politeness forms: assign
    the event-time window with pure integer arithmetic (m - m % w —
    exact, identical to DuckDB's epoch_ms oracle, no double rounding
    at 1.7e12-ms magnitudes) and rank (ts, url) within each
    (key, window) group. ONE implementation so the host- and IP-keyed
    forms can never drift in their window math."""
    from pyspark.sql import Window

    m = F.unix_millis(F.col("ts").cast("timestamp"))
    win_ms = m - (m % F.lit(window_ms))
    w = Window.partitionBy(key_col, "window_start_ms").orderBy("ts", "url")
    return (
        df.withColumn("window_start_ms", win_ms)
        .withColumn("admitted", F.row_number().over(w) <= F.lit(budget))
        .select(
            *out_cols,
            F.col("ts").cast("timestamp").alias("ts"),
            "window_start_ms",
            "admitted",
        )
    )


def paced_admissions_batch(
    candidates: DataFrame,
    budget: int = 3,
    window_ms: int = 60_000,
) -> DataFrame:
    """Batch form: identical output on in-order input, one shuffle on
    (host, window); the per-(host, window) window never collapses to a
    single global partition."""
    return _windowed_admissions(
        candidates, "host", budget, window_ms, ["host", "url"]
    )


def ip_paced_admissions(
    candidates: DataFrame,
    dns: DataFrame,
    budget: int = 3,
    window_ms: int = 60_000,
) -> DataFrame:
    """Politeness at the *IP* granularity: virtual-hosting and CDNs put
    many hostnames behind one address, and a polite crawler budgets the
    ADDRESS it actually connects to, not the name (the classic Mercator
    politeness refinement — Heydon & Najork 1999 key fetches by server,
    and IRLbot keys its budget on the IP to defeat spam host farms).
    The reference crawls a single site so host==server always holds
    there (src/WebCrawler.js:265-267); at web scale the distinction is
    load-bearing: a host farm of 10^4 names on one IP would otherwise
    multiply the per-server budget 10^4-fold.

    ``dns`` is the resolver dimension ``(host, ip)`` — one row per
    host, as produced by any async resolver stage; it is BROADCAST
    (10^8 hosts x ~30 B fits executor memory; beyond that, bucket both
    sides on host). Hosts with no DNS row get ``ip = host`` (self
    budget — never admit-by-accident into a shared bucket).

    Output = ``paced_admissions_batch``'s contract plus the ``ip``
    column, decided per (ip, window) in (ts, url) order (the window
    math is the SHARED ``_windowed_admissions`` kernel — the two forms
    cannot drift). One broadcast join + one shuffle on (ip, window);
    same skew note as the host form — feed it the salted per-host
    pre-rank at frontier scale. ``candidates`` must not already carry
    an ``ip`` column (refused loudly — the dns join would make every
    downstream ``ip`` reference ambiguous).
    """
    if "ip" in candidates.columns:
        raise ValueError(
            "ip_paced_admissions derives the 'ip' column from the dns "
            "dim; rename the candidates' existing 'ip' column first"
        )
    # the documented resolve_hosts pattern ('append/merge it back by
    # host') yields a multi-row-per-host cache; joining it raw would
    # fan candidates out (duplicate admissions, double-spent budget).
    # Merge-on-read with the shared newest-wins kernel.
    from inform_spark.operators.dns import dedup_dns_dim

    dns1 = dedup_dns_dim(dns).select(
        "host", F.col("ip").alias("__dns_ip")
    )
    joined = candidates.join(
        F.broadcast(dns1), "host", "left"
    ).withColumn("ip", F.coalesce(F.col("__dns_ip"), F.col("host")))
    return _windowed_admissions(
        joined, "ip", budget, window_ms, ["ip", "host", "url"]
    )
