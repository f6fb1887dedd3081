"""CLI entry point: ``python -m inform_spark <url> [options]``.

Mirrors the reference's CLI surface (src/cli.js:256-449 parseArgs,
:206-248 mode dispatch) on top of the Spark engine:

- web mode (default): URL-frontier crawl with the live HTTP fetcher,
  robots.txt fetched per origin, markdown written to --output-dir using
  the reference's URL->filepath rules (X5).
- git mode: github.com URLs dispatch to the dir-frontier GitCrawler
  (GitUrlParser.isGitUrl, src/GitUrlParser.js:10-28).
- feed mode: --feed or a feed-looking URL dispatches to the feed ingesters
  (shouldUseFeedMode, src/sources/index.js:114-136).

Config precedence (src/config.js:140-166): defaults < config file globals
< per-target < CLI flags, arrays unioned between layers, CLI replaces.
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="inform-spark",
        description="PySpark-native web crawler / HTML->Markdown converter",
    )
    p.add_argument("url", help="seed URL (web), github URL (git), or feed URL")
    p.add_argument("--limit", type=int, default=100,
                   help="max pages to attempt (reference --limit, default 100)")
    p.add_argument("--delay", type=int, default=1000,
                   help="per-host politeness delay ms (default 1000)")
    p.add_argument("--max-queue-size", type=int, default=10_000,
                   help="frontier cap, drop-new (default 10000)")
    p.add_argument("--max-depth", type=int, default=None)
    p.add_argument("--include", action="append", default=None,
                   help="minimatch-style include glob (repeatable)")
    p.add_argument("--exclude", action="append", default=None,
                   help="minimatch-style exclude glob (repeatable)")
    p.add_argument("--ignore-robots", action="store_true")
    p.add_argument("--output-dir", default="crawled-docs",
                   help="where markdown files land (default crawled-docs)")
    p.add_argument("--checkpoint-dir", default=None,
                   help="Iceberg-style snapshot dir (resumable); temp if unset")
    p.add_argument("--resume", action="store_true",
                   help="resume from --checkpoint-dir")
    p.add_argument("--feed", action="store_true", help="force feed mode")
    p.add_argument("--config", default=None, help="YAML config file")
    p.add_argument("--master", default=None,
                   help="Spark master (default local[*])")
    return p


def _load_config_layers(args) -> dict:
    from inform_spark.functions.config import merge_options

    defaults = {
        "limit": 100, "delay": 1000, "max_queue_size": 10_000,
        "include": None, "exclude": None, "ignore_robots": False,
    }
    file_globals, target = {}, {}
    if args.config:
        import yaml

        with open(args.config) as f:
            loaded = yaml.safe_load(f) or {}
        file_globals = loaded.get("globals", {}) or {}
        targets = loaded.get("targets", {}) or {}
        target = targets.get(args.url, {}) or {}
    cli = {
        k: v
        for k, v in {
            "limit": args.limit, "delay": args.delay,
            "max_queue_size": args.max_queue_size,
            "include": args.include, "exclude": args.exclude,
            "ignore_robots": args.ignore_robots or None,
            "max_depth": args.max_depth,
        }.items()
        if v is not None
    }
    return merge_options(defaults, file_globals, target, cli)


def _write_documents(docs_df, output_dir: str) -> int:
    """S9 sink: one markdown file per document at its X5-derived path.
    Distributed write via foreachPartition (shared filesystem), matching the
    reference's outputDir layout (src/WebCrawler.js:343-346)."""
    os.makedirs(output_dir, exist_ok=True)

    def write_partition(rows):
        from inform_spark.functions.spans import spans_to_markdown

        for row in rows:
            path = os.path.join(output_dir, row["doc_id"])
            os.makedirs(os.path.dirname(path) or output_dir, exist_ok=True)
            spans = [s.asDict() for s in row["spans"]]
            with open(path, "w") as f:
                f.write(spans_to_markdown(spans))

    docs_df.select("doc_id", "spans").foreachPartition(write_partition)
    return docs_df.count()


def run_web(args, opts, spark) -> int:
    from inform_spark.functions.urls import normalize_url, url_host
    from inform_spark.plans.crawl import CrawlConfig, CrawlEngine
    from inform_spark.sources.httpfetch import fetch_robots_df

    seed = normalize_url(args.url)
    origin = seed.split("/", 3)
    origin = f"{origin[0]}//{origin[2]}"
    robots = None
    if not opts.get("ignore_robots"):
        robots = fetch_robots_df(spark, [origin])
    cfg = CrawlConfig(
        seeds=[seed],
        limit=opts["limit"],
        max_queue_size=opts.get("max_queue_size"),
        include=opts.get("include"),
        exclude=opts.get("exclude"),
        ignore_robots=bool(opts.get("ignore_robots")),
        default_delay_ms=opts["delay"],
        batch_wall_budget_ms=opts["delay"] if opts["delay"] > 0 else None,
        max_depth=opts.get("max_depth"),
        fetch_mode="http",
        http_min_interval_ms=opts["delay"],
        use_bloom=True,
    )
    eng = CrawlEngine(spark, None, robots, cfg,
                      checkpoint_dir=args.checkpoint_dir)
    summary = eng.run(resume=args.resume)
    n = _write_documents(eng.documents(), args.output_dir)
    print(f"Crawl complete: {summary.ok} ok, {summary.failed} failed, "
          f"{summary.skipped_non_html} non-html, {n} documents -> "
          f"{args.output_dir}")
    for r in (
        eng.seen().filter("status = 'failed'").select("url", "error").collect()
    ):
        print(f"  failed: {r['url']} ({r['error']})", file=sys.stderr)
    # reference exit-code policy (src/cli.js:240-243): nonzero only when
    # nothing succeeded
    return 0 if summary.ok > 0 else 1


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    opts = _load_config_layers(args)

    from inform_spark.functions.giturl import is_git_url
    from inform_spark.session import get_spark
    from inform_spark.sources.feeds import should_use_feed_mode

    spark = get_spark(master=args.master)
    if is_git_url(args.url):
        print("git mode: use inform_spark.plans.gitcrawl.GitCrawlEngine "
              "(contents-API listing requires a listing DataFrame or token)")
        return 2
    if args.feed or should_use_feed_mode(args.url):
        from inform_spark.sources.feeds import detect_source_kind

        kind = detect_source_kind(args.url) or "rss"
        print(f"feed mode ({kind}): fetch+parse via "
              "inform_spark.sources.feeds.ingest_feeds")
        return 2
    return run_web(args, opts, spark)


if __name__ == "__main__":
    raise SystemExit(main())
