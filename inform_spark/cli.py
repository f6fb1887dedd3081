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
    # NB: value-options default to None so that an unset flag never
    # overrides config-file layers (reference src/config.js:140-166 only
    # lets EXPLICITLY-set flags win); hard defaults live in config.DEFAULTS.
    p.add_argument("url", help="seed URL (web), github URL (git), or feed URL")
    p.add_argument("--limit", type=int, default=None,
                   help="max pages / feed items to attempt (default 100/50)")
    p.add_argument("--delay", type=int, default=None,
                   help="per-host politeness delay ms (default 2000, "
                        "reference config.js DEFAULTS)")
    p.add_argument("--max-queue-size", type=int, default=None,
                   help="frontier cap, drop-new (default 10000)")
    p.add_argument("--max-depth", type=int, default=None)
    p.add_argument("--template-cap", type=int, default=None,
                   help="crawler-trap damping: admit at most N new urls per "
                        "(host, url-path template) per batch (default off)")
    p.add_argument("--include", action="append", default=None,
                   help="minimatch-style include glob (repeatable)")
    p.add_argument("--exclude", action="append", default=None,
                   help="minimatch-style exclude glob (repeatable)")
    p.add_argument("--ignore-robots", action="store_true")
    p.add_argument("--raw", action="store_true",
                   help="write extracted HTML instead of markdown "
                        "(reference --raw, src/WebCrawler.js:336-341)")
    p.add_argument("--digest", action="store_true",
                   help="feed mode: write ONE digest file with a TOC instead "
                        "of per-item files (src/sources/render.js:192-266)")
    p.add_argument("--output-dir", default=None,
                   help="where output files land (default crawled-pages)")
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
    """Full 4-layer precedence (defaults < file globals < per-target < CLI)
    via functions.config.options_for_target — the documented/tested config
    shape is {globals: {...}, targets: [{url, ...}, ...]} (a LIST)."""
    from inform_spark.functions.config import load_config, options_for_target

    cli = {
        k: v
        for k, v in {
            "limit": args.limit, "delay": args.delay,
            "max_queue_size": args.max_queue_size,
            "include": args.include, "exclude": args.exclude,
            "ignore_robots": args.ignore_robots or None,
            "raw": args.raw or None,
            "max_depth": args.max_depth,
            "template_cap": args.template_cap,
            "output_dir": args.output_dir,
        }.items()
        if v is not None
    }
    config = load_config(args.config) if args.config else {}
    return options_for_target(config, args.url, cli)


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
    # Driver-side admission budget gets HEADROOM (delay x 16): the exact
    # per-host pacing is enforced executor-side by http_min_interval_ms, so
    # a 1-URL-per-host-per-batch budget would only multiply per-batch Spark
    # overhead without changing the request schedule.
    delay = opts["delay"]
    output_dir = opts.get("output_dir", "crawled-pages")
    cfg = CrawlConfig(
        seeds=[seed],
        limit=opts["limit"],
        max_retries=opts.get("max_retries", 3),
        max_queue_size=opts.get("max_queue_size"),
        include=opts.get("include"),
        exclude=opts.get("exclude"),
        ignore_robots=bool(opts.get("ignore_robots")),
        default_delay_ms=delay,
        batch_wall_budget_ms=delay * 16 if delay > 0 else None,
        max_depth=opts.get("max_depth"),
        template_cap=opts.get("template_cap"),
        fetch_mode="http",
        http_min_interval_ms=delay,
        use_bloom=True,
        raw=bool(opts.get("raw")),
    )
    eng = CrawlEngine(spark, None, robots, cfg,
                      checkpoint_dir=args.checkpoint_dir)
    summary = eng.run(resume=args.resume)
    n = _write_documents(eng.documents(), output_dir)
    print(f"Crawl complete: {summary.ok} ok, {summary.failed} failed, "
          f"{summary.skipped_non_html} non-html, {n} documents -> "
          f"{output_dir}")
    for r in (
        eng.seen().filter("status = 'failed'").select("url", "error").collect()
    ):
        print(f"  failed: {r['url']} ({r['error']})", file=sys.stderr)
    # reference exit-code policy (src/cli.js:240-243): nonzero only when
    # nothing succeeded
    return 0 if summary.ok > 0 else 1


def run_git(args, opts, spark) -> int:
    """Git mode (E2 lifecycle, reference src/GitCrawler.js:92-118): parse the
    github URL, walk the contents API with the live lister, fetch big files
    by download_url, write files to the output dir."""
    from inform_spark.functions.giturl import parse_git_url
    from inform_spark.plans.gitcrawl import GitCrawlEngine
    from inform_spark.sources.githubapi import (
        fetch_download_urls,
        make_listing_fetcher,
    )

    repo = parse_git_url(args.url)
    if opts.get("github_api_base"):
        repo.api_url = opts["github_api_base"].rstrip("/")
    token = opts.get("github_token")
    output_dir = opts.get("output_dir", "crawled-pages")
    fetch_kw = dict(
        token=token,
        max_retries=opts.get("max_retries", 3),
        min_interval_ms=opts.get("git_delay", 0),
    )
    lister = make_listing_fetcher(repo, **fetch_kw)
    eng = GitCrawlEngine(
        spark, None, repo,
        include=opts.get("include"), exclude=opts.get("exclude"),
        output_dir=output_dir, lister=lister,
    )
    files = fetch_download_urls(eng.run(), **fetch_kw)

    os.makedirs(output_dir, exist_ok=True)

    def write_partition(rows):
        for row in rows:
            path = row["local_path"]
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            if row["is_binary"]:
                with open(path, "wb") as f:
                    f.write(bytes(row["data"] or b""))
            else:
                with open(path, "w") as f:
                    f.write(row["text"] or "")

    files.foreachPartition(write_partition)
    s = eng.summary
    print(f"Download complete: {s.files_downloaded} files, "
          f"{s.dirs_listed} dirs listed ({s.rounds} rounds), "
          f"{s.dirs_failed} dir errors -> {output_dir}")
    return 0 if s.files_downloaded > 0 else 1


def run_feed(args, opts, spark) -> int:
    """Feed mode (E3 lifecycle, reference src/FeedCrawler.js:120-186):
    live-fetch the source, parse to items, dedup, render, write
    ``feeds/<kind>/[date-]slug.md`` files (or one digest with --digest)."""
    from inform_spark.sources.feeds import (
        dedup_items,
        detect_source_kind,
        enrich_youtube_transcripts,
        fetch_feed_bodies,
        ingest_feeds,
        render_digest,
        render_items,
    )

    kind = detect_source_kind(args.url) or "rss"
    output_dir = opts.get("output_dir", "crawled-pages")
    feeds = spark.createDataFrame(
        [(args.url, kind)], "input_url string, kind string"
    )
    bodies = fetch_feed_bodies(feeds, opts)
    items = ingest_feeds(bodies, limit=opts.get("limit", 50))
    if kind == "youtube" and opts.get("yt_include_transcript", True):
        items = enrich_youtube_transcripts(items, opts)
    items = dedup_items(items)
    errors = [
        r["content_text"]
        for r in items.filter("kind = 'error'").select("content_text").collect()
    ]
    items = items.filter("kind != 'error'")

    os.makedirs(output_dir, exist_ok=True)
    if args.digest:
        from datetime import datetime, timezone

        rows = [r.asDict() for r in items.collect()]
        for r in rows:
            r["tags"] = list(r["tags"]) if r["tags"] is not None else None
        rows.sort(key=lambda r: (r["published_at"] or "", r["id"]))
        md = render_digest(
            rows,
            title=f"Feed Digest: {args.url}",
            generated_at=datetime.now(timezone.utc).isoformat(),
        )
        path = os.path.join(output_dir, "feeds", kind, "digest.md")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(md)
        n = len(rows)
    else:
        rendered = render_items(items)

        def write_partition(rows):
            for row in rows:
                path = os.path.join(output_dir, row["doc_path"])
                os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
                with open(path, "w") as f:
                    f.write(row["markdown"])

        rendered.foreachPartition(write_partition)
        n = rendered.count()
    print(f"Feed ingestion complete ({kind}): {n} items -> {output_dir}")
    for e in errors:
        print(f"  failed: {e}", file=sys.stderr)
    return 0 if n > 0 else 1


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    opts = _load_config_layers(args)

    from inform_spark.functions.giturl import is_git_url
    from inform_spark.session import get_spark
    from inform_spark.sources.feeds import should_use_feed_mode

    spark = get_spark(master=args.master)
    # mode dispatch (reference src/cli.js:206-248): git > feed > web
    if is_git_url(args.url):
        return run_git(args, opts, spark)
    if args.feed or should_use_feed_mode(args.url):
        return run_feed(args, opts, spark)
    return run_web(args, opts, spark)


if __name__ == "__main__":
    raise SystemExit(main())
