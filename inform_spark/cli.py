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

# reference src/cli.js:17 — version from env with the same fallback
VERSION = os.environ.get("INFORM_VERSION", "0.1.0")

# how many failed URLs to LIST on stderr; the total is always printed.
# The reference dumps its whole in-memory failures map — at crawl scale a
# dead host would make that the one O(crawl) driver-side collect, so the
# listing is capped (never the count).
FAILED_LIST_CAP = 100


class _Parser(argparse.ArgumentParser):
    """argparse with the reference CLI's error contract (src/cli.js
    parseArgs): invalid flags/values print ``Error: ...`` on stderr and
    exit with code 1 (argparse's default is exit code 2)."""

    def error(self, message):
        print(f"Error: {message}", file=sys.stderr)
        raise SystemExit(1)


def _int_arg(flag: str, minimum: int):
    """Reference-style integer validation (src/cli.js:316-382): NaN or
    out-of-range -> 'Error: --flag must be a ...' + exit 1."""
    kind = "a positive number" if minimum > 0 else "a non-negative number"

    def parse(v: str):
        try:
            n = int(v)
        except ValueError:
            raise argparse.ArgumentTypeError(f"{flag} must be {kind}")
        if n < minimum:
            raise argparse.ArgumentTypeError(f"{flag} must be {kind}")
        return n

    parse.__name__ = "int"
    return parse


def build_parser() -> argparse.ArgumentParser:
    p = _Parser(
        prog="inform-spark",
        description="PySpark-native web crawler / HTML->Markdown converter",
    )
    # NB: value-options default to None so that an unset flag never
    # overrides config-file layers (reference src/config.js:140-166 only
    # lets EXPLICITLY-set flags win); hard defaults live in config.DEFAULTS.
    # url is optional: a YAML path works as shortcut config syntax and a
    # config file can supply the first target (src/cli.js:140-173).
    p.add_argument("url", nargs="?", default=None,
                   help="seed URL (web), github URL (git), feed URL, or a "
                        "YAML config path (shortcut syntax)")
    p.add_argument("-v", "--version", action="version", version=VERSION)
    p.add_argument("--limit", type=_int_arg("--limit", 1), default=None,
                   help="max pages / feed items to attempt (default 100/50)")
    p.add_argument("--delay", type=_int_arg("--delay", 0), default=None,
                   help="per-host politeness delay ms (default 2000, "
                        "reference config.js DEFAULTS)")
    p.add_argument("--concurrency", type=_int_arg("--concurrency", 1),
                   default=None,
                   help="parallel fetches (maps to fetch/render partitions)")
    p.add_argument("--max-retries", type=_int_arg("--max-retries", 0),
                   default=None,
                   help="retry attempts for retryable statuses (default 3)")
    p.add_argument("--max-queue-size",
                   type=_int_arg("--max-queue-size", 1), default=None,
                   help="frontier cap, drop-new (default 10000)")
    p.add_argument(
        "--max-depth", type=_int_arg("--max-depth", 0), default=None
    )
    p.add_argument("--template-cap",
                   type=_int_arg("--template-cap", 1), default=None,
                   help="crawler-trap damping: admit at most N new urls per "
                        "(host, url-path template) per batch (default off)")
    p.add_argument("--include", action="append", default=None,
                   help="minimatch-style include glob (repeatable)")
    p.add_argument("--exclude", action="append", default=None,
                   help="minimatch-style exclude glob (repeatable)")
    p.add_argument("--ignore-robots", action="store_true")
    p.add_argument("--ignore-errors", action="store_true",
                   help="exit 0 even when some fetches failed "
                        "(reference src/cli.js:214,229,241)")
    p.add_argument("--verbose", action="store_true",
                   help="verbose logging (Spark INFO level)")
    p.add_argument("--quiet", action="store_true",
                   help="suppress non-error output")
    p.add_argument("--raw", action="store_true",
                   help="write extracted HTML instead of markdown "
                        "(reference --raw, src/WebCrawler.js:336-341)")
    p.add_argument("--digest", action="store_true",
                   help="feed mode: write ONE digest file with a TOC instead "
                        "of per-item files (src/sources/render.js:192-266)")
    p.add_argument("-o", "--output-dir", default=None,
                   help="where output files land (default crawled-pages)")
    p.add_argument("--checkpoint-dir", default=None,
                   help="Iceberg-style snapshot dir (resumable); temp if unset")
    p.add_argument("--resume", action="store_true",
                   help="resume from --checkpoint-dir")
    p.add_argument("--feed", action="store_true", help="force feed mode")
    # feed source options (reference src/cli.js:396-438)
    p.add_argument("--yt-lang", default=None,
                   help="YouTube transcript language code (default en)")
    p.add_argument("--no-yt-transcript", action="store_const", const=False,
                   default=None, dest="yt_include_transcript",
                   help="skip YouTube transcript fetching")
    p.add_argument("--x-bearer-token", default=None,
                   help="X API v2 bearer token")
    p.add_argument("--x-rss-template", default=None,
                   help="X RSS fallback URL template ({user} placeholder)")
    p.add_argument("--bsky-api-base", default=None,
                   help="Bluesky XRPC API base URL")
    p.add_argument("--x-api-base", default=None, help="X API base URL")
    p.add_argument("-c", "--config", default=None, help="YAML config file")
    p.add_argument("--master", default=None,
                   help="Spark master (default local[*])")
    return p


def _is_yaml_path(path: str | None) -> bool:
    """Shortcut config syntax (reference src/cli.js:121-124): a .yaml/.yml
    positional is a config file, not a URL."""
    return bool(path) and path.lower().endswith((".yaml", ".yml"))


def _load_config_layers(args) -> dict:
    """Full 4-layer precedence (defaults < file globals < per-target < CLI)
    via functions.config.options_for_target — the documented/tested config
    shape is {globals: {...}, targets: [{url, ...}, ...]} (a LIST)."""
    from inform_spark.functions.config import load_config, options_for_target

    cli = {
        k: v
        for k, v in {
            "limit": args.limit, "delay": args.delay,
            "concurrency": args.concurrency,
            "max_retries": args.max_retries,
            "max_queue_size": args.max_queue_size,
            "include": args.include, "exclude": args.exclude,
            "ignore_robots": args.ignore_robots or None,
            "ignore_errors": args.ignore_errors or None,
            "raw": args.raw or None,
            "max_depth": args.max_depth,
            "template_cap": args.template_cap,
            "output_dir": args.output_dir,
            "yt_lang": args.yt_lang,
            "yt_include_transcript": args.yt_include_transcript,
            "x_bearer_token": args.x_bearer_token,
            "x_rss_template": args.x_rss_template,
            "bsky_api_base": args.bsky_api_base,
            "x_api_base": args.x_api_base,
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
        # --concurrency N = N parallel fetch/render slots per batch
        # (the reference's N concurrent workers, src/WebCrawler.js)
        render_partitions=opts.get("concurrency"),
    )
    eng = CrawlEngine(spark, None, robots, cfg,
                      checkpoint_dir=args.checkpoint_dir)
    summary = eng.run(resume=args.resume)
    n = _write_documents(eng.documents(), output_dir)
    if not args.quiet:
        print(f"Crawl complete: {summary.ok} ok, {summary.failed} failed, "
              f"{summary.skipped_non_html} non-html, {n} documents -> "
              f"{output_dir}")
    # failed listing is CAPPED (never an O(crawl) driver collect — a dead
    # host at scale could fail millions of URLs); total always reported
    failed = (
        eng.seen().filter("status = 'failed'").select("url", "error")
        .limit(FAILED_LIST_CAP + 1).collect()
    )
    for r in failed[:FAILED_LIST_CAP]:
        print(f"  failed: {r['url']} ({r['error']})", file=sys.stderr)
    if summary.failed > FAILED_LIST_CAP:
        print(
            f"  ... and {summary.failed - FAILED_LIST_CAP} more "
            f"({summary.failed} failed total)",
            file=sys.stderr,
        )
    # reference exit-code policy (src/cli.js:241-243): nonzero iff anything
    # failed and --ignore-errors is not set
    return 1 if summary.failed > 0 and not opts.get("ignore_errors") else 0


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
    files = fetch_download_urls(eng.run(), **fetch_kw).persist()

    os.makedirs(output_dir, exist_ok=True)

    def write_partition(rows):
        for row in rows:
            if row["fetch_failed"]:
                continue
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
    # one aggregation job over the persisted relation instead of two
    # separate count() scans
    from pyspark.sql import functions as F

    counts = files.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("fetch_failed").cast("long")).alias("nf"),
    ).collect()[0]
    s.files_failed = int(counts["nf"] or 0)
    s.files_downloaded = int(counts["n"]) - s.files_failed
    files.unpersist()
    if not args.quiet:
        print(f"Download complete: {s.files_downloaded} files, "
              f"{s.dirs_listed} dirs listed ({s.rounds} rounds), "
              f"{s.dirs_failed} dir errors, {s.files_failed} file errors "
              f"-> {output_dir}")
    # reference exit-code policy (src/cli.js:229-231): rc=1 iff anything
    # FAILED (dir listing or file download) and --ignore-errors is off; an
    # empty-but-error-free repo exits 0 (crawler.failures is empty there).
    if (s.dirs_failed + s.files_failed) > 0 and not opts.get("ignore_errors"):
        return 1
    return 0


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
    # feed mode's own default is 50 (reference FeedCrawler.js:39
    # `limit ?? 50`) — the web crawler's DEFAULTS limit of 100 only
    # applies when a user/config layer chose it explicitly
    limit = opts["limit"] if opts.get("_limit_explicit") else 50
    items = ingest_feeds(bodies, limit=limit)
    if kind == "youtube" and opts.get("yt_include_transcript", True):
        items = enrich_youtube_transcripts(items, opts)
    # pin the ingested items: the error-collect, the file writes and the
    # final count are SEPARATE actions — unpinned, each would re-execute
    # the live fetch pipeline (network fetch 3x, and a fetch that fails
    # on a later action after succeeding on the error check would write
    # nothing while still reporting success)
    items = dedup_items(items).localCheckpoint()
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
    if not args.quiet:
        print(f"Feed ingestion complete ({kind}): {n} items -> {output_dir}")
    for e in errors[:FAILED_LIST_CAP]:
        print(f"  failed: {e}", file=sys.stderr)
    if len(errors) > FAILED_LIST_CAP:
        print(f"  ... and {len(errors) - FAILED_LIST_CAP} more "
              f"({len(errors)} failed total)", file=sys.stderr)
    # reference exit-code policy (src/cli.js:214-216): rc 1 iff any source
    # failed and --ignore-errors is not set (an empty-but-error-free feed
    # exits 0, matching the reference)
    return 1 if errors and not opts.get("ignore_errors") else 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    # mutually exclusive logging flags (reference src/cli.js:200-203)
    if args.verbose and args.quiet:
        print("Error: Cannot use both --verbose and --quiet options together",
              file=sys.stderr)
        return 1
    # YAML shortcut syntax: `inform-spark targets.yaml` (src/cli.js:140-145)
    if args.config is None and _is_yaml_path(args.url):
        args.config = args.url
        args.url = None
    # URL may come from the config file's first target (src/cli.js:159-173)
    if args.url is None and args.config:
        from inform_spark.functions.config import load_config

        targets = (load_config(args.config) or {}).get("targets") or []
        if targets:
            args.url = targets[0].get("url")
    if not args.url:
        print("Error: No URL provided", file=sys.stderr)
        print("Please provide a URL or use a config file with targets",
              file=sys.stderr)
        return 1
    opts = _load_config_layers(args)

    from inform_spark.functions.giturl import is_git_url
    from inform_spark.session import get_spark
    from inform_spark.sources.feeds import should_use_feed_mode

    spark = get_spark(master=args.master)
    if args.verbose:
        spark.sparkContext.setLogLevel("INFO")
    elif args.quiet:
        spark.sparkContext.setLogLevel("ERROR")
    # mode dispatch (reference src/cli.js:206-248): git > feed > web
    if is_git_url(args.url):
        return run_git(args, opts, spark)
    if args.feed or should_use_feed_mode(args.url):
        return run_feed(args, opts, spark)
    return run_web(args, opts, spark)


if __name__ == "__main__":
    raise SystemExit(main())
