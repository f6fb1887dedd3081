"""Git-mode crawler (S8/G1): repository contents walk as a dir-frontier.

The reference recursively walks the GitHub contents API depth-first, one
rate-limited request at a time (src/GitCrawler.js:229-275, pacing
:147-157). Here the recursion is the SAME iterative-frontier shape as the
web crawl: each micro-batch expands every live directory at the current
depth in parallel against a ``listing(parent, name, type, size, content,
download_url)`` table (API responses in tests; a ``mapInPandas`` REST
fetcher in production), so an org-scale mirror walks a million directories
in O(depth) rounds instead of O(dirs) requests.

Operator parity:
- G1 dir-prune: ``should_explore_directory`` replicates the reference's
  include-pattern prefix walk (src/GitCrawler.js:347-389) — the partition-
  pruning analog; pruned dirs are never listed.
- F5 include/exclude globs on file paths (src/FileFilter.js:25-50).
- inline-vs-download branch: ``size <= 1 MB AND content IS NOT NULL`` uses
  the inline base64; bigger files carry their ``download_url`` forward
  (src/GitCrawler.js:298-325) — a filter, not a fetch, in-sandbox.
- binary detection by extension (src/GitCrawler.js:396-418) — kept as data
  (``is_binary`` column); binary bytes stay in a binary column (multimodal
  pipeline shape), text is utf-8 decoded.
- local path rule: subdirectory prefix stripped (src/GitCrawler.js:425-434).
- A4 download counter / S11 summary = one groupBy at the end.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from inform_spark.functions.giturl import GitRepoInfo
from inform_spark.functions.globs import FileFilter

BINARY_EXTENSIONS = (
    ".png", ".jpg", ".jpeg", ".gif", ".bmp", ".ico", ".svg", ".webp", ".avif",
    ".pdf", ".doc", ".docx", ".xls", ".xlsx", ".ppt", ".pptx", ".odt", ".ods",
    ".odp", ".zip", ".tar", ".gz", ".bz2", ".7z", ".rar", ".xz", ".exe",
    ".dll", ".so", ".dylib", ".bin", ".app", ".mp3", ".mp4", ".avi", ".mkv",
    ".mov", ".wav", ".flac", ".ogg", ".webm", ".ttf", ".otf", ".woff",
    ".woff2", ".eot", ".db", ".sqlite", ".dat", ".cache", ".class", ".jar",
    ".war", ".ear", ".pyc", ".pyo", ".wasm",
)

MAX_INLINE = 1024 * 1024

FILES = StructType(
    [
        StructField("repo_path", StringType(), False),
        StructField("local_path", StringType(), False),
        StructField("size", LongType(), True),
        StructField("is_binary", BooleanType(), False),
        StructField("inline", BooleanType(), False),
        StructField("text", StringType(), True),
        StructField("data", BinaryType(), True),
        StructField("download_url", StringType(), True),
        StructField("depth", LongType(), False),
    ]
)


def is_binary_file(path: str) -> bool:
    dot = path.rfind(".")
    ext = path[dot:].lower() if dot >= 0 else ""
    return ext in BINARY_EXTENSIONS


def should_explore_directory(dir_path: str, include_patterns: list[str]) -> bool:
    """G1 include-pattern dir pruning (src/GitCrawler.js:347-389)."""
    if not include_patterns:
        return True
    dir_path = dir_path.replace("\\", "/")
    for pattern in include_patterns:
        if pattern.startswith(dir_path + "/") or pattern.startswith(dir_path):
            return True
        pattern_parts = pattern.split("/")
        dir_parts = dir_path.split("/")
        matches = True
        for pp, dp in zip(pattern_parts, dir_parts):
            if pp == "**":
                return True
            if "*" in pp or "?" in pp:
                return True
            if pp != dp:
                matches = False
                break
        if matches:
            return True
    return False


@dataclass
class GitCrawlSummary:
    dirs_listed: int = 0
    dirs_failed: int = 0
    files_downloaded: int = 0
    files_failed: int = 0
    files_filtered: int = 0
    dirs_pruned: int = 0
    rounds: int = 0
    extra: dict = field(default_factory=dict)


# bound the unionByName plan depth: every K rounds the accumulated files
# DataFrame is localCheckpoint-ed (lineage truncated), so a 50-level walk
# analyzes an O(K) plan instead of an O(depth) one
CHECKPOINT_EVERY = 8


class GitCrawlEngine:
    """Iterative dir-frontier walk over a listing table (fixture mode) or a
    live contents-API lister (``lister=`` from
    :func:`inform_spark.sources.githubapi.make_listing_fetcher`)."""

    def __init__(
        self,
        spark: SparkSession,
        listing_df: DataFrame | None,
        repo: GitRepoInfo,
        include: list[str] | None = None,
        exclude: list[str] | None = None,
        output_dir: str = "crawled-pages",
        max_depth: int = 64,
        lister=None,
    ):
        self.spark = spark
        self.listing = listing_df
        self.repo = repo
        self.ff = FileFilter(include or [], exclude or [])
        self.include = list(include or [])
        self.output_dir = output_dir
        self.max_depth = max_depth
        self.lister = lister
        if listing_df is None and lister is None:
            raise ValueError("need a listing DataFrame or a live lister")
        self._files: DataFrame | None = None
        self.summary = GitCrawlSummary()

    # -- column helpers ----------------------------------------------------
    def _local_path_col(self):
        sub = self.repo.subdirectory
        path = F.col("path")
        if sub:
            path = F.when(
                F.col("path").startswith(sub + "/"),
                F.expr(f"substring(path, {len(sub) + 2})"),
            ).otherwise(F.col("path"))
        return F.concat(F.lit(self.output_dir + "/"), path)

    def _include_udf(self):
        ff = self.ff

        @pandas_udf(BooleanType())
        def ok(path):
            return path.map(ff.should_include)

        return ok

    def _explore_udf(self):
        inc = self.include

        @pandas_udf(BooleanType())
        def ok(path):
            return path.map(lambda p: should_explore_directory(p, inc))

        return ok

    # ----------------------------------------------------------------------
    def run(self) -> DataFrame:
        """BFS rounds over directory levels; returns the files DataFrame."""
        start = self.repo.subdirectory or ""
        frontier = self.spark.createDataFrame(
            [(start, 0)], "dir string, depth long"
        )
        include_ok = self._include_udf()
        explore_ok = self._explore_udf()
        all_files = None
        prev_frontier = None

        for round_no in range(self.max_depth):
            n_dirs = frontier.count()
            # the new frontier is materialized now — the previous round's
            # cache (its parent) can go
            if prev_frontier is not None:
                prev_frontier.unpersist()
                prev_frontier = None
            if n_dirs == 0:
                break
            self.summary.rounds += 1
            self.summary.dirs_listed += n_dirs

            if self.lister is not None:
                # live mode: ONE API request per dir per round, materialized
                # eagerly (localCheckpoint) so the files/dirs branches below
                # never re-trigger the fetch stage
                listing = self.lister(frontier).localCheckpoint()
                self.summary.dirs_failed += listing.filter(
                    F.col("type") == "error"
                ).count()
            else:
                listing = self.listing
            level = listing.join(
                F.broadcast(frontier), listing.parent == frontier.dir
            ).withColumn(
                "path",
                F.when(
                    F.col("parent") == "", F.col("name")
                ).otherwise(F.concat("parent", F.lit("/"), F.col("name"))),
            )

            files = level.filter(F.col("type") == "file").filter(
                include_ok(F.col("path"))
            )
            files = files.select(
                F.col("path").alias("repo_path"),
                self._local_path_col().alias("local_path"),
                F.col("size").cast("long").alias("size"),
                F.lower("path").rlike(
                    "\\.(" + "|".join(e[1:] for e in BINARY_EXTENSIONS) + ")$"
                ).alias("is_binary"),
                (
                    (F.col("size") <= MAX_INLINE) & F.col("content").isNotNull()
                ).alias("inline"),
                F.col("content"),
                F.col("download_url"),
                (F.col("depth") + 1).alias("depth"),
            )
            files = files.withColumn(
                "text",
                F.when(
                    F.col("inline") & ~F.col("is_binary"),
                    F.decode(F.unbase64(F.col("content")), "utf-8"),
                ),
            ).withColumn(
                "data",
                F.when(
                    F.col("inline") & F.col("is_binary"),
                    F.unbase64(F.col("content")),
                ),
            ).drop("content")

            all_files = files if all_files is None else all_files.unionByName(files)
            if (round_no + 1) % CHECKPOINT_EVERY == 0:
                all_files = all_files.localCheckpoint()

            dirs = level.filter(F.col("type") == "dir").select(
                F.col("path"), (F.col("depth") + 1).alias("depth")
            )
            kept = dirs.filter(explore_ok(F.col("path")))
            prev_frontier = frontier
            frontier = kept.select(F.col("path").alias("dir"), "depth")
            if (round_no + 1) % CHECKPOINT_EVERY == 0:
                # the frontier's plan is an O(depth)-deep join chain —
                # persist() caches rows but the analyzer still walks the
                # whole chain every round (heap-OOMs by depth ~50), so
                # truncate its lineage on the same cadence as all_files
                frontier = frontier.localCheckpoint()
            else:
                frontier = frontier.persist()

        if all_files is None:
            self._files = self.spark.createDataFrame([], FILES)
        else:
            self._files = all_files.select([f.name for f in FILES.fields]).persist()
            self.summary.files_downloaded = self._files.count()
        frontier.unpersist()
        if prev_frontier is not None:
            prev_frontier.unpersist()
        return self._files

    def summary_df(self) -> DataFrame:
        """S11/A4: inline-vs-download x binary rollup."""
        return self._files.groupBy("inline", "is_binary").count()
