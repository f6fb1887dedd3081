"""Git-mode dir-frontier walk vs a sequential reference-semantics oracle."""

import pytest

from inform_spark.functions.giturl import parse_git_url
from inform_spark.plans.gitcrawl import (
    CHECKPOINT_EVERY,
    GitCrawlEngine,
    is_binary_file,
    should_explore_directory,
)

# synthetic repo listing: (parent, name, type, size, content_b64, download_url)
import base64


def b64(s: str) -> str:
    return base64.b64encode(s.encode()).decode()


LISTING = [
    ("", "README.md", "file", 120, b64("# Readme\nhello"), None),
    ("", "logo.png", "file", 400, b64("PNGDATA"), None),
    ("", "big.md", "file", 2_000_000, None, "https://raw.test/big.md"),
    ("", "docs", "dir", 0, None, None),
    ("", "src", "dir", 0, None, None),
    ("", "node_modules", "dir", 0, None, None),
    ("docs", "intro.md", "file", 50, b64("intro"), None),
    ("docs", "api", "dir", 0, None, None),
    ("docs/api", "ref.md", "file", 60, b64("api ref"), None),
    ("src", "main.js", "file", 80, b64("console.log(1)"), None),
    ("node_modules", "dep.js", "file", 10, b64("x"), None),
]


def oracle_walk(listing, include, exclude, subdirectory=""):
    """Depth-first sequential walk with the reference's branch order
    (src/GitCrawler.js:253-269)."""
    from inform_spark.functions.globs import FileFilter

    ff = FileFilter(include or [], exclude or [])
    by_parent = {}
    for parent, name, typ, size, content, dl in listing:
        by_parent.setdefault(parent, []).append((name, typ, size, content, dl))
    out = []

    def walk(path):
        for name, typ, size, content, dl in by_parent.get(path, []):
            item_path = f"{path}/{name}" if path else name
            if typ == "file":
                if ff.should_include(item_path):
                    out.append(item_path)
            elif typ == "dir":
                if should_explore_directory(item_path, include or []):
                    walk(item_path)

    walk(subdirectory)
    return out


@pytest.fixture(scope="module")
def listing_df(spark):
    return spark.createDataFrame(
        LISTING,
        "parent string, name string, type string, size long, "
        "content string, download_url string",
    ).cache()


def run(spark, listing_df, url="https://github.com/o/r", include=None, exclude=None):
    eng = GitCrawlEngine(
        spark, listing_df, parse_git_url(url), include=include, exclude=exclude,
        output_dir="out",
    )
    files = eng.run()
    return eng, {r["repo_path"]: r for r in files.collect()}


def test_full_walk_matches_oracle(spark, listing_df):
    _, got = run(spark, listing_df)
    assert set(got) == set(oracle_walk(LISTING, None, None))


def test_include_pattern_prunes_dirs(spark, listing_df):
    include = ["docs/**/*.md"]
    eng, got = run(spark, listing_df, include=include)
    assert set(got) == set(oracle_walk(LISTING, include, None))
    assert "src/main.js" not in got


def test_exclude_filters_files(spark, listing_df):
    exclude = ["node_modules/**"]
    _, got = run(spark, listing_df, exclude=exclude)
    assert set(got) == set(oracle_walk(LISTING, None, exclude))
    assert "node_modules/dep.js" not in got


def test_inline_vs_download_and_binary(spark, listing_df):
    _, got = run(spark, listing_df)
    readme = got["README.md"]
    assert readme["inline"] and not readme["is_binary"]
    assert readme["text"] == "# Readme\nhello"
    assert readme["data"] is None
    logo = got["logo.png"]
    assert logo["is_binary"] and bytes(logo["data"]) == b"PNGDATA"
    assert logo["text"] is None
    big = got["big.md"]
    assert not big["inline"]
    assert big["download_url"] == "https://raw.test/big.md"
    assert big["text"] is None


def test_subdirectory_local_path_strip(spark, listing_df):
    eng, got = run(
        spark, listing_df, url="https://github.com/o/r/tree/main/docs"
    )
    assert set(got) == {"docs/intro.md", "docs/api/ref.md"}
    assert got["docs/intro.md"]["local_path"] == "out/intro.md"
    assert got["docs/api/ref.md"]["local_path"] == "out/api/ref.md"


@pytest.mark.parametrize(
    "path,expected",
    [
        ("a.png", True), ("a.md", False), ("x/y.WOFF2", True),
        ("noext", False), ("a.tar", True),
    ],
)
def test_binary_detection(path, expected):
    assert is_binary_file(path) == expected


def test_deep_walk_bounded_plan(spark):
    """50-level chain listing: the per-round localCheckpoint
    (CHECKPOINT_EVERY) keeps the accumulated union's plan bounded — the
    walk completes, finds every level's file, and the final plan string
    stays small instead of growing O(depth) unions deep."""
    deep = []
    parent = ""
    for i in range(50):
        name = f"d{i}"
        path = f"{parent}/{name}" if parent else name
        deep.append((parent, name, "dir", 0, None, None))
        deep.append((parent, f"f{i}.md", "file", 10, b64(f"level {i}"), None))
        parent = path
    deep.append((parent, "leaf.md", "file", 10, b64("leaf"), None))
    df = spark.createDataFrame(
        deep,
        "parent string, name string, type string, size long, "
        "content string, download_url string",
    )
    eng = GitCrawlEngine(
        spark, df, parse_git_url("https://github.com/o/deep"),
        output_dir="out",
    )
    files = eng.run()
    got = {r["repo_path"] for r in files.collect()}
    assert got == set(oracle_walk(deep, None, None))
    assert len(got) == 51
    assert eng.summary.rounds == 51
    # bounded lineage: a 51-round un-checkpointed union chain explodes the
    # plan string; the checkpointed one stays flat
    plan = files._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Union") < 2 * CHECKPOINT_EVERY


def test_dir_prune_table():
    assert should_explore_directory("docs", ["docs/**/*.md"])
    assert should_explore_directory("anything", [])
    assert should_explore_directory("x", ["**/*.md"])
    assert not should_explore_directory("vendor", ["docs/*.md"])
