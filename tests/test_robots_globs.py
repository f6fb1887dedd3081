"""robots.txt parse/match + minimatch-style glob goldens."""

from inform_spark.functions.globs import FileFilter
from inform_spark.functions.robots import (
    is_allowed,
    matches_user_agent,
    parse_robots_txt,
    path_matches,
)


# reference src/RobotsParser.js:71-111
def test_parse_basic():
    txt = """# comment
User-agent: *
Disallow: /admin/
Disallow: /private/
Crawl-delay: 2
"""
    rules = parse_robots_txt(txt)
    assert rules.disallowed_paths == ["/admin/", "/private/"]
    assert rules.crawl_delay_ms == 2000


def test_parse_ua_groups():
    txt = """User-agent: googlebot
Disallow: /google-only/

User-agent: inform
Disallow: /inform-only/

User-agent: *
Disallow: /everyone/
"""
    rules = parse_robots_txt(txt)
    # 'inform' is a substring of 'inform/1.0' -> relevant; '*' relevant
    assert "/inform-only/" in rules.disallowed_paths
    assert "/everyone/" in rules.disallowed_paths
    assert "/google-only/" not in rules.disallowed_paths


def test_parse_empty_disallow_ignored():
    rules = parse_robots_txt("User-agent: *\nDisallow:\n")
    assert rules.disallowed_paths == []


def test_parse_crawl_delay_float_seconds():
    rules = parse_robots_txt("User-agent: *\nCrawl-delay: 0.5\n")
    assert rules.crawl_delay_ms == 500
    rules0 = parse_robots_txt("User-agent: *\nCrawl-delay: 0\n")
    assert rules0.crawl_delay_ms is None  # delay > 0 required


def test_ua_matching():
    assert matches_user_agent("*")
    assert matches_user_agent("inform")
    assert matches_user_agent("inform/1.0")
    assert not matches_user_agent("googlebot")


# reference src/RobotsParser.js:160-182
def test_path_prefix_match():
    assert path_matches("/admin/secret", "/admin/")
    assert not path_matches("/administrator", "/admin/")
    assert path_matches("/administrator", "/admin")  # prefix semantics


def test_path_wildcard_match():
    assert path_matches("/a/b.tmp", "/*.tmp")
    assert path_matches("/search?q=x&sort=asc", "/*?*sort=")
    assert not path_matches("/search", "/*.tmp")


def test_path_dollar_anchor():
    assert path_matches("/exact", "/exact$")
    assert not path_matches("/exact/sub", "/exact$")


def test_is_allowed():
    dis = ["/admin/", "/private/"]
    assert not is_allowed("/admin/x", dis)
    assert is_allowed("/docs/x", dis)
    assert is_allowed("/anything", [])


# reference tests/file-filter.test.js matrix
def test_glob_include_exclude():
    f = FileFilter(include=["*.md"], exclude=["*.tmp"])
    assert f.should_include("readme.md")
    assert f.should_include("docs/readme.md")  # matchBase: basename match
    assert not f.should_include("scratch.tmp")
    assert not f.should_include("code.js")


def test_glob_globstar():
    f = FileFilter(include=["docs/**/*.md"])
    assert f.should_include("docs/a/b.md")
    assert f.should_include("docs/b.md")  # '**/' matches zero dirs
    assert not f.should_include("other/a.md")


def test_glob_exclude_dirs():
    f = FileFilter(exclude=["**/node_modules/**", "**/.git/**"])
    assert not f.should_include("a/node_modules/x.js")
    assert f.should_include("a/src/x.js")


def test_glob_windows_paths():
    f = FileFilter(include=["docs/**"])
    assert f.should_include("docs\\sub\\file.md")


def test_glob_no_filters_includes_all():
    f = FileFilter()
    assert f.should_include("anything/at/all.xyz")
    assert not f.has_filters


# reference src/FileFilter.js:66-83 (URL adaptation)
def test_should_crawl_url():
    f = FileFilter(include=["docs/**"])
    assert f.should_crawl_url("https://x.test/docs/intro")
    assert not f.should_crawl_url("https://x.test/blog/post")
    froot = FileFilter(include=["index.html"])
    assert froot.should_crawl_url("https://x.test/")
