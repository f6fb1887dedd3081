"""X11 git-URL parsing tables (reference tests/git-url-parser.test.js) and
X15 config merge precedence (reference tests/config.test.js)."""

import pytest

from inform_spark.functions.config import (
    DEFAULTS,
    merge_options,
    options_for_target,
    resolve_env_vars,
)
from inform_spark.functions.giturl import (
    github_api_url,
    is_git_url,
    parse_git_url,
)


# --- git urls -------------------------------------------------------------

@pytest.mark.parametrize(
    "url,expected",
    [
        ("https://github.com/o/r", ("o", "r", "main", "")),
        ("https://github.com/o/r/tree/dev", ("o", "r", "dev", "")),
        ("https://github.com/o/r/tree/dev/docs/api", ("o", "r", "dev", "docs/api")),
        ("https://github.com/o/r/blob/v2/file", ("o", "r", "v2", "file")),
        ("https://github.com/o/r/docs", ("o", "r", "main", "docs")),
        ("https://github.com/o/r?ref=hotfix", ("o", "r", "hotfix", "")),
        ("https://github.com/o/r#release", ("o", "r", "release", "")),
    ],
)
def test_parse_github_urls(url, expected):
    info = parse_git_url(url)
    assert (info.owner, info.repo, info.branch, info.subdirectory) == expected


def test_is_git_url_table():
    assert is_git_url("https://github.com/o/r")
    assert not is_git_url("https://github.com/onlyowner")
    assert not is_git_url("https://gitlab.com/o/r")
    assert not is_git_url("not a url")


def test_api_url_construction():
    info = parse_git_url("https://github.com/o/r/tree/dev/docs")
    assert (
        github_api_url(info, "sub")
        == "https://api.github.com/repos/o/r/contents/docs/sub?ref=dev"
    )
    root = parse_git_url("https://github.com/o/r")
    assert (
        github_api_url(root)
        == "https://api.github.com/repos/o/r/contents?ref=main"
    )


# --- config merge ---------------------------------------------------------

def test_defaults_applied():
    out = merge_options(DEFAULTS)
    assert out["limit"] == 100 and out["delay"] == 2000
    assert out["max_queue_size"] == 10_000


def test_four_layer_precedence():
    out = merge_options(
        DEFAULTS,
        {"limit": 10, "delay": 500},
        {"limit": 20},
        {"limit": 30},
    )
    assert out["limit"] == 30      # cli wins
    assert out["delay"] == 500     # global survives
    assert out["concurrency"] == 3 # default survives


def test_none_never_overrides():
    out = merge_options({"limit": 5}, {"limit": None})
    assert out["limit"] == 5


def test_array_union_config_but_cli_replaces():
    cli = {"include": ["only.md"]}
    out = merge_options(
        {"include": ["a.md"]},
        {"include": ["b.md", "a.md"]},
        None,
        None,
    )
    assert out["include"] == ["a.md", "b.md"]  # ordered union
    out2 = merge_options({"include": ["a.md"]}, {"include": ["b.md"]}, None, cli)
    assert out2["include"] == ["only.md"]      # cli replaces


def test_env_fallback_only_when_unset():
    env = {"X_BEARER_TOKEN": "tok-env"}
    assert resolve_env_vars({}, env)["x_bearer_token"] == "tok-env"
    assert (
        resolve_env_vars({"x_bearer_token": "explicit"}, env)["x_bearer_token"]
        == "explicit"
    )


def test_options_for_target():
    cfg = {
        "globals": {"delay": 100, "include": ["g.md"]},
        "targets": [
            {"url": "https://a.test/", "limit": 7, "include": ["t.md"]},
            {"url": "https://b.test/", "limit": 9},
        ],
    }
    out = options_for_target(cfg, "https://a.test/", cli={"concurrency": 8})
    assert out["limit"] == 7
    assert out["delay"] == 100
    assert out["concurrency"] == 8
    assert out["include"] == ["g.md", "t.md"]
