"""Config loading + 4-layer option merge (X15; reference src/config.js).

Precedence: defaults < config.globals < per-target < CLI. Array fields are
additive (set-union preserving first-seen order) across config layers but
REPLACED by the CLI layer; None values never override (src/config.js:
140-166). Env-var fallbacks fill API credentials only when unset
(src/config.js:226-250). Driver-side only — never in the data plane."""

from __future__ import annotations

import os

DEFAULTS: dict = {
    "output_dir": "crawled-pages",
    "max_retries": 3,
    "log_level": "normal",
    "ignore_errors": False,
    "limit": 100,
    "delay": 2000,
    "concurrency": 3,
    "max_queue_size": 10_000,
    "ignore_robots": False,
    "raw": False,
    "yt_lang": "en",
    "yt_include_transcript": True,
}

_ENV_FALLBACKS = {
    "x_bearer_token": "X_BEARER_TOKEN",
    "x_api_base": "X_API_BASE",
    "x_rss_template": "X_RSS_TEMPLATE",
    "bsky_api_base": "BSKY_API_BASE",
    "github_token": "GITHUB_TOKEN",
    "github_api_base": "GITHUB_API_BASE",
    "yt_page_base": "YT_PAGE_BASE",
    "yt_feed_base": "YT_FEED_BASE",
    "yt_timedtext_base": "YT_TIMEDTEXT_BASE",
}


def merge_options(
    defaults: dict | None = None,
    globals_: dict | None = None,
    target: dict | None = None,
    cli: dict | None = None,
) -> dict:
    """Layered merge with the reference's array rule: config layers union
    lists (ordered, deduped), the CLI layer replaces them outright."""
    result: dict = {}
    layers = [defaults, globals_, target, cli]
    for layer in layers:
        if not layer:
            continue
        is_cli = layer is cli
        for key, value in layer.items():
            if value is None:
                continue
            if isinstance(value, list) and isinstance(result.get(key), list):
                if is_cli:
                    result[key] = list(value)
                else:
                    merged = list(result[key])
                    for v in value:
                        if v not in merged:
                            merged.append(v)
                    result[key] = merged
            else:
                result[key] = value
    return result


def resolve_env_vars(options: dict, env: dict | None = None) -> dict:
    env = env if env is not None else os.environ
    out = dict(options)
    for key, var in _ENV_FALLBACKS.items():
        if not out.get(key) and env.get(var):
            out[key] = env[var]
    return out


def load_config(path: str) -> dict:
    """YAML (or JSON — valid YAML) config file → dict. Shape:
    {globals: {...}, targets: [{url: ..., **options}]}."""
    import json

    with open(path) as f:
        text = f.read()
    try:
        import yaml  # type: ignore

        return yaml.safe_load(text) or {}
    except ImportError:
        return json.loads(text)


def options_for_target(config: dict, target_url: str, cli: dict | None = None) -> dict:
    """Full precedence chain for one target URL."""
    globals_ = config.get("globals") or {}
    target = next(
        (t for t in config.get("targets") or [] if t.get("url") == target_url),
        {},
    )
    target = {k: v for k, v in target.items() if k != "url"}
    merged = merge_options(DEFAULTS, globals_, target, cli)
    # provenance marker: feed mode has a DIFFERENT default limit than the
    # web crawler (reference: FeedCrawler.js:39 `limit ?? 50` vs the web
    # maxPages default of 100) — consumers need to know whether `limit`
    # was actually chosen by a user/config layer or fell through from
    # DEFAULTS
    merged["_limit_explicit"] = any(
        layer is not None and "limit" in layer
        for layer in (globals_, target, cli or {})
    )
    return resolve_env_vars(merged)
