"""robots.txt parsing and allow/deny matching.

Exact port of the reference's semantics (src/RobotsParser.js):

- line-based parse: comments stripped at '#', 'user-agent' opens a group,
  'disallow' and 'crawl-delay' collected only for relevant groups
  (src/RobotsParser.js:71-111)
- UA relevance: '*' matches; otherwise substring/prefix of our UA
  lower-cased (src/RobotsParser.js:118-125)
- path match against pathname+search: plain prefix unless the pattern has
  '*' or '$'; otherwise regex with '*'->'.*' and a trailing '$' anchor
  (src/RobotsParser.js:160-182)

Parsing runs as a pandas UDF when building the per-host robots dimension
table; matching runs vectorized per partition with per-host compiled
matchers (the dim table is broadcast-joined onto the frontier first).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

DEFAULT_USER_AGENT = "Inform/1.0"


@dataclass
class RobotsRules:
    disallowed_paths: list[str] = field(default_factory=list)
    crawl_delay_ms: int | None = None
    exists: bool = False


def matches_user_agent(pattern: str, user_agent: str = DEFAULT_USER_AGENT) -> bool:
    if pattern == "*":
        return True
    our = user_agent.lower()
    return pattern in our or our.startswith(pattern)


def parse_robots_txt(text: str, user_agent: str = DEFAULT_USER_AGENT) -> RobotsRules:
    rules = RobotsRules()
    is_relevant = False
    for line in (text or "").split("\n"):
        line = line.split("#")[0].strip()
        if not line:
            continue
        directive, _, value = line.partition(":")
        value = value.strip()
        d = directive.lower().strip()
        if d == "user-agent":
            is_relevant = matches_user_agent(value.lower(), user_agent)
        elif is_relevant:
            if d == "disallow":
                if value:
                    rules.disallowed_paths.append(value)
            elif d == "crawl-delay":
                try:
                    delay = float(value)
                except ValueError:
                    continue
                if delay == delay and delay > 0:  # NaN-safe
                    rules.crawl_delay_ms = int(delay * 1000)
    return rules


_REGEX_SPECIALS = re.compile(r"[.+?^${}()|[\]\\]")


def compile_pattern(pattern: str):
    """Compile one disallow pattern to a predicate over pathname+search."""
    if not pattern:
        return lambda path: False
    if "*" not in pattern and "$" not in pattern:
        return lambda path, p=pattern: path.startswith(p)
    rx = _REGEX_SPECIALS.sub(lambda m: "\\" + m.group(0), pattern)
    rx = rx.replace("*", ".*")
    # reference: '$' at end -> exact-match anchor; it was escaped to r'\$'
    # above, so restore a trailing anchor (src/RobotsParser.js:173)
    if rx.endswith(r"\$"):
        rx = rx[:-2] + "$"
    if not rx.startswith("^"):
        rx = "^" + rx
    compiled = re.compile(rx)
    return lambda path, c=compiled: c.search(path) is not None


class RobotsMatcher:
    """Compiled matcher for one host's disallow list."""

    def __init__(self, disallowed_paths: list[str]):
        self._preds = [compile_pattern(p) for p in disallowed_paths]

    def is_allowed(self, path_query: str) -> bool:
        return not any(pred(path_query) for pred in self._preds)


def path_matches(path: str, pattern: str) -> bool:
    return compile_pattern(pattern)(path)


def is_allowed(path_query: str, disallowed_paths: list[str]) -> bool:
    return RobotsMatcher(disallowed_paths).is_allowed(path_query)
