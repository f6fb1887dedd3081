"""minimatch-compatible glob matching for include/exclude file filters.

Replicates the reference's FileFilter semantics (src/FileFilter.js:25-83):

- exclude patterns are checked first; any match excludes
- if include patterns exist, at least one must match; else include
- minimatch is called with ``matchBase: true``: a pattern without '/'
  matches against the basename of the path
- URL adaptation (src/FileFilter.js:66-83): strip the leading '/', the root
  path maps to 'index.html', URL-parse failure -> include

Patterns are compiled ONCE (driver side) to regexes, then applied as
vectorized operations inside pandas UDF batches — fixture-tested against
the matrix in reference tests/file-filter.test.js.

Glob dialect supported (the subset minimatch exercises in the reference's
tests, plus braces/char-classes): ``*`` (no '/'), ``**`` (any), ``?``
(one, no '/'), ``[...]``, ``{a,b}``.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit


def _expand_braces(pattern: str) -> list[str]:
    m = re.search(r"\{([^{}]*)\}", pattern)
    if not m:
        return [pattern]
    out = []
    for alt in m.group(1).split(","):
        out.extend(_expand_braces(pattern[: m.start()] + alt + pattern[m.end() :]))
    return out


def _glob_to_regex_str(glob: str) -> str:
    i, n = 0, len(glob)
    rx = []
    while i < n:
        c = glob[i]
        if c == "*":
            if glob[i : i + 2] == "**":
                # '**/' can also match zero directories (minimatch globstar)
                if glob[i : i + 3] == "**/":
                    rx.append(r"(?:.*/)?")
                    i += 3
                    continue
                rx.append(r".*")
                i += 2
                continue
            rx.append(r"[^/]*")
            i += 1
        elif c == "?":
            rx.append(r"[^/]")
            i += 1
        elif c == "[":
            j = i + 1
            if j < n and glob[j] in "!^":
                j += 1
            if j < n and glob[j] == "]":
                j += 1
            while j < n and glob[j] != "]":
                j += 1
            if j >= n:
                rx.append(re.escape(c))
                i += 1
            else:
                cls = glob[i + 1 : j]
                if cls.startswith("!"):
                    cls = "^" + cls[1:]
                rx.append("[" + cls + "]")
                i = j + 1
        else:
            rx.append(re.escape(c))
            i += 1
    return "".join(rx)


class CompiledGlob:
    def __init__(self, pattern: str):
        self.pattern = pattern
        self.match_base = "/" not in pattern
        alts = _expand_braces(pattern)
        self._rx = re.compile("^(?:" + "|".join(_glob_to_regex_str(a) for a in alts) + ")$")

    def matches(self, path: str) -> bool:
        path = path.replace("\\", "/")
        if self.match_base:
            path = path.rsplit("/", 1)[-1]
        return self._rx.match(path) is not None


class FileFilter:
    """Include/exclude filter; compile once, apply per batch."""

    def __init__(self, include: list[str] | None = None, exclude: list[str] | None = None):
        if isinstance(include, str):
            include = [include]
        if isinstance(exclude, str):
            exclude = [exclude]
        self.include = [CompiledGlob(p) for p in (include or [])]
        self.exclude = [CompiledGlob(p) for p in (exclude or [])]

    @property
    def has_filters(self) -> bool:
        return bool(self.include or self.exclude)

    def should_include(self, file_path: str) -> bool:
        path = file_path.replace("\\", "/")
        if any(g.matches(path) for g in self.exclude):
            return False
        if self.include:
            return any(g.matches(path) for g in self.include)
        return True

    def should_crawl_url(self, url: str) -> bool:
        try:
            path = urlsplit(url).path
        except ValueError:
            return True
        relative = path[1:] if path.startswith("/") else path
        if not relative:
            return self.should_include("index.html")
        return self.should_include(relative)
