"""Git repository URL detection + parsing (X11; reference
src/GitUrlParser.js:10-126). Driver-side source-adapter config — the parsed
(owner, repo, branch, subdirectory) seeds the git dir-frontier (S8), which
reuses the same micro-batch engine as the web frontier."""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import parse_qs, urlsplit


@dataclass
class GitRepoInfo:
    host: str
    owner: str
    repo: str
    branch: str = "main"
    subdirectory: str = ""
    api_url: str = "https://api.github.com"


def is_git_url(url: str) -> bool:
    try:
        u = urlsplit(url)
    except ValueError:
        return False
    if u.hostname != "github.com":
        return False
    parts = [p for p in (u.path or "").split("/") if p]
    return len(parts) >= 2


def parse_git_url(url: str) -> GitRepoInfo:
    if not is_git_url(url):
        raise ValueError("Not a valid Git repository URL")
    u = urlsplit(url)
    parts = [p for p in (u.path or "").split("/") if p]
    info = GitRepoInfo(host="github.com", owner=parts[0], repo=parts[1])
    if len(parts) > 2:
        if parts[2] in ("tree", "blob"):
            if len(parts) > 3:
                info.branch = parts[3]
                if len(parts) > 4:
                    info.subdirectory = "/".join(parts[4:]).replace("\\", "/")
        else:
            # direct path without tree/blob → subdirectory on default branch
            info.subdirectory = "/".join(parts[2:]).replace("\\", "/")
    # fragment: #branch-name (no slashes)
    if u.fragment and "/" not in u.fragment:
        info.branch = u.fragment
    # query: ?ref=branch-name wins
    ref = parse_qs(u.query or "").get("ref")
    if ref:
        info.branch = ref[0]
    return info


def github_api_url(info: GitRepoInfo, path: str = "") -> str:
    """Contents-API URL (src/GitUrlParser.js:118-126)."""
    if info.subdirectory:
        base_path = info.subdirectory + (f"/{path}" if path else "")
    else:
        base_path = path
    api_path = f"/{base_path}" if base_path else ""
    return (
        f"{info.api_url}/repos/{info.owner}/{info.repo}/contents"
        f"{api_path}?ref={info.branch}"
    )
