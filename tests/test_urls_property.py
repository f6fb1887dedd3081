"""Property-based invariants for URL canonicalization (hypothesis).

The hand-written tests in test_urls.py pin known cases; these generate
adversarial url shapes and assert the algebraic contracts the crawl
engine relies on: idempotence (the seen set keys on normalize_url(u), so
re-normalizing must be a fixed point), fragment-freeness, and
resolve/normalize agreement (a link resolved against a base must equal
its own normalization — otherwise the frontier and the seen set could
disagree about the same page).
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from inform_spark.functions.urls import normalize_url, resolve_url

host_label = st.text(string.ascii_letters + string.digits, min_size=1, max_size=8)
hosts = st.builds(lambda a, b: f"{a}.{b}", host_label, host_label)
path_seg = st.text(string.ascii_letters + string.digits + "-_.%", max_size=8)
paths = st.lists(path_seg, max_size=4).map(lambda s: "/" + "/".join(s) if s else "")
queries = st.one_of(st.just(""), st.builds(lambda v: f"?q={v}", path_seg))
frags = st.one_of(st.just(""), st.builds(lambda v: f"#{v}", path_seg))
ports = st.one_of(
    st.just(""), st.just(":80"), st.just(":443"), st.just(":8080")
)
urls = st.builds(
    lambda sch, h, po, pa, q, f: f"{sch}://{h}{po}{pa}{q}{f}",
    st.sampled_from(["http", "https", "HTTP", "Https"]),
    hosts,
    ports,
    paths,
    queries,
    frags,
)


@settings(max_examples=300, deadline=None)
@given(urls)
def test_normalize_idempotent_and_fragment_free(u):
    n = normalize_url(u)
    assert normalize_url(n) == n
    assert "#" not in n
    assert n.split("://", 1)[0] in ("http", "https")
    # default ports are stripped exactly when they match the scheme
    scheme = n.split("://", 1)[0]
    netloc = n.split("://", 1)[1].split("/", 1)[0]
    assert not netloc.endswith(":80" if scheme == "http" else ":443")


@settings(max_examples=300, deadline=None)
@given(urls, urls)
def test_resolve_agrees_with_normalize(base, href):
    r = resolve_url(href, base)
    if r is not None:
        assert r == normalize_url(r)  # frontier key == seen key


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=20), urls)
def test_resolve_never_raises_on_garbage(href, base):
    r = resolve_url(href, base)
    assert r is None or r.startswith("http")
