"""Round-4 additions: content-defined chunking, soft-404 detection,
curriculum sharding — each checked against an independent sequential
Python reference plus its characteristic structural property."""

import hashlib

from pyspark.sql import functions as F


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# cdc_chunks
# ---------------------------------------------------------------------------


def _chunks_py(text: str, w: int, divisor: int):
    """Sequential reference: (hash, n_tokens) per chunk."""
    toks = text.lower().split(" ")
    n = len(toks)
    ends = [
        j + w - 1
        for j in range(0, n - w + 1)
        if _h60(" ".join(toks[j : j + w])) % divisor == 0
    ]
    if not ends or ends[-1] != n - 1:
        ends.append(n - 1)
    out, prev = [], -1
    for e in ends:
        chunk = " ".join(toks[prev + 1 : e + 1])
        out.append((_h60(chunk), e - prev))
        prev = e
    return out


_DOCS = [
    "the quick brown fox jumps over the lazy dog again and again today",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "spark rows keys tables spark rows keys tables spark rows keys tables",
    "one",
    "",
]


def _spark_chunks(spark, texts, w, divisor):
    from inform_spark.operators.chunking import chunk_structs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = df.select(
        "doc_id", chunk_structs("text", w, divisor).alias("cs")
    ).collect()
    return {r["doc_id"]: [(c["h"], c["tk"]) for c in r["cs"]] for r in rows}


def test_cdc_chunk_structs_match_sequential_reference(spark):
    got = _spark_chunks(spark, _DOCS, w=3, divisor=4)
    for i, t in enumerate(_DOCS):
        assert got[i] == _chunks_py(t, 3, 4), (i, t)


def test_cdc_chunks_cover_every_token_exactly_once(spark):
    got = _spark_chunks(spark, _DOCS, w=3, divisor=4)
    for i, t in enumerate(_DOCS):
        assert sum(tk for _, tk in got[i]) == len(t.lower().split(" "))


def test_cdc_boundaries_are_content_defined_not_offset_defined(spark):
    # Prepending tokens must leave the chunk sequence AFTER the first
    # shared boundary untouched — the property fixed-size blocking lacks.
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    shifted = "XX YY " + base
    got = _spark_chunks(spark, [base.strip(), shifted.strip()], w=3, divisor=4)
    a, b = got[0], got[1]
    # compare hash sequences from the end: the whole tail must agree
    tail = 0
    while tail < min(len(a), len(b)) and a[-1 - tail][0] == b[-1 - tail][0]:
        tail += 1
    assert tail >= max(len(a), len(b)) - 3, (len(a), len(b), tail)


def test_cdc_dup_accounting_counts_both_copies(spark):
    from inform_spark.operators.chunking import cdc_chunks

    df = spark.createDataFrame(
        [(0, _DOCS[0]), (1, _DOCS[0]), (2, _DOCS[1])],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in cdc_chunks(df, w=3, divisor=4).collect()}
    # identical docs: every chunk duplicated, in BOTH copies
    for i in (0, 1):
        assert out[i]["n_dup_chunks"] == out[i]["n_chunks"]
        assert out[i]["dup_tokens"] == out[i]["n_tokens"]
    # the unrelated doc shares no 3-token-window chunks
    assert out[2]["n_dup_chunks"] == 0 and out[2]["dup_tokens"] == 0


# ---------------------------------------------------------------------------
# soft404_detect
# ---------------------------------------------------------------------------


def _pages(spark):
    rows = []
    # host a: catch-all maintenance template on 6 distinct URLs (200)
    for i in range(6):
        rows.append((f"https://a.test/p/{i}", 200, "scheduled maintenance body"))
    # host a: 3 more distinct URLs, unique bodies
    for i in range(3):
        rows.append((f"https://a.test/q/{i}", 200, f"article {i} body text"))
    # host b: same template TEXT but only 2 URLs (below threshold)
    for i in range(2):
        rows.append((f"https://b.test/p/{i}", 200, "scheduled maintenance body"))
    # phrase-only page, unique content
    rows.append(("https://b.test/gone", 200, "sorry this page not found here"))
    # real 404 with error wording: must NOT be a soft404
    rows.append(("https://b.test/hard404", 404, "404 error page not found"))
    return spark.createDataFrame(rows, "url string, status int, text string")


def test_soft404_signals(spark):
    from inform_spark.operators.soft404 import soft404_detect

    out = {
        r["url"]: r.asDict()
        for r in soft404_detect(_pages(spark), min_template_urls=5).collect()
    }
    for i in range(6):  # template on host a fires
        r = out[f"https://a.test/p/{i}"]
        assert r["template_hit"] and r["is_soft404"] and not r["phrase_hit"]
    for i in range(3):  # unique bodies clean
        r = out[f"https://a.test/q/{i}"]
        assert not r["template_hit"] and not r["is_soft404"]
    for i in range(2):  # same text, other host, below threshold
        r = out[f"https://b.test/p/{i}"]
        assert not r["template_hit"] and not r["is_soft404"]
    r = out["https://b.test/gone"]  # phrase-only
    assert r["phrase_hit"] and r["is_soft404"] and not r["template_hit"]
    r = out["https://b.test/hard404"]  # hard 404: status gate wins
    assert r["phrase_hit"] and not r["is_soft404"]


def test_soft404_template_scope_is_per_host(spark):
    # 5 x template on host a + 2 x SAME text on host b: host b stays clean
    from inform_spark.operators.soft404 import soft404_detect

    out = soft404_detect(_pages(spark), min_template_urls=5)
    flagged_hosts = {
        r["url"].split("/")[2]
        for r in out.filter(F.col("template_hit")).collect()
    }
    assert flagged_hosts == {"a.test"}


# ---------------------------------------------------------------------------
# curriculum_shards
# ---------------------------------------------------------------------------


def test_curriculum_shards_exact_and_balanced(spark):
    from inform_spark.operators.curriculum import curriculum_shards

    docs = spark.createDataFrame(
        [(i, ("word " * (5 + (i * 7) % 40)).strip()) for i in range(37)],
        "doc_id long, text string",
    )
    rows = curriculum_shards(docs, n_shards=5).collect()
    assert sorted(r["rank"] for r in rows) == list(range(1, 38))
    # rank order == (quality, doc_id) order
    by_rank = sorted(rows, key=lambda r: r["rank"])
    keys = [(r["quality_milli"], r["doc_id"]) for r in by_rank]
    assert keys == sorted(keys)
    # shards contiguous in rank, 0-based, balanced within one row
    shards = [r["shard"] for r in by_rank]
    assert shards == sorted(shards) and shards[0] == 0 and shards[-1] == 4
    from collections import Counter

    sizes = Counter(shards)
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # exact closed form
    for r in rows:
        assert r["shard"] == (r["rank"] - 1) * 5 // 37


def test_curriculum_descending_reverses_order(spark):
    from inform_spark.operators.curriculum import curriculum_shards

    docs = spark.createDataFrame(
        [(i, ("word " * (5 + i * 3)).strip()) for i in range(10)],
        "doc_id long, text string",
    )
    asc = {r["doc_id"]: r["rank"] for r in curriculum_shards(docs, 2).collect()}
    desc = {
        r["doc_id"]: r["rank"]
        for r in curriculum_shards(docs, 2, descending=True).collect()
    }
    qm = {r["doc_id"]: r["quality_milli"] for r in curriculum_shards(docs, 2).collect()}
    # distinct qualities => rank_desc = N + 1 - rank_asc
    if len(set(qm.values())) == len(qm):
        assert all(desc[d] == 11 - asc[d] for d in asc)


# ---------------------------------------------------------------------------
# host_mirror_pairs
# ---------------------------------------------------------------------------


def _mirror_pages(spark):
    rows = []
    # host m1 serves docs 0..9; m2 mirrors all ten of them plus 2 own
    for i in range(10):
        rows.append(("m1", f"document body number {i}"))
        rows.append(("m2", f"document body number {i}"))
    rows += [("m2", "m2 exclusive page a"), ("m2", "m2 exclusive page b")]
    # host c shares exactly ONE doc with m1 (below min_shared=2)
    rows += [("c", "document body number 0"), ("c", "c only page")]
    # boilerplate text served by MANY hosts (spread cap)
    for h in ["m1", "m2", "c", "d", "e", "f", "g"]:
        rows.append((h, "universal legal boilerplate"))
    return spark.createDataFrame(rows, "host string, text string")


def test_host_mirror_pair_flagged_with_full_containment(spark):
    from inform_spark.operators.mirrors import host_mirror_pairs

    out = {
        (r["host_a"], r["host_b"]): r.asDict()
        for r in host_mirror_pairs(
            _mirror_pages(spark), min_shared=2, max_hosts_per_fp=3
        ).collect()
    }
    assert set(out) == {("m1", "m2")}
    r = out[("m1", "m2")]
    # boilerplate excluded: m1 has 10 eligible docs, m2 has 12
    assert (r["docs_a"], r["docs_b"], r["shared_docs"]) == (10, 12, 10)
    assert r["containment_ppm"] == 1_000_000
    assert r["jaccard_ppm"] == 10 * 1_000_000 // 12


def test_host_mirror_spread_cap_excludes_boilerplate(spark):
    from inform_spark.operators.mirrors import host_mirror_pairs

    # with the cap relaxed, the 7-host boilerplate page creates pairs
    # among otherwise-unrelated hosts; with it tight, they vanish
    loose = host_mirror_pairs(
        _mirror_pages(spark), min_shared=1, max_hosts_per_fp=100
    )
    assert loose.filter("host_a = 'd' and host_b = 'e'").count() == 1
    tight = host_mirror_pairs(
        _mirror_pages(spark), min_shared=1, max_hosts_per_fp=3
    )
    assert tight.filter("host_a = 'd' and host_b = 'e'").count() == 0


# ---------------------------------------------------------------------------
# recrawl_delta_cost
# ---------------------------------------------------------------------------


def test_recrawl_delta_prices_only_new_chunks(spark):
    from inform_spark.operators.recrawl import recrawl_delta_cost

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    old = spark.createDataFrame(
        [(1, base.strip()), (2, "two words"), (3, "going away soon")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, (base + "brand new appended tail words here").strip()),
            (2, "two words"),
            (4, base.strip()),  # added but FULLY reused from doc 1's chunks
            (5, "totally fresh never seen content"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in recrawl_delta_cost(old, new, w=3, divisor=4).collect()
    }
    assert out[2]["change"] == "unchanged" and out[2]["delta_tokens"] == 0
    assert out[3]["change"] == "removed" and out[3]["n_tokens_new"] == 0
    # appended edit: delta strictly smaller than the full new doc
    assert out[1]["change"] == "changed"
    assert 0 < out[1]["delta_tokens"] < out[1]["n_tokens_new"]
    # added page byte-identical to an old doc: every chunk reused, free
    assert out[4]["change"] == "added"
    assert out[4]["delta_tokens"] == 0
    # genuinely fresh page: pays for everything
    assert out[5]["change"] == "added"
    assert out[5]["delta_tokens"] == out[5]["n_tokens_new"]


# ---------------------------------------------------------------------------
# resolve_redirects
# ---------------------------------------------------------------------------


def _resolve(spark, edges, max_hops=16):
    from inform_spark.operators.redirects import resolve_redirects

    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["url"]: (r["final_url"], r["hops"], r["unresolved"])
        for r in resolve_redirects(df, max_hops=max_hops).collect()
    }


def test_redirect_chain_resolves_with_exact_hops(spark):
    got = _resolve(spark, [("a", "b"), ("b", "c")])
    assert got["a"] == ("c", 2, False)
    assert got["b"] == ("c", 1, False)


def test_redirect_cycle_is_unresolved_at_f_pow_maxhops(spark):
    got = _resolve(spark, [("x", "y"), ("y", "z"), ("z", "x")])
    # 16 mod 3 = 1 step along the cycle, capped hop count, unresolved
    assert got["x"] == ("y", 16, True)
    assert got["y"] == ("z", 16, True)
    assert got["z"] == ("x", 16, True)


def test_redirect_chain_longer_than_cap_is_unresolved(spark):
    chain = [(f"n{i}", f"n{i+1}") for i in range(6)]
    got = _resolve(spark, chain, max_hops=4)
    assert got["n0"] == ("n4", 4, True)   # walked exactly max_hops
    assert got["n2"] == ("n6", 4, False)  # 4 hops reaches the terminal
    assert got["n5"] == ("n6", 1, False)


def test_redirect_multi_edge_normalizes_to_min_dst(spark):
    got = _resolve(spark, [("a", "c"), ("a", "b"), ("b", "t")])
    assert got["a"] == ("t", 2, False)  # min(dst) = b, then b -> t


def test_redirect_max_hops_must_be_power_of_two(spark):
    import pytest as _pytest

    from inform_spark.operators.redirects import resolve_redirects

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with _pytest.raises(ValueError):
        resolve_redirects(df, max_hops=10)


# ---------------------------------------------------------------------------
# declared_canonical_clusters
# ---------------------------------------------------------------------------


def test_declared_canonical_both_orders_and_fallbacks(spark):
    from inform_spark.operators.urlops import declared_canonical_clusters

    rows = [
        ("https://s.test/a",
         '<html><head><link rel="canonical" href="https://s.test/main">'
         "</head></html>"),
        ("https://s.test/b",
         '<html><head><link href="https://s.test/main" rel="canonical">'
         "</head></html>"),
        # relative canonical: falls back to self in the in-row form
        ("https://s.test/c",
         '<html><head><link rel="canonical" href="/main"></head></html>'),
        # no tag at all
        ("https://s.test/d", "<html><body>plain</body></html>"),
        # the canonical target is itself a crawled page
        ("https://s.test/main",
         '<html><head><link rel="canonical" href="https://s.test/main">'
         "</head></html>"),
    ]
    out = {
        r["url"]: r.asDict()
        for r in declared_canonical_clusters(
            spark.createDataFrame(rows, "url string, html string")
        ).collect()
    }
    for u in ("https://s.test/a", "https://s.test/b"):
        assert out[u]["canonical_url"] == "https://s.test/main"
        assert not out[u]["self_canonical"]
    assert out["https://s.test/c"]["self_canonical"]
    assert out["https://s.test/d"]["self_canonical"]
    main = out["https://s.test/main"]
    assert main["self_canonical"] and main["cluster_size"] == 3


def test_declared_canonical_edges_compose_with_redirect_resolver(spark):
    """canonical-of-canonical chains: one-hop by design, but the edge
    list drops straight into resolve_redirects when chain semantics are
    wanted."""
    from pyspark.sql import functions as F

    from inform_spark.operators.redirects import resolve_redirects
    from inform_spark.operators.urlops import declared_canonical_clusters

    rows = [
        ("u1", '<link rel="canonical" href="https://x/u2">'),
        ("https://x/u2", '<link rel="canonical" href="https://x/u3">'),
        ("https://x/u3", "<html/>"),
    ]
    m = declared_canonical_clusters(
        spark.createDataFrame(rows, "url string, html string")
    )
    edges = m.filter(~F.col("self_canonical")).select(
        F.col("url").alias("src"), F.col("canonical_url").alias("dst")
    )
    got = {
        r["url"]: r["final_url"]
        for r in resolve_redirects(edges, max_hops=4).collect()
    }
    assert got["u1"] == "https://x/u3"


def test_recrawl_delta_charges_shared_new_chunk_once(spark):
    """A brand-new chunk shared by several added pages is charged to its
    min-id owner only — sum(delta_tokens) equals the store's growth."""
    from pyspark.sql import functions as F

    from inform_spark.operators.chunking import cdc_chunks
    from inform_spark.operators.recrawl import recrawl_delta_cost

    old = spark.createDataFrame([(1, "ancient unrelated words")],
                                "doc_id long, text string")
    shared = ("brand new footer alpha beta gamma delta epsilon zeta "
             "eta theta iota kappa")
    new = spark.createDataFrame(
        [(1, "ancient unrelated words"),
         (2, shared.strip()), (3, shared.strip()), (4, shared.strip())],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in recrawl_delta_cost(old, new, w=3, divisor=4).collect()
    }
    assert out[2]["delta_tokens"] == out[2]["n_tokens_new"]  # min owner pays
    assert out[3]["delta_tokens"] == 0 and out[4]["delta_tokens"] == 0
    # exact store growth: distinct new chunks' tokens, once each
    distinct_new_tokens = (
        cdc_chunks(new.filter(F.col("doc_id") == 2), w=3, divisor=4)
        .agg(F.sum("n_tokens")).head()[0]
    )
    assert sum(r["delta_tokens"] for r in out.values()) == distinct_new_tokens


# ---------------------------------------------------------------------------
# span_corruption_grid
# ---------------------------------------------------------------------------


def _corrupt_py(doc_id, text, stride, span_len):
    toks = text.lower().split(" ")
    phi = _h60(f"corrupt-{doc_id}") % stride
    inp, tgt, masked = [], [], 0
    for p, tok in enumerate(toks):
        is_m = p >= phi and (p - phi) % stride < span_len
        if not is_m:
            inp.append(tok)
            continue
        masked += 1
        k = (p - phi) // stride
        if (p - phi) % stride == 0:
            inp.append(f"<extra_id_{k}>")
            tgt.append(f"<extra_id_{k}> {tok}")
        else:
            tgt.append(tok)
    return len(toks), masked, " ".join(inp), " ".join(tgt)


def test_span_corruption_matches_sequential_reference(spark):
    from inform_spark.operators.corruption import span_corruption_grid

    texts = [
        "the quick brown fox jumps over the lazy dog again and again "
        "today with more words to cross two strides easily done now",
        "short doc",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_masked"],
                      r["input_text"], r["targets_text"])
        for r in span_corruption_grid(df, stride=7, span_len=2).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _corrupt_py(i, t, 7, 2), (i, t)


def test_span_corruption_roundtrip_reconstructs_document(spark):
    """input + targets carry every original token exactly once: splicing
    each sentinel's span back into the input restores the document."""
    from inform_spark.operators.corruption import span_corruption_grid

    text = " ".join(f"w{i}" for i in range(60))
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    r = span_corruption_grid(df, stride=10, span_len=3).head()
    spans = {}
    cur = None
    for tok in r["targets_text"].split(" "):
        if tok.startswith("<extra_id_"):
            cur = tok
            spans[cur] = []
        else:
            spans[cur].append(tok)
    out = []
    for tok in r["input_text"].split(" "):
        out.extend(spans[tok] if tok.startswith("<extra_id_") else [tok])
    assert out == text.split(" ")
    assert r["n_masked"] == sum(len(v) for v in spans.values())


def test_span_corruption_mask_rate(spark):
    from pyspark.sql import functions as F

    from inform_spark.operators.corruption import span_corruption_grid

    df = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(200))) for i in range(50)],
        "doc_id long, text string",
    )
    agg = (
        span_corruption_grid(df, stride=20, span_len=3)
        .agg(F.sum("n_masked").alias("m"), F.sum("n_tokens").alias("n"))
        .head()
    )
    rate = agg["m"] / agg["n"]
    assert 0.12 <= rate <= 0.155, rate  # ~3/20 with phase edge effects


# ---------------------------------------------------------------------------
# contrastive_pairs
# ---------------------------------------------------------------------------


def test_contrastive_pairs_roles_partition_the_ranking(spark):
    from inform_spark.operators.similarity import contrastive_pairs

    # 3 tight clusters in 4-d: positives come from the query's own
    # cluster, hard negatives from the nearest other cluster
    rows = []
    for cid, base in enumerate([(1.0, 0, 0, 0), (0.9, 0.1, 0, 0), (0, 0, 1.0, 0)]):
        for j in range(3):
            v = [x + 0.01 * j for x in base]
            rows.append((cid * 3 + j, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = contrastive_pairs(emb, n_queries=1, k_pos=2, k_neg=3).collect()
    assert len(out) == 5
    by_rank = sorted(out, key=lambda r: r["rank"])
    assert [r["role"] for r in by_rank] == [
        "positive", "positive",
        "hard_negative", "hard_negative", "hard_negative",
    ]
    # positives are query 0's own cluster mates (ids 1, 2)
    assert {r["neighbor"] for r in by_rank[:2]} == {1, 2}
    # hard negatives outrank the orthogonal cluster: all from cluster 1
    assert {r["neighbor"] for r in by_rank[2:]} == {3, 4, 5}
    # monotone: every positive's cosine >= every hard negative's
    assert min(r["cosine"] for r in by_rank[:2]) >= max(
        r["cosine"] for r in by_rank[2:]
    )
