"""Round-4 operator semantics: subword tokenization, model lang-id, URL
canonicalization, CCNet paragraph dedup, text normalization, pagination
stitching, crawl budgeting — plus the badword word-only gate regression."""

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# subword tokenizer
# ---------------------------------------------------------------------------


def _walk_py(word):
    """Independent sequential reference of the greedy longest-match walk."""
    from inform_spark.operators.subword import VOCAB

    pos, n = 0, 0
    while pos < len(word):
        best = 0
        for p in VOCAB:
            cont = p.startswith("##")
            core = p[2:] if cont else p
            if (pos == 0) == cont:
                continue
            if word.startswith(core, pos) and len(core) > best:
                best = len(core)
        if best == 0:
            return 1, True
        pos += best
        n += 1
    return n, False


def test_wordpiece_fold_matches_sequential_reference(spark):
    from inform_spark.operators.subword import wordpiece_fold

    words = [
        "tableau", "window", "xqz", "a", "the", "customer", "vector",
        "q1x9", "zzzz", "thequick", "rows", "keys", "windowing",
    ]
    st = wordpiece_fold(F.col("word"))
    got = {
        r["word"]: (r["n"], r["unk"])
        for r in spark.createDataFrame([(w,) for w in words], "word string")
        .select("word", st["n"].alias("n"), st["unk"].alias("unk"))
        .collect()
    }
    for w in words:
        n_ref, unk_ref = _walk_py(w)
        n, unk = got[w]
        n = 1 if unk else n
        assert (n, unk) == (n_ref, unk_ref), w


def test_wordpiece_longest_match_preferred(spark):
    # 'tableau' must be ta + ##ble + ##au (3), never t/a/b/l/e/a/u (7)
    from inform_spark.operators.subword import wordpiece_fold

    st = wordpiece_fold(F.col("word"))
    row = (
        spark.createDataFrame([("tableau",)], "word string")
        .select(st["n"].alias("n"), st["unk"].alias("unk"))
        .collect()[0]
    )
    assert (row["n"], row["unk"]) == (3, False)


def test_subword_token_counts_rollup(spark):
    from inform_spark.operators.subword import subword_token_counts

    docs = spark.createDataFrame(
        [
            (1, "tableau window"),          # 3 + 2 = 5
            (2, "x9z x9z the"),             # UNK + UNK + 1 = 3, 2 unk
            (3, ""),                        # zero words
            (4, "  a  "),                   # split artifacts -> 1 word
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_subword_tokens"], r["n_unk_words"])
        for r in subword_token_counts(docs).collect()
    }
    assert got[1] == (2, 5, 0)
    assert got[2] == (3, 3, 2)
    assert got[3] == (0, 0, 0)
    assert got[4] == (1, 1, 0)


# ---------------------------------------------------------------------------
# model language-id
# ---------------------------------------------------------------------------


def test_lang_id_model_classifies_seeds_and_near_seeds(spark):
    """The classifier must at minimum recover the language of its own
    seed texts AND of held-out sentences in each language."""
    from inform_spark.operators.langid import SEEDS, lang_id_model

    held_out = {
        "de": "die kinder haben den ganzen tag im garten gespielt und "
              "waren am abend sehr muede",
        "en": "the children played in the garden all day and were very "
              "tired in the evening",
        "es": "los ninos jugaron en el jardin todo el dia y estaban muy "
              "cansados por la noche",
        "fr": "les enfants ont joue dans le jardin toute la journee et "
              "etaient tres fatigues le soir",
    }
    rows = [(i, SEEDS[lang], lang) for i, lang in enumerate(sorted(SEEDS))]
    rows += [
        (i + 10, held_out[lang], lang)
        for i, lang in enumerate(sorted(held_out))
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, truth string")
    out = lang_id_model(docs).join(
        docs.select("doc_id", "truth"), "doc_id"
    )
    for r in out.collect():
        assert r["pred_lang"] == r["truth"], (r["doc_id"], r["pred_lang"])


def test_lang_id_model_short_text_is_explicit_unknown(spark):
    from inform_spark.operators.langid import lang_id_model

    docs = spark.createDataFrame([(1, "ab"), (2, "")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in lang_id_model(docs).collect()}
    for i in (1, 2):
        assert got[i]["n_trigrams"] == 0
        assert got[i]["pred_lang"] is None
        assert got[i]["bits_en"] is None


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------


def test_url_variants_collapse(spark):
    from inform_spark.operators.urlops import url_canonical_cluster

    variants = [
        "http://Example.COM/a/b?utm_source=x&id=1#frag",
        "HTTP://example.com:80/a/b?id=1",
        "http://example.com/a/b/?id=1&utm_medium=y",
        "http://example.com/a/b?id=1&gclid=zzz#other",
    ]
    others = [
        "https://example.com/a/b?id=1",   # scheme differs
        "http://example.com/a/b?id=2",    # param value differs
        "http://example.com/A/b?id=1",    # path is case-sensitive
    ]
    df = spark.createDataFrame([(u,) for u in variants + others], "url string")
    out = url_canonical_cluster(df).collect()
    by_canon = {r["canon_url"]: r for r in out}
    main = by_canon["http://example.com/a/b?id=1"]
    assert main["n_occurrences"] == 4
    assert main["n_variants"] == 4
    assert main["rep_url"] == min(variants)
    # the three 'others' each form their own cluster
    assert len(by_canon) == 4


def test_url_canonical_rules_exact(spark):
    from inform_spark.operators.urlops import canonicalize_url

    cases = [
        ("HTTPS://Host.Test:443/x/?b=2&a=1#f", "https://host.test/x?a=1&b=2"),
        ("http://h.test:80/", "http://h.test/"),
        ("http://h.test", "http://h.test/"),
        ("http://h.test/p?utm_source=a&utm_medium=b", "http://h.test/p"),
        ("http://h.test:8080/p", "http://h.test:8080/p"),  # non-default kept
        ("http://h.test/p//", "http://h.test/p"),
        # a '?' INSIDE the fragment is not a query — fragment content
        # must not leak into the canonical form (SPA-style '#/route?x=1')
        ("http://h.test/p#a?b=1", "http://h.test/p"),
        ("http://h.test/p?a=1#frag?b=2", "http://h.test/p?a=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: r["canon"]
        for r in df.select(
            "url", canonicalize_url(F.col("url")).alias("canon")
        ).collect()
    }
    for u, want in cases:
        assert got[u] == want, (u, got[u], want)


# ---------------------------------------------------------------------------
# CCNet paragraph dedup
# ---------------------------------------------------------------------------


def test_ccnet_paragraph_dedup_catches_normalized_variants(spark):
    from inform_spark.operators.textops import ccnet_paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "Cookie banner v2024!\nreal content one"),
            (2, "cookie banner v2019\nreal content two"),  # same normalized
            (3, "cookie banner v2019\nreal content two"),  # full dup of 2
            (4, "---\nunique paragraph"),  # '---' normalizes to '' -> kept
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in ccnet_paragraph_dedup(docs).collect()}
    # doc 1 keeps both paragraphs (first occurrence of the banner)
    assert got[1]["text_dedup"] == "Cookie banner v2024!\nreal content one"
    assert got[1]["n_paras_dropped"] == 0
    # doc 2 loses the banner (normalized dup of doc 1's) keeps its content
    assert got[2]["text_dedup"] == "real content two"
    assert got[2]["n_paras_dropped"] == 1
    # doc 3 loses everything (banner dup of 1, content dup of 2)
    assert got[3]["text_dedup"] == ""
    assert got[3]["n_paras_kept"] == 0
    # doc 4: structural paragraph ('' after normalize) always kept
    assert got[4]["text_dedup"] == "---\nunique paragraph"


# ---------------------------------------------------------------------------
# text normalization
# ---------------------------------------------------------------------------


def test_text_normalize_punct_and_whitespace(spark):
    from inform_spark.operators.textops import text_normalize

    docs = spark.createDataFrame(
        [
            (1, "“quoted” — and… more here"),
            (2, "tab\there\x00and  runs   collapse "),
            (3, "plain ascii unchanged"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text_normalize(docs).collect()}
    assert got[1]["norm_text"] == '"quoted" - and... more here'
    assert got[2]["norm_text"] == "tab here and runs collapse"
    assert got[3]["norm_text"] == "plain ascii unchanged"
    assert got[3]["n_chars"] == got[3]["n_chars_norm"]


# ---------------------------------------------------------------------------
# suffix/prefix stitching
# ---------------------------------------------------------------------------


def test_suffix_prefix_overlap_pairs(spark):
    from inform_spark.operators.textops import suffix_prefix_overlap

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "gamma delta epsilon zeta"),   # continues doc 1
            (3, "epsilon zeta eta theta"),     # continues doc 2
            (4, "unrelated words entirely here"),
            (5, "x"),                          # shorter than k -> no boundary
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["a"], r["b"]): r["boundary"]
        for r in suffix_prefix_overlap(docs, k=2).collect()
    }
    assert pairs == {
        (1, 2): "gamma delta",
        (2, 3): "epsilon zeta",
    }


# ---------------------------------------------------------------------------
# domain crawl budget
# ---------------------------------------------------------------------------


def test_domain_crawl_budget_value_and_clamps(spark):
    from inform_spark.operators.recrawl import domain_crawl_budget

    rows = []
    # src_big: 60 unique docs; src_dupes: 40 copies of ONE doc;
    # src_small: 2 unique docs
    for i in range(60):
        rows.append((i, f"unique text number {i}", "src_big"))
    for i in range(40):
        rows.append((100 + i, "the same template page", "src_dupes"))
    rows += [(200, "tiny a", "src_small"), (201, "tiny b", "src_small")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["source"]: r
        for r in domain_crawl_budget(
            docs, total_budget=1000, min_pages=50, max_pages=800
        ).collect()
    }
    assert got["src_dupes"]["n_docs"] == 40
    assert got["src_dupes"]["n_unique_docs"] == 1
    # total value = 60 + 1 + 2 = 63; shares: 60*1000 div 63 = 952 -> clamp 800
    assert got["src_big"]["budget_pages"] == 800
    # 1*1000 div 63 = 15 -> floor 50
    assert got["src_dupes"]["budget_pages"] == 50
    # 2*1000 div 63 = 31 -> floor 50
    assert got["src_small"]["budget_pages"] == 50


# ---------------------------------------------------------------------------
# badword word-only gate regression (ADVICE r3)
# ---------------------------------------------------------------------------


def test_badword_filter_without_source_column(spark):
    from inform_spark.operators.quality import badword_filter

    docs = spark.createDataFrame(
        [(1, "clean text"), (2, "has badword inside")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in badword_filter(docs).collect()}
    assert got[1]["keep"] is True
    assert got[2]["keep"] is False
    assert got[2]["source_blocked"] is False


def test_resolve_url_backslash_only_in_path(spark):
    """WHATWG: '\\' flips to '/' in path states only — query/fragment
    backslashes survive (reference new URL() behavior)."""
    from inform_spark.functions.urls import resolve_url

    assert (
        resolve_url(r"/search?q=a\b", "http://h.test/x")
        == "http://h.test/search?q=a\\b"
    )
    assert (
        resolve_url(r"docs\page?x=1", "http://h.test/a/")
        == "http://h.test/a/docs/page?x=1"
    )


# ---------------------------------------------------------------------------
# corpus mixture sampling
# ---------------------------------------------------------------------------


def test_corpus_mix_sample_budget_and_exclusions(spark):
    from inform_spark.operators.sampling import corpus_mix_sample

    rows = []
    # source a: 10 docs x 100 tokens = 1000; source b: 1 doc x 100 = 100;
    # source c: not in the target map
    for i in range(10):
        rows.append((i, " ".join(f"w{j}" for j in range(100)), "a"))
    rows.append((100, " ".join(f"v{j}" for j in range(100)), "b"))
    rows.append((200, "excluded words here", "c"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["doc_id"]: r
        for r in corpus_mix_sample(docs, {"a": 500, "b": 500}, salt="t").collect()
    }
    # equal weights, b binds: T = min(1000*1000/500, 100*1000/500) = 200,
    # each source contributes 100 expected tokens -> p(a)=10%, p(b)=100%
    assert out[0]["p_micro"] == 100_000
    assert out[100]["p_micro"] == 1_000_000
    assert out[100]["accepted"] is True  # p=1e6 accepts every hash draw
    # excluded source: explicit verdict, not a dropped row
    assert out[200]["p_micro"] == 0
    assert out[200]["accepted"] is False


# ---------------------------------------------------------------------------
# bigram surprisal
# ---------------------------------------------------------------------------


def test_bigram_surprisal_hand_computed(spark):
    from inform_spark.operators.importance import bigram_surprisal

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "")],
        "doc_id long, text string",
    )
    # ug: a=3 b=2 c=1, N=6; bg: (a,b)=2 (a,c)=1
    # doc1: first 'a' = flog2(6 div 3)=1; cond b|a = flog2(3 div 2)=0 -> 1
    # doc3: 1 + flog2(3 div 1)=1 -> 2
    got = {r["doc_id"]: r for r in bigram_surprisal(docs).collect()}
    assert got[1]["surprisal_bits"] == 1
    assert got[1]["mean_bits_milli"] == 500
    assert got[3]["surprisal_bits"] == 2
    assert got[3]["mean_bits_milli"] == 1000
    assert got[1]["keep"] is True and got[3]["keep"] is True
    assert got[4]["n_tokens"] == 0
    assert got[4]["surprisal_bits"] is None
    assert got[4]["keep"] is False


# ---------------------------------------------------------------------------
# mechanical verification rotation
# ---------------------------------------------------------------------------


def test_verification_order_two_round_coverage(monkeypatch, tmp_path):
    """The driver checks a 50-query prefix; _verification_order must
    guarantee every query gets a driver row within 2 rounds with no
    manual reordering: simulate round r's window landing in a
    CORRECTNESS artifact and assert round r+1's window covers the rest."""
    import json as j

    import __spark_entry__ as e

    names = [f"q{i:02d}" for i in range(85)]
    files = {}

    def fake_glob(pat):
        return list(files)

    monkeypatch.setattr("glob.glob", fake_glob)
    monkeypatch.setattr(e, "CHANGED_THIS_ROUND", [])

    # round 3 verified q00..q49
    p3 = str(tmp_path / "CORRECTNESS_r3.json")
    (tmp_path / "CORRECTNESS_r3.json").write_text(
        j.dumps({n: {} for n in names[:50]})
    )
    files[p3] = None
    w4 = e._verification_order(names)[:50]
    # never-verified queries (q50..q84) must all be in round 4's window
    assert set(names[50:]) <= set(w4)

    # round 4's artifact lands; round 5's window must cover every query
    # round 4 missed
    p4 = str(tmp_path / "CORRECTNESS_r4.json")
    (tmp_path / "CORRECTNESS_r4.json").write_text(
        j.dumps({n: {} for n in w4})
    )
    files[p4] = None
    w5 = e._verification_order(names)[:50]
    assert set(names) - set(w4) <= set(w5)
    assert set(w4) | set(w5) == set(names)


def test_verification_order_real_repo_state():
    """On the real artifacts: never-driver-verified and changed queries
    first, and the full registry survives the reorder."""
    import __spark_entry__ as e

    order = list(e.queries())
    # registry size is not hardcoded (it grows every wave); the invariant
    # is that the rotation is a permutation of the registry
    assert len(order) == len(set(order)) == len(e._query_registry())
    assert len(order) == len(e.oracle_sql())
    r_all = set()
    import glob as g
    import json as j
    import os as o

    here = o.path.dirname(o.path.abspath(e.__file__))
    for p in g.glob(o.path.join(here, "CORRECTNESS_r*.json")):
        r_all |= set(j.load(open(p)))
    never = [n for n in order if n not in r_all]
    head = order[: len(never) + len(e.CHANGED_THIS_ROUND)]
    assert set(never) <= set(head)
    assert set(e.CHANGED_THIS_ROUND) <= set(head)


def test_verification_order_never_verified_beats_changed(monkeypatch, tmp_path):
    """VERDICT r4 item 2: never-driver-verified queries sort STRICTLY
    before changed-this-round — a large changed-set can no longer push
    debutants out of the 50-row window."""
    import json as j

    import __spark_entry__ as e

    names = [f"q{i:02d}" for i in range(60)]
    files = {}
    monkeypatch.setattr("glob.glob", lambda pat: list(files))
    # every query except the last 5 has a driver row; mark 52 of the
    # verified ones as changed (bigger than the window)
    p = str(tmp_path / "CORRECTNESS_r4.json")
    (tmp_path / "CORRECTNESS_r4.json").write_text(
        j.dumps({n: {} for n in names[:55]})
    )
    files[p] = None
    monkeypatch.setattr(e, "CHANGED_THIS_ROUND", names[:52])
    order = e._verification_order(names)
    # the 5 never-verified lead the order outright
    assert order[:5] == names[55:]
    # changed tier follows, stable tier last
    assert set(order[5:57]) == set(names[:52])
