"""Script/writing-system profiling (operators/langid.script_profile):
planted multi-script docs, tie-breaks, and engine-parity of the
codepoint-range classes."""

import pytest
from pyspark.sql import Row

from inform_spark.operators.langid import SCRIPT_RANGES, SCRIPTS, script_profile


def _profile(spark, text):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    return script_profile(df).first()


def test_latin_doc(spark):
    r = _profile(spark, "Hello world 123")
    assert r["n_latin"] == 10
    assert r["n_digit"] == 3
    assert r["n_space"] == 2
    assert r["n_other"] == 0
    assert r["dominant_script"] == "latin"
    assert r["script_milli"] == 1000 * 10 // 15


def test_cyrillic_dominant(spark):
    r = _profile(spark, "привет мир ok")
    assert r["n_cyrillic"] == 9
    assert r["n_latin"] == 2
    assert r["dominant_script"] == "cyrillic"


def test_cjk_and_kana(spark):
    r = _profile(spark, "日本語のテスト")
    assert r["n_cjk"] == 3  # 日本語
    assert r["n_kana"] == 4  # のテスト
    assert r["dominant_script"] == "kana"


def test_hangul_greek_arabic(spark):
    r = _profile(spark, "한국어 ελληνικά عربى")
    assert r["n_hangul"] == 3
    assert r["n_greek"] == 8
    assert r["n_arabic"] == 4
    assert r["dominant_script"] == "greek"


def test_tie_breaks_in_scripts_order(spark):
    # equal latin and cyrillic counts: latin precedes in SCRIPTS
    r = _profile(spark, "ab аб")
    assert r["n_latin"] == r["n_cyrillic"] == 2
    assert r["dominant_script"] == "latin"
    assert SCRIPTS.index("latin") < SCRIPTS.index("cyrillic")


def test_no_script_chars(spark):
    r = _profile(spark, "12 34 !!")
    assert r["dominant_script"] == "none"
    assert r["script_milli"] == 0


def test_empty_text(spark):
    r = _profile(spark, "")
    assert r["n_chars"] == 0
    assert r["dominant_script"] == "none"
    assert r["script_milli"] == 0


def test_supplementary_plane_falls_to_other(spark):
    # emoji is outside every BMP class -> other in BOTH engines
    r = _profile(spark, "hi \U0001F600")
    assert r["n_latin"] == 2
    assert r["n_other"] == 1
    assert r["n_chars"] == 4


def test_ranges_are_bmp_pairs():
    # the engine-parity precondition: every class is literal BMP ranges
    for s, r in SCRIPT_RANGES.items():
        assert all(ord(c) <= 0xFFFF for c in r if c != "-"), s


def test_math_symbols_are_not_latin(spark):
    # U+00D7 (×) and U+00F7 (÷) sit inside Latin-1 but are math symbols
    r = _profile(spark, "3 × 4 ÷ 2")
    assert r["n_latin"] == 0
    assert r["n_other"] == 2
    assert r["dominant_script"] == "none"


def test_vietnamese_extended_latin(spark):
    # Latin Extended Additional (U+1E00-U+1EFF) counts as latin
    r = _profile(spark, "Tiếng Việt")
    assert r["n_latin"] == 9
    assert r["n_other"] == 0
    assert r["dominant_script"] == "latin"
